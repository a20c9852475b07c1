package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** First-seen state per minhash band key. */
final case class BandFirst(bkey: String, firstDoc: Long, lastTs: Long)

/** A streamed document flagged as near-dup candidate of an earlier one. */
final case class DupCandidate(docId: Long, dupOf: Long, bkey: String)

/** The MinHash+LSH candidate stage as a STREAM (the streaming face of
  * `dedup_minhash_lsh`): documents arriving as (doc_id, text,
  * approxCreationTs) are signed with the SAME native
  * wordHash40→shingleHash40→minHash12 chain and 4×3 banding the batch
  * pipeline uses, and per band key the state store keeps the FIRST
  * document seen — every later arrival sharing a band emits
  * (docId, dupOf = first, bkey).
  *
  * Contract mirrors the batch pipeline's split: this is CANDIDATE
  * generation (at-least-once per shared band — a doc pairing on three
  * bands emits three rows); the exact-Jaccard verify stays a downstream
  * batch step over the tiny candidate set, exactly as
  * `DedupQueries.minhashPairs` verifies its banded candidates. Banding
  * is the fixed small-corpus plan: a stream has no corpus size to derive
  * from — pick the plan for the RETENTION WINDOW's expected volume
  * (`Corpus.minhashBandPlan`) when configuring a deployment.
  *
  * Scale posture: state is one (first doc, ts) pair per DISTINCT band
  * key — O(active near-dup vocabulary), not O(documents) — and is
  * evicted after `retentionMs` of event-time idleness (same finite-
  * by-default trade as the stateful CDC ops: an evicted band's next
  * arrival becomes the new first, so duplicates are only catchable
  * within the window).
  */
object StreamingDedup {

  def streamingNearDupCandidates(docs: DataFrame,
                                 retentionMs: Long = CdcStream.DefaultRetentionMs,
                                 watermarkDelay: String = "10 minutes")
      : Dataset[DupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val banded = docs
      .withWatermark("approxCreationTs", watermarkDelay)
      .filter(expr("size(split(text, ' ')) >= 3"))
      .select(col("doc_id"), col("approxCreationTs"),
        graft.functions.SignatureFunctions.minHash12(
          graft.functions.SignatureFunctions.shingleHash40(
            graft.functions.TextHashFunctions.wordHash40(col("text")))).as("mh"))
      .select(col("doc_id"), col("approxCreationTs"),
        explode(graft.analytics.Corpus.bandKeysExpr(4, 3)).as("bkey"))
      .as[(Long, java.sql.Timestamp, String)]
    val f = (bkey: String, events: Iterator[(Long, java.sql.Timestamp, String)],
             state: GroupState[BandFirst]) =>
      if (state.hasTimedOut) {
        // band idle past retention: drop it; nothing to flush (candidates
        // were emitted when they arrived)
        state.remove()
        Iterator.empty: Iterator[DupCandidate]
      } else {
        // deterministic within-batch order: (event time, doc id) — the
        // iterator's own order is not a contract
        val evs = events.toSeq.sortBy(e => (e._2.getTime, e._1))
        var cur = state.getOption
        var maxTs = cur.map(_.lastTs).getOrElse(Long.MinValue)
        val out = Seq.newBuilder[DupCandidate]
        evs.foreach { case (doc, ts, _) =>
          maxTs = math.max(maxTs, ts.getTime)
          cur match {
            case None => cur = Some(BandFirst(bkey, doc, ts.getTime))
            case Some(first) if first.firstDoc != doc =>
              out += DupCandidate(doc, first.firstDoc, bkey)
            case _ => () // redelivery of the first doc itself: silent
          }
        }
        cur.foreach(c => state.update(c.copy(lastTs = maxTs)))
        state.setTimeoutTimestamp(
          math.max(maxTs + retentionMs, state.getCurrentWatermarkMs + 1))
        out.result().iterator
      }
    banded.groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(f)
  }
}
