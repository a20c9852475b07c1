package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** First-seen state per minhash band key. */
final case class BandFirst(bkey: String, firstDoc: Long, lastTs: Long)

/** Full member list per minhash band key — the state behind the
  * ALL-PAIRS candidate stage. Bounded by band-bucket occupancy, which
  * the LSH banding keeps small by design (the same bound that keeps the
  * batch band join linear).
  */
final case class BandMembers(bkey: String, docs: List[Long], lastTs: Long)

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

  /** The banded signature stream both candidate stages share: watermark,
    * the native wordHash40→shingleHash40→minHash12 chain, 4×3 band keys
    * exploded to (doc_id, ts, bkey).
    */
  private def bandedStream(docs: DataFrame, watermarkDelay: String)
      : Dataset[(Long, java.sql.Timestamp, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withWatermark("approxCreationTs", watermarkDelay)
      .filter(expr("size(split(text, ' ')) >= 3"))
      .select(col("doc_id"), col("approxCreationTs"),
        graft.functions.SignatureFunctions.minHash12(
          graft.functions.SignatureFunctions.shingleHash40(
            graft.functions.TextHashFunctions.wordHash40(col("text")))).as("mh"))
      .select(col("doc_id"), col("approxCreationTs"),
        explode(graft.analytics.Corpus.bandKeysExpr(4, 3)).as("bkey"))
      .as[(Long, java.sql.Timestamp, String)]
  }

  /** Distinct word-3-gram shingle hash sets (doc_id, hs) over a BATCH
    * documents frame — the same native chain the streaming signatures
    * use and the batch pipeline's hsets builder; the lookup side the
    * exact-Jaccard verify joins against.
    */
  def shingleSets(docs: DataFrame): DataFrame =
    docs
      .filter(expr("size(split(text, ' ')) >= 3"))
      .select(col("doc_id"),
        graft.functions.SignatureFunctions.shingleHash40(
          graft.functions.TextHashFunctions.wordHash40(col("text"))).as("hs"))

  def streamingNearDupCandidates(docs: DataFrame,
                                 retentionMs: Long = CdcStream.DefaultRetentionMs,
                                 watermarkDelay: String = "10 minutes")
      : Dataset[DupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val banded = bandedStream(docs, watermarkDelay)
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

  /** ALL-PAIRS streaming candidate stage (r6): per band key the state
    * keeps the full member list, and every arrival emits one candidate
    * per EXISTING member — so the streamed candidate set is exactly the
    * batch band-join's pair set over the same documents (first-seen
    * state structurally misses the (B,C) pair of a 3-member bucket; a
    * set-equality contract with `dedup_minhash_lsh` needs membership).
    * State per band is its bucket occupancy — the quantity LSH banding
    * bounds by design — and evicts after `retentionMs` of event-time
    * idleness like [[streamingNearDupCandidates]]. A pair sharing
    * several bands emits once per band and once per delivery retry:
    * at-least-once, deduplicated downstream (the batch pipeline's
    * dropDuplicates plays that role in [[verifiedNearDupStream]]).
    */
  def streamingNearDupPairCandidates(docs: DataFrame,
                                     retentionMs: Long = CdcStream.DefaultRetentionMs,
                                     watermarkDelay: String = "10 minutes")
      : Dataset[DupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val banded = bandedStream(docs, watermarkDelay)
    val f = (bkey: String, events: Iterator[(Long, java.sql.Timestamp, String)],
             state: GroupState[BandMembers]) =>
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty: Iterator[DupCandidate]
      } else {
        val evs = events.toSeq.sortBy(e => (e._2.getTime, e._1))
        var members = state.getOption.map(_.docs).getOrElse(Nil)
        var maxTs = state.getOption.map(_.lastTs).getOrElse(Long.MinValue)
        val out = Seq.newBuilder[DupCandidate]
        evs.foreach { case (doc, ts, _) =>
          maxTs = math.max(maxTs, ts.getTime)
          if (!members.contains(doc)) { // redelivery: silent
            members.foreach(m => out += DupCandidate(doc, m, bkey))
            members = doc :: members
          }
        }
        state.update(BandMembers(bkey, members, maxTs))
        state.setTimeoutTimestamp(
          math.max(maxTs + retentionMs, state.getCurrentWatermarkMs + 1))
        out.result().iterator
      }
    banded.groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(f)
  }

  /** End-to-end streaming near-dup (D9 complete): the all-pairs
    * candidate stream verified per micro-batch with the EXACT Jaccard
    * the batch pipeline uses — candidates normalized to (doc_a < doc_b),
    * batch-deduplicated, joined against the replayable shingle-set frame
    * (`hsets`, from [[shingleSets]] over the same document store), kept
    * at `threshold`, handed to `sink`. The streamed verified-pair SET
    * (across all batches, deduplicated by the consumer — at-least-once
    * delivery) equals batch `dedup_minhash_lsh` over the same documents;
    * StreamingSpec pins the equality including a mid-drain restart.
    *
    * Scale shape per micro-batch: candidates are the tiny near-dup
    * slice, the hsets join is candidate-sized against a bucketed lookup,
    * and the verify never touches documents that collided on no band.
    */
  def verifiedNearDupStream(docs: DataFrame, hsets: DataFrame, checkpoint: String,
                            sink: DataFrame => Unit,
                            threshold: Double = 0.4,
                            trigger: org.apache.spark.sql.streaming.Trigger =
                              org.apache.spark.sql.streaming.Trigger.AvailableNow(),
                            retentionMs: Long = CdcStream.DefaultRetentionMs,
                            watermarkDelay: String = "10 minutes")
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingNearDupPairCandidates(docs, retentionMs, watermarkDelay).toDF()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pairs = batch
          .select(least(col("docId"), col("dupOf")).as("doc_a"),
            greatest(col("docId"), col("dupOf")).as("doc_b"))
          .dropDuplicates("doc_a", "doc_b")
        val verified = pairs
          .join(hsets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
          .join(hsets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
          .withColumn("jaccard", expr(
            "cast(size(array_intersect(hs_a, hs_b)) as double) / size(array_union(hs_a, hs_b))"))
          .filter(col("jaccard") >= threshold)
          .select("doc_a", "doc_b", "jaccard")
        sink(verified)
        ()
      }
      .trigger(trigger)
      .start()
}
