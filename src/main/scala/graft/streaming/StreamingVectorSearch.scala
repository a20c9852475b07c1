package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.analytics.{Corpus, SimilarityQueries}

/** Streaming vector ingest + search — the streaming face of
  * `ann_incremental` (as `StreamingDedup` is the streaming face of
  * `dedup_minhash_lsh`): vectors arriving as (vec_id, embedding,
  * approxCreationTs) are quantized with the corpus contract, bucketed at
  * the EXISTING index's derived sign-LSH width, and each micro-batch
  * searches the persisted index — old×new only, the accumulated corpus
  * is never re-scored, and arrivals never search each other (the same
  * contract the batch query holds).
  *
  * Per micro-batch: the arrival slice is the SMALL side (broadcast into
  * the bucket join); candidates score with the exact-integer dot and
  * reduce through the bounded per-probe top-k aggregate (never a
  * window). No cross-batch state is needed — a query vector's result
  * depends only on the index — so the stream is a stateless foreachBatch
  * with checkpointed source offsets: restart replays any uncommitted
  * batch (at-least-once; the consumer keys results by query_id, making
  * redelivery idempotent — StreamingSpec pins the streamed result set
  * EQUAL to the batch `ann_incremental` formulation across a restart).
  *
  * Scale posture: the index is bucketed once (the width is the index's
  * own stat, derived from ITS size — not the stream's, which has no
  * size); per-batch cost is O(|batch| + matched buckets). `radius` > 0
  * turns on the multi-probe fan-out (Hamming-≤radius bucket neighbors,
  * the `ann_lsh_multiprobe` recall knob) for recall-critical deployments.
  */
object StreamingVectorSearch {

  /** Quantize a raw (vec_id, embedding, ...) frame to the corpus
    * contract: qv (×100 floor) + nn (exact integer squared norm).
    */
  def quantize(vecs: DataFrame): DataFrame =
    vecs.select(
      col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 100) as bigint))")
        .as("qv"))
      .withColumn("nn", expr("aggregate(qv, 0L, (acc, x) -> acc + x * x)"))

  /** Start the search stream. `newVecs` is a streaming frame of
    * (vec_id, embedding, approxCreationTs); `existing` is the BATCH
    * index frame (vec_id, qv, nn) — the persisted corpus. Each
    * micro-batch hands `sink` the (query_id, neighbor_id, rank, score)
    * top-k of its arrivals against the index.
    */
  def searchStream(newVecs: DataFrame, existing: DataFrame, checkpoint: String,
                   sink: DataFrame => Unit,
                   k: Int = 3,
                   radius: Int = 0,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // fail loudly rather than silently clamp: the mask generator below
    // only enumerates Hamming balls of radius 0/1/2 (fan-out 1, 1+b,
    // 1+b+C(b,2)); a caller asking for 3+ would silently get radius 2
    require(radius >= 0 && radius <= 2,
      s"radius must be 0, 1, or 2 (got $radius): the multiprobe mask set is " +
        "enumerated up to Hamming distance 2")
    // the index's own stats, computed ONCE at stream start: derived
    // bucket width + the bucketed index frame every batch joins
    val bits = Corpus.signBucketBits(existing.count())
    val idx = existing.withColumn("bucket", Corpus.signBucketColBits(bits))
    val masks: Seq[Long] = radius match {
      case 0 => Seq(0L)
      case 1 => Seq(0L) ++ (0 until bits).map(1L << _)
      case _ =>
        Seq(0L) ++ (0 until bits).map(1L << _) ++
          (for { i <- 0 until bits; j <- i + 1 until bits } yield (1L << i) | (1L << j))
    }
    newVecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val probes = quantize(batch)
          .withColumn("bucket", Corpus.signBucketColBits(bits))
          .withColumn("bucket",
            explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
          .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
            col("nn").as("q_nn"), col("bucket"))
        val pairs = idx.join(broadcast(probes), Seq("bucket"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            Corpus.dotCol("qv", "q_qv").as("dot"),
            col("nn").as("na"), col("q_nn").as("nb"))
        sink(SimilarityQueries.topKPerProbe(pairs, k))
        ()
      }
      .trigger(trigger)
      .start()
  }
}
