package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintainer of the EXACT equi-depth histogram — the
  * streaming dual of `profile_equidepth_hist` (the batch two-phase
  * RankedPrefix pass had no streaming consumer until r12; the A16
  * quantile sketch gives mergeable APPROXIMATE tiers, this gives the
  * exact ones).
  *
  * Shape: a streaming aggregation maintains the per-VALUE count table
  * (Spark-managed state, bounded by the value domain's NDV — the same
  * collapse that makes the batch query's ordered pass NDV-sized, never
  * corpus-sized), and each micro-batch's UPDATE rows carry the changed
  * values' ABSOLUTE counts. foreachBatch then
  *
  *   1. merges the changed counts into `countsTarget` as LWW PUTs keyed
  *      by value with sequence = zero-padded batchId — absolute counts
  *      make the write IDEMPOTENT under crash-replay (a replayed batch
  *      re-derives byte-identical rows from the versioned state store,
  *      and equal (key, sequence, image) merges are no-ops under LWW);
  *   2. recomputes the exact tier table from the full maintained count
  *      state via [[graft.ops.RankedPrefix.equiDepthTiers]] — the SAME
  *      code the batch query runs (one semantics, two drivers), with
  *      `cached = false` so per-batch frames don't accumulate in the
  *      session memo — and publishes it atomically to `tiersTarget`
  *      ([[SnapshotStore.writeTarget]]'s locked versioned publish, so
  *      readers always see one complete generation and the history is
  *      time-travelable).
  *
  * Tier boundaries are GLOBAL order statistics: one changed count can
  * move every boundary, so the per-batch recompute over the collapsed
  * NDV-sized state is the honest exact cost — O(batch) maintenance +
  * O(NDV) derivation, never O(corpus). Restart/replay: offsets are
  * checkpointed; step 1 is idempotent, step 2 is a deterministic
  * function of the counts state, so a replayed batch republishes an
  * identical tier generation (the maintainedAggView discipline —
  * StreamingEquiDepthSpec drives chunked drains, a restart, and
  * equality with the batch recompute after every phase).
  *
  * Reference anchor: the reference pipeline computes no statistics at
  * all (its items are opaque, app/lambdas/cdc-to-sqs/main.py:31-34);
  * this operator exists for the north-star surface — maintained
  * ANALYZE-style statistics over a CDC-fed table.
  */
object StreamingEquiDepth {

  /** Resolved per-value counts from the maintained counts target:
    * (v BIGINT, n_i BIGINT). Zero-count values (every occurrence
    * retracted) are filtered — they no longer occupy histogram mass.
    */
  def readCounts(spark: SparkSession, countsTarget: String): DataFrame =
    SnapshotStore.readTarget(spark, countsTarget)
      .select(col("keys").cast("long").as("v"),
        get_json_object(col("newImage"), "$.n").cast("long").as("n_i"))
      .filter(col("n_i") > 0)

  /** The maintained tier table as of the latest published generation:
    * (bucket, lo_cents, hi_cents, n_rows, ndv) — the exact schema of
    * the batch `profile_equidepth_hist` result.
    */
  def readTiers(spark: SparkSession, tiersTarget: String): DataFrame =
    SnapshotStore.readTarget(spark, tiersTarget)

  /** Start the maintainer over a streaming frame bearing a BIGINT
    * column `v` (the value whose distribution is profiled; callers
    * project/decode upstream — e.g. cents from a CDC image). `weight`
    * lets a CDC consumer feed ±1 signed occurrences (a DELETE retracts
    * its value); the default counts every row once.
    */
  def maintainSink(values: DataFrame,
                   countsTarget: String,
                   tiersTarget: String,
                   checkpoint: String,
                   buckets: Int = 8,
                   weight: org.apache.spark.sql.Column = lit(1L),
                   trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    val counts = values
      .select(col("v"), weight.cast("long").as("w"))
      .groupBy("v").agg(sum(col("w")).as("n_i"))
    counts.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (changed: DataFrame, batchId: Long) =>
        val spark = changed.sparkSession
        // two consumers of the update delta (merge + the implicit
        // re-read barrier below); one compute
        val ch = changed.localCheckpoint(true)
        val delta = ch.select(
          col("v").cast("string").as("keys"),
          lit("PUT").as("op"),
          // zero-padded so the numeric-string LWW order equals batch
          // order at any magnitude; replay re-writes the same sequence
          // and loses the tie — idempotent by the store's contract
          lit(f"$batchId%012d").as("sequenceNumber"),
          to_json(struct(col("n_i").as("n"))).as("newImage"))
        SnapshotStore.mergeIntoTarget(spark, countsTarget, delta,
          batchId = batchId)
        val tiers = graft.ops.RankedPrefix.equiDepthTiers(
          spark, countsTarget, s"streamTiers", // d/cacheKey unused when uncached
          readCounts(spark, countsTarget), buckets, cached = false)
        SnapshotStore.writeTarget(tiers, tiersTarget, batchId = batchId,
          keys = Seq("bucket"))
        ()
      }
      .trigger(trigger)
      .start()
  }
}
