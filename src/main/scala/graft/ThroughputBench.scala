package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.CdcStream

/** Replay-throughput measurement against the reference's only published
  * performance fact: the SQS→Lambda drain is capped at ~200 items/s per
  * concurrent consumer (1000 messages / 5 s batching window,
  * app/lambdas/initiate-lambda-backfill/main.py:26-27 — derivation in
  * BASELINE.md). This main drives the SAME streaming apply path the
  * engine ships (CdcStream.applySink: checkpointed source → poison split
  * → LWW compact → keyed merge → parquet target) over N synthetic CDC
  * events and prints one JSON line with events/s.
  *
  * Run: sbt "runMain graft.ThroughputBench [nEvents] [preSeedKeys]"
  *
  * `preSeedKeys` > 0 pre-seeds the bucket-manifest target with that many
  * keys DISJOINT from the stream's key space before the clock starts —
  * the scale posture check: with the merge-on-read store, per-batch cost
  * is O(|delta|) (appended segments; chains fold at
  * [[graft.streaming.SnapshotStore.FoldThreshold]]), so throughput must
  * hold against an accumulated table (the round-3 full-snapshot rewrite
  * degraded as O(|target|) per batch; the interim bucket-rewrite store
  * degraded whenever a batch's keys spanned every bucket — the
  * uniform-hash common case).
  */
object ThroughputBench {

  /** Synthetic CDC log shared with [[IvmBench]]: 10% tombstones, keys
    * drawn from an n/3 hot space (so compaction, the merge, and state
    * transitions all do real work), written as the same JSON the file
    * source reads in production shape.
    */
  private[graft] def synthCdcLog(spark: SparkSession, dir: String,
                                 n: Int, parts: Int): Unit =
    spark.range(n).select(
      concat(lit("e"), col("id")).as("eventID"),
      when(col("id") % 10 === 0, "REMOVE").otherwise("MODIFY").as("eventName"),
      timestamp_millis(lit(1704067200000L) + col("id")).as("approxCreationTs"),
      lpad(col("id").cast("string"), 12, "0").as("sequenceNumber"),
      concat(lit("k"), pmod(col("id") * 2654435761L, lit(n / 3 + 1))).as("keys"),
      when(col("id") % 10 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("img"), col("id"))).as("newImage"),
      lit(null).cast("string").as("oldImage"))
      .coalesce(parts)
      .write.mode("overwrite").json(dir)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val preSeed = args.drop(1).headOption.map(_.toLong).getOrElse(0L)
    val spark = GraftSession.local("graft-throughput")
    import spark.implicits._

    val dir = Files.createTempDirectory("tp-in").toFile.getAbsolutePath
    val target = Files.createTempDirectory("tp-target").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("tp-ckpt").toFile.getAbsolutePath
    val dlq = Files.createTempDirectory("tp-dlq").toFile.getAbsolutePath

    if (preSeed > 0)
      graft.streaming.SnapshotStore.writeTarget(
        spark.range(preSeed).select(
          concat(lit("seed"), col("id")).as("keys"),
          lit("0").as("sequenceNumber"),
          concat(lit("simg"), col("id")).as("newImage")),
        target, batchId = -2L)

    synthCdcLog(spark, dir, n, parts = 8)

    val t0 = System.nanoTime()
    val q = CdcStream.applySink(
      CdcStream.cdcFileSource(spark, dir, maxFilesPerTrigger = 8),
      target, ckpt, dlq, trigger = Trigger.AvailableNow()).start()
    q.awaitTermination(600000)
    val secs = (System.nanoTime() - t0) / 1e9

    val applied = CdcStream.readTarget(spark, target).count()
    println(f"""{"metric":"replay_throughput","events":$n,"pre_seeded_keys":$preSeed,"seconds":$secs%.3f,"events_per_sec":${n / secs}%.0f,"final_keys":$applied}""")
    spark.stop()
  }
}
