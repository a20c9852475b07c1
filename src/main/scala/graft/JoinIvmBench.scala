package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.JoinIvm
import graft.streaming.SnapshotStore

/** Scale evidence for the maintained join view ([[graft.ops.JoinIvm]]):
  * the claim is per-batch maintenance cost O(|delta| + touched view
  * rows) — INDEPENDENT of total view size. The bench seeds views at
  * growing sizes, applies identical fact- and dim-delta batches to
  * each, and prints the per-batch wall time: flat-ish across a k×
  * larger view = the claim holds; growth tracking view size = the
  * maintenance degenerated to recompute.
  *
  * Each fact batch is `batchSize` upserts over existing keys (real LWW
  * work); each dim batch updates dims referenced by ~`batchSize` view
  * rows (real touched-set re-enrichment). A final equality assert
  * against [[JoinIvm.fullRecompute]] makes the bench refuse to report
  * times for a wrong answer (the IvmBench discipline).
  *
  * Run: sbt "runMain graft.JoinIvmBench [baseRows] [factors...]"
  * (default 50000 1 4).
  */
object JoinIvmBench {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toLong).getOrElse(50000L)
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4)
    val spark = GraftSession.local("graft-joinivm-bench")
    spark.sparkContext.setLogLevel("ERROR")
    val batchSize = 2000L
    val dims = 1000L

    for (k <- factors) {
      val n = base * k
      val aT = Files.createTempDirectory(s"jivmb-a$k").toFile.getAbsolutePath
      val bT = Files.createTempDirectory(s"jivmb-b$k").toFile.getAbsolutePath
      val vT = Files.createTempDirectory(s"jivmb-v$k").toFile.getAbsolutePath

      // seed: dims then n facts (fk = id % dims), through the same
      // maintenance path so the view starts consistent
      SnapshotStore.mergeIntoTarget(spark, bT,
        spark.range(dims).select(
          concat(lit("d"), col("id")).as("keys"), lit("PUT").as("op"),
          lit("0000000001").as("sequenceNumber"),
          concat(lit("dim"), col("id")).as("newImage")), 0L)
      JoinIvm.applyFactDelta(spark,
        spark.range(n).select(
          concat(lit("a"), col("id")).as("keys"), lit("PUT").as("op"),
          lit("0000000002").as("sequenceNumber"),
          concat(lit("d"), pmod(col("id"), lit(dims))).as("fk"),
          concat(lit("fact"), col("id")).as("a_image")),
        aT, bT, vT, 1L)

      def factBatch(b: Int): Double = {
        val t0 = System.nanoTime()
        JoinIvm.applyFactDelta(spark,
          spark.range(batchSize).select(
            concat(lit("a"), pmod(col("id") * 2654435761L + lit(b * 7919), lit(n)))
              .as("keys"),
            lit("PUT").as("op"),
            lpad(lit(100 + b).cast("string"), 10, "0").as("sequenceNumber"),
            concat(lit("d"), pmod(col("id"), lit(dims))).as("fk"),
            concat(lit("upd"), lit(b), lit("_"), col("id")).as("a_image")),
          aT, bT, vT, 100L + b)
        (System.nanoTime() - t0) / 1e9
      }
      // each dim batch touches ~batchSize view rows: update
      // batchSize/  (n/dims) dims — the per-dim fan-out is n/dims
      val dimsPerBatch = math.max(1L, batchSize * dims / n)
      def dimBatch(b: Int): Double = {
        val t0 = System.nanoTime()
        JoinIvm.applyDimDelta(spark,
          spark.range(dimsPerBatch).select(
            concat(lit("d"), pmod(col("id") + lit(b * 37), lit(dims))).as("keys"),
            lit("PUT").as("op"),
            lpad(lit(200 + b).cast("string"), 10, "0").as("sequenceNumber"),
            concat(lit("dimv"), lit(b), lit("_"), col("id")).as("newImage")),
          bT, vT, 200L + b)
        (System.nanoTime() - t0) / 1e9
      }

      // indexed dim path: the reverse index seeds AFTER the fact batches
      // (they re-point fks; at a live deployment the index is maintained
      // from day one by applyFactDeltaIndexed — the bulk seed here is
      // bench setup), then the identical dim batches run point-read
      val iT = Files.createTempDirectory(s"jivmb-i$k").toFile.getAbsolutePath
      def seedIndex(): Unit = {
        import spark.implicits._
        val idx = JoinIvm.indexRecompute(spark, aT).toSeq
          .map { case (fk, img) => (fk, "PUT", "0000000099", img) }
          .toDF("keys", "op", "sequenceNumber", "newImage")
        SnapshotStore.mergeIntoTarget(spark, iT, idx, 99L)
      }
      def dimBatchIndexed(b: Int): Double = {
        val t0 = System.nanoTime()
        JoinIvm.applyDimDeltaIndexed(spark,
          spark.range(dimsPerBatch).select(
            concat(lit("d"), pmod(col("id") + lit(b * 37), lit(dims))).as("keys"),
            lit("PUT").as("op"),
            lpad(lit(300 + b).cast("string"), 10, "0").as("sequenceNumber"),
            concat(lit("dimw"), lit(b), lit("_"), col("id")).as("newImage")),
          bT, vT, iT, 300L + b)
        (System.nanoTime() - t0) / 1e9
      }

      val factSecs = (1 to 4).map(factBatch)
      seedIndex()
      val dimSecs = (1 to 4).map(dimBatch)
      val dimIdxSecs = (1 to 4).map(dimBatchIndexed)

      // refuse to report times for a wrong answer
      val got = SnapshotStore.readTarget(spark, vT).select("keys", "newImage")
      val want = JoinIvm.fullRecompute(spark, aT, bT)
      val diff = got.exceptAll(want).count() + want.exceptAll(got).count()
      require(diff == 0, s"maintained view diverged from recompute at x$k ($diff rows)")

      println(f"""{"probe":"join_ivm_x$k","view_rows":$n,""" +
        f""""fact_batch_sec":${factSecs.min}%.2f,"dim_batch_sec":${dimSecs.min}%.2f,""" +
        f""""dim_batch_indexed_sec":${dimIdxSecs.min}%.2f,""" +
        f""""touched_per_dim_batch":${dimsPerBatch * (n / dims)}}""")
    }

    // ── backfill-sized single delta through the INDEXED path ──────────
    // The r7 implementation diffed posting-list membership on the
    // driver, so a backfill batch (the reference's lambda-backfill
    // replay: one delta holding MILLIONS of rows) would have
    // materialized the whole delta driver-side. The r8 path is
    // DataFrame-only (the driver sees bucket-id sets, never rows); this
    // slot proves a 1M-row batch runs it, and a second 1M-row batch
    // re-pointing EVERY key exercises the removal/anti-join half at the
    // same scale. Equality asserts keep the time honest.
    val bf = 1000000L
    val aT = Files.createTempDirectory("jivmb-bf-a").toFile.getAbsolutePath
    val bT = Files.createTempDirectory("jivmb-bf-b").toFile.getAbsolutePath
    val vT = Files.createTempDirectory("jivmb-bf-v").toFile.getAbsolutePath
    val iT = Files.createTempDirectory("jivmb-bf-i").toFile.getAbsolutePath
    SnapshotStore.mergeIntoTarget(spark, bT,
      spark.range(dims).select(
        concat(lit("d"), col("id")).as("keys"), lit("PUT").as("op"),
        lit("0000000001").as("sequenceNumber"),
        concat(lit("dim"), col("id")).as("newImage")), 0L)
    def backfillBatch(b: Int, fkShift: Long): Double = {
      val t0 = System.nanoTime()
      JoinIvm.applyFactDeltaIndexed(spark,
        spark.range(bf).select(
          concat(lit("a"), col("id")).as("keys"), lit("PUT").as("op"),
          lpad(lit(b).cast("string"), 10, "0").as("sequenceNumber"),
          concat(lit("d"), pmod(col("id") + lit(fkShift), lit(dims))).as("fk"),
          concat(lit("f"), lit(b), lit("_"), col("id")).as("a_image")),
        aT, bT, vT, iT, b.toLong, seqBase = f"sb$b%012d")
      (System.nanoTime() - t0) / 1e9
    }
    val seedSec = backfillBatch(1, 0L)      // 1M inserts: additions only
    val repointSec = backfillBatch(2, 1L)   // 1M re-points: every key moves lists
    val viewDiff = {
      val got = SnapshotStore.readTarget(spark, vT).select("keys", "newImage")
      val want = JoinIvm.fullRecompute(spark, aT, bT)
      got.exceptAll(want).count() + want.exceptAll(got).count()
    }
    require(viewDiff == 0, s"backfill view diverged ($viewDiff rows)")
    val idx = SnapshotStore.readTarget(spark, iT).select("keys", "newImage")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    require(idx == JoinIvm.indexRecompute(spark, aT), "backfill index diverged")
    println(f"""{"probe":"join_ivm_backfill","delta_rows":$bf,""" +
      f""""insert_batch_sec":$seedSec%.2f,"repoint_batch_sec":$repointSec%.2f}""")
    spark.stop()
  }
}
