package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamingEquiDepth

/** Streaming exact equi-depth maintainer (r12, VERDICT r11 item 7):
  * the batch two-phase RankedPrefix pass gains its streaming dual —
  * after EVERY drained phase (including a checkpoint restart and a
  * retraction batch) the published tier table must equal the batch
  * recompute over the values accumulated so far, through the SAME
  * shared core (`RankedPrefix.equiDepthTiers`).
  */
class StreamingEquiDepthSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toFile.getAbsolutePath

  private def tierSet(df: org.apache.spark.sql.DataFrame) =
    df.select("bucket", "lo_cents", "hi_cents", "n_rows", "ndv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  test("streamed tiers equal the batch recompute across micro-batches, restart, and retraction") {
    import spark.implicits._
    val in = tmp("seq-in"); val ckpt = tmp("seq-ckpt")
    val counts = tmp("seq-counts"); val tiers = tmp("seq-tiers")

    // skewed value stream: heavy repeats at low values, a sparse tail —
    // the shape equi-depth exists for (equal-width would collapse)
    val rng = new scala.util.Random(7)
    val all = (1 to 3000).map { i =>
      val v = if (i % 3 == 0) (rng.nextInt(10) + 1).toLong
              else (rng.nextInt(5000) + 1).toLong
      (v, 1L)
    }
    val (c1, rest) = all.splitAt(1000)
    val (c2, c3) = rest.splitAt(1000)
    var applied = Seq.empty[(Long, Long)] // (v, w) ground truth so far

    def writeChunk(chunk: Seq[(Long, Long)]): Unit = {
      chunk.toDF("v", "w").coalesce(1).write.mode("append").parquet(in)
      applied = applied ++ chunk
      Thread.sleep(5)
    }
    def expected() = tierSet(graft.ops.RankedPrefix.equiDepthTiers(
      spark, "spec", "specTiers",
      applied.toDF("v", "w").groupBy("v").agg(sum("w").as("n_i"))
        .filter(col("n_i") > 0),
      buckets = 8, cached = false))
    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      val q = StreamingEquiDepth.maintainSink(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(in),
        counts, tiers, ckpt, buckets = 8, weight = col("w"))
      q.awaitTermination(120000)
    }

    // phase 1: two chunks drained as separate micro-batches
    writeChunk(c1); writeChunk(c2)
    drain()
    assert(tierSet(StreamingEquiDepth.readTiers(spark, tiers)) === expected(),
      "phase 1: maintained tiers diverged from the batch recompute")

    // phase 2: restart from the checkpoint (a NEW query), more data —
    // already-drained files must not re-apply
    writeChunk(c3)
    drain()
    assert(tierSet(StreamingEquiDepth.readTiers(spark, tiers)) === expected(),
      "phase 2 (restart): maintained tiers diverged")

    // phase 3: a CDC-style retraction batch — signed weights remove
    // mass; fully-retracted values must vanish from the histogram
    val retract = applied.take(300).map { case (v, _) => (v, -1L) }
    writeChunk(retract)
    drain()
    assert(tierSet(StreamingEquiDepth.readTiers(spark, tiers)) === expected(),
      "phase 3 (retraction): maintained tiers diverged")

    // the maintained counts state equals the ground-truth aggregation
    val gotCounts = StreamingEquiDepth.readCounts(spark, counts)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expCounts = applied.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).filter(_._2 > 0).toSet
    assert(gotCounts === expCounts, "maintained counts diverged")

    // tier-table invariants on the final state: buckets partition the
    // row mass and bounds are ordered/disjoint in value order
    val rows = StreamingEquiDepth.readTiers(spark, tiers)
      .orderBy("bucket").collect()
    val totalRows = applied.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .values.filter(_ > 0).sum
    assert(rows.map(_.getAs[Long]("n_rows")).sum === totalRows)
    rows.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0).getAs[Long]("hi_cents") < w(1).getAs[Long]("lo_cents"),
          "bucket value ranges overlap")
    }
  }
}
