package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamingScoreDrift

/** Streaming score-drift monitor (r15, VERDICT r14 #4): after EVERY
  * drained phase — including a checkpoint RESTART mid-stream — the
  * published χ² drift table must equal the direct batch fold over the
  * scores accumulated so far, through the SAME shared formula
  * (`StreamingScoreDrift.chi2Cells`, the one ml_score_drift runs).
  */
class StreamingScoreDriftSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toFile.getAbsolutePath

  private def tableSet(df: org.apache.spark.sql.DataFrame) =
    df.select("bin", "o_a", "o_b", "dev_a_milli", "dev_b_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  test("streamed drift table equals the batch fold across micro-batches and a restart") {
    import spark.implicits._
    val in = tmp("sdr-in"); val ckpt = tmp("sdr-ckpt")
    val counts = tmp("sdr-counts"); val drift = tmp("sdr-drift")

    // baseline: the "training window" histogram — centered mass
    val baseline = Seq((10L, 500L), (11L, 800L), (12L, 500L), (13L, 200L))
      .toDF("bin", "n_base").localCheckpoint(true)

    // live stream: wave 1 matches the baseline shape EXACTLY at half
    // mass (proportional histograms ⇒ χ² = 0); wave 2 DRIFTS (mass
    // moves to new high bins 15/16 the baseline never saw)
    val rng = new scala.util.Random(11)
    val wave1 = scala.util.Random.javaRandomToRandom(new java.util.Random(3))
      .shuffle(Seq.fill(250)((10L, 1L)) ++ Seq.fill(400)((11L, 1L)) ++
        Seq.fill(250)((12L, 1L)) ++ Seq.fill(100)((13L, 1L)))
    val wave2 = (1 to 1000).map(_ => (15L + rng.nextInt(2).toLong, 1L))
    var applied = Seq.empty[(Long, Long)]

    def writeChunk(chunk: Seq[(Long, Long)]): Unit = {
      chunk.toDF("bin", "w").coalesce(1).write.mode("append").parquet(in)
      applied = applied ++ chunk
      Thread.sleep(5)
    }
    def expected() = tableSet(StreamingScoreDrift.driftTable(
      baseline,
      applied.toDF("bin", "w").groupBy("bin").agg(sum("w").as("n_cur"))
        .filter(col("n_cur") > 0)))
    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      val q = StreamingScoreDrift.maintainSink(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(in),
        baseline, counts, drift, ckpt, weight = col("w"))
      q.awaitTermination(120000)
    }

    // phase 1: the in-distribution wave — drift devs stay small
    writeChunk(wave1)
    drain()
    assert(tableSet(StreamingScoreDrift.readDrift(spark, drift)) === expected(),
      "phase 1: published drift table diverged from the batch fold")
    assert(StreamingScoreDrift.alarms(spark, drift, 50000L).isEmpty,
      "phase 1: in-distribution wave must not alarm at the 50-chi2 threshold")

    // phase 2: RESTART from the checkpoint (a NEW query), drifted wave —
    // already-drained files must not re-apply, and the novel bins must
    // enter the table (full-outer: a bin the baseline never saw is
    // drift evidence, not a join casualty)
    writeChunk(wave2)
    drain()
    assert(tableSet(StreamingScoreDrift.readDrift(spark, drift)) === expected(),
      "phase 2 (restart): published drift table diverged from the batch fold")
    val alarmBins = StreamingScoreDrift.alarms(spark, drift, 50000L)
      .select("bin").collect().map(_.getLong(0)).toSet
    assert(Set(15L, 16L).subsetOf(alarmBins),
      s"drifted novel bins must alarm; got $alarmBins")

    // phase 3: retraction — remove part of the drifted mass via signed
    // weights; the maintained table must track the fold exactly
    writeChunk(wave2.take(400).map { case (b, _) => (b, -1L) })
    drain()
    assert(tableSet(StreamingScoreDrift.readDrift(spark, drift)) === expected(),
      "phase 3 (retraction): published drift table diverged")
  }

  test("chi2Cells degenerate guard: an empty side contributes 0, never a division error") {
    import spark.implicits._
    val cells = Seq((10L, 5L, 0L), (11L, 7L, 0L)).toDF("bin", "o_a", "o_b")
    val out = StreamingScoreDrift.chi2Cells(cells)
      .select("dev_a_milli", "dev_b_milli").collect()
    assert(out.forall(r => r.getLong(0) == 0L && r.getLong(1) == 0L))
  }
}
