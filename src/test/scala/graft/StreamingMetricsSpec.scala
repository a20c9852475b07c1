package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingMetrics

/** Maintained ranking metrics: the streamed per-score histogram must
  * equal the batch histogram of everything delivered so far — after
  * every micro-batch, across a stop/restart, and through the derived
  * AUC — because the sufficient statistic is additive and the state
  * version for batch b re-derives deterministically from (state < b,
  * batch b).
  */
class StreamingMetricsSpec extends SparkSpec {

  private def tmp(name: String) =
    Files.createTempDirectory(s"graft-$name").toFile.getAbsolutePath

  private def histMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("maintained histogram equals batch recompute after every micro-batch; AUC matches ml_auc_rank") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the real corpus, streamed in three uneven slices
    val all = Tables.events(spark, "/root/testdata/sf0.001")
      .select(expr("cast(round(value * 100) as bigint)").as("score"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val slices = Seq(all.take(100), all.slice(100, 700), all.drop(700))

    val mem = MemoryStream[(Long, Long)]
    val stateDir = tmp("auc-state"); val ckpt = tmp("auc-ckpt")
    var delivered = Seq.empty[(Long, Long)]
    for (slice <- slices) {
      mem.addData(slice: _*)
      delivered ++= slice
      val q = StreamingMetrics.maintain(
        mem.toDF().toDF("score", "pos"), stateDir, ckpt,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(60000)
      val expect = histMap(StreamingMetrics.scoreHistogram(
        delivered.toDF("score", "pos")))
      assert(histMap(StreamingMetrics.readState(spark, stateDir)) == expect,
        s"state after ${delivered.size} rows")
    }
    // the derived metric from maintained state == the registered batch query
    val streamed = StreamingMetrics.aucFromHistogram(
      StreamingMetrics.readState(spark, stateDir)).collect().head
    val batch = SparkEntry.queries("ml_auc_rank")(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(streamed.getLong(0) == batch.getLong(0))
    assert(streamed.getLong(1) == batch.getLong(1))
    assert(streamed.getDouble(2) == batch.getDouble(2))
  }

  test("crash-replay of an uncommitted batch does not double-count") {
    import spark.implicits._
    val stateDir = tmp("replay-state")
    val b0 = Seq((10L, 1L), (20L, 0L)).toDF("score", "pos")
    val b1 = Seq((10L, 0L), (30L, 1L)).toDF("score", "pos")
    // simulate the foreachBatch bodies directly: commit batch 0, then
    // "deliver" batch 1 twice (crash after commit, source replays)
    def applyBatch(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val prev = StreamingMetrics.readStateBefore(spark, stateDir, id)
      StreamingMetrics.merge(prev, StreamingMetrics.scoreHistogram(batch))
        .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/v$id")
    }
    applyBatch(b0, 0L)
    applyBatch(b1, 1L)
    val once = histMap(StreamingMetrics.readState(spark, stateDir))
    applyBatch(b1, 1L) // replay
    assert(histMap(StreamingMetrics.readState(spark, stateDir)) == once,
      "replayed batch folded onto state<1, not onto its own output")
    assert(once == Map(10L -> (2L, 1L), 20L -> (1L, 0L), 30L -> (1L, 1L)))
  }
}
