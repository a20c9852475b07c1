package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.analytics.RecScoring
import graft.streaming.RecServing

/** Streaming rec-index serving (r16): the frozen item-kNN index serves
  * fresh top-3 recommendations as user purchase streams maintain owned
  * state — and after the stream drains, the served rows ARE the batch
  * pipeline's rows for every user (one RecScoring implementation), with
  * a mid-stream checkpoint restart in between.
  */
class RecServingSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toFile.getAbsolutePath
  private val d = "/root/testdata/sf0.001"

  test("chunked streamed purchases serve the batch model's exact rows; restart-safe") {
    val idxT = tmp("rec-idx"); val ownedT = tmp("rec-owned")
    val in = tmp("rec-in"); val ckpt = tmp("rec-ckpt")

    val li = Tables.lineitem(spark, d)
      .select("l_orderkey", "l_partkey").distinct()
    val owned = li
      .join(Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("uid"), col("l_partkey").as("p"))
      .distinct().localCheckpoint(true)
    val pr = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("w"))

    // train once, freeze; round-trip through the store must be lossless
    val nbrs = RecScoring.neighborIndex(li, pr).localCheckpoint(true)
    RecServing.persistIndex(spark, nbrs, idxT)
    assert(RecServing.readIndex(spark, idxT).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ===
      nbrs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)

    // batch truth: the full pipeline over everyone
    def rowT(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2), r.getLong(3))
    val expected = RecScoring.top3(owned, nbrs).collect().map(rowT)
      .groupBy(_._1).view.mapValues(_.toSet).toMap

    // stream the same purchases chunked BY USER (uid % 3) so each
    // user's full owned set arrives within one chunk — that user's
    // last served rows must equal the batch rows; restart between
    // chunk 1 and the rest
    def writeChunk(m: Int): Unit = {
      owned.filter(col("uid") % 3 === m)
        .coalesce(1).write.mode("append").parquet(in)
      Thread.sleep(5)
    }
    val served = scala.collection.mutable.Map[Long, Set[(Long, Long, Long, Long)]]()
    def sink(df: org.apache.spark.sql.DataFrame): Unit = {
      val rows = df.collect().map(rowT)
      rows.groupBy(_._1).foreach { case (uid, rs) => served(uid) = rs.toSet }
    }
    writeChunk(0)
    val schema = spark.read.parquet(in).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q1 = RecServing.serveSink(stream(), idxT, ownedT, ckpt, sink)
    q1.awaitTermination(120000)
    writeChunk(1); writeChunk(2)
    val q2 = RecServing.serveSink(stream(), idxT, ownedT, ckpt, sink)
    q2.awaitTermination(120000)

    // every user with batch recommendations was served exactly them
    assert(served.keySet === expected.keySet,
      s"served ${served.size} users, batch has ${expected.size}")
    val diverged = expected.collect {
      case (uid, rows) if served(uid) != rows => uid
    }
    assert(diverged.isEmpty,
      s"${diverged.size} users diverged from the batch model, e.g. " +
        diverged.take(3).map(u => s"$u: ${served(u)} vs ${expected(u)}")
          .mkString("; "))
  }
}
