package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.RecScoring

/** Streaming recommendation serving (r16, the memory'd r15 candidate):
  * the item-kNN model TRAINS once and freezes ([[persistIndex]] — the
  * VectorIndexStore train/add split applied to the recommender), user
  * purchase streams maintain the per-user OWNED state in a
  * [[SnapshotStore]] target (LWW, checkpointed, replay-idempotent),
  * and each micro-batch serves fresh top-3 recommendations for exactly
  * the TOUCHED users — scoring through the same
  * [[graft.analytics.RecScoring]] stages the batch pipeline and the
  * rec_hitrate eval run, so served rows are the batch model's rows by
  * construction, not by analogy (RecServingSpec holds the equality
  * after a chunked drain with a mid-stream restart).
  *
  * Scale shape: per batch O(|delta|) state merge + scoring restricted
  * to touched users (owned rows of the touched set ⋈ the catalog-sized
  * frozen index); nothing rescans the full user base. Emission is
  * at-least-once on replay (the searchSink contract): a keyed consumer
  * keeps the last (uid, rank) row.
  */
object RecServing {

  private val idxSchema =
    org.apache.spark.sql.types.StructType.fromDDL("p BIGINT, nbr BIGINT, sc BIGINT")
  private val ownedSchema =
    org.apache.spark.sql.types.StructType.fromDDL("uid BIGINT, p BIGINT")

  /** Freeze a trained neighbor index (p, nbr, sc) into the store —
    * one LWW row per (p, nbr), superseded wholesale by a later
    * generation (the drift-retrain path).
    */
  def persistIndex(spark: SparkSession, nbrs: DataFrame, target: String,
                   generation: Long = 1L): Unit = {
    val seq = f"$generation%010d"
    SnapshotStore.mergeIntoTarget(spark, target,
      nbrs.select(
        concat(col("p"), lit(":"), col("nbr")).as("keys"),
        lit("PUT").as("op"), lit(seq).as("sequenceNumber"),
        to_json(struct(col("p"), col("nbr"), col("sc"))).as("newImage")),
      generation - 1L)
  }

  /** The frozen index back as its (p, nbr, sc) rows. */
  def readIndex(spark: SparkSession, target: String): DataFrame =
    SnapshotStore.readTarget(spark, target)
      .select(from_json(col("newImage"), idxSchema).as("i"))
      .select(col("i.p").as("p"), col("i.nbr").as("nbr"), col("i.sc").as("sc"))

  /** The maintained owned state back as its (uid, p) rows. */
  def readOwned(spark: SparkSession, target: String): DataFrame =
    SnapshotStore.readTarget(spark, target)
      .select(from_json(col("newImage"), ownedSchema).as("o"))
      .select(col("o.uid").as("uid"), col("o.p").as("p"))

  /** Serve from the purchase stream: each micro-batch of (uid, p) rows
    * merges into the owned target, then the TOUCHED users' full owned
    * sets score against the frozen index and `sink` receives their
    * fresh (uid, rank, cand, score) rows.
    */
  def serveSink(purchases: DataFrame, indexTarget: String,
                ownedTarget: String, checkpoint: String,
                sink: DataFrame => Unit,
                trigger: org.apache.spark.sql.streaming.Trigger =
                  org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    purchases.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val delta = batch.select(col("uid").cast("long").as("uid"),
          col("p").cast("long").as("p")).distinct().localCheckpoint(true)
        SnapshotStore.mergeIntoTarget(spark, ownedTarget,
          delta.select(
            concat(col("uid"), lit(":"), col("p")).as("keys"),
            lit("PUT").as("op"),
            lit(f"sb$batchId%012d").as("sequenceNumber"),
            to_json(struct(col("uid"), col("p"))).as("newImage")),
          batchId)
        val touched = delta.select("uid").distinct()
        val owned = readOwned(spark, ownedTarget)
          .join(broadcast(touched), "uid")
        sink(RecScoring.top3(owned, readIndex(spark, indexTarget)))
        ()
      }
      .trigger(trigger)
      .start()
}
