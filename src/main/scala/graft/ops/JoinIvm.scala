package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.SnapshotStore

/** Incrementally maintained JOIN view (r7 — extends the IVM family past
  * aggregates): `V = A ⟕ B` on `A.fk = B.key`, keyed by A's key and
  * persisted as a [[SnapshotStore]] target like any other table, with
  * per-batch maintenance cost O(|delta| + touched view rows) — the view
  * is never recomputed from scratch.
  *
  * Two delta directions, each the minimal touch set:
  *  - **ΔA** (the fact side): PUTs re-enrich against B's CURRENT state
  *    and upsert by A-key; DELETEs tombstone the view row. Only the
  *    delta's rows move — B joins as the lookup side (broadcast when
  *    dim-sized; bucket-co-located when not).
  *  - **ΔB** (the dim side): the view rows REFERENCING the changed B
  *    keys — and only those — re-enrich: the fk ∈ ΔB-keys predicate
  *    prunes the view scan (at cluster scale, back it with an fk
  *    partition/index on V; the touch SET is the irreducible part —
  *    every such row's enrichment is stale by definition). A B-DELETE
  *    null-enriches (left-join semantics preserved, the row stays).
  *
  * LWW discipline: every emitted delta carries a caller-supplied
  * monotonic batch sequence, so replays and out-of-order maintenance
  * batches fold idempotently through the store's seq-guarded merge —
  * the same contract the apply sink holds (JoinIvmSpec proves maintained
  * == full recompute across interleaved A/B batches incl. replay).
  */
object JoinIvm {

  /** Enrichment payload: B's columns packed as one JSON image next to
    * A's own image, so the view's store schema stays the canonical
    * (keys, op, sequenceNumber, newImage).
    */
  private def enriched(aRows: DataFrame, bState: DataFrame): DataFrame =
    aRows.join(
      bState.select(col("keys").as("fk"), col("newImage").as("b_image")),
      Seq("fk"), "left")
      .select(col("keys"), col("op"), col("sequenceNumber"),
        to_json(struct(col("fk"), col("a_image"), col("b_image"))).as("newImage"))

  /** Apply one ΔA batch (columns: keys, op, sequenceNumber, fk, a_image)
    * to A's own state at `aTarget` AND to the view at `vTarget`,
    * enriching PUTs against `bTarget`'s current state.
    */
  def applyFactDelta(spark: SparkSession, aDelta: DataFrame, aTarget: String,
                     bTarget: String, vTarget: String, batchId: Long): Unit = {
    SnapshotStore.mergeIntoTarget(spark, aTarget,
      aDelta.select(col("keys"), col("op"), col("sequenceNumber"),
        when(col("op") =!= "DELETE",
          to_json(struct(col("fk"), col("a_image")))).as("newImage")),
      batchId)
    val bState = SnapshotStore.readTarget(spark, bTarget)
    val puts = enriched(
      aDelta.filter(col("op") =!= "DELETE")
        .select("keys", "op", "sequenceNumber", "fk", "a_image"), bState)
    val dels = aDelta.filter(col("op") === "DELETE")
      .select(col("keys"), col("op"), col("sequenceNumber"),
        lit(null: String).as("newImage"))
    SnapshotStore.mergeIntoTarget(spark, vTarget, puts.unionByName(dels), batchId)
  }

  /** Apply one ΔB batch (canonical keys/op/sequenceNumber/newImage) to
    * `bTarget`, then re-enrich ONLY the view rows whose fk is in the
    * batch — the touched set. `seqBase` must exceed every sequence
    * already in the view (the caller's monotonic batch clock).
    */
  def applyDimDelta(spark: SparkSession, bDelta: DataFrame,
                    bTarget: String, vTarget: String, batchId: Long,
                    seqBase: String): Unit = {
    SnapshotStore.mergeIntoTarget(spark, bTarget, bDelta, batchId)
    val touchedKeys = bDelta.select(col("keys").as("fk")).distinct()
    val bState = SnapshotStore.readTarget(spark, bTarget)
    // view rows referencing the changed dim keys, re-read with their
    // stored fk/a_image (unpacked from the view image) and re-enriched
    val touched = SnapshotStore.readTarget(spark, vTarget)
      .select(col("keys"),
        from_json(col("newImage"), org.apache.spark.sql.types.StructType.fromDDL("fk STRING, a_image STRING, b_image STRING"))
          .as("v"))
      .select(col("keys"), col("v.fk").as("fk"), col("v.a_image").as("a_image"))
      .join(broadcast(touchedKeys), Seq("fk"))
      .withColumn("op", lit("PUT"))
      .withColumn("sequenceNumber", concat(lit(seqBase), lit("-"), col("keys")))
    if (!touched.isEmpty)
      SnapshotStore.mergeIntoTarget(spark, vTarget,
        enriched(touched, bState), batchId)
  }

  /** The full recompute the maintained view must equal (the spec's
    * oracle): A-state left-joined to B-state, same packed image.
    */
  def fullRecompute(spark: SparkSession, aTarget: String, bTarget: String): DataFrame = {
    val aState = SnapshotStore.readTarget(spark, aTarget)
      .select(col("keys"),
        from_json(col("newImage"), org.apache.spark.sql.types.StructType.fromDDL("fk STRING, a_image STRING")).as("a"))
      .select(col("keys"), col("a.fk").as("fk"), col("a.a_image").as("a_image"))
    val bState = SnapshotStore.readTarget(spark, bTarget)
    aState
      .join(bState.select(col("keys").as("fk"), col("newImage").as("b_image")),
        Seq("fk"), "left")
      .select(col("keys"),
        to_json(struct(col("fk"), col("a_image"), col("b_image"))).as("newImage"))
  }
}
