package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Re-enrichment sequence: the view's LWW lives in the FACT sequence
    * space — a dim-driven refresh must never outrank a LATER fact
    * update on the same key (the bug a flat "epoch" stamp has: the
    * refresh wins forever). The store's comparator is numeric-string
    * order — (length(canonical), canonical, length(raw), raw), leading
    * zeros stripped — so the refresh stamp is the stored fact sequence
    * with ONE ZERO PREPENDED: the canonical value ties the stored row
    * (and any replay of it) and the longer raw form wins the final
    * tiebreak, while any later fact outranks on the canonical value.
    * Order achieved: stored "0046" < refresh "00046" < next refresh
    * "000046" < later fact "0047"; a replayed "0046" cannot clobber a
    * refresh. Growth is one char per refresh of an unchanged row —
    * bounded by the control-plane refresh count, and any fact update
    * resets the stamp.
    */
  private def refreshSeq: Column = concat(lit("0"), col("sequenceNumber"))

  /** Apply one ΔB batch (canonical keys/op/sequenceNumber/newImage) to
    * `bTarget`, then re-enrich ONLY the view rows whose fk is in the
    * batch — the touched set. Refresh stamps come from [[refreshSeq]]
    * (zero-prepended stored fact sequences), so refreshes layer between
    * the stored row and any later fact update.
    */
  def applyDimDelta(spark: SparkSession, bDelta: DataFrame,
                    bTarget: String, vTarget: String, batchId: Long): Unit = {
    SnapshotStore.mergeIntoTarget(spark, bTarget, bDelta, batchId)
    val touchedKeys = bDelta.select(col("keys").as("fk")).distinct()
    val bState = SnapshotStore.readTarget(spark, bTarget)
    // view rows referencing the changed dim keys, re-read with their
    // stored fk/a_image (unpacked from the view image) and re-enriched
    val touched = SnapshotStore.readTarget(spark, vTarget)
      .select(col("keys"), col("sequenceNumber"),
        from_json(col("newImage"), org.apache.spark.sql.types.StructType.fromDDL("fk STRING, a_image STRING, b_image STRING"))
          .as("v"))
      .select(col("keys"), col("sequenceNumber"),
        col("v.fk").as("fk"), col("v.a_image").as("a_image"))
      .join(broadcast(touchedKeys), Seq("fk"))
      .withColumn("op", lit("PUT"))
      .withColumn("sequenceNumber", refreshSeq)
    if (!touched.isEmpty)
      SnapshotStore.mergeIntoTarget(spark, vTarget,
        enriched(touched, bState), batchId)
  }

  // ───────────────────────────────────────────────────────────────────
  // Indexed maintenance (r7): a SECOND store target holds the REVERSE
  // index fk → [referencing A-keys], maintained alongside the view, so
  // the dim-side path needs NO view scan at all — every step is a
  // delta-bounded point read ([[SnapshotStore.readKeys]], the bucket-
  // pruned GetItem analog). The index is itself just a store table:
  // LWW rows keyed by fk whose image is the sorted key list (JSON
  // array). All driver-side materialization below is bounded by the
  // DELTA (old+new fks of the batch, their current lists), never by
  // table size — the same control-plane budget as the k-centroid pull.
  // Caveat at extreme fan-out: one fk referenced by a huge share of A
  // has a posting list to match; shard such keys (fk#n) the same way
  // hot LSH buckets are — the spec covers the mechanism, not that
  // tuning.
  // ───────────────────────────────────────────────────────────────────

  private def parseKeyList(img: String): Seq[String] =
    if (img == null || img.isEmpty) Nil
    else img.stripPrefix("[").stripSuffix("]").split(",").toSeq
      .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)

  private def renderKeyList(keys: Seq[String]): String =
    keys.sorted.distinct.mkString("[\"", "\",\"", "\"]")

  /** Current fk of each A-key in `lookups`, via point reads. */
  private def currentFks(spark: SparkSession, aTarget: String,
                         lookups: Seq[String]): Map[String, String] =
    SnapshotStore.readKeys(spark, aTarget, lookups)
      .select(col("keys"),
        from_json(col("newImage"),
          org.apache.spark.sql.types.StructType.fromDDL("fk STRING, a_image STRING"))
          .getField("fk").as("fk"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** [[applyFactDelta]] + reverse-index maintenance: before the A merge,
    * the delta keys' PRIOR fks are point-read; after it, every fk whose
    * membership changed (old ∪ new) gets its posting list rewritten —
    * touched fks only, delta-bounded.
    */
  def applyFactDeltaIndexed(spark: SparkSession, aDelta: DataFrame, aTarget: String,
                            bTarget: String, vTarget: String, iTarget: String,
                            batchId: Long, seqBase: String): Unit = {
    // collapse the batch to each key's LWW winner first (a PUT and a
    // DELETE for one key can share a micro-batch; membership moves must
    // follow the winner the store's own merge will keep, same
    // numeric-string order)
    val rows = aDelta.select("keys", "op", "fk", "sequenceNumber").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .groupBy(_._1).values
      .map(_.maxBy(r => CdcOps.numericStringKey(r._4)))
      .map(r => (r._1, r._2, r._3)).toSeq
    val oldFks = currentFks(spark, aTarget, rows.map(_._1).toSeq)
    applyFactDelta(spark, aDelta, aTarget, bTarget, vTarget, batchId)
    // membership moves: key leaves old fk's list (on delete or re-point),
    // joins new fk's list (on put)
    val removals = rows.flatMap { case (k, op, newFk) =>
      oldFks.get(k).filter(old => op == "DELETE" || old != newFk).map(_ -> k)
    }
    val additions = rows.collect { case (k, op, newFk) if op != "DELETE" => newFk -> k }
    val touchedFks = (removals.map(_._1) ++ additions.map(_._1)).distinct.toSeq
    if (touchedFks.nonEmpty) {
      val current = SnapshotStore.readKeys(spark, iTarget, touchedFks)
        .select("keys", "newImage").collect()
        .map(r => r.getString(0) -> parseKeyList(r.getString(1))).toMap
      val byFk = touchedFks.map { fk =>
        val next = (current.getOrElse(fk, Nil)
          .filterNot(k => removals.exists(r => r._1 == fk && r._2 == k))
          ++ additions.collect { case (`fk`, k) => k }).distinct
        (fk, next)
      }
      import spark.implicits._
      val idxDelta = byFk.map { case (fk, ks) =>
        if (ks.isEmpty) (fk, "DELETE", s"$seqBase-$fk", null: String)
        else (fk, "PUT", s"$seqBase-$fk", renderKeyList(ks))
      }.toSeq.toDF("keys", "op", "sequenceNumber", "newImage")
      SnapshotStore.mergeIntoTarget(spark, iTarget, idxDelta, batchId)
    }
  }

  /** [[applyDimDelta]] with the reverse index: the touched view rows
    * come from index point reads (fk → key list) followed by view point
    * reads — NO view scan anywhere; cost is delta + fan-out.
    */
  def applyDimDeltaIndexed(spark: SparkSession, bDelta: DataFrame,
                           bTarget: String, vTarget: String, iTarget: String,
                           batchId: Long): Unit = {
    SnapshotStore.mergeIntoTarget(spark, bTarget, bDelta, batchId)
    val fks = bDelta.select("keys").collect().map(_.getString(0)).toSeq.distinct
    val refKeys = SnapshotStore.readKeys(spark, iTarget, fks)
      .select("newImage").collect().flatMap(r => parseKeyList(r.getString(0))).toSeq.distinct
    if (refKeys.nonEmpty) {
      val bState = SnapshotStore.readTarget(spark, bTarget)
      val touched = SnapshotStore.readKeys(spark, vTarget, refKeys)
        .select(col("keys"), col("sequenceNumber"),
          from_json(col("newImage"), org.apache.spark.sql.types.StructType
            .fromDDL("fk STRING, a_image STRING, b_image STRING")).as("v"))
        .select(col("keys"), col("sequenceNumber"),
          col("v.fk").as("fk"), col("v.a_image").as("a_image"))
        .withColumn("op", lit("PUT"))
        .withColumn("sequenceNumber", refreshSeq)
      SnapshotStore.mergeIntoTarget(spark, vTarget, enriched(touched, bState), batchId)
    }
  }

  /** Streaming fact-side maintenance (r7): the CDC fact stream drives
    * the view + reverse index through checkpointed micro-batches — the
    * join-view dual of the aggregate IVM's streaming face. Each batch
    * runs [[applyFactDeltaIndexed]]; the store's seq-guarded LWW merge
    * makes a replayed batch (restart after crash-before-checkpoint)
    * idempotent, so the maintained state is exactly-once even though
    * delivery is at-least-once (JoinIvmSpec proves equality with the
    * full recompute across a mid-drain restart). Dim-side deltas keep
    * arriving as batch calls ([[applyDimDeltaIndexed]]) — dims change
    * on control-plane cadence, facts on stream cadence.
    *
    * `factCdc` is a STREAMING frame with the fact-delta shape
    * (keys, op, sequenceNumber, fk, a_image).
    *
    * Torn-batch window: one micro-batch merges THREE targets (A, view,
    * index) and those merges are individually atomic but not jointly —
    * a crash (or non-graceful stop) between them leaves the trio torn
    * until the uncommitted batch REPLAYS on restart and its idempotent
    * merges repair all three. Operational rule, as for any
    * multi-target transactionless pipeline: run control-plane dim
    * maintenance ([[applyDimDeltaIndexed]]) at a QUIESCED boundary
    * (sink drained or gracefully stopped), never against a torn trio —
    * a dim update issued inside the torn window can miss the torn
    * batch's rows until it replays.
    */
  def factSink(factCdc: DataFrame, aTarget: String, bTarget: String,
               vTarget: String, iTarget: String, checkpoint: String,
               trigger: org.apache.spark.sql.streaming.Trigger =
                 org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    factCdc.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyFactDeltaIndexed(batch.sparkSession, batch,
          aTarget, bTarget, vTarget, iTarget, batchId,
          seqBase = f"sb$batchId%012d")
        ()
      }
      .trigger(trigger)
      .start()

  /** The true reverse mapping (the index spec's oracle): fk → sorted
    * referencing keys from A's current state.
    */
  def indexRecompute(spark: SparkSession, aTarget: String): Map[String, String] =
    SnapshotStore.readTarget(spark, aTarget)
      .select(col("keys"),
        from_json(col("newImage"),
          org.apache.spark.sql.types.StructType.fromDDL("fk STRING, a_image STRING"))
          .getField("fk").as("fk"))
      .collect().map(r => (r.getString(1), r.getString(0)))
      .groupBy(_._1).map { case (fk, ks) => fk -> renderKeyList(ks.map(_._2).toSeq) }

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
