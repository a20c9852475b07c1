package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.CdcOps

/** DynamoDB Global-Secondary-Index maintenance as a streaming sink — the
  * index plan [[graft.ops.CdcOps.gsiDelta]] derives per batch, applied to a
  * second [[SnapshotStore]] target alongside the base-table apply (public
  * GSI semantics: DynamoDB maintains every GSI from the same write stream
  * the reference replays at app/lambdas/lambda-backfill/main.py:44-46, so a
  * restored table's indexes ride the backfill through exactly this path).
  *
  * Per micro-batch: the canonical compacted delta point-reads its keys'
  * PRIOR base state ([[SnapshotStore.readKeysDf]] — bucket-pruned, never a
  * state scan), `gsiDelta` turns (prior, winner) into the sparse-index
  * mutation set (key MOVE = DELETE+PUT pair), and the mutations merge into
  * the GSI target keyed by (gsi_key, ref_key) BEFORE the base target
  * merges.
  *
  * INDEX-FIRST merge order (the [[graft.ops.JoinIvm]] torn-batch
  * contract, same argument): the prior-state read keys off the BASE
  * target, so a batch torn between the two merges re-derives the crashed
  * attempt's exact mutation set on replay (prior unchanged, stamps =
  * each winner's own sequence number → the GSI re-merge is idempotent).
  * Base-first would strand a moved key in its old gsi_key's entry
  * forever: the replay would see old == new and emit no DELETE. A replay
  * after BOTH merges completed re-emits only PUTs (old == new under the
  * merged base) at their original sequence numbers — absorbed by the
  * store's seq-guarded LWW.
  *
  * Scale posture: cost is O(|delta| + touched keys) per batch — the same
  * contract as the base apply; nothing scans the base or index state.
  * The GSI target's LWW key is the (gsi_key, ref_key) COMPOSITE (one
  * index item per referencing base item — collapsing on gsi_key alone
  * would LWW different base keys into one row), so store buckets hash
  * both parts; a per-gsi_key range read is a filter over the target, not
  * a bucket point read — bucket-local gsi_key reads would need a
  * gsi_key-hashed layout, the documented trade.
  */
object GsiMaintenance {

  /** One GSI's definition over canonical CDC rows. Each expression
    * evaluates over a row carrying `newImage` (the DDB-JSON item):
    *
    * @param gsiKey    index partition-key expression
    * @param present   sparse membership (null ⇒ absent — DynamoDB's
    *                  missing-attribute rule)
    * @param projected the index item image (ALL_PROJECTED ≈ `col("newImage")`;
    *                  KEYS_ONLY / INCLUDE = a narrower reprojection)
    */
  final case class GsiDef(gsiKey: Column, present: Column, projected: Column)

  /** The per-batch mutation set for one GSI, as merged into its target:
    * (gsi_key, ref_key, op, sequenceNumber, newImage). `prior` is the
    * touched keys' base state — shared across every GSI of the table.
    */
  def gsiMutations(prior: DataFrame, delta: DataFrame,
                   gsi: GsiDef): DataFrame =
    CdcOps.gsiDelta(
      prior, delta, keys = Seq("keys"),
      order = CdcOps.numericStringOrder(col("sequenceNumber")),
      isRemove = col("op") === "DELETE",
      gsiKey = gsi.gsiKey, present = gsi.present,
      projection = Seq("image" -> gsi.projected),
      carry = Seq("sequenceNumber" -> col("sequenceNumber")))
      .select(col("gsi_key"), col("keys").as("ref_key"),
        col("op"), col("sequenceNumber"), col("image").as("newImage"))

  /** One micro-batch: every GSI's merge first (see merge-order contract
    * above), then the base apply. `batch` is a raw canonical CDC frame;
    * `gsis` maps each index's target dir to its definition — a DynamoDB
    * table carries up to 20 GSIs, and ALL of them derive from ONE
    * prior-state point read (the compacted delta and the prior frame are
    * pinned once; each index only adds its own transition projection and
    * merge). Torn anywhere in the merge sequence, the replay re-derives
    * every index's exact mutation set: the prior read keys off the base
    * target, which merges LAST.
    */
  def applyBatchWithGsi(spark: SparkSession, batch: DataFrame,
                        baseDir: String, batchId: Long,
                        gsis: Seq[(String, GsiDef)]): Unit = {
    val delta = CdcStream.compactDelta(batch).localCheckpoint(true)
    try {
      val prior = SnapshotStore
        .readKeysDf(spark, baseDir, delta.select("keys"))
        .localCheckpoint(true)
      try {
        gsis.foreach { case (gsiDir, gsi) =>
          SnapshotStore.mergeIntoTarget(spark, gsiDir,
            gsiMutations(prior, delta, gsi), batchId,
            keys = Seq("gsi_key", "ref_key"))
        }
        SnapshotStore.mergeIntoTarget(spark, baseDir, delta, batchId)
      } finally { prior.unpersist(); () }
    } finally { delta.unpersist(); () }
  }

  /** Single-GSI convenience overload. */
  def applyBatchWithGsi(spark: SparkSession, batch: DataFrame,
                        baseDir: String, gsiDir: String, batchId: Long,
                        gsi: GsiDef): Unit =
    applyBatchWithGsi(spark, batch, baseDir, batchId, Seq(gsiDir -> gsi))

  /** The checkpointed sink: base apply + maintenance of every GSI per
    * micro-batch.
    */
  def sink(cdc: DataFrame, baseDir: String, checkpoint: String,
           gsis: Seq[(String, GsiDef)],
           trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    cdc.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatchWithGsi(batch.sparkSession, batch, baseDir, batchId, gsis)
        ()
      }
      .trigger(trigger)
      .start()

  /** Single-GSI convenience overload. */
  def sink(cdc: DataFrame, baseDir: String, gsiDir: String,
           checkpoint: String, gsi: GsiDef,
           trigger: Trigger): StreamingQuery =
    sink(cdc, baseDir, checkpoint, Seq(gsiDir -> gsi), trigger)

  /** Online GSI creation — DynamoDB's add-an-index-to-a-LIVE-table
    * backfill: derive the new index's full content from the base
    * target's current applied state and merge it as the GSI target's
    * first version, after which the normal [[sink]] maintenance takes
    * over. Each backfilled row carries its base row's OWN stored
    * sequence number as its stamp: the entry asserts "index state as of
    * that write", so a verbatim replay of the batch that produced the
    * very state the backfill read is absorbed by the store's
    * seq-guarded LWW (same stamp, same image), while any later live
    * event outranks it — the backfill can never beat real maintenance.
    * Cost: ONE scan of the base state (the price DynamoDB also pays —
    * online index creation backfills the whole table) through the
    * store's normal commit path; the stream can keep draining into the
    * base while this runs, because maintenance batches that land after
    * the backfill's state read carry strictly newer stamps.
    */
  def backfillGsi(spark: SparkSession, baseDir: String, gsiDir: String,
                  gsi: GsiDef, batchId: Long = 0L): Unit = {
    val rows = SnapshotStore.readTarget(spark, baseDir)
      .filter(coalesce(gsi.present, lit(false)))
      .select(gsi.gsiKey.as("gsi_key"), col("keys").as("ref_key"),
        lit("PUT").as("op"), col("sequenceNumber"),
        gsi.projected.as("newImage"))
    SnapshotStore.mergeIntoTarget(spark, gsiDir, rows, batchId,
      keys = Seq("gsi_key", "ref_key"))
  }

  /** Spec oracle: the GSI recomputed from the base target's live state —
    * what the maintained index must equal after every drained batch.
    */
  def gsiRecompute(spark: SparkSession, baseDir: String,
                   gsi: GsiDef): DataFrame =
    SnapshotStore.readTarget(spark, baseDir)
      .filter(coalesce(gsi.present, lit(false)))
      .select(gsi.gsiKey.as("gsi_key"), col("keys").as("ref_key"),
        gsi.projected.as("newImage"))
}
