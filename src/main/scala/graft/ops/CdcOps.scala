package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's data plane as composable DataFrame transforms
  * (SURVEY §2 / §7.1 `ops/`). One semantics, two drivers: batch queries call
  * these directly; the streaming apply path reuses them inside foreachBatch.
  *
  * Scale notes (100 TB posture):
  *  - `lwwCompact` and `merge` each cost exactly one shuffle on the key
  *    columns; composed via `restoreReplay` Catalyst reuses the hash
  *    partitioning between the window and the join, so the full replay is
  *    shuffle-key-aligned rather than re-partitioning per step.
  *  - Nothing here collects to the driver; every operator is a declarative
  *    plan Catalyst can push filters through (the `ts <= T` snapshot
  *    predicate reaches the parquet scan).
  */
object CdcOps {

  /** A1 — content-based dedup (SQS `contentBasedDeduplication`,
    * cdk/lib/cdk-stack.ts:48). Exact-duplicate elimination by content
    * identity; map-side partial aggregation makes this cheap before the
    * expensive apply stage (the reference's queue-level placement).
    */
  def dedup(df: DataFrame, cols: Seq[String]): DataFrame =
    if (cols.isEmpty) df.dropDuplicates() else df.dropDuplicates(cols)

  /** A2/W1 — last-writer-wins compaction per key: FIFO replay of an ordered
    * buffer onto the same key keeps only the final event
    * (implied by cdk/lib/cdk-stack.ts:47 + in-order loop
    * app/lambdas/lambda-backfill/main.py:31-39). `order` must be a total
    * order within a key (sequenceNumber, or ts with a unique tiebreaker) —
    * per-key order is FIFO's actual contract; no global sort (SURVEY §7.4.2).
    */
  def lwwCompact(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Numeric order for a variable-length digit-string column (DynamoDB
    * stream sequence numbers: up to 40 digits, NOT fixed-width). The
    * value is canonicalized by stripping leading zeros (so zero-padded
    * and unpadded producers order consistently — "005" < "10"), then
    * compared by (length, value): for canonical non-negative integers
    * that IS numeric order, and it needs no Decimal(38) cast, which a
    * 40-digit sequence number would overflow. Plain lexicographic
    * comparison would rank "9" above "10".
    */
  def numericStringOrder(c: Column): Seq[Column] = {
    val stripped = ltrim(c, "0")
    // all-zeros ("000") strips to empty: canonicalize to "0"; genuinely
    // empty input stays empty (sorts below every real sequence number)
    val canon = when(length(stripped) === 0 && length(c) > 0, lit("0"))
      .otherwise(stripped)
    // the raw column is the final tiebreaker: two RENDERINGS of the same
    // value ("005" vs "5") tie on the canonical key, and lwwCompact's
    // row_number needs a total order over raw rows to stay deterministic
    Seq(length(canon), canon, length(c), c)
  }

  /** Scala-side mirror of [[numericStringOrder]] for the state-store
    * operators: orderable key with the same canonicalization.
    */
  def numericStringKey(s: String): (Int, String) = {
    val stripped = s.dropWhile(_ == '0')
    val canon = if (stripped.isEmpty && s.nonEmpty) "0" else stripped
    (canon.length, canon)
  }

  /** Orderable struct form of [[numericStringOrder]] for row-vs-row
    * comparison (struct comparison is field-lexicographic).
    */
  def numericStringStruct(c: Column): Column = struct(numericStringOrder(c): _*)

  /** J1-plus — sequence-guarded MERGE: like [[merge]], but the target
    * stores each key's last-applied sequence number and a delta row wins
    * ONLY when its sequence outranks the stored one (an absent target row
    * loses to any delta). A duplicate redelivery (sequence tie) or an
    * out-of-order stale PUT is a no-op, making the apply idempotent AND
    * monotone — checkpoint replay after a crash, or two files landing in
    * the same source mtime tick and being batched out of order, cannot
    * regress a key (strengthens SURVEY §2.9 T4).
    *
    * A winning DELETE drops the key; no tombstone is retained, so a stale
    * PUT arriving after a winning DELETE would resurrect the key. That is
    * the ordered-per-key source contract the reference itself assumes (it
    * routes every event through ONE FIFO message group,
    * cdk/lib/cdk-stack.ts:47); [[graft.streaming.CdcStream.statefulLatest]]
    * is the tombstone-keeping alternative when the contract is weaker.
    */
  def mergeLww(snapshot: DataFrame, delta: DataFrame, keys: Seq[String],
               opCol: String, seqCol: String, payload: Seq[String]): DataFrame = {
    val joined = snapshot.as("s").join(
      delta.as("d"), keys.map(k => col(s"s.$k") === col(s"d.$k")).reduce(_ && _),
      "full_outer")
    val dOp = col(s"d.$opCol")
    val sSeq = col(s"s.$seqCol")
    val deltaWins = dOp.isNotNull &&
      (sSeq.isNull || numericStringStruct(col(s"d.$seqCol")) > numericStringStruct(sSeq))
    // a winning DELETE drops the key; a losing delta keeps the target row
    val keep = !(deltaWins && dOp === "DELETE")
    val cols =
      keys.map(k => coalesce(col(s"d.$k"), col(s"s.$k")).as(k)) ++
        (seqCol +: payload).map(c =>
          when(deltaWins, col(s"d.$c")).otherwise(col(s"s.$c")).as(c))
    joined.filter(keep).select(cols: _*)
  }

  /** P7 — apply-plan projection: eventName != REMOVE => PUT(newImage) else
    * DELETE(keys) (app/lambdas/lambda-backfill/main.py:33-39). We implement
    * the evident intent — delete-by-key — not the reference's
    * `DeleteRequest.Item` bug (SURVEY §2.2 fidelity note).
    */
  def applyPlan(eventName: Column, removeValue: String = "REMOVE"): Column =
    when(eventName =!= removeValue, lit("PUT")).otherwise(lit("DELETE"))

  /** J1 — key-addressed MERGE: full-outer join of the target snapshot with a
    * compacted delta; PUT rows take the delta image, DELETE rows drop the
    * key, untouched keys keep the snapshot row
    * (semantics of batch_write_item, app/lambdas/lambda-backfill/main.py:44-46).
    *
    * `snapshot` and `delta` must share `keys` plus the payload columns.
    * `opCol` in delta is PUT|DELETE. At scale: sort-merge join on the keys;
    * when the delta is small relative to the snapshot AQE broadcasts it.
    * At 100 TB the target table should be BUCKETED by the key columns
    * (ScaleSpec proves the bucketed join runs with zero input exchanges):
    * then each micro-batch merge shuffles only the delta, never the
    * accumulated table.
    * Idempotent by construction — re-applying the same compacted delta
    * yields the same table (closes the reference's UnprocessedItems TODO,
    * SURVEY §2.9 T4).
    */
  def merge(snapshot: DataFrame, delta: DataFrame, keys: Seq[String],
            opCol: String, payload: Seq[String]): DataFrame = {
    // String-qualified refs: snapshot and delta usually share lineage
    // (both derive from the same CDC frame), so Dataset-column refs would
    // be ambiguous under Spark's self-join check.
    //
    // Plain `===` on the keys, NOT null-safe `<=>`: primary keys are
    // non-null by contract (DynamoDB key attributes cannot be null), and
    // `<=>` wraps the join keys in coalesce/isnull, which makes the
    // join's required partitioning incompatible with the LWW window's
    // hashpartitioning(keys) — costing an extra full shuffle per side.
    val joined = snapshot.as("s").join(
      delta.as("d"), keys.map(k => col(s"s.$k") === col(s"d.$k")).reduce(_ && _),
      "full_outer")
    val dOp = col(s"d.$opCol")
    val keep = dOp.isNull || dOp === "PUT" // DELETE drops the key
    val cols =
      keys.map(k => coalesce(col(s"d.$k"), col(s"s.$k")).as(k)) ++
        payload.map(c => when(dOp.isNotNull, col(s"d.$c")).otherwise(col(s"s.$c")).as(c))
    joined.filter(keep).select(cols: _*)
  }

  /** P6 — status projection: TableStatus==ACTIVE => SUCCEEDED else
    * IN PROGRESS (app/lambdas/check-ddb-status/main.py:26-28).
    */
  def statusCase(tableStatus: Column, activeValue: String = "ACTIVE"): Column =
    when(tableStatus === activeValue, lit("SUCCEEDED")).otherwise(lit("IN PROGRESS"))

  /** P4 — control-event predicate (EventBridge rule pattern,
    * cdk/lib/cdk-stack.ts:116-123): conjunctive equality over nested fields.
    */
  def controlEventMatch(df: DataFrame): DataFrame =
    df.filter(
      col("detail.eventSource") === "dynamodb.amazonaws.com" &&
        col("detail.eventName") === "RestoreTableToPointInTime" &&
        col("detailType") === "AWS API Call via CloudTrail" &&
        col("source") === "aws.dynamodb")

  /** The minimum end-to-end slice (SURVEY §7.2) on a CDC-shaped frame:
    * snapshot(ts<=T, LWW, tombstones dropped) ⊕ replay(ts>T, dedup, LWW,
    * PUT/DELETE merge). Exercises S7 P3 P7 A1 A2 W1 J1 O1 — the reference's
    * entire data plane.
    *
    * @param cdc   frame with key, order, op-discriminating and payload columns
    * @param keys  primary-key columns
    * @param tsCol event-time column; `asOf` splits snapshot vs buffer
    * @param order total order within key (ascending); latest wins
    * @param isRemove predicate marking tombstone events
    * @param payload state columns carried into the final table
    */
  def restoreReplay(cdc: DataFrame, keys: Seq[String], tsCol: Column,
                    asOf: Column, order: Seq[Column], isRemove: Column,
                    payload: Seq[String]): DataFrame = {
    val pre = cdc.filter(tsCol <= asOf)
    val snapshot = lwwCompact(pre, keys, order)
      .filter(!isRemove) // a key whose last pre-T event is a tombstone is absent from the snapshot
      .select((keys ++ payload).map(col): _*)
    val buffer = cdc.filter(tsCol > asOf)
    // No explicit dedup step: content dedup is SUBSUMED by LWW
    // compaction — exact duplicate deliveries share the key and the
    // order position, so the compaction survivor is invariant under
    // duplication (property-tested). The standalone dedup operator
    // remains part of the buffer-log surface (A1); dropping it here
    // saves a full-row shuffle on the replay path.
    val delta = lwwCompact(buffer, keys, order)
      .withColumn("op", when(isRemove, lit("DELETE")).otherwise(lit("PUT")))
      .select((keys ++ payload :+ "op").map(col): _*)
    merge(snapshot, delta, keys, "op", payload)
  }

  /** PITR snapshot diff: the per-key change set between two restore
    * points T1 < T2 — what a restore to T2 would apply on top of a
    * restore to T1 (the reference's PITR window, README.md:3,26, made
    * queryable). Classification per key: ADDED (live at T2 only),
    * REMOVED (live at T1 only), MODIFIED (live at both with a different
    * LWW winner); unchanged keys are absent from the output. Both
    * states come out of ONE hash aggregation over a single scan of the
    * log: a conditional max_by per cutoff (rows past a cutoff contribute
    * a NULL ordering value, which max_by skips), so the log shuffles
    * once with map-side partials — no window stage, no two-snapshot
    * join, cost O(|log| + |keys|) however far apart the cutoffs are.
    * A winner that is a tombstone marks the key absent at that cutoff
    * (same rule as [[restoreReplay]]'s snapshot side).
    */
  def snapshotDiff(cdc: DataFrame, keys: Seq[String], tsCol: Column,
                   asOf1: Column, asOf2: Column, order: Seq[Column],
                   isRemove: Column, payload: Seq[String]): DataFrame = {
    val image = struct((payload.map(col) :+ isRemove.as("__rm")): _*)
    def winner(cut: Column): Column =
      max_by(image, when(tsCol <= cut, struct(order: _*)))
    val agg = cdc.groupBy(keys.map(col): _*)
      .agg(winner(asOf1).as("__s1"), winner(asOf2).as("__s2"))
    val live1 = col("__s1").isNotNull && !col("__s1.__rm")
    val live2 = col("__s2").isNotNull && !col("__s2.__rm")
    val moved = payload.map(p => !(col(s"__s1.$p") <=> col(s"__s2.$p")))
      .reduce(_ || _)
    agg
      .withColumn("change",
        when(!live1 && live2, lit("ADDED"))
          .when(live1 && !live2, lit("REMOVED"))
          .when(live1 && live2 && moved, lit("MODIFIED")))
      .filter(col("change").isNotNull)
      .select(keys.map(col) ++ Seq(col("change")) ++
        payload.map(p => when(live1, col(s"__s1.$p")).as(s"old_$p")) ++
        payload.map(p => when(live2, col(s"__s2.$p")).as(s"new_$p")): _*)
  }

  /** Incremental view maintenance for a linear aggregate (count + sum)
    * grouped by `group` over the keyed table state: given the aggregate
    * materialized at time T and the raw CDC delta after T, produce the
    * aggregate of the POST-delta state without re-aggregating the table.
    *
    * The LWW-per-key semantic makes the update signed and local: a key
    * touched by the delta retracts its old contribution (-1 · old image,
    * read from `stateAtT` for just the touched keys — the GetItem-batch
    * pattern; on a key-bucketed target only the touched-key list
    * shuffles) and asserts its new one (+1 · the delta's per-key LWW
    * winner — post-T events always outrank the stored row, so the new
    * image never needs the old state). A winning tombstone contributes
    * retraction only; groups whose maintained count reaches 0 drop out.
    *
    * Cost: O(|delta| + |touched keys| + |groups|) — independent of table
    * size, which at 100 TB is the difference between maintaining a
    * dashboard per micro-batch and re-scanning the table. Exactness is
    * oracle-gated (`cdc_incremental_agg`): the maintained aggregate
    * hash-equals a full recompute of the final state in DuckDB.
    *
    * @param aggAtT   materialized aggregate at T: (grp, n_keys, m_sum)
    * @param stateAtT keyed table state at T (LWW-compacted, tombstones dropped)
    * @param delta    raw CDC events after T
    * @param group    grouping expression over a state/delta row
    * @param measure  long-typed measure expression over a state/delta row
    */
  def incrementalAggMaintain(aggAtT: DataFrame, stateAtT: DataFrame,
                             delta: DataFrame, keys: Seq[String],
                             order: Seq[Column], isRemove: Column,
                             group: Column, measure: Column): DataFrame = {
    val touched = delta.select(keys.map(col): _*).distinct()
    val retract = stateAtT.join(touched, keys, "left_semi")
      .select(group.as("grp"), measure.as("m"), lit(-1L).as("sign"))
    val assert_ = lwwCompact(delta, keys, order).filter(!isRemove)
      .select(group.as("grp"), measure.as("m"), lit(1L).as("sign"))
    val d = retract.unionByName(assert_)
      .groupBy("grp")
      .agg(sum(col("sign")).as("d_n"), sum(col("sign") * col("m")).as("d_m"))
    // string-qualified refs: aggAtT and d usually share lineage (both
    // derive from the same CDC frame), same rationale as in merge
    aggAtT.as("a").join(d.as("d"), col("a.grp") === col("d.grp"), "full_outer")
      .select(
        coalesce(col("a.grp"), col("d.grp")).as("grp"),
        (coalesce(col("a.n_keys"), lit(0L)) + coalesce(col("d.d_n"), lit(0L))).as("n_keys"),
        (coalesce(col("a.m_sum"), lit(0L)) + coalesce(col("d.d_m"), lit(0L))).as("m_sum"))
      .filter(col("n_keys") > 0)
  }

  /** Global-secondary-index maintenance plan from a CDC delta — the index
    * mutation set DynamoDB derives internally for every GSI on a base-table
    * write (public GSI semantics; the reference's restored table would carry
    * its GSIs through exactly this per-write plan during the replay at
    * app/lambdas/lambda-backfill/main.py:44-46):
    *
    *  - the index is SPARSE: an item participates only while `present`
    *    holds (the "item has the indexed attribute" rule);
    *  - an index-key MOVE is a DELETE(old key) + PUT(new key) pair;
    *  - a projected-attribute change under an unchanged index key is a
    *    bare PUT (the index item is rewritten in place);
    *  - a base-table REMOVE deletes the index entry iff one existed.
    *
    * Output: one row per index mutation — base keys, `op` (PUT|DELETE),
    * `gsi_key`, and the projected attributes (null on DELETE rows).
    * Only keys present in the delta produce rows, so the cost is
    * O(|delta| + touched keys): the delta LWW-compacts (one shuffle on the
    * base key), LEFT-joins the prior state on the same key (co-partitioned
    * with the window), and both mutation kinds come off ONE pass over the
    * joined rows (array-of-struct + explode, not a self-union that would
    * scan the join twice). At scale `stateAtT` is served by
    * `SnapshotStore.readKeysDf` point reads, not a state scan.
    *
    * @param stateAtT   base-table state at T (LWW-compacted, tombstones dropped)
    * @param delta      raw CDC events after T
    * @param keys       base-table key columns
    * @param order      per-key total order
    * @param isRemove   tombstone predicate over a delta row
    * @param gsiKey     index partition-key expression over a state/delta row
    * @param present    sparse-index membership predicate over a state/delta
    *                   row (null ⇒ absent — the missing-attribute rule)
    * @param projection projected attributes carried into the index item
    *                   (nulled on DELETE rows)
    * @param carry      columns evaluated over the delta's per-key winner and
    *                   carried on BOTH mutation kinds (provenance — e.g. the
    *                   winning sequence number the streaming face stamps its
    *                   merges with)
    */
  def gsiDelta(stateAtT: DataFrame, delta: DataFrame, keys: Seq[String],
               order: Seq[Column], isRemove: Column,
               gsiKey: Column, present: Column,
               projection: Seq[(String, Column)],
               carry: Seq[(String, Column)] = Nil): DataFrame = {
    val projNames = projection.map(_._1)
    val carryNames = carry.map(_._1)
    val newSide = lwwCompact(delta, keys, order)
      .select(keys.map(col) ++ Seq(
        (!isRemove && coalesce(present, lit(false))).as("__new_present"),
        gsiKey.as("__new_key")) ++
        projection.map { case (n, c) => c.as(s"__p_$n") } ++
        carry.map { case (n, c) => c.as(n) }: _*)
    val oldSide = stateAtT
      .select(keys.map(col) ++ Seq(
        coalesce(present, lit(false)).as("__old_present"),
        gsiKey.as("__old_key")): _*)
    val joined = newSide.join(oldSide, keys, "left")
      .withColumn("__old_present", coalesce(col("__old_present"), lit(false)))
    val putStruct = when(col("__new_present"),
      struct(lit("PUT").as("op") +: col("__new_key").as("gsi_key") +:
        projNames.map(n => col(s"__p_$n").as(n)): _*))
    val delStruct = when(
      col("__old_present") &&
        // null-safe compare: a NULL gsi_key on either side must still
        // count as a key move — plain =!= yields NULL and would drop the
        // DELETE, stranding the old index entry forever
        (!col("__new_present") || !(col("__old_key") <=> col("__new_key"))),
      struct(lit("DELETE").as("op") +: col("__old_key").as("gsi_key") +:
        projNames.map(n =>
          // typed null of the projection column's type, without resolving
          // the expression here (analysis supplies the type)
          when(lit(false), col(s"__p_$n")).as(n)): _*))
    joined
      .select(keys.map(col) ++ carryNames.map(col) :+
        explode(filter(array(delStruct, putStruct), x => x.isNotNull)).as("__m"): _*)
      .select(keys.map(col) ++
        (Seq("op", "gsi_key") ++ projNames).map(n => col(s"__m.$n").as(n)) ++
        carryNames.map(col): _*)
  }
}
