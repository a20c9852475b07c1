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
                     bTarget: String, vTarget: String, batchId: Long,
                     retainVersions: Int = 2): Unit = {
    SnapshotStore.mergeIntoTarget(spark, aTarget,
      aDelta.select(col("keys"), col("op"), col("sequenceNumber"),
        when(col("op") =!= "DELETE",
          to_json(struct(col("fk"), col("a_image")))).as("newImage")),
      batchId, retainVersions = retainVersions)
    val bState = SnapshotStore.readTarget(spark, bTarget)
    val puts = enriched(
      aDelta.filter(col("op") =!= "DELETE")
        .select("keys", "op", "sequenceNumber", "fk", "a_image"), bState)
    val dels = aDelta.filter(col("op") === "DELETE")
      .select(col("keys"), col("op"), col("sequenceNumber"),
        lit(null: String).as("newImage"))
    SnapshotStore.mergeIntoTarget(spark, vTarget, puts.unionByName(dels),
      batchId, retainVersions = retainVersions)
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
  // Indexed maintenance (r7, distributed r8): a SECOND store target
  // holds the REVERSE index fk → [referencing A-keys], maintained
  // alongside the view, so the dim-side path needs NO view scan at all
  // — every step is a delta-bounded point read against the store's
  // bucket layout. The index is itself just a store table: LWW rows
  // keyed by fk whose image is the sorted key list (JSON array, written
  // with to_json / read with from_json — keys containing `,` or `"`
  // survive the round trip). EVERY membership step is a DataFrame op
  // ([[SnapshotStore.readKeysDf]] semi-joins, anti-join removal,
  // collect_set rebuild): the only driver-side materialization anywhere
  // on the path is the distinct-bucket-id set inside readKeysDf
  // (≤ numBuckets ints, table-constant), so a backfill-sized delta —
  // the reference's own lambda-backfill replay workload — streams
  // through without ever landing on the driver.
  // Extreme fan-out (r8): `indexShards > 1` shards each fk's
  // membership over `fk#<hash(member) mod shards>` rows — a hot fk's
  // list spreads over bounded shards instead of one giant LWW row,
  // at the cost of delta × shards point reads on the dim path
  // (JoinIvmSpec's hot-fk case pins spread + exactness). Pick the
  // shard count once per view (it is part of the index layout).
  // ───────────────────────────────────────────────────────────────────

  private val aImageSchema =
    org.apache.spark.sql.types.StructType.fromDDL("fk STRING, a_image STRING")
  private val vImageSchema =
    org.apache.spark.sql.types.StructType.fromDDL("fk STRING, a_image STRING, b_image STRING")
  private val keyListSchema = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StringType)

  /** Index-row key for a (fk, member) pair: the fk itself at
    * `indexShards = 1`, else `fk#<xxhash64(member) mod shards>` — the
    * hot-bucket sharding the r7 caveat prescribed. A member's shard is
    * a pure function of the member key, so additions, removals, and
    * rebuilds all address the same sharded row without coordination;
    * an extreme-fan-out fk's membership spreads over `indexShards` LWW
    * rows instead of one giant list, and the dim-side fan-out reads
    * all shards of each touched fk (delta × shards point reads —
    * control-plane sized).
    */
  private def idxKeyCol(fk: Column, member: Column, indexShards: Int): Column =
    if (indexShards <= 1) fk
    else concat(fk, lit("#"),
      pmod(xxhash64(member), lit(indexShards.toLong)).cast("string"))

  /** [[applyFactDelta]] + reverse-index maintenance, fully distributed.
    *
    * Membership moves: each delta key leaves its PRIOR fk's posting
    * list (on delete or re-point) and joins its new fk's (on put); the
    * prior fks come from a point read of A's PRE-MERGE state. Touched
    * lists are rebuilt as DataFrame ops: current members (from_json +
    * explode) minus removals (anti-join) plus additions, re-aggregated
    * per fk with collect_set → to_json. Index rows are stamped
    * `seqBase-fk`; a replayed batch (same seqBase) re-derives the SAME
    * stamps, so the store's LWW merge folds it idempotently.
    *
    * MERGE ORDER is the crash-consistency argument: the INDEX merges
    * FIRST, then A, then the view (inside [[applyFactDelta]]). The
    * prior-fk read keys off A, so the replay of a batch torn at any
    * point re-derives exactly the crashed attempt's index delta:
    *  - torn after the index merge → A is still pre-batch, the replay
    *    computes identical removals/additions and the identical-stamp
    *    merge is a no-op; A and the view then catch up;
    *  - torn after the A merge → the index already committed this
    *    batch's moves (it merged first), the replay's removal set is
    *    empty (old == new) and its addition rebuilds reproduce the
    *    committed lists verbatim; the view then catches up.
    * Were A merged first (the r7 order), a torn batch's replay would
    * read old == new, never emit the removal, and strand the key in its
    * pre-crash fk's posting list FOREVER — the index-first order is
    * what makes "replays repair all three targets" actually true.
    */
  def applyFactDeltaIndexed(spark: SparkSession, aDelta: DataFrame, aTarget: String,
                            bTarget: String, vTarget: String, iTarget: String,
                            batchId: Long, seqBase: String,
                            indexShards: Int = 1,
                            retainVersions: Int = 2): Unit = {
    // collapse the batch to each key's LWW winner first (a PUT and a
    // DELETE for one key can share a micro-batch; membership moves must
    // follow the winner the store's own merge will keep, same
    // numeric-string order) — distributed, and pinned (localCheckpoint)
    // because the winner set feeds three downstream consumers
    val winners = CdcOps.lwwCompact(
      aDelta.select("keys", "op", "fk", "sequenceNumber"),
      Seq("keys"), CdcOps.numericStringOrder(col("sequenceNumber")))
      .localCheckpoint(true)
    try {
      // prior fk of every delta key, from A's PRE-merge state (bucket-
      // pruned point read; semi-join keeps the lookup set off the driver)
      val oldFk = SnapshotStore.readKeysDf(spark, aTarget, winners.select("keys"))
        .select(col("keys"),
          from_json(col("newImage"), aImageSchema).getField("fk").as("old_fk"))
      val moves = winners.join(oldFk, Seq("keys"), "left").localCheckpoint(true)
      try {
        val removals = moves
          .filter(col("old_fk").isNotNull &&
            (col("op") === "DELETE" || !(col("old_fk") <=> col("fk"))))
          .select(idxKeyCol(col("old_fk"), col("keys"), indexShards).as("ikey"),
            col("keys"))
        val additions = moves
          .filter(col("op") =!= "DELETE" && col("fk").isNotNull)
          .select(idxKeyCol(col("fk"), col("keys"), indexShards).as("ikey"),
            col("keys"))
        val touchedFks = removals.select("ikey").unionByName(additions.select("ikey"))
          .distinct().localCheckpoint(true)
        try {
          // rebuild: stored members of the touched lists, minus this
          // batch's removals, plus its additions — one anti-join, one
          // union, one collect_set aggregation, all key-partitioned
          val currentMembers = SnapshotStore
            .readKeysDf(spark, iTarget, touchedFks.withColumnRenamed("ikey", "keys"))
            .select(col("keys").as("ikey"),
              explode(from_json(col("newImage"), keyListSchema)).as("keys"))
          val members = currentMembers.join(removals, Seq("ikey", "keys"), "left_anti")
            .unionByName(additions).distinct()
          val rebuilt = touchedFks.join(
            members.groupBy("ikey")
              .agg(to_json(sort_array(collect_set(col("keys")))).as("img")),
            Seq("ikey"), "left")
          val idxDelta = rebuilt.select(
            col("ikey").as("keys"),
            when(col("img").isNull, lit("DELETE")).otherwise(lit("PUT")).as("op"),
            concat(lit(seqBase), lit("-"), col("ikey")).as("sequenceNumber"),
            col("img").as("newImage"))
            .localCheckpoint(true)
          try {
            // index FIRST (see merge-order contract above), then A + view
            if (!idxDelta.isEmpty)
              SnapshotStore.mergeIntoTarget(spark, iTarget, idxDelta, batchId,
                retainVersions = retainVersions)
            applyFactDelta(spark, aDelta, aTarget, bTarget, vTarget, batchId,
              retainVersions)
          } finally { idxDelta.unpersist(); () }
        } finally { touchedFks.unpersist(); () }
      } finally { moves.unpersist(); () }
    } finally { winners.unpersist(); () }
  }

  /** [[applyDimDelta]] with the reverse index: the touched view rows
    * come from index point reads (fk → key list, from_json + explode)
    * followed by view point reads — NO view scan anywhere; cost is
    * delta + fan-out, and the fan-out set stays a DataFrame end to end
    * (a hot dim key referenced by millions of facts never lands on the
    * driver).
    */
  def applyDimDeltaIndexed(spark: SparkSession, bDelta: DataFrame,
                           bTarget: String, vTarget: String, iTarget: String,
                           batchId: Long, indexShards: Int = 1,
                           retainVersions: Int = 2): Unit = {
    SnapshotStore.mergeIntoTarget(spark, bTarget, bDelta, batchId,
      retainVersions = retainVersions)
    // sharded index: every shard row of each touched fk is a candidate
    // (delta × shards lookups — still delta-bounded)
    val lookups =
      if (indexShards <= 1) bDelta.select("keys")
      else bDelta.select("keys").distinct()
        .crossJoin(spark.range(indexShards.toLong).select(col("id").as("__sh")))
        .select(concat(col("keys"), lit("#"), col("__sh").cast("string")).as("keys"))
    val refKeys = SnapshotStore.readKeysDf(spark, iTarget, lookups)
      .select(explode(from_json(col("newImage"), keyListSchema)).as("keys"))
      .localCheckpoint(true)
    try {
      val touched = SnapshotStore.readKeysDf(spark, vTarget, refKeys)
        .select(col("keys"), col("sequenceNumber"),
          from_json(col("newImage"), vImageSchema).as("v"))
        .select(col("keys"), col("sequenceNumber"),
          col("v.fk").as("fk"), col("v.a_image").as("a_image"))
        .withColumn("op", lit("PUT"))
        .withColumn("sequenceNumber", refreshSeq)
        .localCheckpoint(true)
      try {
        if (!touched.isEmpty) {
          val bState = SnapshotStore.readTarget(spark, bTarget)
          SnapshotStore.mergeIntoTarget(spark, vTarget,
            enriched(touched, bState), batchId,
            retainVersions = retainVersions)
        }
      } finally { touched.unpersist(); () }
    } finally { refKeys.unpersist(); () }
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
    * Torn-batch window: one micro-batch merges THREE targets (index,
    * A, view — in that order) and those merges are individually atomic
    * but not jointly — a crash (or non-graceful stop) between them
    * leaves the trio torn until the uncommitted batch REPLAYS on
    * restart and its idempotent merges repair ALL three: the
    * index-first order makes the replay re-derive the crashed
    * attempt's exact index delta from A's pre-merge state (the full
    * argument is [[applyFactDeltaIndexed]]'s merge-order contract).
    * Operational rule, as for any multi-target transactionless
    * pipeline: run control-plane dim maintenance
    * ([[applyDimDeltaIndexed]]) at a QUIESCED boundary (sink drained
    * or gracefully stopped), never against a torn trio — a dim update
    * issued inside the torn window can miss the torn batch's rows
    * until it replays.
    *
    * GROUP MODE (r13, VERDICT r12 #3): pass `groupDir` and the torn
    * window becomes INVISIBLE to readers — after each batch's last
    * merge the sink publishes one
    * [[graft.streaming.GroupCommit]] record naming all participants'
    * just-committed versions; readers resolving through
    * `GroupCommit.read` see the last COMPLETE batch's version set (the
    * crash-injection drill in CommitProtocolSpec tears the trio at the
    * fact pointer swap and proves group readers still see the previous
    * batch everywhere, index included). Group mode raises the merges'
    * retainVersions to 3 so the previous record stays readable through
    * a crash+replay cycle.
    */
  def factSink(factCdc: DataFrame, aTarget: String, bTarget: String,
               vTarget: String, iTarget: String, checkpoint: String,
               trigger: org.apache.spark.sql.streaming.Trigger =
                 org.apache.spark.sql.streaming.Trigger.AvailableNow(),
               indexShards: Int = 1,
               groupDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    factCdc.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // group mode (r13): retention floor 3 keeps the PREVIOUS group
        // record's versions readable through a crash+replay cycle (two
        // publishes per participant per group interval, worst case)
        applyFactDeltaIndexed(batch.sparkSession, batch,
          aTarget, bTarget, vTarget, iTarget, batchId,
          seqBase = f"sb$batchId%012d", indexShards = indexShards,
          retainVersions = if (groupDir.isDefined) 3 else 2)
        groupDir.foreach(g => graft.streaming.GroupCommit.publish(
          batch.sparkSession, g, batchId,
          Seq(iTarget, aTarget, vTarget, bTarget)))
        ()
      }
      .trigger(trigger)
      .start()

  /** Streaming maintenance for BOTH sides (r8): one checkpointed sink
    * consumes a UNION stream of fact CDC and dim CDC, tagged by a
    * `channel` column — the reference's live-retarget semantics
    * (initiate-lambda-backfill retargets config while the stream runs)
    * without [[factSink]]'s quiesced-boundary rule for dim changes.
    *
    * Why a union channel instead of a second concurrent sink: two
    * independent sinks race on the view — a fact batch that resolved
    * B's state BEFORE a concurrent dim batch merged B, but merged the
    * view AFTER that dim batch's refresh pass, writes a stale
    * enrichment that nothing ever repairs (the refresh fan-out ran
    * before the fact row existed). Funneling both channels through ONE
    * foreachBatch serializes them; within a batch DIMS APPLY FIRST, so
    * the batch's facts enrich against its own dim updates — arrival
    * order across channels inside one micro-batch is undefined anyway,
    * and dim-first makes the merged outcome deterministic.
    *
    * Crash consistency: the dim half ([[applyDimDeltaIndexed]] — LWW
    * B merge + content-stable refresh stamps) and the fact half
    * ([[applyFactDeltaIndexed]] — the index-first merge-order
    * contract) are each replay-idempotent, so a batch torn anywhere,
    * including between the halves, is repaired by its replay.
    *
    * `cdc` schema: keys, op, sequenceNumber, channel ('fact'|'dim'),
    * fk, a_image (fact rows), newImage (dim rows).
    */
  def dualSink(cdc: DataFrame, aTarget: String, bTarget: String,
               vTarget: String, iTarget: String, checkpoint: String,
               trigger: org.apache.spark.sql.streaming.Trigger =
                 org.apache.spark.sql.streaming.Trigger.AvailableNow(),
               indexShards: Int = 1,
               groupDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    cdc.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val retain = if (groupDir.isDefined) 3 else 2
        // pin the micro-batch ONCE (the applySink discipline): both
        // channel filters read the checkpointed blocks, not the source
        val full = batch.localCheckpoint(true)
        try {
          val dims = full.filter(col("channel") === "dim")
            .select("keys", "op", "sequenceNumber", "newImage")
          if (!dims.isEmpty)
            applyDimDeltaIndexed(spark, dims, bTarget, vTarget, iTarget, batchId,
              indexShards = indexShards, retainVersions = retain)
          val facts = full.filter(col("channel") === "fact")
            .select("keys", "op", "sequenceNumber", "fk", "a_image")
          if (!facts.isEmpty)
            applyFactDeltaIndexed(spark, facts, aTarget, bTarget, vTarget,
              iTarget, batchId, seqBase = f"sb$batchId%012d",
              indexShards = indexShards, retainVersions = retain)
          groupDir.foreach(g => graft.streaming.GroupCommit.publish(
            spark, g, batchId, Seq(iTarget, aTarget, vTarget, bTarget)))
        } finally { full.unpersist(); () }
        ()
      }
      .trigger(trigger)
      .start()

  /** The true reverse mapping (the index spec's oracle): fk → sorted
    * referencing keys from A's current state, rendered with the same
    * to_json the maintenance path writes (so JSON-hostile keys compare
    * exactly). Driver-side map: a SPEC oracle, |distinct fk| rows.
    */
  def indexRecompute(spark: SparkSession, aTarget: String,
                     indexShards: Int = 1): Map[String, String] =
    SnapshotStore.readTarget(spark, aTarget)
      .select(col("keys"),
        from_json(col("newImage"), aImageSchema).getField("fk").as("fk"))
      .filter(col("fk").isNotNull)
      .groupBy(idxKeyCol(col("fk"), col("keys"), indexShards).as("ikey"))
      .agg(to_json(sort_array(collect_set(col("keys")))).as("img"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

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
