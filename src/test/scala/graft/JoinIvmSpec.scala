package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.JoinIvm
import graft.streaming.SnapshotStore

/** Incrementally maintained join view (SURVEY §2.11 T11+): after every
  * maintenance batch — fact-side upserts/deletes, dim-side updates and
  * deletes, and a replayed (duplicate) batch — the maintained view must
  * EQUAL the full A ⟕ B recompute from the base states. Each batch's
  * cost is the delta plus the touched view rows, never the whole view.
  */
class JoinIvmSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toFile.getAbsolutePath

  test("maintained join view equals full recompute across interleaved fact/dim batches") {
    import spark.implicits._
    val aT = tmp("jivm-a"); val bT = tmp("jivm-b"); val vT = tmp("jivm-v")

    def aDelta(rows: (String, String, String, String, String)*) =
      rows.toDF("keys", "op", "sequenceNumber", "fk", "a_image")
    def bDelta(rows: (String, String, String, String)*) =
      rows.toDF("keys", "op", "sequenceNumber", "newImage")
    def viewState() = SnapshotStore.readTarget(spark, vT)
      .select("keys", "newImage").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    def oracle() = JoinIvm.fullRecompute(spark, aT, bT)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    def check(stage: String): Unit = {
      val (got, want) = (viewState(), oracle())
      assert(got === want, s"$stage: maintained view diverged from recompute")
    }

    // batch 0: dims first
    SnapshotStore.mergeIntoTarget(spark, bT,
      bDelta(("d1", "PUT", "001", "dim-one"), ("d2", "PUT", "002", "dim-two")), 0L)
    // batch 1: facts referencing both dims (plus one dangling fk)
    JoinIvm.applyFactDelta(spark,
      aDelta(("a1", "PUT", "101", "d1", "fact-a1"),
        ("a2", "PUT", "102", "d2", "fact-a2"),
        ("a3", "PUT", "103", "d9", "fact-a3")), aT, bT, vT, 1L)
    check("after initial facts")
    assert(viewState().size === 3)

    // batch 2: dim UPDATE — only a1 (the d1-referencing row) re-enriches
    JoinIvm.applyDimDelta(spark,
      bDelta(("d1", "PUT", "201", "dim-one-v2")), bT, vT, 2L)
    check("after dim update")
    assert(viewState()("a1").contains("dim-one-v2"))
    assert(viewState()("a2").contains("dim-two"))

    // batch 3: fact update re-pointing a2's fk, and a fact delete
    JoinIvm.applyFactDelta(spark,
      aDelta(("a2", "PUT", "301", "d1", "fact-a2-v2"),
        ("a3", "DELETE", "302", null, null)), aT, bT, vT, 3L)
    check("after fact repoint + delete")
    assert(viewState().size === 2 && viewState()("a2").contains("dim-one-v2"))

    // batch 4: dim DELETE — referencing rows stay, null-enriched (left join)
    JoinIvm.applyDimDelta(spark,
      bDelta(("d1", "DELETE", "401", null)), bT, vT, 4L)
    check("after dim delete")
    assert(!viewState()("a1").contains("b_image\":\"dim"))

    // batch 5: REPLAY of batch 3 (at-least-once delivery) — the
    // seq-guarded merge folds it idempotently; the view must not move
    val before = viewState()
    JoinIvm.applyFactDelta(spark,
      aDelta(("a2", "PUT", "301", "d1", "fact-a2-v2"),
        ("a3", "DELETE", "302", null, null)), aT, bT, vT, 5L)
    // a2's replayed enrichment re-reads TODAY's dim state (d1 deleted),
    // but its older sequence loses to nothing newer — LWW keeps the
    // replay from resurrecting or corrupting anything
    check("after replayed fact batch")
    assert(viewState().keySet === before.keySet)
  }

  test("indexed maintenance: reverse index stays exact; dim path is point-read only") {
    import spark.implicits._
    val aT = tmp("jivmx-a"); val bT = tmp("jivmx-b")
    val vT = tmp("jivmx-v"); val iT = tmp("jivmx-i")

    def aDelta(rows: (String, String, String, String, String)*) =
      rows.toDF("keys", "op", "sequenceNumber", "fk", "a_image")
    def bDelta(rows: (String, String, String, String)*) =
      rows.toDF("keys", "op", "sequenceNumber", "newImage")
    def viewState() = SnapshotStore.readTarget(spark, vT)
      .select("keys", "newImage").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    def indexState() = SnapshotStore.readTarget(spark, iT)
      .select("keys", "newImage").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    def check(stage: String): Unit = {
      // the view equals the full recompute AND the index equals the true
      // reverse mapping — after every single batch
      val want = JoinIvm.fullRecompute(spark, aT, bT)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(viewState() === want, s"$stage: view diverged")
      assert(indexState() === JoinIvm.indexRecompute(spark, aT),
        s"$stage: index diverged")
    }

    SnapshotStore.mergeIntoTarget(spark, bT,
      bDelta(("d1", "PUT", "001", "dim-one"), ("d2", "PUT", "002", "dim-two")), 0L)
    JoinIvm.applyFactDeltaIndexed(spark,
      aDelta(("a1", "PUT", "101", "d1", "f1"),
        ("a2", "PUT", "102", "d1", "f2"),
        ("a3", "PUT", "103", "d2", "f3")), aT, bT, vT, iT, 1L, seqBase = "101")
    check("seed")
    assert(indexState()("d1") === "[\"a1\",\"a2\"]")

    // re-point a2: d1 -> d2 (leaves one list, joins the other)
    JoinIvm.applyFactDeltaIndexed(spark,
      aDelta(("a2", "PUT", "201", "d2", "f2v2")), aT, bT, vT, iT, 2L, seqBase = "201")
    check("re-point")
    assert(indexState()("d1") === "[\"a1\"]" && indexState()("d2") === "[\"a2\",\"a3\"]")

    // delete a1: d1's list empties and its index row disappears
    JoinIvm.applyFactDeltaIndexed(spark,
      aDelta(("a1", "DELETE", "301", null, null)), aT, bT, vT, iT, 3L, seqBase = "301")
    check("fact delete")
    assert(!indexState().contains("d1"))

    // dim update through the INDEX path: only d2's referencing rows
    // (a2, a3) re-enrich — via point reads, no view scan
    JoinIvm.applyDimDeltaIndexed(spark,
      bDelta(("d2", "PUT", "401", "dim-two-v2")), bT, vT, iT, 4L)
    check("indexed dim update")
    assert(viewState()("a2").contains("dim-two-v2"))
    assert(viewState()("a3").contains("dim-two-v2"))

    // dim update for a now-unreferenced key: index has no row, the
    // path touches nothing, nothing breaks
    JoinIvm.applyDimDeltaIndexed(spark,
      bDelta(("d1", "PUT", "501", "dim-one-v9")), bT, vT, iT, 5L)
    check("unreferenced dim update")
  }

  test("streaming fact sink: checkpointed drain, quiesced dim update, resumed drain") {
    import spark.implicits._
    val aT = tmp("jivms-a"); val bT = tmp("jivms-b")
    val vT = tmp("jivms-v"); val iT = tmp("jivms-i")
    val in = tmp("jivms-in"); val ckpt = tmp("jivms-ckpt")

    SnapshotStore.mergeIntoTarget(spark, bT,
      Seq(("d1", "PUT", "001", "dim-one"), ("d2", "PUT", "002", "dim-two"))
        .toDF("keys", "op", "sequenceNumber", "newImage"), 0L)
    // 60 fact events over 20 keys: upserts, re-points (parity of i%2
    // differs across a key's events when i%20 repeats with different
    // halves), and late deletes
    val facts = (1 to 60).map { i =>
      (s"a${i % 20}", if (i > 50 && i % 7 == 0) "DELETE" else "PUT",
        f"$i%04d", s"d${1 + (i % 2)}", s"f$i")
    }
    def writeChunk(chunk: Seq[(String, String, String, String, String)], part: Int): Unit =
      chunk.toDF("keys", "op", "sequenceNumber", "fk", "a_image")
        .coalesce(1).write.mode("append").parquet(in)
    val schema = {
      writeChunk(facts.take(30), 0)
      spark.read.parquet(in).schema
    }
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)

    def check(stage: String): Unit = {
      val want = JoinIvm.fullRecompute(spark, aT, bT)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val got = SnapshotStore.readTarget(spark, vT)
        .select("keys", "newImage").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got === want, s"$stage: view diverged")
      val idx = SnapshotStore.readTarget(spark, iT)
        .select("keys", "newImage").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(idx === JoinIvm.indexRecompute(spark, aT), s"$stage: index diverged")
    }

    // phase 1: drain the first half to a QUIESCED boundary
    // (AvailableNow terminates when caught up — the graceful stop)
    val q1 = JoinIvm.factSink(stream(), aT, bT, vT, iT, ckpt)
    q1.awaitTermination(120000)
    check("after phase-1 drain")

    // control-plane dim update at the quiesced boundary (the
    // operational rule the factSink doc states: never inside a torn
    // batch) — through the indexed point-read path
    JoinIvm.applyDimDeltaIndexed(spark,
      Seq(("d1", "PUT", "9000", "dim-one-v2"))
        .toDF("keys", "op", "sequenceNumber", "newImage"),
      bT, vT, iT, 9000L)
    check("after quiesced dim update")
    assert(SnapshotStore.readTarget(spark, vT)
      .filter(col("newImage").contains("\"fk\":\"d1\""))
      .collect().forall(_.getAs[String]("newImage").contains("dim-one-v2")))

    // phase 2: second half lands, SAME checkpoint resumes and drains it
    writeChunk(facts.drop(30), 1)
    val q2 = JoinIvm.factSink(stream(), aT, bT, vT, iT, ckpt)
    q2.awaitTermination(120000)
    check("after resumed drain")
    assert(SnapshotStore.readTarget(spark, vT).count() > 0)
  }

  test("dual sink: dim updates arrive MID-DRAIN (no quiesce) and the view tracks recompute") {
    import spark.implicits._
    val aT = tmp("jivmd-a"); val bT = tmp("jivmd-b")
    val vT = tmp("jivmd-v"); val iT = tmp("jivmd-i")
    val in = tmp("jivmd-in"); val ckpt = tmp("jivmd-ckpt")

    SnapshotStore.mergeIntoTarget(spark, bT,
      Seq(("d1", "PUT", "001", "dim-one"), ("d2", "PUT", "002", "dim-two"))
        .toDF("keys", "op", "sequenceNumber", "newImage"), 0L)

    // one unioned CDC schema; channel routes each row inside the sink
    def factRows(rows: (String, String, String, String, String)*) =
      rows.map { case (k, op, sq, fk, img) =>
        (k, op, sq, "fact", fk, img, null: String) }
    def dimRows(rows: (String, String, String, String)*) =
      rows.map { case (k, op, sq, img) =>
        (k, op, sq, "dim", null: String, null: String, img) }
    def writeChunk(rows: Seq[(String, String, String, String, String, String, String)]): Unit = {
      rows.toDF("keys", "op", "sequenceNumber", "channel", "fk", "a_image", "newImage")
        .coalesce(1).write.mode("append").parquet(in)
      Thread.sleep(5) // distinct mtimes: one file = one micro-batch, in order
    }
    // interleaved channels: dim updates land BETWEEN fact batches of the
    // SAME uninterrupted drain — the live-retarget case factSink forbids
    writeChunk(factRows(
      ("a1", "PUT", "0101", "d1", "f1"), ("a2", "PUT", "0102", "d1", "f2"),
      ("a3", "PUT", "0103", "d2", "f3"), ("a4", "PUT", "0104", "d2", "f4")))
    writeChunk(dimRows(("d1", "PUT", "0201", "dim-one-v2")))
    writeChunk(factRows(
      ("a1", "PUT", "0301", "d2", "f1v2"),   // re-point across the refresh
      ("a5", "PUT", "0302", "d1", "f5"),     // new ref to the updated dim
      ("a3", "DELETE", "0303", null, null)))
    writeChunk(dimRows(("d2", "DELETE", "0401", null))) // null-enrich refs
    writeChunk(factRows(("a6", "PUT", "0501", "d2", "f6"))) // ref to deleted dim

    val schema = spark.read.parquet(in).schema
    val q = JoinIvm.dualSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in),
      aT, bT, vT, iT, ckpt)
    q.awaitTermination(180000)

    val view = SnapshotStore.readTarget(spark, vT).select("keys", "newImage")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = JoinIvm.fullRecompute(spark, aT, bT)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(view === want, "view diverged under mid-drain dim updates")
    val idx = SnapshotStore.readTarget(spark, iT).select("keys", "newImage")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(idx === JoinIvm.indexRecompute(spark, aT), "index diverged under dual sink")
    // a2 was enriched with dim-one BEFORE the dim update and never
    // touched by a later fact — only the mid-drain refresh can explain v2
    assert(view("a2").contains("dim-one-v2"), "mid-drain dim refresh missed a2")
    // a4 referenced d2, deleted mid-drain: left-join null enrichment
    assert(view("a4").contains("\"b_image\":null") || !view("a4").contains("dim-two"),
      "a4 kept a deleted dim's enrichment")

    // resume the SAME checkpoint with more of both channels — replay
    // safety and continued maintenance across a restart
    writeChunk(dimRows(("d1", "PUT", "0601", "dim-one-v3")))
    writeChunk(factRows(("a7", "PUT", "0701", "d1", "f7")))
    val q2 = JoinIvm.dualSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in),
      aT, bT, vT, iT, ckpt)
    q2.awaitTermination(180000)
    val view2 = SnapshotStore.readTarget(spark, vT).select("keys", "newImage")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want2 = JoinIvm.fullRecompute(spark, aT, bT)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(view2 === want2, "view diverged after resumed dual drain")
    assert(view2("a2").contains("dim-one-v3"))
  }

  test("index posting lists survive keys containing JSON-hostile characters") {
    import spark.implicits._
    val aT = tmp("jivmj-a"); val bT = tmp("jivmj-b")
    val vT = tmp("jivmj-v"); val iT = tmp("jivmj-i")
    def aDelta(rows: (String, String, String, String, String)*) =
      rows.toDF("keys", "op", "sequenceNumber", "fk", "a_image")
    def indexState() = SnapshotStore.readTarget(spark, iT)
      .select("keys", "newImage").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    SnapshotStore.mergeIntoTarget(spark, bT,
      Seq(("d1", "PUT", "001", "dim-one")).toDF("keys", "op", "sequenceNumber", "newImage"), 0L)
    // keys carrying the exact characters a split(",")/strip-quotes parser
    // corrupts: embedded commas, embedded double quotes, both
    val k1 = """a,1"""; val k2 = """a"2"""; val k3 = """a","3"""
    JoinIvm.applyFactDeltaIndexed(spark,
      aDelta((k1, "PUT", "101", "d1", "f1"),
        (k2, "PUT", "102", "d1", "f2"),
        (k3, "PUT", "103", "d1", "f3")), aT, bT, vT, iT, 1L, seqBase = "101")
    assert(indexState() === JoinIvm.indexRecompute(spark, aT), "hostile keys corrupted the index")
    // the stored list must round-trip to EXACTLY the three keys — a
    // naive parser would shred k3 into fragments
    val listed = spark.range(1).select(
      explode(from_json(lit(indexState()("d1")),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))).as("k"))
      .collect().map(_.getString(0)).toSet
    assert(listed === Set(k1, k2, k3))
    // re-point one hostile key: removal must match it exactly
    JoinIvm.applyFactDeltaIndexed(spark,
      aDelta((k3, "DELETE", "201", null, null)), aT, bT, vT, iT, 2L, seqBase = "201")
    assert(indexState() === JoinIvm.indexRecompute(spark, aT), "hostile-key removal missed")
  }

  /** Hold a target's cross-JVM writer lock directly (fresh mtime, so it
    * is not stale-breakable) and shorten the session's lock wait — the
    * next merge against that target throws LockTimeoutException,
    * tearing the batch at EXACTLY that merge. This drives the REAL
    * code path into each torn state, no test seams.
    */
  private def withMergeCrash(target: String)(body: => Unit): Unit = {
    val lockFile = new java.io.File(target, SnapshotStore.LockFile)
    java.nio.file.Files.write(lockFile.toPath, "torn-batch-test".getBytes)
    spark.conf.set("spark.graft.lock.waitMs", "300")
    try {
      intercept[SnapshotStore.LockTimeoutException](body)
    } finally {
      spark.conf.unset("spark.graft.lock.waitMs")
      lockFile.delete(); ()
    }
  }

  test("torn batch heals: crash between index merge and A merge, replay repairs all three") {
    import spark.implicits._
    val aT = tmp("jivmt1-a"); val bT = tmp("jivmt1-b")
    val vT = tmp("jivmt1-v"); val iT = tmp("jivmt1-i")
    def aDelta(rows: (String, String, String, String, String)*) =
      rows.toDF("keys", "op", "sequenceNumber", "fk", "a_image")
    SnapshotStore.mergeIntoTarget(spark, bT,
      Seq(("d1", "PUT", "001", "dim-one"), ("d2", "PUT", "002", "dim-two"))
        .toDF("keys", "op", "sequenceNumber", "newImage"), 0L)
    JoinIvm.applyFactDeltaIndexed(spark,
      aDelta(("a1", "PUT", "101", "d1", "f1"), ("a2", "PUT", "102", "d1", "f2")),
      aT, bT, vT, iT, 1L, seqBase = "101")
    // batch 2 re-points a1 d1→d2; the crash lands AFTER the index merge
    // (A's lock is held), leaving index=post-batch, A/view=pre-batch
    def batch2() = aDelta(("a1", "PUT", "201", "d2", "f1v2"))
    withMergeCrash(aT) {
      JoinIvm.applyFactDeltaIndexed(spark, batch2(), aT, bT, vT, iT, 2L, seqBase = "201")
    }
    // torn as designed: the index already moved a1 to d2, A still says d1
    assert(SnapshotStore.readTarget(spark, iT)
      .filter(col("keys") === "d2").select("newImage").head().getString(0).contains("a1"))
    assert(JoinIvm.indexRecompute(spark, aT)("d1").contains("a1"))
    // the REPLAY (checkpoint re-delivers the batch verbatim) repairs all three
    JoinIvm.applyFactDeltaIndexed(spark, batch2(), aT, bT, vT, iT, 2L, seqBase = "201")
    val view = SnapshotStore.readTarget(spark, vT).select("keys", "newImage")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = JoinIvm.fullRecompute(spark, aT, bT)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(view === want, "view did not heal after torn replay")
    val idx = SnapshotStore.readTarget(spark, iT).select("keys", "newImage")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(idx === JoinIvm.indexRecompute(spark, aT), "index did not heal after torn replay")
  }

  test("torn batch heals: crash between A merge and view merge, replay repairs all three") {
    import spark.implicits._
    val aT = tmp("jivmt2-a"); val bT = tmp("jivmt2-b")
    val vT = tmp("jivmt2-v"); val iT = tmp("jivmt2-i")
    def aDelta(rows: (String, String, String, String, String)*) =
      rows.toDF("keys", "op", "sequenceNumber", "fk", "a_image")
    SnapshotStore.mergeIntoTarget(spark, bT,
      Seq(("d1", "PUT", "001", "dim-one"), ("d2", "PUT", "002", "dim-two"))
        .toDF("keys", "op", "sequenceNumber", "newImage"), 0L)
    JoinIvm.applyFactDeltaIndexed(spark,
      aDelta(("a1", "PUT", "101", "d1", "f1"), ("a2", "PUT", "102", "d1", "f2")),
      aT, bT, vT, iT, 1L, seqBase = "101")
    // the r7 bug's exact window: index AND A merged, view not — the
    // replay's prior-fk read now sees old == new; index-first ordering
    // means the index already holds the move, so nothing is stranded
    def batch2() = aDelta(("a1", "PUT", "201", "d2", "f1v2"))
    withMergeCrash(vT) {
      JoinIvm.applyFactDeltaIndexed(spark, batch2(), aT, bT, vT, iT, 2L, seqBase = "201")
    }
    assert(JoinIvm.indexRecompute(spark, aT)("d2").contains("a1")) // A moved
    JoinIvm.applyFactDeltaIndexed(spark, batch2(), aT, bT, vT, iT, 2L, seqBase = "201")
    val view = SnapshotStore.readTarget(spark, vT).select("keys", "newImage")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = JoinIvm.fullRecompute(spark, aT, bT)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(view === want, "view did not heal after torn replay")
    assert(view("a1").contains("dim-two"), "a1 not re-enriched against d2")
    val idx = SnapshotStore.readTarget(spark, iT).select("keys", "newImage")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(idx === JoinIvm.indexRecompute(spark, aT),
      "stale posting-list entry survived the torn replay (the r7 A-first ordering bug)")
  }

  test("sharded posting lists: hot-fk membership spreads over fk#n rows, dim path stays exact") {
    import spark.implicits._
    val aT = tmp("jivmh-a"); val bT = tmp("jivmh-b")
    val vT = tmp("jivmh-v"); val iT = tmp("jivmh-i")
    val Shards = 4
    SnapshotStore.mergeIntoTarget(spark, bT,
      Seq(("d1", "PUT", "001", "dim-one"), ("d2", "PUT", "002", "dim-two"))
        .toDF("keys", "op", "sequenceNumber", "newImage"), 0L)
    // the hot-fk shape the unsharded index degenerates on: 500 facts all
    // referencing ONE dim — one giant posting list vs 4 bounded shards
    val hot = spark.range(500).select(
      concat(lit("a"), col("id")).as("keys"), lit("PUT").as("op"),
      lpad(col("id").cast("string"), 6, "0").as("sequenceNumber"),
      lit("d1").as("fk"), concat(lit("f"), col("id")).as("a_image"))
    JoinIvm.applyFactDeltaIndexed(spark, hot, aT, bT, vT, iT, 1L,
      seqBase = "000100", indexShards = Shards)
    def indexState() = SnapshotStore.readTarget(spark, iT)
      .select("keys", "newImage").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val idx1 = indexState()
    assert(idx1 === JoinIvm.indexRecompute(spark, aT, Shards), "sharded index diverged")
    val d1Shards = idx1.keys.filter(_.startsWith("d1#"))
    assert(d1Shards.size === Shards, s"expected $Shards shard rows, got ${d1Shards}")
    // membership spread: no shard row carries the whole hot list
    val sizes = d1Shards.toSeq.map(k =>
      idx1(k).count(_ == ',') + 1)
    assert(sizes.sum === 500 && sizes.max < 500,
      s"hot fk not spread: $sizes")
    // re-point a deterministic half to d2 and delete a few — removals
    // must hit the right shard rows
    val moves = spark.range(500).filter(col("id") % 2 === 0).select(
      concat(lit("a"), col("id")).as("keys"), lit("PUT").as("op"),
      lpad((col("id") + 1000).cast("string"), 6, "0").as("sequenceNumber"),
      lit("d2").as("fk"), concat(lit("g"), col("id")).as("a_image"))
      .unionByName(spark.range(500).filter(col("id") % 7 === 1).select(
        concat(lit("a"), col("id")).as("keys"), lit("DELETE").as("op"),
        lpad((col("id") + 2000).cast("string"), 6, "0").as("sequenceNumber"),
        lit(null: String).as("fk"), lit(null: String).as("a_image")))
    JoinIvm.applyFactDeltaIndexed(spark, moves, aT, bT, vT, iT, 2L,
      seqBase = "002000", indexShards = Shards)
    assert(indexState() === JoinIvm.indexRecompute(spark, aT, Shards),
      "sharded index diverged after re-point + delete")
    // dim update through the SHARDED path: all shards of d1 fan out
    JoinIvm.applyDimDeltaIndexed(spark,
      Seq(("d1", "PUT", "9000", "dim-one-v2"))
        .toDF("keys", "op", "sequenceNumber", "newImage"),
      bT, vT, iT, 3L, indexShards = Shards)
    val view = SnapshotStore.readTarget(spark, vT).select("keys", "newImage")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = JoinIvm.fullRecompute(spark, aT, bT)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(view === want, "view diverged under sharded dim refresh")
    assert(view.exists(_._2.contains("dim-one-v2")), "sharded dim refresh reached no rows")
  }

  test("indexed fact batch is replay-idempotent (crash-before-checkpoint heals)") {
    import spark.implicits._
    val aT = tmp("jivmr-a"); val bT = tmp("jivmr-b")
    val vT = tmp("jivmr-v"); val iT = tmp("jivmr-i")
    SnapshotStore.mergeIntoTarget(spark, bT,
      Seq(("d1", "PUT", "001", "dim-one"), ("d2", "PUT", "002", "dim-two"))
        .toDF("keys", "op", "sequenceNumber", "newImage"), 0L)
    def batch() = Seq(
      ("a1", "PUT", "0101", "d1", "f1"),
      ("a2", "PUT", "0102", "d2", "f2"),
      ("a3", "DELETE", "0103", null: String, null: String))
      .toDF("keys", "op", "sequenceNumber", "fk", "a_image")
    JoinIvm.applyFactDeltaIndexed(spark, batch(), aT, bT, vT, iT, 1L, seqBase = "sb1")
    val v1 = SnapshotStore.readTarget(spark, vT).select("keys", "newImage")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val i1 = SnapshotStore.readTarget(spark, iT).select("keys", "newImage")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the replay: same delta, same seqBase (the restart re-runs the
    // batch verbatim) — every target must land exactly where it was
    JoinIvm.applyFactDeltaIndexed(spark, batch(), aT, bT, vT, iT, 2L, seqBase = "sb1")
    val v2 = SnapshotStore.readTarget(spark, vT).select("keys", "newImage")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val i2 = SnapshotStore.readTarget(spark, iT).select("keys", "newImage")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(v2 === v1, "replayed batch moved the view")
    assert(i2 === i1, "replayed batch moved the index")
  }
}
