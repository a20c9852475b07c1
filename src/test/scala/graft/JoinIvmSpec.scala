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
      bDelta(("d1", "PUT", "201", "dim-one-v2")), bT, vT, 2L, seqBase = "201")
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
      bDelta(("d1", "DELETE", "401", null)), bT, vT, 4L, seqBase = "401")
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
      bDelta(("d2", "PUT", "401", "dim-two-v2")), bT, vT, iT, 4L, seqBase = "401")
    check("indexed dim update")
    assert(viewState()("a2").contains("dim-two-v2"))
    assert(viewState()("a3").contains("dim-two-v2"))

    // dim update for a now-unreferenced key: index has no row, the
    // path touches nothing, nothing breaks
    JoinIvm.applyDimDeltaIndexed(spark,
      bDelta(("d1", "PUT", "501", "dim-one-v9")), bT, vT, iT, 5L, seqBase = "501")
    check("unreferenced dim update")
  }
}
