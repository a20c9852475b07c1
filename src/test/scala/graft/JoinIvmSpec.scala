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
}
