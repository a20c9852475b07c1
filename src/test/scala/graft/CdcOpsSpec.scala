package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.CdcOps

/** CDC fixtures per FIXTURES.md §A: put→modify→remove, remove→insert
  * (resurrection), duplicate deliveries, conflicting puts out of order,
  * cross-key interleavings.
  */
class CdcOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (eventID, eventName, ts, seq, key, image)
  private val log: Seq[(String, String, Timestamp, String, String, String)] = Seq(
    ("e1", "INSERT", ts("2024-01-01 00:00:01"), "001", "k1", "v1"),
    ("e2", "MODIFY", ts("2024-01-01 00:00:02"), "002", "k1", "v2"),
    ("e3", "REMOVE", ts("2024-01-01 00:00:03"), "003", "k1", null),
    ("e4", "INSERT", ts("2024-01-01 00:00:04"), "004", "k1", "v3"), // resurrection
    ("e5", "INSERT", ts("2024-01-01 00:00:01"), "001", "k2", "w1"),
    ("e5", "INSERT", ts("2024-01-01 00:00:01"), "001", "k2", "w1"), // dup delivery
    ("e6", "REMOVE", ts("2024-01-01 00:00:09"), "009", "k2", null),
    ("e7", "INSERT", ts("2024-01-01 00:00:05"), "005", "k3", "x1"))

  private def df: DataFrame = log.toDF("eventID", "eventName", "ts", "seq", "pk", "image")

  test("dedup removes exact duplicate deliveries") {
    assert(CdcOps.dedup(df, Seq("eventID", "seq")).count() === 7)
  }

  test("lwwCompact keeps exactly the last event per key") {
    val out = CdcOps.lwwCompact(df, Seq("pk"), Seq(col("seq")))
      .select("pk", "eventID").as[(String, String)].collect().toMap
    assert(out === Map("k1" -> "e4", "k2" -> "e6", "k3" -> "e7"))
  }

  test("lwwCompact is insensitive to input row order (per-key order contract)") {
    val shuffled = df.orderBy(rand(seed = 7))
    val a = CdcOps.lwwCompact(df, Seq("pk"), Seq(col("seq")))
      .select("pk", "eventID").collect().toSet
    val b = CdcOps.lwwCompact(shuffled, Seq("pk"), Seq(col("seq")))
      .select("pk", "eventID").collect().toSet
    assert(a === b)
  }

  test("applyPlan branches PUT vs DELETE like the reference") {
    val ops = df.select(col("eventID"), CdcOps.applyPlan(col("eventName")).as("op"))
      .distinct().as[(String, String)].collect().toMap
    assert(ops("e1") === "PUT" && ops("e3") === "DELETE" && ops("e6") === "DELETE")
  }

  test("merge applies PUTs, drops DELETEs, keeps untouched keys") {
    val snapshot = Seq(("k1", "old1"), ("k2", "old2"), ("k9", "keep"))
      .toDF("pk", "image")
    val delta = Seq(("k1", "new1", "PUT"), ("k2", null, "DELETE"), ("k5", "ins", "PUT"))
      .toDF("pk", "image", "op")
    val out = CdcOps.merge(snapshot, delta, Seq("pk"), "op", Seq("image"))
      .as[(String, String)].collect().toMap
    assert(out === Map("k1" -> "new1", "k5" -> "ins", "k9" -> "keep"))
  }

  test("restoreReplay: resurrection after REMOVE, tombstone wins at cut, dups ignored") {
    val out = CdcOps.restoreReplay(
      df,
      keys = Seq("pk"),
      tsCol = col("ts"),
      asOf = lit("2024-01-01 00:00:03").cast("timestamp"),
      order = Seq(col("seq")),
      isRemove = col("eventName") === "REMOVE",
      payload = Seq("eventID", "image"))
    val m = out.select("pk", "image").as[(String, String)].collect().toMap
    // k1: snapshot ends REMOVE (absent) then buffer resurrects with v3
    // k2: snapshot w1, buffer REMOVE e6 deletes it
    // k3: only post-T insert x1
    assert(m === Map("k1" -> "v3", "k3" -> "x1"))
  }

  test("restoreReplay applied twice over the same buffer is idempotent") {
    val once = CdcOps.restoreReplay(df, Seq("pk"), col("ts"),
      lit("2024-01-01 00:00:03").cast("timestamp"), Seq(col("seq")),
      col("eventName") === "REMOVE", Seq("eventID", "image"))
    // replay the post-T buffer again onto the result: LWW must not change state
    val buffer = df.filter(col("ts") > lit("2024-01-01 00:00:03").cast("timestamp"))
    val delta = CdcOps.lwwCompact(CdcOps.dedup(buffer, Seq.empty), Seq("pk"), Seq(col("seq")))
      .withColumn("op", CdcOps.applyPlan(col("eventName")))
      .select("pk", "eventID", "image", "op")
    val twice = CdcOps.merge(once, delta, Seq("pk"), "op", Seq("eventID", "image"))
    assert(twice.select("pk", "image").collect().toSet ===
      once.select("pk", "image").collect().toSet)
  }

  test("statusCase maps ACTIVE and only ACTIVE to SUCCEEDED") {
    val out = Seq("ACTIVE", "CREATING", "RESTORING").toDF("st")
      .select(CdcOps.statusCase(col("st")).as("s")).as[String].collect()
    assert(out.toSeq === Seq("SUCCEEDED", "IN PROGRESS", "IN PROGRESS"))
  }

  test("controlEventMatch matches the rule pattern conjunctively") {
    val rows = Seq(
      ("aws.dynamodb", "AWS API Call via CloudTrail", "dynamodb.amazonaws.com", "RestoreTableToPointInTime", true),
      ("aws.dynamodb", "AWS API Call via CloudTrail", "dynamodb.amazonaws.com", "CreateTable", false),
      ("aws.s3", "AWS API Call via CloudTrail", "dynamodb.amazonaws.com", "RestoreTableToPointInTime", false))
    val df = rows.map { case (src, dt, es, en, _) => (src, dt, es, en) }
      .toDF("source", "detailType", "es", "en")
      .select(col("source"), col("detailType"),
        struct(col("es").as("eventSource"), col("en").as("eventName")).as("detail"))
    assert(CdcOps.controlEventMatch(df).count() === rows.count(_._5))
  }
}
