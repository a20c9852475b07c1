package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.CdcOps
import graft.streaming.{CdcStream, GsiMaintenance, SnapshotStore}
import graft.streaming.GsiMaintenance.GsiDef

/** Global-secondary-index maintenance (SURVEY §2.11 G1):
  * [[CdcOps.gsiDelta]]'s transition table on fixtures, and the streaming
  * sink keeping a GSI store target equal to the recompute-from-base oracle
  * across batches, key moves, deletes, replays, and the torn-batch window.
  */
class GsiSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def writeCdcFile(dir: String, name: String, lines: Seq[String]): Unit = {
    val f = new java.io.File(dir, name)
    val w = new java.io.PrintWriter(f)
    try lines.foreach(w.println) finally w.close()
  }

  private def rec(id: String, name: String, ts: String, seq: String,
                  keys: String, img: Option[String]): String = {
    val imgJson = img.map(i => s""""$i"""").getOrElse("null")
    s"""{"eventID":"$id","eventName":"$name","approxCreationTs":"$ts","sequenceNumber":"$seq","keys":"$keys","newImage":$imgJson,"oldImage":null}"""
  }

  test("gsiDelta: the full sparse-index transition table") {
    // old state: (key, index key, cents); present ⇔ cents >= 1000
    val state = Seq(
      ("k1", "A", 1500L), ("k2", "A", 1500L), ("k3", "A", 1500L),
      ("k4", "A", 1500L), ("k6", "A", 500L))
      .toDF("k", "typ", "cents")
    // delta: (key, seq, removed, index key, cents)
    val delta = Seq(
      ("k1", 1L, false, "B", 1500L), // key move       → DELETE A + PUT B
      ("k2", 1L, false, "A", 2000L), // in-place update → PUT only
      ("k3", 1L, false, "A", 500L),  // attr dropped    → DELETE only
      ("k4", 1L, true, "A", 0L),     // base REMOVE     → DELETE only
      ("k5", 1L, false, "B", 1200L), // fresh key       → PUT only
      ("k6", 1L, false, "A", 2000L), // was sparse-absent → PUT only
      ("k7", 1L, false, "A", 1500L), // older PUT loses to...
      ("k7", 2L, true, "A", 0L),     // ...newer REMOVE; old absent → nothing
      ("k8", 1L, false, "A", 500L))  // absent → absent → nothing
      .toDF("k", "seq", "rm", "typ", "cents")

    val got = CdcOps.gsiDelta(state, delta, keys = Seq("k"),
      order = Seq(col("seq")), isRemove = col("rm"),
      gsiKey = col("typ"), present = col("cents") >= 1000L,
      projection = Seq("cents" -> col("cents")))
      .select("k", "op", "gsi_key", "cents")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    assert(got === Set(
      ("k1", "DELETE", "A", -1L), ("k1", "PUT", "B", 1500L),
      ("k2", "PUT", "A", 2000L),
      ("k3", "DELETE", "A", -1L),
      ("k4", "DELETE", "A", -1L),
      ("k5", "PUT", "B", 1200L),
      ("k6", "PUT", "A", 2000L)))
  }

  // GSI over the canonical stream: partition key = the image's first
  // character, sparse membership = image length >= 2, ALL projection
  private val gsi = GsiDef(
    gsiKey = substring(col("newImage"), 1, 1),
    present = length(col("newImage")) >= 2,
    projected = col("newImage"))

  private def gsiState(dir: String): Set[(String, String, String)] =
    SnapshotStore.readTarget(spark, dir, keys = Seq("gsi_key", "ref_key"))
      .select("gsi_key", "ref_key", "newImage")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  private def recomputed(baseDir: String): Set[(String, String, String)] =
    GsiMaintenance.gsiRecompute(spark, baseDir, gsi)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  // second GSI on the same table: keyed by the image's LAST character,
  // dense (every imaged item participates), INCLUDE-style 1-char projection
  private val gsi2 = GsiDef(
    gsiKey = substring(col("newImage"), -1, 1),
    present = length(col("newImage")) >= 1,
    projected = substring(col("newImage"), 1, 1))

  test("streaming sink: maintained GSIs equal recompute across moves, deletes, replay") {
    val in = tmp("gsi-in"); val base = tmp("gsi-base"); val idx = tmp("gsi-idx")
    val idx2 = tmp("gsi-idx2"); val ckpt = tmp("gsi-ckpt")
    writeCdcFile(in, "b1.json", Seq(
      rec("e1", "INSERT", "2024-01-01T00:00:01Z", "001", "k1", Some("v1")),
      rec("e2", "MODIFY", "2024-01-01T00:00:02Z", "002", "k1", Some("v2")),
      rec("e3", "INSERT", "2024-01-01T00:00:03Z", "003", "k2", Some("w1")),
      rec("e4", "INSERT", "2024-01-01T00:00:04Z", "004", "k4", Some("z"))))
    writeCdcFile(in, "b2.json", Seq(
      rec("e5", "MODIFY", "2024-01-01T00:00:05Z", "005", "k1", Some("x9")),
      rec("e6", "REMOVE", "2024-01-01T00:00:06Z", "006", "k2", None),
      rec("e7", "INSERT", "2024-01-01T00:00:07Z", "007", "k3", Some("w5"))))

    // BOTH indexes maintained from the one shared prior-state read
    val gsis = Seq(idx -> gsi, idx2 -> gsi2)
    val q = GsiMaintenance.sink(
      CdcStream.cdcFileSource(spark, in, maxFilesPerTrigger = 1),
      base, ckpt, gsis)
    q.awaitTermination(60000)

    // gsi1: k1 moved v→x (the b1 v-entry must be GONE), k2 removed, k4
    // is sparse-absent (single-char image)
    assert(gsiState(idx) === Set(("x", "k1", "x9"), ("w", "k3", "w5")))
    assert(gsiState(idx) === recomputed(base))
    // gsi2 is dense: k4's single-char image participates (key 'z')
    assert(gsiState(idx2) === Set(("9", "k1", "x"), ("5", "k3", "w"),
      ("z", "k4", "z")))
    assert(gsiState(idx2) ===
      GsiMaintenance.gsiRecompute(spark, base, gsi2)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet)

    // duplicate delivery of an applied batch: idempotent on all targets
    writeCdcFile(in, "b3.json", Seq(
      rec("e5", "MODIFY", "2024-01-01T00:00:05Z", "005", "k1", Some("x9"))))
    val q2 = GsiMaintenance.sink(
      CdcStream.cdcFileSource(spark, in, maxFilesPerTrigger = 1),
      base, ckpt, gsis)
    q2.awaitTermination(60000)
    assert(gsiState(idx) === recomputed(base))
  }

  test("online GSI backfill: index created on a LIVE table converges with maintenance") {
    val in = tmp("gsib-in"); val base = tmp("gsib-base"); val idx = tmp("gsib-idx")
    val ckpt = tmp("gsib-ckpt")
    writeCdcFile(in, "b1.json", Seq(
      rec("e1", "INSERT", "2024-01-01T00:00:01Z", "001", "k1", Some("v1")),
      rec("e2", "INSERT", "2024-01-01T00:00:02Z", "002", "k2", Some("w1")),
      rec("e3", "MODIFY", "2024-01-01T00:00:03Z", "003", "k1", Some("v2")),
      rec("e4", "INSERT", "2024-01-01T00:00:04Z", "004", "k4", Some("z"))))
    // the table goes live BEFORE any index exists
    val q = GsiMaintenance.sink(
      CdcStream.cdcFileSource(spark, in, maxFilesPerTrigger = 1),
      base, ckpt, gsis = Seq.empty)
    q.awaitTermination(60000)
    // add the GSI online: backfill from the live applied state (k4 is
    // sparse-absent — single-char image)
    GsiMaintenance.backfillGsi(spark, base, idx, gsi)
    assert(gsiState(idx) === Set(("v", "k1", "v2"), ("w", "k2", "w1")))
    assert(gsiState(idx) === recomputed(base))
    // duplicate delivery of the very batch whose state the backfill
    // read: same stamps, same images — absorbed by the seq-guarded LWW
    writeCdcFile(in, "b2.json", Seq(
      rec("e3", "MODIFY", "2024-01-01T00:00:03Z", "003", "k1", Some("v2"))))
    // then live maintenance takes over on the SAME checkpoint: a key
    // move and a delete must land through the normal sink path
    writeCdcFile(in, "b3.json", Seq(
      rec("e5", "MODIFY", "2024-01-01T00:00:05Z", "005", "k1", Some("x9")),
      rec("e6", "REMOVE", "2024-01-01T00:00:06Z", "006", "k2", None)))
    val q2 = GsiMaintenance.sink(
      CdcStream.cdcFileSource(spark, in, maxFilesPerTrigger = 1),
      base, ckpt, Seq(idx -> gsi))
    q2.awaitTermination(60000)
    assert(gsiState(idx) === Set(("x", "k1", "x9")))
    assert(gsiState(idx) === recomputed(base))
  }

  test("torn batch: GSI merged but base not — replay converges both targets") {
    val base = tmp("gsit-base"); val idx = tmp("gsit-idx")
    def rawBatch(rows: (String, String, String, String, Option[String])*) =
      rows.toDF("eventID", "eventName", "sequenceNumber", "keys", "newImage")
    val b0 = rawBatch(("e1", "INSERT", "001", "k1", Some("v1")),
      ("e2", "INSERT", "002", "k2", Some("w1")))
    GsiMaintenance.applyBatchWithGsi(spark, b0, base, idx, 0L, gsi)

    // batch 1 moves k1 v→x; inject the torn state: the GSI merge lands,
    // the crash hits before the base merge
    val b1 = rawBatch(("e3", "MODIFY", "003", "k1", Some("x7")))
    val d1 = CdcStream.compactDelta(b1)
    val muts = GsiMaintenance.gsiMutations(
      SnapshotStore.readKeysDf(spark, base, d1.select("keys")), d1, gsi)
    SnapshotStore.mergeIntoTarget(spark, idx, muts, 1L,
      keys = Seq("gsi_key", "ref_key"))
    // torn: index already moved, base still says v1 — the recompute and
    // the index DISAGREE here, which is exactly what replay must heal
    assert(gsiState(idx) !== recomputed(base))

    // the checkpoint replays the whole batch (same rows, same batchId)
    GsiMaintenance.applyBatchWithGsi(spark, b1, base, idx, 1L, gsi)
    assert(gsiState(idx) === Set(("x", "k1", "x7"), ("w", "k2", "w1")))
    assert(gsiState(idx) === recomputed(base))

    // replay AFTER both merges completed (crash before checkpoint
    // commit): re-emits only PUTs at original stamps — absorbed
    GsiMaintenance.applyBatchWithGsi(spark, b1, base, idx, 1L, gsi)
    assert(gsiState(idx) === recomputed(base))
  }
}
