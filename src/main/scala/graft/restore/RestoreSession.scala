package graft.restore

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.CdcOps

/** Status of the restore target, as the poller sees it — the reference's
  * check-ddb-status Lambda maps TableStatus==ACTIVE → SUCCEEDED else
  * IN PROGRESS (app/lambdas/check-ddb-status/main.py:26-28; FAILED exists
  * only as a dead Choice branch, cdk/lib/state-machine.json:41-45).
  */
sealed trait RestoreStatus
object RestoreStatus {
  case object Succeeded extends RestoreStatus
  case object InProgress extends RestoreStatus
  case object Failed extends RestoreStatus // dead branch, modeled for parity

  /** check-ddb-status semantics on a raw table-state string. */
  def ofTableState(state: String): RestoreStatus =
    if (state == "ACTIVE") Succeeded else InProgress
}

/** Driver-side orchestration of a PITR restore+replay — the reference's
  * control plane (state machine + initiate-lambda-backfill) as plain
  * Scala around the data-plane operators. No Catalyst involvement: this
  * is the poll/gate/retarget loop, kept out of the dataflow (SURVEY §3.2).
  *
  *  - `snapshotAsOf` — the "restored table": LWW state of the CDC log at
  *    T, tombstones dropped (PITR window semantics, README.md:3,26).
  *  - `awaitReady` — Wait-30s → poll → Choice loop
  *    (cdk/lib/state-machine.json:10-53), with injectable clock/status
  *    so tests run without wall-time.
  *  - `activate` — the gated start (T2): only once the target is ready is
  *    the drain started, pointed at the restored table — the analog of
  *    setting destination_table + enabling the SQS mapping
  *    (app/lambdas/initiate-lambda-backfill/main.py:31-74). Replayable
  *    storage + checkpoint make the late start lossless.
  */
final class RestoreSession(
    pollStatus: () => RestoreStatus,
    pollIntervalMs: Long = 30000, // Wait state, state-machine.json:13
    maxPolls: Int = 120,
    sleep: Long => Unit = Thread.sleep) {

  /** Poll until SUCCEEDED (or FAILED / poll budget exhausted).
    * Returns the terminal status.
    */
  def awaitReady(): RestoreStatus = {
    var polls = 0
    while (polls < maxPolls) {
      sleep(pollIntervalMs) // Wait precedes the first poll, as in the ASL
      polls += 1
      pollStatus() match {
        case RestoreStatus.Succeeded => return RestoreStatus.Succeeded
        case RestoreStatus.Failed => return RestoreStatus.Failed
        case RestoreStatus.InProgress => ()
      }
    }
    RestoreStatus.InProgress
  }

  /** Gate, then start the drain. `startDrain` receives no arguments —
    * the caller closes over the target path (the "retarget" is a
    * constructor parameter, not a mutable global — SURVEY §2.9 T8).
    */
  def activate[Q](startDrain: () => Q): Option[Q] =
    awaitReady() match {
      case RestoreStatus.Succeeded => Some(startDrain())
      case _ => None
    }
}

object RestoreSession {

  /** PITR window constants (README.md:3,26): restore to any point in the
    * last 35 days; the latest restorable time lags "now" by ~5 minutes.
    */
  val WindowDays: Long = 35
  val RecencyLagMinutes: Long = 5

  /** Validate a requested restore point against the PITR window. Returns
    * the reason the point is unrestorable, or None if it is valid —
    * control-plane arithmetic the reference delegates to the DynamoDB
    * API, surfaced here so a restore request fails fast and explicitly.
    */
  def validateRestorePoint(requested: java.time.Instant,
                           now: java.time.Instant): Option[String] = {
    val earliest = now.minus(java.time.Duration.ofDays(WindowDays))
    val latest = now.minus(java.time.Duration.ofMinutes(RecencyLagMinutes))
    if (requested.isBefore(earliest))
      Some(s"restore point $requested is before the $WindowDays-day PITR window (earliest $earliest)")
    else if (requested.isAfter(latest))
      Some(s"restore point $requested is after the latest restorable time ($latest — 'now' minus the ~$RecencyLagMinutes-minute PITR lag)")
    else None
  }

  /** Snapshot-as-of-T over a CDC-shaped frame: per-key LWW state at T,
    * keys whose latest pre-T event is a tombstone absent. This is the
    * engine's "restored table" materialization.
    */
  def snapshotAsOf(cdc: DataFrame, keys: Seq[String], tsCol: Column,
                   asOf: Column, order: Seq[Column], isRemove: Column,
                   payload: Seq[String]): DataFrame =
    CdcOps.lwwCompact(cdc.filter(tsCol <= asOf), keys, order)
      .filter(!isRemove)
      .select((keys ++ payload).map(col): _*)

  /** [[snapshotAsOf]] with the PITR-window gate applied: the restore
    * request FAILS FAST with the reason when the requested instant is
    * outside the window, instead of silently materializing a
    * valid-looking snapshot of the wrong era.
    */
  def snapshotAt(cdc: DataFrame, keys: Seq[String], tsCol: Column,
                 requested: java.time.Instant, now: java.time.Instant,
                 order: Seq[Column], isRemove: Column,
                 payload: Seq[String]): DataFrame = {
    validateRestorePoint(requested, now).foreach(reason =>
      throw new IllegalArgumentException(reason))
    snapshotAsOf(cdc, keys, tsCol,
      lit(java.sql.Timestamp.from(requested)), order, isRemove, payload)
  }
}
