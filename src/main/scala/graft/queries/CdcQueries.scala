package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.AttributeValue
import graft.ops.CdcOps

/** Reference-parity operators (SURVEY §2.1–§2.9) in batch formulation over
  * the driver `events` table (the CDC-log proxy per FIXTURES.md §B):
  * user_id ⇒ key, ts+event_id ⇒ per-key total order (sequenceNumber analog),
  * event_type='error' ⇒ REMOVE tombstone, props ⇒ DynamoDB-JSON payload.
  * Every query here is DuckDB-oracle-checkable.
  */
object CdcQueries {
  private val T = "2024-01-15 00:00:00"  // PITR point for the replay queries
  private val T2 = "2024-01-25 00:00:00" // second restore point (snapshot diff)

  private def events(s: SparkSession, d: String): DataFrame = Tables.events(s, d)
  private val isRemove: Column = col("event_type") === "error"
  private val keyOrder: Seq[Column] = Seq(col("ts"), col("event_id"))

  /** Exact sum of a ~2-decimal double column, as double: values scale to
    * BIGINT cents (codegen'd long adds), one double division at the end.
    * Removes float-summation order sensitivity; equal to the
    * DECIMAL(18,2)-sum oracle formulation because both compute the same
    * exact rational.
    */
  private def dsum(c: Column): Column =
    sum(round(c * 100).cast("long")).cast("double") / 100.0

  val all: Seq[QuerySpec] = Seq(

    // ───── flagship: SURVEY §7.2 minimum end-to-end slice (S7 P3 P7 A1 A2 W1 J1 O1)
    QuerySpec(
      "cdc_restore_replay",
      (s, d) => CdcOps.restoreReplay(
        events(s, d),
        keys = Seq("user_id"),
        tsCol = col("ts"),
        asOf = lit(T).cast("timestamp"),
        order = keyOrder,
        isRemove = isRemove,
        payload = Seq("event_id", "event_type", "value")),
      Some(s"""
        WITH pre AS (
          SELECT user_id, event_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
          FROM events WHERE ts <= TIMESTAMP '$T'),
        snapshot AS (
          SELECT user_id, event_id, event_type, value FROM pre
          WHERE rn = 1 AND event_type <> 'error'),
        post AS (
          SELECT user_id, event_id, event_type, value,
                 CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'PUT' END op,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
          FROM events WHERE ts > TIMESTAMP '$T'),
        delta AS (SELECT user_id, event_id, event_type, value, op FROM post WHERE rn = 1)
        SELECT COALESCE(d.user_id, s.user_id) AS user_id,
               CASE WHEN d.op IS NOT NULL THEN d.event_id ELSE s.event_id END AS event_id,
               CASE WHEN d.op IS NOT NULL THEN d.event_type ELSE s.event_type END AS event_type,
               CASE WHEN d.op IS NOT NULL THEN d.value ELSE s.value END AS value
        FROM snapshot s FULL OUTER JOIN delta d ON s.user_id = d.user_id
        WHERE d.op IS NULL OR d.op = 'PUT'""")),

    // ───── S4+6 — PITR snapshot diff: the change set between two restore
    // points (ADDED / REMOVED / MODIFIED per key), one hash-agg over one
    // scan via conditional max_by — no window, no two-snapshot join
    QuerySpec(
      "cdc_snapshot_diff",
      (s, d) => CdcOps.snapshotDiff(
        events(s, d), keys = Seq("user_id"), tsCol = col("ts"),
        asOf1 = lit(T).cast("timestamp"), asOf2 = lit(T2).cast("timestamp"),
        order = keyOrder, isRemove = isRemove,
        payload = Seq("event_id", "event_type", "value")),
      Some(s"""
        WITH s1 AS (
          SELECT user_id, event_id, event_type, value FROM (
            SELECT user_id, event_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
            FROM events WHERE ts <= TIMESTAMP '$T')
          WHERE rn = 1 AND event_type <> 'error'),
        s2 AS (
          SELECT user_id, event_id, event_type, value FROM (
            SELECT user_id, event_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
            FROM events WHERE ts <= TIMESTAMP '$T2')
          WHERE rn = 1 AND event_type <> 'error')
        SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
               CASE WHEN s1.user_id IS NULL THEN 'ADDED'
                    WHEN s2.user_id IS NULL THEN 'REMOVED'
                    ELSE 'MODIFIED' END AS change,
               s1.event_id AS old_event_id, s1.event_type AS old_event_type,
               s1.value AS old_value,
               s2.event_id AS new_event_id, s2.event_type AS new_event_type,
               s2.value AS new_value
        FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
        WHERE s1.user_id IS NULL OR s2.user_id IS NULL
           OR s1.event_id IS DISTINCT FROM s2.event_id
           OR s1.event_type IS DISTINCT FROM s2.event_type
           OR s1.value IS DISTINCT FROM s2.value""")),

    // ───── S4+7 — SCD2 version history: the CDC log materialized as a
    // slowly-changing-dimension table — per key, every version with its
    // validity interval [valid_from, valid_to) and a current-row flag
    // (tombstones close their interval and are never current). The
    // relational face of what readTargetAsOf serves point-wise: ONE
    // window shuffle (lead + row_number share the per-key spec), no
    // joins, linear in the log.
    QuerySpec(
      "cdc_scd2_history",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("version_no", row_number().over(w).cast("long"))
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          .select(col("user_id"), col("version_no"), col("event_id"),
            col("event_type"), col("value"),
            col("ts").as("valid_from"), col("valid_to"),
            (col("valid_to").isNull && !isRemove).as("is_current"))
      },
      Some("""
        SELECT user_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_no,
               event_id, event_type, value,
               ts AS valid_from,
               LEAD(ts, 1) OVER w AS valid_to,
               (LEAD(ts, 1) OVER w IS NULL AND event_type <> 'error') AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")),

    // ───── S4+9 — global-tables active-active merge: two regional CDC
    // streams (region derived deterministically from the event) converge
    // per key by DynamoDB's global-tables rule — last-writer-wins on the
    // write timestamp with a deterministic region tiebreak — and the
    // report surfaces CROSS-REGION CONFLICTS: keys whose two latest
    // writes came from different regions within a 1-hour window (the
    // writes a multi-region app actually raced). One window pass (rank
    // ≤ 2 per key over the unioned timeline) + one tiny hash-agg.
    QuerySpec(
      "cdc_global_tables",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("region").desc, col("event_id").desc)
        events(s, d)
          .withColumn("region",
            when(col("event_id") % 2 === 0, "us-east-1").otherwise("eu-west-1"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .groupBy("user_id")
          .agg(
            max(when(col("rn") === 1, col("region"))).as("winner_region"),
            max(when(col("rn") === 2, col("region"))).as("runner_region"),
            max(when(col("rn") === 1, unix_timestamp(col("ts")))).as("t1"),
            max(when(col("rn") === 2, unix_timestamp(col("ts")))).as("t2"))
          .withColumn("conflict",
            col("runner_region").isNotNull &&
              col("winner_region") =!= col("runner_region") &&
              col("t1") - col("t2") <= 3600L)
          .groupBy("winner_region", "conflict")
          .agg(count(lit(1)).as("n_keys"))
      },
      Some("""
        SELECT winner_region, conflict, COUNT(*) AS n_keys
        FROM (
          SELECT user_id,
                 MAX(CASE WHEN rn = 1 THEN region END) AS winner_region,
                 (MAX(CASE WHEN rn = 2 THEN region END) IS NOT NULL
                  AND MAX(CASE WHEN rn = 1 THEN region END)
                      <> MAX(CASE WHEN rn = 2 THEN region END)
                  AND MAX(CASE WHEN rn = 1 THEN epoch(ts)::BIGINT END)
                      - MAX(CASE WHEN rn = 2 THEN epoch(ts)::BIGINT END) <= 3600)
                   AS conflict
          FROM (
            SELECT user_id, ts, region,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                     ORDER BY ts DESC, region DESC, event_id DESC) AS rn
            FROM (SELECT user_id, ts, event_id,
                         CASE WHEN event_id % 2 = 0 THEN 'us-east-1'
                              ELSE 'eu-west-1' END AS region
                  FROM events))
          WHERE rn <= 2
          GROUP BY user_id)
        GROUP BY 1, 2""")),

    // ───── A2/W1 — last-writer-wins compaction per key
    QuerySpec(
      "cdc_lww_compact",
      (s, d) => CdcOps.lwwCompact(events(s, d), Seq("user_id"), keyOrder)
        .select("user_id", "event_id", "event_type", "value"),
      Some("""
        SELECT user_id, event_id, event_type, value FROM (
          SELECT user_id, event_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
          FROM events) WHERE rn = 1""")),

    // ───── A1 — content-based dedup (duplicate delivery is injected by the
    // self-union; dedup must restore exact original multiplicities)
    QuerySpec(
      "cdc_dedup",
      (s, d) => {
        val e = events(s, d)
        // Full-row (content-based) dedup — the SQS contentBasedDeduplication
        // semantic exactly; deterministic regardless of event_id uniqueness.
        CdcOps.dedup(e.unionAll(e), Seq.empty)
          .groupBy("event_type").agg(
            count(lit(1)).as("n"),
            dsum(col("value")).as("sum_value"))
      },
      Some("""
        SELECT event_type, count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM (SELECT DISTINCT * FROM (SELECT * FROM events UNION ALL SELECT * FROM events))
        GROUP BY event_type""")),

    // ───── P7 — apply-plan projection (PUT vs DELETE branch)
    QuerySpec(
      "cdc_apply_plan",
      (s, d) => events(s, d).select(
        col("event_id"), col("user_id"),
        CdcOps.applyPlan(col("event_type"), "error").as("op"),
        col("value")),
      Some("""
        SELECT event_id, user_id,
               CASE WHEN event_type <> 'error' THEN 'PUT' ELSE 'DELETE' END AS op,
               value
        FROM events""")),

    // ───── P1 — records-present guard (schema/shape validation surface)
    QuerySpec(
      "cdc_guard_filter",
      (s, d) => events(s, d)
        .withColumn("passed",
          col("props").isNotNull && get_json_object(col("props"), "$.k").isNotNull)
        .groupBy("event_type", "passed").agg(count(lit(1)).as("n")),
      Some("""
        SELECT event_type,
               (props IS NOT NULL AND json_extract_string(props, '$.k') IS NOT NULL) AS passed,
               count(*) AS n
        FROM events GROUP BY 1, 2""")),

    // ───── P3/F1 — parse projection: JSON body -> typed columns
    QuerySpec(
      "cdc_parse_project",
      (s, d) => events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("prop_k"),
        col("event_type")),
      Some("""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
               event_type
        FROM events""")),

    // ───── P2/F1 — serialize projection: record -> JSON body
    QuerySpec(
      "cdc_serialize",
      (s, d) => events(s, d).select(
        col("event_id"),
        to_json(struct(col("event_id"), col("user_id"), col("event_type"))).as("body")),
      Some("""
        SELECT event_id,
               CAST(to_json(struct_pack(event_id := event_id, user_id := user_id,
                                        event_type := event_type)) AS VARCHAR) AS body
        FROM events""")),

    // ───── P6/P8 — status projection + pass-through enrichment
    QuerySpec(
      "cdc_status_case",
      (s, d) => Tables.orders(s, d)
        .withColumn("status", CdcOps.statusCase(col("o_orderstatus"), "F"))
        .groupBy("o_orderstatus", "status").agg(count(lit(1)).as("n")),
      Some("""
        SELECT o_orderstatus,
               CASE WHEN o_orderstatus = 'F' THEN 'SUCCEEDED' ELSE 'IN PROGRESS' END AS status,
               count(*) AS n
        FROM orders GROUP BY 1, 2""")),

    // ───── P4/P5 — conjunctive predicate over nested/JSON fields
    QuerySpec(
      "cdc_control_match",
      (s, d) => events(s, d).filter(
        col("event_type") === "purchase" && col("value") > 100 &&
          get_json_object(col("props"), "$.k").cast("int") < 50)
        .select("event_id", "user_id", "value"),
      Some("""
        SELECT event_id, user_id, value FROM events
        WHERE event_type = 'purchase' AND value > 100
          AND CAST(json_extract_string(props, '$.k') AS INTEGER) < 50""")),

    // ───── O1/W2 — per-key FIFO order: gap to previous event within key
    QuerySpec(
      "cdc_order_within_key",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        events(s, d).select(
          col("user_id"), col("event_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"),
          lag(col("event_id"), 1).over(w).as("prev_event_id"))
      },
      Some("""
        SELECT user_id, event_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
               LAG(event_id) OVER w AS prev_event_id
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")),

    // ───── T9 — session windows (30-min inactivity gap), batch formulation
    QuerySpec(
      "cdc_sessionize",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val gapUs = 30L * 60 * 1000000
        events(s, d)
          .withColumn("new_sess",
            when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w) > gapUs
              || lag(col("ts"), 1).over(w).isNull, lit(1)).otherwise(lit(0)))
          .withColumn("sess_id", sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sess_id")
          .agg(min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"),
            dsum(col("value")).as("sum_value"))
          .drop("sess_id")
      },
      Some("""
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM events),
        numbered AS (
          SELECT user_id, ts, value,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
          FROM flagged)
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM numbered GROUP BY user_id, sess_id""")),

    // ───── T9 — tumbling event-time window aggregation
    QuerySpec(
      "cdc_tumbling_window",
      (s, d) => events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")),
      Some("""
        SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2""")),

    // ───── T9 — sliding event-time windows (1 h window, 30 min slide):
    // every event lands in exactly two windows. The oracle unnests the
    // two candidate window starts per event — the same assignment rule
    // Spark's window() uses.
    QuerySpec(
      "cdc_sliding_window",
      (s, d) => events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("sum_value")),
      Some("""
        SELECT win_start, event_type, count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM (
          SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                         time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
                   AS win_start,
                 event_type, value
          FROM events)
        GROUP BY 1, 2""")),

    // ───── T5 — deadletter routing (poison-message split), as a projection
    QuerySpec(
      "cdc_deadletter_split",
      (s, d) => events(s, d)
        .withColumn("route",
          when(get_json_object(col("props"), "$.k").cast("int") >= 95, lit("deadletter"))
            .otherwise(lit("applied")))
        .groupBy("event_type", "route").agg(count(lit(1)).as("n")),
      Some("""
        SELECT event_type,
               CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 95
                    THEN 'deadletter' ELSE 'applied' END AS route,
               count(*) AS n
        FROM events GROUP BY 1, 2""")),

    // ───── F2 — the reference's name sanitization regexes, verbatim
    // semantics (cdk/bin/cdk.ts:40-49): strip leading non-alpha, map
    // invalid chars to '-', then validate ^[A-Za-z][A-Za-z0-9-]*$.
    QuerySpec(
      "cdc_name_sanitize",
      (s, d) => {
        val raw = concat(lit("42_"), col("event_type"), lit("."),
          col("user_id").cast("string"))
        events(s, d).select(
          col("event_id"),
          raw.as("raw_name"),
          regexp_replace(regexp_replace(raw, "^[^A-Za-z]+", ""), "[^A-Za-z0-9-]", "-")
            .as("sanitized"),
          raw.rlike("^[A-Za-z][A-Za-z0-9-]*$").as("was_valid"))
      },
      Some("""
        SELECT event_id,
               '42_' || event_type || '.' || CAST(user_id AS VARCHAR) AS raw_name,
               regexp_replace(
                 regexp_replace('42_' || event_type || '.' || CAST(user_id AS VARCHAR),
                                '^[^A-Za-z]+', ''),
                 '[^A-Za-z0-9-]', '-', 'g') AS sanitized,
               regexp_matches('42_' || event_type || '.' || CAST(user_id AS VARCHAR),
                              '^[A-Za-z][A-Za-z0-9-]*$') AS was_valid
        FROM events""")),

    // ───── S8/P3 — declared-schema JSON parse: the full stream envelope
    // round-trips through to_json → from_json(streamEnvelope-shaped
    // schema) → nested-field extraction (GetStructField chains). The
    // oracle extracts the same paths from the same JSON text.
    // Measured at sf0.1: this shape is the floor — to_json beats a
    // format_string build (Jackson writes UTF8String directly; Formatter
    // does not), one from_json beats 3x get_json_object, and the parse is
    // evaluated ONCE (CollapseProject keeps the non-cheap from_json out
    // of the extraction projection). Steady-state 0.6 s / 100k rows; the
    // bench's larger first-run number is JSON-machinery classload, warmed
    // untimed in Bench.
    QuerySpec(
      "cdc_envelope_parse",
      (s, d) => {
        val env = events(s, d).select(
          col("event_id"),
          to_json(struct(
            col("event_id").cast("string").as("eventID"),
            when(isRemove, lit("REMOVE")).otherwise(lit("MODIFY")).as("eventName"),
            struct(
              col("ts").cast("string").as("ApproximateCreationDateTime"),
              lpad(col("event_id").cast("string"), 12, "0").as("SequenceNumber"),
              struct(col("user_id").as("user_id")).as("Keys")).as("dynamodb")))
            .as("body"))
        val envelopeDdl =
          """eventID STRING, eventName STRING,
             dynamodb STRUCT<ApproximateCreationDateTime: STRING,
                             SequenceNumber: STRING,
                             Keys: STRUCT<user_id: BIGINT>>"""
        env.select(
          col("event_id"),
          from_json(col("body"), envelopeDdl, Map.empty[String, String]).as("r"))
          .select(
            col("event_id"),
            col("r.eventName").as("event_name"),
            col("r.dynamodb.SequenceNumber").as("seq"),
            col("r.dynamodb.Keys.user_id").as("key_user"))
      },
      Some("""
        SELECT event_id,
               CASE WHEN event_type = 'error' THEN 'REMOVE' ELSE 'MODIFY' END AS event_name,
               lpad(CAST(event_id AS VARCHAR), 12, '0') AS seq,
               user_id AS key_user
        FROM events""")),

    // ───── §1.1a — AttributeValue round trip: plain JSON → ddb_encode →
    // ddb_decode recovers the document (decode ∘ encode = identity); the
    // oracle computes the same fields directly from the base table.
    // `tags` is hinted as an SS SET and carries a deliberate duplicate:
    // set-dedup-on-write drops it, so element 2 is user_id — with plain
    // L encoding (no dedup) it would be the repeated event_type, and the
    // oracle would catch it.
    QuerySpec(
      "cdc_ddb_roundtrip",
      (s, d) => {
        val plain = to_json(struct(
          col("user_id").cast("string").as("pk"),
          floor(col("value") * 100).cast("long").as("cents"),
          col("event_type").as("t"),
          array(col("event_type"), col("event_type"),
            col("user_id").cast("string")).as("tags")))
        // ONE from_json parse for all extracted fields: per-field
        // get_json_object would re-parse the document once per field
        // (4 extra Jackson passes/row on the hottest per-row query).
        events(s, d)
          .select(col("event_id"),
            from_json(
              AttributeValue.ddbDecode(
                AttributeValue.ddbEncode(plain, Map("tags" -> "SS"))),
              "pk STRING, cents BIGINT, t STRING, tags ARRAY<STRING>",
              Map.empty[String, String]).as("rt"))
          .select(
            col("event_id"),
            col("rt.pk").as("pk"),
            col("rt.cents").as("cents"),
            col("rt.t").as("t"),
            element_at(col("rt.tags"), 2).as("tag1"))
      },
      Some("""
        SELECT event_id, CAST(user_id AS VARCHAR) AS pk,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               event_type AS t, CAST(user_id AS VARCHAR) AS tag1
        FROM events""")),

    // ───── §1.1a — AttributeValue decode: build DynamoDB-JSON, decode with
    // ddb_decode, extract typed fields; the oracle computes the same values
    // directly (decode ∘ encode = identity).
    QuerySpec(
      "cdc_ddb_decode",
      (s, d) => {
        // N payload carries integer cents (floor(value*100)): floor of a
        // double is exact and identical in Spark and DuckDB, unlike float
        // formatting, whose tie-rounding rules differ (java HALF_UP vs C
        // round-half-even).
        val cents = floor(col("value") * 100).cast("long")
        val raw = format_string(
          """{"pk":{"S":"u%d"},"v":{"N":"%d"},"t":{"S":"%s"},"tags":{"L":[{"S":"%s"},{"N":"%d"}]}}""",
          col("user_id"), cents, col("event_type"), col("event_type"), col("user_id"))
        // single from_json parse (see cdc_ddb_roundtrip); the heterogeneous
        // L decodes as ARRAY<STRING> — Spark's string converter takes any
        // token's text, so the numeric element arrives as "42" → cast
        events(s, d)
          .select(col("event_id"),
            from_json(AttributeValue.ddbDecode(raw),
              "pk STRING, v BIGINT, t STRING, tags ARRAY<STRING>",
              Map.empty[String, String]).as("r"))
          .select(
            col("event_id"),
            col("r.pk").as("pk"),
            col("r.v").as("v"),
            col("r.t").as("t"),
            element_at(col("r.tags"), 2).cast("long").as("tag1"))
      },
      Some("""
        SELECT event_id, 'u' || CAST(user_id AS VARCHAR) AS pk,
               CAST(floor(value * 100) AS BIGINT) AS v,
               event_type AS t, user_id AS tag1
        FROM events""")),

    // ───── A3 — write-chunk grouping: the reference drains each
    // invocation batch in 25-item BatchWriteItem chunks in arrival order
    // (CHUNK_SIZE, app/lambdas/lambda-backfill/main.py:22,41-46). Batch ≈
    // the hour bucket, arrival order ≈ (ts, event_id); chunk occupancy
    // and the put/delete mix per chunk fall out of a windowed row_number
    // — the logical form of what the sink's foreachPartition grouped(25)
    // does physically.
    QuerySpec(
      "cdc_write_chunks",
      (s, d) => {
        val w = Window.partitionBy(date_trunc("hour", col("ts")))
          .orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("batch", date_trunc("hour", col("ts")))
          .withColumn("chunk", floor((row_number().over(w) - 1) / 25.0))
          .groupBy("batch", "chunk")
          .agg(count(lit(1)).as("n_items"),
            count(when(col("event_type") =!= "error", 1)).as("n_puts"),
            count(when(col("event_type") === "error", 1)).as("n_deletes"))
      },
      Some("""
        SELECT batch, chunk, count(*) AS n_items,
               count(CASE WHEN event_type != 'error' THEN 1 END) AS n_puts,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n_deletes
        FROM (
          SELECT date_trunc('hour', ts) AS batch, event_type,
                 CAST(floor((ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                   ORDER BY ts, event_id) - 1) / 25.0) AS BIGINT) AS chunk
          FROM events)
        GROUP BY batch, chunk""")),

    // ───── J1-plus — incremental view maintenance
    // ([[graft.ops.CdcOps.incrementalAggMaintain]]): a per-event-type
    // (live keys, value sum) dashboard maintained from the post-T delta
    // by signed retract/assert updates — the full table is NEVER
    // re-aggregated; delta-side cost is O(|delta| + touched keys).
    // The oracle recomputes the same aggregate from the fully-replayed
    // final state, so cross-engine hash equality proves the incremental
    // path exact, including tombstone retractions and groups that drain
    // to zero. Value in exact integer cents until one final double
    // division (the dsum discipline).
    QuerySpec(
      "cdc_incremental_agg",
      (s, d) => {
        val ev = events(s, d)
        val tcol = lit(T).cast("timestamp")
        val cents = expr("cast(round(value * 100) as bigint)")
        val stateAtT = CdcOps.lwwCompact(ev.filter(col("ts") <= tcol),
          Seq("user_id"), keyOrder).filter(!isRemove)
        val aggAtT = stateAtT.groupBy(col("event_type").as("grp"))
          .agg(count(lit(1)).as("n_keys"), sum(cents).as("m_sum"))
        CdcOps.incrementalAggMaintain(
          aggAtT, stateAtT, ev.filter(col("ts") > tcol),
          Seq("user_id"), keyOrder, isRemove,
          col("event_type"), cents)
          .select(col("grp").as("event_type"), col("n_keys"),
            (col("m_sum").cast("double") / 100.0).as("value_sum"))
      },
      Some(s"""
        WITH cur AS (
          SELECT user_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) rn
          FROM events)
        SELECT event_type, COUNT(*) AS n_keys,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum
        FROM cur WHERE rn = 1 AND event_type <> 'error'
        GROUP BY event_type""")),

    // ───── §2.9-plus — schema-drift report over the CDC stream: the
    // attribute inventory of the item images — (attribute, DDB type) →
    // first_seen / last_seen / occurrences. DynamoDB is schemaless per
    // item (the reference's Lambdas apply whatever NewImage arrives,
    // app/lambdas/lambda-cdc/main.py's blind item put), so a NEW
    // attribute appearing mid-stream or an attribute CHANGING TYPE is
    // invisible until a consumer breaks; this report is the monitor
    // that catches both (the drift here: `sess` exists for only ⅓ of
    // keys, `score` appears on 2024-01-20, `v` flips N→S on view
    // events). Spark-first shape: the image parses ONCE as
    // MAP<STRING,STRING> (Jackson keeps each AttributeValue's raw JSON
    // as the map value), explode → json_object_keys picks the type tag
    // per attribute — all per-row maps; the only shuffle is the final
    // (attr, type)-cardinality hash agg with map-side partials. The
    // oracle mirrors the CONSTRUCTION (conditional UNION ALL branches),
    // not the parse — the established cdc_ddb_* pattern.
    QuerySpec(
      "cdc_schema_drift",
      (s, d) => {
        val img = concat(
          format_string("""{"pk":{"S":"u%d"}""", col("user_id")),
          format_string(""","v":%s""",
            when(col("event_type") === "view",
              format_string("""{"S":"%d"}""", floor(col("value") * 100).cast("long")))
              .otherwise(
                format_string("""{"N":"%d"}""", floor(col("value") * 100).cast("long")))),
          format_string(""","t":{"S":"%s"}""", col("event_type")),
          when(col("user_id") % 3 === 0,
            format_string(""","sess":{"S":"s%d"}""", col("user_id"))).otherwise(""),
          when(col("ts") >= lit("2024-01-20 00:00:00").cast("timestamp"),
            format_string(""","score":{"N":"%d"}""", col("event_id"))).otherwise(""),
          lit("}"))
        events(s, d)
          .select(col("ts"),
            explode(from_json(img, "MAP<STRING, STRING>",
              Map.empty[String, String])).as(Seq("attr", "av")))
          // The envelope is parsed ONCE (the from_json above); the value's
          // type tag is its first object key, and from_json's raw-text
          // capture of a nested value preserves the canonical form
          // (`{"S":...`), so the tag is cut out with codegen'd string
          // intrinsics — `json_object_keys` here would re-enter Jackson
          // (CodegenFallback) once per exploded attribute row, 4-5× per
          // event, and measured ~25% of the whole query's time. The fast
          // path is GUARDED on the compact-canonical prefix `{"` it
          // assumes: a pretty-printed producer (whitespace before the
          // tag) or a non-object attribute value falls back to the
          // robust json_object_keys parse instead of yielding a garbage
          // tag — the guard is one codegen'd prefix compare, so the hot
          // path stays hot.
          .withColumn("avtype",
            when(substring(col("av"), 1, 2) === """{"""",
              expr("""substring(av, 3, instr(substring(av, 3), '"') - 1)"""))
              .otherwise(expr("element_at(json_object_keys(av), 1)")))
          .groupBy("attr", "avtype")
          .agg(min(col("ts")).as("first_seen"),
            max(col("ts")).as("last_seen"),
            count(lit(1)).as("n"))
          .orderBy("attr", "avtype")
      },
      Some("""
        SELECT attr, avtype, min(ts) AS first_seen, max(ts) AS last_seen,
               CAST(count(*) AS BIGINT) AS n
        FROM (
          SELECT ts, 'pk' AS attr, 'S' AS avtype FROM events
          UNION ALL
          SELECT ts, 'v', CASE WHEN event_type = 'view' THEN 'S' ELSE 'N' END FROM events
          UNION ALL
          SELECT ts, 't', 'S' FROM events
          UNION ALL
          SELECT ts, 'sess', 'S' FROM events WHERE user_id % 3 = 0
          UNION ALL
          SELECT ts, 'score', 'N' FROM events
          WHERE ts >= TIMESTAMP '2024-01-20 00:00:00')
        GROUP BY attr, avtype ORDER BY attr, avtype""")),

    // ───── GSI maintenance ([[graft.ops.CdcOps.gsiDelta]]): the index
    // mutation plan DynamoDB derives per base-table write for every
    // global secondary index — the restored table's GSIs ride the replay
    // through exactly this plan. Index here: partition key = event_type,
    // SPARSE membership = cents >= 1000 (the "item carries the indexed
    // attribute" rule), projection = (event_id, cents). The delta's LWW
    // winners LEFT-join the prior state on the base key (only touched
    // keys produce rows — O(|delta|), never a state scan), and a key
    // MOVE emits its DELETE(old)+PUT(new) pair off one joined pass.
    // The oracle replays the same four-way transition table
    // (absent/present × key-moved/attr-dropped/removed) in SQL.
    QuerySpec(
      "cdc_gsi_project",
      (s, d) => {
        val ev = events(s, d)
        val tcol = lit(T).cast("timestamp")
        val cents = expr("cast(round(value * 100) as bigint)")
        val stateAtT = CdcOps.lwwCompact(ev.filter(col("ts") <= tcol),
          Seq("user_id"), keyOrder).filter(!isRemove)
        CdcOps.gsiDelta(
          stateAtT, ev.filter(col("ts") > tcol),
          keys = Seq("user_id"), order = keyOrder, isRemove = isRemove,
          gsiKey = col("event_type"), present = cents >= 1000,
          projection = Seq("event_id" -> col("event_id"), "cents" -> cents))
          .orderBy("user_id", "op", "gsi_key")
      },
      Some(s"""
        WITH oldw AS (
          SELECT user_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
          FROM events WHERE ts <= TIMESTAMP '$T'),
        old_state AS (
          SELECT user_id, event_type AS old_key, cents >= 1000 AS old_present
          FROM oldw WHERE rn = 1 AND event_type <> 'error'),
        neww AS (
          SELECT user_id, event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
          FROM events WHERE ts > TIMESTAMP '$T'),
        new_state AS (
          SELECT user_id, event_id, event_type = 'error' AS removed,
                 event_type AS new_key, cents
          FROM neww WHERE rn = 1),
        j AS (
          SELECT n.user_id, n.event_id, n.removed, n.new_key, n.cents,
                 NOT n.removed AND n.cents >= 1000 AS new_present,
                 o.old_key, COALESCE(o.old_present, FALSE) AS old_present
          FROM new_state n LEFT JOIN old_state o ON n.user_id = o.user_id)
        SELECT user_id, 'DELETE' AS op, old_key AS gsi_key,
               CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS BIGINT) AS cents
        FROM j WHERE old_present AND (NOT new_present OR new_key <> old_key)
        UNION ALL
        SELECT user_id, 'PUT', new_key, event_id, cents FROM j WHERE new_present
        ORDER BY user_id, op, gsi_key""")),

    // ───── capacity accounting for the replay drain — the throttling plan
    // a real backfill needs before it starts (the reference replays with no
    // capacity model and would discover throttling in production;
    // BatchWriteItem chunks at app/lambdas/lambda-backfill/main.py:41-46).
    // Public DynamoDB WCU rules: a write costs ceil(item_bytes/1KB); a
    // delete is priced by the removed item (key-only here → 1 WCU). Item
    // bytes come from the stream envelope's own SizeBytes channel — the
    // proxy here derives it as a declared model (fixed envelope overhead +
    // field text lengths + cents as the payload-bytes stand-in, spanning
    // 1..11 WCU so the ceil arithmetic is actually exercised). Per hour
    // batch: items, API calls (25-item chunks in arrival order), total and
    // worst-chunk WCU, and drain seconds against 1000 provisioned WCU —
    // pure integer arithmetic end-to-end, one window + two hash-aggs.
    QuerySpec(
      "cdc_capacity_plan",
      (s, d) => {
        val w = Window.partitionBy(date_trunc("hour", col("ts")))
          .orderBy(col("ts"), col("event_id"))
        val cents = expr("cast(round(value * 100) as bigint)")
        val itemBytes = lit(60L) +
          length(col("event_id").cast("string")) + length(col("event_type")) +
          length(col("user_id").cast("string")) + length(col("props")) + cents
        // ceil via floor-div: /1024 is a power-of-two double division
        // (exact for longs < 2^53), so floor+cast IS integer floor-div
        val wcu = when(isRemove, lit(1L))
          .otherwise(floor((itemBytes + 1023L) / lit(1024.0)).cast("long"))
        events(s, d)
          .withColumn("batch", date_trunc("hour", col("ts")))
          .withColumn("chunk", floor((row_number().over(w) - 1) / 25.0))
          .withColumn("wcu", wcu)
          .groupBy("batch", "chunk")
          .agg(count(lit(1)).as("n"), sum(col("wcu")).as("chunk_wcu"))
          .groupBy("batch")
          .agg(sum(col("n")).as("n_items"),
            count(lit(1)).as("n_api_calls"),
            sum(col("chunk_wcu")).as("total_wcu"),
            max(col("chunk_wcu")).as("max_chunk_wcu"),
            // ceil(total/1000): /1000 is not a power of two, but the
            // rounding error (~ulp(k)) can never bridge the 1/1000 gap
            // to the next integer, so floor+cast is still exact
            floor((sum(col("chunk_wcu")) + 999L) / lit(1000.0)).cast("long")
              .as("drain_s"))
          .orderBy("batch")
      },
      Some("""
        WITH sized AS (
          SELECT date_trunc('hour', ts) AS batch,
                 CAST(floor((ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                   ORDER BY ts, event_id) - 1) / 25.0) AS BIGINT) AS chunk,
                 CASE WHEN event_type = 'error' THEN 1
                      ELSE (60 + length(CAST(event_id AS VARCHAR))
                            + length(event_type)
                            + length(CAST(user_id AS VARCHAR)) + length(props)
                            + CAST(round(value * 100) AS BIGINT) + 1023) // 1024
                 END AS wcu
          FROM events),
        chunks AS (
          SELECT batch, chunk, count(*) AS n,
                 CAST(sum(wcu) AS BIGINT) AS chunk_wcu
          FROM sized GROUP BY batch, chunk)
        SELECT batch, CAST(sum(n) AS BIGINT) AS n_items,
               count(*) AS n_api_calls,
               CAST(sum(chunk_wcu) AS BIGINT) AS total_wcu,
               max(chunk_wcu) AS max_chunk_wcu,
               CAST((sum(chunk_wcu) + 999) // 1000 AS BIGINT) AS drain_s
        FROM chunks GROUP BY batch ORDER BY batch"""))
  ,

    // ───── SCD Type-2 dimension build (r9): the warehouse-standard
    // rendering of a CDC history — each non-tombstone version becomes
    // an interval row [valid_from, valid_to) closed by the NEXT change
    // of any kind (a newer version or a REMOVE both close it; a REMOVE
    // itself opens nothing, so deleted periods are gaps, which is the
    // SCD2 contract). One window pass in the per-key (ts, event_id)
    // total order — the lead() must run BEFORE the tombstone filter or
    // deletes stop closing intervals (the classic SCD2 bug; the oracle
    // is written with the same pre-filter lead, and the gate's row
    // cardinality + is_current flags break if either side reorders the
    // two steps). Linear, one shuffle on the key — the same shape as
    // cdc_order_within_key at 100 TB.
    QuerySpec(
      "cdc_scd2",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          .filter(!isRemove)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), col("ts").as("valid_from"), col("valid_to"),
            col("valid_to").isNull.as("is_current"))
      },
      Some("""
        SELECT user_id, event_id, event_type, value, ts AS valid_from,
               valid_to, (valid_to IS NULL) AS is_current
        FROM (
          SELECT user_id, event_id, event_type, value, ts,
                 lead(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS valid_to
          FROM events)
        WHERE event_type <> 'error'"""))
  ,

    // ───── live-key cardinality over time (r9): how many keys the
    // target table holds at the end of each day — the table-size
    // monitor a CDC operator alerts on (a replay bug shows up as a
    // cardinality cliff long before anyone reads a row). Computed as a
    // CHANGE-POINT SWEEP, the O(changes) shape: each key contributes a
    // ±1 delta only where its live/tombstoned status FLIPS (lag over
    // the per-key total order; a key born dead contributes nothing),
    // deltas collapse to per-day sums joined onto the full day spine,
    // and one running sum over |days| rows yields the timeline — never
    // a days×keys grid, never a per-day table scan. The oracle IS the
    // days×keys grid (DuckDB ASOF-joins every (day, key) to its latest
    // status — the definition, affordable at oracle scale), so the
    // sweep's every flip rule is checked against the semantics, not
    // against itself.
    QuerySpec(
      "cdc_cardinality_timeline",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val flips = events(s, d)
          .withColumn("is_live", (!isRemove).cast("int"))
          .withColumn("prev_live", lag(col("is_live"), 1).over(w))
          .filter((col("prev_live").isNull && col("is_live") === 1) ||
            (col("prev_live").isNotNull && col("prev_live") =!= col("is_live")))
          .withColumn("delta", when(col("is_live") === 1, 1L).otherwise(-1L))
          .groupBy(to_date(col("ts")).as("day")).agg(sum(col("delta")).as("dsum"))
        val spine = events(s, d).select(to_date(col("ts")).as("day")).distinct()
        val wd = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(flips, Seq("day"), "left")
          .withColumn("dsum", coalesce(col("dsum"), lit(0L)))
          .withColumn("n_live_end", sum(col("dsum")).over(wd))
          .select(col("day"), col("n_live_end"))
      },
      Some("""
        WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
        statuses AS (
          SELECT user_id, day, let FROM (
            SELECT user_id, CAST(ts AS DATE) AS day, event_type AS let,
                   row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1),
        grid AS (
          SELECT d.day, u.user_id, s.let
          FROM days d CROSS JOIN (SELECT DISTINCT user_id FROM events) u
          ASOF LEFT JOIN statuses s ON s.user_id = u.user_id AND s.day <= d.day)
        SELECT day,
               CAST(count(CASE WHEN let IS NOT NULL AND let <> 'error' THEN 1 END)
                    AS BIGINT) AS n_live_end
        FROM grid GROUP BY day"""))
  ,

    // ───── point-in-time SCD2 dimension join (r9): each purchase fact
    // picks up the dimension VERSION that was valid at its own
    // timestamp — the temporal join every SCD2 warehouse runs (and the
    // classic silent-corruption site: joining facts to the CURRENT
    // version backfills history with today's attributes). Dimension =
    // the per-user version stream (signup/view/click rows as versions,
    // error as tombstone); facts = purchases. ONE window pass over the
    // unioned per-key timeline forward-fills the last version id/value
    // at-or-before each fact (version rows sort before facts at equal
    // (ts, event_id) never collide — event_id is unique), a tombstone
    // overwrites the fill with NULL so deleted periods join to nothing.
    // The oracle is DuckDB's native ASOF JOIN against the materialized
    // interval table — an INDEPENDENT formulation (build intervals,
    // range-match) of the same semantics, so a fill that leaks across a
    // tombstone or reads a version from the future breaks the compare.
    QuerySpec(
      "cdc_scd2_join",
      (s, d) => {
        val isFact = col("event_type") === "purchase"
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .withColumn("v_mark",
            when(!isFact && !isRemove, col("event_id"))
              .when(isRemove, lit(-1L))) // tombstone sentinel
          .withColumn("v_fill",
            last(col("v_mark"), ignoreNulls = true).over(w))
          .withColumn("vv_mark",
            when(!isFact && !isRemove, col("value")).when(isRemove, lit(-1.0)))
          .withColumn("vv_fill",
            last(col("vv_mark"), ignoreNulls = true).over(w))
          .filter(isFact)
          .select(col("event_id").as("fact_id"), col("user_id"),
            when(col("v_fill") =!= -1L, col("v_fill")).as("dim_version_id"),
            when(col("v_fill") =!= -1L, col("vv_fill")).as("dim_value"))
      },
      Some("""
        WITH dim AS (
          SELECT user_id, event_id AS version_id, value, ts AS valid_from,
                 lead(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS valid_to
          FROM events WHERE event_type <> 'purchase'),
        live AS (
          SELECT user_id, version_id, value, valid_from, valid_to
          FROM (SELECT d.*, e.event_type
                FROM dim d JOIN events e ON e.event_id = d.version_id)
          WHERE event_type <> 'error'),
        facts AS (
          SELECT event_id AS fact_id, user_id, ts
          FROM events WHERE event_type = 'purchase')
        SELECT fact_id, user_id,
               CASE WHEN version_id IS NOT NULL
                     AND (valid_to IS NULL OR ts < valid_to)
                    THEN version_id END AS dim_version_id,
               CASE WHEN version_id IS NOT NULL
                     AND (valid_to IS NULL OR ts < valid_to)
                    THEN value END AS dim_value
        FROM (
          SELECT f.fact_id, f.user_id, f.ts, v.version_id, v.value, v.valid_to
          FROM facts f
          ASOF LEFT JOIN live v
            ON v.user_id = f.user_id AND v.valid_from <= f.ts)""")),

    // ───── late-arrival / out-of-order delivery audit (r12): the CDC
    // ops metric that decides watermark delays and retention windows —
    // per key, an event is LATE when its event time precedes the
    // event-time high-water mark of earlier-DELIVERED events of that
    // key, and the max lateness IS the watermarkDelay the streaming
    // operators take as a parameter. The reference assumes perfectly
    // ordered per-key FIFO delivery (cdk/lib/cdk-stack.ts:47 routes
    // everything through one message group) — and this driver log IS
    // perfectly ordered (measured: auditing the raw event_id order
    // returns n_late = 0 for every type), so the delivery order under
    // audit is a DETERMINISTIC jitter simulation: each event delivers
    // at ts ± ≤60 s of md5-derived jitter (the md5-keyed rand-free
    // house discipline), the shape a multi-shard consumer's interleave
    // produces. The operator itself is order-agnostic — point
    // `delivery_pos` at a real ingestion sequence and nothing else
    // changes. One per-key window (shards by key) + one bounded
    // hash-agg; lateness in exact microseconds; the p-max lands ~120 s
    // = the jitter bound, which is the calibration check.
    QuerySpec(
      "cdc_late_arrival_audit",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("delivery_pos"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        events(s, d)
          .withColumn("delivery_pos", expr(
            "unix_micros(ts) + cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as long) % 120000000 - 60000000"))
          .withColumn("hwm", max(expr("unix_micros(ts)")).over(w))
          .withColumn("late_us",
            when(col("hwm").isNotNull && expr("unix_micros(ts)") < col("hwm"),
              col("hwm") - expr("unix_micros(ts)")))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            count(col("late_us")).as("n_late"),
            expr("count(late_us) * 1000000 div count(1)").as("late_ppm"),
            max("late_us").as("max_late_us"),
            sum("late_us").as("late_us_sum"))
      },
      Some("""
        WITH delv AS (
          SELECT event_type, user_id, event_id, epoch_us(ts) AS tus,
                 epoch_us(ts)
                   + ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                     % 120000000 - 60000000 AS delivery_pos
          FROM events),
        marked AS (
          SELECT event_type, tus,
                 MAX(tus) OVER (PARTITION BY user_id
                   ORDER BY delivery_pos, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
          FROM delv),
        lat AS (
          SELECT event_type,
                 CASE WHEN hwm IS NOT NULL AND tus < hwm
                      THEN hwm - tus END AS late_us
          FROM marked)
        SELECT event_type, COUNT(*) AS n_events,
               COUNT(late_us) AS n_late,
               CAST(COUNT(late_us) * 1000000 // COUNT(*) AS BIGINT) AS late_ppm,
               CAST(MAX(late_us) AS BIGINT) AS max_late_us,
               CAST(SUM(late_us) AS BIGINT) AS late_us_sum
        FROM lat GROUP BY 1""")),

    // ───── CDC op-mix profile (r14): the write-side composition of the
    // change log per day — PUT/DELETE counts, tombstone share, keys
    // touched, and re-write pressure (writes per touched key) — the
    // capacity readout that pairs with cdc_capacity_plan (throughput)
    // and cdc_cardinality_timeline (live-key census): a rising
    // tombstone share means compaction debt, a rising writes/key means
    // hot-key LWW churn. One hash-agg over one scan; exact ppm.
    QuerySpec(
      "cdc_op_mix",
      (s, d) => events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_writes"),
          sum(when(isRemove, 1L).otherwise(0L)).as("n_deletes"),
          countDistinct(col("user_id")).as("n_keys"))
        .select(col("day"), col("n_writes"), col("n_deletes"), col("n_keys"),
          expr("n_deletes * 1000000 div n_writes").as("tombstone_ppm"),
          expr("n_writes * 1000 div n_keys").as("writes_per_key_milli")),
      Some("""
        SELECT CAST(ts AS DATE) AS day,
               COUNT(*) AS n_writes,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_deletes,
               COUNT(DISTINCT user_id) AS n_keys,
               CAST(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                 AS BIGINT) * 1000000 // COUNT(*) AS BIGINT) AS tombstone_ppm,
               CAST(COUNT(*) * 1000 // COUNT(DISTINCT user_id) AS BIGINT)
                 AS writes_per_key_milli
        FROM events GROUP BY 1""")),

    // ───── Conditional-write apply, batch face (r14, VERDICT r13 #7):
    // DynamoDB's per-item concurrency primitive — ConditionExpression
    // with attribute_not_exists(pk) (insert-if-absent) or a version
    // guard (optimistic concurrency) — evaluated against prior state
    // via the GetItem-batch semi-join (the A10 shape; the streaming
    // face is SnapshotStore.mergeConditional under
    // ConditionalWriteSpec). Fixture: base = the tombstone-resolved
    // LWW state at T (latest ≤T event of type 'error' ⇒ key ABSENT —
    // the restore-replay semantics) with version = the user's event
    // count ≤ T; the write batch = each user's latest event in
    // (T, T2], LWW-compacted to one write per key (the batch-face
    // discipline), op = create (put-if-absent) when that event is a
    // 'click', else a version-guarded update whose expected version is
    // the count the writer READ — stale for even user_ids (snapshot at
    // T0 < T), current for odd: the deterministic stale-reader split
    // that makes version guards bite. Outcomes: create applies iff the
    // key is absent/tombstoned; update applies iff the key is live AND
    // versions match; rejected writes audit as rejected_exists /
    // rejected_absent / rejected_version. Three hash-aggs + two
    // key-equi-joins, all sharding on user_id — no windows, no
    // driver-side state; bounded ≤5-row audit summary with exact
    // key-sum and value-cents checksums per outcome class.
    QuerySpec(
      "cdc_conditional_write",
      (s, d) => {
        val T0 = "2024-01-08 00:00:00" // the stale readers' snapshot
        val ev = events(s, d)
        val base = ev.filter(col("ts") <= lit(T).cast("timestamp"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_base"),
            max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"))
          .filter(col("m.event_type") =!= "error")
          .select(col("user_id"), col("n_base"))
        val stale = ev
          .filter(col("ts") <= when(col("user_id") % 2 === 0, lit(T0))
            .otherwise(lit(T)).cast("timestamp"))
          .groupBy("user_id").agg(count(lit(1)).as("n_stale"))
        val writes = ev
          .filter(col("ts") > lit(T).cast("timestamp") &&
            col("ts") <= lit(T2).cast("timestamp"))
          .groupBy("user_id")
          .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
            col("value"))).as("m"))
          .select(col("user_id"),
            when(col("m.event_type") === "click", lit("create"))
              .otherwise(lit("update")).as("op"),
            col("m.value").as("value"))
        writes.join(base, Seq("user_id"), "left")
          .join(stale, Seq("user_id"), "left")
          .select(col("op"), col("user_id"), col("value"),
            when(col("op") === "create" && col("n_base").isNull, "applied")
              .when(col("op") === "create", "rejected_exists")
              .when(col("n_base").isNull, "rejected_absent")
              .when(col("n_stale") <=> col("n_base"), "applied")
              .otherwise("rejected_version").as("outcome"))
          .groupBy("op", "outcome")
          .agg(count(lit(1)).as("n_writes"), sum("user_id").as("key_sum"),
            sum(round(col("value") * 100).cast("long")).as("value_cents"))
      },
      Some(s"""
        WITH pre AS (
          SELECT user_id, event_type,
                 COUNT(*) OVER (PARTITION BY user_id) AS n_base,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) rn
          FROM events WHERE ts <= TIMESTAMP '$T'),
        base AS (
          SELECT user_id, n_base FROM pre WHERE rn = 1 AND event_type <> 'error'),
        stale AS (
          SELECT user_id, COUNT(*) AS n_stale FROM events
          WHERE ts <= (CASE WHEN user_id % 2 = 0
                            THEN TIMESTAMP '2024-01-08 00:00:00'
                            ELSE TIMESTAMP '$T' END)
          GROUP BY 1),
        w AS (
          SELECT user_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) rn
          FROM events WHERE ts > TIMESTAMP '$T' AND ts <= TIMESTAMP '$T2'),
        writes AS (
          SELECT user_id,
                 CASE WHEN event_type = 'click' THEN 'create'
                      ELSE 'update' END AS op,
                 value
          FROM w WHERE rn = 1),
        j AS (
          SELECT wr.op, wr.user_id, wr.value, b.n_base,
                 COALESCE(st.n_stale, 0) AS n_stale
          FROM writes wr LEFT JOIN base b ON b.user_id = wr.user_id
                         LEFT JOIN stale st ON st.user_id = wr.user_id)
        SELECT op,
               CASE WHEN op = 'create' AND n_base IS NULL THEN 'applied'
                    WHEN op = 'create' THEN 'rejected_exists'
                    WHEN n_base IS NULL THEN 'rejected_absent'
                    WHEN n_stale = n_base THEN 'applied'
                    ELSE 'rejected_version' END AS outcome,
               COUNT(*) AS n_writes,
               CAST(SUM(user_id) AS BIGINT) AS key_sum,
               CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM j GROUP BY 1, 2"""))
  )
}
