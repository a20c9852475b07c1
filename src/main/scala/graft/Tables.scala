package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders over the driver-generated test data
  * (`/root/testdata/sf*` — see TESTDATA.md). At cluster scale the same
  * call pattern works over any parquet directory; scans are columnar +
  * vectorized, and Catalyst pushes filters/projections into the scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Normalize timestamp-bearing columns to `TimestampType` (UTC ltz) no
    * matter which physical encoding the parquet writer chose. The driver's
    * generator has shipped `events.ts` two ways so far:
    *   - parquet TIMESTAMP(NANOS) → Spark `LongType` ns-since-epoch under
    *     spark.sql.legacy.parquet.nanosAsLong=true (GraftSession); convert
    *     with integer `DIV 1000` — exact, the generator emits µs precision,
    *     matching DuckDB's µs TIMESTAMP truncation on the same file.
    *   - parquet timestamp[us] (isAdjustedToUTC=false) → Spark 4
    *     `TIMESTAMP_NTZ`; cast to `TimestampType`. The session TZ is pinned
    *     UTC (GraftSession.tune), so the cast relabels the same instant
    *     bit-for-bit and the DuckDB oracle (which reads the file natively)
    *     sees identical values.
    * Already-ltz columns pass through untouched. Every loader with a
    * timestamp column routes through here so future testdata regeneration
    * cannot silently change analysis-time types again.
    */
  def normalizeTs(df: DataFrame, cols: String*): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case LongType         => d.withColumn(c, timestamp_micros(expr(s"`$c` DIV 1000")))
        case TimestampNTZType => d.withColumn(c, col(c).cast(TimestampType))
        case _                => d
      }
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"), "ts")

  /** Fan heavy per-row compute out to the session's full parallelism when
    * the upstream's natural partitioning is below it.
    *
    * WHY: parquet scans parallelize at row-group granularity, and a table
    * written as one row group (every `/root/testdata` table is) yields a
    * ONE-task scan — so every map-side stage up to the first exchange
    * (rep-axis md5 expansion, tokenization, vector math against broadcast
    * codebooks, including the partial aggregation fused into that stage)
    * runs on a single core no matter how many the session has. This is the
    * optimization guide's §2.5 "input skew: one huge unsplittable file —
    * repartition immediately after the read".
    *
    * Scale-adaptive by construction, NOT a local-mode constant: the target
    * is `sparkContext.defaultParallelism` (the session's core budget, from
    * `SPARK_GRAFT_CPUS` locally, the executor fleet on a cluster), and the
    * repartition only fires when the input's partitioning is BELOW it — at
    * cluster scale a real table scan already carries hundreds of splits and
    * this is an identity. The explicit-N round-robin repartition is exempt
    * from AQE coalescing (REPARTITION_BY_NUM), so the fan-out survives to
    * execution. Only order-insensitive consumers may sit downstream (exact
    * integer/decimal aggregation — the house determinism rule); callers
    * with order-sensitive folds must not use this.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** Keyed repartition of a persisted ITERATION INPUT to the session's
    * parallelism floor — the [[fanOut]] idea for join-output roots
    * (where `df.rdd` would force AQE stage execution, so the partition
    * count cannot be probed for free): AQE's small-shuffle coalescing
    * collapses a tiny build's output to one or two partitions, and every
    * later per-round join/aggregate over the persisted frame inherits
    * that near-serial layout, rounds × consumers times over (guide §2.4:
    * establish the partitioning once, where it is reused). Hash-
    * partitioning by the per-round join key also means only the rank /
    * frontier side of each round's join moves — the edge payload never
    * re-shuffles (the purchaseWithDeg pattern). The width is
    * max(defaultParallelism, spark.sql.shuffle.partitions): the session's
    * core budget locally, the configured shuffle width on a cluster —
    * never a hard-coded local constant.
    */
  def spread(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame = {
    val s = df.sparkSession
    val p = math.max(s.sparkContext.defaultParallelism,
      s.sessionState.conf.numShufflePartitions)
    df.repartition(p, cols: _*)
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
