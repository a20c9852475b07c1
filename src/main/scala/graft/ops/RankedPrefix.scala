package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase global ordered aggregation — the distributed replacement for
  * `Window.orderBy(...)` over a data-proportional frame.
  *
  * A bare empty-partition window puts the WHOLE ordered pass on one task:
  * at 100 TB that task is the job. This op factors the machinery first
  * built for `supplier_pareto` (r6) into a reusable shape:
  *
  *   1. range-repartition the frame on (part ++ order) so partition ids
  *      follow the sort order, and persist it (pinning pid consistency
  *      between the two consumers below — the same trick a distributed
  *      sort-prefix-sum uses);
  *   2. run row_number / running sums WITHIN each partition — parallel
  *      windows keyed by (part, pid);
  *   3. lift them to global (per-`part`-group) values by adding
  *      per-partition prefix offsets — a ≤(|groups|·numParts)-row frame,
  *      cumulated in a window over partition ids and broadcast back.
  *
  * Range boundaries need not be balanced for correctness: any
  * order-consistent split yields identical global ranks/sums (the oracle
  * hash-checks exactly that). REQUIREMENT: (part ++ order) must be a
  * TOTAL order — ties could straddle a range boundary and would make
  * row_number nondeterministic (the same discipline every ranked query
  * in this repo already follows).
  *
  * Reference anchor: the reference's pipeline has no ranked analytics at
  * all (its 190 Python lines move opaque items,
  * app/lambdas/lambda-backfill/main.py:27-47); this op exists for the
  * north-star analytics surface where global order statistics (Pareto,
  * ntile tiers, cume_dist, equi-depth buckets) must shard.
  */
object RankedPrefix {

  /** Adds to `df`:
    *   - `rank`: 1-based global row_number within each `part` group
    *     under `order` (if Some);
    *   - for each (name, c) in `running`: the INCLUSIVE running sum of
    *     `c` within the group under `order`;
    *   - for each (name, c) in `totals`: the group-wide total of `c`
    *     (count via `lit(1L)`).
    *
    * `cacheKey` keys the persisted ranged frame in [[graft.analytics.Corpus]]
    * so repeated plan construction (bench reruns, multi-consumer plans)
    * reuses one cache entry per (dir, key).
    */
  def apply(
      s: SparkSession,
      d: String,
      cacheKey: String,
      df: DataFrame,
      part: Seq[String],
      order: Seq[Column],
      rank: Option[String] = Some("r"),
      running: Seq[(String, Column)] = Nil,
      totals: Seq[(String, Column)] = Nil,
      numParts: Int = 32,
      cached: Boolean = true): DataFrame = {

    // materialize running/total inputs as columns BEFORE the range
    // exchange so both consumers evaluate them identically
    val rIn = running.zipWithIndex.map { case ((n, _), i) => (n, s"__rp_r$i") }
    val tIn = totals.zipWithIndex.map { case ((n, _), i) => (n, s"__rp_t$i") }
    val pre0 = running.zip(rIn).foldLeft(df) { case (f, ((_, c), (_, tmp))) =>
      f.withColumn(tmp, c)
    }
    val pre = totals.zip(tIn).foldLeft(pre0) { case (f, ((_, c), (_, tmp))) =>
      f.withColumn(tmp, c)
    }

    val rangeKeys = part.map(col) ++ order
    val rangedPlan = pre.repartitionByRange(numParts, rangeKeys: _*)
      .withColumn("__rp_pid", spark_partition_id())
    // cached=false (streaming/per-batch callers): pin pid consistency
    // with a per-call localCheckpoint instead of the session-lifetime
    // Corpus memo — a per-batch key would accumulate persisted frames
    // across micro-batches; the checkpointed RDD frees with the Dataset
    val ranged =
      if (cached)
        graft.analytics.Corpus.cached(s, d, s"rankedPrefix:$cacheKey")(rangedPlan)
      else rangedPlan.localCheckpoint(true)

    // phase 2: parallel per-partition windows
    val wIn = Window.partitionBy((part :+ "__rp_pid").map(col): _*).orderBy(order: _*)
    val wCum = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withR = rank.foldLeft(ranged)((f, n) =>
      f.withColumn(n, row_number().over(wIn).cast("long")))
    val within = rIn.foldLeft(withR) { case (f, (n, tmp)) =>
      f.withColumn(n, sum(col(tmp)).over(wCum))
    }

    // phase 3: prefix offsets — one row per (part-group, pid), bounded by
    // numParts per group, never by data
    val offAggs =
      (Seq(count(lit(1L)).as("__rp_pcnt")) ++
        rIn.map { case (_, tmp) => sum(col(tmp)).as(s"${tmp}_ps") } ++
        tIn.map { case (_, tmp) => sum(col(tmp)).as(s"${tmp}_ps") })
    val grouped = ranged.groupBy((part :+ "__rp_pid").map(col): _*)
      .agg(offAggs.head, offAggs.tail: _*)
    val wP = Window.partitionBy(part.map(col): _*).orderBy("__rp_pid")
    val wPrev = wP.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(part.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val off0 = grouped.withColumn("__rp_roff",
      coalesce(sum(col("__rp_pcnt")).over(wPrev), lit(0L)))
    val off1 = rIn.foldLeft(off0) { case (f, (_, tmp)) =>
      f.withColumn(s"${tmp}_off",
        coalesce(sum(col(s"${tmp}_ps")).over(wPrev), lit(0L)))
    }
    val off2 = tIn.foldLeft(off1) { case (f, (n, tmp)) =>
      f.withColumn(n, sum(col(s"${tmp}_ps")).over(wAll))
    }
    val offsets = off2.select(
      ((part :+ "__rp_pid" :+ "__rp_roff").map(col) ++
        rIn.map { case (_, tmp) => col(s"${tmp}_off") } ++
        tIn.map { case (n, _) => col(n) }): _*)

    val joined = within.join(broadcast(offsets), part :+ "__rp_pid")
    val lifted0 = rank.foldLeft(joined)((f, n) =>
      f.withColumn(n, col(n) + col("__rp_roff")))
    val lifted = rIn.foldLeft(lifted0) { case (f, (n, tmp)) =>
      f.withColumn(n, col(n) + col(s"${tmp}_off"))
    }
    val dropCols = Seq("__rp_pid", "__rp_roff") ++
      rIn.flatMap { case (_, tmp) => Seq(tmp, s"${tmp}_off") } ++
      tIn.map { case (_, tmp) => tmp }
    lifted.drop(dropCols: _*)
  }

  /** Exact integer division (SQL `div`) on Columns — `Column./` is
    * DOUBLE division and this file's consumers are rank arithmetic where
    * a near-integer float quotient flooring wrong would silently shift a
    * tile boundary.
    */
  private def idiv(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** `ntile(buckets)` from a global 1-based rank and the group size —
    * the integer-exact first-buckets-take-the-remainder rule both Spark
    * and DuckDB implement (q = n div b, rem = n mod b: the first `rem`
    * buckets hold q+1 rows). Lets ntile ride the two-phase rank instead
    * of a single-task window. When q = 0 (n < buckets) every row falls
    * in the first branch (cut = n), so the `otherwise` division by q is
    * never evaluated on any row.
    */
  def ntileFromRank(r: Column, n: Column, buckets: Int): Column = {
    val b = lit(buckets.toLong)
    val q = idiv(n, b) // operands non-negative by construction
    val rem = n.cast("long").mod(b)
    val cut = rem * (q + lit(1L))
    when(r <= cut, idiv(r - lit(1L), q + lit(1L)) + lit(1L))
      .otherwise(rem + idiv(r - cut - lit(1L), q) + lit(1L))
      .cast("int")
  }

  /** Exact equi-depth tiers from a per-VALUE count table (v, n_i) —
    * the shared core of `profile_equidepth_hist` and its streaming
    * maintainer ([[graft.streaming.StreamingEquiDepth]]): one
    * semantics, two drivers, so the batch query and the maintained
    * tier table cannot drift. Bucket assignment is the engine rule
    * `(exclusive-prefix · buckets) div n` — whole value-groups land in
    * one bucket, identical rows can never straddle a boundary.
    */
  def equiDepthTiers(s: SparkSession, d: String, cacheKey: String,
                     counts: DataFrame, buckets: Int,
                     cached: Boolean = true): DataFrame =
    apply(s, d, cacheKey, counts,
        part = Nil, order = Seq(col("v")),
        rank = None,
        running = Seq(("cum_incl", col("n_i"))),
        totals = Seq(("n", col("n_i"))),
        cached = cached)
      .withColumn("bucket", expr(s"(cum_incl - n_i) * $buckets div n"))
      .groupBy("bucket")
      .agg(min("v").as("lo_cents"), max("v").as("hi_cents"),
        sum("n_i").as("n_rows"), count(lit(1)).as("ndv"))

  /** One-column convenience: append `out` = ntile(buckets) over
    * (part, order) computed two-phase. Internal rank/total columns are
    * dropped; `df`'s own columns pass through untouched.
    */
  def withNtile(
      s: SparkSession,
      d: String,
      cacheKey: String,
      df: DataFrame,
      part: Seq[String],
      order: Seq[Column],
      buckets: Int,
      out: String): DataFrame = {
    val ranked = apply(s, d, cacheKey, df, part, order,
      rank = Some("__rp_rank"), totals = Seq(("__rp_n", lit(1L))))
    ranked
      .withColumn(out, ntileFromRank(col("__rp_rank"), col("__rp_n"), buckets))
      .drop("__rp_rank", "__rp_n")
  }
}
