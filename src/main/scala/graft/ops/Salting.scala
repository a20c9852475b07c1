package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skew-heavy joins (SURVEY §4 / the 100 TB posture).
  *
  * AQE's skew-join split handles most runtime skew, but a join whose hot
  * key is orders of magnitude above the rest still serializes on one
  * task at planning-blind moments (e.g. inside a streaming micro-batch,
  * where AQE is off). Salting spreads the hot side explicitly:
  * the SKEWED (big) side gets a uniform salt in [0, n); the SMALL side is
  * replicated n times, one copy per salt value; the join adds the salt to
  * the equi-keys, splitting each hot key across n tasks.
  *
  * The salt is `pmod(hash(rand-free columns...), n)` — derived from the
  * row's own key columns plus a uniform spread column when provided, so
  * the transform stays deterministic (no rand(): retries/replays keep
  * the same placement, which exactly-once sinks need).
  */
object Salting {

  /** Add a salt column to the skewed side. `spreadCols` should be
    * columns that vary within a hot key (e.g. the event id); with none
    * given, monotonically_increasing_id() spreads rows round-robin
    * within each partition (deterministic per task layout).
    */
  def saltSkewed(df: DataFrame, n: Int, spreadCols: Seq[Column] = Nil): DataFrame = {
    val spread =
      if (spreadCols.nonEmpty) hash(spreadCols: _*)
      else spark_partition_id() * lit(1000003) + monotonically_increasing_id()
    df.withColumn("__salt", pmod(spread, lit(n)).cast("int"))
  }

  /** Replicate the small side once per salt value. */
  def replicateSmall(df: DataFrame, n: Int): DataFrame =
    df.withColumn("__salt", explode(expr(s"sequence(0, ${n - 1})")))

  /** Join types for which the small-side replication is row-equivalent
    * to the unsalted join: every small-side row that REACHES the output
    * does so by matching a (unique) salted big-side row. Right/full
    * outer joins are excluded — they emit unmatched small-side rows,
    * which replication would duplicate n times.
    */
  private val EquivalentJoinTypes = Set(
    "inner", "cross", "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti")

  /** Salted equi-join: equivalent rows to `big.join(small, keys)` but the
    * shuffle splits every key across `n` buckets. `joinType` is restricted
    * to inner/left variants (see [[EquivalentJoinTypes]]).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String], n: Int,
                 spreadCols: Seq[Column] = Nil, joinType: String = "inner"): DataFrame = {
    require(EquivalentJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin does not preserve '$joinType' semantics: unmatched small-side " +
        "rows would appear once per salt replica; use inner/left/semi/anti variants")
    saltSkewed(big, n, spreadCols)
      .join(replicateSmall(small, n), keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Key-skew summary of one join side — the `profile_key_skew` query's
    * fields as a value the salting decision consumes (r6: the profile
    * query and the operator existed; this is the wire between them).
    */
  final case class SkewProfile(nKeys: Long, nRows: Long, maxPerKey: Long)

  /** Measure a [[SkewProfile]] over the join keys — ONE hash-agg with
    * map-side partials over the frame, then a key-cardinality-sized
    * summary (the profile_key_skew shape, without the ranking fields the
    * decision doesn't need). Runs as its own (small) job; amortize it by
    * profiling once per recurring pipeline, not per run.
    */
  def profileKeys(df: DataFrame, keys: Seq[String]): SkewProfile = {
    val r = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("nk"), sum(col("n")).as("total"), max(col("n")).as("mx"))
      .collect()(0)
    if (r.isNullAt(1)) SkewProfile(0L, 0L, 0L)
    else SkewProfile(r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** The salting DECISION: from a measured profile, either None (plain
    * join — AQE and ordinary hashing are enough) or Some(n), the salt
    * factor to split the hottest key to roughly its fair task share.
    *
    * Rule: under uniform hashing a task's fair share is
    * nRows/parallelism; a hot key only matters once it exceeds
    * `tolerance` fair shares (below that, AQE's runtime skew split and
    * ordinary scheduling absorb it — over-salting costs n× small-side
    * replication for nothing). Above it, n = ceil(maxPerKey/fairShare)
    * splits the hot key into fair-share-sized buckets, capped at
    * `maxFactor` (past that the small-side replication dominates).
    * Pure integer arithmetic — deterministic for a given profile.
    */
  def decideSaltFactor(profile: SkewProfile, parallelism: Int,
                       tolerance: Long = 4L, maxFactor: Int = 64): Option[Int] = {
    require(parallelism >= 1 && tolerance >= 1 && maxFactor >= 2)
    val fairShare = math.max(1L, profile.nRows / parallelism)
    if (profile.maxPerKey <= fairShare * tolerance) None
    else Some(math.min(maxFactor.toLong,
      (profile.maxPerKey + fairShare - 1L) / fairShare).toInt)
  }

  /** Profile-driven join: measures the big side's key skew, then either
    * plain-joins (no skew worth paying replication for) or salted-joins
    * at the decided factor. The composition of [[profileKeys]] →
    * [[decideSaltFactor]] → [[saltedJoin]]; ScaleSpec pins a case where
    * the profile flips the decision.
    */
  def profiledJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                   parallelism: Int, spreadCols: Seq[Column] = Nil,
                   joinType: String = "inner",
                   tolerance: Long = 4L, maxFactor: Int = 64): DataFrame =
    decideSaltFactor(profileKeys(big, keys), parallelism, tolerance, maxFactor) match {
      case Some(n) => saltedJoin(big, small, keys, n, spreadCols, joinType)
      case None    => big.join(small, keys, joinType)
    }
}
