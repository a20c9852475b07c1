package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-level join co-location (SURVEY §4): for a BIG×BIG equi-join
  * neither side can broadcast, and at 100 TB the two full-table shuffle
  * exchanges ARE the query cost. Pre-bucketing both tables on the join
  * key at write time moves that cost to ingest: every later join on the
  * key plans with ZERO exchanges (bucketed scan → sort-merge join over
  * co-located buckets). This spec proves the whole contract on real
  * tables: bucketed writes, exchange-free join plan, result equality
  * with the plain-table join, and the one-sided degradation mode.
  */
class BucketedJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // saveAsTable lands in the session's default warehouse (spark-warehouse/,
  // gitignored); table names are spec-unique and overwritten per run
  private lazy val tables: Unit = {
    // self-healing: a prior crashed run can leave the location on disk
    // after the metastore entry is gone — drop both before writing
    Seq("b_lineitem", "b_orders", "p_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.orders(spark, sf).write.mode("overwrite").saveAsTable("p_orders")
  }

  /** sf0.001 tables are broadcast-small, which would hide the shape under
    * test — a BIG×BIG join where neither side broadcasts. Disabling the
    * auto-broadcast threshold reproduces the 100 TB planning problem on
    * the small fixture.
    */
  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed big-big join plans with ZERO exchanges and matches the plain join") {
    tables
    withNoBroadcast {
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"))
    val p = joined.queryExecution.executedPlan.toString
    // the join itself is exchange-free: both sides read pre-bucketed,
    // co-located files (the only exchange allowed is the final small
    // aggregation by o_orderstatus — 3 groups)
    val joinSection = p.substring(0, p.length)
    val exchanges = "Exchange".r.findAllIn(joinSection).length
    assert(p.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$p")
    assert(exchanges <= 1, s"bucketed join must not shuffle either table ($exchanges exchanges):\n$p")
    assert(p.contains("Bucketed: true"), s"scan did not use bucketing:\n$p")

    // result equality with the plain-table formulation
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"))
    assert(joined.collect().map(_.toSeq).toSet === plain.collect().map(_.toSeq).toSet)
    }
  }

  test("one-sided bucketing degrades to shuffling ONLY the unbucketed side") {
    tables
    withNoBroadcast {
    val joined = spark.table("b_lineitem")
      .join(spark.table("p_orders"), col("l_orderkey") === col("o_orderkey"))
      .select(count(lit(1)).as("n"))
    val p = joined.queryExecution.executedPlan.toString
    // the bucketed side must still be read bucketed (no exchange on it);
    // exactly one exchange total: the plain side aligning to the buckets
    assert(p.contains("Bucketed: true"), s"bucketed side lost its layout:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1,
      s"expected exactly one exchange (the unbucketed side), got $exchanges:\n$p")
    }
  }
}
