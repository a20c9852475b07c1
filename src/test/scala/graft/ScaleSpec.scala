package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Scale-mechanics specs: the shuffle-elimination and skew-handling
  * behaviors the 100 TB posture leans on, demonstrated (and pinned) at
  * test size.
  *
  *  - Bucketing: two tables bucketed by the join key join WITHOUT any
  *    Exchange — the co-located-join layout a production deployment uses
  *    for its biggest recurring fact-fact joins.
  *  - AQE skew split: a pathologically skewed join is split at runtime by
  *    AQE rather than serializing one giant task (the complement to the
  *    explicit Salting operator, which covers AQE's planning-blind spots
  *    such as streaming micro-batches).
  */
class ScaleSpec extends SparkSpec {

  test("bucketed tables join with zero exchanges (co-located join)") {
    // external-table paths: bucket layout lives in temp dirs, not the
    // session warehouse (a static conf we cannot retarget at runtime)
    val wh = Files.createTempDirectory("graft-wh").toFile.getAbsolutePath
    val sf = "/root/testdata/sf0.001"
    try {
      Tables.orders(spark, sf).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.lineitem(spark, sf).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b")
        .mode("overwrite").saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      // disable broadcast so the join would OTHERWISE shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val qe = joined.queryExecution
      qe.toRdd.count()
      val plan = qe.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // the only exchange allowed is the post-join groupBy; neither join
      // input may shuffle — the bucket layout already co-locates the keys
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle its inputs, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("hive-style partitioned layout prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toFile.getAbsolutePath
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"))
    val scan = q.queryExecution.executedPlan.toString
    // the event_type predicate must be a PartitionFilter (directory
    // pruning — at 100 TB this is the difference between reading one
    // partition and reading the table), not a post-scan Filter
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition pruning in:\n$scan")
    val expected = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "purchase").count()
    assert(q.collect()(0).getLong(0) == expected)
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // at 100 TB this is semi-join pushdown without a broadcast: the
    // selective side's keys become a bloom filter applied inside the fact
    // scan, cutting shuffle input before the join. Thresholds lowered so
    // the optimization fires at test size.
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = "/root/testdata/sf0.001"
      val li = Tables.lineitem(spark, d)
      val ord = Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT")
      val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val qe = q.queryExecution
      qe.toRdd.count()
      assert(qe.executedPlan.toString.contains("bloom_filter_agg"),
        "expected an injected runtime bloom filter on the join key")
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    // 50k rows on ONE hot key vs 5k spread keys; small thresholds so the
    // hot partition counts as skewed at test size
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = spark.range(55000)
        .select(when(col("id") < 50000, lit(7L)).otherwise(col("id") % 10000).as("k"),
          col("id").as("payload"))
      val right = spark.range(10000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = big.join(right, "k")
      // execute THIS queryExecution so AQE finalizes the inspected plan
      val qe = joined.queryExecution
      assert(qe.toRdd.count() == 55000)
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join marker in final plan:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("profiled salting: the measured skew profile flips the join decision") {
    import spark.implicits._
    import graft.ops.Salting
    // UNIFORM keys: hottest key ~ fair share → the decision is a plain
    // join (no salt column, no small-side replication paid)
    val uniform = spark.range(32000)
      .select((col("id") % 1000).as("k"), col("id").as("payload"))
    val pu = Salting.profileKeys(uniform, Seq("k"))
    assert(pu === Salting.SkewProfile(1000L, 32000L, 32L))
    assert(Salting.decideSaltFactor(pu, parallelism = 32) === None)

    // ONE hot key carrying ~91% of rows → the profile demands a salt
    // factor, sized to split the hot key into ~fair-share buckets
    val skewed = spark.range(33000)
      .select(when(col("id") < 30000, lit(7L)).otherwise(col("id") % 1000).as("k"),
        col("id").as("payload"))
    val ps = Salting.profileKeys(skewed, Seq("k"))
    assert(ps.maxPerKey >= 30000L)
    val factor = Salting.decideSaltFactor(ps, parallelism = 32)
    assert(factor.isDefined && factor.get > 1,
      s"hot-key profile did not trigger salting: $ps -> $factor")

    // the composed profiledJoin returns exactly the plain join's rows in
    // BOTH regimes (the decision changes the plan, never the answer)
    val small = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("v"))
    for (big <- Seq(uniform, skewed)) {
      val plain = big.join(small, "k").agg(count(lit(1)), sum("v"), sum("payload"))
        .collect()(0)
      val profiled = Salting.profiledJoin(big, small, Seq("k"),
        parallelism = 32, spreadCols = Seq(col("payload")))
        .agg(count(lit(1)), sum("v"), sum("payload")).collect()(0)
      assert(plain === profiled)
    }

    // decision arithmetic at the boundaries: empty frame and
    // all-one-key both behave (no div-by-zero, capped factor)
    assert(Salting.decideSaltFactor(Salting.SkewProfile(0, 0, 0), 32) === None)
    // one key owns everything: factor = parallelism (split to fair shares)...
    assert(Salting.decideSaltFactor(
      Salting.SkewProfile(1, 1000000, 1000000), 32) === Some(32))
    // ...and the replication cap binds once parallelism outruns it
    assert(Salting.decideSaltFactor(
      Salting.SkewProfile(1, 1000000, 1000000), 1000, maxFactor = 64) === Some(64))
  }

  test("LSH parameters derive from corpus size, and the registered queries consume them") {
    import graft.analytics.Corpus
    // width grows with n (constant mean occupancy), integer-exact at
    // the power-of-two boundaries where a float log2 disagrees by engine
    assert(Corpus.signBucketBits(0) === 4)
    assert(Corpus.signBucketBits(1024) === 4)
    assert(Corpus.signBucketBits(1025) === 5)
    assert(Corpus.signBucketBits(100000) === 11)
    assert(Corpus.signBucketBits(1L << 40) === 24)
    // banding trades recall for bounded false positives as n² grows
    assert(Corpus.minhashBandPlan(100000) === ((4, 3)))
    assert(Corpus.minhashBandPlan(1000000) === ((3, 4)))
    assert(Corpus.minhashBandPlan(100000000) === ((2, 6)))
    // the REGISTERED query's plan carries the derived width: at the test
    // corpus (500 vectors + variants) that is 4 bits = 16 buckets; the
    // sf0.1 corpus (2000 + variants = 2286) derives 6. Both go through
    // the same call the query makes.
    val sfDir = "/root/testdata/sf0.001"
    val n = Corpus.vecsWithNearDupsCount(spark, sfDir)
    assert(Corpus.signBucketBits(n) === 4)
    assert(Corpus.signBucketBits(2286) === 6)
    // and the derived-width bucket column really widens: 6 bits spans
    // buckets >= 16, which the 4-bit expression can never produce
    import org.apache.spark.sql.functions._
    val vecs = Corpus.vecsWithNearDups(spark, sfDir)
    val wide = vecs.select(Corpus.signBucketColBits(6).as("b"))
      .agg(max("b")).head().getLong(0)
    val narrow = vecs.select(Corpus.signBucketColBits(4).as("b"))
      .agg(max("b")).head().getLong(0)
    assert(narrow <= 15 && wide >= 16, s"narrow=$narrow wide=$wide")
  }
}
