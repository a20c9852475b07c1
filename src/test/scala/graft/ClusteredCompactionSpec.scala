package graft

import java.nio.file.Files

import graft.streaming.SnapshotStore

/** Clustered (Z-order) compaction for the store (r16, VERDICT r15 #2):
  * [[SnapshotStore.compactTargetClustered]] sorts each bucket's
  * resolved rows by the cluster columns' Z-order and splits the bucket
  * into z-contiguous slice SEGMENTS, so the r13 per-segment zone maps
  * start excluding WITHIN buckets — the Delta OPTIMIZE ZORDER effect,
  * pinned here on the V2 source's own segment counters, with
  * LWW/read exactness held against the pre-clustering state.
  */
class ClusteredCompactionSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toFile.getAbsolutePath

  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan) = p.collect {
    case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        if b.scan.isInstanceOf[graft.sources.SnapshotScan] =>
      b.scan.asInstanceOf[graft.sources.SnapshotScan]
  }

  test("value predicate skips intra-bucket slice segments after clustering; reads stay exact") {
    // a suite-unique catalog NAME: Spark caches v2 catalog instances
    // per session by name, so reusing "graft" after another suite has
    // instantiated it would silently keep THAT suite's root
    val root = tmp("zc-catroot")
    spark.conf.set("spark.sql.catalog.graftzc", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.graftzc.root", root)
    val dir = s"$root/zc/t"
    spark.sql("CREATE TABLE graftzc.zc.t (keys STRING, op STRING, " +
      "sequenceNumber STRING, newImage STRING) USING `graft-snapshot`")
    spark.sql("ALTER TABLE graftzc.zc.t ADD COLUMNS (v BIGINT)")

    def ins(rows: Seq[(String, Long, Int)]): Unit =
      spark.sql("INSERT INTO graftzc.zc.t VALUES " + rows.map {
        case (k, v, seq) => f"""('$k', 'PUT', '$seq%06d', '{"v":$v}', NULL)"""
      }.mkString(", "))
    // two arrival-ordered batches spanning the full value range each —
    // the shape where arrival order carries no value locality
    ins((0 until 200).map(i => (f"k$i%03d", i.toLong, i + 1)))
    ins((200 until 400).map(i => (f"k$i%03d", i.toLong, i + 1)))
    // LWW traps: k105 leaves the query box under a NEWER sequence,
    // k300 enters it — clustering must place each key by its RESOLVED
    // value and never resurrect the superseded row
    ins(Seq(("k105", 999L, 1001), ("k300", 110L, 1002)))

    val expected = ((100 until 120).filter(_ != 105)
      .map(i => f"k$i%03d" -> i.toLong) :+ ("k300" -> 110L)).toMap

    def query() = {
      val q = spark.sql("SELECT keys, v FROM graftzc.zc.t WHERE v BETWEEN 100 AND 119")
      val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val scan = scansOf(q.queryExecution.executedPlan).head
      (got, scan.lastPlannedSegments, scan.lastImageSegments)
    }

    // baseline: a PLAIN compaction — one arrival-ordered segment per
    // bucket whose stats span the whole value range: nothing to skip
    SnapshotStore.compactTarget(spark, dir)
    val stateBefore = SnapshotStore.readTarget(spark, dir)
      .select("keys", "newImage").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val (gotPlain, plannedPlain, imagePlain) = query()
    assert(gotPlain === expected)
    val skippedPlain = plannedPlain - imagePlain

    // clustered compaction: 8 z-slices per bucket on v
    SnapshotStore.compactTargetClustered(spark, dir, Seq("v"),
      slicesPerBucket = 8)

    // reads are oracle-neutral: identical resolved state, identical
    // query result
    val stateAfter = SnapshotStore.readTarget(spark, dir)
      .select("keys", "newImage").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(stateAfter === stateBefore,
      "clustered compaction changed the resolved state")
    val (gotClustered, plannedClustered, imageClustered) = query()
    assert(gotClustered === expected,
      "clustered scan result diverged (stale LWW resurrection?)")

    // the point of the feature: the skipped-segment count RISES —
    // slices whose zone maps exclude the value box are image-skipped
    val skippedClustered = plannedClustered - imageClustered
    assert(plannedClustered > plannedPlain,
      s"clustering did not split buckets into slices: " +
        s"$plannedClustered vs $plannedPlain segments")
    assert(skippedClustered > skippedPlain,
      s"no intra-bucket skipping gained: $skippedClustered skipped of " +
        s"$plannedClustered (plain: $skippedPlain of $plannedPlain)")
    // and not marginally: a 20-wide box over a 0..999 range should
    // exclude the large majority of z-slices
    assert(skippedClustered * 2 > plannedClustered,
      s"clustering skipped under half the segments: " +
        s"$skippedClustered of $plannedClustered")

    // a later delta still merges and resolves against clustered slices
    ins(Seq(("k101", 7L, 2001)))
    val afterDelta = spark
      .sql("SELECT keys, v FROM graftzc.zc.t WHERE v BETWEEN 100 AND 119")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterDelta === expected - "k101",
      "post-clustering delta did not supersede its clustered row")
  }

  test("cluster columns must be declared projected numeric columns") {
    val dir = tmp("zc-validate")
    val spark2 = spark
    import spark2.implicits._
    SnapshotStore.mergeIntoTarget(spark, dir,
      Seq(("k1", "PUT", "001", """{"v":1}"""))
        .toDF("keys", "op", "sequenceNumber", "newImage"), batchId = 1L)
    intercept[IllegalArgumentException] {
      SnapshotStore.compactTargetClustered(spark, dir, Seq("v"))
    }
  }
}
