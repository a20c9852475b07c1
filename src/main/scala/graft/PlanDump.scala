package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to files — the
  * before/after plan evidence for optimization rounds.
  *
  * Run: sbt "runMain graft.PlanDump <outDir> <suffix> name1,name2,..."
  * Writes <outDir>/<name>_<suffix>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.local("graft-plan-dump")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"unknown query: $name")
        case Some(fn) =>
          val qe = fn(spark, sfDir).queryExecution
          qe.toRdd.count() // let AQE finalize so the dump shows the real shape
          val txt = qe.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
          println(s"wrote $outDir/${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
