package graft.dev
import org.apache.spark.sql.functions._
import graft._
import graft.analytics._

object Probe {
  def time[A](label: String)(a: => A): A = {
    val t0 = System.nanoTime(); val r = a
    println(s"PROBE $label: ${(System.nanoTime() - t0) / 1e9}s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe")
    val d = "/root/testdata/sf0.1"
    val grams = Corpus.docsWithNearDups(spark, d).withColumn("tl", expr(
      """transform(sequence(1, size(split(text, ' ')) - 1),
           i -> array_join(slice(split(text, ' '), i, 2), ' '))"""))
    val th = grams.withColumn("th", expr(
      "transform(tl, t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))"))
    time("tl only")(grams.select(expr("sum(size(tl))")).collect())
    time("th")(th.select(expr("sum(size(th))")).collect())
    val sig = th.withColumn("sig", expr(
      """aggregate(
           transform(sequence(0, 31),
             j -> case when aggregate(th, 0L,
                    (acc, h) -> acc + (case when (shiftright(h, j) & 1) = 1 then 1 else -1 end)) > 0
                  then shiftleft(1L, j) else 0L end),
           0L, (acc, v) -> acc + v)""")).select("doc_id", "sig")
    time("sig")(sig.select(expr("sum(sig)")).collect())
    time("sig2")(sig.select(expr("sum(sig)")).collect())
    println("OPTIMIZED PLAN (truncated):")
    println(sig.queryExecution.optimizedPlan.treeString.split("\n").take(12).mkString("\n").take(2500))
    spark.stop()
  }
}
