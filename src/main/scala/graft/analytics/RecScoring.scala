package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The item-kNN model stages factored out of the query layer (r16) so
  * the BATCH pipeline (rec_item_knn / rec_coverage / rec_hitrate /
  * rec_novelty via recTop3Pipeline) and the STREAMING serving face
  * ([[graft.streaming.RecServing]]) run literally the same code —
  * the one-implementation discipline the r15 rec_hitrate retrain
  * established, extended to serving.
  *
  * Reference anchor: the reference forwards opaque CDC items (190
  * Python lines); the recommender family exists for the north-star
  * analytics surface.
  */
object RecScoring {

  /** The frozen MODEL artifact: per item its bounded top-8 cosine²-ppm
    * neighbors (p, nbr, sc) off the (u<v, shared-order count) pair
    * frame `pr` and the item popularity from `li`. One hash-agg per
    * stage; the index is catalog-sized (≤ 8 rows per item).
    */
  def neighborIndex(li: DataFrame, pr: DataFrame): DataFrame = {
    val pop = li.groupBy(col("l_partkey").as("p"))
      .agg(count(lit(1)).as("np"))
    val sym = pr.select(col("u"), col("v"), col("w"))
      .unionAll(pr.select(col("v").as("u"), col("u").as("v"), col("w")))
    val scored = sym
      .join(pop.select(col("p").as("u"), col("np").as("nu")), "u")
      .join(pop.select(col("p").as("v"), col("np").as("nv")), "v")
      .select(col("u").as("p"), col("v").as("nbr"),
        expr("""cast(cast(w as decimal(38,0)) * w * 1000000
                div (cast(nu as decimal(38,0)) * nv) as bigint)""").as("sc"))
    val top8 = udaf(new graft.functions.TopKScoredAgg(8),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    scored.groupBy("p")
      .agg(top8(col("sc").cast("double"), col("nbr")).as("top"))
      .select(col("p"), explode(col("top")).as("t"))
      .select(col("p"), col("t._2").as("nbr"),
        col("t._1").cast("long").as("sc"))
  }

  /** Per-user bounded top-3 from a frozen neighbor index + owned sets:
    * owned ⋈ index, already-owned anti-join, per-(uid, cand) score sum,
    * bounded top-3. Returns (uid, rank ∈ 1..3, cand, score).
    */
  def top3(owned: DataFrame, nbrs: DataFrame): DataFrame = {
    val top3 = udaf(new graft.functions.TopKScoredAgg(3),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    owned.join(nbrs, "p")
      .join(owned.select(col("uid"), col("p").as("nbr")),
        Seq("uid", "nbr"), "left_anti")
      .groupBy("uid", "nbr")
      .agg(sum("sc").as("score"))
      .groupBy("uid")
      .agg(top3(col("score").cast("double"), col("nbr")).as("top"))
      .select(col("uid"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("uid"), (col("pos") + 1).as("rank"),
        col("t._2").as("cand"), col("t._1").cast("long").as("score"))
  }
}
