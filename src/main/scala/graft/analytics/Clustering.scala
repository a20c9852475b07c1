package graft.analytics

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd's k-means over the quantized embedding vectors — the clustering
  * primitive a curation pipeline uses for semantic grouping / cluster-
  * balanced sampling (and the trained-centroid upgrade path for the IVF
  * index in `ann_ivf`, whose coarse quantizer is a fixed subset today).
  *
  * Spark shape, per iteration:
  *  - ASSIGN: centroids (k rows — small by definition) broadcast against
  *    the corpus; nearest centroid by squared L2 via a window argmin.
  *    One pass over the data, no shuffle of the corpus.
  *  - UPDATE: posexplode to (cluster, dim, value) → two-level hash agg →
  *    re-assembled centroid arrays. Shuffles only k×dims aggregates, not
  *    vectors.
  *  - Only the k centroid rows ever reach the driver (for the next
  *    broadcast) — the corpus stays distributed.
  *
  * Determinism: init is the first k vec_ids (not a random sample), the
  * argmin tie-break is the lower cluster id, and iteration count is
  * fixed — rerunning reproduces the same model bit for bit (floating
  * averages are reduced in a fixed tree only within partitions, so
  * centroid doubles can vary in the last ulp across partitionings; the
  * spec therefore asserts distortion MONOTONICITY and assignment
  * determinism, not float equality — the reason this operator has no
  * DuckDB oracle entry).
  */
object Clustering {

  /** (cluster id, centroid vector) pairs as a broadcastable frame. */
  private def centroidFrame(s: SparkSession, cs: Array[(Int, Array[Double])]): DataFrame = {
    import s.implicits._
    cs.map { case (cid, cv) => (cid, cv.toSeq) }.toSeq.toDF("cid", "cv")
  }

  /** Nearest-centroid assignment: returns (vec_id, qv, cid, dist2). */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("dist2"), col("cid"))
    vecs.crossJoin(broadcast(centroids))
      .withColumn("dist2", expr(
        "aggregate(zip_with(qv, cv, (x, c) -> (x - c) * (x - c)), 0D, (a, v) -> a + v)"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("qv"), col("cid"), col("dist2"))
  }

  /** One update step: per-cluster elementwise mean, computed distributed
    * (posexplode → hash agg → reassemble), collected as the k new
    * centroids.
    */
  def updateCentroids(assigned: DataFrame): Array[(Int, Array[Double])] =
    assigned
      .select(col("cid"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy("cid", "dim").agg(avg(col("v")).as("m"))
      .groupBy("cid")
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").as("cv"))
      .collect()
      .map { r: Row => (r.getInt(0), r.getSeq[Double](1).toArray) }
      .sortBy(_._1)

  /** Fixed-iteration Lloyd. Returns (assignments, centroids, distortion
    * per iteration — total squared distance, the objective Lloyd
    * monotonically non-increases).
    */
  def kmeans(s: SparkSession, vecs: DataFrame, k: Int, iters: Int)
      : (DataFrame, Array[(Int, Array[Double])], Seq[Double]) = {
    val base = vecs.select("vec_id", "qv").persist()
    val init = base.orderBy("vec_id").limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](1).map(_.toDouble).toArray) }
    var centroids = init
    val distortions = Seq.newBuilder[Double]
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = assign(base, centroidFrame(s, centroids))
      distortions += assigned.agg(sum(col("dist2"))).collect()(0).getDouble(0)
      centroids = updateCentroids(assigned)
    }
    base.unpersist()
    (assigned, centroids, distortions.result())
  }
}
