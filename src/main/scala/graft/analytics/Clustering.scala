package graft.analytics

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over the quantized embedding vectors — the clustering
  * primitive a curation pipeline uses for semantic grouping / cluster-
  * balanced sampling (and the trained-centroid upgrade path for the IVF
  * index in `ann_ivf`, whose coarse quantizer is a fixed subset today).
  *
  * Spark shape, per iteration:
  *  - ASSIGN: the k centroids (small by definition) are embedded as a
  *    LITERAL array column and the argmin runs per row inside one
  *    projection — no join, no window, genuinely zero shuffles of the
  *    corpus. Tie-break is the lower cluster id (struct min on
  *    (dist2, cid)).
  *  - UPDATE: posexplode to (cluster, dim, value) → two-level hash agg →
  *    re-assembled centroid arrays. Shuffles only k×dims aggregates, not
  *    vectors. A cluster that captured zero points keeps its previous
  *    centroid (it does NOT silently vanish), so the model always has
  *    exactly k centroids.
  *  - Only the k centroid rows ever reach the driver (for the next
  *    iteration's literals) — the corpus stays distributed.
  *
  * Determinism: init is the first k vec_ids (not a random sample), the
  * argmin tie-break is the lower cluster id, and iteration count is
  * fixed — rerunning reproduces the same assignment (floating averages
  * are reduced in a fixed tree only within partitions, so centroid
  * doubles can vary in the last ulp across partitionings; the spec
  * therefore asserts distortion MONOTONICITY and assignment determinism,
  * not float equality — the reason this operator has no DuckDB oracle
  * entry).
  */
object Clustering {

  /** Nearest-centroid assignment: returns (vec_id, qv, best) where
    * `best` is a (dist2, cid) struct. Centroids ride as one literal
    * array of (cv, cid) structs; the per-row argmin is `array_min` over
    * (dist2, cid) structs — struct ordering is field-by-field, giving
    * the lower-cid tie-break. The argmin stays ONE unexpanded column:
    * extracting cid and dist2 here would make CollapseProject inline
    * the whole k×dims scan once per extracted field (this repo's
    * measured HOF-blowup failure mode); consumers extract fields AFTER
    * the frame is materialized/cached.
    */
  def assign(vecs: DataFrame, centroids: Array[(Int, Array[Double])]): DataFrame = {
    val centArr = array(centroids.map { case (cid, cv) =>
      struct(
        array(cv.map(lit(_)): _*).as("cv"),
        lit(cid).as("cid"))
    }: _*)
    vecs.select(col("vec_id"), col("qv"),
      array_min(transform(centArr, c =>
        struct(
          aggregate(
            zip_with(col("qv"), c.getField("cv"),
              (x, v) => (x.cast("double") - v) * (x.cast("double") - v)),
            lit(0d), (a, b) => a + b).as("dist2"),
          c.getField("cid").as("cid")))).as("best"))
  }

  /** One update step: per-cluster elementwise mean, computed distributed
    * (posexplode → hash agg → reassemble), collected as (cid → mean).
    * Empty clusters are absent from the result — the caller keeps their
    * previous centroid.
    */
  def updateCentroids(assigned: DataFrame): Map[Int, Array[Double]] =
    assigned
      .select(col("best.cid").as("cid"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy("cid", "dim").agg(avg(col("v")).as("m"))
      .groupBy("cid")
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").as("cv"))
      .collect()
      .map { r: Row => (r.getInt(0), r.getSeq[Double](1).toArray) }
      .toMap

  /** Fixed-iteration Lloyd. Returns (assignments, centroids, distortion
    * per iteration — total squared distance, the objective Lloyd
    * monotonically non-increases). Requires the corpus to have at least
    * k vectors.
    */
  def kmeans(s: SparkSession, vecs: DataFrame, k: Int, iters: Int)
      : (DataFrame, Array[(Int, Array[Double])], Seq[Double]) = {
    require(iters >= 1, s"kmeans needs at least one iteration, got $iters")
    val base = vecs.select("vec_id", "qv").persist()
    val init = base.orderBy("vec_id").limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](1).map(_.toDouble).toArray) }
    require(init.length == k,
      s"kmeans needs at least $k vectors, corpus has ${init.length}")
    var centroids = init
    val distortions = Seq.newBuilder[Double]
    var assigned: DataFrame = null
    var prevAssigned: DataFrame = null
    for (_ <- 1 to iters) {
      // persist: each iteration's assignment feeds BOTH the distortion
      // aggregate and the centroid update — one argmin pass, not two
      assigned = assign(base, centroids).persist()
      distortions += assigned.agg(sum(col("best.dist2"))).collect()(0).getDouble(0)
      val updated = updateCentroids(assigned)
      // an empty cluster keeps its previous centroid: k stays k
      centroids = centroids.map { case (cid, prev) =>
        (cid, updated.getOrElse(cid, prev))
      }
      if (prevAssigned != null) prevAssigned.unpersist()
      prevAssigned = assigned
    }
    base.unpersist()
    // the returned (still-cached) frame carries the final assignment;
    // callers unpersist when done
    (assigned, centroids, distortions.result())
  }
}
