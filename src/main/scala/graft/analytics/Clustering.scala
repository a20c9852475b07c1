package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

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

  /** Nearest-centroid assignment under EXACT INTEGER squared-Euclidean
    * distance: dist² = nn − 2·dot(qv,cv) + cnn, every term a Long (the
    * dot through the codegen'd [[VectorFunctions.vecDotLong]]) — no
    * floating point anywhere, so the argmin is trivially bit-identical
    * in any engine. Same literal-centroid zero-shuffle shape as
    * [[assign]]; ties break to the lower cid via the (dist2, cid)
    * struct min. Input needs (vec_id, qv, nn); output adds a
    * (dist2, cid) `best` struct.
    */
  def assignL2(vecs: DataFrame, cents: Seq[(Int, Array[Long], Long)]): DataFrame = {
    require(cents.nonEmpty, "assignL2 needs at least one centroid")
    val centArr = array(cents.map { case (cid, cv, cnn) =>
      struct(
        array(cv.map(lit(_)): _*).as("cv"),
        lit(cid).as("cid"),
        lit(cnn).as("cnn"))
    }: _*)
    vecs.select(col("vec_id"), col("qv"), col("nn"),
      array_min(transform(centArr, c =>
        struct(
          (col("nn") - lit(2L) * VectorFunctions.vecDotLong(col("qv"), c.getField("cv"))
            + c.getField("cnn")).as("dist2"),
          c.getField("cid").as("cid")))).as("best"))
  }

  /** Per-cluster floor-quantized mean: the ONE centroid-update rule
    * both integer k-means variants share. Distributed (posexplode →
    * hash agg → reassemble); each per-dim mean is floor(sum / count)
    * where the single double division is exactly-rounded IEEE on
    * < 2^53 integers and floor makes it integral again — so the update
    * is bit-identical in any engine. Empty clusters are absent (the
    * caller keeps their previous centroid).
    */
  private def floorMeanUpdate(assigned: DataFrame, cid: Column): Map[Int, Array[Long]] =
    assigned
      .select(cid.as("cid"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy("cid", "dim")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .groupBy("cid")
      .agg(expr(
        """transform(
             array_sort(collect_list(named_struct(
               'dim', dim,
               'm', cast(floor(cast(s as double) / cast(c as double)) as bigint)))),
             x -> x.m)""").as("cv"))
      .collect()
      .map { r: Row => (r.getInt(0), r.getSeq[Long](1).toArray) }
      .toMap

  /** Integer-arithmetic Lloyd over the QUANTIZED vectors — the
    * oracle-shareable k-means. Every quantity in the loop is exact:
    * assignment distance is pure Long ([[assignL2]]), and the centroid
    * update is the floor-quantized mean ([[floorMeanUpdate]]) — so
    * DuckDB can replay the identical Lloyd iterations CTE-by-CTE and
    * land on bit-identical centroids (this is the [[kmeans]] float
    * path made verifiable). Init = the first k vec_ids' vectors
    * (deterministic, SQL-replayable); empty clusters keep their
    * previous centroid; fixed iteration count.
    *
    * Spark shape per iteration, as [[kmeans]]: literal-centroid argmin
    * (zero corpus shuffles) + a k×dims aggregate update; only k
    * centroid rows ever reach the driver. Returns the trained
    * (cid, cv, cnn) centroids and the exact Long distortion per
    * iteration.
    */
  def kmeansQuantized(s: SparkSession, vecs: DataFrame, k: Int, iters: Int)
      : (Seq[(Int, Array[Long], Long)], Seq[Long]) = {
    require(iters >= 1, s"kmeansQuantized needs at least one iteration, got $iters")
    var centroids = initCentroids(vecs, k, "kmeansQuantized")
    val distortions = Seq.newBuilder[Long]
    for (_ <- 1 to iters) {
      // one argmin pass feeds both the distortion sum and the update
      val assigned = assignL2(vecs, centroids).persist()
      distortions += assigned.agg(sum(col("best.dist2"))).collect()(0).getLong(0)
      val updated = floorMeanUpdate(assigned, col("best.cid"))
      centroids = carryForward(centroids, updated)
      assigned.unpersist()
    }
    (centroids, distortions.result())
  }

  /** Spherical integer k-means: assignment by max signed-cos² — the
    * SAME score the ANN search stage ranks by ([[Corpus.scoreSql]],
    * via [[SimilarityQueries.assignToCentroids]]) — update by the
    * floor-quantized mean (the mean's direction is the spherical
    * centroid; cos is scale-invariant so no normalization is needed
    * for the argmax). This is the right trainer for a COSINE IVF
    * index: L2 cells group by magnitude+direction while the search
    * metric only cares about direction — training with the search
    * metric is what makes cells contain actual neighbors (measured:
    * the L2-trained variant lost 6/30 ground-truth hits to cell
    * boundaries at sf0.01; this one ties the fixed-subset quantizer
    * while keeping balanced cells).
    *
    * Every step is oracle-replayable: integer dot/norms, the one
    * exactly-rounded double division per score, floor-mean updates. A
    * degenerate all-zero mean (possible for opposing members) keeps
    * the previous centroid — cnn > 0 stays invariant, so the score's
    * division is always defined; the SQL replay carries the same
    * guard.
    */
  def kmeansSpherical(s: SparkSession, vecs: DataFrame, k: Int, iters: Int)
      : Seq[(Int, Array[Long], Long)] = {
    require(iters >= 1, s"kmeansSpherical needs at least one iteration, got $iters")
    var centroids = initCentroids(vecs, k, "kmeansSpherical")
    for (_ <- 1 to iters) {
      val assigned = SimilarityQueries.assignToCentroids(
        vecs.select("vec_id", "qv", "nn"), centroids)
      centroids = carryForward(centroids, floorMeanUpdate(assigned, col("c_id")))
    }
    centroids
  }

  /** Deterministic init shared by both integer k-means: the first k
    * vec_ids' vectors (SQL-replayable, unlike a random sample).
    */
  private def initCentroids(vecs: DataFrame, k: Int, who: String)
      : Seq[(Int, Array[Long], Long)] = {
    val init = vecs.select("vec_id", "qv", "nn").orderBy("vec_id").limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](1).toArray, r.getLong(2)) }
    require(init.length == k, s"$who needs at least $k vectors, corpus has ${init.length}")
    init.toSeq
  }

  /** Empty clusters and degenerate (all-zero) means keep the previous
    * centroid: k stays k and cnn stays > 0.
    */
  private def carryForward(prev: Seq[(Int, Array[Long], Long)],
                           updated: Map[Int, Array[Long]]): Seq[(Int, Array[Long], Long)] =
    prev.map { case (cid, pcv, pnn) =>
      updated.get(cid) match {
        case Some(cv) =>
          val nn = cv.map(x => x * x).sum
          if (nn == 0) (cid, pcv, pnn) else (cid, cv, nn)
        case None => (cid, pcv, pnn)
      }
    }
}
