package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.queries.QuerySpec

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two paths, as a production vector pipeline would have:
  *  - `ann_brute_topk` — exact baseline: a small probe set (10 query
  *    vectors) broadcast against the full corpus; one pass, no shuffle of
  *    the big side, TakeOrdered-style window top-k per query. Cost is
  *    O(|corpus| × |probes|) — the right plan when probes are few, at any
  *    corpus size.
  *  - `ann_lsh_bucket` — the scale path: corpus pre-bucketed by
  *    sign-LSH (axis hyperplanes over the quantized components); probes
  *    join only their bucket, cutting the candidate set by the bucket
  *    fan-out (16 here; more bits at larger corpora). Recall is traded for
  *    the prune, as with any LSH.
  *
  * Scores use the exact-integer contract from [[Corpus]] — bit-identical
  * across engines, so top-k with a (score DESC, vec_id) sort is
  * deterministic including ties.
  */
object SimilarityQueries {

  /** Zero-shuffle IVF coarse assignment (V3 via V4's literal-centroid
    * pattern, [[Clustering.assign]]): the k centroids ride as ONE literal
    * array of (cv, cid, cnn) structs and every vector picks its
    * max-score centroid inside a single projection — `array_max` over
    * (score, -cid) structs, so the highest score wins and ties break to
    * the LOWER centroid id, exactly the (score DESC, c_id) order the
    * oracle's window uses. No join, no window, zero shuffles of the
    * corpus; only the k centroid rows ever sit on the driver. The score
    * mirrors [[Corpus.scoreSql]] op-for-op (exact-integer dot and norms,
    * one double division), so the assignment is bit-identical to the SQL
    * formulation. The argmax stays ONE unexpanded struct column until
    * the single `c_id` extraction — extracting more fields would make
    * CollapseProject inline the k-way scan once per field.
    *
    * `cents` is (cid, quantized centroid, centroid squared norm) — a
    * deterministic corpus subset, or quantized [[Clustering.kmeans]]
    * output (the V4→V3 integration; AnalyticsSpec exercises it).
    */
  def assignToCentroids(vecs: DataFrame,
                        cents: Seq[(Int, Array[Long], Long)]): DataFrame = {
    require(cents.nonEmpty, "assignToCentroids needs at least one centroid")
    val centArr = array(cents.map { case (cid, cv, cnn) =>
      struct(
        array(cv.map(lit(_)): _*).as("cv"),
        lit(cid).as("cid"),
        lit(cnn).as("cnn"))
    }: _*)
    val best = array_max(transform(centArr, c => {
      val dot = VectorFunctions.vecDotLong(col("qv"), c.getField("cv"))
      val score = when(dot >= 0, lit(1.0)).otherwise(lit(-1.0)) *
        ((dot * dot).cast("double") / (col("nn") * c.getField("cnn")).cast("double"))
      struct(score.as("s"), (-c.getField("cid")).as("negcid"))
    }))
    vecs.withColumn("c_id", -best.getField("negcid"))
  }

  val all: Seq[QuerySpec] = Seq(

    QuerySpec(
      "ann_brute_topk",
      (s, d) => {
        val base = Corpus.quantizedVectors(s, d)
        val probes = base.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nn").as("q_nn"))
        // top-5 via the bounded aggregate ([[graft.functions.
        // TopKScoredAgg]]), NOT a window: a row_number window here would
        // push EVERY scored candidate through a |probes|-partition
        // shuffle — the whole corpus × probes into 10 reducers at 100 TB
        // (volume AND skew). The aggregate's map-side combine reduces
        // each scan partition to ≤ 5 pairs per probe before anything
        // moves; ordering is the identical (score DESC, vec_id) double
        // total order, so the emitted rows cannot differ (oracle-held).
        val topk = udaf(new graft.functions.TopKScoredAgg(5),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
        base.crossJoin(broadcast(probes))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            Corpus.dotCol("qv", "q_qv").as("dot"),
            col("nn").as("na"), col("q_nn").as("nb"))
          .withColumn("score", Corpus.scoreCol)
          .groupBy("query_id")
          .agg(topk(col("score"), col("vec_id")).as("top"))
          .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
          .select(col("query_id"), col("t._2").as("neighbor_id"),
            (col("pos") + 1).cast("int").as("rank"), col("t._1").as("score"))
      },
      Some(s"""
        WITH base AS (${Corpus.quantizedVectorsSql}),
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                 CAST(list_sum(list_transform(range(1, 65), i -> c.qv[i] * q.qv[i])) AS BIGINT) AS dot,
                 c.nn AS na, q.nn AS nb
          FROM base c JOIN base q ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
        SELECT query_id, vec_id AS neighbor_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY ${Corpus.scoreSql} DESC, vec_id) AS INTEGER) AS rank,
               ${Corpus.scoreSql} AS score
        FROM pairs
        QUALIFY rank <= 5""")),

    // IVF (inverted-file) ANN: a coarse quantizer assigns every vector to
    // its nearest centroid; probes search only their centroid's inverted
    // list. Centroids here are a fixed, deterministic subset (vec_id<16)
    // rather than k-means output — the INDEX STRUCTURE (zero-shuffle
    // assignment + per-cell search) is the scale path being exercised;
    // swapping in trained centroids ([[Clustering.kmeans]] →
    // [[assignToCentroids]], AnalyticsSpec) changes recall, not the plan.
    // Assignment ties break on centroid id, so both engines agree exactly.
    QuerySpec(
      "ann_ivf",
      (s, d) => {
        val base = Corpus.quantizedVectors(s, d)
        // only these k=16 rows reach the driver (the kmeans posture);
        // assignment is then a per-row argmax — no 16n-row crossJoin, no
        // per-vector window, zero shuffles of the corpus
        val cents = base.filter(col("vec_id") < 16)
          .select("vec_id", "qv", "nn").collect()
          .map(r => (r.getLong(0).toInt, r.getSeq[Long](1).toArray, r.getLong(2)))
          .sortBy(_._1).toSeq
        val assigned = assignToCentroids(base, cents)
          .select("vec_id", "qv", "nn", "c_id")
        val probes = assigned.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
            col("nn").as("q_nn"), col("c_id"))
        // bounded per-probe top-k, same rationale as ann_brute_topk (r5);
        // still one hash exchange total (the agg), now moving ≤3-pair
        // buffers instead of every scored cell candidate
        val topk = udaf(new graft.functions.TopKScoredAgg(3),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
        assigned.join(broadcast(probes), Seq("c_id"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            Corpus.dotCol("qv", "q_qv").as("dot"),
            col("nn").as("na"), col("q_nn").as("nb"))
          .withColumn("score", Corpus.scoreCol)
          .groupBy("query_id")
          .agg(topk(col("score"), col("vec_id")).as("top"))
          .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
          .select(col("query_id"), col("t._2").as("neighbor_id"),
            (col("pos") + 1).cast("int").as("rank"), col("t._1").as("score"))
      },
      Some(s"""
        WITH base AS (${Corpus.quantizedVectorsSql}),
        cents AS (SELECT vec_id AS c_id, qv AS c_qv, nn AS c_nn FROM base WHERE vec_id < 16),
        scored AS (
          SELECT v.vec_id, v.qv, v.nn, c.c_id,
                 CAST(list_sum(list_transform(range(1, 65), i -> v.qv[i] * c.c_qv[i])) AS BIGINT) AS dot,
                 v.nn AS na, c.c_nn AS nb
          FROM base v CROSS JOIN cents c),
        assigned AS (
          SELECT vec_id, qv, nn, c_id FROM (
            SELECT vec_id, qv, nn, c_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                     ORDER BY ${Corpus.scoreSql} DESC, c_id) AS rk
            FROM scored) WHERE rk = 1),
        pairs AS (
          SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                 CAST(list_sum(list_transform(range(1, 65), i -> v.qv[i] * q.qv[i])) AS BIGINT) AS dot,
                 v.nn AS na, q.nn AS nb
          FROM assigned v JOIN assigned q
            ON v.c_id = q.c_id AND q.vec_id < 10 AND v.vec_id <> q.vec_id)
        SELECT query_id, vec_id AS neighbor_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY ${Corpus.scoreSql} DESC, vec_id) AS INTEGER) AS rank,
               ${Corpus.scoreSql} AS score
        FROM pairs
        QUALIFY rank <= 3""")),

    QuerySpec(
      "ann_lsh_bucket",
      (s, d) => {
        // bucket width derives from corpus size (constant mean
        // occupancy); the oracle derives the identical width in SQL
        val bits = Corpus.signBucketBits(Corpus.vecCount(s, d))
        val base = Corpus.quantizedVectors(s, d)
          .withColumn("bucket", Corpus.signBucketColBits(bits))
        val probes = base.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
            col("nn").as("q_nn"), col("bucket"))
        // bounded per-probe top-k, same rationale as ann_brute_topk (r5)
        val topk = udaf(new graft.functions.TopKScoredAgg(3),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
        base.join(broadcast(probes), Seq("bucket"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            Corpus.dotCol("qv", "q_qv").as("dot"),
            col("nn").as("na"), col("q_nn").as("nb"))
          .withColumn("score", Corpus.scoreCol)
          .groupBy("query_id")
          .agg(topk(col("score"), col("vec_id")).as("top"))
          .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
          .select(col("query_id"), col("t._2").as("neighbor_id"),
            (col("pos") + 1).cast("int").as("rank"), col("t._1").as("score"))
      },
      Some(s"""
        WITH vwidth AS (
          SELECT (${Corpus.signBucketBitsSqlCase("n")}) AS bits
          FROM (SELECT count(*) AS n FROM embeddings)),
        base AS (
          SELECT vec_id, qv, nn, ${Corpus.signBucketSqlBits("p.bits")} AS bucket
          FROM (${Corpus.quantizedVectorsSql}), vwidth p),
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                 CAST(list_sum(list_transform(range(1, 65), i -> c.qv[i] * q.qv[i])) AS BIGINT) AS dot,
                 c.nn AS na, q.nn AS nb
          FROM base c JOIN base q
            ON c.bucket = q.bucket AND q.vec_id < 10 AND c.vec_id <> q.vec_id)
        SELECT query_id, vec_id AS neighbor_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY ${Corpus.scoreSql} DESC, vec_id) AS INTEGER) AS rank,
               ${Corpus.scoreSql} AS score
        FROM pairs
        QUALIFY rank <= 3"""))
  )
}
