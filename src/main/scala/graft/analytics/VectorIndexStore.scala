package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{PackedVectorFunctions, VectorFunctions}
import graft.streaming.SnapshotStore

/** Persisted IVF×SQ8 vector index as [[SnapshotStore]] targets (r8) —
  * the "train once, maintain forever" posture a 100 TB vector store
  * needs: `ann_ivf_sq8` trains Lloyd + computes bounds + packs codes
  * inside the query, which is fine under the oracle but wrong
  * operationally at scale (you do not re-run k-means over 10^10
  * vectors per search). Here the trained artifacts MATERIALIZE:
  *
  *  - **meta target** (control-plane sized, k+2 rows): the trained
  *    centroids (quantized components + squared norm) and the global
  *    SQ8 per-dimension [min,max] bounds, each row one JSON image.
  *    Frozen at train time — the FAISS IndexIVFScalarQuantizer
  *    train/add split: vectors added later are encoded against the
  *    FROZEN quantizer (recall drifts if the distribution does; retrain
  *    is an explicit operator decision, not a per-batch cost).
  *  - **codes target** (the compact scan side, keyed by vec_id): cell
  *    assignment, packed 8-bit codes (base64 of the 64-byte binary —
  *    the 8× compression that makes the scan memory-bound-friendly),
  *    and the reconstructed norm. LWW rows: a re-ingested embedding
  *    for an existing vec_id supersedes its old codes by sequence.
  *
  * Maintenance is INCREMENTAL from the vector stream ([[ingestSink]]):
  * each micro-batch encodes only its own rows (per-row map against the
  * broadcast meta — no shuffle) and merges O(|batch|) into the codes
  * target through the store's checkpointed, replay-idempotent LWW
  * merge — the same contract as every other maintained table here.
  * Search ([[searchPairs]]) reads the persisted index and runs the
  * exact `ann_ivf_sq8` pipeline: probe-cell prune → packed-code scan
  * ([[PackedVectorFunctions.vecDotU8Long]]) → 4·k approximate
  * survivors → exact integer rerank. `ann_ivf_sq8_persisted` holds the
  * equality with the in-query formulation under the DuckDB oracle;
  * VectorIndexSpec proves streamed ingestion (with a mid-drain
  * restart) lands the identical index as a single batch build.
  */
object VectorIndexStore {

  private val codeSchema =
    org.apache.spark.sql.types.StructType.fromDDL("c_id INT, rnn BIGINT, code STRING")
  private val metaSchema =
    org.apache.spark.sql.types.StructType.fromDDL("comps ARRAY<BIGINT>, cnn BIGINT")

  /** Quantize raw embeddings to the engine's exact-integer form — the
    * same floor(x*100) contract as [[Corpus.quantizedVectors]], inlined
    * so streaming batches of (vec_id, embedding) encode identically.
    */
  def quantize(vecs: DataFrame): DataFrame =
    vecs.select(
      col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 100) as bigint))")
        .as("qv"))
      .withColumn("nn", expr("aggregate(qv, 0L, (acc, x) -> acc + x * x)"))

  /** Train the coarse quantizer + SQ8 bounds on `base` (vec_id, qv, nn)
    * and persist them as the meta target. One k-row + one 64-row driver
    * pull — control-plane, corpus-size-independent row counts.
    */
  def train(spark: SparkSession, base: DataFrame, metaTarget: String,
            k: Int = SimilarityQueries.TrainedK,
            iters: Int = SimilarityQueries.TrainedIters,
            generation: Long = 1L): Unit = {
    val cents = Clustering.kmeansSpherical(spark, base, k, iters)
    val bounds = base
      .select(posexplode(col("qv")).as(Seq("i", "x")))
      .groupBy("i").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    def arrJson(xs: Seq[Long], cnn: Long): String =
      s"""{"comps":[${xs.mkString(",")}],"cnn":$cnn}"""
    import spark.implicits._
    // generation stamps the LWW sequence: a later generation's meta rows
    // supersede an earlier quantizer's (the drift-retrain path)
    val seq = f"$generation%010d"
    val rows =
      cents.map { case (cid, cv, cnn) =>
        (s"cent_$cid", "PUT", seq, arrJson(cv.toSeq, cnn))
      } ++ Seq(
        ("mn", "PUT", seq, arrJson(bounds.map(_._2).toSeq, 0L)),
        ("mx", "PUT", seq, arrJson(bounds.map(_._3).toSeq, 0L)))
    SnapshotStore.mergeIntoTarget(spark, metaTarget,
      rows.toSeq.toDF("keys", "op", "sequenceNumber", "newImage"), generation - 1L)
  }

  /** Drift-triggered RETRAIN (r11, VERDICT r10 item 6): freeze a NEW
    * quantizer generation on `corpus` (vec_id, qv, nn) and re-encode
    * `corpus` into the same targets. LWW supersession keeps search
    * AVAILABLE throughout — readers resolve whatever meta+codes rows
    * have landed (mid-retrain a reader may briefly decode old codes
    * under new bounds: degraded accuracy, never an error or an empty
    * index; the codes re-encode then supersedes per key). Post-retrain
    * recall on the drifted distribution recovers — VectorIndexSpec's
    * drift-alarm → retrain → recall case measures it.
    */
  def retrain(spark: SparkSession, corpus: DataFrame, metaTarget: String,
              codesTarget: String, generation: Long, batchId: Long): Unit = {
    train(spark, corpus, metaTarget, generation = generation)
    appendBatch(spark, corpus, metaTarget, codesTarget, batchId)
  }

  /** The persisted quantizer: (centroids, mn bounds, mx bounds). */
  def readMeta(spark: SparkSession, metaTarget: String)
      : (Seq[(Int, Array[Long], Long)], Seq[Long], Seq[Long]) = {
    val rows = SnapshotStore.readTarget(spark, metaTarget)
      .select(col("keys"), from_json(col("newImage"), metaSchema).as("m"))
      .select(col("keys"), col("m.comps").as("comps"), col("m.cnn").as("cnn"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getLong(2)))
    require(rows.nonEmpty, s"no trained index meta at '$metaTarget' — run train first")
    val cents = rows.filter(_._1.startsWith("cent_"))
      .map { case (k, comps, cnn) =>
        (k.stripPrefix("cent_").toInt, comps.toArray, cnn)
      }.sortBy(_._1).toSeq
    def arr(name: String) = rows.find(_._1 == name).getOrElse(
      throw new IllegalStateException(s"meta target missing '$name' bounds"))._2
    (cents, arr("mn"), arr("mx"))
  }

  /** Encode a quantized batch against the FROZEN quantizer: cell
    * assignment + packed codes + reconstructed norm, as canonical LWW
    * delta rows for the codes target. Pure per-row map (centroids and
    * bounds are literals) — no shuffle, O(|batch|).
    */
  private def encode(batch: DataFrame, cents: Seq[(Int, Array[Long], Long)],
                     mn: Seq[Long], mx: Seq[Long], seqBase: String): DataFrame = {
    val mnl = typedLit(mn); val mxl = typedLit(mx)
    SimilarityQueries.assignToCentroids(batch, cents)
      .withColumn("mnl", mnl).withColumn("mxl", mxl)
      // CLAMPED quantization: the bounds are frozen at train time, so a
      // later arrival can fall outside [mn, mx] — it saturates to the
      // nearest code (the standard SQ add-after-train behavior; the
      // in-query formulation never clamps because its bounds cover its
      // own corpus, so clamping changes nothing for the oracle equality)
      .withColumn("code", expr(
        """transform(qv, (x, i) ->
             CASE WHEN element_at(mxl, i + 1) > element_at(mnl, i + 1)
                  THEN greatest(0L, least(255L,
                       ((x - element_at(mnl, i + 1)) * 255L)
                       div (element_at(mxl, i + 1) - element_at(mnl, i + 1))))
                  ELSE 0L END)"""))
      .withColumn("rv", expr(
        """transform(code, (cx, i) ->
             element_at(mnl, i + 1) * 255L
             + cx * (element_at(mxl, i + 1) - element_at(mnl, i + 1)))"""))
      .withColumn("rnn", expr("aggregate(rv, 0L, (acc, x) -> acc + x * x)"))
      .withColumn("code_b", PackedVectorFunctions.vecPackU8(col("code")))
      .select(
        col("vec_id").cast("string").as("keys"),
        lit("PUT").as("op"),
        lit(seqBase).as("sequenceNumber"),
        to_json(struct(col("c_id"),
          col("rnn"), base64(col("code_b")).as("code"))).as("newImage"))
  }

  /** Add one batch of quantized vectors (vec_id, qv, nn) to the codes
    * target, encoded against the persisted meta. Later batches
    * supersede earlier rows for the same vec_id (LWW by batch seq).
    */
  def appendBatch(spark: SparkSession, batch: DataFrame, metaTarget: String,
                  codesTarget: String, batchId: Long): Unit = {
    val (cents, mn, mx) = readMeta(spark, metaTarget)
    SnapshotStore.mergeIntoTarget(spark, codesTarget,
      encode(batch, cents, mn, mx, seqBase = f"sb$batchId%012d"), batchId)
  }

  /** Incremental maintenance from the vector stream: each micro-batch
    * of RAW (vec_id, embedding) rows quantizes, encodes against the
    * frozen quantizer, and merges into the codes target. Checkpointed;
    * replays fold idempotently through the store's LWW merge
    * (VectorIndexSpec drives a mid-drain restart).
    */
  def ingestSink(newVecs: DataFrame, metaTarget: String, codesTarget: String,
                 checkpoint: String,
                 trigger: org.apache.spark.sql.streaming.Trigger =
                   org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // the frozen quantizer is read ONCE at stream start, not per batch
    lazy val meta = readMeta(newVecs.sparkSession, metaTarget)
    newVecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (cents, mn, mx) = meta
        SnapshotStore.mergeIntoTarget(batch.sparkSession, codesTarget,
          encode(quantize(batch), cents, mn, mx, seqBase = f"sb$batchId%012d"),
          batchId)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** Streaming SEARCH against the persisted index — the serving face
    * next to [[ingestSink]]'s maintenance face: each micro-batch of RAW
    * query vectors (vec_id, embedding) quantizes, searches the
    * CURRENT persisted index (meta read per batch is k+2 rows; the
    * codes read reflects everything [[ingestSink]] has merged so far —
    * search-after-ingest freshness is the store's own read semantics,
    * not extra machinery), and hands `sink` the per-query top-k.
    * Stateless foreachBatch with checkpointed offsets: a replayed
    * batch re-emits the same rows (at-least-once emission; a keyed
    * downstream consumer dedupes, the house contract).
    */
  def searchSink(queries: DataFrame, metaTarget: String, codesTarget: String,
                 exact: DataFrame, checkpoint: String,
                 sink: DataFrame => Unit, k: Int = 3,
                 trigger: org.apache.spark.sql.streaming.Trigger =
                   org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val probes = quantize(batch)
        sink(SimilarityQueries.topKPerProbe(
          searchPairs(spark, probes, exact, metaTarget, codesTarget, k), k))
        ()
      }
      .trigger(trigger)
      .start()

  /** The persisted codes target as the IVF×SQ8 scan side:
    * (vec_id, c_id, code_b, rnn).
    */
  def readIndex(spark: SparkSession, codesTarget: String): DataFrame =
    SnapshotStore.readTarget(spark, codesTarget)
      .select(col("keys").cast("bigint").as("vec_id"),
        from_json(col("newImage"), codeSchema).as("c"))
      .select(col("vec_id"), col("c.c_id").as("c_id"),
        unbase64(col("c.code")).as("code_b"), col("c.rnn").as("rnn"))

  /** IVF×SQ8 search over the PERSISTED index — the exact `ann_ivf_sq8`
    * pipeline with the in-query trained artifacts swapped for the
    * store's: nprobe cell prune (sorted literal slice, zero-shuffle) →
    * packed-code scan (factored per-probe constants, the
    * vec_dot_u8_long kernel reads only base64-decoded 64 B codes) →
    * 4·k approximate survivors per probe (bounded aggregate) → exact
    * integer rerank against the probes' full vectors. `exact` supplies
    * the full vectors for the rerank point-reads (at scale: the raw
    * vector table; candidate ids broadcast into it).
    */
  def searchPairs(spark: SparkSession, probesBase: DataFrame, exact: DataFrame,
                  metaTarget: String, codesTarget: String, kk: Int,
                  nprobe: Int = SimilarityQueries.TrainedNProbe): DataFrame = {
    val (cents, mn, mx) = readMeta(spark, metaTarget)
    val mnl = typedLit(mn); val mxl = typedLit(mx)
    val index = readIndex(spark, codesTarget)
    val probeCells = probesBase
      .withColumn("cell",
        explode(slice(sort_array(SimilarityQueries.centScoredArr(cents), asc = false),
          1, nprobe)))
      .withColumn("mnl", mnl).withColumn("mxl", mxl)
      .select(
        col("vec_id").as("query_id"), col("nn").as("q_nn"),
        (-col("cell.negcid")).as("c_id"),
        expr("""transform(qv, (x, i) ->
                  x * (element_at(mxl, i + 1) - element_at(mnl, i + 1)))""")
          .as("q_scaled"),
        (VectorFunctions.vecDotLong(col("qv"), mnl) * 255L).as("c0"))
    val apairs = index.join(broadcast(probeCells), Seq("c_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (col("c0") + PackedVectorFunctions.vecDotU8Long(col("code_b"), col("q_scaled")))
          .as("adot"),
        col("rnn").as("ana"), col("q_nn").as("anb"))
    val topc = udaf(new graft.functions.TopKScoredAgg(SimilarityQueries.Sq8CandMult * kk),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    val cands = apairs
      .withColumn("ascore", expr(SimilarityQueries.sq8ApproxScoreSql))
      .groupBy("query_id").agg(topc(col("ascore"), col("vec_id")).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t._2").as("vec_id"))
    val probesExact = probesBase
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nn").as("q_nn"))
    exact.join(broadcast(cands), "vec_id")
      .join(broadcast(probesExact), "query_id")
      .select(col("query_id"), col("vec_id"),
        Corpus.dotCol("qv", "q_qv").as("dot"),
        col("nn").as("na"), col("q_nn").as("nb"))
  }

  /** One-row operational report of the persisted index: vector count,
    * packed-code bytes (the memory the scan side costs), and cell
    * balance (min/max/mean occupancy — a skewed coarse quantizer makes
    * hot probes slow; the retrain signal). One aggregate over the codes
    * target, k rows reduced to a summary.
    */
  final case class IndexStats(nVectors: Long, codeBytes: Long,
                              cells: Int, minCell: Long, maxCell: Long)

  def indexStats(spark: SparkSession, codesTarget: String): Option[IndexStats] = {
    val idx = readIndex(spark, codesTarget)
    val cells = idx.groupBy("c_id")
      .agg(count(lit(1)).as("n"), sum(length(col("code_b"))).as("b"))
      .collect()
    if (cells.isEmpty) None
    else Some(IndexStats(
      nVectors = cells.map(_.getLong(1)).sum,
      codeBytes = cells.map(_.getLong(2)).sum,
      cells = cells.length,
      minCell = cells.map(_.getLong(1)).min,
      maxCell = cells.map(_.getLong(1)).max))
  }

  // ───────────────────────── PQ face (r16, VERDICT r15 #5) ──────────
  // The persisted IVF×PQ index — the FAISS IndexIVFPQ "train once,
  // add forever" posture next to the SQ8 face above. Same store
  // anatomy: a control-plane meta target (coarse centroids under the
  // cent_* keys PLUS the M×K per-subspace codewords under cb_$m_$j
  // keys, all LWW by generation) and a codes target whose rows carry
  // the cell id, the reconstructed norm, and the PQ code PACKED to
  // M = 8 bytes ([[graft.functions.VecPackU8]]; ids ≤ 15 each) — 64×
  // smaller than the long-array vector, 8× smaller than SQ8's codes.
  // Read-side unpacking is the codegen'd [[graft.functions
  // .VecUnpackU8]] kernel, so the packed layout costs nothing at scan
  // time. Encoding against the FROZEN codebooks is a pure per-row map
  // (broadcast literals, no shuffle); search is the exact `ann_ivf_pq`
  // pipeline (nprobe cell prune → per-probe ADC lookup table → deep
  // 8·k rerank pool → exact integer rerank), so
  // `ann_ivf_pq_persisted` holds row-for-row equality with the
  // in-query formulation under the DuckDB oracle, and PqIndexSpec
  // holds the maintenance story (chunked streamed ingest + restart +
  // LWW supersession ≡ batch build).

  /** Train the coarse quantizer + per-subspace PQ codebooks on `base`
    * (vec_id, qv, nn) and persist both into the meta target. Training
    * matches the in-query `ann_ivf_pq` exactly: spherical Lloyd for
    * cells, L2 Lloyd per 8-dim subspace for codewords — deterministic
    * integer chains, so a rebuild lands bit-identical artifacts.
    */
  def trainPq(spark: SparkSession, base: DataFrame, metaTarget: String,
              generation: Long = 1L): Unit = {
    import SimilarityQueries.{PqM, PqSub, PqK}
    val cents = Clustering.kmeansSpherical(spark, base,
      SimilarityQueries.TrainedK, SimilarityQueries.TrainedIters)
    val cb: Seq[Seq[Seq[Long]]] = (0 until PqM).map { m =>
      val sub = base
        .select(col("vec_id"), expr(s"slice(qv, ${m * PqSub + 1}, $PqSub)").as("qv"))
        .withColumn("nn", expr("aggregate(qv, 0L, (acc, x) -> acc + x * x)"))
      Clustering.kmeansQuantized(spark, sub, PqK, SimilarityQueries.PqTrainIters)
        ._1.sortBy(_._1).map(_._2.toSeq).toSeq
    }
    def arrJson(xs: Seq[Long], cnn: Long): String =
      s"""{"comps":[${xs.mkString(",")}],"cnn":$cnn}"""
    import spark.implicits._
    val seq = f"$generation%010d"
    val rows =
      cents.map { case (cid, cv, cnn) =>
        (s"cent_$cid", "PUT", seq, arrJson(cv.toSeq, cnn))
      } ++
      (for { m <- 0 until PqM; j <- 0 until PqK } yield
        (s"cb_${m}_$j", "PUT", seq, arrJson(cb(m)(j), 0L)))
    SnapshotStore.mergeIntoTarget(spark, metaTarget,
      rows.toDF("keys", "op", "sequenceNumber", "newImage"), generation - 1L)
  }

  /** The persisted PQ quantizer: (coarse centroids, M×K×sub codebooks). */
  def readMetaPq(spark: SparkSession, metaTarget: String)
      : (Seq[(Int, Array[Long], Long)], Seq[Seq[Seq[Long]]]) = {
    import SimilarityQueries.{PqM, PqK}
    val rows = SnapshotStore.readTarget(spark, metaTarget)
      .select(col("keys"), from_json(col("newImage"), metaSchema).as("m"))
      .select(col("keys"), col("m.comps").as("comps"), col("m.cnn").as("cnn"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getLong(2)))
    require(rows.nonEmpty, s"no trained PQ meta at '$metaTarget' — run trainPq first")
    val cents = rows.filter(_._1.startsWith("cent_"))
      .map { case (k, comps, cnn) =>
        (k.stripPrefix("cent_").toInt, comps.toArray, cnn)
      }.sortBy(_._1).toSeq
    val cbm = rows.filter(_._1.startsWith("cb_"))
      .map { case (k, comps, _) =>
        val Array(m, j) = k.stripPrefix("cb_").split("_").map(_.toInt)
        ((m, j), comps.toSeq)
      }.toMap
    require(cbm.size == PqM * PqK,
      s"PQ meta at '$metaTarget' has ${cbm.size} codewords, expected ${PqM * PqK}")
    val cb = (0 until PqM).map(m => (0 until PqK).map(j => cbm((m, j))).toSeq)
    (cents, cb)
  }

  /** Encode a quantized batch against the FROZEN coarse quantizer +
    * codebooks: cell id, packed M-byte PQ code, reconstructed norm —
    * canonical LWW delta rows. Pure per-row map, no shuffle.
    */
  private def encodePq(batch: DataFrame, cents: Seq[(Int, Array[Long], Long)],
                       cb: Seq[Seq[Seq[Long]]], seqBase: String): DataFrame =
    SimilarityQueries.assignToCentroids(batch, cents)
      .withColumn("cb", typedLit(cb))
      .withColumn("code", expr(SimilarityQueries.pqEncodeExpr))
      .withColumn("code_b", graft.functions.PackedVectorFunctions
        .vecPackU8(expr("transform(code, x -> cast(x as bigint))")))
      .withColumn("rnn", expr(SimilarityQueries.pqRnnExpr))
      .select(
        col("vec_id").cast("string").as("keys"),
        lit("PUT").as("op"),
        lit(seqBase).as("sequenceNumber"),
        to_json(struct(col("c_id"),
          col("rnn"), base64(col("code_b")).as("code"))).as("newImage"))

  /** Add one batch of quantized vectors to the PQ codes target. */
  def appendBatchPq(spark: SparkSession, batch: DataFrame, metaTarget: String,
                    codesTarget: String, batchId: Long): Unit = {
    val (cents, cb) = readMetaPq(spark, metaTarget)
    SnapshotStore.mergeIntoTarget(spark, codesTarget,
      encodePq(batch, cents, cb, seqBase = f"sb$batchId%012d"), batchId)
  }

  /** Incremental PQ maintenance from the raw vector stream — the
    * [[ingestSink]] contract under frozen codebooks: checkpointed,
    * replay-idempotent LWW merges of O(|batch|) encoded rows.
    */
  def ingestSinkPq(newVecs: DataFrame, metaTarget: String, codesTarget: String,
                   checkpoint: String,
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    lazy val meta = readMetaPq(newVecs.sparkSession, metaTarget)
    newVecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (cents, cb) = meta
        SnapshotStore.mergeIntoTarget(batch.sparkSession, codesTarget,
          encodePq(quantize(batch), cents, cb, seqBase = f"sb$batchId%012d"),
          batchId)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** The persisted PQ codes target as the ADC scan side:
    * (vec_id, c_id, code — unpacked to the M codeword ids, rnn).
    */
  def readIndexPq(spark: SparkSession, codesTarget: String): DataFrame =
    SnapshotStore.readTarget(spark, codesTarget)
      .select(col("keys").cast("bigint").as("vec_id"),
        from_json(col("newImage"), codeSchema).as("c"))
      .select(col("vec_id"), col("c.c_id").as("c_id"),
        graft.functions.PackedVectorFunctions
          .vecUnpackU8(unbase64(col("c.code"))).as("code_l"),
        col("c.rnn").as("rnn"))
      .select(col("vec_id"), col("c_id"),
        expr("transform(code_l, x -> cast(x as int))").as("code"),
        col("rnn"))

  /** IVF×PQ search over the PERSISTED index — the exact `ann_ivf_pq`
    * pipeline with the trained artifacts swapped for the store's:
    * nprobe cell prune → per-probe ADC lookup table (M lookups+adds
    * per scanned code) → deep 8·k pool → exact integer rerank against
    * `exact`'s full vectors.
    */
  def searchPairsPq(spark: SparkSession, probesBase: DataFrame, exact: DataFrame,
                    metaTarget: String, codesTarget: String, kk: Int,
                    nprobe: Int = SimilarityQueries.TrainedNProbe): DataFrame = {
    val (cents, cb) = readMetaPq(spark, metaTarget)
    val index = readIndexPq(spark, codesTarget)
    val probeCells = probesBase
      .withColumn("cell",
        explode(slice(sort_array(SimilarityQueries.centScoredArr(cents), asc = false),
          1, nprobe)))
      .withColumn("cb", typedLit(cb))
      .select(
        col("vec_id").as("query_id"), col("nn").as("q_nn"),
        (-col("cell.negcid")).as("c_id"),
        expr(SimilarityQueries.pqLutExpr).as("lut"))
    val apairs = index.join(broadcast(probeCells), Seq("c_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        expr(SimilarityQueries.pqAdotExpr).as("adot"),
        col("rnn").as("ana"), col("q_nn").as("anb"))
    val topc = udaf(new graft.functions.TopKScoredAgg(SimilarityQueries.PqCandMult * kk),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    val cands = apairs
      .withColumn("ascore", expr(SimilarityQueries.sq8ApproxScoreSql))
      .groupBy("query_id").agg(topc(col("ascore"), col("vec_id")).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t._2").as("vec_id"))
    val probesExact = probesBase
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nn").as("q_nn"))
    exact.join(broadcast(cands), "vec_id")
      .join(broadcast(probesExact), "query_id")
      .select(col("query_id"), col("vec_id"),
        Corpus.dotCol("qv", "q_qv").as("dot"),
        col("nn").as("na"), col("q_nn").as("nb"))
  }

  private val builtPq =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  /** Train + bulk-add the full corpus at `d` into fresh temp PQ store
    * targets, once per (session, dir) — the [[ensureBuilt]] memo for
    * the `ann_ivf_pq_persisted` oracle query.
    */
  def ensureBuiltPq(s: SparkSession, d: String): (String, String) =
    builtPq.synchronized {
      val app = s.sparkContext.applicationId
      builtPq.keySet.removeIf(_._1 != app)
      val k = (app, d)
      val got = builtPq.get(k)
      if (got != null) got
      else {
        val meta = java.nio.file.Files.createTempDirectory("graft-vidx-pq-meta")
          .toFile.getAbsolutePath
        val codes = java.nio.file.Files.createTempDirectory("graft-vidx-pq-codes")
          .toFile.getAbsolutePath
        val base = Corpus.quantizedVectors(s, d)
        trainPq(s, base, meta)
        appendBatchPq(s, base, meta, codes, batchId = 1L)
        builtPq.put(k, (meta, codes))
        (meta, codes)
      }
    }

  // ── per-(session, corpus) memoized build for the oracle query ──────
  // ann_ivf_sq8_persisted needs a built index per testdata dir; the
  // build is deterministic (integer Lloyd + integer bounds + integer
  // codes), so building once per session per dir and searching it
  // yields exactly the in-query formulation's rows.

  private val built =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  /** Train + bulk-add the full corpus at `d` into fresh temp store
    * targets, once per (session, dir); returns (metaTarget, codesTarget).
    */
  def ensureBuilt(s: SparkSession, d: String): (String, String) =
    built.synchronized {
      val app = s.sparkContext.applicationId
      built.keySet.removeIf(_._1 != app)
      val k = (app, d)
      val got = built.get(k)
      if (got != null) got
      else {
        val meta = java.nio.file.Files.createTempDirectory("graft-vidx-meta")
          .toFile.getAbsolutePath
        val codes = java.nio.file.Files.createTempDirectory("graft-vidx-codes")
          .toFile.getAbsolutePath
        val base = Corpus.quantizedVectors(s, d)
        train(s, base, meta)
        appendBatch(s, base, meta, codes, batchId = 1L)
        built.put(k, (meta, codes))
        (meta, codes)
      }
    }
}
