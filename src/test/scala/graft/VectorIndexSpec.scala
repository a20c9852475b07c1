package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.analytics.{Corpus, VectorIndexStore}
import graft.streaming.SnapshotStore

/** Persisted IVF×SQ8 index (SURVEY §2.11 / r7 verdict item 5): the
  * trained artifacts live in SnapshotStore targets, new vectors stream
  * in against the FROZEN quantizer, and the maintained index is
  * indistinguishable from a batch rebuild — train once, maintain
  * incrementally. (`ann_ivf_sq8_persisted` holds search equality with
  * the in-query formulation under the DuckDB oracle; this spec holds
  * the maintenance story.)
  */
class VectorIndexSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toFile.getAbsolutePath
  private val d = "/root/testdata/sf0.001"

  test("streamed ingest (chunked, with checkpoint resume) equals one-shot batch build") {
    val meta = tmp("vidx-meta"); val codesStream = tmp("vidx-cs")
    val codesBatch = tmp("vidx-cb")
    val in = tmp("vidx-in"); val ckpt = tmp("vidx-ckpt")

    val base = Corpus.quantizedVectors(spark, d)
    val existing = base.filter(col("vec_id") % 11 =!= 0)
    // train on the EXISTING corpus only — later arrivals must encode
    // against this frozen quantizer, not retrain it
    VectorIndexStore.train(spark, existing, meta)
    VectorIndexStore.appendBatch(spark, existing, meta, codesStream, 1L)
    VectorIndexStore.appendBatch(spark, existing, meta, codesBatch, 1L)

    // reference: the new vectors added in ONE batch
    val newRaw = Tables.embeddings(spark, d).filter(col("vec_id") % 11 === 0)
      .select("vec_id", "embedding")
    VectorIndexStore.appendBatch(spark,
      VectorIndexStore.quantize(newRaw), meta, codesBatch, 2L)

    // streamed: the same vectors in 3 chunks, drained as separate
    // micro-batches, with a full stop + checkpoint resume in the middle
    val ids = newRaw.select("vec_id").collect().map(_.getLong(0)).sorted
    val (c1, rest) = ids.splitAt(ids.length / 3)
    val (c2, c3) = rest.splitAt(rest.length / 2)
    def writeChunk(chunk: Array[Long]): Unit = {
      newRaw.filter(col("vec_id").isin(chunk: _*))
        .coalesce(1).write.mode("append").parquet(in)
      Thread.sleep(5)
    }
    writeChunk(c1)
    val schema = spark.read.parquet(in).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q1 = VectorIndexStore.ingestSink(stream(), meta, codesStream, ckpt)
    q1.awaitTermination(120000)
    // restart: two more chunks land, the SAME checkpoint resumes
    writeChunk(c2); writeChunk(c3)
    val q2 = VectorIndexStore.ingestSink(stream(), meta, codesStream, ckpt)
    q2.awaitTermination(120000)

    def indexRows(t: String) = VectorIndexStore.readIndex(spark, t)
      .select(col("vec_id"), col("c_id"), base64(col("code_b")).as("code"), col("rnn"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(indexRows(codesStream) === indexRows(codesBatch),
      "streamed index diverged from the batch build")

    // the search over either index is byte-identical
    val probes = base.filter(col("vec_id") < 10)
    def searched(t: String) = graft.analytics.SimilarityQueries
      .topKPerProbe(VectorIndexStore.searchPairs(spark, probes, base, meta, t, 3), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(searched(codesStream) === searched(codesBatch))

    // LWW maintenance: a re-ingested (updated) embedding supersedes its
    // old codes — the updated row differs and matches a fresh encode
    val victim = ids.head
    val updated = newRaw.filter(col("vec_id") === victim)
      .select(col("vec_id"),
        expr("transform(embedding, x -> x * 2.0d)").as("embedding"))
    VectorIndexStore.appendBatch(spark,
      VectorIndexStore.quantize(updated), meta, codesStream, 9L)
    val before = indexRows(codesBatch).find(_._1 == victim).get
    val after = VectorIndexStore.readIndex(spark, codesStream)
      .filter(col("vec_id") === victim)
      .select(col("vec_id"), col("c_id"), base64(col("code_b")).as("code"), col("rnn"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(after.length === 1)
    assert(after.head._4 !== before._4, "re-ingest did not supersede old codes")

    // meta target is control-plane sized: k centroids + 2 bounds rows
    assert(SnapshotStore.readTarget(spark, meta).count() ===
      graft.analytics.SimilarityQueries.TrainedK + 2L)
  }

  test("streaming search serves the CURRENT persisted index — fresh after streamed ingest") {
    val meta = tmp("vidxs-meta"); val codes = tmp("vidxs-codes")
    val qin = tmp("vidxs-qin"); val ckpt = tmp("vidxs-ckpt")
    val iin = tmp("vidxs-iin"); val ickpt = tmp("vidxs-ickpt")

    val base = Corpus.quantizedVectors(spark, d)
    val existing = base.filter(col("vec_id") % 11 =!= 0)
    VectorIndexStore.train(spark, existing, meta)
    VectorIndexStore.appendBatch(spark, existing, meta, codes, 1L)

    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Int)]()
    def drainQueries(): Unit = {
      val schema = spark.read.parquet(qin).schema
      val q = VectorIndexStore.searchSink(
        spark.readStream.schema(schema).parquet(qin),
        meta, codes, exact = base, checkpoint = ckpt,
        sink = df => df.select("query_id", "neighbor_id", "rank").collect()
          .foreach(r => { got.add((r.getLong(0), r.getLong(1), r.getInt(2))); () }))
      q.awaitTermination(120000)
    }
    def batchSearch(probesRaw: org.apache.spark.sql.DataFrame) =
      graft.analytics.SimilarityQueries.topKPerProbe(
        VectorIndexStore.searchPairs(spark,
          VectorIndexStore.quantize(probesRaw), base, meta, codes, 3), 3)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // phase 1: five query vectors stream in; streamed == batch search
    val probes1 = Tables.embeddings(spark, d)
      .filter(col("vec_id") < 5).select("vec_id", "embedding")
    probes1.coalesce(1).write.mode("append").parquet(qin)
    drainQueries()
    assert(got.toArray(Array.empty[(Long, Long, Int)]).toSet === batchSearch(probes1),
      "streamed search diverged from batch search over the same index")

    // the index GROWS via the ingest face (streamed, checkpointed)...
    Tables.embeddings(spark, d).filter(col("vec_id") % 11 === 0)
      .select("vec_id", "embedding").coalesce(1).write.mode("append").parquet(iin)
    val ingSchema = spark.read.parquet(iin).schema
    VectorIndexStore.ingestSink(
      spark.readStream.schema(ingSchema).parquet(iin), meta, codes, ickpt)
      .awaitTermination(120000)

    // ...and phase 2's queries see the grown index with no restart of
    // anything but the (stateless) search stream: streamed == batch
    // search over the CURRENT codes target, whose candidate set now
    // includes the streamed-in vectors
    got.clear()
    val probes2 = Tables.embeddings(spark, d)
      .filter(col("vec_id") >= 5 && col("vec_id") < 10).select("vec_id", "embedding")
    probes2.coalesce(1).write.mode("append").parquet(qin)
    drainQueries()
    val phase2 = got.toArray(Array.empty[(Long, Long, Int)]).toSet
    assert(phase2 === batchSearch(probes2),
      "streamed search diverged after streamed ingest")
    // freshness evidence: at least one neighbor served in phase 2 is a
    // vector that arrived through the ingest stream
    assert(phase2.exists(_._2 % 11 == 0),
      "no streamed-in vector ever surfaced as a neighbor — index not fresh")

    // index observability: the stats row reflects the grown index —
    // full corpus count, 64 B of packed code per vector, every cell
    // bounded (the retrain signal an operator watches)
    val stats = VectorIndexStore.indexStats(spark, codes).get
    val n = base.count()
    assert(stats.nVectors === n)
    assert(stats.codeBytes === n * 64)
    assert(stats.cells > 1 && stats.minCell >= 1 && stats.maxCell < n)
  }

  test("drift alarm triggers retrain; recall@3 on the drifted stream recovers; search stays available") {
    import spark.implicits._
    val dim = 8
    val meta = tmp("vret-meta"); val codes = tmp("vret-codes")
    val sdir = tmp("vret-state"); val ckpt = tmp("vret-ckpt")
    val din = tmp("vret-din")

    // planted two-regime corpus: the BASE cloud varies along u1
    // (dims 0..3), the DRIFTED cloud along the orthogonal u2
    // (dims 4..7) — a quantizer trained on base puts all its centroid
    // variety and tight SQ8 bounds in the u1 subspace, so drifted
    // vectors collapse into few cells with clamped codes
    val rng = new scala.util.Random(7)
    def planted(u: Array[Double], n: Int, from: Long) = (0 until n).map { k =>
      val t = rng.nextGaussian() * 40
      (from + k, (0 until dim).map(i =>
        math.floor(t * u(i) + rng.nextGaussian() * 3).toLong + 1000L).toSeq)
    }
    val u1 = Array(5.0, -3.0, 4.0, 1.0, 0.0, 0.0, 0.0, 0.0)
    val u2 = Array(0.0, 0.0, 0.0, 0.0, 3.0, 5.0, -2.0, 7.0)
    val baseRows = planted(u1, 400, 0L)
    val driftRows = planted(u2, 400, 100000L)
    def qframe(rows: Seq[(Long, Seq[Long])]) = rows.toDF("vec_id", "qv")
      .withColumn("nn", org.apache.spark.sql.functions
        .expr("aggregate(qv, 0L, (acc, x) -> acc + x * x)"))
    val base = qframe(baseRows)
    val drifted = qframe(driftRows)
    val full = qframe(baseRows ++ driftRows)

    // generation 1: train on base, index base, then the drifted batch
    // arrives and is encoded under the FROZEN (now-wrong) quantizer
    VectorIndexStore.train(spark, base, meta)
    VectorIndexStore.appendBatch(spark, base, meta, codes, 1L)
    VectorIndexStore.appendBatch(spark, drifted, meta, codes, 2L)

    val queries = qframe(driftRows.take(10))
    def recall3(): Int = {
      val truth = graft.analytics.SimilarityQueries.topKPerProbe(
        full.crossJoin(broadcast(queries.select(
            col("vec_id").as("query_id"), col("qv").as("q_qv"),
            col("nn").as("q_nn"))))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            graft.analytics.Corpus.dotCol("qv", "q_qv").as("dot"),
            col("nn").as("na"), col("q_nn").as("nb")), 3)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = graft.analytics.SimilarityQueries.topKPerProbe(
        VectorIndexStore.searchPairs(spark, queries, full, meta, codes, 3), 3)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth intersect got).size
    }
    val recallBefore = recall3()

    // the drift monitor watches the arriving stream against the frozen
    // baseline axis and fires the retrain callback when it rotates
    val baseline = graft.analytics.Pca.dominantAxis(
      graft.analytics.Pca.shifted(base), dim)
    drifted.select("vec_id", "qv").coalesce(1).write.mode("append").parquet(din)
    val schema = spark.read.parquet(din).schema
    val alarms = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = graft.streaming.StreamingVectorDrift.maintainWithAlarm(
      graft.analytics.Pca.shifted(
        spark.readStream.schema(schema).parquet(din)),
      dim, sdir, ckpt, baseline, thresholdPpm = 500000L,
      onAlarm = _ => {
        alarms.incrementAndGet()
        // the wired response: new quantizer generation on the CURRENT
        // corpus + re-encode into the same targets (LWW supersession)
        VectorIndexStore.retrain(spark, full, meta, codes,
          generation = 2L, batchId = 9L)
      })
    q.awaitTermination(120000)
    assert(alarms.get() === 1, "orthogonal drift stream must trip the alarm once")

    // search stayed available and got BETTER: the same queries against
    // the same targets, now under the generation-2 quantizer
    val recallAfter = recall3()
    info(s"recall@3 over 10 drifted queries: $recallBefore/30 before retrain, $recallAfter/30 after")
    assert(recallAfter > recallBefore,
      s"retrain did not improve drifted recall: $recallBefore -> $recallAfter")
    assert(recallAfter >= 24, // ≥80% of the 30 true neighbors
      s"post-retrain recall@3 too low: $recallAfter/30 (before: $recallBefore)")

    // the meta target resolves to exactly one generation's artifacts
    // (k centroids + 2 bounds rows — gen-2 rows superseded gen-1's)
    assert(graft.streaming.SnapshotStore.readTarget(spark, meta).count() ===
      graft.analytics.SimilarityQueries.TrainedK + 2L)
  }
}
