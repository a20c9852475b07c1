package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.analytics.{Corpus, SimilarityQueries, VectorIndexStore}
import graft.streaming.SnapshotStore

/** Persisted IVF×PQ index (r16, VERDICT r15 #5) — the maintenance
  * story for the PQ face next to [[VectorIndexSpec]]'s SQ8 one: the
  * coarse centroids AND the M×K codebooks freeze at train time as meta
  * rows, new vectors stream in encoded to M-byte packed codes against
  * the frozen codebooks, and the maintained index is indistinguishable
  * from a batch rebuild. (`ann_ivf_pq_persisted` holds search equality
  * with the in-query ann_ivf_pq under the DuckDB oracle; this spec
  * holds chunked streamed ingest, a mid-stream checkpoint restart, and
  * LWW supersession of a re-ingested vector.)
  */
class PqIndexSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toFile.getAbsolutePath
  private val d = "/root/testdata/sf0.001"

  test("PQ streamed ingest (chunked, checkpoint resume) equals batch; LWW supersedes") {
    val meta = tmp("pqidx-meta"); val codesStream = tmp("pqidx-cs")
    val codesBatch = tmp("pqidx-cb")
    val in = tmp("pqidx-in"); val ckpt = tmp("pqidx-ckpt")

    val base = Corpus.quantizedVectors(spark, d)
    val existing = base.filter(col("vec_id") % 11 =!= 0)
    // train on the EXISTING corpus only — later arrivals encode against
    // the frozen coarse quantizer AND the frozen codebooks
    VectorIndexStore.trainPq(spark, existing, meta)
    VectorIndexStore.appendBatchPq(spark, existing, meta, codesStream, 1L)
    VectorIndexStore.appendBatchPq(spark, existing, meta, codesBatch, 1L)

    // reference: the new vectors added in ONE batch
    val newRaw = Tables.embeddings(spark, d).filter(col("vec_id") % 11 === 0)
      .select("vec_id", "embedding")
    VectorIndexStore.appendBatchPq(spark,
      VectorIndexStore.quantize(newRaw), meta, codesBatch, 2L)

    // streamed: the same vectors in 3 chunks as separate micro-batches,
    // with a full stop + checkpoint resume in the middle
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
    val q1 = VectorIndexStore.ingestSinkPq(stream(), meta, codesStream, ckpt)
    q1.awaitTermination(120000)
    writeChunk(c2); writeChunk(c3)
    val q2 = VectorIndexStore.ingestSinkPq(stream(), meta, codesStream, ckpt)
    q2.awaitTermination(120000)

    def indexRows(t: String) = VectorIndexStore.readIndexPq(spark, t)
      .select(col("vec_id"), col("c_id"),
        expr("cast(code as string)").as("code"), col("rnn"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(indexRows(codesStream) === indexRows(codesBatch),
      "streamed PQ index diverged from the batch build")

    // search over either index is row-identical
    val probes = base.filter(col("vec_id") < 10)
    def searched(t: String) = SimilarityQueries
      .topKPerProbe(VectorIndexStore.searchPairsPq(spark, probes, base, meta, t, 3), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(searched(codesStream) === searched(codesBatch))

    // LWW: a re-ingested (updated) embedding supersedes its old codes
    val victim = ids.head
    val updated = newRaw.filter(col("vec_id") === victim)
      .select(col("vec_id"),
        expr("transform(embedding, x -> x * 2.0d)").as("embedding"))
    VectorIndexStore.appendBatchPq(spark,
      VectorIndexStore.quantize(updated), meta, codesStream, 9L)
    val before = indexRows(codesBatch).find(_._1 == victim).get
    val after = indexRows(codesStream).filter(_._1 == victim)
    assert(after.size === 1)
    assert(after.head._4 !== before._4, "re-ingest did not supersede old codes")

    // meta target is control-plane sized: k centroids + M×K codewords
    assert(SnapshotStore.readTarget(spark, meta).count() ===
      SimilarityQueries.TrainedK +
        SimilarityQueries.PqM.toLong * SimilarityQueries.PqK)
  }
}
