package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.analytics.{BandIndexStore, Corpus}
import graft.streaming.SnapshotStore

/** Persisted MinHash band index (r11, VERDICT r10 item 4): the existing
  * corpus's LSH bands live in SnapshotStore targets, crawl increments
  * stream in under the FROZEN banding plan, and the maintained index is
  * indistinguishable from a batch rebuild.
  * (`dedup_incremental_persisted` holds pair-set equality with the
  * in-query formulation under the DuckDB oracle; this spec holds the
  * maintenance story — the VectorIndexSpec shape.)
  */
class BandIndexSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toFile.getAbsolutePath
  private val d = "/root/testdata/sf0.001"

  test("streamed ingest (chunked, with checkpoint resume) equals one-shot batch build") {
    val meta = tmp("bidx-meta")
    val bandsStream = tmp("bidx-bs"); val bandsBatch = tmp("bidx-bb")
    val sigsStream = tmp("bidx-ss"); val sigsBatch = tmp("bidx-sb")
    val in = tmp("bidx-in"); val ckpt = tmp("bidx-ckpt")

    val docs = Corpus.docsWithNearDups(spark, d).select("doc_id", "text")
    val existing = docs.filter(col("doc_id") % 7 =!= 0)
    // the plan freezes on the FULL corpus count — later arrivals band
    // under this plan, never re-derive it from their own size
    BandIndexStore.train(spark, Corpus.corpusDocCount(spark, d), meta)
    BandIndexStore.appendBatch(spark, existing, meta, bandsStream, 1L)
    BandIndexStore.appendBatch(spark, existing, meta, bandsBatch, 1L)
    BandIndexStore.appendSigs(spark, existing, sigsStream, 1L)
    BandIndexStore.appendSigs(spark, existing, sigsBatch, 1L)

    // reference: the new docs added in ONE batch
    val newDocs = docs.filter(col("doc_id") % 7 === 0)
    BandIndexStore.appendBatch(spark, newDocs, meta, bandsBatch, 2L)
    BandIndexStore.appendSigs(spark, newDocs, sigsBatch, 2L)

    // streamed: the same docs in 3 chunks, drained as separate
    // micro-batches, with a full stop + checkpoint resume in the middle
    val ids = newDocs.select("doc_id").collect().map(_.getLong(0)).sorted
    val (c1, rest) = ids.splitAt(ids.length / 3)
    val (c2, c3) = rest.splitAt(rest.length / 2)
    def writeChunk(chunk: Array[Long]): Unit = {
      newDocs.filter(col("doc_id").isin(chunk: _*))
        .coalesce(1).write.mode("append").parquet(in)
      Thread.sleep(5)
    }
    writeChunk(c1)
    val schema = spark.read.parquet(in).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q1 = BandIndexStore.ingestSink(stream(), meta, bandsStream, ckpt,
      sigsTarget = Some(sigsStream))
    q1.awaitTermination(120000)
    writeChunk(c2); writeChunk(c3)
    val q2 = BandIndexStore.ingestSink(stream(), meta, bandsStream, ckpt,
      sigsTarget = Some(sigsStream))
    q2.awaitTermination(120000)

    def indexRows(t: String) = BandIndexStore.readIndex(spark, t)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(indexRows(bandsStream) === indexRows(bandsBatch),
      "streamed band index diverged from the batch build")

    // the signature face of the same stream: streamed ≡ batch
    def sigRows(t: String) = BandIndexStore.readSigs(spark, t)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    assert(sigRows(sigsStream) === sigRows(sigsBatch),
      "streamed signature target diverged from the batch build")

    // probing either index finds the same candidate pairs
    val (nBands, rpb) = BandIndexStore.readMeta(spark, meta)
    val probe = BandIndexStore.bandRows(
      docs.filter(col("doc_id") >= Corpus.VariantOffset), nBands, rpb)
    def cands(t: String) = BandIndexStore.readIndex(spark, t).as("a")
      .join(probe.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .dropDuplicates()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands(bandsStream) === cands(bandsBatch))

    // LWW maintenance: a re-ingested (edited) document supersedes its
    // old band rows — the victim's bkeys change, row count per doc
    // stays at `bands`
    val victim = ids.head
    val edited = newDocs.filter(col("doc_id") === victim)
      .select(col("doc_id"),
        concat(lit("edited edited edited "), col("text")).as("text"))
    BandIndexStore.appendBatch(spark, edited, meta, bandsStream, 9L)
    val before = indexRows(bandsBatch).filter(_._1 == victim)
    val after = indexRows(bandsStream).filter(_._1 == victim)
    assert(after.size === before.size, "band row count drifted on re-ingest")
    assert(after !== before, "re-ingest did not supersede old band rows")

    // meta target is control-plane sized: exactly the one plan row
    assert(SnapshotStore.readTarget(spark, meta).count() === 1L)
  }

  test("streaming dedup serving: streamed pairs equal the batch probe over the same index") {
    val meta = tmp("bsrv-meta"); val bands = tmp("bsrv-bands")
    val sigs = tmp("bsrv-sigs")
    val in = tmp("bsrv-in"); val ckpt = tmp("bsrv-ckpt")

    val docs = Corpus.docsWithNearDups(spark, d).select("doc_id", "text")
    val existing = docs.filter(col("doc_id") < Corpus.VariantOffset)
    BandIndexStore.train(spark, Corpus.corpusDocCount(spark, d), meta)
    BandIndexStore.appendBatch(spark, existing, meta, bands, 1L)
    BandIndexStore.appendSigs(spark, existing, sigs, 1L)

    // the "crawl": variant docs stream in as two files/micro-batches
    val inc = docs.filter(col("doc_id") >= Corpus.VariantOffset)
    inc.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(in)
    inc.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val q = BandIndexStore.dedupSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in),
      meta, bands, sigs, ckpt,
      sink = df => df.select("doc_a", "doc_b", "m12").collect()
        .foreach(r => { got.add((r.getLong(0), r.getLong(1), r.getLong(2))); () }),
      minM12 = 5)
    q.awaitTermination(120000)

    val (nBands, rpb) = BandIndexStore.readMeta(spark, meta)
    val batch = BandIndexStore.probePairs(spark, inc, bands, sigs, nBands, rpb)
      .filter(col("m12") >= 5)
      .select("doc_a", "doc_b", "m12").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "planted variants must collide with their originals")
    assert(got.toArray(Array.empty[(Long, Long, Long)]).toSet === batch,
      "streamed dedup pairs diverged from the batch probe")
  }
}
