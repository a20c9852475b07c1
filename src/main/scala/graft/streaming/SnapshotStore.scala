package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.CdcOps

/** Bucket-manifest snapshot table — the streaming apply target, scaled.
  *
  * The reference's apply path is `batch_write_item`: key-addressed writes
  * whose cost is O(batch), never O(table)
  * (app/lambdas/lambda-backfill/main.py:44-46). The round-3 sink modeled
  * the table as ONE parquet snapshot rewritten per micro-batch — O(|target|)
  * per 5-second batch, the scale-killer at a 100 TB target. This store
  * restores the reference's cost model with copy-on-write at BUCKET
  * granularity:
  *
  * {{{
  * targetDir/
  *   _CURRENT                      # names the live manifest file (the commit)
  *   manifest-<batch>-<nonce>      # "v1 buckets=N" + lines "<bucket>\t<relpath>"
  *   data-<batch>-<nonce>/         # one publish's parquet output
  *     __bucket=K/part-*.parquet   # one key-range bucket of the table
  * }}}
  *
  * A row lives in bucket `pmod(xxhash64(keys), N)`. A micro-batch merge
  * reads ONLY the buckets its delta touches, merges, rewrites those buckets
  * into a fresh `data-*` dir, and publishes a manifest that references the
  * new dirs for touched buckets and the PRIOR manifest's dirs — by name,
  * no copy — for everything else. Per-batch I/O is O(|delta| + |touched
  * buckets|), so at 1000 executors the sink keeps up with the stream
  * regardless of accumulated table size (with N sized so one bucket fits a
  * task: ~4096 buckets for 100 TB ≈ 25 GB/bucket; N is recorded in the
  * manifest, so readers and subsequent merges always agree).
  *
  * All paths go through `org.apache.hadoop.fs.FileSystem` — the store runs
  * unchanged on file:// and hdfs:// (HDFS rename IS atomic). Publication:
  *
  *  1. write the new data dir (crash here: garbage, GC'd later; the live
  *     manifest never referenced it)
  *  2. write the new manifest file (same: unreferenced until the swap)
  *  3. COMMIT = atomic rename of a temp pointer over `_CURRENT`
  *     (`FileContext.rename(OVERWRITE)`), guarded by a compare-and-swap:
  *     the pointer is re-read under the store's per-target lock and must
  *     still name the manifest this write was BASED on, else the publish
  *     aborts with `ConcurrentModificationException` (caller retries from
  *     the new basis). The lock serializes sink batches and compaction in
  *     one JVM; the CAS makes a cross-JVM racer fail loudly instead of
  *     silently reverting a committed batch. (A pure object store with no
  *     atomic rename would need a conditional-put for step 3; HDFS and
  *     POSIX are covered.)
  *
  * GC is pointer-derived, never recency-derived: after a successful swap,
  * everything not referenced by the NEW manifest or the manifest that was
  * live just before it (the grace window for in-flight readers) is deleted
  * — at `__bucket=K` granularity, because an old data dir often stays
  * partially live through reuse-by-reference.
  */
object SnapshotStore {

  /** Pointer file naming the live manifest of a target. */
  val CurrentPointer = "_CURRENT"

  /** Partition column used for the bucket layout (dropped on read). */
  val BucketCol = "__bucket"

  /** Default bucket count — matches local shuffle parallelism; a 100 TB
    * target wants ~4096 (see class doc). Fixed at table creation and
    * recorded in the manifest.
    */
  val DefaultBuckets = 32

  /** bucket -> data path relative to targetDir (absent bucket = empty). */
  final case class Manifest(numBuckets: Int, buckets: Map[Int, String])

  /** Key-range bucket of a row: deterministic, version-stable 64-bit hash
    * (same xxhash64 the dedup pipeline uses) mod the table's bucket count.
    */
  def bucketExpr(keys: Seq[String], numBuckets: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(numBuckets.toLong)).cast("int")

  // ---------------------------------------------------------------- locking

  /** One writer at a time per target (ADVICE: a compaction racing a sink
    * publish could retire the sink's committed snapshot — lost update).
    * Keyed by the qualified path so `/t`, `/t/`, `file:/t` share a lock.
    */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lockFor(spark: SparkSession, targetDir: String): Object = {
    val p = new Path(targetDir)
    val key = p.getFileSystem(hconf(spark)).makeQualified(p).toString
    locks.computeIfAbsent(key, _ => new Object)
  }

  private def hconf(spark: SparkSession) = spark.sparkContext.hadoopConfiguration

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(hconf(spark))

  // ------------------------------------------------------------- manifest IO

  private def readFully(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeFile(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Name of the live manifest, if the pointer exists. */
  def pointerValue(spark: SparkSession, targetDir: String): Option[String] = {
    val fs = fsOf(spark, targetDir)
    val ptr = new Path(targetDir, CurrentPointer)
    if (fs.exists(ptr)) Some(readFully(fs, ptr).trim) else None
  }

  private def renderManifest(m: Manifest): String =
    (s"v1 buckets=${m.numBuckets}" +:
      m.buckets.toSeq.sortBy(_._1).map { case (b, p) => s"$b\t$p" })
      .mkString("\n")

  private def parseManifest(text: String, name: String): Manifest = {
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    val header = lines.headOption.getOrElse(
      throw new IllegalStateException(s"manifest '$name' is empty"))
    require(header.startsWith("v1 buckets="), s"manifest '$name': bad header '$header'")
    val n = header.stripPrefix("v1 buckets=").toInt
    val entries = lines.tail.map { l =>
      val Array(b, p) = l.split("\t", 2)
      b.toInt -> p
    }.toMap
    Manifest(n, entries)
  }

  /** The live (name, manifest). Fails loudly if the pointer names a missing
    * manifest: the pointer is proof prior batches committed, so an empty
    * fallback would silently drop every applied key on the next merge.
    */
  def currentManifest(spark: SparkSession, targetDir: String): Option[(String, Manifest)] =
    pointerValue(spark, targetDir).map { name =>
      val fs = fsOf(spark, targetDir)
      val mf = new Path(targetDir, name)
      if (!fs.exists(mf))
        throw new IllegalStateException(
          s"target pointer names missing snapshot manifest '$name': prior batches " +
            "committed but their metadata is gone — refusing to continue from an empty table")
      name -> parseManifest(readFully(fs, mf), name)
    }

  // ---------------------------------------------------------------- reading

  private def emptyCanonical(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("keys",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("newImage",
          org.apache.spark.sql.types.StringType))))

  /** Current target snapshot. Resolution order:
    *  1. `_CURRENT` → manifest → union of its bucket dirs (missing manifest
    *     FAILS LOUDLY; a zero-bucket manifest is the canonical empty table).
    *  2. No pointer, flat parquet files in `targetDir` → read them (a
    *     pre-seeded snapshot, e.g. the PITR restore output).
    *  3. Nothing → empty-but-schema'd frame (first batch of a fresh target).
    */
  def readTarget(spark: SparkSession, targetDir: String): DataFrame =
    currentManifest(spark, targetDir) match {
      case Some((name, m)) =>
        if (m.buckets.isEmpty) emptyCanonical(spark)
        else {
          val fs = fsOf(spark, targetDir)
          val paths = m.buckets.toSeq.sortBy(_._1).map(e => new Path(targetDir, e._2))
          paths.find(!fs.exists(_)).foreach { p =>
            throw new IllegalStateException(
              s"manifest '$name' references missing snapshot data '$p' — refusing " +
                "to continue from a partial table")
          }
          // mergeSchema: bucket dirs can span schema vintages (e.g. a
          // pre-seeded snapshot merged incrementally); footer-only cost
          spark.read.option("mergeSchema", "true").parquet(paths.map(_.toString): _*)
        }
      case None =>
        val fs = fsOf(spark, targetDir)
        val root = new Path(targetDir)
        val hasFlatParquet = fs.exists(root) &&
          fs.listStatus(root).exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        if (hasFlatParquet) spark.read.parquet(targetDir)
        else emptyCanonical(spark)
    }

  // ---------------------------------------------------------------- writing

  /** Atomic, CAS-guarded pointer swap (callers hold the target lock).
    * `basis` is the manifest name the writer read before computing — None
    * for a fresh table. A mismatch means another writer committed since;
    * aborting here is what prevents the lost-update interleaving.
    */
  private[graft] def casSwapPointer(spark: SparkSession, targetDir: String,
                                        newManifest: String, basis: Option[String]): Unit = {
    val fs = fsOf(spark, targetDir)
    val now = pointerValue(spark, targetDir)
    if (now != basis)
      throw new java.util.ConcurrentModificationException(
        s"target pointer moved ${basis.getOrElse("<none>")} -> ${now.getOrElse("<none>")} " +
          "during this write; aborting publish (retry from the new basis)")
    val tmp = new Path(targetDir, s".pointer-tmp-${System.nanoTime().toHexString}")
    writeFile(fs, tmp, newManifest)
    val fc = FileContext.getFileContext(
      fs.makeQualified(new Path(targetDir)).toUri, hconf(spark))
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(new Path(targetDir, CurrentPointer)),
      Options.Rename.OVERWRITE)
  }

  /** Delete everything not referenced by the retained manifests, at
    * bucket-subdir granularity (an old `data-*` dir stays alive as long as
    * ANY retained manifest still references one of its buckets).
    */
  private def gc(fs: FileSystem, targetDir: String, retainManifests: Set[String],
                 retainData: Set[String]): Unit = {
    val root = new Path(targetDir)
    // referenced relpaths look like "data-x/__bucket=3": group by top dir
    val liveByDir = retainData.map { rel =>
      val Array(top, sub) = rel.split("/", 2); (top, sub)
    }.groupBy(_._1).map { case (t, s) => t -> s.map(_._2) }
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && n.startsWith("manifest-") && !retainManifests.contains(n)) {
        fs.delete(st.getPath, false); ()
      } else if (st.isDirectory && n.startsWith("data-")) {
        liveByDir.get(n) match {
          case None => fs.delete(st.getPath, true); ()
          case Some(liveSubs) =>
            fs.listStatus(st.getPath)
              .filter(c => c.isDirectory && c.getPath.getName.startsWith(s"$BucketCol=") &&
                !liveSubs.contains(c.getPath.getName))
              .foreach(c => fs.delete(c.getPath, true))
        }
      }
    }
  }

  /** Write `data`'s buckets as a fresh data dir and commit a manifest of
    * `keep ++ <what materialized>`. Callers hold the target lock and pass
    * the basis their `keep` map came from.
    */
  private def publish(spark: SparkSession, targetDir: String, data: DataFrame,
                      keep: Map[Int, String], basis: Option[String],
                      batchId: Long, numBuckets: Int): Unit = {
    val fs = fsOf(spark, targetDir)
    fs.mkdirs(new Path(targetDir))
    // nonce so a retried batch never collides with its failed attempt's dir
    val nonce = System.nanoTime().toHexString
    val dataName = f"data-$batchId%012d-$nonce"
    // whole buckets per task → one file per touched bucket per publish
    data.repartition(col(BucketCol))
      .write.partitionBy(BucketCol)
      .parquet(new Path(targetDir, dataName).toString)
    // empty buckets write no dir: the manifest simply drops them
    val written = fs.listStatus(new Path(targetDir, dataName))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$BucketCol="))
      .map { s =>
        val b = s.getPath.getName.stripPrefix(s"$BucketCol=").toInt
        b -> s"$dataName/${s.getPath.getName}"
      }.toMap
    val manifest = Manifest(numBuckets, keep ++ written)
    val manifestName = f"manifest-$batchId%012d-$nonce"
    writeFile(fs, new Path(targetDir, manifestName), renderManifest(manifest))
    casSwapPointer(spark, targetDir, manifestName, basis)
    // grace window: the manifest that was live until this swap stays fully
    // readable for readers that resolved the pointer just before it
    val graceData = basis.toSeq.flatMap { b =>
      val mf = new Path(targetDir, b)
      if (fs.exists(mf)) parseManifest(readFully(fs, mf), b).buckets.values else Nil
    }
    gc(fs, targetDir,
      retainManifests = Set(manifestName) ++ basis,
      retainData = manifest.buckets.values.toSet ++ graceData)
  }

  /** Full (non-pruned) publish of `df` as the new table state — the seed /
    * compaction path. Bucket count comes from the live manifest when one
    * exists (the table's N is fixed), else `numBuckets`.
    */
  def writeTarget(df: DataFrame, targetDir: String, batchId: Long,
                  keys: Seq[String] = Seq("keys"),
                  numBuckets: Int = DefaultBuckets): Unit = {
    val spark = df.sparkSession
    lockFor(spark, targetDir).synchronized {
      val basis = currentManifest(spark, targetDir)
      val n = basis.map(_._2.numBuckets).getOrElse(numBuckets)
      publish(spark, targetDir, df.withColumn(BucketCol, bucketExpr(keys, n)),
        keep = Map.empty, basis = basis.map(_._1), batchId, n)
    }
  }

  /** A snapshot read for merging: union schemas across mixed-vintage
    * bucket dirs (footer-only cost) and backfill a missing sequence
    * column — a pre-seeded restore snapshot has no applied-sequence
    * history, so every delta outranks it.
    */
  private def mergeReady(df: DataFrame, seqCol: String): DataFrame =
    if (df.columns.contains(seqCol)) df
    else df.withColumn(seqCol, lit(null).cast("string"))

  /** The partition-pruned merge — the streaming sink's per-batch apply.
    * Reads ONLY the buckets `delta` touches, merges
    * ([[graft.ops.CdcOps.mergeLww]]: a PUT upserts and a DELETE drops the
    * key, but only when the delta's sequence outranks the target's),
    * rewrites those buckets, and re-references every untouched bucket from
    * the basis manifest. Cost is O(|delta| + |touched buckets|); an empty
    * delta publishes nothing.
    *
    * `delta` must carry `keys ++ opCol ++ seqCol ++ payload`, already
    * deduped and LWW-compacted (one row per key).
    */
  def mergeIntoTarget(spark: SparkSession, targetDir: String, delta: DataFrame,
                      batchId: Long, keys: Seq[String] = Seq("keys"),
                      opCol: String = "op", seqCol: String = "sequenceNumber",
                      payload: Seq[String] = Seq("newImage"),
                      numBuckets: Int = DefaultBuckets): Unit =
    lockFor(spark, targetDir).synchronized {
      currentManifest(spark, targetDir) match {
        case Some((basisName, m)) =>
          val n = m.numBuckets
          // delta is O(batch): checkpoint once, reuse for bucket-list + merge
          val d = delta.withColumn(BucketCol, bucketExpr(keys, n)).localCheckpoint(true)
          val touched = d.select(BucketCol).distinct() // ≤ n rows — driver-safe
            .collect().map(_.getInt(0)).toSet
          if (touched.nonEmpty) {
            val existing = touched.toSeq.sorted.flatMap(m.buckets.get)
              .map(rel => new Path(targetDir, rel).toString)
            val snapshot =
              if (existing.isEmpty)
                spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                  d.select((keys ++ (seqCol +: payload)).map(col): _*).schema)
              else spark.read.option("mergeSchema", "true").parquet(existing: _*)
            val merged = CdcOps.mergeLww(mergeReady(snapshot, seqCol),
                d.drop(BucketCol), keys, opCol, seqCol, payload)
              .withColumn(BucketCol, bucketExpr(keys, n))
            publish(spark, targetDir, merged, keep = m.buckets -- touched,
              basis = Some(basisName), batchId, n)
          }
        case None =>
          // fresh table, or a pre-seeded flat-parquet snapshot: one full
          // merge bucket-izes the seed; every later batch prunes
          val seed = mergeReady(readTarget(spark, targetDir), seqCol)
          val merged = CdcOps.mergeLww(seed, delta, keys, opCol, seqCol, payload)
            .withColumn(BucketCol, bucketExpr(keys, numBuckets))
          publish(spark, targetDir, merged, keep = Map.empty, basis = None,
            batchId, numBuckets)
      }
    }

  /** Small-files maintenance: every publish adds up to |touched| files, so
    * a long-running sink accumulates per-bucket file counts. Compaction
    * rewrites the CURRENT snapshot (all buckets, one file per bucket) and
    * publishes through the same locked CAS swap — safe to run beside the
    * sink: the lock serializes it with in-flight publishes, so the
    * interleaving that loses a committed batch cannot happen.
    */
  def compactTarget(spark: SparkSession, targetDir: String,
                    keys: Seq[String] = Seq("keys")): Unit =
    lockFor(spark, targetDir).synchronized {
      currentManifest(spark, targetDir) match {
        case None => ()
        case Some((basisName, m)) =>
          publish(spark, targetDir,
            readTarget(spark, targetDir).withColumn(BucketCol, bucketExpr(keys, m.numBuckets)),
            keep = Map.empty, basis = Some(basisName),
            batchId = -1L, m.numBuckets)
      }
    }
}
