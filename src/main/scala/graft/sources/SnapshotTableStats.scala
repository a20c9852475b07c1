package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.SnapshotStore

/** ANALYZE-style table statistics for graft-snapshot tables (r13,
  * VERDICT r12 #4): the engine computes column profiles and histograms
  * as QUERIES (`profile_columns`, `profile_equidepth_hist`), but
  * Spark's planner never saw them — a V2 relation's only signal was
  * the segment-file byte sum, which OVERCOUNTS the resolved state by
  * the whole superseded-row history (an LWW chain of 20 generations
  * reports ~20× its live size, and a broadcastable dimension
  * sort-merges). `analyze` measures the RESOLVED state once —
  * row count, in-memory byte estimate, and per-column NDV / null count
  * / min / max in ONE aggregate pass over the V2 read face (projected
  * columns included) — and persists it as a `_STATS` meta file, pinned
  * to the manifest version it measured. [[SnapshotScan]] serves these
  * through `SupportsReportStatistics` (numRows + columnStats + the
  * honest sizeInBytes) ONLY while the pinned version is still the
  * scan's version: any write invalidates the stats rather than serving
  * a stale row count (classic ANALYZE staleness, but fail-safe —
  * degraded back to file-size stats, never wrong).
  *
  * SQL face: `CALL graft.system.analyze('ns.t')` through the V2
  * ProcedureCatalog (Spark's own `ANALYZE TABLE` statement does not
  * route to v2 catalogs).
  *
  * min/max are recorded in `_STATS` for numeric projected columns (for
  * operators and debugging) but deliberately NOT reported through the
  * connector columnStats API — NDV and null count are the
  * join-selectivity inputs, and min/max would have to round-trip
  * Catalyst's internal value types to be safe.
  */
object SnapshotTableStats {
  private val FileName = "_STATS"
  private val NumericTypes = Set("bigint", "int", "double")

  final case class ColStat(name: String, typ: String, ndv: Long, nulls: Long,
                           min: Option[String], max: Option[String])
  final case class TableStats(version: String, rows: Long, bytes: Long,
                              cols: Seq[ColStat])

  /** Measure the resolved state and persist `_STATS` (atomic
    * overwrite-rename, the `_COLUMNS` discipline). One aggregate pass;
    * NDV is EXACT (count_distinct) — ANALYZE is control-plane cadence
    * and an approximate NDV would make broadcast decisions depend on
    * sketch error.
    */
  def analyze(spark: SparkSession, dir: String): TableStats = {
    val version = SnapshotStore.pointerValue(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"ANALYZE: '$dir' has no committed version to measure"))
    val df = spark.read.format("graft-snapshot").load(dir)
    val fields = df.schema.fields.toSeq
    // in-memory size estimate of the resolved rows: octet lengths for
    // strings, 8 B for fixed-width scalars, + 16 B/row object overhead
    val rowBytes = fields.map { f =>
      if (f.dataType.catalogString == "string")
        coalesce(octet_length(col(f.name)).cast("long"), lit(0L))
      else lit(8L)
    }.reduce(_ + _) + lit(16L)
    val aggs = Seq(count(lit(1)).as("n"), sum(rowBytes).as("bytes")) ++
      fields.flatMap { f =>
        val base = Seq(
          count_distinct(col(f.name)).as(s"ndv_${f.name}"),
          count(col(f.name)).as(s"nn_${f.name}"))
        if (NumericTypes.contains(f.dataType.catalogString))
          base ++ Seq(min(col(f.name)).cast("string").as(s"mn_${f.name}"),
            max(col(f.name)).cast("string").as(s"mx_${f.name}"))
        else base
      }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = r.getLong(r.fieldIndex("n"))
    val bytes = if (r.isNullAt(r.fieldIndex("bytes"))) 0L
      else r.getLong(r.fieldIndex("bytes"))
    val cols = fields.map { f =>
      def opt(n: String): Option[String] =
        if (!r.schema.fieldNames.contains(n) || r.isNullAt(r.fieldIndex(n)))
          None
        else Some(r.getString(r.fieldIndex(n)))
      ColStat(f.name, f.dataType.catalogString,
        ndv = r.getLong(r.fieldIndex(s"ndv_${f.name}")),
        nulls = rows - r.getLong(r.fieldIndex(s"nn_${f.name}")),
        min = opt(s"mn_${f.name}"), max = opt(s"mx_${f.name}"))
    }
    val stats = TableStats(version, rows, bytes, cols)
    write(spark.sessionState.newHadoopConf(), dir, stats)
    stats
  }

  private def write(conf: Configuration, dir: String, st: TableStats): Unit = {
    val dst = new Path(dir, FileName)
    val fs = dst.getFileSystem(conf)
    fs.listStatus(new Path(dir)).foreach { s =>
      if (s.isFile && s.getPath.getName.startsWith(s"$FileName.tmp-"))
        fs.delete(s.getPath, false)
    }
    val tmp = new Path(dir,
      s"$FileName.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val lines = Seq(s"version\t${st.version}",
      s"table\t${st.rows}\t${st.bytes}") ++
      st.cols.map(c => s"col\t${c.name}\t${c.typ}\t${c.ndv}\t${c.nulls}" +
        s"\t${c.min.getOrElse("")}\t${c.max.getOrElse("")}")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.makeQualified(dst).toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(dst),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  def read(conf: Configuration, dir: String): Option[TableStats] = {
    val p = new Path(dir, FileName)
    try {
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val txt =
        try {
          val len = fs.getFileStatus(p).getLen.toInt
          val buf = new Array[Byte](len)
          in.readFully(buf)
          new String(buf, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
      val lines = txt.linesIterator.filter(_.nonEmpty).toSeq
      val version = lines.collectFirst {
        case l if l.startsWith("version\t") => l.split("\t", 2)(1)
      }.getOrElse(return None)
      val (rows, bytes) = lines.collectFirst {
        case l if l.startsWith("table\t") =>
          val a = l.split("\t"); (a(1).toLong, a(2).toLong)
      }.getOrElse(return None)
      val cols = lines.filter(_.startsWith("col\t")).map { l =>
        val a = l.split("\t", 7)
        ColStat(a(1), a(2), a(3).toLong, a(4).toLong,
          if (a.length > 5 && a(5).nonEmpty) Some(a(5)) else None,
          if (a.length > 6 && a(6).nonEmpty) Some(a(6)) else None)
      }
      Some(TableStats(version, rows, bytes, cols))
    } catch { case _: Exception => None } // malformed/unreadable: no stats
  }
}
