package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Declared CHECK-style write-time constraints (r15, VERDICT r14 #6):
  * dq_scorecard measures completeness/uniqueness/freshness AFTER the
  * fact — this closes the loop by ENFORCING declared row predicates at
  * write time, with QUARANTINE-instead-of-reject (the deadletter
  * discipline): a violating row never reaches the table, never kills
  * the batch, and never disappears — it lands in the quarantine path
  * with the violated constraint's name and the batch id as its audit
  * row, while the clean remainder merges normally.
  *
  * Semantics are SQL-standard CHECK: a constraint is violated only when
  * its expression evaluates FALSE — NULL/unknown PASSES (callers that
  * want required-field semantics spell `coalesce(expr, false)`).
  * REMOVE events carry no image and are never checked (a delete cannot
  * violate a row predicate). Expressions evaluate over the canonical
  * CDC columns (`keys`, `eventName`, `sequenceNumber`, `newImage`) —
  * image fields via `get_json_object(newImage, '$.field')`, the
  * projected-column idiom.
  *
  * Declarations persist as a `_CONSTRAINTS` metadata file next to the
  * table (tab-separated name\texpr; tmp-write + OVERWRITE-rename — the
  * SnapshotProjectedColumns crash-safety discipline), so every writer
  * of the target enforces the same contract. [[declare]] ANALYZES each
  * expression against the canonical schema first: a typo'd constraint
  * fails loudly at declaration, not silently at enforcement (the
  * invalid-condition lesson from conditional writes).
  *
  * Reference anchor: the reference applies items unconditionally
  * (`app/lambdas/lambda-backfill/main.py:41-46`) and parks failures in
  * a DLQ (`cdk/lib/cdk-stack.ts:52-63`) — quarantine-not-reject is the
  * same posture lifted to declared data-quality predicates.
  */
object TableConstraints {

  final case class Check(name: String, expr: String)

  private val FileName = "_CONSTRAINTS"

  def read(conf: Configuration, dir: String): Seq[Check] = {
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Nil
    else {
      val in = fs.open(p)
      val txt =
        try {
          val len = fs.getFileStatus(p).getLen.toInt
          val buf = new Array[Byte](len)
          in.readFully(buf)
          new String(buf, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
      txt.linesIterator.filter(_.nonEmpty).map { line =>
        val Array(n, e) = line.split("\t", 2)
        Check(n, e)
      }.toSeq
    }
  }

  /** Declare (replace) the target's constraint set. Validates loudly:
    * names unique and non-empty, and every expression must ANALYZE as a
    * boolean over the canonical CDC schema.
    */
  def declare(spark: SparkSession, dir: String, checks: Seq[Check]): Unit = {
    require(checks.forall(_.name.nonEmpty), "constraint names must be non-empty")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate constraint names: ${checks.map(_.name).mkString(", ")}")
    // Names may contain neither tab NOR newline (and exprs no newline):
    // a '\n' in a name would serialize as a corrupt _CONSTRAINTS line
    // that read() only crashes on inside a later micro-batch — the
    // fail-at-enforcement inversion this method exists to prevent.
    require(checks.forall(c => !c.name.exists(ch => ch == '\t' || ch == '\n'
        || ch == '\r') && !c.expr.exists(ch => ch == '\n' || ch == '\r')),
      "constraint names must not contain tabs or line breaks; " +
        "expressions must be single-line")
    val probe = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "keys STRING, eventName STRING, sequenceNumber STRING, newImage STRING"))
    checks.foreach { c =>
      val dt = try probe.select(expr(c.expr)).schema.head.dataType
      catch {
        case e: Throwable => throw new IllegalArgumentException(
          s"constraint '${c.name}' does not analyze over the canonical CDC " +
            s"schema: ${e.getMessage}", e)
      }
      require(dt == org.apache.spark.sql.types.BooleanType,
        s"constraint '${c.name}' must be BOOLEAN, got ${dt.catalogString}")
    }
    val conf = spark.sessionState.newHadoopConf()
    val dst = new Path(dir, FileName)
    val fs = dst.getFileSystem(conf)
    fs.mkdirs(new Path(dir))
    fs.listStatus(new Path(dir)).foreach { st =>
      if (st.isFile && st.getPath.getName.startsWith(s"$FileName.tmp-"))
        fs.delete(st.getPath, false)
    }
    val tmp = new Path(dir,
      s"$FileName.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(checks.map(c => s"${c.name}\t${c.expr}").mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.makeQualified(dst).toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(dst),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** First violated constraint's name per row, NULL when the row passes.
    * SQL-standard CHECK (FALSE violates, NULL passes); REMOVEs skipped.
    */
  def violationCol(checks: Seq[Check]): Column =
    checks.foldLeft(lit(null).cast("string")) { (acc, c) =>
      coalesce(acc,
        when(col("eventName") =!= graft.model.CdcSchema.Remove &&
          !coalesce(expr(c.expr), lit(true)), lit(c.name)))
    }
}
