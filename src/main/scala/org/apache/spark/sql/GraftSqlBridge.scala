package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions — the same
  * hooks Spark's own `functions` object uses. Spark 4 wraps Columns in
  * ColumnNodes, so third-party native expressions need this one seam to
  * surface as Columns; everything else in graft stays outside Spark's
  * namespace.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** localCheckpoint with REPLACED statistics. `Dataset.localCheckpoint`
    * copies the source plan's ESTIMATED Statistics onto the resulting
    * LogicalRDD (`originStats`) — in a checkpoint-per-round loop those
    * estimates COMPOUND (each round's join multiplies the previous
    * round's products), the BigInteger bit-length grows geometrically,
    * and SizeInBytesOnlyStatsPlanVisitor turns planning cost exponential
    * in the round index (measured: 34 s of driver BigInteger.multiply by
    * round 9 of graft's SCC loop on ~600-row frames). This seam
    * re-wraps the SAME checkpointed InternalRow RDD in a fresh
    * LogicalRDD whose stats are the caller's HONEST figures (row count ×
    * bytes/row) — constant-size stats per round, and the planner still
    * sees a truthful size (small frames broadcast at plan time; at real
    * scale the same caller passes its real count and gets the
    * sort-merge plan). Falls back to a plain eager localCheckpoint if
    * the checkpointed plan is not the expected LogicalRDD shape.
    */
  def localCheckpointWithStats(df: Dataset[Row], rows: Long,
                               bytesPerRow: Long = 48L): Dataset[Row] =
    rewrapWithStats(df.localCheckpoint(true), rows, bytesPerRow)

  /** Stats-reset for a Dataset that is ALREADY checkpointed: re-wraps
    * its LogicalRDD with fresh honest stats WITHOUT re-checkpointing —
    * a caller that needed the materialization anyway (e.g. for a
    * convergence count) must not pay a second cached RDD copy and an
    * extra job per round. No-op passthrough when the plan is not a
    * LogicalRDD.
    */
  def rewrapWithStats(df: Dataset[Row], rows: Long,
                      bytesPerRow: Long = 48L): Dataset[Row] = {
    val c = df.asInstanceOf[classic.Dataset[Row]]
    c.queryExecution.analyzed match {
      case lr: execution.LogicalRDD =>
        val stats = catalyst.plans.logical.Statistics(
          sizeInBytes = BigInt(math.max(1L, rows) * math.max(1L, bytesPerRow)),
          rowCount = Some(BigInt(math.max(0L, rows))))
        val fresh = execution.LogicalRDD(lr.output, lr.rdd,
          lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
          lr.stream)(c.sparkSession, Some(stats), None)
        classic.Dataset.ofRows(c.sparkSession, fresh)
      case _ => c
    }
  }
}
