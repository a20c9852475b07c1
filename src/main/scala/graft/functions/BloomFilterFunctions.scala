package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe of a BIGINT column against a broadcast
  * [[org.apache.spark.util.sketch.BloomFilter]] (Spark's public sketch
  * API — the same filter family the engine's own runtime row-level
  * filtering uses, here surfaced as an explicit, plannable predicate).
  *
  * Why not an exact broadcast set: a benchmark/blocklist shingle
  * inventory at production scale runs to billions of distinct hashes —
  * far past broadcast limits as an exact structure, but ~1.2 bytes per
  * element in a 1% Bloom filter. The probe is a cheap O(k) bit test
  * generated INSIDE whole-stage codegen, so it prunes the exploded
  * corpus-shingle stream at the scan side, BEFORE the confirm join's
  * shuffle — the filter never changes results (false positives survive
  * the prefilter and are eliminated by the exact join; false negatives
  * do not exist), it only changes how many rows reach the join.
  */
case class BloomMightContainLong(child: Expression,
                                 filter: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.sql}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(v: Any): Any =
    filter.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // the broadcast handle rides the codegen references array; .value()
      // resolves to the executor-local cached filter, deserialized once
      val bf = ctx.addReferenceObj("bloomFilter", filter,
        classOf[Broadcast[_]].getName)
      s"""${ev.value} = ((org.apache.spark.util.sketch.BloomFilter)
         |  $bf.value()).mightContainLong($c);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFilterFunctions {

  /** `might_contain(filter, c)` as a Column predicate. */
  def bloomMightContain(filter: Broadcast[BloomFilter])(c: Column): Column =
    GraftSqlBridge.column(
      BloomMightContainLong(GraftSqlBridge.expression(c), filter))
}
