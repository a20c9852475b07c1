package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<bigint>` columns as a native
  * Catalyst expression WITH whole-stage codegen.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, ...), ...)`) evaluates
  * interpreted lambdas per element — fine for map-stage columns, but the
  * dot product sits inside pairwise similarity joins where it runs once
  * per CANDIDATE PAIR. The generated code is a tight primitive loop over
  * the two UnsafeArrayData buffers: no lambda dispatch, no boxing, no
  * per-element null checks (vectors are engine-produced and never hold
  * null elements — enforced upstream by the quantization step).
  *
  * Preference order per SURVEY §2.10: built-in functions, then a native
  * `Expression` with `doGenCode` — this is the first operator hot enough
  * to justify the second tier.
  */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getLong($i) * $b.getLong($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for [[VecDotLong]]. */
  def vecDotLong(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecDotLong(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** SQL registration entry for [[VecDotLong]] (see [[graft.GraftExtensions]]). */
  val vecDotLongDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot_long"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[VecDotLong].getName, "vec_dot_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "vec_dot_long takes exactly 2 arguments")
      VecDotLong(children(0), children(1))
    })
}
