package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Distinct intersection of two SORTED-ascending `array<bigint>` columns
  * as a native Catalyst expression with whole-stage codegen — the
  * triangle engine's hot kernel (`|out(u) ∩ out(v)|` once per oriented
  * edge, with the element list consumed by the per-node count explode).
  *
  * Built-in `array_intersect` is sortedness-blind: per ROW it builds a
  * hash set of one side, probes the other, and tracks seen-output
  * elements through `OpenHashSet` — two hashed passes plus allocation
  * churn inside the tightest loop of the whole suite. When both inputs
  * arrive sorted (the adjacency arrays are `sort_array`ed ONCE at build,
  * then hit this kernel |E| times), a two-pointer merge does it in one
  * linear pass with zero hashing: the classic sorted-posting-list
  * intersection from IR engines.
  *
  * Contract (enforced by the producer, not re-checked per row): inputs
  * sorted ascending, null-free elements. Output = ascending distinct
  * common elements — exactly `array_intersect`'s result for such inputs
  * (its output order is first-occurrence-in-left = ascending here;
  * duplicate runs are skipped the way its seen-set dedups).
  */
case class SortedIntersectLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // containsNull=true is rejected at analysis time: the two-pointer merge
    // reads elements with getLong, which would silently decode a null slot
    // as 0L. This function is session-registered SQL, so arbitrary callers
    // (not just the null-free adjacency builders) can reach it — an
    // analysis-time failure beats a silent wrong answer.
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, false) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments with non-nullable " +
        s"elements (a null element would silently read as 0), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    val buf = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else {
        if (k == 0 || buf(k - 1) != xi) { buf(k) = xi; k += 1 }
        i += 1; j += 1
      }
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(buf, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      val buf = ctx.freshName("buf")
      s"""
        final int $na = $a.numElements();
        final int $nb = $b.numElements();
        final long[] $buf = new long[java.lang.Math.min($na, $nb)];
        int $i = 0; int $j = 0; int $k = 0;
        while ($i < $na && $j < $nb) {
          final long $xi = $a.getLong($i);
          final long $yj = $b.getLong($j);
          if ($xi < $yj) { $i++; }
          else if ($xi > $yj) { $j++; }
          else {
            if ($k == 0 || $buf[$k - 1] != $xi) { $buf[$k] = $xi; $k++; }
            $i++; $j++;
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          java.util.Arrays.copyOf($buf, $k));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectLong =
    copy(left = newLeft, right = newRight)
}

object ArraySetFunctions {
  /** Column API for [[SortedIntersectLong]]. */
  def sortedIntersectLong(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectLong(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** SQL registration entry (see [[graft.GraftExtensions]]). */
  val sortedIntersectLongDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_long"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[SortedIntersectLong].getName, "sorted_intersect_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "sorted_intersect_long takes exactly 2 arguments")
      SortedIntersectLong(children(0), children(1))
    })
}
