package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Pack an `array<bigint>` of 8-bit codes (each in [0, 255]) into a
  * BINARY column — one byte per element. The SQ8 index layout: a
  * 64-dim quantized vector stores as 64 bytes instead of the 512-byte
  * long-array form, the 8× that decides whether a 100 TB corpus's
  * vector index fits the cluster's memory. Out-of-range elements FAIL
  * LOUDLY — a silent mask would corrupt similarity scores downstream.
  */
case class VecPackU8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "vec_pack_u8"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = x.getLong(i)
      if ((v & ~255L) != 0L)
        throw new IllegalArgumentException(
          s"vec_pack_u8: element $i = $v outside [0, 255]")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
        final int $n = $a.numElements();
        final byte[] $out = new byte[$n];
        for (int $i = 0; $i < $n; $i++) {
          final long $v = $a.getLong($i);
          if (($v & ~255L) != 0L)
            throw new IllegalArgumentException(
              "vec_pack_u8: element " + $i + " = " + $v + " outside [0, 255]");
          $out[$i] = (byte) $v;
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): VecPackU8 =
    copy(child = newChild)
}

/** Exact integer dot product of a U8-packed code vector (BINARY, one
  * unsigned byte per dimension) against an `array<bigint>` — the SQ8
  * approximate-scan kernel: the scan side touches only the 64-byte
  * packed codes, the probe side rides as a precomputed long array.
  * Tight primitive loop under whole-stage codegen, same tier as
  * [[VecDotLong]].
  */
case class VecDotU8Long(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, array<bigint>), got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_u8_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.length, y.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += (x(i) & 0xFF).toLong * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        final int $n = java.lang.Math.min($a.length, $b.numElements());
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $s += (long) ($a[$i] & 0xFF) * $b.getLong($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotU8Long =
    copy(left = newLeft, right = newRight)
}

/** Inverse of [[VecPackU8]]: a U8-packed BINARY column back to
  * `array<bigint>` of its unsigned byte values. The PQ index read path:
  * persisted 8-byte PQ codes unpack to the M codeword ids the ADC
  * lookup indexes with — a per-row primitive loop under whole-stage
  * codegen, so reading the packed store costs no more than storing the
  * array form would.
  */
case class VecUnpackU8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_unpack_u8"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val out = new Array[Long](x.length)
    var i = 0
    while (i < x.length) { out(i) = (x(i) & 0xFF).toLong; i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
        final long[] $out = new long[$a.length];
        for (int $i = 0; $i < $a.length; $i++) {
          $out[$i] = (long) ($a[$i] & 0xFF);
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): VecUnpackU8 =
    copy(child = newChild)
}

object PackedVectorFunctions {
  /** Column API for [[VecPackU8]]. */
  def vecPackU8(a: Column): Column =
    GraftSqlBridge.column(VecPackU8(GraftSqlBridge.expression(a)))

  /** Column API for [[VecUnpackU8]]. */
  def vecUnpackU8(a: Column): Column =
    GraftSqlBridge.column(VecUnpackU8(GraftSqlBridge.expression(a)))

  /** Column API for [[VecDotU8Long]]. */
  def vecDotU8Long(packed: Column, arr: Column): Column =
    GraftSqlBridge.column(VecDotU8Long(
      GraftSqlBridge.expression(packed), GraftSqlBridge.expression(arr)))

  val vecPackU8Descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("vec_pack_u8"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[VecPackU8].getName, "vec_pack_u8"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "vec_pack_u8 takes exactly 1 argument")
      VecPackU8(children.head)
    })

  val vecDotU8LongDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot_u8_long"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[VecDotU8Long].getName, "vec_dot_u8_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "vec_dot_u8_long takes exactly 2 arguments")
      VecDotU8Long(children(0), children(1))
    })
}
