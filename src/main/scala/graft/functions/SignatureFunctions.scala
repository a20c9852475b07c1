package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared constants of the signature pipelines — referenced by BOTH the
  * native expressions below and the DuckDB oracle SQL builders in
  * `analytics.DedupQueries`, so the two engines stay bit-identical by
  * construction.
  */
object SignatureConstants {
  /** 40-bit mask: every hash/product is truncated into [0, 2^40). */
  val Mask40: Long = (1L << 40) - 1

  /** Universal-hash multipliers for the 12 minhash permutations:
    * h_p(x) = (A(p) * x) & Mask40.
    */
  val MinHashA: Seq[Long] = Seq(
    999983L, 999979L, 999961L, 999959L, 999953L, 999931L,
    999917L, 999907L, 999883L, 999863L, 999841L, 999809L)

  /** Adjacent-word combiners for bigram/shingle hashes. */
  val C1 = 1000003L
  val C2 = 1500007L
  val C3 = 2000003L
}

/** 12 minhash minima over a shingle-hash array, one compiled loop:
  * out(p) = min over x in hs of (MinHashA(p) * x) & Mask40, with the
  * sentinel 2^40 for an empty input. Semantics identical to the SQL fold
  * `aggregate(hs, [2^40]*12, (acc, x) -> zip_with(acc, A, (m, a) ->
  * least(m, (a*x) & mask)))` (spec-asserted) — but the fold is evaluated
  * interpreted, allocating a fresh 12-array and dispatching 12 lambdas
  * PER SHINGLE; here the 12 minima live in one array updated in place.
  * CodegenFallback: the win is the compiled loop in eval, not fusion.
  */
case class MinHash12(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import SignatureConstants._

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash12"

  private val a: Array[Long] = MinHashA.toArray

  override def nullSafeEval(in: Any): Any = {
    val hs = in.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = Array.fill[Long](12)(Mask40 + 1)
    var i = 0
    while (i < n) {
      // skip null elements — the same outcome as the SQL fold, where
      // least(m, (a*NULL)&mask) = least(m, NULL) keeps m
      if (!hs.isNullAt(i)) {
        val x = hs.getLong(i)
        var p = 0
        while (p < 12) {
          val v = (a(p) * x) & Mask40
          if (v < out(p)) out(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash12 =
    copy(child = newChild)
}

/** Distinct word-3-gram shingle hashes from a word-hash array, one
  * compiled loop: h_j = (ws(j)*C1 + ws(j+1)*C2 + ws(j+2)*C3) & Mask40
  * for each consecutive triple, deduplicated preserving FIRST occurrence
  * (the same order contract as `array_distinct(transform(...))`, which
  * this replaces — that formulation dispatched an interpreted lambda per
  * shingle and then re-scanned for distinctness). Fewer than 3 words →
  * empty array (the SQL form relied on a size>=3 pre-filter because
  * sequence(1, n) with n < 1 DESCENDS).
  */
case class ShingleHash40(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import SignatureConstants._

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash40"

  override def nullSafeEval(in: Any): Any = {
    // null word hashes are dropped BEFORE windowing (a null token is
    // absent, not a garbage 0-slot); shingles form over the survivors
    val ws = SignatureFunctions.compactNonNull(in.asInstanceOf[ArrayData])
    val n = ws.length
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n - 2)
    var k = 0
    var j = 0
    while (j < n - 2) {
      val h = (ws(j) * C1 + ws(j + 1) * C2 + ws(j + 2) * C3) & Mask40
      if (seen.add(h)) { out(k) = h; k += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash40 =
    copy(child = newChild)
}

/** 32-bit SimHash over word-bigram hashes, packed into one LONG, one
  * compiled loop: bigram hash h_i = (ws(i)*C1 + ws(i+1)*C2) & Mask40 for
  * consecutive word-hash pairs; each h votes +1/-1 on 32 bit counters;
  * bit j of the result is set iff counter j ends positive. Identical to
  * the SQL formulation (transform to bigram hashes, aggregate with a
  * 32-counter zip_with, pack) — which allocated a 32-array per bigram.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import SignatureConstants._

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(in: Any): Any = {
    // null word hashes dropped before bigram windowing (see ShingleHash40)
    val ws = SignatureFunctions.compactNonNull(in.asInstanceOf[ArrayData])
    val n = ws.length
    val counters = new Array[Int](32)
    var i = 0
    while (i < n - 1) {
      val h = (ws(i) * C1 + ws(i + 1) * C2) & Mask40
      var j = 0
      while (j < 32) {
        counters(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (counters(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SignatureFunctions {
  /** Long elements of `a` with nulls dropped (ArrayData.getLong on a null
    * slot reads garbage — the signatures treat a null token as absent).
    */
  private[functions] def compactNonNull(a: ArrayData): Array[Long] = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { out(k) = a.getLong(i); k += 1 }
      i += 1
    }
    if (k == n) out else java.util.Arrays.copyOf(out, k)
  }

  /** Column API for [[MinHash12]]. */
  def minHash12(c: Column): Column =
    GraftSqlBridge.column(MinHash12(GraftSqlBridge.expression(c)))

  /** Column API for [[SimHash32]]. */
  def simHash32(c: Column): Column =
    GraftSqlBridge.column(SimHash32(GraftSqlBridge.expression(c)))

  /** Column API for [[ShingleHash40]]. */
  def shingleHash40(c: Column): Column =
    GraftSqlBridge.column(ShingleHash40(GraftSqlBridge.expression(c)))

  /** SQL registration entries (see [[graft.GraftExtensions]]). */
  val minHash12Descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("minhash12"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[MinHash12].getName, "minhash12"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "minhash12 takes exactly 1 argument")
      MinHash12(children.head)
    })

  val simHash32Descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("simhash32"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[SimHash32].getName, "simhash32"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "simhash32 takes exactly 1 argument")
      SimHash32(children.head)
    })

  val shingleHash40Descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_hash40"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[ShingleHash40].getName, "shingle_hash40"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "shingle_hash40 takes exactly 1 argument")
      ShingleHash40(children.head)
    })
}
