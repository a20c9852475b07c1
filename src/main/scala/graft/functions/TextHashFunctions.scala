package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-word 40-bit hashes of a space-separated text, as one native
  * expression: split + md5 + truncate run in a single compiled loop with
  * one thread-local MessageDigest — no per-word lambda dispatch, no hex
  * round-trip, no intermediate string arrays.
  *
  * Bit-for-bit equal to the SQL formulation
  * `transform(split(text, ' '), w -> cast(conv(substring(md5(w), 1, 10), 16, 10) as bigint))`
  * (spec-asserted): the value is the first 5 md5 bytes of the word's
  * UTF-8 encoding, big-endian unsigned. Split matches Spark's
  * `split(text, ' ')` (regex, limit -1: trailing empties kept).
  *
  * This is the shared front of every signature pipeline (minhash,
  * simhash, fingerprint) — the measured hot spot once the folds became
  * arithmetic. CodegenFallback is fine here: the win is the compiled
  * loop inside eval, not expression fusion.
  */
case class WordHash40(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_hash40"

  override def nullSafeEval(in: Any): Any = {
    val words = in.asInstanceOf[UTF8String].toString.split(" ", -1)
    val md = WordHash40.digest.get()
    val out = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      md.reset()
      val h = md.digest(words(i).getBytes(StandardCharsets.UTF_8))
      out(i) = (h(0) & 0xffL) << 32 | (h(1) & 0xffL) << 24 |
        (h(2) & 0xffL) << 16 | (h(3) & 0xffL) << 8 | (h(4) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordHash40 =
    copy(child = newChild)
}

object WordHash40 {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}

object TextHashFunctions {
  /** Column API for [[WordHash40]]. */
  def wordHash40(c: Column): Column =
    GraftSqlBridge.column(WordHash40(GraftSqlBridge.expression(c)))

  /** SQL registration entry (see [[graft.GraftExtensions]]). */
  val wordHash40Descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("word_hash40"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[WordHash40].getName, "word_hash40"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "word_hash40 takes exactly 1 argument")
      WordHash40(children.head)
    })
}
