package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact mergeable distinct-count sketch for BOUNDED integer domains
  * (SURVEY §2.10): a fixed bitmap whose buffers merge by bitwise OR.
  * OR is associative, commutative, and IDEMPOTENT, so map-side combine,
  * re-aggregation over any grouping, and duplicate delivery are all
  * exact — the bitmap-index idea in its simplest layout (a production
  * variant compresses runs, roaring-style; the merge algebra is
  * identical). The finish is the population count. Out-of-domain values
  * fail loudly: silently masking them would undercount, and a bounded
  * domain is the operator's declared contract (dense surrogate keys,
  * enum ids, partition ordinals).
  */
class BitmapDistinctAgg(capacity: Int)
    extends Aggregator[Long, Array[Long], Long] {
  require(capacity > 0, s"capacity must be positive, got $capacity")
  private val words = (capacity + 63) >>> 6

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    require(v >= 0 && v < capacity,
      s"value $v outside the declared bitmap domain [0, $capacity)")
    buf((v >>> 6).toInt) |= 1L << (v & 63)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < words) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]()
}

/** [[BitmapDistinctAgg]]'s raw-bitmap sibling: finishes with the bitmap
  * itself instead of its population count, so downstream SET ALGEBRA
  * stays exact — intersect/union distinct sets via `zip_with` AND/OR on
  * the word arrays (the theta-sketch use case, exact on the bounded
  * domain). Same OR-merge buffer, same loud out-of-domain failure.
  */
class BitmapAgg(capacity: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  private val inner = new BitmapDistinctAgg(capacity)
  override def zero: Array[Long] = inner.zero
  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    inner.reduce(buf, v)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    inner.merge(a, b)
  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
