package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (SURVEY §2.10 family): depth × width counter matrix
  * whose partial buffers merge by elementwise ADDITION (associative and
  * commutative — map-side combine and re-aggregation are exact on the
  * registers; NOT idempotent, correctly so: frequency is additive, the
  * sketch counts multiset occurrences). The POINT-QUERY member of the
  * frequency-sketch family: Misra–Gries ([[FrequentItemsAgg]]) answers
  * "who is heavy", CM answers "how often is THIS key" for ANY key, with
  * the one-sided guarantee est ≥ true and E[est − true] ≤ 2·N/width per
  * row, taking the MIN over depth rows (Cormode & Muthukrishnan, J.
  * Algorithms 2005). depth·width longs of state per group versus a
  * full per-key count shuffling every (group, key) pair.
  *
  * The input is the caller-computed uniform 60-bit hash (the shared
  * md5-hex literal — both engines derive identical values, so register
  * contents and every estimate are bit-identical cross-engine). Row r's
  * index is bits [10r, 10r+10) of the hash: four 10-bit slices of one
  * md5 are as independent as CM's pairwise-hash assumption needs, and
  * the DuckDB oracle reproduces them with shifts alone. Finish returns
  * the flattened registers (row-major, width entries per row): the
  * min-over-rows point query is one deterministic expression over them,
  * kept OUT of the aggregate so downstream algebra (merging sketches
  * across time partitions) stays exact.
  */
class CountMinAgg(depth: Int, width: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(depth >= 1 && depth <= 6, s"depth must be in [1,6], got $depth")
  // width <= 1024: row r reads exactly the 10-bit slice [10r, 10r+10) of
  // the hash, so a wider power of two would overlap row r+1's slice —
  // correlated rows, and the per-row error bound E[est-true] <= 2N/width
  // no longer holds (only one-sidedness would survive)
  require(width >= 2 && width <= 1024 && (width & (width - 1)) == 0 &&
    depth * 10 <= 60,
    s"width must be a power of two in [2,1024] with depth*10 <= 60 hash bits, got $width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    require(h >= 0 && h < (1L << 60),
      s"hash $h outside the declared 60-bit domain")
    var r = 0
    while (r < depth) {
      val idx = ((h >>> (10 * r)) & (width - 1)).toInt
      buf(r * width + idx) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
