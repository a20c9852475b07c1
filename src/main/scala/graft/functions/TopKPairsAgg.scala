package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable bounded top-k aggregator (SURVEY §2.10 family): keeps the k
  * largest (score, id) pairs per group, ordered score DESC then id ASC
  * (a TOTAL order, so the result is a deterministic set and ties cannot
  * flip between runs or engines).
  *
  * This is per-group top-k WITHOUT a window: a window formulation sorts
  * every group's full row set through one shuffle; this aggregate keeps
  * an O(k) buffer per group with MAP-SIDE COMBINE, so only ≤ k pairs per
  * group per partition cross the wire — at a 100 TB fact table with
  * bounded group cardinality that is the difference between shuffling
  * the table and shuffling k·|groups| rows. Merge is a bounded sorted
  * merge (associative + commutative), so partial aggregation and any
  * re-aggregation are exact — the same property that makes the MinHash
  * and Misra–Gries sketches usable as distributed state.
  */
class TopKPairsAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1)

  // score DESC, id ASC
  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Nil

  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    if (buf.length >= k && !lt(in, buf.last)) buf // below the bar: O(1) reject
    else {
      val (pre, post) = buf.span(lt(_, in))
      (pre ++ (in +: post)).take(k)
    }

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    // bounded merge of two sorted buffers
    val out = Seq.newBuilder[(Long, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && lt(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
