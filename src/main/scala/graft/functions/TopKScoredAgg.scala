package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** [[TopKPairsAgg]] for DOUBLE scores: keeps the k largest (score, id)
  * pairs per group, ordered score DESC then id ASC. Ordering uses
  * `java.lang.Double.compare` — the same total order Spark's window
  * sort applies to a double column — so swapping a `row_number` window
  * for this aggregate cannot change which rows are emitted, only how
  * they travel: an O(k) buffer with map-side combine instead of every
  * scored candidate crossing the shuffle into |groups| partitions
  * (for ANN top-k, |probes| partitions — both a volume and a skew fix).
  */
class TopKScoredAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1)

  // score DESC, id ASC — java.lang.Double.compare, as the window sort
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length >= k && !lt(in, buf.last)) buf
    else {
      val (pre, post) = buf.span(lt(_, in))
      (pre ++ (in +: post)).take(k)
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val out = Seq.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && lt(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
