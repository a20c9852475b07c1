package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV / theta sketch (SURVEY §2.10 family): the k minimum DISTINCT
  * hash values of a set — the sketch family whose distinct estimates
  * compose under SET OPERATIONS, which neither the exact bitmap (domain
  * bound) nor HLL (union only — registers can max-merge but intersection
  * has no register algebra) can do. With h uniform on [0, 2^w):
  *
  *   - distinct estimate: (k−1)·2^w div R, R = the kth minimum
  *     (Bar-Yossef et al., Counting distinct elements in a data stream,
  *     RANDOM 2002; Beyer et al., On synopses for distinct-value
  *     estimation under multiset operations, SIGMOD 2007),
  *   - union: bounded merge of two sketches = the union's own sketch,
  *   - intersection (the theta composition, Dasgupta et al., Theta
  *     sketch framework, 2016): θ = min(R_a, R_b); every retained hash
  *     < θ is a uniform sample of the union, so |A∩B ∩ samples| · 2^w
  *     div θ estimates the intersection — one counting join over ≤ 2k
  *     retained values, never over the sets.
  *
  * The buffer is the sorted ascending distinct bottom-k: reduce is an
  * O(1) reject below the bar (duplicate hashes — multiset inputs — are
  * deduped inside the bounded buffer, so no pre-distinct expand shuffle
  * is needed); merge is a bounded sorted merge that drops duplicates —
  * associative, commutative, IDEMPOTENT, so map-side combine,
  * re-aggregation, and duplicate delivery are all exact on the sketch
  * (property-tested over arbitrary chunkings in SketchPropertiesSpec).
  * O(k) state per group; only ≤ k values per group per partition cross
  * the wire.
  *
  * The hash is caller-computed (the shared md5-hex literal idiom — both
  * engines derive the identical value, so sketch contents and every
  * estimate are bit-identical cross-engine). Width w = 40 bits keeps
  * (k−1)·2^w inside int64 for the estimate arithmetic on both engines.
  */
class KmvSketchAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2)

  override def zero: Seq[Long] = Nil

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.length >= k && h >= buf.last) buf // below the bar: O(1) reject
    else {
      val (pre, post) = buf.span(_ < h)
      if (post.headOption.contains(h)) buf // already present: idempotent
      else (pre ++ (h +: post)).take(k)
    }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      if (i < a.length && j < b.length && a(i) == b(j)) { j += 1 } // dedupe
      else {
        val takeA = j >= b.length || (i < a.length && a(i) < b(j))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
    }
    out.result()
  }

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
