package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable MinHash sketch aggregator (SURVEY §2.10): reduces per-row
  * minhash signatures to the signature of the UNION of the underlying
  * shingle sets — elementwise min is associative/commutative, so partial
  * aggregation (map-side combine) and re-aggregation over any grouping
  * are exact, the property that lets incremental/streaming dedup keep
  * per-group sketches instead of re-reading the corpus.
  *
  * Input rows are signature arrays (e.g. produced by the one-pass
  * minhash fold in DedupQueries); an empty group yields the identity
  * (all-sentinel) signature.
  */
class MinHashAgg(k: Int, sentinel: Long = (1L << 40))
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(sentinel)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < k && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
