package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries frequent-items sketch (SURVEY §2.10): tracks at
  * most `k` candidate keys with approximate counts in O(k) space, such
  * that every key with true frequency > n/(k+1) is guaranteed present in
  * the final sketch (undercount bounded by n/(k+1)). Both the classic
  * per-element step (decrement all counters when a new key arrives at
  * capacity) and the capacity-enforcing merge (combine counts, subtract
  * the (k+1)-th largest, drop non-positives) preserve that bound under
  * partial aggregation — the mergeable-summaries property that lets
  * Spark run this as a map-side combine + one k-sized row per partition
  * to the final merge, never shuffling the raw stream.
  *
  * The sketch is a CANDIDATE GENERATOR, not an answer: the heavy-hitters
  * query re-joins the ≤ k candidates against exact counts, so the final
  * output is deterministic (engine-independent) while the full-stream
  * groupBy only ever materializes k groups' worth of verification work.
  *
  * Buffer layout: one flat Array[Long] `[used, k₁, c₁, k₂, c₂, …]` —
  * mutated in place per row (Spark keeps typed-aggregator buffers as JVM
  * objects within a partition, serializing only at shuffle boundaries),
  * and a linear scan of ≤ k pairs is cache-friendly at the k ≤ a-few-
  * hundred sizes heavy-hitter sketches use.
  */
class FrequentItemsAgg(k: Int)
    extends Aggregator[Long, Array[Long], Map[Long, Long]] {
  require(k >= 1, s"FrequentItemsAgg needs at least one counter, got $k")

  override def zero: Array[Long] = new Array[Long](2 * k + 1)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    val used = buf(0).toInt
    var i = 0
    while (i < used) {
      if (buf(1 + 2 * i) == key) { buf(2 + 2 * i) += 1; return buf }
      i += 1
    }
    if (used < k) {
      buf(1 + 2 * used) = key; buf(2 + 2 * used) = 1
      buf(0) = used + 1
      return buf
    }
    // at capacity and key untracked: the Misra–Gries step — decrement
    // every counter by one, compacting zeroed slots in the same pass
    // (conceptually: cancel one occurrence of k+1 DISTINCT keys, which
    // cannot change which keys exceed n/(k+1))
    var w = 0
    i = 0
    while (i < used) {
      val c = buf(2 + 2 * i) - 1
      if (c > 0) { buf(1 + 2 * w) = buf(1 + 2 * i); buf(2 + 2 * w) = c; w += 1 }
      i += 1
    }
    buf(0) = w
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val m = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < a(0).toInt) {
      val key = a(1 + 2 * i); m(key) = m.getOrElse(key, 0L) + a(2 + 2 * i); i += 1
    }
    i = 0
    while (i < b(0).toInt) {
      val key = b(1 + 2 * i); m(key) = m.getOrElse(key, 0L) + b(2 + 2 * i); i += 1
    }
    var entries = m.toArray
    if (entries.length > k) {
      // capacity-enforcing merge (Agarwal et al., Mergeable Summaries):
      // subtract the (k+1)-th largest combined count from every counter
      // and drop non-positives — ≤ k survive, error stays ≤ n/(k+1)
      val counts = entries.map(_._2).sorted(Ordering[Long].reverse)
      val d = counts(k)
      entries = entries.collect {
        case (key, c) if c - d > 0 => (key, c - d)
      }
    }
    val out = new Array[Long](2 * k + 1)
    out(0) = entries.length
    i = 0
    while (i < entries.length) {
      out(1 + 2 * i) = entries(i)._1; out(2 + 2 * i) = entries(i)._2; i += 1
    }
    out
  }

  override def finish(buf: Array[Long]): Map[Long, Long] =
    (0 until buf(0).toInt).map(i => buf(1 + 2 * i) -> buf(2 + 2 * i)).toMap

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
}
