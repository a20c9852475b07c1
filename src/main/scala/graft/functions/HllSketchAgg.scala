package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog register sketch (SURVEY §2.10) — the UNBOUNDED-domain
  * sibling of [[BitmapDistinctAgg]]: m = 2^p byte-sized registers whose
  * buffers merge by elementwise MAX. Max is associative, commutative,
  * and IDEMPOTENT, so map-side combine, re-aggregation over any
  * grouping, and duplicate delivery are all exact on the REGISTERS
  * (property-tested over arbitrary chunkings in SketchPropertiesSpec) —
  * the estimate is approximate, the merge algebra is not. 2^p longs of
  * state per group versus a full distinct-agg shuffling every
  * (group, key) pair: at 100 TB this is the difference between a 2 KB
  * partial and a multi-TB expand shuffle (Flajolet et al., HyperLogLog,
  * AofA 2007; Heule et al., HyperLogLog in Practice, EDBT 2013 for the
  * production correction stack).
  *
  * The input is the caller-computed uniform hash (60 bits, non-negative
  * — the engine and the DuckDB oracle derive it from the same md5-hex
  * literal expression so the register contents are bit-identical
  * cross-engine). Register index = low p bits; rho = leading-zero rank
  * of the remaining w = 60-p bits, i.e. `w+1-bitlength(rem)`, with
  * rem=0 → w+1. The finish returns the raw registers: the estimate
  * (alpha_m·m²/Σ2^-r) is one deterministic SQL expression over them,
  * kept OUT of the aggregate so downstream algebra (union across
  * groups, re-merge across time partitions) stays exact.
  */
class HllRegistersAgg(p: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(p >= 4 && p <= 16, s"precision p must be in [4,16], got $p")
  private val m = 1 << p
  private val w = 60 - p // hash width past the index bits

  override def zero: Array[Long] = new Array[Long](m)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    require(h >= 0 && h < (1L << 60),
      s"hash $h outside the declared 60-bit domain")
    val idx = (h & (m - 1)).toInt
    val rem = h >>> p
    val rho =
      if (rem == 0L) w + 1
      else w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
    if (rho > buf(idx)) buf(idx) = rho.toLong
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Elementwise-MAX merge of register ARRAYS (r16) — the
  * [[HllRegistersAgg]] algebra lifted to whole-register inputs, for
  * iterative sketch propagation (HyperBall / graph_anf): each round
  * every node max-merges its neighbors' full register vectors, so the
  * round's shuffle carries ONE m-register row per (node, neighbor)
  * edge instead of m sparse (node, idx, rho) rows — the m× row-count
  * cut that keeps 4 rounds over 10^11 edges shuffle-bound rather than
  * row-overhead-bound. Same algebra, same exactness: max is
  * associative/commutative/idempotent, so map-side combine and
  * re-aggregation are exact on the registers.
  */
class RegisterMaxAgg(m: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  require(m > 0 && m <= 65536, s"register count must be in (0, 65536], got $m")

  override def zero: Array[Long] = new Array[Long](m)

  override def reduce(buf: Array[Long], regs: Seq[Long]): Array[Long] = {
    require(regs.length == m, s"expected $m registers, got ${regs.length}")
    var i = 0
    while (i < m) { val v = regs(i); if (v > buf(i)) buf(i) = v; i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
