package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FrequentItemsAgg, MinHashAgg}

/** ScalaCheck properties for the mergeable sketches — pure JVM (no Spark
  * jobs), so trials are cheap and run in the hundreds.
  *
  * Misra–Gries ([[FrequentItemsAgg]]), over ARBITRARY streams and
  * ARBITRARY chunk boundaries (the distributed partial-aggregation
  * shape):
  *  - never overcounts;
  *  - undercount bounded by n/(k+1) — the classic MG bound, preserved by
  *    the capacity-enforcing merge (Mergeable Summaries);
  *  - every key with true frequency > n/(k+1) survives to the final
  *    sketch (the completeness guarantee the heavy-hitters query's
  *    candidate-recount correctness rests on);
  *  - at most k counters at all times.
  *
  * MinHash ([[MinHashAgg]]): merging any chunking of per-element
  * signatures equals the signature of the whole — associativity /
  * commutativity in executable form.
  */
class SketchPropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop, trials: Int = 200): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(trials).withWorkers(1)
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("Misra–Gries bounds hold for every stream and every chunking") {
    val k = 8
    val gen = for {
      // skew knob: a few hot values mixed with a long-tail key space
      xs <- Gen.listOf(Gen.frequency(
        3 -> Gen.const(1L), 2 -> Gen.const(2L), 5 -> Gen.chooseNum(10L, 500L)))
      chunk <- Gen.chooseNum(1, 17)
    } yield (xs, chunk)
    check(Prop.forAll(gen) { case (xs, chunk) =>
      val agg = new FrequentItemsAgg(k)
      val merged =
        if (xs.isEmpty) agg.zero
        else xs.grouped(chunk)
          .map(_.foldLeft(agg.zero)(agg.reduce))
          .reduce(agg.merge)
      val est = agg.finish(merged)
      val n = xs.length.toLong
      val bound = n / (k + 1)
      val truth = xs.groupBy(identity).map { case (key, v) => key -> v.length.toLong }
      val sizeOk = est.size <= k
      val noOver = est.forall { case (key, e) => e <= truth.getOrElse(key, 0L) }
      val underOk = est.forall { case (key, e) => truth(key) - e <= bound }
      val complete = truth.forall { case (key, t) => t <= bound || est.contains(key) }
      sizeOk && noOver && underOk && complete
    })
  }

  test("MinHash union signature is invariant under chunking and order") {
    val mask = (1L << 40) - 1
    val gen = for {
      sigs <- Gen.nonEmptyListOf(
        Gen.listOfN(12, Gen.chooseNum(0L, mask)).map(_.toSeq))
      chunk <- Gen.chooseNum(1, 7)
      seed <- Gen.chooseNum(0, 1000)
    } yield (sigs, chunk, seed)
    check(Prop.forAll(gen) { case (sigs, chunk, seed) =>
      val agg = new MinHashAgg(12)
      def sketch(ss: Seq[Seq[Long]]): Seq[Long] =
        agg.finish(ss.grouped(chunk).map(_.foldLeft(agg.zero)(agg.reduce))
          .reduce(agg.merge))
      val direct = (0 until 12).map(i => sigs.map(_(i)).min)
      val shuffled = new scala.util.Random(seed).shuffle(sigs)
      sketch(sigs) == direct && sketch(shuffled) == direct
    })
  }

  test("BitmapDistinctAgg: exact distinct under every chunking, order, and duplication") {
    import graft.functions.BitmapDistinctAgg
    val cap = 512
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(0L, cap - 1L))
      dupFactor <- Gen.chooseNum(1, 3)
      chunk <- Gen.chooseNum(1, 7)
      seed <- Gen.chooseNum(0, 1000)
    } yield (xs, dupFactor, chunk, seed)
    check(Prop.forAll(gen) { case (xs, dupFactor, chunk, seed) =>
      val agg = new BitmapDistinctAgg(cap)
      // duplicate delivery then shuffle then arbitrary chunk boundaries:
      // OR-idempotence must make all of it invisible
      val stream = new scala.util.Random(seed)
        .shuffle(Seq.fill(dupFactor)(xs).flatten)
      val sketched =
        if (stream.isEmpty) agg.finish(agg.zero)
        else agg.finish(stream.grouped(chunk)
          .map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge))
      sketched == xs.distinct.size.toLong
    })
    // out-of-domain fails loudly, never silently masks
    val agg = new BitmapDistinctAgg(cap)
    intercept[IllegalArgumentException](agg.reduce(agg.zero, cap.toLong))
    intercept[IllegalArgumentException](agg.reduce(agg.zero, -1L))
  }

  test("HllRegistersAgg: registers invariant under chunking, order, and duplication") {
    import graft.functions.HllRegistersAgg
    val p = 8
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(0L, (1L << 60) - 1))
      dupFactor <- Gen.chooseNum(1, 3)
      chunk <- Gen.chooseNum(1, 7)
      seed <- Gen.chooseNum(0, 1000)
    } yield (xs, dupFactor, chunk, seed)
    check(Prop.forAll(gen) { case (xs, dupFactor, chunk, seed) =>
      val agg = new HllRegistersAgg(p)
      // duplicate delivery then shuffle then arbitrary chunk boundaries:
      // max-idempotence must make all of it invisible on the registers
      val stream = new scala.util.Random(seed)
        .shuffle(Seq.fill(dupFactor)(xs).flatten)
      val sketched =
        if (stream.isEmpty) agg.finish(agg.zero)
        else agg.finish(stream.grouped(chunk)
          .map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge))
      // reference registers: straight fold, no chunking
      val ref = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      sketched == ref &&
        // every register holds the rho definition: 53 - bitlength(h >> 8)
        sketched.zipWithIndex.forall { case (r, i) =>
          val hs = xs.filter(h => (h & 255) == i)
          val expect =
            if (hs.isEmpty) 0L
            else hs.map { h =>
              val rem = h >>> p
              if (rem == 0) 53L else 53L - (64 - java.lang.Long.numberOfLeadingZeros(rem))
            }.max
          r == expect
        }
    })
    // out-of-domain fails loudly, never silently masks
    val agg = new HllRegistersAgg(p)
    intercept[IllegalArgumentException](agg.reduce(agg.zero, 1L << 60))
    intercept[IllegalArgumentException](agg.reduce(agg.zero, -1L))
  }

  test("CountMinAgg: registers invariant under chunking and order; " +
    "cells hold exact slice counts; point query never underestimates") {
    import graft.functions.CountMinAgg
    val (depth, width) = (4, 16)
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(0L, (1L << 60) - 1))
      chunk <- Gen.chooseNum(1, 7)
      seed <- Gen.chooseNum(0, 1000)
    } yield (xs, chunk, seed)
    check(Prop.forAll(gen) { case (xs, chunk, seed) =>
      val agg = new CountMinAgg(depth, width)
      val stream = new scala.util.Random(seed).shuffle(xs)
      val sketched =
        if (stream.isEmpty) agg.finish(agg.zero)
        else agg.finish(stream.grouped(chunk)
          .map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge))
      // cell (r, idx) must hold the exact count of inputs hashing there
      val cellsOk = (0 until depth).forall { r =>
        (0 until width).forall { idx =>
          sketched(r * width + idx) ==
            xs.count(h => ((h >>> (10 * r)) & (width - 1)) == idx)
        }
      }
      // one-sided guarantee: min-over-rows ≥ the true multiset count
      val pointOk = xs.distinct.forall { h =>
        val est = (0 until depth).map(r =>
          sketched(r * width + ((h >>> (10 * r)) & (width - 1)).toInt)).min
        est >= xs.count(_ == h)
      }
      cellsOk && pointOk
    })
    val agg = new CountMinAgg(depth, width)
    intercept[IllegalArgumentException](agg.reduce(agg.zero, 1L << 60))
    intercept[IllegalArgumentException](agg.reduce(agg.zero, -1L))
    // width > 1024 would let row r's index bits overlap row r+1's 10-bit
    // slice (correlated rows → the 2N/width error bound breaks): refused
    intercept[IllegalArgumentException](new CountMinAgg(4, 2048))
    new CountMinAgg(4, 1024) // the boundary width is legal
  }

  test("KmvSketchAgg: sketch invariant under chunking, order, and duplication; " +
    "equals sorted distinct bottom-k") {
    import graft.functions.KmvSketchAgg
    val k = 8
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(0L, 1L << 20)) // small domain → real dupes
      dupFactor <- Gen.chooseNum(1, 3)
      chunk <- Gen.chooseNum(1, 7)
      seed <- Gen.chooseNum(0, 1000)
    } yield (xs, dupFactor, chunk, seed)
    check(Prop.forAll(gen) { case (xs, dupFactor, chunk, seed) =>
      val agg = new KmvSketchAgg(k)
      // duplicate delivery + shuffle + arbitrary chunk boundaries: the
      // dedup-inside-the-bounded-buffer rule must make all of it invisible
      val stream = new scala.util.Random(seed)
        .shuffle(Seq.fill(dupFactor)(xs).flatten)
      val sketched =
        if (stream.isEmpty) agg.finish(agg.zero)
        else agg.finish(stream.grouped(chunk)
          .map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge))
      sketched == xs.distinct.sorted.take(k)
    })
  }

  test("TopKScoredAgg: bounded merge equals exact top-k under every chunking and order") {
    import graft.functions.TopKScoredAgg
    val gen = for {
      k <- Gen.chooseNum(1, 6)
      // coarse scores force ties; (score DESC, id ASC) must resolve them
      xs <- Gen.listOf(Gen.zip(Gen.chooseNum(0, 8).map(_ / 4.0), Gen.chooseNum(0L, 50L)))
      chunk <- Gen.chooseNum(1, 9)
      seed <- Gen.chooseNum(0, 1000)
    } yield (k, xs, chunk, seed)
    check(Prop.forAll(gen) { case (k, xs, chunk, seed) =>
      val agg = new TopKScoredAgg(k)
      def topk(ps: Seq[(Double, Long)]): Seq[(Double, Long)] =
        if (ps.isEmpty) agg.zero
        else agg.finish(ps.grouped(chunk).map(_.foldLeft(agg.zero)(agg.reduce))
          .reduce(agg.merge))
      val expect = xs.sortBy { case (s, id) => (-s, id) }.take(k)
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      topk(xs) == expect && topk(shuffled) == expect
    })
  }

  test("TopKPairsAgg: bounded merge equals exact top-k under every chunking and order") {
    import graft.functions.TopKPairsAgg
    val gen = for {
      k <- Gen.chooseNum(1, 6)
      // duplicate scores on purpose: the (score DESC, id ASC) tiebreak
      // must make the result set unique regardless of arrival order
      xs <- Gen.listOf(Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 50L)))
      chunk <- Gen.chooseNum(1, 9)
      seed <- Gen.chooseNum(0, 1000)
    } yield (k, xs, chunk, seed)
    check(Prop.forAll(gen) { case (k, xs, chunk, seed) =>
      val agg = new TopKPairsAgg(k)
      def topk(ps: Seq[(Long, Long)]): Seq[(Long, Long)] =
        if (ps.isEmpty) agg.zero
        else agg.finish(ps.grouped(chunk).map(_.foldLeft(agg.zero)(agg.reduce))
          .reduce(agg.merge))
      val expect = xs.sortBy { case (s, id) => (-s, id) }.take(k)
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      topk(xs) == expect && topk(shuffled) == expect
    })
  }

  test("VecPackU8/VecDotU8Long: unsigned round-trip and exact packed dot, all code values") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}
    import graft.functions.{VecDotU8Long, VecPackU8}
    val gen = for {
      n <- Gen.chooseNum(0, 80)
      codes <- Gen.listOfN(n, Gen.chooseNum(0L, 255L)) // full u8 range incl. both edges
      arr <- Gen.listOfN(n, Gen.chooseNum(-100000L, 100000L))
    } yield (codes, arr)
    check(Prop.forAll(gen) { case (codes, arr) =>
      val packed = VecPackU8(Literal.create(codes, ArrayType(LongType)))
        .eval(null).asInstanceOf[Array[Byte]]
      val dot = VecDotU8Long(
        Literal.create(packed, BinaryType),
        Literal.create(arr, ArrayType(LongType)))
        .eval(null).asInstanceOf[Long]
      // reference: plain Long arithmetic (codes·|arr| stays far under 2^63)
      val expect = codes.zip(arr).map { case (c, a) => c * a }.sum
      packed.length == codes.length && dot == expect
    })
    // the loud-failure contract: any element outside [0, 255] throws
    intercept[IllegalArgumentException] {
      VecPackU8(Literal.create(Seq(256L), ArrayType(LongType))).eval(null)
    }
    intercept[IllegalArgumentException] {
      VecPackU8(Literal.create(Seq(-1L), ArrayType(LongType))).eval(null)
    }
  }

  test("RankedPrefix.ntileFromRank formula matches the remainder rule for every (n, buckets)") {
    // the integer formula RankedPrefix.ntileFromRank evaluates in SQL,
    // replicated verbatim in plain Long arithmetic and checked rank by
    // rank against the first-buckets-take-the-remainder reference that
    // Spark's and DuckDB's NTILE share — covers n < b, n = b, every
    // remainder shape, and b = 1
    val gen = for {
      n <- Gen.chooseNum(1, 2000)
      b <- Gen.chooseNum(1, 24)
    } yield (n, b)
    check(Prop.forAll(gen) { case (n, b) =>
      val q = n / b
      val rem = n % b
      // reference: explicit bucket sizes, first rem buckets hold q+1
      val sizes = Seq.fill(rem)(q + 1) ++ Seq.fill(b - rem)(q)
      val expected = sizes.zipWithIndex
        .flatMap { case (s, i) => Seq.fill(s)(i + 1L) } // rank → tile
      def tile(r: Long): Long = {
        val cut = rem.toLong * (q + 1)
        if (r <= cut) (r - 1) / (q + 1) + 1
        else rem + (r - cut - 1) / q + 1
      }
      (1 to n).forall(r => tile(r.toLong) == expected(r - 1))
    })
  }
}
