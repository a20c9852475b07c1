package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.ops.CdcOps

/** Generator element for CdcPropertiesSpec (top-level so Spark can derive
  * an Encoder).
  */
case class Ev(eventID: String, eventName: String, seq: Int, pk: String, image: String)

/** SCALACHECK properties from SURVEY §5.3 over randomly generated CDC logs:
  * (a) idempotence, (b) dedup invariance, (c) prefix monotonicity,
  * (d) per-key order sensitivity.
  */
class CdcPropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Run a ScalaCheck prop with a small trial count (each trial runs Spark
    * jobs) and fail the suite on the first counterexample.
    */
  private def check(prop: Prop, trials: Int = 10): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(trials).withWorkers(1)
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val genEv: Gen[Ev] = for {
    id <- Gen.choose(0, 100000)
    name <- Gen.frequency(4 -> "INSERT", 3 -> "MODIFY", 2 -> "REMOVE")
    seq <- Gen.choose(0, 1000)
    pk <- Gen.oneOf("a", "b", "c", "d")
    img <- Gen.alphaStr.map(_.take(6))
  } yield Ev(s"e$id", name, seq, pk, img)

  // seq must totally order events within a key: dedupe (pk, seq) collisions
  private val genLog: Gen[List[Ev]] = Gen.listOfN(40, genEv)
    .map(_.groupBy(e => (e.pk, e.seq)).values.map(_.head).toList)

  private def toDf(log: List[Ev]): DataFrame =
    log.toDF().withColumn("ts",
      expr("timestampadd(SECOND, seq, timestamp'2024-01-01 00:00:00')"))

  private def applyLog(snapshot: DataFrame, log: DataFrame): DataFrame = {
    val delta = CdcOps.lwwCompact(CdcOps.dedup(log, Seq.empty), Seq("pk"), Seq(col("seq")))
      .withColumn("op", CdcOps.applyPlan(col("eventName")))
      .select("pk", "image", "op")
    CdcOps.merge(snapshot, delta, Seq("pk"), "op", Seq("image"))
  }

  private def state(df: DataFrame): Map[String, String] =
    df.select("pk", "image").as[(String, String)].collect().toMap

  private val empty = Seq.empty[(String, String)].toDF("pk", "image")

  test("(a) applying a log twice equals applying it once (idempotence)") {
    check(Prop.forAll(genLog) { log =>
      log.isEmpty || {
        val df = toDf(log)
        val once = applyLog(empty, df)
        state(applyLog(once, df)) == state(once)
      }
    })
  }

  test("(b) injecting duplicate deliveries changes nothing") {
    check(Prop.forAll(genLog) { log =>
      log.isEmpty || {
        val df = toDf(log)
        val withDups = df.unionAll(df.limit(5))
        state(applyLog(empty, withDups)) == state(applyLog(empty, df))
      }
    })
  }

  test("(c) apply(log1 ++ log2) == apply(log2 onto apply(log1)) (prefix monotonicity)") {
    check(Prop.forAll(genLog, Gen.choose(200, 800)) { (log, cut) =>
      log.isEmpty || {
        val l1 = log.filter(_.seq <= cut)
        val l2 = log.filter(_.seq > cut)
        val whole = state(applyLog(empty, toDf(log)))
        val staged =
          if (l2.isEmpty) state(applyLog(empty, toDf(l1)))
          else if (l1.isEmpty) state(applyLog(empty, toDf(l2)))
          else state(applyLog(applyLog(empty, toDf(l1)), toDf(l2)))
        whole == staged
      }
    })
  }

  test("(d) cross-key shuffling is invariant; within-key reorder is not (order contract)") {
    check(Prop.forAll(genLog) { log =>
      log.isEmpty || {
        val df = toDf(log)
        val shuffled = toDf(scala.util.Random.shuffle(log))
        state(applyLog(empty, shuffled)) == state(applyLog(empty, df))
      }
    })
    // within-key order is load-bearing: swapping two seq numbers of the same
    // key flips the winner
    val flip = List(
      Ev("e1", "INSERT", 1, "a", "first"),
      Ev("e2", "INSERT", 2, "a", "second"))
    val swapped = flip.map(e => e.copy(seq = 3 - e.seq))
    assert(state(applyLog(empty, toDf(flip))) === Map("a" -> "second"))
    assert(state(applyLog(empty, toDf(swapped))) === Map("a" -> "first"))
  }

  test("(e) numericStringOrder ranks variable-length digit strings numerically") {
    // random non-negative BigInts, rendered with RANDOM zero padding
    // (mixed producers): the canonicalized (length, value) order must
    // pick the same winner as BigInt max
    val genSeqs: Gen[List[(BigInt, Int)]] = Gen.listOfN(12,
      for {
        a <- Gen.choose(0L, Long.MaxValue)
        b <- Gen.choose(0L, Long.MaxValue)
        pad <- Gen.choose(0, 4)
      } yield (BigInt(a) * b, pad)) // up to ~38 digits
    check(Prop.forAll(genSeqs) { seqs =>
      seqs.size < 2 || {
        val df = seqs.map { case (s, pad) => ("k", ("0" * pad) + s.toString) }
          .toDF("pk", "seqno")
        val winner = CdcOps.lwwCompact(df, Seq("pk"),
          CdcOps.numericStringOrder(col("seqno")))
          .collect()(0).getString(1)
        BigInt(winner) == seqs.map(_._1).max
      }
    }, trials = 5)
  }
}
