package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{array_intersect, col, lit}

/** Independent-reference checks for the StatQueries metric layer: each
  * distributed formulation is compared against a brute-force Scala
  * implementation of the DEFINITION (pairwise AUC, O(n²) dominance
  * skyline, exact-fraction EMD, fixpoint peel) on sf0.001 — adversarial
  * to the algebraic rewrites (rank-sum identity, window dominance test,
  * common-denominator EMD, bounded-round peel) that the oracle SQL, being
  * a mirror of the same rewrite, cannot catch.
  */
class StatSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ml_auc_rank equals brute-force pairwise AUC") {
    val rows = Tables.events(spark, sf)
      .selectExpr("cast(round(value * 100) as bigint) as s",
        "case when event_type = 'purchase' then 1 else 0 end as p")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    // definition: P(score_pos > score_neg) + ½·P(tie), all pairs
    var num2 = 0L // ×2 to keep the tie half-credit integral
    for (p <- pos; n <- neg)
      num2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val brute = num2.toDouble / (2.0 * pos.length * neg.length)
    val got = run("ml_auc_rank").collect().head
    assert(got.getLong(0) == pos.length && got.getLong(1) == neg.length)
    assert(got.getDouble(2) == brute, s"rank-sum ${got.getDouble(2)} vs pairwise $brute")
  }

  test("join_skyline equals O(n^2) dominance filter") {
    val base = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .selectExpr("c_mktsegment as seg", "o_orderkey",
        "cast(round(o_totalprice * 100) as bigint) as price",
        "datediff(to_date(o_orderdate), date'1990-01-01') as dday")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val bySeg = base.groupBy(_._1)
    val brute = bySeg.map { case (seg, rs) =>
      val sky = rs.filter { case (_, _, p, d) =>
        !rs.exists { case (_, _, p2, d2) =>
          p2 <= p && d2 >= d && (p2 < p || d2 > d) } }
      seg -> (sky.length.toLong, sky.map(_._2).sum)
    }
    val got = run("join_skyline").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getAs[Long]("key_sum"))).toMap
    assert(got.keySet == brute.keySet)
    for ((seg, (n, ksum)) <- brute)
      assert(got(seg) == ((n, ksum)), s"segment $seg: ${got(seg)} vs ($n, $ksum)")
  }

  test("privacy_t_closeness equals exact-fraction EMD") {
    val cust = Tables.customer(spark, sf)
      .selectExpr("c_nationkey as nat", "c_mktsegment as seg",
        """least(9L, greatest(0L,
           (cast(round(c_acctbal * 100) as bigint) + 100000) div 110000)) as b""")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val ntot = cust.length.toLong
    val gdist = cust.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val brute = cust.groupBy(c => (c._1, c._2)).map { case (g, rs) =>
      val ng = rs.length.toLong
      val cnt = rs.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      var cum = BigInt(0); var absum = BigInt(0)
      for (b <- 0L to 9L) {
        cum += BigInt(cnt.getOrElse(b, 0L)) * ntot -
          BigInt(gdist.getOrElse(b, 0L)) * ng
        absum += cum.abs
      }
      g -> (absum * 1000000 / (BigInt(9) * ng * ntot)).toLong
    }
    val got = run("privacy_t_closeness").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getAs[Long]("t_ppm")).toMap
    assert(got.keySet == brute.keySet)
    for ((g, t) <- brute) assert(got(g) == t, s"group $g: ${got(g)} vs $t")
  }

  test("graph_kcore 8-round bound reaches the true fixpoint on this data") {
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }
    var edges = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    // peel to the TRUE fixpoint, however many rounds it takes
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.length).toMap
      val next = edges.filter(e => deg(e._1) >= 2 && deg(e._2) >= 2)
      changed = next.size != edges.size
      edges = next
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val got = run("graph_kcore").collect().head
    assert(got.getLong(0) == nodes.size.toLong, "core node count")
    assert(got.getAs[Long]("node_sum") == nodes.sum, "node id checksum")
    assert(got.getAs[Long]("n_edges") == edges.size.toLong, "surviving edges")
  }

  test("events_autocorrelation equals the exact-integer definition") {
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "to_date(ts) as day")
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .groupBy(_._1._1).view
      .mapValues(_.toSeq.map { case ((_, d), x) => (d, x) }.sortBy(_._1).map(_._2))
      .toMap
    val got = run("events_autocorrelation").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    for ((t, xs) <- daily) {
      val n = xs.length.toLong; val sx = xs.sum
      val c = xs.map(x => n * x - sx)
      def acf(k: Int): Double = {
        val num = c.dropRight(k).zip(c.drop(k)).map { case (a, b) => a * b }.sum
        num.toDouble / c.map(v => v * v).sum.toDouble
      }
      assert(got(t)._1 == n)
      assert(got(t)._2 == acf(1), s"$t acf1")
      assert(got(t)._3 == acf(7), s"$t acf7")
    }
  }

  test("window_moving_median equals brute per-day frame medians") {
    val daily = Tables.orders(spark, sf)
      .selectExpr("to_date(o_orderdate) as day",
        "cast(round(o_totalprice * 100) as bigint) as c")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val byDay = daily.toArray
    val brute = byDay.indices.map { i =>
      val w = byDay.slice(math.max(0, i - 3), math.min(byDay.length, i + 4))
        .map(_._2).sorted
      byDay(i)._1 -> (w((w.length + 1) / 2 - 1) + w((w.length + 2) / 2 - 1))
    }.toMap
    val got = run("window_moving_median").collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("med2_cents")).toMap
    assert(got.size == brute.size)
    for ((d, m) <- brute) assert(got(d) == m, s"day $d")
  }

  test("ml_gains_lift: gains are monotone, end at 100%, and decile masses sum to the corpus") {
    val rows = run("ml_gains_lift").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("gains_ppm"), r.getAs[Long]("lift_pm")))
      .sortBy(_._1)
    val (ntot, ptot) = {
      val ev = Tables.events(spark, sf)
        .selectExpr("case when event_type = 'purchase' then 1 else 0 end p")
        .collect().map(_.getInt(0))
      (ev.length.toLong, ev.count(_ == 1).toLong)
    }
    assert(rows.map(_._2).sum == ntot, "decile row masses cover every event")
    assert(rows.map(_._3).sum == ptot, "decile positives cover every conversion")
    assert(rows.last._4 == 1000000L, "cumulative gains end at 100%")
    assert(rows.map(_._4).sameElements(rows.map(_._4).sorted), "gains monotone")
    // lift at full coverage is exactly 1000 per-mille by construction
    assert(rows.last._5 == 1000L)
  }

  test("events_ewma equals the 10-lag binary-weight definition") {
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "to_date(ts) as day")
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .groupBy(_._1._1).view
      .mapValues(_.toSeq.map { case ((_, d), x) => (d, x) }.sortBy(_._1))
      .toMap
    val got = run("events_ewma").collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getAs[Long]("ewma_pm"))
      .toMap
    for ((t, series) <- daily; i <- series.indices) {
      val xs = series.map(_._2)
      var num = 0L; var den = 0L
      for (j <- 0 to 9 if i - j >= 0) {
        num += xs(i - j) * (1L << (9 - j)); den += (1L << (9 - j))
      }
      assert(got((t, series(i)._1)) == num * 1000 / den, s"$t ${series(i)._1}")
    }
  }

  test("graph_bfs_hops frontiers equal a brute BFS from the same seed") {
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }
    val edges = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size).toMap
    val seed = deg.toSeq.sortBy { case (n, d) => (-d, n) }.head._1
    var dist = Map(seed -> 0)
    var frontier = Set(seed)
    for (r <- 1 to 6) {
      frontier = frontier.flatMap(adj(_)).diff(dist.keySet)
      dist ++= frontier.map(_ -> r)
    }
    val brute = dist.groupBy(_._2).view
      .mapValues(m => (m.size.toLong, m.keys.sum)).toMap
    val got = run("graph_bfs_hops").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getAs[Long]("node_sum")))
      .toMap
    for ((hop, v) <- brute) assert(got(hop) == v, s"hop $hop")
    val unreachedN = deg.size - dist.size
    assert(got(-1)._1 == unreachedN.toLong, "unreached count")
  }

  test("events_fano_factor equals the exact variance-to-mean definition") {
    val hourly = Tables.events(spark, sf)
      .selectExpr("event_type", "date_trunc('hour', ts) as h")
      .collect().map(r => (r.getString(0), r.get(1).toString))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .groupBy(_._1._1).view.mapValues(_.values.toSeq).toMap
    val got = run("events_fano_factor").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("fano_pm")).toMap
    for ((t, xs) <- hourly) {
      val n = xs.length.toLong; val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      assert(got(t) == (n * sxx - sx * sx) * 1000 / (n * sx), s"type $t")
    }
  }

  test("text_hapax_ratio equals brute term-frequency profile") {
    val tf = Tables.documents(spark, sf)
      .selectExpr("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = run("text_hapax_ratio").collect().head
    assert(got.getAs[Long]("vocab") == tf.size.toLong)
    assert(got.getAs[Long]("tokens_total") == tf.values.sum)
    assert(got.getAs[Long]("hapax") == tf.values.count(_ == 1L).toLong)
    assert(got.getAs[Long]("dis") == tf.values.count(_ == 2L).toLong)
    assert(got.getAs[Long]("top_mass_ppm") == tf.values.max * 1000000L / tf.values.sum)
  }

  test("sorted_intersect_long equals array_intersect on sorted inputs, interpreted AND codegen") {
    import spark.implicits._
    // adversarial shapes: empty sides, disjoint, identical, duplicate
    // runs, single-element overlaps at both ends, plus seeded random sets
    val rng = new scala.util.Random(42)
    val cases: Seq[(Seq[Long], Seq[Long])] = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 1L, 2L, 2L, 3L), Seq(2L, 2L, 3L, 3L, 4L)),
      (Seq(-5L, 0L, 7L), Seq(-5L, 7L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue))
    ) ++ (1 to 20).map { _ =>
      (Seq.fill(rng.nextInt(40))(rng.nextInt(30).toLong).sorted,
        Seq.fill(rng.nextInt(40))(rng.nextInt(30).toLong).sorted)
    }
    val df = cases.toDF("a", "b")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val rows = df.select(
          graft.functions.ArraySetFunctions.sortedIntersectLong(col("a"), col("b")).as("fast"),
          array_intersect(col("a"), col("b")).as("ref")).collect()
        for (r <- rows)
          assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"$codegen: $r")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("sorted_intersect_long rejects nullable-element arrays at analysis time") {
    import spark.implicits._
    // getLong on a null slot would silently read 0 — the contract is
    // enforced in checkInputDataTypes, so a nullable-element array must
    // fail ANALYSIS, not produce a wrong row. array(lit(null).cast long)
    // and Seq[Option[Long]] both carry containsNull=true.
    val df = Seq((Seq(Some(1L), None), Seq(Some(1L), Some(2L)))).toDF("a", "b")
    assert(df.schema("a").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.ArraySetFunctions
        .sortedIntersectLong(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("non-nullable"))
    // SQL surface takes the same path
    val ex2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select sorted_intersect_long(array(1L, cast(null as bigint)), array(1L))").collect()
    }
    assert(ex2.getMessage.contains("non-nullable"))
  }

  test("ml_ks_stat equals brute max |F+ - F-| over all thresholds") {
    val rows = Tables.events(spark, sf)
      .selectExpr("cast(round(value * 100) as bigint) as s",
        "case when event_type = 'purchase' then 1 else 0 end as p")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val p = rows.count(_._2 == 1).toLong
    val q = rows.length - p
    // definition: sweep every distinct score ascending, track exact
    // cumulative counts, maximize the cross-multiplied gap
    var best = -1L; var bestScore = Long.MaxValue
    var cp = 0L; var cq = 0L
    for (s0 <- rows.map(_._1).distinct.sorted) {
      cp += rows.count(r => r._1 == s0 && r._2 == 1)
      cq += rows.count(r => r._1 == s0 && r._2 == 0)
      val d = math.abs(cp * q - cq * p)
      // ascending sweep: strict > keeps the SMALLEST argmax score
      if (d > best) { best = d; bestScore = s0 }
    }
    val got = run("ml_ks_stat").collect().head
    assert(got.getAs[Long]("n_pos") == p && got.getAs[Long]("n_neg") == q)
    assert(got.getAs[Long]("at_score") == bestScore, "argmax score")
    assert(got.getAs[Long]("ks_ppm") == best * 1000000L / (p * q))
  }

  test("ml_pr_curve: precision/recall from explicit predicted-positive sets") {
    val rows = Tables.events(spark, sf)
      .selectExpr("cast(round(value * 100) as bigint) as s",
        "case when event_type = 'purchase' then 1 else 0 end as p")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val ntot = rows.length.toLong
    val ptot = rows.count(_._2 == 1).toLong
    // decile of a score group = (# rows with strictly higher score)*10/n
    val higher = rows.map(_._1).distinct.map { s0 =>
      s0 -> rows.count(_._1 > s0).toLong
    }.toMap
    val decOf = higher.view.mapValues(h => h * 10 / ntot).toMap
    val got = run("ml_pr_curve").collect()
      .map(r => r.getLong(0) -> r).toMap
    for (d <- got.keys) {
      val pred = rows.filter(r => decOf(r._1) <= d)
      val tp = pred.count(_._2 == 1).toLong
      val row = got(d)
      assert(row.getAs[Long]("tp") == tp, s"decile $d tp")
      assert(row.getAs[Long]("pred_pos") == pred.length.toLong)
      assert(row.getAs[Long]("precision_ppm") == tp * 1000000L / pred.length)
      assert(row.getAs[Long]("recall_ppm") == tp * 1000000L / ptot)
      assert(row.getAs[Long]("f1_ppm") ==
        2 * tp * 1000000L / (pred.length + ptot))
    }
  }

  test("privacy_rand_response: exact debias identity + true counts") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "case when lang = 'en' then 1 else 0 end as b")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val bySrc = docs.groupBy(_._1)
    val got = run("privacy_rand_response").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == bySrc.keySet)
    for ((src, rs) <- bySrc) {
      val row = got(src)
      val n = rs.length.toLong
      assert(row.getAs[Long]("n") == n)
      assert(row.getAs[Long]("true_cnt") == rs.count(_._2 == 1).toLong)
      // the Warner debias at p=1/4 is the exact integer 4·obs − n,
      // and err is est minus twice the truth — pure algebra, so any
      // drift means the mechanism reported something else entirely
      assert(row.getAs[Long]("est_x2") == 4 * row.getAs[Long]("obs") - n)
      assert(row.getAs[Long]("err_x2") ==
        row.getAs[Long]("est_x2") - 2 * row.getAs[Long]("true_cnt"))
    }
  }

  test("graph_edge_jaccard equals brute full-neighborhood intersection") {
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val nbr = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = edges.toSeq.map { case (u, v) =>
      val t = (nbr(u) & nbr(v)).size.toLong
      val den = nbr(u).size.toLong + nbr(v).size.toLong - 2 - t
      val jac = if (den <= 0) 1000L else t * 1000L / den
      (u, v, t, jac / 100)
    }
    val exp = brute.groupBy(_._4).map { case (dec, rs) =>
      dec -> (rs.length.toLong, rs.map(_._3).sum,
        rs.map(_._1).min, rs.map(r => r._1 + r._2).sum)
    }
    val got = run("graph_edge_jaccard").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Long]("tri_sum"),
        r.getAs[Long]("min_node"), r.getAs[Long]("node_sum"))).toMap
    assert(got.keySet == exp.keySet, s"deciles ${got.keySet} vs ${exp.keySet}")
    for ((dec, e) <- exp) assert(got(dec) == e, s"decile $dec")
  }

  test("events_path_mining equals brute per-user first-4 paths") {
    val rows = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "cast(ts as string) as ts",
        "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val brute = rows.groupBy(_._1).map { case (uid, es) =>
      val first4 = es.sortBy(e => (e._3, e._2)).take(4)
      val path = first4.map(_._4).mkString(">")
      (uid, path, if (first4.exists(_._4 == "purchase")) 1L else 0L)
    }
    val exp = brute.groupBy(_._2).map { case (p, us) =>
      p -> (us.size.toLong, us.map(_._3).sum, us.map(_._1).min)
    }
    val got = run("events_path_mining").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Long]("min_user"))).toMap
    assert(got.keySet == exp.keySet)
    for ((p, e) <- exp) assert(got(p) == e, s"path $p")
  }

  test("graph_modularity: generic plumbing matches a hand-built two-community graph") {
    import spark.implicits._
    // K3 ∪ K3 plus one bridge edge; true communities = the two
    // triangles. m = 7; intra per community = 3; degrees: bridge
    // endpoints 3, others 2 → d_c = 2·2+3 = 7 each.
    // Q = Σ (3/7 − (7/14)²) · 2 = 2·(3/7 − 1/4) = 5/14 ≈ 0.3571
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("doc_a", "doc_b")
    val lab = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("doc_id", "label")
    val m = 7L
    val la = lab.select(col("doc_id").as("doc_a"), col("label").as("ca"))
    val lb = lab.select(col("doc_id").as("doc_b"), col("label").as("cb"))
    val intra = e.join(la, "doc_a").join(lb, "doc_b")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("c"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("ec"))
    val degm = e.select(col("doc_a").as("n"))
      .unionAll(e.select(col("doc_b").as("n")))
      .join(lab.withColumnRenamed("doc_id", "n"), "n")
      .groupBy(col("label").as("c"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("dc"))
    val q = degm.join(intra, Seq("c"), "left")
      .agg(org.apache.spark.sql.functions
        .sum(lit(4L) * m * col("ec") - col("dc") * col("dc")).as("qnum"))
      .selectExpr(s"qnum * 1000000 div (4 * ${m}L * ${m}L) as q_ppm")
      .collect().head.getLong(0)
    assert(q == 5L * 1000000 / 14, s"Q = $q, expected 5/14 in ppm")
  }

  test("events_peak_concurrency equals brute interval-overlap counting") {
    // definition-level check: sessions rebuilt independently, peak(day)
    // = max over the day's boundary INSTANTS of |{sessions s: st ≤ t
    // < en}| evaluated by direct counting (ends-exclusive), carry-in
    // included because sessions open at midnight count at every t
    val rows = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "cast(ts as string) as ts",
        "unix_micros(ts) as us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val sessions = rows.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val breaks = sorted.zipWithIndex.filter { case (e, i) =>
        i == 0 || e._4 - sorted(i - 1)._4 > 1800L * 1000000L }.map(_._2)
      (breaks :+ sorted.length).sliding(2).map { w =>
        (sorted(w(0))._4, sorted(w(1) - 1)._4) // (st, en) in micros
      }
    }.toSeq
    def dayOf(us: Long) = (us / 86400000000L)
    val bounds = sessions.flatMap { case (st, en) => Seq(st, en) }
    val brute = bounds.groupBy(dayOf).map { case (day, ts) =>
      // evaluate just AFTER each boundary instant (ends-exclusive:
      // count st ≤ t < en at t = instant, ends processed first means
      // the post-instant state is st ≤ t AND en > t)
      day -> ts.distinct.map(t =>
        sessions.count { case (st, en) => st <= t && en > t }).max.toLong
    }
    // keys align as epoch days: ts are UTC micros, the query's to_date
    // runs under the UTC session
    val got = run("events_peak_concurrency").collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay ->
        r.getAs[Long]("peak_concurrent")).toMap
    assert(got.keySet == brute.keySet)
    for ((day, p) <- brute)
      assert(got(day) == p, s"day $day: ${got(day)} vs $p")
  }

  test("Pca.dominantAxis recovers a planted dominant direction") {
    // planted model: x = t·u + noise, with the signal variance along u
    // an order of magnitude above the isotropic noise floor — the
    // regime PCA exists for (the corpus embeddings are deliberately
    // isotropic, so the planted check lives here, not on testdata)
    import spark.implicits._
    val dim = 8
    val u = Array(5.0, -3.0, 4.0, 1.0, 0.0, 2.0, -1.0, 3.0)
    val rng = new scala.util.Random(7)
    val rows = (0 until 400).map { id =>
      val t = rng.nextGaussian() * 10
      (id.toLong, (0 until dim).map(i =>
        math.floor(t * u(i) + rng.nextGaussian() * 3).toLong).toArray.toSeq)
    }
    val df = rows.toDF("vec_id", "qv")
    // shift keeps every component non-negative (|qv| well under 10 000)
    val axis = graft.analytics.Pca.dominantAxis(
      graft.analytics.Pca.shifted(df, 10000L), dim)
    val nu = math.sqrt(u.map(x => x * x).sum)
    val na = math.sqrt(axis.map(x => x.toDouble * x).sum)
    val cos = u.zip(axis).map { case (a, b) => a * b.toDouble }.sum / (nu * na)
    assert(math.abs(cos) > 0.99, s"planted-direction cosine $cos")
  }

  test("ann_pca_project equals an independent replay of the integer contract") {
    // plumbing check on the real (isotropic) corpus: recompute the
    // sufficient sums, the 20 integer rounds, and the projections in
    // plain Scala from the raw table, and demand bit-equality —
    // convergence direction is the planted test's job, exactness is this
    // one's
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(floor(cast(x as double) * 100) as bigint)) as qv")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val dim = 64
    val n = vecs.length.toLong
    val qs = vecs.map { case (id, qv) => id -> qv.map(_ + 100L) }
    def sdiv(x: Long, d: Long) = if (x < 0) -((-x) / d) else x / d
    val mu = Array.tabulate(dim)(i => qs.map(_._2(i)).sum / n)
    val cs = qs.map { case (_, x) =>
      Array.tabulate(dim)(i => x(i) - mu(i)) }
    val m = Array.tabulate(dim, dim)((i, j) =>
      sdiv(cs.map(c => c(i) * c(j)).sum, n))
    var v = Array.fill(dim)(1000000L)
    for (_ <- 1 to 20) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => m(i)(j) * v(j)).sum)
      val sden = math.max(w.map(math.abs).max / 1000000L, 1L)
      v = w.map(sdiv(_, sden))
    }
    val lead = (0 until dim).minBy(i => (-math.abs(v(i)), i))
    if (v(lead) < 0) v = v.map(-_)
    val exp = vecs.map { case (id, qv) =>
      id -> qv.zip(v).map { case (x, y) => x * y }.sum }.toMap
    val got = run("ann_pca_project").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("proj")).toMap
    assert(got == exp)
  }

  test("graph_communities: LPA recovers a planted two-clique structure") {
    import spark.implicits._
    // two 6-cliques bridged by a single edge — LPA must converge each
    // clique to one label and keep the cliques apart
    val c1 = 1L to 6L
    val c2 = 11L to 16L
    def clique(ns: Seq[Long]) = for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = (clique(c1) ++ clique(c2) :+ (6L, 11L)).toDF("u", "v")
    val labels = graft.analytics.GraphOps.labelPropagation(edges, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == (c1 ++ c2).toSet)
    assert(c1.map(labels).toSet.size == 1, s"clique 1 split: $labels")
    assert(c2.map(labels).toSet.size == 1, s"clique 2 split: $labels")
    assert(labels(1L) != labels(16L), s"cliques merged: $labels")
  }

  test("multiSourceBfs: exact hop distances on a planted two-component graph") {
    import spark.implicits._
    // path 1-2-3-4-5-6 plus a disjoint triangle 10-11-12: hand-checkable
    // distances, a frontier that must NOT leak across components, and a
    // node (6) past the 4-round horizon of seed 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("u", "v")
    val und = edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
    val got = graft.analytics.GraphOps.multiSourceBfs(und, Seq(1L, 10L), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val expected = Map(
      (1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 3L) -> 2, (1L, 4L) -> 3,
      (1L, 5L) -> 4, // 6 is 5 hops away: absent at rounds = 4
      (10L, 10L) -> 0, (10L, 11L) -> 1, (10L, 12L) -> 1)
    assert(got === expected, s"got $got")
    // the harmonic collapse graph_closeness runs on top: exact integers
    // .toSeq first: collecting (key, value) pairs straight off a Map
    // would rebuild a Map and silently keep one pair per seed
    val harm = got.toSeq.collect { case ((s0, _), h) if h >= 1 => (s0, 1000000 / h) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(harm(1L) === 1000000 + 500000 + 333333 + 250000)
    assert(harm(10L) === 2000000)
  }

  test("coreNumbers: exact coreness on a planted graph; chain forces multi-round peel") {
    import spark.implicits._
    // planted structure with hand-checkable coreness:
    //   K4 on 1-2-3-4                  → coreness 3 for all four
    //   triangle 10-11-12 + pendant 13 → 2,2,2 and 1
    //   chain 20-21-22-23-24           → coreness 1, but the k=2 peel
    //     must run MULTIPLE synchronous rounds (each round only strips
    //     the current endpoints) — the fixpoint-within-bound claim
    //     is exercised, not just the one-shot case
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L), (12L, 13L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L)).toDF("u", "v")
    val got = graft.analytics.GraphOps.coreNumbers(edges, maxK = 4, maxRounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(
      1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      10L -> 2L, 11L -> 2L, 12L -> 2L, 13L -> 1L,
      20L -> 1L, 21L -> 1L, 22L -> 1L, 23L -> 1L, 24L -> 1L)
    assert(got === expected, s"got $got")
    // fixpoint equality: a second decomposition with double the round
    // budget must be IDENTICAL — the bound was not binding
    val got24 = graft.analytics.GraphOps.coreNumbers(edges, maxK = 4, maxRounds = 24)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got24 === got)
  }

  test("ssspWeighted: equals brute Dijkstra on a planted weighted graph; early-exits at the fixpoint") {
    import spark.implicits._
    // weights chosen so the SHORTEST path is not the FEWEST-hops path:
    // 1→2→3→4 costs 1+1+1=3 while the direct 1→4 edge costs 10, and the
    // triangle 1-5-6 has a shortcut (1→6 direct 7 vs 1→5→6 = 2+3 = 5);
    // node 9 is unreachable
    val edges = Seq(
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 4L, 10L),
      (1L, 5L, 2L), (5L, 6L, 3L), (1L, 6L, 7L), (6L, 7L, 1L),
      (8L, 9L, 1L)).toDF("u", "v", "w")
    val und = edges.unionAll(
      edges.select(col("v").as("u"), col("u").as("v"), col("w")))
    val (distDf, rounds) =
      graft.analytics.GraphOps.ssspWeighted(und, source = 1L, maxRounds = 8)
    val got = distDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute driver-side Dijkstra over the same adjacency
    val adj = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 4L, 10L),
      (1L, 5L, 2L), (5L, 6L, 3L), (1L, 6L, 7L), (6L, 7L, 1L), (8L, 9L, 1L))
      .flatMap { case (u, v, w) => Seq((u, (v, w)), (v, (u, w))) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dist = scala.collection.mutable.HashMap(1L -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, 1L))(
      Ordering.by[(Long, Long), Long](-_._1))
    val done = scala.collection.mutable.HashSet.empty[Long]
    while (pq.nonEmpty) {
      val (d0, n) = pq.dequeue()
      if (done.add(n)) adj.getOrElse(n, Nil).foreach { case (m, w) =>
        if (dist.get(m).forall(_ > d0 + w)) { dist(m) = d0 + w; pq.enqueue((d0 + w, m)) }
      }
    }
    assert(got === dist.toMap, s"got $got\nexpected $dist")
    assert(!got.contains(8L) && !got.contains(9L), "leaked across components")
    // longest shortest path here is 3 edges (1→5→6→7): the monotone
    // early-exit must stop at round 4 (the no-improvement proof round),
    // well under the 8-round bound
    assert(rounds === 4, s"early-exit did not fire: ran $rounds rounds")
  }

  test("pointerComponents partitions a Borůvka pointer graph like full CC") {
    import spark.implicits._
    // a Borůvka chosen graph: out-degree exactly 1 per component, only
    // 2-cycles (1↔2, 10↔11), with a depth-4 chain hanging off the first
    // cycle and a singleton-attached pair off the second — the shapes a
    // merge round actually produces
    val cand = Seq(
      (1L, 2L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L), (6L, 5L),
      (10L, 11L), (11L, 10L), (12L, 10L))
      .toDF("c", "cother")
    val roots = graft.analytics.GraphOps.pointerComponents(cand)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the partition must equal the undirected connected components of
    // the same edge set, and every root must be its 2-cycle's minimum
    val labels = graft.analytics.DedupQueries.connectedComponents(
        cand.select(col("c").as("doc_a"), col("cother").as("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotGroups = roots.groupBy(_._2).values.map(_.keySet).toSet
    val ccGroups = labels.groupBy(_._2).values.map(_.keySet).toSet
    assert(gotGroups === ccGroups, s"partition $gotGroups != CC $ccGroups")
    assert(roots(6L) === 1L && roots(12L) === 10L,
      s"roots must be the 2-cycle minima: $roots")
  }

  test("Borůvka MSF equals driver-side Kruskal on a planted graph (ties + disconnection)") {
    import spark.implicits._
    // two components; equal-weight ties (edges of weight 2) force the
    // strict (w, u, v) tie-break; a cycle 1-2-3 with a heavy closing
    // edge the MST must drop; 10-11-12 is a separate path component
    val edges = Seq(
      (1L, 2L, 2L), (2L, 3L, 2L), (1L, 3L, 9L),
      (3L, 4L, 1L), (4L, 5L, 5L), (2L, 5L, 4L),
      (10L, 11L, 7L), (11L, 12L, 7L), (10L, 12L, 7L))
    val (forestDf, compDf) = graft.analytics.GraphOps
      .minimumSpanningForest(edges.toDF("u", "v", "w"), rounds = 4)
    val got = forestDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // driver-side Kruskal under the SAME (w, u, v) total order
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val expected = edges.sortBy { case (u, v, w) => (w, u, v) }
      .filter { case (u, v, _) =>
        val (ru, rv) = (find(u), find(v))
        if (ru == rv) false else { parent(ru) = rv; true }
      }.toSet
    assert(got === expected, s"forest $got != kruskal $expected")
    // component labels: {1..5} and {10,11,12} under canonical min ids
    val comps = compDf.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("RankedPrefix: rank/running-sum/ntile equal the single-task window forms") {
    // the two-phase machinery must be VALUE-identical to the bare global
    // window it replaces, across remainder shapes (n mod b ∈ {0, …}) and
    // the n < buckets edge where every row gets its own tile
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (n <- Seq(3, 20, 101, 1000)) {
      val df = spark.range(n.toLong).toDF("id")
        .withColumn("g", expr("cast(id % 2 as int)"))
        // a scrambled but deterministic sort key (multiplicative hash)
        .withColumn("v", expr("(id * 2654435761) % 1000003"))
        .withColumn("w", expr("id % 7 + 1"))
      val naive = df
        .withColumn("r", row_number().over(
          Window.partitionBy("g").orderBy(col("v"), col("id"))).cast("long"))
        .withColumn("cum", sum("w").over(
          Window.partitionBy("g").orderBy(col("v"), col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("t3", ntile(3).over(
          Window.partitionBy("g").orderBy(col("v"), col("id"))))
        .withColumn("t5", ntile(5).over(
          Window.partitionBy("g").orderBy(col("v"), col("id"))))
        .select("id", "r", "cum", "t3", "t5")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))).toMap
      val twoPhase = graft.ops.RankedPrefix(spark, s"mem:$n", s"spec:$n", df,
        part = Seq("g"), order = Seq(col("v"), col("id")),
        rank = Some("r"), running = Seq(("cum", col("w"))),
        totals = Seq(("ntot", lit(1L))), numParts = 7)
      val got = twoPhase
        .withColumn("t3", graft.ops.RankedPrefix.ntileFromRank(col("r"), col("ntot"), 3))
        .withColumn("t5", graft.ops.RankedPrefix.ntileFromRank(col("r"), col("ntot"), 5))
        .select("id", "r", "cum", "t3", "t5")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))).toMap
      assert(got == naive, s"n=$n")
    }
  }
}
