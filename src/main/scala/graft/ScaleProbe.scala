package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior probe: replicates the corpora N× IN MEMORY (no files
  * written; doc/vec ids re-keyed per replica) and times the signature
  * dedup pipelines and ANN search at the inflated size. The point is the
  * growth CURVE, not the absolute numbers — a pipeline whose cost is
  * per-row map + bucket-bounded join should scale near-linearly until a
  * bucket degenerates; a hidden O(n²) stage shows up immediately as a
  * superlinear bend.
  *
  * Run: sbt "runMain graft.ScaleProbe [factor ...]" (default 1 4 16)
  */
object ScaleProbe {

  private def replicateDocs(spark: SparkSession, d: String, k: Int): DataFrame = {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    docs.crossJoin(spark.range(k).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"), col("text"))
  }

  private def replicateVecs(spark: SparkSession, d: String, k: Int): DataFrame = {
    val vecs = Tables.embeddings(spark, d)
    vecs.crossJoin(spark.range(k).select(col("id").as("rep")))
      .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"), col("embedding"))
  }

  /** Replicas with per-replica deterministic SIGN jitter: replica r flips
    * component i's sign when hash(r, i) is odd. Verbatim replication puts
    * every copy in its original sign bucket (identical vectors cannot be
    * split by more hyperplanes), which would measure the pathology, not
    * the remedy — the jitter models what a 64×-larger corpus actually
    * has: 64× the sign diversity.
    */
  private def replicateVecsSignJittered(spark: SparkSession, d: String, k: Int): DataFrame = {
    val vecs = Tables.embeddings(spark, d)
    vecs.crossJoin(spark.range(k).select(col("id").as("rep")))
      .select(
        (col("vec_id") + col("rep") * 10000000L).as("vec_id"),
        expr("""transform(embedding,
                  (x, i) -> case when pmod(hash(rep, i), 2) = 0 then x
                            else -x end)""").as("embedding"))
  }

  private def time(label: String)(a: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = a
    println(f"""{"probe":"$label","rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
  }

  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local("graft-scale-probe")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_PROBE=recall runs ONLY the recall-at-scale block (the
    // doc/text/topk probes are unaffected by it and cost minutes at x64)
    val recallOnly = sys.env.get("SPARK_GRAFT_PROBE").contains("recall")
    // SPARK_GRAFT_PROBE=pagerank runs ONLY the pagerank-at-scale block
    val prOnly = sys.env.get("SPARK_GRAFT_PROBE").contains("pagerank")
    // SPARK_GRAFT_PROBE=triangles races the r10 edge-iterator triangle
    // formulation against the r9 wedge self-join on the k×-replicated
    // co-purchase graph (disconnected copies — wedge count scales k×)
    val triOnly = sys.env.get("SPARK_GRAFT_PROBE").contains("triangles")
    // SPARK_GRAFT_PROBE=auc races the bounded-histogram AUC (ml_auc_rank's
    // shipped form: per-score collapse before the ordered window) against
    // the naive per-row rank formulation whose global sort is single-task
    val aucOnly = sys.env.get("SPARK_GRAFT_PROBE").contains("auc")
    // SPARK_GRAFT_PROBE=jaccard races graph_edge_jaccard's triangle-
    // identity form (per-edge common-neighbor counts read off the
    // oriented intersection engine at 3·triangles volume) against the
    // naive form that ships BOTH full adjacency arrays to every edge
    // (Σ deg² payload). Measured verdict (BASELINE.md): on NEAR-REGULAR
    // graphs the naive form is cheaper (no orientation / explode
    // machinery; Σ deg² is linear there) — the identity form wins when
    // degree SKEW grows, crossing over at x64 on the hub-skewed
    // replication where hub payload grows k² per hub. Hence the probe
    // replicates WITH shared hubs; both regimes are recorded honestly.
    val jacOnly = sys.env.get("SPARK_GRAFT_PROBE").contains("jaccard")
    // SPARK_GRAFT_PROBE=pca times ann_pca_project's distributed
    // sufficient-sums pass on the k×-replicated embeddings and asserts
    // the EXACTNESS-AT-SCALE invariant: under verbatim replication both
    // the centered sums and n scale k×, so the integer covariance
    // matrix — and therefore the power-iterated axis — must be
    // BIT-EQUAL at every factor while the pass itself grows linearly
    val pcaOnly = sys.env.get("SPARK_GRAFT_PROBE").contains("pca")
    // SPARK_GRAFT_PROBE=prefix races RankedPrefix's two-phase global
    // ordered pass (profile_equidepth_hist's shipped r11 form) against
    // the naive bare Window.orderBy running sum whose input is ONE task
    // by construction. Values are jittered per replica (v·64 + rep) so
    // the NDV scales k× — verbatim replication would keep the collapsed
    // frame constant and measure nothing.
    val prefixOnly = sys.env.get("SPARK_GRAFT_PROBE").contains("prefix")
    // SPARK_GRAFT_PROBE=lpa times graph_communities' 4-round label
    // propagation on the k×-replicated co-purchase graph (DISCONNECTED
    // copies, node ids offset per replica — community structure per copy
    // preserved, |V| and |E| scale k×) and asserts REPLICATION
    // INVARIANCE: copy 0's final labels must equal the base run's
    // (label propagation is local, so disconnected copies cannot
    // interact — any divergence means a nondeterministic tie-break).
    val lpaOnly = sys.env.get("SPARK_GRAFT_PROBE").contains("lpa")
    // SPARK_GRAFT_PROBE=eqdepth decomposes the streaming equi-depth
    // maintainer's per-batch cost (fixed-delta merge vs full-state tier
    // recompute) at k× maintained NDV, equality-gated per factor.
    val eqdepthOnly = sys.env.get("SPARK_GRAFT_PROBE").contains("eqdepth")
    // SPARK_GRAFT_PROBE=ktruss races graph_ktruss's per-wave support
    // join (the double adjacency equi-join) across factors (r14,
    // VERDICT r13 #6) with the replication-invariance equality gate
    val ktrussOnly = sys.env.get("SPARK_GRAFT_PROBE").contains("ktruss")
    // SPARK_GRAFT_PROBE=scc times graph_scc's trim + forward-backward
    // min-label peel on the k×-replicated purchase-sequence digraph
    // (disconnected copies) with the replication-invariance gate (r15,
    // VERDICT r14 #5): the SCC profile must scale exactly k× in count
    // and member mass with a CONSTANT max-SCC size, and round counts are
    // set by diameter, so time should grow ~linearly in |E|
    val sccOnly = sys.env.get("SPARK_GRAFT_PROBE").contains("scc")
    // SPARK_GRAFT_PROBE=anf times graph_anf's HyperBall register
    // propagation (GraphOps.anfPerNode — the SAME shipped core) on the
    // k×-replicated w≥2 co-purchase graph as DISCONNECTED copies with
    // per-replica node-id offsets, and gates REPLICATION INVARIANCE of
    // copy 0: registers depend only on node ids inside a copy and
    // copy 0 keeps its original ids, so its per-hop (n_nodes, nf_est)
    // profile must EQUAL the base run's exactly at every factor (the
    // register algebra is deterministic — any drift is a bug, not
    // sketch noise). Per-round cost is one |E| equi-join + one (n, idx)
    // hash-agg with a diameter-pinned round count, so the time curve
    // should be ~linear in |E|.
    val anfOnly = sys.env.get("SPARK_GRAFT_PROBE").contains("anf")
    var anfBase: Map[Int, (Long, Long)] = null
    // SPARK_GRAFT_PROBE=mst times graph_mst's Borůvka rounds
    // (GraphOps.minimumSpanningForest — the shipped core) on the
    // k×-replicated weighted co-purchase graph as DISCONNECTED copies
    // and gates REPLICATION INVARIANCE: per-copy weights and structure
    // are preserved, so forest-edge count and total weight must scale
    // exactly k× (cross-multiplied integer equality) with the same
    // zero residual. Per-round cost is one |E| join + per-component
    // min + a components-sized CC fixpoint — the curve should be
    // ~linear in |E| at a constant round count.
    val mstOnly = sys.env.get("SPARK_GRAFT_PROBE").contains("mst")
    var mstBaseK: Int = -1
    var mstBase: (Long, Long) = null
    var pcaAxisAtBase: Array[Long] = null
    var ktrussSupAtBase: Long = -1L
    var ktrussBaseK: Int = 1
    var sccBaseK: Int = -1
    var sccBase: (Long, Long, Long) = null
    for (k <- factors) {
      if (aucOnly) {
        val ev = spark.read.parquet(s"$d/events.parquet")
          .select(expr("cast(round(value * 100) as bigint)").as("score"),
            expr("case when event_type = 'purchase' then 1L else 0L end").as("pos"))
        // verbatim k× replication: row count scales k×, the score-range-
        // bounded histogram cardinality stays EXACTLY constant — the
        // design claim is that AUC cost is the scan, not the ordering
        val rep = ev.crossJoin(spark.range(k).toDF("rep"))
          .select("score", "pos").localCheckpoint(true)
        var aucHist = Double.NaN
        time(s"auc_hist_x$k") {
          val r = graft.streaming.StreamingMetrics.aucFromHistogram(
            graft.streaming.StreamingMetrics.scoreHistogram(rep)).collect()(0)
          aucHist = r.getDouble(2)
          r.getLong(0) + r.getLong(1)
        }
        // naive form raced at small factors only: per-row average ranks
        // through one GLOBAL sort window (single task by construction)
        if (k <= 4) {
          var aucRank = Double.NaN
          time(s"auc_rowrank_x$k") {
            import org.apache.spark.sql.expressions.Window
            val r = rep
              .withColumn("rmin", rank().over(Window.orderBy("score")))
              .withColumn("cs", count(lit(1)).over(Window.partitionBy("score")))
              .filter(col("pos") === 1)
              .agg(sum(expr("2 * rmin + cs - 1")).as("r2"),
                count(lit(1)).as("p"))
              .crossJoin(rep.agg(count(lit(1)).as("n")))
              .select(((col("r2") - col("p") * (col("p") + 1)).cast("double") /
                ((col("n") - col("p")) * col("p") * 2L).cast("double")).as("auc"))
              .collect()(0)
            aucRank = r.getDouble(0)
            1L
          }
          require(aucRank == aucHist,
            s"formulations disagree at x$k: rank=$aucRank hist=$aucHist")
        }
        println(s"[probe] auc_x$k: rows=${rep.count()} auc=$aucHist")
      } else if (triOnly) {
        val li = spark.read.parquet(s"$d/lineitem.parquet")
          .select("l_orderkey", "l_partkey").distinct()
        val e0 = li.as("a")
          .join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("u0"), col("b.l_partkey").as("v0"))
          .agg(count(lit(1)).as("w"))
        val edges = e0.crossJoin(spark.range(k).toDF("rep"))
          .select((col("u0") * k + col("rep")).as("u"),
            (col("v0") * k + col("rep")).as("v"))
          .localCheckpoint(true)
        val deg = edges.select(col("u").as("n"))
          .unionAll(edges.select(col("v").as("n")))
          .groupBy("n").agg(count(lit(1)).as("deg"))
        // no broadcast hints and no second checkpoint here: at x64 the
        // deg table is 12.8M rows (AQE picks the join) and a pinned oe
        // would starve execution memory under the adjacency aggregation
        val oe = edges
          .join(deg.withColumnRenamed("n", "u")
            .withColumnRenamed("deg", "du"), "u")
          .join(deg.withColumnRenamed("n", "v")
            .withColumnRenamed("deg", "dv"), "v")
          .select(
            when(col("du") < col("dv") ||
              (col("du") === col("dv") && col("u") < col("v")), col("u"))
              .otherwise(col("v")).as("s"),
            when(col("du") < col("dv") ||
              (col("du") === col("dv") && col("u") < col("v")), col("v"))
              .otherwise(col("u")).as("t"))
        // r10 shipped form: adjacency-array intersection via the NATIVE
        // two-pointer SortedIntersectLong kernel (the shipped engine's
        // exact hot path), per-node counts in one explode pass — total
        // triangles as checksum
        var triIter = -1L
        time(s"tri_edge_iterator_x$k") {
          val adj = oe.groupBy(col("s").as("n"))
            .agg(sort_array(collect_list(col("t"))).as("outs"))
          triIter = oe
            .join(adj.select(col("n").as("s"), col("outs").as("ou")), "s")
            .join(adj.select(col("n").as("t"), col("outs").as("ov")), "t")
            .select(size(graft.functions.ArraySetFunctions
              .sortedIntersectLong(col("ou"), col("ov"))).cast("long").as("c"))
            .agg(sum("c")).collect()(0).getLong(0)
          triIter
        }
        // r9 form: materialized wedge self-join + closing equi-join —
        // only raced at small factors (its wedge volume scales k×)
        if (k <= 4) {
          var triWedge = -1L
          time(s"tri_wedge_join_x$k") {
            triWedge = oe.as("e1")
              .join(oe.as("e2"),
                col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
              .select(col("e1.t").as("b"), col("e2.t").as("c"))
              .join(edges.select(col("u").as("b"), col("v").as("c")), Seq("b", "c"))
              .count()
            triWedge
          }
          require(triWedge == triIter,
            s"formulations disagree at x$k: wedge=$triWedge iter=$triIter")
        }
        println(s"[probe] tri_x$k: edges=${edges.count()} triangles=$triIter")
      } else if (ktrussOnly) {
        // k-truss SUPPORT JOIN growth (r14, VERDICT r13 #6): the one new
        // r13 graph stage without a measured curve. Per peel wave,
        // support(u,v) = |N(u) ∩ N(v)| comes from the double adjacency
        // equi-join e ⋈ adj(x=u) ⋈ adj(x=v, shared y) — its shuffled
        // intermediate is the WEDGE volume Σ_n deg(n)² anchored at
        // surviving edges, and its output is 3·triangles support rows.
        // Disconnected k× replication keeps every degree constant, so
        // both quantities scale exactly k× — the measured curve must be
        // ~linear, and the per-copy support mass must be REPLICATION-
        // INVARIANT (sup_sum(xk) = k·sup_sum(x1), the equality gate).
        val li = spark.read.parquet(s"$d/lineitem.parquet")
          .select("l_orderkey", "l_partkey").distinct()
        val e0 = li.as("a")
          .join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("u0"), col("b.l_partkey").as("v0"))
          .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
        val edges = e0.crossJoin(spark.range(k).toDF("rep"))
          .select((col("u0") * k + col("rep")).as("u"),
            (col("v0") * k + col("rep")).as("v"))
          .localCheckpoint(true)
        var supSum = -1L; var supEdges = -1L
        time(s"ktruss_support_x$k") {
          val adj = edges.select(col("u").as("x"), col("v").as("y"))
            .unionAll(edges.select(col("v").as("x"), col("u").as("y")))
          val sup = edges.as("e")
            .join(adj.as("au"), col("au.x") === col("e.u"))
            .join(adj.as("av"),
              col("av.x") === col("e.v") && col("av.y") === col("au.y"))
            .groupBy(col("e.u").as("u"), col("e.v").as("v"))
            .agg(count(lit(1)).as("sup"))
          val r = sup.agg(sum("sup").as("s"), count(lit(1)).as("n")).collect()(0)
          supSum = r.getLong(0); supEdges = r.getLong(1)
          supEdges
        }
        // ratio gate against the FIRST factor actually run (argument
        // order must not matter): sup_sum/k is replication-invariant,
        // so cross-multiplied equality is exact in integers
        if (ktrussSupAtBase < 0) { ktrussSupAtBase = supSum; ktrussBaseK = k }
        else require(supSum * ktrussBaseK == ktrussSupAtBase * k,
          s"support mass not replication-invariant at x$k: " +
            s"$supSum vs base $ktrussSupAtBase (x$ktrussBaseK)")
        // one full peel WAVE on top (filter + recount — what the query
        // iterates): times the marginal wave cost at this factor
        time(s"ktruss_wave_x$k") {
          val adj = edges.select(col("u").as("x"), col("v").as("y"))
            .unionAll(edges.select(col("v").as("x"), col("u").as("y")))
          edges.as("e")
            .join(adj.as("au"), col("au.x") === col("e.u"))
            .join(adj.as("av"),
              col("av.x") === col("e.v") && col("av.y") === col("au.y"))
            .groupBy(col("e.u").as("u"), col("e.v").as("v"))
            .agg(count(lit(1)).as("sup"))
            .filter(col("sup") >= 2).count()
        }
        println(s"[probe] ktruss_x$k: edges=${edges.count()} " +
          s"sup_edges=$supEdges sup_sum=$supSum")
      } else if (sccOnly) {
        // graph_scc's exact construction, k×-replicated as DISCONNECTED
        // copies (node ids offset per replica): per-copy SCC structure
        // is preserved, so n_sccs and nontrivial member mass scale
        // exactly k× while max-SCC size stays constant — the equality
        // gate below. Rounds are diameter-bound, so the time curve
        // should be ~linear in |E| with a constant round count.
        val li0 = spark.read.parquet(s"$d/lineitem.parquet")
          .select("l_orderkey", "l_linenumber", "l_partkey")
          .filter(col("l_partkey") % 30 === 0)
        val e0 = li0.as("a").join(li0.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_linenumber") < col("b.l_linenumber") &&
              col("a.l_partkey") =!= col("b.l_partkey"))
          .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
          .distinct()
        val off = 100000000L
        val rep = e0.crossJoin(spark.range(k).toDF("rep"))
          .select((col("u") + col("rep") * off).as("u"),
            (col("v") + col("rep") * off).as("v"))
          .localCheckpoint(true)
        var prof: (Long, Long, Long) = null
        time(s"scc_x$k") {
          val (labels, unresolved) =
            graft.analytics.GraphOps.stronglyConnectedComponents(rep)
          require(unresolved.isEmpty, s"scc did not converge at x$k")
          val r = labels.groupBy("scc").agg(count(lit(1)).as("sz"))
            .filter(col("sz") >= 2)
            .agg(count(lit(1)).as("n_sccs"),
              coalesce(sum("sz"), lit(0L)).as("mass"),
              coalesce(max("sz"), lit(0L)).as("mx")).collect()(0)
          prof = (r.getLong(0), r.getLong(1), r.getLong(2))
          prof._2
        }
        if (sccBaseK < 0) { sccBaseK = k; sccBase = prof }
        else {
          require(prof._1 * sccBaseK == sccBase._1 * k,
            s"n_sccs not replication-invariant at x$k: $prof vs $sccBase")
          require(prof._2 * sccBaseK == sccBase._2 * k,
            s"scc mass not replication-invariant at x$k: $prof vs $sccBase")
          require(prof._3 == sccBase._3,
            s"max scc size changed under replication at x$k: $prof vs $sccBase")
        }
        println(s"[probe] scc_x$k: edges=${rep.count()} n_sccs=${prof._1} " +
          s"mass=${prof._2} max=${prof._3}")
      } else if (mstOnly) {
        val li = spark.read.parquet(s"$d/lineitem.parquet")
          .select("l_orderkey", "l_partkey")
          .filter(col("l_partkey") % 30 === 0).distinct()
        val e0 = li.as("a")
          .join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("u0"), col("b.l_partkey").as("v0"))
          .agg(expr("1000000 div count(1)").as("w"))
        val off = 100000000L
        val rep = e0.crossJoin(spark.range(k).toDF("rep"))
          .select((col("u0") + col("rep") * off).as("u"),
            (col("v0") + col("rep") * off).as("v"), col("w"))
          .localCheckpoint(true)
        var prof: (Long, Long) = null
        time(s"mst_x$k") {
          val (forest, comp) =
            graft.analytics.GraphOps.minimumSpanningForest(rep, rounds = 6)
          val crossFin = rep
            .join(comp.select(col("n").as("u"), col("c").as("cu")), "u")
            .join(comp.select(col("n").as("v"), col("c").as("cv")), "v")
            .filter(col("cu") =!= col("cv"))
          require(crossFin.isEmpty,
            s"mst did not complete at x$k: mergeable components remain")
          val r = forest.agg(count(lit(1)).as("n"), sum("w").as("tw")).head()
          prof = (r.getLong(0), r.getLong(1))
          prof._1
        }
        if (mstBaseK < 0) { mstBaseK = k; mstBase = prof }
        else {
          require(prof._1 * mstBaseK == mstBase._1 * k,
            s"forest size not replication-invariant at x$k: $prof vs $mstBase")
          require(prof._2 * mstBaseK == mstBase._2 * k,
            s"forest weight not replication-invariant at x$k: $prof vs $mstBase")
        }
        println(s"[probe] mst_x$k: edges=${rep.count()} " +
          s"forest=${prof._1} weight=${prof._2}")
      } else if (anfOnly) {
        val li = spark.read.parquet(s"$d/lineitem.parquet")
          .select("l_orderkey", "l_partkey").distinct()
        val e0 = li.as("a")
          .join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("u0"), col("b.l_partkey").as("v0"))
          .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
        val off = 100000000L
        val rep0 = e0.crossJoin(spark.range(k).toDF("rep"))
          .select((col("u0") + col("rep") * off).as("u"),
            (col("v0") + col("rep") * off).as("v"))
        val und = rep0.unionAll(rep0.select(col("v").as("u"), col("u").as("v")))
          .localCheckpoint(true)
        var prof: Map[Int, (Long, Long)] = null
        time(s"anf_x$k") {
          // anfPerNode checkpoints each round eagerly, so the timed
          // region covers the FULL k× propagation even though the gate
          // below aggregates only copy 0
          val per = graft.analytics.GraphOps.anfPerNode(und, 4)
          val r = per.filter(col("n") < off)
            .groupBy("hop")
            .agg(count(lit(1)).as("n_nodes"), sum("est").as("nf"))
            .collect()
          prof = r.map(x => x.getInt(0) -> (x.getLong(1), x.getLong(2))).toMap
          prof.values.map(_._1).sum
        }
        if (anfBase == null) anfBase = prof
        else require(prof == anfBase,
          s"copy-0 ANF profile diverged at x$k: $prof vs $anfBase")
        println(s"[probe] anf_x$k: edges=${und.count()} " +
          s"profile=${prof.toSeq.sortBy(_._1)}")
      } else if (jacOnly) {
        val li = spark.read.parquet(s"$d/lineitem.parquet")
          .select("l_orderkey", "l_partkey").distinct()
        val e0 = li.as("a")
          .join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("u0"), col("b.l_partkey").as("v0"))
          .agg(count(lit(1)).as("w"))
        // replication WITH SHARED HUBS: ~1% of parts (key % 97 = 0) keep
        // ONE identity across all k replicas, so their degree grows k×
        // while the rest stay constant — replicating the skew a real
        // co-occurrence graph develops (stopword-like hub entities).
        // Disconnected replication keeps degrees constant and Σ deg²
        // linear, where the naive form is fine and slightly cheaper
        // (measured; recorded in BASELINE.md) — hubs are WHY the
        // triangle-identity form exists.
        def nodeId(c0: org.apache.spark.sql.Column) =
          when(c0 % 97 === 0, c0 * k).otherwise(c0 * k + col("rep"))
        val edges = e0.crossJoin(spark.range(k).toDF("rep"))
          .select(least(nodeId(col("u0")), nodeId(col("v0"))).as("u"),
            greatest(nodeId(col("u0")), nodeId(col("v0"))).as("v"))
          .distinct()
          .localCheckpoint(true)
        val deg = edges.select(col("u").as("n"))
          .unionAll(edges.select(col("v").as("n")))
          .groupBy("n").agg(count(lit(1)).as("deg"))
        def jacHist(perEdge: org.apache.spark.sql.DataFrame) = edges
          .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
          .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
          .join(perEdge, col("u") === col("a") && col("v") === col("b"), "left")
          .withColumn("t", coalesce(col("tri_e"), lit(0L)))
          .withColumn("jac_pm", expr(
            """case when du + dv - 2 - t <= 0 then 1000
               else t * 1000 div (du + dv - 2 - t) end"""))
          .groupBy(expr("jac_pm div 100").as("dec"))
          .agg(count(lit(1)).as("n"), sum("t").as("ts"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
          .sortBy(_._1).toSeq
        // shipped form: per-edge triangle counts from the oriented
        // intersection engine — explode volume is exactly 3·triangles
        var histTri: Seq[(Long, (Long, Long))] = null
        time(s"jac_tri_identity_x$k") {
          val oe = edges
            .join(deg.withColumnRenamed("n", "u")
              .withColumnRenamed("deg", "du"), "u")
            .join(deg.withColumnRenamed("n", "v")
              .withColumnRenamed("deg", "dv"), "v")
            .select(
              when(col("du") < col("dv") ||
                (col("du") === col("dv") && col("u") < col("v")), col("u"))
                .otherwise(col("v")).as("s"),
              when(col("du") < col("dv") ||
                (col("du") === col("dv") && col("u") < col("v")), col("v"))
                .otherwise(col("u")).as("t"))
          val adj = oe.groupBy(col("s").as("n"))
            .agg(sort_array(collect_list(col("t"))).as("outs"))
          val withCommon = oe
            .join(adj.select(col("n").as("s"), col("outs").as("ou")), "s")
            .join(adj.select(col("n").as("t"), col("outs").as("ov")), "t")
            .select(col("s"), col("t"),
              graft.functions.ArraySetFunctions
                .sortedIntersectLong(col("ou"), col("ov")).as("common"))
            .filter(size(col("common")) > 0)
          val perEdge = withCommon.select(explode(concat(
              array(struct(least(col("s"), col("t")).as("x"),
                greatest(col("s"), col("t")).as("y"),
                size(col("common")).cast("long").as("c"))),
              transform(col("common"), cc => struct(
                least(col("s"), cc).as("x"), greatest(col("s"), cc).as("y"),
                lit(1L).as("c"))),
              transform(col("common"), cc => struct(
                least(col("t"), cc).as("x"), greatest(col("t"), cc).as("y"),
                lit(1L).as("c"))))).as("e"))
            .groupBy(col("e.x").as("a"), col("e.y").as("b"))
            .agg(sum(col("e.c")).as("tri_e"))
          histTri = jacHist(perEdge)
          histTri.map(_._2._1).sum
        }
        // naive form raced at small factors: ship the FULL undirected
        // adjacency array to BOTH sides of every edge — Σ deg² payload
        if (k <= 64) {
          var histNaive: Seq[(Long, (Long, Long))] = null
          time(s"jac_full_adjacency_x$k") {
            val und = edges.unionAll(
              edges.select(col("v").as("u"), col("u").as("v")))
            val fullAdj = und.groupBy(col("u").as("n"))
              .agg(sort_array(collect_list(col("v"))).as("nbrs"))
            val perEdge = edges
              .join(fullAdj.select(col("n").as("u"), col("nbrs").as("nu")), "u")
              .join(fullAdj.select(col("n").as("v"), col("nbrs").as("nv")), "v")
              .select(col("u").as("a"), col("v").as("b"),
                size(graft.functions.ArraySetFunctions
                  .sortedIntersectLong(col("nu"), col("nv")))
                  .cast("long").as("tri_e"))
            histNaive = jacHist(perEdge)
            histNaive.map(_._2._1).sum
          }
          require(histNaive == histTri,
            s"formulations disagree at x$k:\n$histNaive\n$histTri")
        }
        println(s"[probe] jac_x$k: edges=${edges.count()} hist=$histTri")
      } else if (lpaOnly) {
        val e0 = spark.read.parquet(s"$d/lineitem.parquet")
          .select("l_orderkey", "l_partkey").distinct()
        val base = e0.as("a")
          .join(e0.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
          .agg(count(lit(1))).select("u", "v")
        val off = 100000000L
        val rep = base.crossJoin(spark.range(k).toDF("rep"))
          .select((col("u") + col("rep") * off).as("u"),
            (col("v") + col("rep") * off).as("v"))
        val both = rep.select(col("u").as("a"), col("v").as("b"))
          .unionAll(rep.select(col("v").as("a"), col("u").as("b")))
          .repartition(col("b")).localCheckpoint(true)
        var labels: Map[Long, Long] = null
        time(s"lpa_x$k") {
          val r = graft.analytics.GraphOps.labelPropagationBoth(both, 4)
            .collect()
          labels = r.map(x => x.getLong(0) -> x.getLong(1)).toMap
          r.length.toLong
        }
        // r12 memory-pressure experiment (VERDICT r11 #4): the x4→x16
        // superlinearity was attributed to single-node shuffle/persist
        // pressure on the deserialized 46M-arc cache. Race two levers
        // at each factor against the base form above: (ser) the edge
        // cache stored serialized (MEMORY_AND_DISK_SER — ~4× smaller
        // resident set for long-pair rows), and (ckpt) per-round label
        // checkpointing (4 shallow jobs instead of one 12-stage DAG
        // holding every round's shuffle live). Labels must be EQUAL to
        // the base run — these are materialization levers, not
        // semantics.
        both.unpersist(blocking = true)
        val bothSer = rep.select(col("u").as("a"), col("v").as("b"))
          .unionAll(rep.select(col("v").as("a"), col("u").as("b")))
          .repartition(col("b"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        bothSer.count()
        var labelsSer: Map[Long, Long] = null
        time(s"lpa_ser_x$k") {
          val r = graft.analytics.GraphOps.labelPropagationBoth(bothSer, 4)
            .collect()
          labelsSer = r.map(x => x.getLong(0) -> x.getLong(1)).toMap
          r.length.toLong
        }
        require(labelsSer == labels, s"ser variant diverged at x$k")
        var labelsCkpt: Map[Long, Long] = null
        time(s"lpa_ckpt_x$k") {
          val r = graft.analytics.GraphOps
            .labelPropagationBoth(bothSer, 4, checkpointRounds = true)
            .collect()
          labelsCkpt = r.map(x => x.getLong(0) -> x.getLong(1)).toMap
          r.length.toLong
        }
        require(labelsCkpt == labels, s"ckpt variant diverged at x$k")
        bothSer.unpersist(blocking = true)
        // replication invariance: copy 0 ≡ the unreplicated run
        if (k == factors.head && k == 1) () // base IS copy 0
        else {
          val baseBoth = base.select(col("u").as("a"), col("v").as("b"))
            .unionAll(base.select(col("v").as("a"), col("u").as("b")))
          val baseLabels = graft.analytics.GraphOps
            .labelPropagationBoth(baseBoth, 4)
            .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
          val copy0 = labels.filter(_._1 < off)
          require(copy0 == baseLabels,
            s"copy-0 labels diverged from the base run at x$k")
        }
        println(s"[probe] lpa_x$k: nodes=${labels.size}")
      } else if (eqdepthOnly) {
        // StreamingEquiDepth per-batch cost at k× maintained NDV — the
        // sink's two stages measured separately: (merge) a FIXED
        // 2000-value delta folded into a counts target pre-seeded with
        // k×-NDV rows — claim O(delta), ~flat in k; (tiers) the exact
        // tier recompute + locked publish over the full maintained
        // state — claim the two-phase O(NDV) pass, linear in k with
        // the RankedPrefix constant, never a single-task sort. Delta
        // values are negative (disjoint from every jittered positive),
        // so LWW PUTs at n=1 ARE the absolute counts the real sink's
        // streaming aggregation would emit. Published tiers are
        // equality-gated against a direct batch recompute before any
        // time prints.
        import graft.streaming.{SnapshotStore, StreamingEquiDepth}
        val countsT = java.nio.file.Files
          .createTempDirectory(s"eqd-counts-x$k").toString
        val tiersT = java.nio.file.Files
          .createTempDirectory(s"eqd-tiers-x$k").toString
        val byVal = spark.read.parquet(s"$d/orders.parquet")
          .select(expr("cast(round(o_totalprice * 100) as bigint)").as("v0"))
          .crossJoin(spark.range(k).toDF("rep"))
          .select(expr("v0 * 64 + rep").as("v"))
          .groupBy("v").agg(count(lit(1)).as("n_i"))
          .localCheckpoint(true)
        def asDelta(df: org.apache.spark.sql.DataFrame, seq: String) =
          df.select(col("v").cast("string").as("keys"), lit("PUT").as("op"),
            lit(seq).as("sequenceNumber"),
            to_json(struct(col("n_i").as("n"))).as("newImage"))
        SnapshotStore.mergeIntoTarget(spark, countsT,
          asDelta(byVal, "000000000001"), batchId = 1L)
        val deltaVals = spark.range(2000)
          .select((-(col("id") + 1)).as("v"), lit(1L).as("n_i"))
          .localCheckpoint(true)
        time(s"eqd_merge_x$k") {
          SnapshotStore.mergeIntoTarget(spark, countsT,
            asDelta(deltaVals, "000000000002"), batchId = 2L)
          2000L
        }
        time(s"eqd_tiers_x$k") {
          val t = graft.ops.RankedPrefix.equiDepthTiers(spark, "", "",
            StreamingEquiDepth.readCounts(spark, countsT), 8, cached = false)
          SnapshotStore.writeTarget(t, tiersT, batchId = 2L,
            keys = Seq("bucket"))
          8L
        }
        def tierSet(df: org.apache.spark.sql.DataFrame) = df
          .select("bucket", "lo_cents", "hi_cents", "n_rows", "ndv")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        val published = tierSet(StreamingEquiDepth.readTiers(spark, tiersT))
        val direct = tierSet(graft.ops.RankedPrefix.equiDepthTiers(
          spark, "", "", byVal.unionByName(deltaVals), 8, cached = false))
        require(published == direct,
          s"maintained tiers diverged from the batch recompute at x$k")
        println(s"[probe] eqd_x$k: ndv=${byVal.count() + 2000}")
      } else if (prefixOnly) {
        // equi-depth histogram at k× NDV, both formulations. byVal is the
        // per-value collapse — at 149,743 NDV per 150k sf0.1 orders it is
        // data-sized, which is precisely why the bare window single-tasks.
        val byVal = spark.read.parquet(s"$d/orders.parquet")
          .select(expr("cast(round(o_totalprice * 100) as bigint)").as("v0"))
          .crossJoin(spark.range(k).toDF("rep"))
          .select(expr("v0 * 64 + rep").as("v"))
          .groupBy("v").agg(count(lit(1)).as("n_i"))
          .localCheckpoint(true)
        var histTwoPhase: Seq[(Long, (Long, Long))] = null
        time(s"prefix_twophase_x$k") {
          val r = graft.ops.RankedPrefix(spark, s"probe:x$k", s"probeEq:x$k",
              byVal, part = Nil, order = Seq(col("v")), rank = None,
              running = Seq(("cum_incl", col("n_i"))),
              totals = Seq(("n", col("n_i"))))
            .withColumn("bucket", expr("(cum_incl - n_i) * 8 div n"))
            .groupBy("bucket")
            .agg(sum("n_i").as("n_rows"), count(lit(1)).as("ndv"))
            .collect()
          histTwoPhase = r.map(x => x.getLong(0) ->
            (x.getLong(1), x.getLong(2))).toSeq.sortBy(_._1)
          histTwoPhase.map(_._2._1).sum
        }
        // naive single-task form raced at every factor — its curve is the
        // measured pathology (per-row cost constant but ALL rows on one
        // task; the two-phase form amortizes across the cluster)
        if (k <= 64) {
          var histNaive: Seq[(Long, (Long, Long))] = null
          time(s"prefix_naive_x$k") {
            import org.apache.spark.sql.expressions.Window
            val w = Window.orderBy("v")
              .rowsBetween(Window.unboundedPreceding, -1)
            val tot = byVal.agg(sum("n_i").as("n"))
            val r = byVal
              .withColumn("cum", coalesce(sum("n_i").over(w), lit(0L)))
              .crossJoin(broadcast(tot))
              .withColumn("bucket", expr("cum * 8 div n"))
              .groupBy("bucket")
              .agg(sum("n_i").as("n_rows"), count(lit(1)).as("ndv"))
              .collect()
            histNaive = r.map(x => x.getLong(0) ->
              (x.getLong(1), x.getLong(2))).toSeq.sortBy(_._1)
            histNaive.map(_._2._1).sum
          }
          require(histNaive == histTwoPhase,
            s"formulations disagree at x$k:\n$histNaive\n$histTwoPhase")
        }
        println(s"[probe] prefix_x$k: ndv=${byVal.count()} hist=$histTwoPhase")
      } else if (pcaOnly) {
        val rep = replicateVecs(spark, d, k)
          .select(col("vec_id"),
            expr("transform(embedding, x -> cast(floor(cast(x as double) * 100) as bigint) + 100L)")
              .as("qs"))
          .localCheckpoint(true)
        var axis: Array[Long] = null
        time(s"pca_axis_x$k") {
          axis = graft.analytics.Pca.dominantAxis(rep, 64)
          rep.count()
        }
        if (k == factors.head) pcaAxisAtBase = axis
        else require(axis.toSeq == pcaAxisAtBase.toSeq,
          s"axis drifted under verbatim replication at x$k")
        println(s"[probe] pca_x$k: vecs=${rep.count()} " +
          s"axis_head=${axis.take(4).mkString(",")}")
      } else if (prOnly) {
        // integer PageRank over the purchase graph replicated k× as
        // DISCONNECTED copies (node ids suffixed by replica — graph size
        // scales k×, diameter and round count stay constant, the
        // dedup-cluster replication discipline). The claim under test:
        // per-round cost is one edge-list equi-join + one hash-agg, so
        // total time grows linearly in |edges| with the round count
        // pinned at 4 — no hidden rank-table or driver-side stage.
        time(s"pagerank_x$k") {
          val e0 = spark.read.parquet(s"$d/lineitem.parquet")
            .select(col("l_orderkey"), col("l_suppkey"))
            .join(spark.read.parquet(s"$d/orders.parquet")
              .select(col("o_orderkey"), col("o_custkey")),
              col("l_orderkey") === col("o_orderkey"))
            .select(concat(lit("c"), col("o_custkey")).as("cn"),
              concat(lit("s"), col("l_suppkey")).as("sn"))
            .distinct()
          val rep = e0.crossJoin(
              spark.range(k).toDF("rep"))
            .select(concat(col("cn"), lit("#"), col("rep")).as("cnode"),
              concat(col("sn"), lit("#"), col("rep")).as("snode"))
          val edges = rep.select(col("cnode").as("src"), col("snode").as("dst"))
            .unionByName(
              rep.select(col("snode").as("src"), col("cnode").as("dst")))
            .localCheckpoint(true)
          val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
          val withDeg = edges.join(deg, "src")
          var ranks = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
          for (_ <- 1 to 4)
            ranks = withDeg.join(ranks, col("src") === col("node"))
              .select(col("dst"), expr("(pr * 85) div (100 * deg)").as("contrib"))
              .groupBy(col("dst").as("node"))
              .agg((sum("contrib") + lit(150000L)).as("pr"))
          ranks.count()
        }
      } else {
      if (!recallOnly) {
      val docs = replicateDocs(spark, d, k).persist()
      val nd = docs.count()

      // minhash LSH candidate generation at k× (signature fold + band
      // join) — the SAME native word_hash40/minhash12 expressions the
      // production query uses, so the curve measures the shipped path
      time(s"minhash_lsh_x$k") {
        val hsets = docs
          .filter(size(split(col("text"), " ")) >= 3)
          .select(col("doc_id"),
            graft.functions.SignatureFunctions.shingleHash40(
              graft.functions.TextHashFunctions.wordHash40(col("text"))).as("hs"))
          .persist()
        val bkeys = hsets
          .select(col("doc_id"),
            graft.functions.SignatureFunctions.minHash12(col("hs")).as("mh"))
          .select(col("doc_id"), expr(
            """transform(sequence(0, 3),
                 b -> md5(concat(cast(element_at(mh, b*3 + 1) as string), '_',
                                 cast(element_at(mh, b*3 + 2) as string), '_',
                                 cast(element_at(mh, b*3 + 3) as string))))""").as("bkeys"))
        val bands = bkeys
          .select(col("doc_id"), posexplode(col("bkeys")).as(Seq("band", "bkey"))).persist()
        val n = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id"), col("b.doc_id")).dropDuplicates().count()
        hsets.unpersist(); bands.unpersist()
        n
      }

      // inverted-index build at k× (per-doc local term counts → ONE
      // hash-agg shuffle; the production text_inverted_index shape).
      // Replication multiplies df per term k× but not the distinct-term
      // count, so a linear curve here means the agg is genuinely
      // partial-aggregated map-side (a distinct-agg expand would carry
      // k× the token occurrences through a second shuffle and bend)
      time(s"inverted_index_x$k") {
        docs
          .select(col("doc_id"), explode(expr(
            graft.analytics.Corpus.let("toks", "split(text, ' ')",
              """transform(array_distinct(toks),
                   t -> struct(t AS term, size(filter(toks, x -> x = t)) AS cnt))""")))
            .as("tc"))
          .groupBy(col("tc.term").as("term"))
          .agg(count(lit(1)).as("df"), sum(col("tc.cnt")).as("tf_total"))
          .count()
      }

      // layout shard width derived from corpus size (Corpus.layoutShards):
      // the claim under test is that the per-shard row count — the width
      // of each prefix-sum window partition in the packing/layout
      // queries — stays PINNED near the 4096 target as the corpus grows,
      // instead of growing k× the way the old fixed 8-shard constant did
      // (8 window tasks over a 100× corpus). Mean occupancy should sit
      // in (2048, 4096] once above the 8-shard floor, max close behind
      // (md5 keys are uniform at any modulus).
      locally {
        val nsh = graft.analytics.Corpus.layoutShards(nd)
        val occ = docs
          .select((expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as long)") % nsh)
            .cast("int").as("shard"))
          .groupBy("shard").agg(count(lit(1)).as("occ"))
          .agg(max(col("occ")).as("mx"), avg(col("occ")).as("mean"),
            count(lit(1)).as("nonEmpty"))
          .collect()(0)
        println(f"""{"probe":"layout_shards_x$k","n":$nd,"shards":$nsh,""" +
          f""""nonempty_shards":${occ.getLong(2)},"max_rows_per_shard":${occ.getLong(0)},""" +
          f""""mean_rows_per_shard":${occ.getDouble(1)}%.1f,"fixed8_would_be":${nd / 8}}""")
      }

      docs.unpersist()

      // connected components at k× the pair graph: 50k·k four-node path
      // components (the worst small shape — 3 propagation rounds + 1
      // confirm, vs 1+1 for stars). Round count is set by component
      // DIAMETER, not graph size, so the probe should show constant
      // rounds and near-linear time in edges; a superlinear bend would
      // mean per-round work is not staying proportional to the edge list
      time(s"concomp_x$k") {
        val edges = spark.range(50000L * k)
          .select(explode(expr(
            """transform(sequence(0, 2),
                 j -> struct(id*10 + j AS doc_a, id*10 + j + 1 AS doc_b))""")).as("e"))
          .select(col("e.doc_a"), col("e.doc_b"))
        graft.analytics.DedupQueries.connectedComponents(edges).count()
      }

      // per-group top-k two ways at k× rows: the window formulation
      // sorts every group's FULL row set through its shuffle (cost grows
      // with n), while TopKPairsAgg carries ≤ k pairs per group per
      // partition across the wire (shuffle cost ~ k·groups·partitions,
      // CONSTANT in n). Both computed on the same synthetic rows and
      // checked equal — the timing gap, not just the plan shape, is the
      // evidence for SURVEY §2.11 A9. 2M·k rows, 32 groups, top-8.
      {
        val rows = spark.range(2000000L * k)
          .select(col("id"),
            pmod(hash(col("id")), lit(32)).as("grp"),
            pmod(hash(col("id"), lit(7)), lit(1000000000L)).cast("long").as("score"))
          .persist()
        rows.count()
        import org.apache.spark.sql.expressions.Window
        var wRes: Array[org.apache.spark.sql.Row] = null
        var aRes: Array[org.apache.spark.sql.Row] = null
        time(s"topk_window_x$k") {
          wRes = rows
            .withColumn("rk", row_number().over(
              Window.partitionBy("grp").orderBy(col("score").desc, col("id"))))
            .filter(col("rk") <= 8)
            .select(col("grp"), col("score"), col("id"))
            .orderBy("grp", "rk").collect()
          wRes.length.toLong
        }
        time(s"topk_agg_x$k") {
          val topk = udaf(new graft.functions.TopKPairsAgg(8),
            org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
          aRes = rows.groupBy("grp")
            .agg(topk(col("score"), col("id")).as("top"))
            .select(col("grp"), posexplode(col("top")).as(Seq("pos", "t")))
            .select(col("grp"), col("t._1").as("score"), col("t._2").as("id"))
            .orderBy("grp", "pos").collect()
          aRes.length.toLong
        }
        require(wRes.sameElements(aRes),
          s"topk agg/window disagree at x$k: ${wRes.length} vs ${aRes.length}")
        rows.unpersist()
      }

      // running sum two ways at k× key cardinality (the supplier_pareto
      // r6 rewrite): the bare global-window form executes its running
      // sum on ONE task by construction — its time grows with n no
      // matter how many cores exist — while the range-partitioned
      // two-phase form (per-pid windows + broadcast prefix offsets)
      // keeps full parallelism. Both checksummed over every (key, cum)
      // pair and required equal, so the probe also re-proves the
      // rewrite's correctness at sizes the oracle never sees.
      {
        val per = spark.range(2000000L * k)
          .select(col("id").as("s"),
            pmod(hash(col("id"), lit(13)), lit(1000000L)).cast("long").as("cents"))
          .persist()
        per.count()
        import org.apache.spark.sql.expressions.Window
        var gSum: Long = 0L; var tSum: Long = 0L
        time(s"pareto_global_x$k") {
          val w = Window.orderBy(col("cents").desc, col("s"))
          gSum = per
            .withColumn("cum", sum(col("cents")).over(w.rowsBetween(Long.MinValue, 0)))
            .agg(sum(hash(col("s"), col("cum")).cast("long"))).collect()(0).getLong(0)
          2000000L * k
        }
        time(s"pareto_twophase_x$k") {
          val parted = per.repartitionByRange(32, col("cents").desc, col("s"))
            .withColumn("pid", spark_partition_id()).persist()
          parted.count()
          val wIn = Window.partitionBy("pid").orderBy(col("cents").desc, col("s"))
          val within = parted
            .withColumn("cum_in", sum(col("cents")).over(wIn.rowsBetween(Long.MinValue, 0)))
          val offsets = parted.groupBy("pid").agg(sum(col("cents")).as("psum"))
            .withColumn("coff", coalesce(sum(col("psum")).over(
              Window.orderBy("pid").rowsBetween(Long.MinValue, -1)), lit(0L)))
            .select("pid", "coff")
          tSum = within.join(broadcast(offsets), "pid")
            .agg(sum(hash(col("s"), col("cum_in") + col("coff")).cast("long")))
            .collect()(0).getLong(0)
          parted.unpersist()
          2000000L * k
        }
        require(gSum == tSum, s"two-phase running sum != global window at x$k")
        per.unpersist()
      }

      // ANN brute top-k at k× corpus (10 probes broadcast, full scan)
      val vecs = replicateVecs(spark, d, k)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(floor(cast(x as double) * 100) as bigint))").as("qv"))
        .withColumn("nn", expr("aggregate(qv, 0L, (acc, x) -> acc + x * x)"))
        .persist()
      vecs.count()
      time(s"ann_brute_x$k") {
        val probes = vecs.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nn").as("q_nn"))
        vecs.crossJoin(broadcast(probes))
          .filter(col("vec_id") =!= col("query_id"))
          .select(graft.functions.VectorFunctions.vecDotLong(col("qv"), col("q_qv")).as("dot"))
          .filter(col("dot") =!= 0L).count()
      }
      // SQ8 packed approx scan at k× corpus: the same 10-probe scan
      // over the 64-byte packed-code index (native vec_dot_u8_long
      // kernel on BINARY codes + per-probe factored constants). The
      // time curve should track ann_brute — both are one corpus scan —
      // while the separately-reported index bytes are the 8× memory cut,
      // measured not claimed: at 100 TB the packed index is what decides
      // whether the scan side fits executor memory.
      locally {
        val bounds = vecs
          .select(posexplode(col("qv")).as(Seq("i", "x")))
          .groupBy("i").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
        val mnl = typedLit(bounds.map(_._2).toSeq)
        val mxl = typedLit(bounds.map(_._3).toSeq)
        val index = vecs
          .withColumn("mnl", mnl).withColumn("mxl", mxl)
          .withColumn("code", expr(
            """transform(qv, (x, i) ->
                 CASE WHEN element_at(mxl, i + 1) > element_at(mnl, i + 1)
                      THEN ((x - element_at(mnl, i + 1)) * 255L)
                           div (element_at(mxl, i + 1) - element_at(mnl, i + 1))
                      ELSE 0L END)"""))
          .withColumn("rnn", expr(
            """aggregate(transform(code, (cx, i) ->
                 element_at(mnl, i + 1) * 255L
                 + cx * (element_at(mxl, i + 1) - element_at(mnl, i + 1))),
               0L, (acc, x) -> acc + x * x)"""))
          .withColumn("code_b",
            graft.functions.PackedVectorFunctions.vecPackU8(col("code")))
          .select("vec_id", "code_b", "rnn")
          .persist()
        val nv2 = index.count()
        val idxBytes = index
          .agg(sum(length(col("code_b")) + 8L + 8L)).collect()(0).getLong(0)
        println(f"""{"probe":"sq8_index_bytes_x$k","vecs":$nv2,""" +
          f""""packed_bytes":$idxBytes,"full_bytes":${nv2 * (64L * 8 + 8 + 8)}}""")
        time(s"ann_sq8_scan_x$k") {
          val probes = vecs.filter(col("vec_id") < 10)
            .withColumn("mnl", mnl).withColumn("mxl", mxl)
            .select(col("vec_id").as("query_id"), col("nn").as("q_nn"),
              expr("""transform(qv, (x, i) ->
                        x * (element_at(mxl, i + 1) - element_at(mnl, i + 1)))""")
                .as("q_scaled"),
              (graft.functions.VectorFunctions.vecDotLong(col("qv"), mnl) * 255L).as("c0"))
          index.crossJoin(broadcast(probes))
            .filter(col("vec_id") =!= col("query_id"))
            .select((col("c0") + graft.functions.PackedVectorFunctions
              .vecDotU8Long(col("code_b"), col("q_scaled"))).as("adot"))
            .filter(col("adot") =!= 0L).count()
        }
        index.unpersist()
      }
      vecs.unpersist()
      } // !recallOnly

      // sign-LSH bucket occupancy with corpus-size-DERIVED bit width
      // (Corpus.signBucketBits): the claim under test is that deriving
      // bits from n holds mean occupancy near the target as the corpus
      // grows, keeping the bucketed pair stage linear. Fixed 4-bit
      // bucketing would show mean occupancy growing k× here.
      val jvecs = replicateVecsSignJittered(spark, d, k)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(floor(cast(x as double) * 100) as bigint))").as("qv"))
        .persist()
      val nv = jvecs.count()
      val bits = graft.analytics.Corpus.signBucketBits(nv)
      val occ = jvecs
        .withColumn("bucket", graft.analytics.Corpus.signBucketColBits(bits))
        .groupBy("bucket").agg(count(lit(1)).as("occ"))
        .agg(max(col("occ")).as("mx"), avg(col("occ")).as("mean"),
          count(lit(1)).as("nonEmpty"))
        .collect()(0)
      println(f"""{"probe":"bucket_occupancy_x$k","n":$nv,"bits":$bits,""" +
        f""""nonempty_buckets":${occ.getLong(2)},"max_occ":${occ.getLong(0)},""" +
        f""""mean_occ":${occ.getDouble(1)}%.1f}""")

      // multi-probe LSH scan fraction (r7): radius-2 fan-out probes
      // 1 + b + C(b,2) of the 2^b buckets, so the FRACTION of the corpus
      // a probe scans shrinks as the derived width grows with the corpus
      // — the claim behind ann_lsh_multiprobe's scale posture, measured
      // here as actual candidate-pair counts (and scored walltime)
      // against the brute scan's corpus×probes at the same factor.
      val masks: Seq[Long] =
        Seq(0L) ++ (0 until bits).map(1L << _) ++
          (for { i <- 0 until bits; j <- i + 1 until bits } yield (1L << i) | (1L << j))
      val indexed = jvecs
        .withColumn("nn", expr("aggregate(qv, 0L, (acc, x) -> acc + x * x)"))
        .withColumn("bucket", graft.analytics.Corpus.signBucketColBits(bits))
        .persist()
      val probes = indexed.filter(col("vec_id") < 10)
        .withColumn("bucket",
          explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
        .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
          col("nn").as("q_nn"), col("bucket"))
      var mpCands = 0L
      time(s"ann_multiprobe_scan_x$k") {
        mpCands = indexed.join(broadcast(probes), Seq("bucket"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(graft.analytics.Corpus.dotCol("qv", "q_qv").as("dot"))
          .filter(col("dot") =!= Long.MinValue).count()
        mpCands
      }
      var bruteCands = 0L
      time(s"ann_brute_scan_x$k") {
        val bprobes = indexed.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("qv").as("q_qv"))
        bruteCands = indexed.crossJoin(broadcast(bprobes))
          .filter(col("vec_id") =!= col("query_id"))
          .select(graft.analytics.Corpus.dotCol("qv", "q_qv").as("dot"))
          .filter(col("dot") =!= Long.MinValue).count()
        bruteCands
      }
      println(f"""{"probe":"multiprobe_fraction_x$k","n":$nv,"bits":$bits,""" +
        f""""probe_buckets":${masks.length},"total_buckets":${1L << bits},""" +
        f""""mp_cands":$mpCands,"brute_cands":$bruteCands,""" +
        f""""scan_fraction":${mpCands.toDouble / math.max(1L, bruteCands)}%.4f}""")

      // recall@3 AT SCALE (r8): the production queries measure recall
      // only at 500/2000 vectors; this probe measures it over the SAME
      // fixed 10-probe sample at k× the corpus — where the derived
      // bucket width b actually bites (b=11 at 128k) — for the three
      // approximate paths a deployment would actually run. Ground truth
      // is the brute top-3 over the jittered corpus (10 probes ×
      // corpus — the price of measuring, not of serving).
      locally {
        val probes3 = indexed.filter(col("vec_id") < 10)
          .select(col("vec_id"), col("qv"), col("nn")).persist()
        val probesB = probes3
          .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
            col("nn").as("q_nn"))
        def top3(pairs: org.apache.spark.sql.DataFrame) =
          graft.analytics.SimilarityQueries.topKPerProbe(pairs, 3)
            .select("query_id", "neighbor_id")
        val gt = top3(indexed.crossJoin(broadcast(probesB))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            graft.analytics.Corpus.dotCol("qv", "q_qv").as("dot"),
            col("nn").as("na"), col("q_nn").as("nb"))).persist()
        val nGt = gt.count()
        def recall(nm: String, pairs: org.apache.spark.sql.DataFrame): Unit = {
          val hits = gt.join(top3(pairs), Seq("query_id", "neighbor_id")).count()
          println(f"""{"probe":"recall_at_scale_x$k","method":"$nm","n":$nv,""" +
            f""""bits":$bits,"hits":$hits,"of":$nGt}""")
        }
        // multi-probe sign-LSH, radius 2 over the derived width (the
        // same mask fan-out the scan-fraction probe measured)
        recall("lsh_mp", indexed.join(broadcast(probes), Seq("bucket"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            graft.analytics.Corpus.dotCol("qv", "q_qv").as("dot"),
            col("nn").as("na"), col("q_nn").as("nb")))
        // trained IVF, nprobe=3 (the shipped ann_ivf_trained shape)
        val cents = graft.analytics.Clustering.kmeansSpherical(
          spark, indexed.select("vec_id", "qv", "nn"), 16, 2)
        val assigned = graft.analytics.SimilarityQueries
          .assignToCentroids(indexed.select("vec_id", "qv", "nn"), cents)
        val probeCells = probes3
          .withColumn("cell", explode(slice(
            sort_array(graft.analytics.SimilarityQueries.centScoredArr(cents),
              asc = false), 1, 3)))
          .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
            col("nn").as("q_nn"), (-col("cell.negcid")).as("c_id"))
        recall("ivf_trained", assigned.join(broadcast(probeCells), Seq("c_id"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            graft.analytics.Corpus.dotCol("qv", "q_qv").as("dot"),
            col("nn").as("na"), col("q_nn").as("nb")))
        // IVF×SQ8 through the PERSISTED index path (VectorIndexStore —
        // the exact artifacts a deployment serves from)
        val metaT = java.nio.file.Files.createTempDirectory(s"sp-vidx-m$k")
          .toFile.getAbsolutePath
        val codesT = java.nio.file.Files.createTempDirectory(s"sp-vidx-c$k")
          .toFile.getAbsolutePath
        graft.analytics.VectorIndexStore.train(
          spark, indexed.select("vec_id", "qv", "nn"), metaT)
        graft.analytics.VectorIndexStore.appendBatch(
          spark, indexed.select("vec_id", "qv", "nn"), metaT, codesT, 1L)
        recall("ivf_sq8_persisted", graft.analytics.VectorIndexStore.searchPairs(
          spark, probes3, indexed.select("vec_id", "qv", "nn"), metaT, codesT, 3))
        gt.unpersist(); probes3.unpersist()
      }
      indexed.unpersist()
      jvecs.unpersist()
      } // !prOnly
    }
    spark.stop()
  }
}
