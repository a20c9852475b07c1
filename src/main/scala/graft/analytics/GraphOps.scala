package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives shared by the graph_* queries and their
  * planted-structure specs.
  *
  * Reference anchor: the reference computes nothing graph-shaped (its
  * 190 Python lines forward opaque CDC items); this file exists for the
  * north-star analytics surface.
  */
object GraphOps {

  /** Deterministic SYNCHRONOUS label propagation over an undirected
    * edge list (u, v): every node starts with label = its own id; each
    * round every node adopts the most frequent label among its
    * neighbors, ties broken by the SMALLEST label (cnt DESC, label ASC
    * under row_number — a total order, so rounds are replayable SQL).
    * `rounds` is FIXED (no fixpoint probe): synchronous LPA can
    * oscillate on bipartite structure, and a data-dependent stop would
    * make the oracle non-replayable — the unrolled-iterations
    * discipline used by BPE/Lloyd/perceptron training.
    *
    * Scale shape: each round is one equi-join of the both-direction
    * edge list with the label table + one (node, label) hash-agg + one
    * node-partitioned window — per-round O(|edges|), shards on node
    * keys at any scale; nothing is driver-side and round count is a
    * constant. Isolated nodes never appear (they have no edges and LPA
    * over an edge list cannot move them off their own label anyway).
    *
    * Returns (n, label).
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame =
    labelPropagationBoth(
      edges.select(col("u").as("a"), col("v").as("b"))
        .unionAll(edges.select(col("v").as("a"), col("u").as("b"))),
      rounds)

  /** Multi-source bounded BFS (r12): exact hop distances from every
    * seed simultaneously — state keyed (seed, n), each round ONE edge
    * equi-join + distinct + anti-join against the visited set for ALL
    * seeds together (the landmark-distance amortization; sequential
    * per-seed BFS pays |seeds|× the rounds). `und` is the
    * both-direction edge list (u, v); returns (seed, n, hop) with
    * hop ∈ [0, rounds], seeds included at hop 0. Each round is
    * localCheckpointed: the frontier feeds both the next expansion and
    * the visited union, and an unmaterialized plan would re-derive the
    * whole prefix per round.
    */
  def multiSourceBfs(und: DataFrame, seeds: Seq[Long],
                     rounds: Int): DataFrame = {
    val s = und.sparkSession
    var visited = s.createDataFrame(seeds.map(x => (x, x, 0)))
      .toDF("seed", "n", "hop").localCheckpoint(true)
    var frontier = visited.select("seed", "n")
    for (r <- 1 to rounds) {
      frontier = und.join(frontier.withColumnRenamed("n", "u"), "u")
        .select(col("seed"), col("v").as("n")).distinct()
        .join(visited.select("seed", "n"), Seq("seed", "n"), "left_anti")
        .localCheckpoint(true)
      visited = visited
        .unionAll(frontier.select(col("seed"), col("n"), lit(r).as("hop")))
        .localCheckpoint(true)
    }
    visited
  }

  /** Weighted single-source shortest paths (r13, VERDICT r12 #5):
    * Bellman-Ford rounds over a both-direction weighted edge list
    * (u, v, w) with non-negative INTEGER weights — each round relaxes
    * every edge at once as one equi-join + one min-agg (the
    * LSSS/k-core discipline: per-round O(|edges|), shards on node
    * keys, nothing driver-side but the convergence boolean). Distances
    * are exact for all shortest paths of ≤ `maxRounds` edges — the
    * bounded-hop semantics consumers declare, like multiSourceBfs's
    * hop horizon. MONOTONE EARLY-EXIT: distances only ever decrease,
    * so a round that improves nothing proves the global fixpoint and
    * later rounds are no-ops — the runner stops, while an oracle that
    * unrolls the full bound gets identical rows by the same
    * monotonicity (replayability without a data-dependent result).
    * Rounds localCheckpoint: the dist table feeds both the next
    * relaxation and the convergence probe.
    *
    * Returns (dist table (n, dist) — reached nodes only, source at 0 —
    * and the number of relaxation rounds actually run).
    */
  def ssspWeighted(und: DataFrame, source: Long, maxRounds: Int)
      : (DataFrame, Int) = {
    val s = und.sparkSession
    var dist = s.createDataFrame(Seq((source, 0L))).toDF("n", "dist")
      .localCheckpoint(true)
    var r = 0
    var converged = false
    while (r < maxRounds && !converged) {
      r += 1
      val relaxed = und
        .join(dist.withColumnRenamed("n", "u"), "u")
        .select(col("v").as("n"), (col("dist") + col("w")).as("dist"))
        .unionAll(dist)
        .groupBy("n").agg(min("dist").as("dist"))
        .localCheckpoint(true)
      converged = relaxed.as("a")
        .join(dist.as("b"), col("a.n") === col("b.n"), "left_outer")
        .filter(col("b.n").isNull || col("a.dist") < col("b.dist"))
        .isEmpty
      dist = relaxed
    }
    (dist, r)
  }

  /** [[labelPropagation]] over a pre-built both-direction edge list
    * (a, b). Callers that iterate on a large graph should pass a frame
    * CACHED pre-partitioned on `b` (`repartition(col("b")).persist`):
    * the per-round join then reuses the big side's partitioning and
    * only the label table (node-sized) shuffles each round.
    *
    * `checkpointRounds` materializes each round's label table eagerly
    * (localCheckpoint), truncating the lineage so the final action runs
    * `rounds` shallow jobs instead of one job whose DAG holds every
    * round's shuffle live at once — the knob the LPA memory-pressure
    * ScaleProbe experiment races (values are identical either way; the
    * probe asserts it).
    */
  def labelPropagationBoth(both: DataFrame, rounds: Int,
                           checkpointRounds: Boolean = false): DataFrame = {
    var labels = both.select(col("a").as("n")).distinct()
      .select(col("n"), col("n").as("label"))
    for (_ <- 1 to rounds) {
      // argmax by (cnt DESC, label ASC) as max(struct(cnt, -label)) —
      // a plain two-phase hash-agg with map-side partials, where the
      // equivalent row_number window would re-sort every (node, label)
      // group per round (measured 6.3 s → agg form at sf0.1)
      labels = both
        .join(labels.withColumnRenamed("n", "b"), "b")
        .groupBy(col("a"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("a"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("a").as("n"), (-col("m.nl")).as("label"))
      if (checkpointRounds) labels = labels.localCheckpoint(true)
    }
    labels
  }

  /** Full k-core decomposition (r14, VERDICT r13 #5): max core number
    * per node, capped at `maxK`, by the sequential Seidman peel — for
    * k = 2..maxK, peel the SURVIVING edge set to the k-core (the
    * k-core nests inside the (k−1)-core, so the edge set only shrinks
    * across levels). Each level runs ≤ `maxRounds` SYNCHRONOUS rounds
    * of one degree hash-agg + two semi-joins (per-round O(|edges|),
    * shards by node key); peeling only removes, so a round that
    * removes nothing is a PROVEN fixpoint — the early exit skips only
    * identity rounds, and an oracle that unrolls the full bound gets
    * identical rows by the same monotonicity. Coreness is exact
    * wherever each level's fixpoint lands within `maxRounds`; at any
    * input both engines compute the identical bounded-round result.
    * Edge count per round is the one driver-side scalar (the
    * convergence probe, the graph_kcore discipline).
    *
    * Returns (n, core_k) for every node with ≥ 1 edge (isolated nodes
    * have no edges and coreness 0 by convention — absent here).
    */
  def coreNumbers(edges: DataFrame, maxK: Int, maxRounds: Int): DataFrame = {
    def nodesOf(df: DataFrame) =
      df.select(col("u").as("n")).unionAll(df.select(col("v").as("n")))
        .distinct()
    var e = edges.select("u", "v").localCheckpoint(true)
    var core = nodesOf(e).select(col("n"), lit(1L).as("core_k"))
      .localCheckpoint(true)
    for (k <- 2 to maxK) {
      var prev = e.count()
      var done = prev == 0L
      for (_ <- 1 to maxRounds if !done) {
        val deg = e.select(col("u").as("n"))
          .unionAll(e.select(col("v").as("n")))
          .groupBy("n").agg(count(lit(1)).as("dg"))
        val keep = deg.filter(col("dg") >= k).select("n")
        e = e.join(keep.withColumnRenamed("n", "u"), "u")
          .join(keep.withColumnRenamed("n", "v"), "v")
          .select("u", "v")
          .localCheckpoint(true)
        val now = e.count()
        done = now == prev || now == 0L
        prev = now
      }
      core = core
        .join(nodesOf(e).withColumnRenamed("n", "m"),
          col("n") === col("m"), "left")
        .select(col("n"),
          when(col("m").isNotNull, lit(k.toLong))
            .otherwise(col("core_k")).as("core_k"))
        .localCheckpoint(true)
    }
    core
  }
}
