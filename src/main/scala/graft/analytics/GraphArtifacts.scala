package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Shared, session-memoized edge artifacts for the iterative graph
  * family (r14 — VERDICT r13 "next round" #2).
  *
  * The bench tail is ten iterative graph queries, and before this
  * object each one re-derived its own copy of the same two base graphs
  * before iterating:
  *
  *   - the PART CO-PURCHASE graph — distinct parts sharing an order,
  *     one lineitem self-join (the single most expensive stage any of
  *     them runs) — was built independently by triangles (triEdges),
  *     kcore/ktruss/bfs/betweenness (two differently-named caches of
  *     the SAME w≥2 filtered list plus inline rebuilds), sssp (its own
  *     weighted join per call, re-localCheckpointed every invocation),
  *     closeness (per-call symmetrize + localCheckpoint), and
  *     link_prediction/assortativity/degree_hist (lazy rebuilds);
  *   - the CUSTOMER↔SUPPLIER purchase graph (orders⋈lineitem distinct)
  *     was built three times: hitsEdges (raw ids), pagerankEdges and
  *     pprEdges (identical packed-long symmetrized frames cached under
  *     two names — two builds, double memory).
  *
  * Now each base join runs ONCE per (session, input dir) under
  * [[Corpus.cached]]; everything downstream is a projection / filter /
  * union over the cached frame (cheap columnar re-scans, no joins).
  * The frequently-reused SYMMETRIZED forms get their own cache entry
  * because iterative consumers scan them once per round: persisting the
  * union saves re-materializing two projections × rounds × queries.
  *
  * Deterministic bench attribution (the graph_triangles slot rule,
  * r11): `Bench.names` orders the graph family FIRST in a fixed
  * sequence, so each artifact's build lands in its designated owner's
  * slot every round — the owner pays, every later consumer times warm.
  *
  * Correctness is unaffected by construction: the derived frames are
  * the same relational expressions the queries previously inlined, and
  * the full oracle gate re-ran green at both SFs after the rewire.
  */
object GraphArtifacts {

  /** ROOT of the part family: canonical weighted co-purchase edge list
    * (u < v, w = number of shared orders). One lineitem self-join,
    * bounded by per-order basket size — never all-pairs over parts.
    */
  def coPurchaseWeighted(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select("l_orderkey", "l_partkey").distinct()
    Corpus.cachedTimed(s, d, "coPurchaseW") {
      // spread: AQE coalesces this small build's output to ~1 partition,
      // and every downstream per-round join/agg over the persisted frame
      // would inherit that near-serial layout (Tables.spread scaladoc)
      graft.Tables.spread(li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .agg(count(lit(1)).as("w")), col("u"))
    }
  }

  /** Unweighted canonical edges (u < v) — a projection of the cached
    * root; not re-persisted (columnar scans of the cached frame prune
    * to the two id columns for free).
    */
  def coPurchaseEdges(s: SparkSession, d: String): DataFrame =
    coPurchaseWeighted(s, d).select("u", "v")

  /** The w ≥ 2 "repeat co-purchase" subgraph the cohesion family
    * (kcore / ktruss / betweenness / bfs) peels — a filter over the
    * cached root.
    */
  def filteredEdges(s: SparkSession, d: String): DataFrame =
    coPurchaseWeighted(s, d).filter(col("w") >= 2).select("u", "v")

  /** Both-direction (undirected) canonical edges — cached because BFS
    * frontiers re-scan it once per round per consumer.
    */
  def undEdges(s: SparkSession, d: String): DataFrame = {
    val e = coPurchaseEdges(s, d)
    Corpus.cached(s, d, "undEdges") {
      // spread by u: BFS/degree consumers join & aggregate on u per round
      graft.Tables.spread(
        e.unionAll(e.select(col("v").as("u"), col("u").as("v"))), col("u"))
    }
  }

  /** Both-direction w ≥ 2 edges (the cohesion family's adjacency). */
  def undFiltered(s: SparkSession, d: String): DataFrame = {
    val e = filteredEdges(s, d)
    Corpus.cached(s, d, "undFilteredEdges") {
      graft.Tables.spread(
        e.unionAll(e.select(col("v").as("u"), col("u").as("v"))), col("u"))
    }
  }

  /** Both-direction INVERSE-AFFINITY weighted edges (w = 1e6 div
    * shared-order count — frequently co-bought parts are "close"), the
    * Bellman-Ford input. Derived from the cached root, cached because
    * each SSSP round re-scans it.
    */
  def undWeighted(s: SparkSession, d: String): DataFrame = {
    val ew = coPurchaseWeighted(s, d)
      .select(col("u"), col("v"), expr("1000000 div w").as("w"))
    Corpus.cached(s, d, "undWeightedEdges") {
      graft.Tables.spread(
        ew.unionAll(ew.select(col("v").as("u"), col("u").as("v"), col("w"))),
        col("u"))
    }
  }

  /** The %30-SUBSAMPLED weighted co-purchase graph (u < v, w =
    * shared-order count over parts with l_partkey % 30 = 0) — the
    * oracle-feasibility subgraph graph_mst AND graph_percolation iterate
    * on (r17): each previously rebuilt the identical lineitem self-join
    * per invocation (twice per bench pass). One [[Corpus.cachedTimed]]
    * build, spread by u like every other iteration root; mst derives its
    * inverse-affinity weights as a projection of the cached frame.
    */
  def sub30CoPurchaseWeighted(s: SparkSession, d: String): DataFrame =
    Corpus.cachedTimed(s, d, "sub30CoPurchaseW") {
      val li0 = lineitem(s, d)
        .select("l_orderkey", "l_partkey")
        .filter(col("l_partkey") % 30 === 0).distinct()
      graft.Tables.spread(li0.as("a")
        .join(li0.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .agg(count(lit(1)).as("w")), col("u"))
    }

  /** ROOT of the purchase family: distinct (customer, supplier) pairs
    * from orders⋈lineitem — hits consumes raw ids; pagerank/ppr derive
    * packed-long nodes from the same cached pairs.
    */
  def purchasePairs(s: SparkSession, d: String): DataFrame =
    Corpus.cachedTimed(s, d, "purchasePairs") {
      // spread by c: the HITS half-steps alternate joining on c and sup;
      // partitioning by c keeps the c-keyed half shuffle-free while the
      // sup half moves only |V|-row score frames
      graft.Tables.spread(
        lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
          .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("sup"))
          .distinct(), col("c"))
    }

  /** [[purchasePairs]] re-keyed by sup (r17): the HITS h half-step joins
    * on sup, and with only the c-keyed cache each of its rounds
    * re-shuffled the FULL |E|-row edge frame by sup (4× per query; the
    * score frames are |V|-row). Two cached layouts of a two-column frame
    * cost a few bytes/row; each half-step now moves only its score table
    * (guide §2.4 — establish the partitioning once, where it is reused).
    */
  def purchasePairsBySup(s: SparkSession, d: String): DataFrame =
    Corpus.cached(s, d, "purchasePairsBySup") {
      graft.Tables.spread(purchasePairs(s, d), col("sup"))
    }

  /** Packed-long symmetrized purchase graph with out-degree, physically
    * pre-partitioned by the join key: each walk round's join re-shuffles
    * only the |V|-row rank table; the |E|-row edge payload never moves
    * again. ONE cache shared by pagerank and ppr (was two identical
    * frames under two names).
    */
  def purchaseWithDeg(s: SparkSession, d: String): DataFrame =
    Corpus.cached(s, d, "purchaseWithDeg") {
      val e0 = purchasePairs(s, d)
        .select((col("c") * 2).as("cnode"), (col("sup") * 2 + 1).as("snode"))
      val edges = e0.select(col("cnode").as("src"), col("snode").as("dst"))
        .unionByName(e0.select(col("snode").as("src"), col("cnode").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      // spread, not bare repartition (r17): AQE coalesced the keyed
      // repartition to ~1 partition at bench scale, so every
      // pagerank/ppr round ran its |E| join near-serially (the narrow-
      // publish failure class); width follows the session/cluster conf
      graft.Tables.spread(edges.join(deg, "src"), col("src"))
    }
}
