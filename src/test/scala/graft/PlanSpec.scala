package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan assertions — the "would this hold at 1000×" checks.
  * A query that silently loses its broadcast, its pushed filter, or its
  * top-k physical operator still returns correct rows at sf0.01; these
  * specs pin the plan shape so the regression is caught here instead of
  * on a cluster.
  */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q5: dimension side is broadcast (no shuffle of the fact table for dims)") {
    assert(plan("q5_region_revenue").contains("BroadcastHashJoin"))
  }

  test("sql_lateral_order_limit: correlated LATERAL LIMIT decorrelates to WindowGroupLimit") {
    // the lateral subquery's per-outer-row ORDER BY LIMIT 1 must become
    // ONE map-side group-limit (partial WindowGroupLimit before the
    // exchange) + a hash join — never a nested loop re-running the
    // customer⋈orders join once per nation row
    val p = plan("sql_lateral_order_limit")
    assert(p.contains("WindowGroupLimit"),
      s"lateral LIMIT not rewritten to a group limit:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"lateral evaluated as a nested loop:\n$p")
  }

  test("q1: shipdate filter reaches the parquet scan as a pushed filter") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("q1: aggregation is two-phase (map-side partial before the shuffle)") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum") || p.contains("partial_count"))
  }

  test("topk_global: TakeOrderedAndProject, not a global sort") {
    val p = plan("topk_global")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Sort [o_totalprice"))
  }

  test("column pruning: cdc_parse_project scan reads only the needed columns") {
    val p = plan("cdc_parse_project")
    // events has 6 columns; the projection needs 3
    assert(p.contains("ReadSchema: struct<event_id:bigint"))
    assert(!p.contains("user_id"))
  }

  test("semi/anti joins stay semi/anti at the physical level") {
    assert(plan("join_semi").contains("LeftSemi"))
    assert(plan("join_anti").contains("LeftAnti"))
  }

  test("restore_replay: exactly one shuffle per branch, reused by the merge join") {
    // snapshot branch window + delta branch window = 2 hash exchanges;
    // the full-outer merge must REUSE that partitioning (plain === keys),
    // and LWW subsumes dedup so no all-columns exchange appears
    val p = plan("cdc_restore_replay")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges in:\n$p")
  }

  test("window_rank: rank<=k filter is pushed into WindowGroupLimit (bounded per-group state)") {
    // Spark's InferWindowGroupLimit turns row_number()<=k into a
    // per-partition top-k pass before the full window — without it every
    // group materializes completely at the window operator
    assert(plan("window_rank").contains("WindowGroupLimit"))
  }

  test("vec_dot_long is registered in SQL via GraftExtensions") {
    val out = spark.sql(
      "SELECT vec_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect()(0).getLong(0)
    assert(out == 32L)
  }

  test("vec_pack_u8/vec_dot_u8_long are registered and exact, incl. the 255 edge") {
    val d = spark.sql(
      "SELECT vec_dot_u8_long(vec_pack_u8(array(0L, 255L, 7L)), array(3L, 2L, -1L)) AS d")
      .collect()(0).getLong(0)
    assert(d == 0L * 3 + 255L * 2 - 7L) // unsigned byte round-trip: 255 stays 255
    val e = intercept[Exception](
      spark.sql("SELECT vec_pack_u8(array(256L))").collect())
    assert(e.getMessage.contains("outside [0, 255]") ||
      e.getCause != null && e.getCause.getMessage.contains("outside [0, 255]"))
  }

  test("minhash12/simhash32 are registered in SQL via GraftExtensions") {
    import graft.functions.{SignatureConstants => SC}
    // one element: minima are (A(p) * 7) & mask for every p; simhash of a
    // single word hash has no bigrams -> signature 0
    val mh = spark.sql("SELECT minhash12(array(7L)) AS mh")
      .collect()(0).getSeq[Long](0)
    assert(mh == SC.MinHashA.map(a => (a * 7L) & SC.Mask40))
    val sh = spark.sql("SELECT simhash32(array(7L)) AS sh").collect()(0).getLong(0)
    assert(sh == 0L)
  }

  test("ann_brute_topk: probe side is broadcast, corpus is never shuffled pre-join") {
    assert(plan("ann_brute_topk").contains("BroadcastNestedLoopJoin") ||
      plan("ann_brute_topk").contains("BroadcastHashJoin"))
  }

  test("ann_brute_topk: candidates fold through a partial bounded aggregate, not a window") {
    val p = plan("ann_brute_topk")
    // r5: map-side combine keeps <=5 pairs per probe per partition; a
    // row_number window here pushed every scored candidate through a
    // |probes|-partition shuffle
    assert(p.contains("partial_topkscoredagg"), s"no partial bounded agg in:\n$p")
    assert(!p.contains("row_number"), p)
  }

  test("r4 text ops are pure per-row maps: zero exchanges") {
    Seq("text_pii_scrub", "text_repetition").foreach { q =>
      assert(!plan(q).contains("Exchange"), s"$q shuffles: ${plan(q)}")
    }
  }

  test("sample_cluster_balanced: exactly the one per-bucket window exchange") {
    val p = plan("sample_cluster_balanced")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
  }

  test("text_inverted_index: one agg shuffle with map-side partial aggregation") {
    val p = plan("text_inverted_index")
    // explode → partial agg → ONE exchange on term → final agg; the df
    // floor stays a post-agg filter (no second shuffle, no collect)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p)
  }

  test("text_cooccurrence: top-k via TakeOrderedAndProject, not a global sort") {
    val p = plan("text_cooccurrence")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("sql_in_subquery: IN-subquery rewrites to a LEFT SEMI join with a pushed filter") {
    val p = plan("sql_in_subquery")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)]"), p)
  }

  test("sql_not_exists: predicate subquery rewrites to a LEFT ANTI join") {
    val p = plan("sql_not_exists")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("sql_correlated_max: subquery is decorrelated to an agg + equi-join") {
    val p = plan("sql_correlated_max")
    // no per-row subquery re-execution and no nested loop — the correlated
    // scalar subquery must rewrite to a per-key aggregate joined back
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("ann_ivf: zero-shuffle assignment — one hash exchange total (the top-k window)") {
    // the coarse assignment is a per-row literal-centroid argmax, so the
    // ONLY hash exchange left is the final per-query top-k window; the
    // cell search joins via broadcast (the r3 crossJoin+window formulation
    // shuffled 16n rows across 3 exchanges)
    val p = plan("ann_ivf")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected <=1 hash exchange, got $exchanges in:\n$p")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("text_search_tfidf: df broadcast back, top-20 via TakeOrderedAndProject") {
    val p = plan("text_search_tfidf")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("text_search_bm25: df broadcast back, top-20 via TakeOrderedAndProject") {
    val p = plan("text_search_bm25")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // the 3-term query filter must run BEFORE the (doc,term) tf agg —
    // a post-agg filter would shuffle the whole token explosion
    assert(p.indexOf("term#") > 0 && p.contains("spark"), p)
  }

  test("text_pmi: unigram counts broadcast back twice, top-20 via TakeOrderedAndProject") {
    val p = plan("text_pmi")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 2, s"expected both unigram joins broadcast, got $bhj in:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("text_keywords: df broadcast back, per-doc top-3 via one window shuffle") {
    val p = plan("text_keywords")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("row_number"), p)
    // tf agg is two-phase (map-side partials before its one shuffle)
    assert(p.contains("partial_count"), s"tf agg not two-phase in:\n$p")
  }

  test("curation_funnel: the dup/contamination flag sets join via broadcast") {
    // the two LEFT joins against the tiny flag sets must never shuffle
    // the corpus — broadcast at any corpus size (the sets are one row
    // per flagged doc, bounded by the near-dup/contamination rate)
    val p = plan("curation_funnel")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 2, s"expected >=2 broadcast joins for the flag sets, got $bhj in:\n$p")
  }

  test("sql_q20_dominant: double-nested subquery decorrelates (semi join, no cartesian)") {
    val p = plan("sql_q20_dominant")
    assert(p.contains("LeftSemi"), s"IN-subquery did not become a semi join in:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("events_gapfill: the spine joins broadcast — no data-sized stage added") {
    val p = plan("events_gapfill")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("sample_weighted_mix: the source->quota table joins broadcast, docs never shuffle for it") {
    val p = plan("sample_weighted_mix")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length +
      "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bhj >= 2, s"expected weight+total joins broadcast, got $bhj in:\n$p")
    assert(p.contains("row_number"), p) // the one windowed shuffle
  }

  test("text_boilerplate: df agg is two-phase; no doc-pair stage anywhere") {
    val p = plan("text_boilerplate")
    assert(p.contains("partial_count"), s"df agg not map-side partial in:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_decontaminate_bloom: probe prunes the shingle stream before the confirm join") {
    val p = plan("dedup_decontaminate_bloom")
    // the bloom predicate must sit below the join (scan-side Filter),
    // not above it — that ordering is the entire point of the prefilter
    val probeAt = p.indexOf("bloom_might_contain_long")
    val joinAt = p.indexOf("BroadcastHashJoin")
    assert(probeAt >= 0, s"bloom probe missing from plan:\n$p")
    assert(joinAt >= 0, s"confirm join missing from plan:\n$p")
    assert(probeAt > joinAt, // executedPlan prints top-down: deeper = later in text
      s"bloom probe not below the confirm join in:\n$p")
    // a standalone Filter node (not a join-condition residual): the
    // probe is a plannable predicate whole-stage codegen can fuse
    assert(p.contains("Filter bloom_might_contain_long"), p)
  }

  test("sql_q2_min_cost: correlated 4-table MIN decorrelates — no nested-loop re-execution") {
    val p = plan("sql_q2_min_cost")
    assert(!p.contains("CartesianProduct"), s"cartesian product survived:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ survived decorrelation:\n$p")
    // the correlated MIN becomes a grouped aggregate joined back
    assert(p.contains("HashAggregate"), s"decorrelated aggregate missing:\n$p")
  }

  test("sql_q21_sole_late: EXISTS/NOT EXISTS become one semi and one anti join") {
    val p = plan("sql_q21_sole_late")
    assert(p.contains("LeftSemi"), s"EXISTS not a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product survived:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ survived decorrelation:\n$p")
  }

  test("supplier_pareto: running sum is two-phase — no data-sized single-task window") {
    val p = plan("supplier_pareto")
    // r6 (factored into ops.RankedPrefix in r11): supplier cardinality
    // scales with data, so the running sum must NOT be a bare global
    // window (one task by construction). The plan carries a range
    // repartition on the sort key and pid-partitioned (parallel) windows
    // over the data side; only the #partitions-row offsets frame may use
    // an empty partition spec.
    assert(p.contains("Exchange rangepartitioning"),
      s"range repartition missing — running sum is single-task again:\n$p")
    assert("windowspecdefinition\\(__rp_pid".r.findAllIn(p).nonEmpty,
      s"per-partition window missing:\n$p")
  }

  test("events_peak_concurrency: sweep shards by hour tile; carry-in is a prefix, not an interval join") {
    val p = plan("events_peak_concurrency")
    // r11: the within-day sweep partitions by (day, hr) so a hot day
    // shards over its 24 tiles, and the carry-in comes from per-tile
    // delta prefixes — the |sess|·|days| BroadcastNestedLoopJoin is gone
    assert("windowspecdefinition\\(day#\\d+, hr#\\d+".r.findAllIn(p).nonEmpty,
      s"hour-tile window missing:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"carry-in interval join resurfaced:\n$p")
  }

  test("graph_link_prediction: wedge middles are degree-capped; no cartesian") {
    val p = plan("graph_link_prediction")
    // the Σdeg² wedge stage is bounded ONLY by the dm <= 64 middle cap —
    // pin it so a refactor can't silently re-open the hub blowup
    assert("dm#\\d+L? <= 64".r.findAllIn(p).nonEmpty,
      s"degree cap missing from the middle filter:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian surfaced:\n$p")
  }

  test("events_theil_sen: the pairwise stage consumes the DAILY aggregate, never fact rows") {
    val p = plan("events_theil_sen")
    // the day×day inequality join is calendar²-bounded BY CONSTRUCTION —
    // pin that an aggregate sits below the join so a refactor can't feed
    // it order-grain rows (the agg_mode pattern), and that the median
    // pass is the two-phase range exchange
    val joinAt = p.indexOf("Join")
    assert(joinAt >= 0 && p.indexOf("HashAggregate", joinAt) >= 0,
      s"pair join not above an aggregate (input not calendar-bounded):\n$p")
    assert(p.contains("Exchange rangepartitioning"),
      s"median pass lost its range exchange:\n$p")
  }

  test("ranked-prefix consumers: every data-proportional ordered pass is two-phase") {
    // r11 (the r10 verdict's top item): these four ran global
    // Window.orderBy over data-proportional frames — equi-depth money
    // values are near-continuous (149,743 NDV on 150,000 orders), RFM
    // ntiles run over customer cardinality, cume_dist's 5-segment
    // partitioning sorts |customers|/5 per task. Pin RankedPrefix's
    // shape: a range exchange on the sort key and __rp_pid-partitioned
    // parallel windows over the data side.
    // r12 adds the last two siblings (the r11 verdict's top item):
    // window_ntile and window_percent_rank partitioned by c_mktsegment
    // (5 values), so each task sorted |customers|/5 rows — linear in
    // data at any scale. Their windows now partition by
    // (c_mktsegment, __rp_pid).
    // r12 also adds agg_lorenz_deciles (global revenue rank + running
    // sum over customer cardinality — the exact shape the primitive
    // exists for).
    for (q <- Seq("profile_equidepth_hist", "agg_rfm_segments",
                  "events_rfm_migration", "window_cume_dist",
                  "profile_key_skew", "window_ntile",
                  "window_percent_rank", "agg_lorenz_deciles",
                  "curation_curriculum")) {
      val p = plan(q)
      assert(p.contains("Exchange rangepartitioning"),
        s"$q: range repartition missing — ordered pass is single-task:\n$p")
      assert("windowspecdefinition\\((\\w+#\\d+, )?__rp_pid".r.findAllIn(p).nonEmpty,
        s"$q: per-partition window missing:\n$p")
    }
  }

  test("agg_mode: global windows consume group-cardinality inputs only") {
    // this query keeps an empty-partition window BY DESIGN: its window
    // input is a post-aggregation frame whose cardinality is the GROUP
    // count (modes per group), not the data — pin that an aggregate
    // sits below the window so a refactor can't silently feed it
    // data-sized input. (profile_key_skew left this list in r11: its
    // group count is CUSTOMER cardinality, which scales — it now rides
    // RankedPrefix and is pinned in the two-phase test above.)
    for (q <- Seq("agg_mode")) {
      val p = plan(q)
      val win = p.indexOf("Window")
      if (win >= 0) {
        assert(p.indexOf("HashAggregate", win) >= 0,
          s"$q: global window not above an aggregate (cardinality unbounded):\n$p")
      }
    }
  }

  test("dedup_containment: rare/common split is broadcast; the stream-sized df agg is shared") {
    val p = plan("dedup_containment")
    // r6: the split must NOT shuffle the exploded shingle stream through
    // an annotation join — rare is a broadcast ANTI against the tiny
    // common (df>50) set, common subsets a broadcast inner
    assert("BroadcastHashJoin .*LeftAnti".r.findAllIn(p).nonEmpty,
      s"rare side not a broadcast anti join in:\n$p")
    // the ONE stream-sized exchange left (the df aggregation feeding the
    // cached common set) is shared by all four consumers of the split —
    // repeated plan_id references, not four recomputations
    val ids = "Exchange hashpartitioning.*plan_id=(\\d+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(ids.length > ids.distinct.length,
      s"no shared exchange — df agg recomputed per branch in:\n$p")
    assert(ids.distinct.length <= 6,
      s"exchange count regressed: ${ids.distinct.length} distinct in:\n$p")
  }

  test("cdc_incremental_agg: delta-side maintenance never re-aggregates the table") {
    val p = plan("cdc_incremental_agg")
    // the touched-key read is a semi join; the final merge of the
    // materialized aggregate with the signed delta joins tiny frames
    assert(p.contains("LeftSemi"), s"touched-key semi join missing in:\n$p")
  }

  test("agg_heavy_hitters: the verify recount is candidate-pruned before the shuffle") {
    // the exact recount must filter to the <=k sketch candidates BEFORE
    // its aggregation shuffle (In/INSET predicate on the scan side), so
    // post-sketch work is O(k) groups regardless of stream size
    val p = plan("agg_heavy_hitters")
    assert(p.contains("INSET") || p.contains(" IN ("), s"candidate filter missing in:\n$p")
    assert(p.contains("partial_count"), s"recount agg not two-phase in:\n$p")
  }

  test("sql_q4_late_priority: correlated EXISTS is one semi join, no re-scan per order") {
    val p = plan("sql_q4_late_priority")
    assert(p.contains("LeftSemi"), s"EXISTS not a semi join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop shape survived:\n$p")
  }

  test("sql_q17_small_quantity: both correlated scalars decorrelate to one grouped agg") {
    val p = plan("sql_q17_small_quantity")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop shape survived:\n$p")
    assert(p.contains("HashAggregate"), s"decorrelated per-part aggregate missing:\n$p")
  }

  test("sql_q16/q22: NOT IN / NOT EXISTS execute as anti joins") {
    assert(plan("sql_q16_supplier_variety").contains("LeftAnti"))
    assert(plan("sql_q22_idle_rich").contains("LeftAnti"))
  }

  test("q19_disjunctive: the equi key is factored out of the OR — BHJ, not BNLJ") {
    val p = plan("q19_disjunctive")
    assert(p.contains("BroadcastHashJoin"), s"broadcast hash join missing:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"disjunction degraded the join:\n$p")
  }

  test("q7/q8/q10: dim chains broadcast — exactly one fact-fact hash shuffle pair") {
    for (q <- Seq("q7_nation_volume", "q8_market_share", "q10_returned_topk")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: dims not broadcast:\n$p")
      // orders⋈lineitem is the only shuffle join; everything else broadcasts
      val smjKeys = "SortMergeJoin".r.findAllIn(p).length
      assert(smjKeys <= 1, s"$q: expected <=1 shuffle join, got $smjKeys:\n$p")
    }
  }

  test("ann_sq8_rerank: approx scan folds through the bounded agg; rerank fetch is broadcast") {
    val p = plan("ann_sq8_rerank")
    // the 4·k candidate cut is the partial bounded aggregate (map-side
    // combine over the code scan), never a |probes|-partition window
    assert(p.contains("partial_topkscoredagg"), s"no partial bounded agg in:\n$p")
    // the exact-rerank vector fetch joins the tiny candidate-id set
    // broadcast — the full-vector table is never shuffled for it
    assert(p.contains("BroadcastHashJoin"), s"candidate fetch not broadcast in:\n$p")
  }

  test("q13_order_histogram: zero-bucket preserved via left outer; histogram agg two-phase") {
    val p = plan("q13_order_histogram")
    assert(p.contains("LeftOuter") || p.contains("RightOuter"), s"outer join lost:\n$p")
    assert(p.contains("partial_count"), s"agg not two-phase:\n$p")
  }

  test("ann_lsh_multiprobe: probe fan-out broadcast into ONE bucket equi-join; corpus unshuffled") {
    val p = plan("ann_lsh_multiprobe")
    // the radius-2 mask explosion happens on the 10-row probe side and
    // broadcasts; the corpus side meets it in a single hash equi-join —
    // never a nested-loop over the radius ball, never a corpus shuffle
    assert(p.contains("BroadcastHashJoin"), s"bucket join not broadcast in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ crept in:\n$p")
    assert(p.contains("partial_topkscoredagg"), s"top-k not the bounded agg in:\n$p")
  }

  test("ann_ivf_sq8: cell prune is a broadcast equi-join; both candidate cuts are bounded aggs") {
    val p = plan("ann_ivf_sq8")
    // probed cells broadcast into the assigned+packed index (equi-join on
    // c_id), the 4·k pool folds through the partial bounded aggregate,
    // and the exact-rerank fetch broadcasts the candidate-id set
    assert(p.contains("BroadcastHashJoin"), s"cell/fetch joins not broadcast in:\n$p")
    assert(p.contains("partial_topkscoredagg"), s"candidate cut not the bounded agg in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }

  test("ann_ivf_pq: cell prune broadcast, candidate cut bounded, no cartesian") {
    val p = plan("ann_ivf_pq")
    assert(p.contains("BroadcastHashJoin"), s"cell/fetch joins not broadcast in:\n$p")
    assert(p.contains("partial_topkscoredagg"), s"candidate cut not the bounded agg in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"unbounded join crept into the composed index:\n$p")
  }

  test("text_dup_spans: inverted-index discipline — no doc×doc comparison anywhere") {
    val p = plan("text_dup_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span profiling must never compare doc×doc:\n$p")
    // coverage is ONE window (the lead interval-union), not per-doc lists
    assert(p.contains("Window"), s"interval union lost its window form:\n$p")
  }

  test("text_chunk_overlap: pure map + explode — zero exchanges, no join") {
    val p = plan("text_chunk_overlap")
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
    assert(!p.contains("Join"), s"chunking must not join:\n$p")
  }

  test("Catalyst plans the row_number<=k idiom with a PARTIAL WindowGroupLimit pre-shuffle") {
    // The division of labor this engine relies on (SURVEY §4): for the
    // plain rank-filter idiom, Spark's own InferWindowGroupLimit prunes
    // every map partition to k rows per group BEFORE the exchange — so
    // we do NOT hand-roll a rewrite rule for it, and our bounded TopK
    // aggregates are reserved for the shapes Catalyst can't reach (array
    // outputs composed inside larger aggregations, per-probe candidate
    // cuts mid-join-pipeline). This pin keeps the reliance honest: the
    // optimization is conf-disableable, and losing it would silently
    // turn every rank-filter into a full-sort shuffle at 100 TB.
    import spark.implicits._
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
    df.createOrReplaceTempView("wgl_l")
    val p = spark.sql("""
      SELECT * FROM (
        SELECT l_orderkey,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice DESC, l_orderkey) rn
        FROM wgl_l) WHERE rn <= 5""").queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"partial group-limit missing — rank filters would full-sort at scale:\n$p")
  }

  test("cdc_snapshot_diff: both cutoff states from ONE hash-agg — no window, no join") {
    val p = plan("cdc_snapshot_diff")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected 1 hash exchange, got $exchanges in:\n$p")
    assert(!p.contains("Window"), s"snapshot diff must not need a window:\n$p")
    assert(!p.contains("Join"), s"snapshot diff must not need a join:\n$p")
  }

  test("cdc_scd2_history: lead + row_number share ONE window exchange") {
    val p = plan("cdc_scd2_history")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected 1 hash exchange, got $exchanges in:\n$p")
  }

  test("graph_pagerank: every round is an equi-join; top-20 via TakeOrderedAndProject") {
    val p = plan("graph_pagerank")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"pagerank rounds must stay equi-joins:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("text_sparse_cosine: rare-term equi-join, top-20 via TakeOrderedAndProject") {
    val p = plan("text_sparse_cosine")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the pair stage must be the term equi-join, never doc×doc:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("dedup_semantic: the pair stage is the cell equi-join, never vector×vector") {
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cluster-restricted pairs must join on the cell id:\n$p")
  }

  test("mm_phash_dedup: candidates come from the band-bucket equi-join, never image×image") {
    val p = plan("mm_phash_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"phash candidates must band-join:\n$p")
  }

  test("events_pattern_match: one per-user hash-agg chain — no join anywhere") {
    val p = plan("events_pattern_match")
    assert(!p.contains("Join"), s"sequence build is agg-only:\n$p")
  }

  test("agg_quantile_sketch: the sketch agg is two-phase (map-side partials)") {
    val p = plan("agg_quantile_sketch")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"bucket histogram must combine map-side:\n$p")
  }

  test("graph_hits / graph_ppr / graph_betweenness: iterative rounds stay equi-joins") {
    for (q <- Seq("graph_hits", "graph_ppr", "graph_betweenness")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q round degenerated to a cartesian:\n$p")
    }
  }

  test("graph_hits: per-round totals ride materialized frames (no lineage re-derive)") {
    // the 404 s -> seconds fix: each normalization half-step's scalar
    // total must read a localCheckpointed frame, visible as Scan
    // ExistingRDD nodes in the final plan instead of 2^8 nested joins
    val p = plan("graph_hits")
    assert(p.contains("ExistingRDD") || p.contains("LocalTableScan"),
      s"hits rounds must materialize:\n$p")
  }

  test("stat_spearman: midranks broadcast back onto rows (histogram-sized builds)") {
    val p = plan("stat_spearman")
    assert(p.contains("BroadcastHashJoin"),
      s"rank re-attach must broadcast the bounded histogram:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("text_zipf_band / sample_systematic: global rank is the two-phase RankedPrefix " +
    "(range exchange), not a single-task window") {
    for (q <- Seq("text_zipf_band", "sample_systematic")) {
      val p = plan(q)
      assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"),
        s"$q must range-repartition for the global rank:\n$p")
    }
  }

  test("agg_winsorized_mean: clamp thresholds broadcast; no cartesian") {
    val p = plan("agg_winsorized_mean")
    assert(p.contains("BroadcastHashJoin"),
      s"cut points must broadcast back onto rows:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("ml_confusion / stat_anova_f: single map-side-partial hash-agg shape") {
    for (q <- Seq("ml_confusion", "stat_anova_f")) {
      val p = plan(q)
      assert(p.contains("partial_sum") || p.contains("partial_count"),
        s"$q must combine map-side:\n$p")
      assert(!p.contains("Join"), s"$q should be agg-only:\n$p")
    }
  }

  test("graph_scc / graph_condensation: readouts ride the materialized peel (ExistingRDD), no cartesian") {
    // the SCC labels come from the checkpointed iterative peel — the
    // consuming plans must read the materialized frames, never re-derive
    // the rounds (the graph_hits lineage discipline), and the quotient
    // join must stay an equi-join
    for (q <- Seq("graph_scc", "graph_condensation")) {
      val p = plan(q)
      assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
        s"$q must consume the checkpointed peel:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n$p")
    }
  }

  test("rec_hitrate: rollup rides the memoized hit-rank frame (ExistingRDD), no cartesian") {
    // the retrain + eval joins run once at the session memo's build
    // (recHitRanks — the recTop3 attribution discipline); the query plan
    // itself must be the materialized frame + one two-phase agg
    val p = plan("rec_hitrate")
    assert(!p.contains("CartesianProduct"), s"rec_hitrate grew a cartesian:\n$p")
    assert(p.contains("ExistingRDD"),
      s"rec_hitrate must consume the memoized hit ranks:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"rec_hitrate rollup must combine map-side:\n$p")
  }

  test("ml_tree_stump: split search is windows over bounded histograms, " +
      "apply is one broadcast of the 1-row model") {
    val p = plan("ml_tree_stump")
    assert(!p.contains("CartesianProduct"), s"stump grew a cartesian:\n$p")
    // the only nested-loop is the broadcast of the single best-split row
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"stump model must broadcast:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"histograms must combine map-side:\n$p")
  }

  test("dedup_canopy: candidate generation is the membership equi-join, never doc×doc") {
    val p = plan("dedup_canopy")
    assert(!p.contains("CartesianProduct"), s"canopy grew a cartesian:\n$p")
    assert(p.contains("ExistingRDD"),
      s"canopy must ride the checkpointed MIS frames:\n$p")
  }

  test("text_search_bm25_prox: distance band is EQUI-join keyed, top-20 bounded") {
    val p = plan("text_search_bm25_prox")
    assert(!p.contains("CartesianProduct"), s"prox grew a cartesian:\n$p")
    // the final plan sits on the CHECKPOINTED 20-row top frame (the
    // TakeOrderedAndProject lives inside that build); the only BNLJ is
    // the 20-row rank count-join against the plain scoring — its build
    // side must be the checkpointed 20-row frame, never the posting
    // lists (a per-doc position cross join with a band filter would
    // BNLJ those instead of the 16-offset (doc, pos) equi-join)
    assert(p.contains("ExistingRDD"),
      s"top-20/plain frames must ride their checkpoints:\n$p")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj <= 1, s"only the bounded rank count-join may BNLJ ($bnlj):\n$p")
  }

  test("ml_calibration_isotonic: bounded-bin minimax — no cartesian, partial aggs") {
    val p = plan("ml_calibration_isotonic")
    assert(!p.contains("CartesianProduct"), s"isotonic grew a cartesian:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"bin histogram must combine map-side:\n$p")
    assert(p.contains("ExistingRDD"),
      s"the cumulative-bin frame must ride its checkpoint:\n$p")
  }

  test("graph_quadrangles: one wedge equi-join + hash agg — no BNLJ, no cartesian") {
    val p = plan("graph_quadrangles")
    assert(!p.contains("CartesianProduct"), s"quadrangles grew a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the wedge self-join must stay an equi-join:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"codeg counts must combine map-side:\n$p")
  }

  test("ml_tree_boosted: rounds ride checkpointed reweights; vote lattice bounded") {
    val p = plan("ml_tree_boosted")
    assert(!p.contains("CartesianProduct"), s"boosted grew a cartesian:\n$p")
    assert(p.contains("ExistingRDD"),
      s"per-round train frames must ride their checkpoints:\n$p")
  }
}
