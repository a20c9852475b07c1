package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate for the bench's outlier-adjudication priors (r13 verdict #1).
  *
  * The r13 close shipped 2–6× inflated tail numbers because the prior
  * parser matched `"name":seconds` pairs against the driver's wrapper
  * `BENCH_r*.json`, where every pair is ESCAPED inside the `"tail"`
  * string (`\"name\":0.49`) — zero priors parsed, so the third-pass
  * adjudication was inert. This spec feeds BOTH on-disk shapes (a
  * verbatim driver-wrapper fixture and the flat self-produced line) and
  * pins that priors parse, wrapper scalars are excluded, and the 2×
  * threshold logic has real numbers to fire against.
  */
class BenchPriorSpec extends AnyFunSuite {

  test("driver-wrapper BENCH format (escaped tail) yields priors") {
    // Verbatim shape of the driver's artifact: metadata scalars + the
    // bench's stdout line re-embedded as one escaped JSON string. The
    // tail is truncated at the front mid-pair, as real captures are.
    val wrapper =
      """{
        |  "n": 13,
        |  "rc": 0,
        |  "cpus": 32,
        |  "sf": 0.1,
        |  "tail": "hens_d\":0.259,\"stat_cramers_v\":0.70268303,\"stat_levene\":0.91200342,\"text_compression_ratio\":0.702,\"graph_closeness\":5.39},\"calibration\":{\"first\":0.38,\"last\":0.27,\"pin\":0.33,\"ratio\":0.985,\"loadedStartRerun\":false,\"priorCount\":60},\"sf\":\"/root/testdata/sf0.1\"}",
        |  "parsed": null
        |}""".stripMargin
    val p = Bench.parsePriors(wrapper)
    assert(p.get("stat_cramers_v").contains(0.70268303))
    assert(p.get("text_compression_ratio").contains(0.702))
    assert(p.get("graph_closeness").contains(5.39))
    // wrapper scalars and calibration sub-keys must NOT look like priors
    // (incl. the r14 liveness field priorCount — the bench's OWN new
    // numeric output must not become next round's phantom prior)
    for (k <- Seq("n", "rc", "cpus", "sf", "first", "last", "pin", "ratio",
        "priorCount", "loadedStartRerun"))
      assert(!p.contains(k), s"wrapper key $k leaked into priors")
    // the 2x adjudication predicate now has a live prior to fire against:
    // a min-of-two of 4.16 s vs prior 0.702 s must trip the third pass
    assert(p("text_compression_ratio") * 2 < 4.16)
  }

  test("flat self-produced bench_out.json format still parses") {
    val flat =
      """{"metric":"total","value":228.5,"unit":"sec","queries":{"q1_agg":0.41,"graph_hits":6.5},"calibration":{"first":0.38,"last":0.27,"pin":0.33,"ratio":0.985},"sf":"/root/testdata/sf0.1"}"""
    val p = Bench.parsePriors(flat)
    assert(p.get("q1_agg").contains(0.41))
    assert(p.get("graph_hits").contains(6.5))
    assert(!p.contains("value") && !p.contains("pin"))
  }

  test("prior = MIN across rounds; one round's artifact cannot launder the next") {
    // The exact r14 failure: r13 recorded text_compression_ratio at 4.16 s
    // (itself an ambient artifact; honest r12 recording was 0.70 s). With
    // newest-only priors the 2× guard compared 7.63 < 2×4.16 and never
    // fired. Min-across-all-rounds keeps the honest 0.70 alive, so the
    // guard fires (7.63 > 2×0.70) no matter how many bad rounds intervene.
    val r12 = """{"metric":"total","queries":{"text_compression_ratio":0.70,"graph_hits":6.5}}"""
    val r13 = """{"n":13,"tail":"{\"queries\":{\"text_compression_ratio\":4.16,\"graph_hits\":5.8,\"cpus\":31}}"}"""
    val allow = Set("text_compression_ratio", "graph_hits")
    val p = Bench.minPriors(Seq(r12, r13), allow)
    assert(p("text_compression_ratio") == 0.70)
    assert(p("graph_hits") == 5.8)
    assert(7.63 > 2 * p("text_compression_ratio"), "guard must fire on the r14 artifact")
  }

  test("allowlist: unknown numeric keys can never become phantom priors") {
    // A future driver wrapper field ("budget":12.5) or bench field
    // ("sectionReruns":2) that no denylist anticipated must be dropped
    // because it is not in the known query universe.
    val txt = """{"queries":{"q1_agg":0.41,"budget":12.5,"sectionReruns":2}}"""
    val p = Bench.minPriors(Seq(txt), Set("q1_agg"))
    assert(p == Map("q1_agg" -> 0.41))
  }

  test("artifacts block: emitted, sorted, and inert to the prior allowlist") {
    // r15 verdict "what's wrong" #1: once-per-session memo builds (SCC
    // peel ~12 s, rec retrain ~8 s) escape every slot under min-over-
    // passes; the bench must emit their measured times as an
    // "artifacts" block so total + artifacts ≈ suite wall clock.
    val frag = Bench.artifactsJson(Map(
      "sccArtifacts" -> 12.0345, "recHitRanks" -> 8.1,
      "warmup:graph_communities" -> 2.345))
    assert(frag.startsWith(",\"artifacts\":{"), frag)
    assert(frag.contains("\"sccArtifacts\":12.035"))
    assert(frag.contains("\"warmup:graph_communities\":2.345"))
    // empty map → no block (subset runs that touch no memoized family)
    assert(Bench.artifactsJson(Map.empty) == "")
    // a full bench line CONTAINING the block must not leak artifact
    // figures into query priors: memo names are not registry names and
    // warmup keys carry ':' (unmatchable by the pair regex) — and the
    // allowlist drops anything else.
    val line = """{"metric":"total","value":100.0,"queries":{"graph_scc":0.28}""" +
      frag + ""","sf":"/root/testdata/sf0.1"}"""
    val p = Bench.minPriors(Seq(line), Set("graph_scc", "graph_communities"))
    assert(p == Map("graph_scc" -> 0.28), s"artifact leaked into priors: $p")
  }

  test("MemoTimings: first build wins, snapshot scoped to the application") {
    MemoTimings.record("appA", "fam", 5.0)
    MemoTimings.record("appA", "fam", 9.0) // re-build after eviction: keep first
    assert(MemoTimings.snapshot("appA")("fam") == 5.0)
    MemoTimings.record("appB", "other", 1.0) // new app purges the old one's entries
    assert(MemoTimings.snapshot("appA").isEmpty)
    assert(MemoTimings.snapshot("appB") == Map("other" -> 1.0))
  }

  test("real BENCH_r13.json on disk parses to a non-empty prior map") {
    val f = new java.io.File("BENCH_r13.json")
    assume(f.exists(), "driver artifact present in working directory")
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath))
    val p = Bench.parsePriors(txt)
    assert(p.nonEmpty, "zero priors parsed from the real driver artifact")
    // spot: every parsed value is a plausible seconds reading
    assert(p.values.forall(v => v >= 0 && v < 10000))
  }
}
