package graft.analytics

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QuerySpec

/** Training-data pipeline mechanics beyond dedup/similarity/text-stats:
  * the operators that turn a cleaned corpus into training input —
  * stratified sampling, deterministic global shuffle + sharding for data
  * loaders, and packing documents into fixed token budgets. All are
  * absent from the reference (north-star surface) and all are
  * deterministic by construction: randomness comes from md5 of the row
  * key, never rand(), so retries, replays, and both engines agree row
  * for row.
  *
  * Scale posture: every stage is a per-row map plus at most one windowed
  * shuffle on the shard key — shard count scales with the cluster, no
  * global sort, no driver-side state.
  */
object PipelineQueries {

  /** Order-3 Hilbert curve: d at index y*8+x — the layout_hilbert
    * lookup table, generated from the standard xy→d rotation recurrence
    * (AnalyticsSpec re-derives it from that recurrence and checks path
    * adjacency + permutation).
    */
  val HilbertLut8: Seq[Long] = Seq(
    0, 3, 4, 5, 58, 59, 60, 63, 1, 2, 7, 6, 57, 56, 61, 62,
    14, 13, 8, 9, 54, 55, 50, 49, 15, 12, 11, 10, 53, 52, 51, 48,
    16, 17, 30, 31, 32, 33, 46, 47, 19, 18, 29, 28, 35, 34, 45, 44,
    20, 23, 24, 27, 36, 39, 40, 43, 21, 22, 25, 26, 37, 38, 41, 42
  ).map(_.toLong)

  /** Hex md5 of the doc id — the deterministic "random" key. String
    * comparison of the hex form is identical across engines.
    */
  private val hkeySpark = "md5(cast(doc_id as string))"
  private val hkeyDuck = "md5(CAST(doc_id AS VARCHAR))"

  /** First 8 md5 hex digits as an integer in [0, 2^32). */
  private val bucketSpark = s"cast(conv(substring($hkeySpark, 1, 8), 16, 10) as long)"
  private val bucketDuck = s"('0x' || substr($hkeyDuck, 1, 8))::BIGINT"

  val all: Seq[QuerySpec] = Seq(

    // ───── curriculum manifest (r12): the composition query over two
    // r12 signals — READABILITY chooses the difficulty tier (the Flesch
    // milli-score thresholds at 60000/0, text_readability's exact
    // integer form) and NOVELTY orders within the tier (fresh-content
    // first, text_novelty's first-occurrence ppm) — producing the
    // deterministic curriculum a staged training run reads tier by
    // tier. The within-tier ordering is over document cardinality, so
    // the global position rides RankedPrefix partitioned by tier (range
    // exchange on (tier, novelty DESC, doc_id), per-pid windows,
    // broadcast offsets — PlanSpec-pinned); positions collapse to
    // integer deciles via ntile-from-rank, reported as the per-
    // (tier, decile) manifest with doc checksums. Docs under 3 tokens
    // carry no shingles and are excluded by the novelty inner join —
    // identical in the oracle by the shingle CTE's length filter.
    QuerySpec(
      "curation_curriculum",
      (s, d) => {
        val feats = Tables.documents(s, d)
          .withColumn("sents", expr(
            "greatest(1L, cast(size(regexp_extract_all(text, '[.!?]+', 0)) as bigint))"))
          .withColumn("words", expr(
            "greatest(1L, cast(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) as bigint))"))
          .withColumn("sylls", expr(
            "greatest(1L, cast(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) as bigint))"))
          .withColumn("fre_milli", expr(
            "206835L - (1015L * (words * 1000L div sents)) div 1000L" +
              " - (84600L * (sylls * 1000L div words)) div 1000L"))
          .withColumn("tier", expr(
            "case when fre_milli >= 60000 then 'easy' " +
              "when fre_milli >= 0 then 'standard' else 'hard' end"))
          .select("doc_id", "tier")
        val ex = Corpus.withShingles(Tables.documents(s, d))
          .select(col("doc_id"), explode(col("shingles")).as("g"))
        val firstSeen = ex.groupBy("g").agg(min("doc_id").as("first_doc"))
        val novelty = ex.join(firstSeen, "g")
          .groupBy("doc_id")
          .agg(expr(
            "sum(case when doc_id = first_doc then 1L else 0L end)" +
              " * 1000000 div count(1)").as("novelty_ppm"))
        val ranked = graft.ops.RankedPrefix(s, d, "curriculum",
          feats.join(novelty, "doc_id"),
          part = Seq("tier"),
          order = Seq(col("novelty_ppm").desc, col("doc_id")),
          rank = Some("pos"),
          totals = Seq(("n_tier", lit(1L))))
        ranked
          .withColumn("decile",
            graft.ops.RankedPrefix.ntileFromRank(col("pos"), col("n_tier"), 10))
          .groupBy("tier", "decile")
          .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("doc_sum"),
            min("novelty_ppm").as("min_nov"), max("novelty_ppm").as("max_nov"))
      },
      Some(s"""
        WITH feats0 AS (
          SELECT doc_id,
                 GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS sents,
                 GREATEST(1, len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS words,
                 GREATEST(1, len(regexp_extract_all(lower(text), '[aeiouy]+'))) AS sylls
          FROM documents),
        tiers AS (
          SELECT doc_id,
                 CASE WHEN 206835 - (1015 * (words * 1000 // sents)) // 1000
                           - (84600 * (sylls * 1000 // words)) // 1000 >= 60000
                      THEN 'easy'
                      WHEN 206835 - (1015 * (words * 1000 // sents)) // 1000
                           - (84600 * (sylls * 1000 // words)) // 1000 >= 0
                      THEN 'standard' ELSE 'hard' END AS tier
          FROM feats0),
        sh AS (${Corpus.shinglesSql("documents")}),
        ex AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
        fs AS (SELECT g, MIN(doc_id) AS first_doc FROM ex GROUP BY 1),
        nov AS (
          SELECT e.doc_id,
                 SUM(CASE WHEN e.doc_id = f.first_doc THEN 1 ELSE 0 END)
                   * 1000000 // COUNT(*) AS novelty_ppm
          FROM ex e JOIN fs f ON f.g = e.g GROUP BY 1),
        ranked AS (
          SELECT t.tier, n.doc_id, n.novelty_ppm,
                 CAST(NTILE(10) OVER (PARTITION BY t.tier
                   ORDER BY n.novelty_ppm DESC, n.doc_id) AS INTEGER) AS decile
          FROM tiers t JOIN nov n ON n.doc_id = t.doc_id)
        SELECT tier, decile, COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS doc_sum,
               CAST(MIN(novelty_ppm) AS BIGINT) AS min_nov,
               CAST(MAX(novelty_ppm) AS BIGINT) AS max_nov
        FROM ranked GROUP BY 1, 2""")),

    // ───── stratified sampling: per-language rates (en kept at 50%, the
    // rest at 10%) over the md5 bucket — the corpus-rebalancing step of a
    // multilingual mix. Aggregated per stratum so the oracle checks
    // MEMBERSHIP (count + char mass), not just sample size.
    QuerySpec(
      "sample_stratified",
      (s, d) => Tables.documents(s, d)
        .withColumn("bucket", expr(bucketSpark) % 100)
        .withColumn("rate", when(col("lang") === "en", 50).otherwise(10))
        .filter(col("bucket") < col("rate"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars")),
      Some(s"""
        SELECT lang, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE $bucketDuck % 100 < CASE WHEN lang = 'en' THEN 50 ELSE 10 END
        GROUP BY lang""")),

    // ───── temperature-weighted source mixing (r7): the multilingual /
    // multi-source rebalancing formula over the lang strata (the skewed
    // axis in this corpus: en ≈ 2.8× any other) — inclusion mass per
    // stratum ∝ n^α with α = 0.5, so dominant strata are damped and the tail
    // is upweighted relative to natural proportions (the standard
    // temperature-sampling curve, here at the sqrt point). Everything is
    // integer-deterministic across engines: weights are
    // floor(sqrt(n)·1000) (sqrt and the ×1000 are correctly-rounded
    // IEEE ops, floor exact — bit-identical on both engines), the
    // per-source keep RATE is one integer cross-multiply
    // (100·T·w) div (Σw·n_src) against the md5 bucket, and selection is
    // the hash-percentile filter — no window, no rand(), one broadcast
    // of a |sources|-row rate table against the scan. Aggregated per
    // source so the oracle checks membership mass, not just counts.
    QuerySpec(
      "sample_temperature",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .groupBy("lang").agg(count(lit(1)).as("n_src"))
          .withColumn("w", expr("cast(floor(sqrt(cast(n_src as double)) * 1000) as bigint)"))
        val tot = counts.agg(
          sum(col("w")).as("sumw"), sum(col("n_src")).as("n_total"))
        val rates = counts.crossJoin(broadcast(tot))
          .withColumn("rate", least(
            expr("(100 * (n_total DIV 4) * w) DIV (sumw * n_src)"), lit(100L)))
          .select("lang", "n_src", "rate")
        Tables.documents(s, d)
          .withColumn("bucket", expr(bucketSpark) % 100)
          .join(broadcast(rates), "lang")
          .filter(col("bucket") < col("rate"))
          .groupBy("lang")
          .agg(max(col("n_src")).as("n_src"), max(col("rate")).as("rate"),
            count(lit(1)).as("n_sel"), sum(col("n_chars")).as("sum_chars"))
      },
      Some(s"""
        WITH counts AS (
          SELECT lang, count(*) AS n_src,
                 CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000) AS BIGINT) AS w
          FROM documents GROUP BY lang),
        tot AS (
          SELECT CAST(SUM(w) AS BIGINT) AS sumw, CAST(SUM(n_src) AS BIGINT) AS n_total
          FROM counts),
        rates AS (
          SELECT lang, n_src,
                 LEAST((100 * (t.n_total // 4) * c.w) // (t.sumw * c.n_src), 100) AS rate
          FROM counts c, tot t)
        SELECT d.lang, CAST(MAX(r.n_src) AS BIGINT) AS n_src,
               CAST(MAX(r.rate) AS BIGINT) AS rate,
               count(*) AS n_sel, CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
        FROM documents d JOIN rates r USING (lang)
        WHERE $bucketDuck % 100 < r.rate
        GROUP BY d.lang""")),

    // ───── deterministic shuffle + shard assignment: the data-loader
    // layout step. Order within a shard is the md5 hex order — a stable
    // pseudo-random permutation — and shards are md5-bucketed, so the
    // whole layout is reproducible from the doc ids alone. One shuffle
    // (by shard), position by row_number within it; shard count is
    // DERIVED from corpus size (Corpus.layoutShards: per-shard rows
    // pinned near 4096), so the per-shard window stage keeps
    // cluster-width parallelism at 100× — the oracle derives the same
    // width from the same count in pure-integer SQL.
    QuerySpec(
      "shard_assign",
      (s, d) => {
        val nsh = Corpus.layoutShards(Corpus.docCount(s, d))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("hkey"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), expr(hkeySpark).as("hkey"))
          .withColumn("shard", (expr(s"cast(conv(substring(hkey, 1, 8), 16, 10) as long)") % nsh).cast("int"))
          .withColumn("pos", row_number().over(w))
          .select("doc_id", "shard", "pos")
      },
      Some(s"""
        WITH swidth AS (
          SELECT (${Corpus.layoutShardsSqlCase("n")}) AS nsh
          FROM (SELECT count(*) AS n FROM documents))
        SELECT doc_id, shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hkey, doc_id) AS INTEGER) AS pos
        FROM (SELECT doc_id, $hkeyDuck AS hkey,
                     CAST(('0x' || substr($hkeyDuck, 1, 8))::BIGINT % p.nsh AS INTEGER) AS shard
              FROM documents, swidth p)""")),

    // ───── cluster-balanced sampling: equal-size per-cluster draws (≤8,
    // md5-ordered so the draw is deterministic and rand-free) — the
    // diversity-preserving curation step that stops dominant clusters
    // from swamping the mix. Sign-LSH buckets stand in for the cluster
    // id here because the DuckDB oracle must reproduce the clustering;
    // with trained clusters the same query runs off
    // Clustering.kmeans/assignToCentroids output (no oracle — float
    // centroids, documented at V4). One shuffle (the per-bucket window).
    QuerySpec(
      "sample_cluster_balanced",
      (s, d) => {
        // cluster count (bucket width) scales with corpus size, same
        // derivation both engines — see Corpus.signBucketBits
        val bits = Corpus.signBucketBits(Corpus.vecCount(s, d))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy(col("hkey"), col("vec_id"))
        Corpus.quantizedVectors(s, d)
          .withColumn("bucket", Corpus.signBucketColBits(bits))
          .withColumn("hkey", expr("md5(concat('cb_', cast(vec_id as string)))"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 8)
          .select(col("vec_id"), col("bucket"), col("rk"))
      },
      Some(s"""
        WITH vwidth AS (
          SELECT (${Corpus.signBucketBitsSqlCase("n")}) AS bits
          FROM (SELECT count(*) AS n FROM embeddings))
        SELECT vec_id, bucket, rk FROM (
          SELECT vec_id, bucket,
                 CAST(ROW_NUMBER() OVER (PARTITION BY bucket
                                         ORDER BY hkey, vec_id) AS INTEGER) AS rk
          FROM (SELECT vec_id, ${Corpus.signBucketSqlBits("p.bits")} AS bucket,
                       md5('cb_' || CAST(vec_id AS VARCHAR)) AS hkey
                FROM (${Corpus.quantizedVectorsSql}), vwidth p))
        WHERE rk <= 8""")),

    // ───── sequence packing: fill 2048-token context windows per shard.
    // Offset-based packing: docs are laid out in shard order and a doc
    // ───── Padding-waste accounting (r16): the OTHER batching policy —
    // pack_sequences concatenates; many training stacks instead pad
    // each document to a fixed context length and pay the padding as
    // wasted FLOPs. For each candidate context length L ∈ {512, 1024,
    // 2048, 4096}: documents that FIT (tokens ≤ L), their token mass,
    // the padded capacity they consume (n_fit·L), the overflow mass
    // that must truncate or split, and utilization in exact ppm — the
    // table that picks L (too small truncates, too large pads; the
    // measured elbow is the decision). One token-estimate map + one
    // hash-agg per L over the same frame (ceil(chars/4), the
    // text_tokens proxy); no data-sized anything.
    QuerySpec(
      "pack_padding_waste",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(expr("cast(ceil(length(text) / 4.0) as bigint)").as("t"))
          .localCheckpoint(true) // reused by the 4 candidate lengths
        Seq(512L, 1024L, 2048L, 4096L).map { l =>
          toks.agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("t") <= l, 1L).otherwise(0L)).as("n_fit"),
            sum(when(col("t") <= l, col("t")).otherwise(0L)).as("fit_tokens"),
            sum(when(col("t") > l, col("t")).otherwise(0L)).as("overflow_tokens"))
            .select(lit(l).as("ctx_len"), col("n_docs"), col("n_fit"),
              col("fit_tokens"),
              (col("n_fit") * l).as("padded_capacity"),
              col("overflow_tokens"),
              expr(s"""case when n_fit > 0
                       then cast(cast(fit_tokens as decimal(38,0)) * 1000000
                            div (n_fit * ${l}L) as bigint)
                       else 0 end""").as("utilization_ppm"))
        }.reduce(_ unionByName _)
      },
      Some {
        val one = (l: Int) => s"""
        SELECT CAST($l AS BIGINT) AS ctx_len, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN t <= $l THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_fit,
               CAST(SUM(CASE WHEN t <= $l THEN t ELSE 0 END) AS BIGINT)
                 AS fit_tokens,
               CAST(SUM(CASE WHEN t <= $l THEN 1 ELSE 0 END) * $l AS BIGINT)
                 AS padded_capacity,
               CAST(SUM(CASE WHEN t > $l THEN t ELSE 0 END) AS BIGINT)
                 AS overflow_tokens,
               CAST(CASE WHEN SUM(CASE WHEN t <= $l THEN 1 ELSE 0 END) > 0
                    THEN CAST(SUM(CASE WHEN t <= $l THEN t ELSE 0 END)
                         AS HUGEINT) * 1000000
                         // (SUM(CASE WHEN t <= $l THEN 1 ELSE 0 END) * $l)
                    ELSE 0 END AS BIGINT) AS utilization_ppm
        FROM toks"""
        s"""
        WITH toks AS MATERIALIZED (
          SELECT CAST(ceil(len(text) / 4.0) AS BIGINT) AS t FROM documents)
        ${Seq(512, 1024, 2048, 4096).map(one).mkString("\n        UNION ALL")}"""
      }),

    // belongs to the bin its FIRST token falls in (exclusive prefix sum /
    // 2048) — the streaming-friendly approximation of greedy bin packing
    // (no sequential dependency, one window pass; a doc spanning a
    // boundary stays in the earlier bin). Token estimate = ceil(chars/4),
    // the same BPE-ish proxy as text_tokens.
    QuerySpec(
      "pack_sequences",
      (s, d) => {
        val nsh = Corpus.layoutShards(Corpus.docCount(s, d))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("hkey"), col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        Tables.documents(s, d)
          .select(col("doc_id"), expr(hkeySpark).as("hkey"),
            expr("cast(ceil(n_chars / 4.0) as bigint)").as("tok"))
          .withColumn("shard", (expr(s"cast(conv(substring(hkey, 1, 8), 16, 10) as long)") % nsh).cast("int"))
          .withColumn("cum", sum(col("tok")).over(w))
          .select(col("doc_id"), col("shard"), col("tok"),
            floor((col("cum") - col("tok")) / 2048).as("bin"),
            (col("cum") - col("tok") - floor((col("cum") - col("tok")) / 2048) * 2048)
              .as("bin_offset"))
      },
      Some(s"""
        WITH swidth AS (
          SELECT (${Corpus.layoutShardsSqlCase("n")}) AS nsh
          FROM (SELECT count(*) AS n FROM documents))
        SELECT doc_id, shard, tok,
               CAST(floor((cum - tok) / 2048) AS BIGINT) AS bin,
               CAST(cum - tok - floor((cum - tok) / 2048) * 2048 AS BIGINT) AS bin_offset
        FROM (
          SELECT doc_id, shard, tok,
                 CAST(SUM(tok) OVER (PARTITION BY shard ORDER BY hkey, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM (SELECT doc_id, $hkeyDuck AS hkey,
                       CAST(('0x' || substr($hkeyDuck, 1, 8))::BIGINT % p.nsh AS INTEGER) AS shard,
                       CAST(ceil(n_chars / 4.0) AS BIGINT) AS tok
                FROM documents, swidth p))""")),

    // ───── dedup-aware content-addressed chunk packing (r7): the stage
    // AFTER text_chunk_overlap + dedup_chunks in a RAG/embedding
    // pipeline — duplicated chunks collapse to ONE canonical copy (min
    // (doc_id, chunk_id) per content id, an agg + self-join, never a
    // window over the full chunk stream), then the UNIQUE chunks lay
    // out content-addressed: shard and order come from chunk_md5
    // itself, so the layout is reproducible from content alone and
    // uniform by construction (md5 keys don't skew). Offset packing
    // into 512-token bins via the per-shard prefix sum; per-shard
    // report (chunks, tokens, bins) keeps the oracle compact. Every
    // duplicated chunk that collapses here is an embedding call saved
    // BEFORE the embedder sees the batch.
    QuerySpec(
      "pack_chunks_deduped",
      (s, d) => {
        val cw = 120; val step = 90
        val chunks = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), length(col("text")).as("len"))
          .withColumn("nchunks",
            expr(s"1 + (CASE WHEN len > $cw THEN len - $cw ELSE 0 END + $step - 1) DIV $step"))
          .select(col("doc_id"), col("text"),
            explode(expr("sequence(0, nchunks - 1)")).as("i"))
          .select(col("doc_id"), col("i").cast("int").as("chunk_id"),
            expr(s"substring(text, i * $step + 1, $cw)").as("c"))
          .select(col("doc_id"), col("chunk_id"),
            md5(col("c")).as("chunk_md5"),
            length(col("c")).cast("long").as("chunk_len"))
        val canonical = chunks.groupBy("chunk_md5")
          .agg(min(struct(col("doc_id"), col("chunk_id"))).as("first"))
          .select(col("chunk_md5"),
            col("first.doc_id").as("doc_id"), col("first.chunk_id").as("chunk_id"))
        // shard width derived from the UNIQUE chunk count (the rows the
        // per-shard window actually carries); memoized one extra
        // distinct-count pass — control-plane for a layout job
        val nsh = Corpus.layoutShards(
          Corpus.countCached(s, d, "uniqueChunks120x90")(
            chunks.select("chunk_md5").distinct().count()))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("chunk_md5")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        chunks.join(canonical, Seq("chunk_md5", "doc_id", "chunk_id"))
          .withColumn("tok", expr("cast(ceil(chunk_len / 4.0) as bigint)"))
          .withColumn("shard",
            (expr("cast(conv(substring(chunk_md5, 1, 8), 16, 10) as long)") % nsh).cast("int"))
          .withColumn("cum", sum(col("tok")).over(w))
          .withColumn("bin", floor((col("cum") - col("tok")) / 512))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_chunks"), sum(col("tok")).as("n_tokens"),
            (max(col("bin")) + 1).as("n_bins"))
      },
      Some(s"""
        WITH chunks AS (
          SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
                 md5(substr(text, i * 90 + 1, 120)) AS chunk_md5,
                 CAST(len(substr(text, i * 90 + 1, 120)) AS BIGINT) AS chunk_len
          FROM (
            SELECT doc_id, text,
                   unnest(range(0,
                     1 + ((CASE WHEN len(text) > 120 THEN len(text) - 120 ELSE 0 END) + 89) // 90))
                     AS i
            FROM documents)),
        canonical AS (
          SELECT chunk_md5,
                 MIN(struct_pack(doc_id := doc_id, chunk_id := chunk_id)) AS first
          FROM chunks GROUP BY chunk_md5),
        kept AS (
          SELECT c.chunk_md5, c.chunk_len
          FROM chunks c JOIN canonical k
            ON c.chunk_md5 = k.chunk_md5
           AND c.doc_id = (k.first).doc_id AND c.chunk_id = (k.first).chunk_id),
        swidth AS (
          SELECT (${Corpus.layoutShardsSqlCase("n")}) AS nsh
          FROM (SELECT count(*) AS n FROM canonical)),
        laid AS (
          SELECT chunk_md5,
                 CAST(ceil(chunk_len / 4.0) AS BIGINT) AS tok,
                 CAST(('0x' || substr(chunk_md5, 1, 8))::BIGINT % p.nsh AS INTEGER) AS shard
          FROM kept, swidth p),
        packed AS (
          SELECT shard, tok,
                 CAST(SUM(tok) OVER (PARTITION BY shard ORDER BY chunk_md5
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM laid)
        SELECT shard, count(*) AS n_chunks,
               CAST(SUM(tok) AS BIGINT) AS n_tokens,
               CAST(MAX(floor((cum - tok) / 512)) + 1 AS BIGINT) AS n_bins
        FROM packed GROUP BY shard""")),

    // ───── END-TO-END prep pipeline: curation verdicts → keep only →
    // deterministic sharding → offset packing → per-shard layout report
    // (docs, token mass, 2048-token bins). One query composing the
    // verified stages exactly as a production run would chain them: the
    // dedup/contamination/quality signals decide membership, the md5
    // layout decides placement, the prefix-sum packing decides the bin
    // plan. Cost on top of the funnel is ONE windowed shuffle (the
    // per-shard prefix sum) and a final 8-row aggregate.
    QuerySpec(
      "pipeline_end_to_end",
      (s, d) => {
        // layout capacity planned from CORPUS size (pre-funnel), so the
        // shard plan is stable across curation-threshold tweaks; kept
        // mass is a corpus-proportional fraction, so per-shard rows stay
        // pinned the same way
        val nsh = Corpus.layoutShards(Corpus.docCount(s, d))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("hkey"), col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        DedupQueries.curationVerdicts(s, d)
          .filter(col("verdict") === "keep")
          .select(col("doc_id"),
            expr("cast(ceil(length(text) / 4.0) as bigint)").as("tok"),
            expr(hkeySpark).as("hkey"))
          .withColumn("shard",
            (expr(s"cast(conv(substring(hkey, 1, 8), 16, 10) as long)") % nsh).cast("int"))
          .withColumn("cum", sum(col("tok")).over(w))
          .withColumn("bin", floor((col("cum") - col("tok")) / 2048))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
            (max(col("bin")) + 1).as("n_bins"))
      },
      Some(s"""
        WITH ${graft.analytics.DedupQueries.curationVerdictsCtes},
        swidth AS (
          SELECT (${Corpus.layoutShardsSqlCase("n")}) AS nsh
          FROM (SELECT count(*) AS n FROM documents)),
        kept AS (
          SELECT doc_id, CAST(ceil(len(text) / 4.0) AS BIGINT) AS tok,
                 $hkeyDuck AS hkey,
                 CAST(('0x' || substr($hkeyDuck, 1, 8))::BIGINT % p.nsh AS INTEGER) AS shard
          FROM verdicts, swidth p WHERE verdict = 'keep'),
        packed AS (
          SELECT shard, tok,
                 CAST(SUM(tok) OVER (PARTITION BY shard ORDER BY hkey, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM kept)
        SELECT shard, count(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS n_tokens,
               CAST(MAX(floor((cum - tok) / 2048)) AS BIGINT) + 1 AS n_bins
        FROM packed GROUP BY shard""")),

    // ───── per-source cap: at most 20 documents from any single source,
    // chosen by the deterministic md5 order — the domain-cap step that
    // keeps one over-represented crawl domain from dominating a training
    // mix. One windowed shuffle on the source key; at corpus scale this
    // is the same per-group top-k shape as sample_cluster_balanced, and
    // skewed sources cost their own partition only (AQE splits them).
    QuerySpec(
      "sample_source_cap",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("hkey"), col("doc_id"))
        Tables.documents(s, d)
          .withColumn("hkey", expr("md5(concat('sc_', cast(doc_id as string)))"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 20)
          .select(col("doc_id"), col("source"), col("rk"))
      },
      Some("""
        SELECT doc_id, source, rk FROM (
          SELECT doc_id, source,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY md5('sc_' || CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
          FROM documents)
        WHERE rk <= 20""")),

    // ───── weighted source mix: the training-mix constructor. Target
    // weights per source class (here: every 4th source up-weighted 4:1)
    // turn a global budget into per-source quotas by pure integer
    // arithmetic — quota_s = (budget · w_s) div Σw, with Σw summed over
    // the DISTINCT sources actually present, so the same weights adapt
    // to whatever sources a corpus slice contains — then each source
    // contributes its top-quota docs in md5 order. Deterministic,
    // rand-free, and exactly reproducible across engines (the
    // integer-oracle rule: div on both sides, never float weights).
    // Scale: the source→(w, quota) table is distinct-source-sized and
    // broadcast; one windowed shuffle ranks within source. This and a
    // per-source cap (above) compose into mix rebalancing — cap the
    // over-crawled sources, then fill to target proportions.
    QuerySpec(
      "sample_weighted_mix",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val srcW = docs.select(col("source")).distinct()
          .withColumn("srcw", expr(
            "case when cast(regexp_extract(source, '([0-9]+)', 1) as int) % 4 = 0 " +
              "then 4L else 1L end"))
        val tot = srcW.agg(sum(col("srcw")).as("totw"))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("hkey"), col("doc_id"))
        docs
          .join(broadcast(srcW), "source")
          .crossJoin(broadcast(tot))
          .withColumn("quota", expr("cast((200 * srcw) div totw as bigint)"))
          .withColumn("hkey", expr("md5(concat('wm_', cast(doc_id as string)))"))
          .withColumn("rk", row_number().over(win).cast("int"))
          .filter(col("rk") <= col("quota"))
          .select(col("doc_id"), col("source"), col("rk"), col("quota"))
      },
      Some("""
        WITH srcw AS (
          SELECT source, CASE WHEN CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4 = 0
                              THEN 4 ELSE 1 END AS w
          FROM (SELECT DISTINCT source FROM documents)),
        tot AS (SELECT CAST(SUM(w) AS BIGINT) AS W FROM srcw),
        ranked AS (
          SELECT d.doc_id, d.source,
                 CAST(ROW_NUMBER() OVER (PARTITION BY d.source
                   ORDER BY md5('wm_' || CAST(d.doc_id AS VARCHAR)), d.doc_id) AS INTEGER) AS rk,
                 CAST((200 * s.w) // t.W AS BIGINT) AS quota
          FROM documents d JOIN srcw s USING (source) CROSS JOIN tot t)
        SELECT doc_id, source, rk, quota FROM ranked WHERE rk <= quota""")),

    // ───── rank-based tail trimming: drop each source's shortest and
    // longest 5% of docs by ORDINAL RANK (row_number over (n_chars,
    // doc_id)), not by percentile VALUE — rank cutoffs are pure integer
    // arithmetic (n div 20 off each end), so both engines agree exactly
    // where percentile interpolation rules would diverge. The
    // winsorization step of corpus curation: truncation artifacts at
    // the short end, concatenation/scrape artifacts at the long end.
    // One windowed shuffle (rank and per-source count share the
    // partition).
    QuerySpec(
      "sample_trim_tails",
      (s, d) => {
        val part = org.apache.spark.sql.expressions.Window.partitionBy("source")
        val byLen = part.orderBy(col("n_chars"), col("doc_id"))
        Tables.documents(s, d)
          .withColumn("rk", row_number().over(byLen).cast("int"))
          .withColumn("n", count(lit(1)).over(part))
          .filter(col("rk") > expr("n div 20") &&
            col("rk") <= col("n") - expr("n div 20"))
          .select(col("doc_id"), col("source"), col("rk"))
      },
      Some("""
        WITH ranked AS (
          SELECT doc_id, source, n_chars,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS INTEGER) AS rk,
                 CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
          FROM documents)
        SELECT doc_id, source, rk FROM ranked
        WHERE rk > n // 20 AND rk <= n - n // 20""")),

    // ───── key-skew profile: the one-row report you run BEFORE choosing
    // a join strategy — key cardinality, max and median rows per key
    // (median by ordinal position, engine-exact), and how many rows the
    // top 1% of keys hold. A top-heavy profile is the signal to salt
    // (ops/Salting) or lean on AQE skew handling; a flat one says plain
    // hash partitioning is fine. The data crosses ONE shuffle (the
    // per-key count agg with map-side partials); the per-key COUNT
    // table is key-cardinality-sized — which SCALES WITH DATA, so the
    // ranking rides RankedPrefix's two-phase machinery (r11; the bare
    // global window this query used through r10 was one task at any
    // scale) and collapses to a single summary row.
    QuerySpec(
      "profile_key_skew",
      (s, d) => {
        val per = Tables.orders(s, d)
          .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n"))
        graft.ops.RankedPrefix(s, d, "keySkew", per,
            part = Nil, order = Seq(col("n").desc, col("k")),
            rank = Some("r"),
            totals = Seq(("nk", lit(1L)), ("total", col("n"))))
          .agg(
            max(col("nk")).as("n_keys"),
            max(col("total")).as("n_rows"),
            max(when(col("r") === 1, col("n"))).as("max_per_key"),
            max(when(col("r") === expr("(nk + 1) div 2"), col("n"))).as("median_per_key"),
            sum(when(col("r") * 100 <= col("nk"), col("n")).otherwise(lit(0L)))
              .as("top1pct_rows"))
      },
      Some("""
        WITH per AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY 1),
        ranked AS (
          SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, k) AS r,
                 COUNT(*) OVER () AS nk,
                 CAST(SUM(n) OVER () AS BIGINT) AS total
          FROM per)
        SELECT
          CAST(MAX(nk) AS BIGINT) AS n_keys,
          CAST(MAX(total) AS BIGINT) AS n_rows,
          CAST(MAX(CASE WHEN r = 1 THEN n END) AS BIGINT) AS max_per_key,
          CAST(MAX(CASE WHEN r = (nk + 1) // 2 THEN n END) AS BIGINT) AS median_per_key,
          CAST(SUM(CASE WHEN r * 100 <= nk THEN n ELSE 0 END) AS BIGINT) AS top1pct_rows
        FROM ranked""")),

    // ───── corpus report: doc/token/char/est-token mass per (lang,
    // source) with rollup subtotals and a grand total — the one-page
    // summary a curation run ships with its output (and the sanity
    // check that a mix change did what it claimed). One rollup hash-agg
    // with map-side partials; grouping_id disambiguates subtotal rows
    // from real NULL groups.
    QuerySpec(
      "corpus_stats",
      (s, d) => Tables.documents(s, d)
        .rollup("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(expr("size(split(text, ' '))")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars_total"),
          sum(expr("cast(ceil(length(text) / 4.0) as bigint)")).as("est_tokens"),
          grouping_id().cast("int").as("lvl")),
      Some("""
        SELECT lang, source, count(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
               CAST(SUM(CAST(ceil(len(text) / 4.0) AS BIGINT)) AS BIGINT) AS est_tokens,
               CAST(GROUPING(lang) * 2 + GROUPING(source) AS INTEGER) AS lvl
        FROM documents GROUP BY ROLLUP (lang, source)""")),

    // ───── Z-order clustering + zone-map skipping (r9): the multi-
    // dimensional file-layout operator (Delta/Iceberg OPTIMIZE ZORDER)
    // with its EFFECT measured, not asserted. Rows map to equi-width
    // value buckets bp/bs ∈ [0,256) on (l_partkey, l_suppkey) — the
    // bucket bounds come from ONE broadcast scalar max, no rank window —
    // then z = bit-interleave(bp, bs) and 64 model "files" are the
    // z-ranges (z div 1024); the comparison layout sorts by partkey
    // alone (bp div 4). Per-file min/max of BOTH keys is exactly the
    // parquet row-group zone map; for three mid-range predicate boxes
    // (pk-only, sk-only, conjunctive) the query reports how many files a
    // min/max-pruning scan must touch under each layout. The measured
    // contract: linear prunes only its sort key (sk-pred scans ALL
    // files); z-order prunes BOTH axes and the conjunctive box touches
    // ~1 file — the reason multi-dim layout is worth a rewrite pass at
    // 100 TB (zone-map soundness is implicit: rows_matched rows always
    // live in scanned files). Everything integer-deterministic; the
    // whole pipeline is a map + one (layout,file) hash-agg over 128
    // groups + a 3-way explode of the zone table — file count scales
    // with data, no global sort (at cluster scale the write side is
    // repartitionByRange on z, identical semantics).
    QuerySpec(
      "layout_zorder",
      (s, d) => {
        import org.apache.spark.sql.functions.broadcast
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        val mx = li.agg(max("pk").as("mxp"), max("sk").as("mxs"))
        val b = li.crossJoin(broadcast(mx))
          .withColumn("bp", expr("pk * 256L div (mxp + 1)"))
          .withColumn("bs", expr("sk * 256L div (mxs + 1)"))
          // the 8-step interleave unrolled to a flat integer expression:
          // the HOF form (aggregate over sequence(0,7)) allocated the
          // sequence and dispatched an interpreted lambda 8× per row —
          // off codegen, and measured as the query's dominant cost
          .withColumn("z", expr((0 until 8).map(i =>
            s"shiftleft((bp div ${1L << i}L) % 2, ${2 * i + 1}) + " +
              s"shiftleft((bs div ${1L << i}L) % 2, ${2 * i})")
            .mkString(" + ")))
          .withColumn("plo", expr("(mxp + 1) * 8 div 16"))
          .withColumn("phi", expr("(mxp + 1) * 9 div 16"))
          .withColumn("slo", expr("(mxs + 1) * 8 div 16"))
          .withColumn("shi", expr("(mxs + 1) * 9 div 16"))
        val layouts = b
          .withColumn("layout", lit("zorder")).withColumn("f", expr("z div 1024"))
          .unionByName(b
            .withColumn("layout", lit("linear_pk")).withColumn("f", expr("bp div 4")))
        layouts.groupBy("layout", "f")
          .agg(count(lit(1)).as("n_rows"),
            min("pk").as("min_pk"), max("pk").as("max_pk"),
            min("sk").as("min_sk"), max("sk").as("max_sk"),
            first("plo").as("plo"), first("phi").as("phi"),
            first("slo").as("slo"), first("shi").as("shi"),
            sum(expr("case when pk >= plo and pk < phi then 1L else 0L end")).as("m_pk"),
            sum(expr("case when sk >= slo and sk < shi then 1L else 0L end")).as("m_sk"),
            sum(expr("""case when pk >= plo and pk < phi
                         and sk >= slo and sk < shi then 1L else 0L end""")).as("m_both"))
          .withColumn("pred", explode(array(lit("pk"), lit("sk"), lit("both"))))
          .withColumn("scan", expr(
            """case pred
               when 'pk' then max_pk >= plo and min_pk < phi
               when 'sk' then max_sk >= slo and min_sk < shi
               else max_pk >= plo and min_pk < phi
                    and max_sk >= slo and min_sk < shi end"""))
          .withColumn("mrows", expr(
            "case pred when 'pk' then m_pk when 'sk' then m_sk else m_both end"))
          .groupBy("layout", "pred")
          .agg(count(lit(1)).as("files_total"),
            sum(expr("case when scan then 1L else 0L end")).as("files_scanned"),
            sum(expr("case when scan then n_rows else 0L end")).as("rows_scanned"),
            sum("mrows").as("rows_matched"))
      },
      Some("""
        WITH mx AS (SELECT MAX(l_partkey) AS mxp, MAX(l_suppkey) AS mxs FROM lineitem),
        b AS (
          SELECT l_partkey AS pk, l_suppkey AS sk,
                 l_partkey * 256 // (mxp + 1) AS bp,
                 l_suppkey * 256 // (mxs + 1) AS bs,
                 (mxp + 1) * 8 // 16 AS plo, (mxp + 1) * 9 // 16 AS phi,
                 (mxs + 1) * 8 // 16 AS slo, (mxs + 1) * 9 // 16 AS shi
          FROM lineitem, mx),
        zv AS (
          SELECT *, CAST(list_sum(list_transform(range(0, 8), i ->
                   (((bp >> i) & 1) << (2*i+1)) + (((bs >> i) & 1) << (2*i))))
                 AS BIGINT) AS z
          FROM b),
        layouts AS (
          SELECT 'zorder' AS layout, z // 1024 AS f, * FROM zv
          UNION ALL
          SELECT 'linear_pk' AS layout, bp // 4 AS f, * FROM zv),
        zones AS (
          -- plo..shi are global constants: grouping by them leaves the
          -- (layout, f) grouping unchanged and keeps them referencable
          SELECT layout, f, plo, phi, slo, shi, COUNT(*) AS n_rows,
                 MIN(pk) AS min_pk, MAX(pk) AS max_pk,
                 MIN(sk) AS min_sk, MAX(sk) AS max_sk,
                 CAST(SUM(CASE WHEN pk >= plo AND pk < phi
                               THEN 1 ELSE 0 END) AS BIGINT) AS m_pk,
                 CAST(SUM(CASE WHEN sk >= slo AND sk < shi
                               THEN 1 ELSE 0 END) AS BIGINT) AS m_sk,
                 CAST(SUM(CASE WHEN pk >= plo AND pk < phi
                               AND sk >= slo AND sk < shi
                               THEN 1 ELSE 0 END) AS BIGINT) AS m_both
          FROM layouts GROUP BY 1, 2, 3, 4, 5, 6),
        expanded AS (
          SELECT z.*, p.pred,
                 CASE p.pred
                   WHEN 'pk' THEN max_pk >= plo AND min_pk < phi
                   WHEN 'sk' THEN max_sk >= slo AND min_sk < shi
                   ELSE max_pk >= plo AND min_pk < phi
                        AND max_sk >= slo AND min_sk < shi END AS scan,
                 CASE p.pred WHEN 'pk' THEN m_pk WHEN 'sk' THEN m_sk
                   ELSE m_both END AS mrows
          FROM zones z, (SELECT unnest(['pk', 'sk', 'both']) AS pred) p)
        SELECT layout, pred, COUNT(*) AS files_total,
               CAST(SUM(CASE WHEN scan THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
               CAST(SUM(CASE WHEN scan THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
               CAST(SUM(mrows) AS BIGINT) AS rows_matched
        FROM expanded GROUP BY 1, 2""")),

    // ───── Hilbert-curve layout vs Z-order, measured (r9): the OTHER
    // space-filling curve — Hilbert's defining property is ADJACENCY
    // (consecutive codes are always grid-neighbors; verified for the
    // embedded table in AnalyticsSpec), where Z-order takes "seam
    // jumps" between quadrants. Clustering consequence (Moon et al.,
    // TKDE 2001): a predicate box touches the same cells under either
    // curve, but Hilbert packs them into FEWER CONTIGUOUS CODE RUNS —
    // fewer range requests / seeks against an ordered file set. Both
    // layouts are measured on the same 8×8 macro grid (64 files each):
    // files scanned by the zone map AND n_runs, the contiguous-run
    // count over scanned file ids. The order-3 curve is a 64-entry
    // LITERAL lookup table in both engines (at any fixed order the
    // xy→d bit recurrence is a plan-time constant — deeper grids embed
    // a bigger table or the unrolled transform, never per-row driver
    // work). Same harness as layout_zorder: one broadcast scalar max,
    // map + 64-group hash-agg; the run-count window orders ≤64 rows.
    QuerySpec(
      "layout_hilbert",
      (s, d) => {
        import org.apache.spark.sql.functions.broadcast
        val lutSql =
          "array(" + HilbertLut8.map(_ + "L").mkString(", ") + ")"
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        val mx = li.agg(max("pk").as("mxp"), max("sk").as("mxs"))
        val b = li.crossJoin(broadcast(mx))
          .withColumn("bp", expr("pk * 8L div (mxp + 1)"))
          .withColumn("bs", expr("sk * 8L div (mxs + 1)"))
          .withColumn("hd", expr(
            s"element_at($lutSql, cast(bs * 8 + bp as int) + 1)"))
          // unrolled like layout_zorder's z — no per-row HOF dispatch
          .withColumn("z", expr((0 until 3).map(i =>
            s"shiftleft((bp div ${1L << i}L) % 2, ${2 * i + 1}) + " +
              s"shiftleft((bs div ${1L << i}L) % 2, ${2 * i})")
            .mkString(" + ")))
          .withColumn("plo", expr("(mxp + 1) * 8 div 16"))
          .withColumn("phi", expr("(mxp + 1) * 9 div 16"))
          .withColumn("slo", expr("(mxs + 1) * 8 div 16"))
          .withColumn("shi", expr("(mxs + 1) * 9 div 16"))
        val layouts = b
          .withColumn("layout", lit("hilbert")).withColumn("f", col("hd"))
          .unionByName(b
            .withColumn("layout", lit("zorder8")).withColumn("f", col("z")))
        val zones = layouts.groupBy("layout", "f")
          .agg(count(lit(1)).as("n_rows"),
            min("pk").as("min_pk"), max("pk").as("max_pk"),
            min("sk").as("min_sk"), max("sk").as("max_sk"),
            first("plo").as("plo"), first("phi").as("phi"),
            first("slo").as("slo"), first("shi").as("shi"),
            sum(expr("case when pk >= plo and pk < phi then 1L else 0L end")).as("m_pk"),
            sum(expr("case when sk >= slo and sk < shi then 1L else 0L end")).as("m_sk"),
            sum(expr("""case when pk >= plo and pk < phi
                         and sk >= slo and sk < shi then 1L else 0L end""")).as("m_both"))
          .withColumn("pred", explode(array(lit("pk"), lit("sk"), lit("both"))))
          .withColumn("scan", expr(
            """case pred
               when 'pk' then max_pk >= plo and min_pk < phi
               when 'sk' then max_sk >= slo and min_sk < shi
               else max_pk >= plo and min_pk < phi
                    and max_sk >= slo and min_sk < shi end"""))
          .withColumn("mrows", expr(
            "case pred when 'pk' then m_pk when 'sk' then m_sk else m_both end"))
        val totals = zones.groupBy("layout", "pred")
          .agg(count(lit(1)).as("files_total"),
            sum(expr("case when scan then 1L else 0L end")).as("files_scanned"),
            sum(expr("case when scan then n_rows else 0L end")).as("rows_scanned"),
            sum("mrows").as("rows_matched"))
        val wr = org.apache.spark.sql.expressions.Window.partitionBy("layout", "pred").orderBy("f")
        val runs = zones.filter(col("scan"))
          .withColumn("pf", lag(col("f"), 1).over(wr))
          .withColumn("brk",
            expr("case when pf is null or f > pf + 1 then 1L else 0L end"))
          .groupBy("layout", "pred").agg(sum(col("brk")).as("n_runs"))
        totals.join(runs, Seq("layout", "pred"))
      },
      Some("""
        WITH lut AS (
          SELECT unnest(range(0, 64)) AS cell,
                 unnest([0, 3, 4, 5, 58, 59, 60, 63, 1, 2, 7, 6, 57, 56, 61, 62,
                         14, 13, 8, 9, 54, 55, 50, 49, 15, 12, 11, 10, 53, 52, 51, 48,
                         16, 17, 30, 31, 32, 33, 46, 47, 19, 18, 29, 28, 35, 34, 45, 44,
                         20, 23, 24, 27, 36, 39, 40, 43, 21, 22, 25, 26, 37, 38, 41, 42]) AS d),
        mx AS (SELECT MAX(l_partkey) AS mxp, MAX(l_suppkey) AS mxs FROM lineitem),
        b AS (
          SELECT l_partkey AS pk, l_suppkey AS sk,
                 l_partkey * 8 // (mxp + 1) AS bp,
                 l_suppkey * 8 // (mxs + 1) AS bs,
                 (mxp + 1) * 8 // 16 AS plo, (mxp + 1) * 9 // 16 AS phi,
                 (mxs + 1) * 8 // 16 AS slo, (mxs + 1) * 9 // 16 AS shi
          FROM lineitem, mx),
        hv AS (
          SELECT b.*, lut.d AS hd,
                 CAST(list_sum(list_transform(range(0, 3), i ->
                   (((bp >> i) & 1) << (2*i+1)) + (((bs >> i) & 1) << (2*i))))
                 AS BIGINT) AS z
          FROM b JOIN lut ON lut.cell = b.bs * 8 + b.bp),
        layouts AS (
          SELECT 'hilbert' AS layout, hd AS f, * FROM hv
          UNION ALL
          SELECT 'zorder8' AS layout, z AS f, * FROM hv),
        zones AS (
          SELECT layout, f, plo, phi, slo, shi, COUNT(*) AS n_rows,
                 MIN(pk) AS min_pk, MAX(pk) AS max_pk,
                 MIN(sk) AS min_sk, MAX(sk) AS max_sk,
                 CAST(SUM(CASE WHEN pk >= plo AND pk < phi
                               THEN 1 ELSE 0 END) AS BIGINT) AS m_pk,
                 CAST(SUM(CASE WHEN sk >= slo AND sk < shi
                               THEN 1 ELSE 0 END) AS BIGINT) AS m_sk,
                 CAST(SUM(CASE WHEN pk >= plo AND pk < phi
                               AND sk >= slo AND sk < shi
                               THEN 1 ELSE 0 END) AS BIGINT) AS m_both
          FROM layouts GROUP BY 1, 2, 3, 4, 5, 6),
        expanded AS (
          SELECT z.*, p.pred,
                 CASE p.pred
                   WHEN 'pk' THEN max_pk >= plo AND min_pk < phi
                   WHEN 'sk' THEN max_sk >= slo AND min_sk < shi
                   ELSE max_pk >= plo AND min_pk < phi
                        AND max_sk >= slo AND min_sk < shi END AS scan,
                 CASE p.pred WHEN 'pk' THEN m_pk WHEN 'sk' THEN m_sk
                   ELSE m_both END AS mrows
          FROM zones z, (SELECT unnest(['pk', 'sk', 'both']) AS pred) p),
        totals AS (
          SELECT layout, pred, COUNT(*) AS files_total,
                 CAST(SUM(CASE WHEN scan THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
                 CAST(SUM(CASE WHEN scan THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
                 CAST(SUM(mrows) AS BIGINT) AS rows_matched
          FROM expanded GROUP BY 1, 2),
        runs AS (
          SELECT layout, pred,
                 CAST(SUM(CASE WHEN pf IS NULL OR f > pf + 1
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
          FROM (
            SELECT layout, pred, f,
                   lag(f) OVER (PARTITION BY layout, pred ORDER BY f) AS pf
            FROM expanded WHERE scan)
          GROUP BY 1, 2)
        SELECT t.*, r.n_runs FROM totals t JOIN runs r USING (layout, pred)"""))
  ,

    // ───── leakage-safe holdout split (r9): train/val/test assignment
    // that keeps every near-dup CLUSTER on one side of the split — the
    // eval-integrity op (a test doc whose near-duplicate sits in train
    // is a leaked answer, the train/test contamination mode dedup alone
    // doesn't prevent when splits are drawn per-doc). Group id = the
    // doc's near-dup component label (singletons group as themselves);
    // the split hash is md5 of the GROUP id, so members move together.
    // The query runs BOTH strategies and audits them: per (strategy,
    // split), doc/group counts plus the number of near-dup pairs
    // straddling the split — measured 0 for group_hash, nonzero for
    // doc_hash (the naive split provably leaks on this corpus, the
    // grouped one provably doesn't — the property is oracle-gated, not
    // asserted). Cost: the pair graph + components are the dedup
    // pipeline's own artifacts (memoized here, tables in production);
    // the split itself is a map + two hash-aggs.
    QuerySpec(
      "split_grouped_holdout",
      (s, d) => {
        val pairs = DedupQueries.minhashPairs(s, d).select("doc_a", "doc_b")
        val labels = DedupQueries.componentsOf(s, d)
        val grouped = Corpus.docsWithNearDups(s, d).select("doc_id")
          .join(labels, Seq("doc_id"), "left")
          .withColumn("grp", coalesce(col("label"), col("doc_id")))
        val strat = grouped
          .select(col("doc_id"), col("grp"),
            lit("group_hash").as("strategy"), col("grp").as("skey"))
          .unionByName(grouped.select(col("doc_id"), col("grp"),
            lit("doc_hash").as("strategy"), col("doc_id").as("skey")))
          .withColumn("b", expr(
            "cast(conv(substring(md5(cast(skey as string)), 1, 8), 16, 10) as long) % 100"))
          .withColumn("split", expr(
            "case when b < 80 then 'train' when b < 90 then 'val' else 'test' end"))
        val stats = strat.groupBy("strategy", "split")
          .agg(count(lit(1)).as("n_docs"),
            count_distinct(col("grp")).as("n_groups"))
        val asg = strat.select(col("strategy").as("st"),
          col("doc_id").as("n"), col("split").as("sp"))
        val leak = pairs
          .join(asg.select(col("st"), col("n").as("doc_a"), col("sp").as("sa")), "doc_a")
          .join(asg.select(col("st").as("st2"), col("n").as("doc_b"), col("sp").as("sb")), "doc_b")
          .filter(col("st") === col("st2") && col("sa") =!= col("sb"))
          .select(col("st").as("strategy"),
            explode(array(col("sa"), col("sb"))).as("split"))
          .groupBy("strategy", "split")
          .agg(count(lit(1)).as("leak_pairs"))
        stats.join(leak, Seq("strategy", "split"), "left")
          .select(col("strategy"), col("split"), col("n_docs"), col("n_groups"),
            coalesce(col("leak_pairs"), lit(0L)).as("cross_split_pairs"))
      },
      Some(s"""
        WITH RECURSIVE corpus AS (${Corpus.docsWithNearDupsSql}),
        ${DedupQueries.hsetsCte},
        ${DedupQueries.minhashPairsCtes},
        edges AS (
          SELECT doc_a AS u, doc_b AS v FROM mpairs
          UNION
          SELECT doc_b AS u, doc_a AS v FROM mpairs),
        reach(src, dst) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
        comp AS (SELECT src AS doc_id, MIN(dst) AS lbl FROM reach GROUP BY src),
        grouped AS (
          SELECT c.doc_id, COALESCE(m.lbl, c.doc_id) AS grp
          FROM corpus c LEFT JOIN comp m ON m.doc_id = c.doc_id),
        strat AS (
          SELECT doc_id, grp, 'group_hash' AS strategy, grp AS skey FROM grouped
          UNION ALL
          SELECT doc_id, grp, 'doc_hash', doc_id FROM grouped),
        asg AS (
          SELECT strategy, doc_id, grp,
                 CASE WHEN b < 80 THEN 'train'
                      WHEN b < 90 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT *, ('0x' || substr(md5(CAST(skey AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
                FROM strat)),
        stats AS (
          SELECT strategy, split, COUNT(*) AS n_docs,
                 CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_groups
          FROM asg GROUP BY 1, 2),
        leak0 AS (
          SELECT a.strategy, a.split AS s1, b.split AS s2
          FROM mpairs p
          JOIN asg a ON a.doc_id = p.doc_a
          JOIN asg b ON b.doc_id = p.doc_b AND b.strategy = a.strategy
          WHERE a.split <> b.split),
        leak AS (
          SELECT strategy, split, COUNT(*) AS leak_pairs FROM (
            SELECT strategy, s1 AS split FROM leak0
            UNION ALL SELECT strategy, s2 FROM leak0)
          GROUP BY 1, 2)
        SELECT s.strategy, s.split, s.n_docs, s.n_groups,
               CAST(COALESCE(l.leak_pairs, 0) AS BIGINT) AS cross_split_pairs
        FROM stats s LEFT JOIN leak l USING (strategy, split)""")),

    // ───── Systematic 1-in-k sampling (r13): every 97th document in a
    // deterministic hash order — the equal-spacing complement to
    // sample_hash's threshold rule (systematic sampling guarantees the
    // sample is spread EVENLY through the (hashed) population, never
    // clustered, and its size is exactly ⌈n/97⌉ rather than
    // binomially distributed). The global position rides RankedPrefix
    // under the total order (md5(seed ‖ doc_id), doc_id) — the
    // rand-free md5-keyed discipline every sampler here follows; rank
    // % 97 = 1 picks the sample in both engines identically.
    QuerySpec(
      "sample_systematic",
      (s, d) => {
        val keyed = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            md5(concat(lit("sys13:"), col("doc_id").cast("string"))).as("h"))
        graft.ops.RankedPrefix(s, d, "sysSample", keyed,
            part = Nil, order = Seq(col("h"), col("doc_id")),
            rank = Some("r"))
          .filter(col("r") % 97 === 1)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sampled"),
            sum("doc_id").as("id_sum"),
            min("r").as("first_pos"), max("r").as("last_pos"))
      },
      Some("""
        WITH keyed AS (
          SELECT doc_id, lang,
                 md5('sys13:' || CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        ranked AS (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (ORDER BY h, doc_id) AS r
          FROM keyed)
        SELECT lang, COUNT(*) AS n_sampled,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum,
               CAST(MIN(r) AS BIGINT) AS first_pos,
               CAST(MAX(r) AS BIGINT) AS last_pos
        FROM ranked WHERE r % 97 = 1 GROUP BY 1""")),

    // ───── Token-budget cut (r13): the question every training run
    // actually asks — "I can afford B tokens; which documents make the
    // cut?" Documents rank under the declared priority order
    // (n_chars DESC — longest-first is the stated policy, any total
    // order slots in; doc_id tiebreak), the INCLUSIVE running token
    // sum rides RankedPrefix (corpus-proportional prefix sums shard;
    // the single-task window would be the job at 100 TB), and a doc is
    // IN iff its running sum ≤ B = 100k tokens. Per-language ledger
    // with id checksums hash-gates the exact cut set; the budget
    // boundary is deterministic because the order is total.
    QuerySpec(
      "curation_token_budget",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"),
            expr("size(split(text, ' '))").cast("long").as("tok"))
        graft.ops.RankedPrefix(s, d, "tokBudget", toks,
            part = Nil, order = Seq(col("n_chars").desc, col("doc_id")),
            rank = Some("r"), running = Seq(("cum_tok", col("tok"))))
          .withColumn("kept", col("cum_tok") <= 100000L)
          .groupBy("lang")
          .agg(
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            count(lit(1)).as("n_docs"),
            sum(when(col("kept"), col("tok")).otherwise(0L)).as("tok_kept"),
            sum(when(col("kept"), col("doc_id")).otherwise(0L)).as("kept_id_sum"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, lang, n_chars,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
          FROM documents),
        ranked AS (
          SELECT doc_id, lang, tok,
                 SUM(tok) OVER (ORDER BY n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
          FROM toks)
        SELECT lang,
               CAST(SUM(CASE WHEN cum_tok <= 100000 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN cum_tok <= 100000 THEN tok ELSE 0 END) AS BIGINT)
                 AS tok_kept,
               CAST(SUM(CASE WHEN cum_tok <= 100000 THEN doc_id ELSE 0 END) AS BIGINT)
                 AS kept_id_sum
        FROM ranked GROUP BY 1"""))
  )
}
