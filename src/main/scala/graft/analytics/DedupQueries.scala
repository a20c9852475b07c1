package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QuerySpec

/** Deduplication operator family over the `documents` / `embeddings`
  * corpora — the exact / near-dup surface a large-scale training-data
  * pipeline needs. The reference's only dedup is content-identity at the
  * queue (cdk/lib/cdk-stack.ts:48); everything beyond exact dedup is
  * north-star surface.
  *
  * Scale design, per operator:
  *  - exact: hash groupBy on content digest — one shuffle, map-side
  *    partial dedup, no O(n²) anywhere.
  *  - minhash_lsh: signatures are per-row map-only array expressions
  *    (no shuffle, codegen'd HOFs); the only shuffle is the band-bucket
  *    equi-join, whose buckets are tiny because the key is a 3-row minhash
  *    digest. Pairwise Jaccard runs ONLY on LSH candidates.
  *  - simhash: 32-bit signature, map-only; candidates via 4-byte banding
  *    (pigeonhole: hamming<=3 ⇒ at least one band equal, so banding is
  *    lossless for the threshold) — never an O(n²) cross join.
  *  - ngram_jaccard: the exact pairwise baseline, deliberately bounded to
  *    a fixed subset (doc_id<60 ∪ variants) — at scale this is the verify
  *    step applied to candidates, not a standalone full-corpus pass.
  *  - embed_cosine: near-dup pairs restricted to sign-LSH buckets; scoring
  *    uses exact integer dot/norms (Corpus.scoreSql).
  */
object DedupQueries {

  /** Universal-hash multipliers for the 12 minhash permutations:
    * h_p(x) = (A(p) * base(x)) & (2^40-1), base(x) = first 40 bits of
    * md5(x). One md5 per shingle instead of twelve — the md5 is the
    * expensive part — and the multiply-mask family keeps the permutations
    * independent enough for banding. All arithmetic stays below 2^60, so
    * both engines compute identical exact int64 values. Constants are
    * shared with the native signature expressions
    * (graft.functions.SignatureConstants) so Spark and the oracle agree
    * by construction.
    */
  private val minhashA = graft.functions.SignatureConstants.MinHashA
  private val mask40 = graft.functions.SignatureConstants.Mask40

  /** Distinct shingle-hash sets over the near-dup corpus — shared
    * (memoized per app+dir) by the minhash-LSH and decontamination
    * queries, which scan it from multiple join sides.
    */
  private def hsetsOf(s: org.apache.spark.sql.SparkSession, d: String) =
    Corpus.cached(s, d, "minhash_hsets") {
      Corpus.docsWithNearDups(s, d)
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"),
          graft.functions.SignatureFunctions.shingleHash40(
            graft.functions.TextHashFunctions.wordHash40(col("text"))).as("hs"))
    }

  val all: Seq[QuerySpec] = Seq(

    // ───── exact dedup: content-digest groupBy (map-side combine; the
    // SQS content-dedup semantic lifted to corpus scale)
    QuerySpec(
      "dedup_exact",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val withDups = docs.unionAll(docs.filter(col("doc_id") % 3 === 0))
        withDups
          .dropDuplicates() // full-row identity == digest identity here
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      },
      Some("""
        SELECT lang, source, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM (SELECT DISTINCT * FROM (
          SELECT * FROM documents
          UNION ALL SELECT * FROM documents WHERE doc_id % 3 = 0))
        GROUP BY lang, source""")),

    // ───── MinHash + LSH near-dup: 12 minhashes (4 bands × 3 rows),
    // band-bucket join for candidates, exact Jaccard >= 0.4 verify
    QuerySpec(
      "dedup_minhash_lsh",
      (s, d) => {
        // The whole query runs on NUMERIC shingle hashes: one md5 per
        // WORD (40 bits), a shingle hash combines three consecutive word
        // hashes with small multipliers (every product/sum stays under
        // 2^63 — both engines exact int64), and the candidate verify
        // computes Jaccard over the distinct hash sets. No per-shingle
        // string building or per-shingle md5 anywhere; collisions are
        // negligible and in any case identical across engines.
        // PERSISTED (memoized per app+dir): the hash sets feed the
        // signature pass and both verify rejoins (CollapseProject would
        // re-derive them per use).
        val hsets = hsetsOf(s, d)
        // Native minhash12 (graft.functions.MinHash12): 12 running minima
        // in ONE compiled loop — the SQL aggregate/zip_with fold allocated
        // a 12-array and dispatched 12 interpreted lambdas per shingle.
        // Band keys (4 md5s per doc) stay in SQL; they're cheap.
        val bkeys = hsets
          .select(col("doc_id"),
            graft.functions.SignatureFunctions.minHash12(col("hs")).as("mh"))
          .select(col("doc_id"), expr(
            """transform(sequence(0, 3),
                 b -> md5(concat(cast(element_at(mh, b*3 + 1) as string), '_',
                                 cast(element_at(mh, b*3 + 2) as string), '_',
                                 cast(element_at(mh, b*3 + 3) as string))))""").as("bkeys"))
        // Bands stay NARROW (doc_id, band, bkey): the 4-way explode and
        // the bucket self-join move ~40 bytes/row, not the shingle sets;
        // persisted (memoized) because the self-join scans it from both sides.
        val bands = Corpus.cached(s, d, "minhash_bands") {
          bkeys.select(col("doc_id"), posexplode(col("bkeys")).as(Seq("band", "bkey")))
        }
        val cand = bands.as("a")
          .join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .dropDuplicates("doc_a", "doc_b")
        cand
          .join(hsets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
          .join(hsets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
          .withColumn("jaccard", expr(
            "cast(size(array_intersect(hs_a, hs_b)) as double) / size(array_union(hs_a, hs_b))"))
          .filter(col("jaccard") >= 0.4)
          .select("doc_a", "doc_b", "jaccard")
      },
      Some(s"""
        WITH corpus AS (${Corpus.docsWithNearDupsSql}),
        hsets AS (
          SELECT doc_id,
                 list_distinct([(ws[i] * 1000003 + ws[i+1] * 1500007 + ws[i+2] * 2000003)
                                & ${mask40} for i in range(1, len(ws) - 1)]) AS hs
          FROM (SELECT doc_id,
                       list_transform(string_split(text, ' '),
                                      w -> ('0x' || substr(md5(w), 1, 10))::BIGINT) AS ws
                FROM corpus
                WHERE len(string_split(text, ' ')) >= 3)),
        sig AS (
          SELECT doc_id,
                 [CAST(list_min(list_transform(hs,
                    x -> (${minhashA.mkString("[", ", ", "]")}[p+1] * x) & ${mask40})) AS BIGINT)
                  for p in range(0, 12)] AS minhash
          FROM hsets),
        bands AS (
          SELECT doc_id, b.band,
                 md5(CAST(minhash[b.band*3+1] AS VARCHAR) || '_' ||
                     CAST(minhash[b.band*3+2] AS VARCHAR) || '_' ||
                     CAST(minhash[b.band*3+3] AS VARCHAR)) AS bkey
          FROM sig, (SELECT unnest(range(0, 4)) AS band) b),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
        SELECT c.doc_a, c.doc_b,
               CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.hs, sb.hs))) AS jaccard
        FROM cand c
        JOIN hsets sa ON sa.doc_id = c.doc_a
        JOIN hsets sb ON sb.doc_id = c.doc_b
        WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                / len(list_distinct(list_concat(sa.hs, sb.hs))) >= 0.4""")),

    // ───── SimHash near-dup: 32-bit weighted signature over word bigrams,
    // 4-byte banding (lossless for hamming<=3), hamming verify.
    // The oracle brute-forces the same signatures pairwise — identical
    // result set, since banding has exact recall at this threshold.
    QuerySpec(
      "dedup_simhash",
      (s, d) => {
        // Signature PACKED into one BIGINT by the native simhash32
        // expression (graft.functions.SimHash32): word hashes from
        // word_hash40 (one md5 per word, compiled loop), then bigrams +
        // 32 bit-counters + pack in a second compiled loop. The SQL fold
        // this replaces allocated a 32-array per bigram; the earlier
        // naive per-bit formulation re-derived the token→md5 chain for
        // every bit (CollapseProject inlining) — measured 30×+ slower.
        // Downstream hamming is bit_count(xor): two codegen'd machine ops
        // per candidate pair, which is what decides seconds-vs-minutes
        // when correlated corpora put thousands of docs in a band bucket.
        // persisted (memoized): 16 bytes/doc, scanned by both sides of the self-join
        val sig = Corpus.cached(s, d, "simhash_sig") {
          Corpus.docsWithNearDups(s, d)
            .select(col("doc_id"),
              graft.functions.SignatureFunctions.simHash32(
                graft.functions.TextHashFunctions.wordHash40(col("text"))).as("sig"))
        }
        val banded = sig
          .select(col("doc_id"), col("sig"), explode(expr("sequence(0, 3)")).as("band"))
          .withColumn("bkey", expr("cast(shiftright(sig, band * 8) & 255 as int)"))
        // hamming filter BEFORE pair-dedup: the filtered set is tiny, so
        // the dropDuplicates shuffle is over hundreds of rows, not millions
        banded.as("a")
          .join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            expr("cast(bit_count(a.sig ^ b.sig) as bigint)").as("hamming"))
          .filter(col("hamming") <= 3)
          .dropDuplicates("doc_a", "doc_b")
      },
      Some(s"""
        WITH corpus AS (${Corpus.docsWithNearDupsSql}),
        grams AS (
          SELECT doc_id,
                 [(ws[i] * 1000003 + ws[i+1] * 1500007) & ${mask40}
                  for i in range(1, len(ws))] AS th
          FROM (SELECT doc_id,
                       list_transform(string_split(text, ' '),
                                      w -> ('0x' || substr(md5(w), 1, 10))::BIGINT) AS ws
                FROM corpus)),
        sigs AS (
          SELECT doc_id,
                 CAST(list_sum([CASE WHEN CAST(list_sum(list_transform(th,
                        h -> CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END)) AS BIGINT) > 0
                       THEN (1::BIGINT << j) ELSE 0 END for j in range(0, 32)]) AS BIGINT) AS sig
          FROM grams),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3""")),

    // ───── exact n-gram Jaccard baseline on a bounded subset — the verify
    // primitive; full-corpus discovery belongs to minhash_lsh above.
    // The subset is ABSOLUTELY capped: the first 60 originals plus their
    // variants (doc_id+VariantOffset — an id range no original can reach)
    // — ≤120 docs at ANY corpus size, so the pairwise stage stays O(1) as
    // the corpus grows (the earlier bare modulo admitted 60 docs per
    // block, quadratic again in disguise)
    QuerySpec(
      "dedup_ngram_jaccard",
      (s, d) => {
        val off = Corpus.VariantOffset
        val sub = Corpus.withShingles(
          Corpus.docsWithNearDups(s, d)
            .filter(col("doc_id") < 60 ||
              (col("doc_id") >= off && col("doc_id") < off + 60)))
        sub.as("a")
          .join(sub.as("b"), col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            expr("cast(size(array_intersect(a.shingles, b.shingles)) as double) / size(array_union(a.shingles, b.shingles))")
              .as("jaccard"))
          .filter(col("jaccard") >= 0.3)
      },
      Some(s"""
        WITH corpus AS (${Corpus.docsWithNearDupsSql}),
        sub AS (${Corpus.shinglesSql("corpus")}
                AND (doc_id < 60 OR (doc_id >= ${Corpus.VariantOffset}
                                     AND doc_id < ${Corpus.VariantOffset} + 60))),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
          FROM sub a JOIN sub b ON a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.3""")),

    // ───── benchmark decontamination: flag corpus documents sharing >= 5
    // distinct 3-gram shingles with an eval/blocklist set (doc_id % 97
    // stands in for the benchmark). The blocklist's shingle inventory is
    // tiny and BROADCAST; the corpus side explodes only its shingle
    // hashes (narrow ints), one hash-agg — at 100 TB this is a broadcast
    // semi-join per shingle, never a corpus self-join. The contaminated
    // doc list is exactly what gets quarantined before training.
    QuerySpec(
      "dedup_decontaminate",
      (s, d) => {
        // near-dup corpus: variants of blocklisted docs are the
        // contamination that must be caught (plain corpus texts are
        // fully distinct, so overlap only exists via the variants);
        // the shingle sets are the SAME memoized frame minhash-LSH uses
        val docs = hsetsOf(s, d)
        val blockH = docs.filter(col("doc_id") % 97 === 0)
          .select(explode(col("hs")).as("h")).distinct()
        docs.filter(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"), explode(col("hs")).as("h"))
          .join(broadcast(blockH), "h")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_overlap"))
          .filter(col("n_overlap") >= 5)
      },
      Some(s"""
        WITH corpus0 AS (${Corpus.docsWithNearDupsSql}),
        hsets AS (
          SELECT doc_id,
                 list_distinct([(ws[i] * 1000003 + ws[i+1] * 1500007 + ws[i+2] * 2000003)
                                & ${mask40} for i in range(1, len(ws) - 1)]) AS hs
          FROM (SELECT doc_id,
                       list_transform(string_split(text, ' '),
                                      w -> ('0x' || substr(md5(w), 1, 10))::BIGINT) AS ws
                FROM corpus0
                WHERE len(string_split(text, ' ')) >= 3)),
        blockh AS (
          SELECT DISTINCT unnest(hs) AS h FROM hsets WHERE doc_id % 97 = 0),
        corpus AS (
          SELECT doc_id, unnest(hs) AS h FROM hsets WHERE doc_id % 97 != 0)
        SELECT c.doc_id, count(*) AS n_overlap
        FROM corpus c JOIN blockh b ON c.h = b.h
        GROUP BY c.doc_id
        HAVING count(*) >= 5""")),

    // ───── embedding-cosine near-dup, sign-LSH bucketed: pairs compared
    // only within a bucket (the scale path); scores from exact integers
    QuerySpec(
      "dedup_embed_cosine",
      (s, d) => {
        val vecs = Corpus.vecsWithNearDups(s, d)
          .withColumn("bucket", Corpus.signBucketCol)
        vecs.as("a")
          .join(vecs.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
            Corpus.dotCol("a.qv", "b.qv").as("dot"),
            col("a.nn").as("na"), col("b.nn").as("nb"))
          .withColumn("score", Corpus.scoreCol)
          .filter(col("score") >= 0.81) // cos >= 0.9
          .select("va", "vb", "score")
      },
      Some(s"""
        WITH vecs AS (
          SELECT vec_id, qv, nn, ${Corpus.signBucketSql} AS bucket
          FROM (${Corpus.vecsWithNearDupsSql})),
        pairs AS (
          SELECT a.vec_id AS va, b.vec_id AS vb,
                 CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot,
                 a.nn AS na, b.nn AS nb
          FROM vecs a JOIN vecs b
            ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        SELECT va, vb, ${Corpus.scoreSql} AS score
        FROM pairs WHERE ${Corpus.scoreSql} >= 0.81"""))
  )
}
