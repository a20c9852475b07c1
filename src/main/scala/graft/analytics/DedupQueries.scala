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
        val sh = Corpus.withShingles(Corpus.docsWithNearDups(s, d))
        val sig = sh.withColumn("minhash", expr(
          """transform(sequence(0, 11),
               p -> array_min(transform(shingles, x -> md5(concat(cast(p as string), '|', x)))))"""))
        val bands = sig
          .select(col("doc_id"), col("shingles"),
            explode(expr("sequence(0, 3)")).as("band"), col("minhash"))
          .withColumn("bkey", expr(
            "md5(concat(minhash[band*3], minhash[band*3+1], minhash[band*3+2]))"))
          .drop("minhash")
        val cand = bands.as("a")
          .join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.shingles").as("sh_a"), col("b.shingles").as("sh_b"))
          .dropDuplicates("doc_a", "doc_b")
        cand
          .withColumn("jaccard", expr(
            "cast(size(array_intersect(sh_a, sh_b)) as double) / size(array_union(sh_a, sh_b))"))
          .filter(col("jaccard") >= 0.4)
          .select("doc_a", "doc_b", "jaccard")
      },
      Some(s"""
        WITH corpus AS (${Corpus.docsWithNearDupsSql}),
        sh AS (${Corpus.shinglesSql("corpus")}),
        sig AS (
          SELECT doc_id, shingles,
                 [list_min(list_transform(shingles, x -> md5(CAST(p AS VARCHAR) || '|' || x)))
                  for p in range(0, 12)] AS minhash
          FROM sh),
        bands AS (
          SELECT doc_id, shingles, b.band,
                 md5(minhash[b.band*3+1] || minhash[b.band*3+2] || minhash[b.band*3+3]) AS bkey
          FROM sig, (SELECT unnest(range(0, 4)) AS band) b),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.shingles AS sh_a, b.shingles AS sh_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
                 / len(list_distinct(list_concat(sh_a, sh_b))) AS jaccard
        FROM cand
        WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
                / len(list_distinct(list_concat(sh_a, sh_b))) >= 0.4""")),

    // ───── SimHash near-dup: 32-bit weighted signature over word bigrams,
    // 4-byte banding (lossless for hamming<=3), hamming verify.
    // The oracle brute-forces the same signatures pairwise — identical
    // result set, since banding has exact recall at this threshold.
    QuerySpec(
      "dedup_simhash",
      (s, d) => {
        val grams = Corpus.docsWithNearDups(s, d).withColumn("tl", expr(
          """transform(sequence(1, size(split(text, ' ')) - 1),
               i -> array_join(slice(split(text, ' '), i, 2), ' '))"""))
        val sig = grams
          .withColumn("th", expr(
            "transform(tl, t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))"))
          .withColumn("bits", expr(
            """transform(sequence(0, 31),
                 j -> case when aggregate(th, 0L,
                        (acc, h) -> acc + (case when (shiftright(h, j) & 1) = 1 then 1 else -1 end)) > 0
                      then 1 else 0 end)"""))
          .select("doc_id", "bits")
        val banded = sig
          .select(col("doc_id"), col("bits"), explode(expr("sequence(0, 3)")).as("band"))
          .withColumn("bkey", expr("array_join(slice(bits, band*8 + 1, 8), '')"))
        banded.as("a")
          .join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.bits").as("bits_a"), col("b.bits").as("bits_b"))
          .dropDuplicates("doc_a", "doc_b")
          .withColumn("hamming", expr(
            "aggregate(zip_with(bits_a, bits_b, (x, y) -> abs(x - y)), 0L, (acc, v) -> acc + v)"))
          .filter(col("hamming") <= 3)
          .select("doc_a", "doc_b", "hamming")
      },
      Some(s"""
        WITH corpus AS (${Corpus.docsWithNearDupsSql}),
        grams AS (
          SELECT doc_id,
                 [array_to_string(toks[i:i+1], ' ') for i in range(1, len(toks))] AS tl
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)),
        sigs AS (
          SELECT doc_id,
                 [CASE WHEN CAST(list_sum(list_transform(th,
                        h -> CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END)) AS BIGINT) > 0
                       THEN 1 ELSE 0 END for j in range(0, 32)] AS bits
          FROM (SELECT doc_id,
                       list_transform(tl, t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)) AS th
                FROM grams)),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(list_sum(list_transform(range(1, 33),
                   j -> CASE WHEN a.bits[j] <> b.bits[j] THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3""")),

    // ───── exact n-gram Jaccard baseline on a bounded subset — the verify
    // primitive; full-corpus discovery belongs to minhash_lsh above
    QuerySpec(
      "dedup_ngram_jaccard",
      (s, d) => {
        val sub = Corpus.withShingles(
          Corpus.docsWithNearDups(s, d)
            .filter(col("doc_id") % 100000 < 60))
        sub.as("a")
          .join(sub.as("b"), col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            expr("cast(size(array_intersect(a.shingles, b.shingles)) as double) / size(array_union(a.shingles, b.shingles))")
              .as("jaccard"))
          .filter(col("jaccard") >= 0.3)
      },
      Some(s"""
        WITH corpus AS (${Corpus.docsWithNearDupsSql}),
        sub AS (${Corpus.shinglesSql("corpus")} AND doc_id % 100000 < 60),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
          FROM sub a JOIN sub b ON a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.3""")),

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
