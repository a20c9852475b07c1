package graft.analytics

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QuerySpec

/** Multimodal-column plumbing: media rides through the engine as opaque
  * `binary` columns with typed metadata extracted by a decode step.
  *
  * The driver corpus carries deterministic fake media — `img =
  * unhex(md5(text))`, 16 bytes standing in for an encoded header — so
  * `mm_decode_meta`/`mm_frame_sample` exercise the BinaryType plumbing
  * (byte slicing, header extraction, explode-to-frames) as codegen'd
  * expressions. `mm_codec_roundtrip` goes further: it runs the engine's
  * REAL PNG path ([[MediaCodecs.decodeImageIo]], the JDK ImageIO
  * readers) on per-doc deterministic rasters and puts the round-trip
  * under the DuckDB oracle. Typed decode/resize/audio live in
  * [[MultimodalOps]] (ScalaTest-covered); only formats with no JDK
  * reader remain stubbed there.
  *
  * Scale posture: per-row map, no shuffle; binary payloads stay columnar
  * in parquet and are never collected.
  */
object MultimodalQueries {

  /** Band split of the 64-bit signatures: 7 bands (widths 9,9,9,9,9,9,10).
    * Pigeonhole: a pair at Hamming ≤ 6 differs in at most 6 bands, so at
    * least one of the 7 matches exactly — candidate generation is
    * LOSSLESS for the Hamming ≤ 6 verify below (4×16 bands were only
    * lossless to ≤ 3 and silently dropped 4–6 pairs with no equal band).
    */
  private val BandBounds: Seq[(Int, Int)] =
    (0 until 7).map(k => (k * 64 / 7, (k + 1) * 64 / 7))

  /** Pack the 64 signature bits (bit j set iff sig(j) ≥ mean) into the
    * [[BandBounds]] band values — the one definition both queries and
    * the oracle mirror.
    */
  private def packBands(bit: Int => Boolean): Seq[Long] =
    BandBounds.map { case (lo, hi) =>
      (lo until hi).foldLeft(0L)((acc, j) =>
        if (bit(j)) acc | (1L << (j - lo)) else acc)
    }

  /** Shared banded near-dup stage for the perceptual-hash queries: a
    * 64-bit signature packed as the 7 [[BandBounds]] bands (`id`,
    * b0..b6) → band-bucket candidate equi-join (lossless for Hamming ≤
    * 6 by pigeonhole — never signature×signature) → exact Hamming ≤
    * `maxHamming` verify. Emits (`a`, `b`, hamming) with a < b.
    */
  private def bandNearDupPairs(hashes: org.apache.spark.sql.DataFrame,
                               id: String, a: String, b: String,
                               maxHamming: Int): org.apache.spark.sql.DataFrame = {
    require(maxHamming < BandBounds.size,
      s"band candidates are lossless only for Hamming < ${BandBounds.size}")
    val bands = BandBounds.indices.map(k =>
      hashes.select(col(id), col(s"b$k").as("bv"), lit(k).as("band")))
      .reduce(_ unionByName _)
    val cands = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col(s"x.$id") < col(s"y.$id"))
      .select(col(s"x.$id").as(a), col(s"y.$id").as(b))
      .distinct()
    cands
      .join(hashes.as("ha"), col(a) === col(s"ha.$id"))
      .join(hashes.as("hb"), col(b) === col(s"hb.$id"))
      .withColumn("hamming", expr(
        BandBounds.indices.map(k => s"bit_count(ha.b$k ^ hb.b$k)")
          .mkString(" + ")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col(a), col(b), col("hamming"))
  }

  /** Oracle-side mirrors of [[BandBounds]]/[[packBands]] and the banded
    * join, over a 64-element signal list `arr` with threshold `mean`.
    */
  private def bandSelectSql(arr: String): String =
    BandBounds.zipWithIndex.map { case ((lo, hi), k) =>
      s"""CAST(list_sum(list_transform(range(0, ${hi - lo}), j ->
              CASE WHEN $arr[$lo + j + 1] >= mean THEN 1 << j ELSE 0 END)) AS BIGINT) AS b$k"""
    }.mkString(",\n                 ")
  private val bandMatchSql: String =
    BandBounds.indices.map(k => s"a.b$k = b.b$k").mkString(" OR ")
  private val bandHammingSql: String =
    BandBounds.indices.map(k => s"bit_count(xor(x.b$k, y.b$k))").mkString(" + ")

  val all: Seq[QuerySpec] = Seq(

    // ───── header decode: width/height/channels from the leading bytes of
    // the binary payload, + derived size classification.
    // Spark reads through the binary column (substring on BinaryType →
    // hex → int); the oracle computes the same fields directly from the
    // md5 hex — identical by construction since img = unhex(md5(text)).
    // The `decoder` column (r6) is the provenance tag downstream
    // consumers filter on — the SAME magic-byte dispatch rule the typed
    // path routes by ([[MultimodalOps.decoderTag]]: P6+whitespace →
    // real-ppm; PNG/JPEG/BMP/GIF magics → real-jdk; else stub),
    // mirrored byte-for-byte in the oracle over the md5 hex, so a
    // payload that would be really decoded is labeled as such in BOTH
    // engines. On this fake corpus every row is 'stub' — which is
    // exactly the point: fabricated rasters are now marked, not
    // discovered by statistics.
    QuerySpec(
      "mm_decode_meta",
      (s, d) => Tables.documents(s, d)
        .withColumn("img", unhex(md5(col("text"))))
        .withColumn("width",
          expr("1 + cast(conv(hex(substring(img, 1, 2)), 16, 10) as bigint) % 4096"))
        .withColumn("height",
          expr("1 + cast(conv(hex(substring(img, 3, 2)), 16, 10) as bigint) % 4096"))
        .withColumn("channels",
          expr("1 + cast(conv(hex(substring(img, 5, 1)), 16, 10) as bigint) % 3"))
        .withColumn("n_bytes", length(col("img")).cast("long"))
        .withColumn("n_pixels", expr("width * height * channels"))
        .withColumn("size_class", expr(
          """case when n_pixels >= 8000000 then 'large'
                  when n_pixels >= 1000000 then 'medium'
                  else 'small' end"""))
        .withColumn("decoder", expr(
          """case when substring(img, 1, 2) = X'5036'
                       and cast(conv(hex(substring(img, 3, 1)), 16, 10) as int)
                           in (9, 10, 11, 12, 13, 28, 29, 30, 31, 32) then 'real-ppm'
                  when substring(img, 1, 8) = X'89504E470D0A1A0A' then 'real-jdk'
                  when substring(img, 1, 3) = X'FFD8FF' then 'real-jdk'
                  when substring(img, 1, 2) = X'424D' then 'real-jdk'
                  when substring(img, 1, 4) = X'47494638' then 'real-jdk'
                  else 'stub' end"""))
        .select("doc_id", "width", "height", "channels", "n_bytes", "n_pixels",
          "size_class", "decoder"),
      Some("""
        SELECT doc_id, width, height, channels, n_bytes,
               width * height * channels AS n_pixels,
               CASE WHEN width * height * channels >= 8000000 THEN 'large'
                    WHEN width * height * channels >= 1000000 THEN 'medium'
                    ELSE 'small' END AS size_class,
               CASE WHEN substr(h, 1, 4) = '5036'
                         AND CAST(('0x' || substr(h, 5, 2)) AS INTEGER)
                             IN (9, 10, 11, 12, 13, 28, 29, 30, 31, 32) THEN 'real-ppm'
                    WHEN substr(h, 1, 16) = '89504e470d0a1a0a' THEN 'real-jdk'
                    WHEN substr(h, 1, 6) = 'ffd8ff' THEN 'real-jdk'
                    WHEN substr(h, 1, 4) = '424d' THEN 'real-jdk'
                    WHEN substr(h, 1, 8) = '47494638' THEN 'real-jdk'
                    ELSE 'stub' END AS decoder
        FROM (SELECT doc_id, md5(text) AS h,
                     1 + CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 4096 AS width,
                     1 + CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 4096 AS height,
                     1 + CAST(('0x' || substr(md5(text), 9, 2)) AS BIGINT) % 3 AS channels,
                     CAST(len(md5(text)) / 2 AS BIGINT) AS n_bytes
              FROM documents)""")),

    // ───── frame sampling as a relational op (M3, oracle-checked twin of
    // MultimodalOps.sampleFrames): every 4th byte offset of the payload
    // becomes a frame row keyed by source doc, with a content digest of
    // the 4-byte frame window — the explode-to-frames shape of a video
    // pipeline, where per-frame work then parallelizes independently of
    // the source-document boundaries.
    QuerySpec(
      "mm_frame_sample",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("hex"),
          posexplode(expr("sequence(0, 12, 4)")).as(Seq("frame_no", "frame_idx")))
        .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
          col("frame_idx").cast("long").as("frame_idx"),
          md5(expr("substring(hex, frame_idx * 2 + 1, 8)")).as("frame_hash")),
      Some("""
        SELECT doc_id, o.n AS frame_no, o.n * 4 AS frame_idx,
               md5(substr(md5(text), o.n * 8 + 1, 8)) AS frame_hash
        FROM documents, (SELECT unnest(range(0, 4)) AS n) o""")),

    // ───── REAL codec under the oracle gate (M2): per doc, build a
    // deterministic RGB raster (dims and every pixel derived from
    // doc_id), encode it to PNG and decode it back through the JDK
    // ImageIO path the engine actually ships
    // ([[MediaCodecs.decodeImageIo]]), verifying exact pixel equality
    // in-row. The oracle recomputes the dims from doc_id arithmetic and
    // asserts the round-trip flag — so a broken decoder (wrong stride,
    // channel order, alpha handling) hash-mismatches even though DuckDB
    // itself cannot decode PNG. Per-row map inside mapPartitions, no
    // shuffle; 100 docs bound the encode cost.
    // ───── perceptual-hash image near-dup (r8): the image dual of
    // simhash text dedup, run through the REAL codec path. Per image:
    // deterministic RGB raster (every pixel a closed-form function of
    // the image id) → PNG encode → the engine's actual JDK ImageIO
    // decode ([[MediaCodecs.decodeImageIo]]) → average-hash (grayscale,
    // 8×8 nearest-neighbor resample, above-mean bits — the classic
    // aHash) packed as the 7 [[BandBounds]] bands → band-bucket
    // candidate join (lossless for Hamming ≤ 6 by pigeonhole, the
    // simhash banding discipline — never image×image) → exact
    // Hamming ≤ 6 verify, so the emitted set is EXACTLY all pairs at
    // Hamming ≤ 6. Injected variants (id%5==0, a few pixels nudged +8)
    // surface whenever their perturbation stays within that radius. The oracle computes the identical
    // hash from the closed-form pixel arithmetic WITHOUT any codec —
    // hash equality across the gate proves decode → gray → resample →
    // threshold is exact end-to-end, the mm_codec_roundtrip idea
    // extended from pixels to a derived signature. Per-image work is a
    // row-local map; the only shuffle is the band-cardinality join.
    QuerySpec(
      "mm_phash_dedup",
      (s, d) => {
        import s.implicits._
        val hashes = Tables.documents(s, d).select(col("doc_id"))
          .filter(col("doc_id") < 200).as[Long]
          .flatMap(id =>
            (id, false) +: (if (id % 5 == 0) Seq((id, true)) else Nil))
          .map { case (id, perturb) =>
            val w = 16 + (id % 16).toInt
            val h = 16 + (id % 9).toInt
            def px(i: Int): Int =
              ((id * 31 + i + (if (perturb && i % 97 == 0) 8 else 0)) % 256).toInt
            val bi = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val base = (y * w + x) * 3
                bi.setRGB(x, y,
                  (px(base) << 16) | (px(base + 1) << 8) | px(base + 2))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(bi, "png", bos)
            val (dw, dh, _, raster) = MediaCodecs.decodeImageIo(bos.toByteArray)
            val gray = Array.tabulate(64) { k =>
              val sx = (k % 8) * dw / 8
              val sy = (k / 8) * dh / 8
              val i = (sy * dw + sx) * 3
              ((raster(i) & 0xff) + (raster(i + 1) & 0xff) +
                (raster(i + 2) & 0xff)) / 3
            }
            val mean = gray.sum / 64
            val b = packBands(j => gray(j) >= mean)
            (if (perturb) 10000L + id else id,
              b(0), b(1), b(2), b(3), b(4), b(5), b(6))
          }
          .toDF("img_id", "b0", "b1", "b2", "b3", "b4", "b5", "b6")
          .localCheckpoint(true) // 240 rows; used by 7 band legs + 2 verify sides
        bandNearDupPairs(hashes, "img_id", "img_a", "img_b", maxHamming = 6)
      },
      Some {
        // px(j) for variant/base rows: the closed-form pixel byte
        def pxSql(j: String): String =
          s"(base_id * 31 + ($j) + CASE WHEN perturb AND ($j) % 97 = 0 THEN 8 ELSE 0 END) % 256"
        val graySql =
          s"""list_transform(range(0, 64), k ->
              (${pxSql("(((k // 8) * h // 8) * w + (k % 8) * w // 8) * 3")}
               + ${pxSql("(((k // 8) * h // 8) * w + (k % 8) * w // 8) * 3 + 1")}
               + ${pxSql("(((k // 8) * h // 8) * w + (k % 8) * w // 8) * 3 + 2")}) // 3)"""
        s"""
        WITH imgs AS (
          SELECT doc_id AS base_id, doc_id AS img_id, FALSE AS perturb
          FROM documents WHERE doc_id < 200
          UNION ALL
          SELECT doc_id, 10000 + doc_id, TRUE
          FROM documents WHERE doc_id < 200 AND doc_id % 5 = 0),
        grids AS (
          SELECT img_id, $graySql AS g
          FROM (SELECT img_id, base_id, perturb,
                       16 + base_id % 16 AS w, 16 + base_id % 9 AS h
                FROM imgs)),
        hashes AS (
          SELECT img_id, ${bandSelectSql("g")}
          FROM (SELECT img_id, g, CAST(list_sum(g) AS BIGINT) // 64 AS mean
                FROM grids)),
        cands AS (
          SELECT DISTINCT a.img_id AS img_a, b.img_id AS img_b
          FROM hashes a JOIN hashes b
            ON a.img_id < b.img_id AND ($bandMatchSql))
        SELECT c.img_a, c.img_b,
               CAST($bandHammingSql AS BIGINT) AS hamming
        FROM cands c
        JOIN hashes x ON x.img_id = c.img_a
        JOIN hashes y ON y.img_id = c.img_b
        WHERE $bandHammingSql <= 6"""
      }),

    // ───── per-image luminance statistics (r12): the vision-curation
    // quality screen (too-dark / too-flat frames drop before training)
    // — a FULL-RASTER pass through the REAL JDK codec path, where
    // mm_phash_dedup samples an 8×8 grid: 4-bin luminance histogram,
    // exact luminance sum, and the exact variance NUMERATOR
    // n·Σlum²−(Σlum)² (contrast without a float sqrt — the
    // agg_regression sufficient-sums discipline applied to pixels).
    // Images are the same deterministic closed-form pixel function the
    // phash query uses (PNG is lossless, so decode(encode(x)) = x);
    // the oracle replays the arithmetic WITHOUT any codec — equality
    // proves the encode → ImageIO decode → raster walk exact
    // end-to-end at every pixel, not just at 64 sample points.
    QuerySpec(
      "mm_image_stats",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(col("doc_id"))
          .filter(col("doc_id") < 200).as[Long]
          .map { id =>
            val w = 16 + (id % 16).toInt
            val h = 16 + (id % 9).toInt
            def px(i: Int): Int = ((id * 31 + i) % 256).toInt
            val bi = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val base = (y * w + x) * 3
                bi.setRGB(x, y,
                  (px(base) << 16) | (px(base + 1) << 8) | px(base + 2))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(bi, "png", bos)
            val (dw, dh, _, raster) = MediaCodecs.decodeImageIo(bos.toByteArray)
            val n = dw * dh
            val hist = new Array[Long](4)
            var sum = 0L; var sq = 0L; var i = 0
            while (i < n) {
              val o = i * 3
              val lum = ((raster(o) & 0xff) + (raster(o + 1) & 0xff) +
                (raster(o + 2) & 0xff)) / 3
              hist(lum / 64) += 1
              sum += lum
              sq += lum.toLong * lum
              i += 1
            }
            (id, n.toLong, hist(0), hist(1), hist(2), hist(3),
              sum, n * sq - sum * sum)
          }
          .toDF("img_id", "n_px", "b0", "b1", "b2", "b3",
            "lum_sum", "var_num")
      },
      Some("""
        WITH imgs AS (
          SELECT doc_id AS id, 16 + doc_id % 16 AS w, 16 + doc_id % 9 AS h
          FROM documents WHERE doc_id < 200),
        lums AS (
          SELECT id, w * h AS n,
                 list_transform(range(0, w * h), i ->
                   (((id*31 + 3*i) % 256) + ((id*31 + 3*i + 1) % 256)
                    + ((id*31 + 3*i + 2) % 256)) // 3) AS lum
          FROM imgs)
        SELECT id AS img_id, CAST(n AS BIGINT) AS n_px,
               CAST(len(list_filter(lum, x -> x // 64 = 0)) AS BIGINT) AS b0,
               CAST(len(list_filter(lum, x -> x // 64 = 1)) AS BIGINT) AS b1,
               CAST(len(list_filter(lum, x -> x // 64 = 2)) AS BIGINT) AS b2,
               CAST(len(list_filter(lum, x -> x // 64 = 3)) AS BIGINT) AS b3,
               CAST(list_sum(lum) AS BIGINT) AS lum_sum,
               CAST(n * list_sum(list_transform(lum, x -> x * x))
                    - list_sum(lum) * list_sum(lum) AS BIGINT) AS var_num
        FROM lums""")),

    // ───── Dominant color through the REAL codec (r14): the palette
    // readout behind thumbnail placeholders and near-dup color
    // prefilters — per image, every pixel quantizes to a 64-cell RGB
    // cube (2 bits per channel: (r div 64)·16 + (g div 64)·4 + b div
    // 64), the dominant cell is the mode with a smallest-code tiebreak
    // (a total order), and the corpus rolls up per dominant code. The
    // Spark side ENCODES the closed-form raster as a real PNG and
    // DECODES it back through [[MediaCodecs.decodeImageIo]] (the same
    // round-trip proof shape as mm_image_stats — equality against the
    // pixel-formula oracle proves the codec path is lossless end to
    // end); the oracle computes the identical quantization from the
    // formula with no codec anywhere. Per-image work is a bounded
    // 64-cell count; the rollup is one hash-agg.
    QuerySpec(
      "mm_dominant_color",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(col("doc_id"))
          .filter(col("doc_id") < 200).as[Long]
          .map { id =>
            val w = 16 + (id % 16).toInt
            val h = 16 + (id % 9).toInt
            def px(i: Int): Int = ((id * 31 + i) % 256).toInt
            val bi = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val base = (y * w + x) * 3
                bi.setRGB(x, y,
                  (px(base) << 16) | (px(base + 1) << 8) | px(base + 2))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(bi, "png", bos)
            val (dw, dh, _, raster) = MediaCodecs.decodeImageIo(bos.toByteArray)
            val counts = new Array[Long](64)
            var i = 0
            val n = dw * dh
            while (i < n) {
              val o = i * 3
              counts(((raster(o) & 0xff) / 64) * 16 +
                ((raster(o + 1) & 0xff) / 64) * 4 +
                ((raster(o + 2) & 0xff) / 64)) += 1
              i += 1
            }
            var best = 0
            var c = 1
            while (c < 64) { if (counts(c) > counts(best)) best = c; c += 1 }
            (id, best, counts(best), n.toLong)
          }
          .toDF("img_id", "dom_code", "dom_n", "n_px")
          .groupBy("dom_code")
          .agg(count(lit(1)).as("n_images"), sum("dom_n").as("dom_n_sum"),
            sum("n_px").as("px_sum"), min("img_id").as("min_img"),
            sum("img_id").as("img_sum"))
      },
      Some("""
        WITH imgs AS (
          SELECT doc_id AS id, 16 + doc_id % 16 AS w, 16 + doc_id % 9 AS h
          FROM documents WHERE doc_id < 200),
        codes AS (
          SELECT id, w * h AS n,
                 unnest(list_transform(range(0, w * h), i ->
                   ((id*31 + 3*i) % 256) // 64 * 16
                   + ((id*31 + 3*i + 1) % 256) // 64 * 4
                   + ((id*31 + 3*i + 2) % 256) // 64)) AS code
          FROM imgs),
        hist AS (
          SELECT id, n, code, COUNT(*) AS cnt FROM codes GROUP BY 1, 2, 3),
        dom AS (
          SELECT id, n, code AS dom_code, cnt AS dom_n FROM (
            SELECT id, n, code, cnt,
                   ROW_NUMBER() OVER (PARTITION BY id
                     ORDER BY cnt DESC, code ASC) AS rk
            FROM hist) WHERE rk = 1)
        SELECT CAST(dom_code AS INTEGER) AS dom_code,
               COUNT(*) AS n_images,
               CAST(SUM(dom_n) AS BIGINT) AS dom_n_sum,
               CAST(SUM(n) AS BIGINT) AS px_sum,
               CAST(MIN(id) AS BIGINT) AS min_img,
               CAST(SUM(id) AS BIGINT) AS img_sum
        FROM dom GROUP BY 1""")),

    // ───── audio fingerprint near-dup (r8): the AUDIO dual of
    // mm_phash_dedup, through the engine's REAL WAV path. Per clip: a
    // closed-form deterministic waveform → hand-built RIFF/PCM-16
    // container → [[MediaCodecs.decodePcmWav]] (the actual chunk-walk
    // parser) → energy fingerprint (64 windows × 16 samples, mean-abs
    // energy, above-mean bits — the spectral-band-energy hashing shape
    // with time-domain energy standing in for the FFT this container
    // has no JDK primitive for) → the shared banded Hamming ≤ 6 verify
    // (7-band candidates: lossless at that radius, so the emitted set
    // is exactly all pairs at Hamming ≤ 6). Injected variants
    // (id%5==0, sparse +50 amplitude bumps) surface whenever their
    // perturbation stays within that radius. The oracle computes the identical fingerprint from the
    // closed-form samples WITHOUT any codec — equality proves PCM-16
    // encode → RIFF walk → decode → windowed energy exact end-to-end.
    QuerySpec(
      "mm_audio_silence",
      (s, d) => {
        // Silence/level profiling through the REAL WAV path (r14): the
        // trim-silence / gain-staging readout every audio-ingest
        // pipeline runs before feature extraction — per clip, the share
        // of samples under the |s| < 256 silence floor, the peak level,
        // and the exact integer energy sum, all computed from
        // [[MediaCodecs.decodePcmWav]]'s decoded samples on the same
        // closed-form RIFF/PCM-16 fixture as mm_audio_fingerprint
        // (equality against the codec-free formula oracle proves the
        // PCM path bit-exact, the M-family discipline).
        import s.implicits._
        Tables.documents(s, d).select(col("doc_id"))
          .filter(col("doc_id") < 120).as[Long]
          .map { id =>
            def sample(i: Int): Int =
              ((id * 31 + i.toLong * 17) % 2048).toInt - 1024
            def le16(v: Int) = Array[Byte](
              (v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
            def le32(v: Int) = Array[Byte](
              (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
              ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
            val data = Array.tabulate(1024)(sample).flatMap(le16)
            val fmt = le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
              le16(2) ++ le16(16)
            val wav = "RIFF".getBytes ++
              le32(4 + 8 + fmt.length + 8 + data.length) ++
              "WAVE".getBytes ++ "fmt ".getBytes ++ le32(fmt.length) ++ fmt ++
              "data".getBytes ++ le32(data.length) ++ data
            val (_, _, wf) = MediaCodecs.decodePcmWav(wav)
            var quiet = 0L; var peak = 0L; var energy = 0L
            var i = 0
            while (i < wf.length) {
              val a = math.abs(wf(i).toLong)
              if (a < 256) quiet += 1
              if (a > peak) peak = a
              energy += a * a
              i += 1
            }
            (id, wf.length.toLong, quiet, quiet * 1000000L / wf.length,
              peak, energy)
          }
          .toDF("clip_id", "n_samples", "n_quiet", "silence_ppm",
            "peak", "energy_sum")
      },
      Some("""
        WITH clips AS (
          SELECT doc_id AS id FROM documents WHERE doc_id < 120),
        samp AS (
          SELECT id,
                 list_transform(range(0, 1024), i ->
                   ABS(((id * 31 + i * 17) % 2048) - 1024)) AS a
          FROM clips)
        SELECT id AS clip_id, CAST(1024 AS BIGINT) AS n_samples,
               CAST(len(list_filter(a, x -> x < 256)) AS BIGINT) AS n_quiet,
               CAST(len(list_filter(a, x -> x < 256)) * 1000000 // 1024
                 AS BIGINT) AS silence_ppm,
               CAST(list_max(a) AS BIGINT) AS peak,
               CAST(list_sum(list_transform(a, x -> x * x)) AS BIGINT)
                 AS energy_sum
        FROM samp""")),

    // ───── Color-diversity Gini through the REAL codec (r15): the
    // log-free complexity score curation uses to separate flat
    // synthetic graphics from textured photographic content — per
    // image, Gini impurity of the 64-cell RGB-cube histogram
    // (1 − Σ(c/n)², exact ppm: 1e6 − Σc²·1e6 div n²) plus the distinct
    // cell count, computed from the SAME PNG encode→ImageIO decode
    // round-trip as mm_dominant_color (equality vs the pixel-formula
    // oracle keeps proving the codec path lossless); corpus rollup by
    // impurity decile.
    QuerySpec(
      "mm_color_gini",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(col("doc_id"))
          .filter(col("doc_id") < 200).as[Long]
          .map { id =>
            val w = 16 + (id % 16).toInt
            val h = 16 + (id % 9).toInt
            def px(i: Int): Int = ((id * 31 + i) % 256).toInt
            val bi = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val base = (y * w + x) * 3
                bi.setRGB(x, y,
                  (px(base) << 16) | (px(base + 1) << 8) | px(base + 2))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(bi, "png", bos)
            val (dw, dh, _, raster) = MediaCodecs.decodeImageIo(bos.toByteArray)
            val counts = new Array[Long](64)
            var i = 0
            val n = (dw * dh).toLong
            while (i < n) {
              val o = i.toInt * 3
              counts(((raster(o) & 0xff) / 64) * 16 +
                ((raster(o + 1) & 0xff) / 64) * 4 +
                ((raster(o + 2) & 0xff) / 64)) += 1
              i += 1
            }
            val sumsq = counts.map(c => c * c).sum
            val nCodes = counts.count(_ > 0).toLong
            (id, n, nCodes, 1000000L - sumsq * 1000000L / (n * n))
          }
          .toDF("img_id", "n_px", "n_codes", "gini_ppm")
          .groupBy(expr("gini_ppm div 100000").as("decile"))
          .agg(count(lit(1)).as("n_images"), sum("n_px").as("px_sum"),
            sum("n_codes").as("codes_sum"), min("img_id").as("min_img"),
            sum("img_id").as("img_sum"))
      },
      Some("""
        WITH imgs AS (
          SELECT doc_id AS id, 16 + doc_id % 16 AS w, 16 + doc_id % 9 AS h
          FROM documents WHERE doc_id < 200),
        codes AS (
          SELECT id, w * h AS n,
                 unnest(list_transform(range(0, w * h), i ->
                   ((id*31 + 3*i) % 256) // 64 * 16
                   + ((id*31 + 3*i + 1) % 256) // 64 * 4
                   + ((id*31 + 3*i + 2) % 256) // 64)) AS code
          FROM imgs),
        hist AS (
          SELECT id, n, code, COUNT(*) AS cnt FROM codes GROUP BY 1, 2, 3),
        per AS (
          SELECT id, MAX(n) AS n, COUNT(*) AS n_codes,
                 CAST(1000000 - SUM(cnt * cnt) * 1000000 // (MAX(n) * MAX(n))
                   AS BIGINT) AS gini_ppm
          FROM hist GROUP BY 1)
        SELECT CAST(gini_ppm // 100000 AS BIGINT) AS decile,
               COUNT(*) AS n_images,
               CAST(SUM(n) AS BIGINT) AS px_sum,
               CAST(SUM(n_codes) AS BIGINT) AS codes_sum,
               CAST(MIN(id) AS BIGINT) AS min_img,
               CAST(SUM(id) AS BIGINT) AS img_sum
        FROM per GROUP BY 1""")),

    // ───── Edge density through the REAL codec (r16): the gradient-
    // energy complexity feature curation uses to separate flat
    // graphics / screenshots from photographic detail (and the cheap
    // blur proxy: blurry images have low gradient mass) — per interior
    // pixel the L1 gradient |dx|+|dy| of integer luma (299/587/114
    // milli-weights, exact // 1000), edge when ≥ 40; per image edge_ppm
    // over the (w−1)(h−1) interior cells + total gradient mass, from
    // the SAME PNG encode→ImageIO decode round-trip as mm_color_gini
    // (the codec-free pixel-formula oracle keeps proving the raster
    // path lossless byte-for-byte — a single channel swap or stride
    // bug shifts every gradient). Corpus rollup by edge-ppm decile.
    QuerySpec(
      "mm_edge_density",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(col("doc_id"))
          .filter(col("doc_id") < 200).as[Long]
          .map { id =>
            val w = 16 + (id % 16).toInt
            val h = 16 + (id % 9).toInt
            def px(i: Int): Int = ((id * 31 + i) % 256).toInt
            val bi = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val base = (y * w + x) * 3
                bi.setRGB(x, y,
                  (px(base) << 16) | (px(base + 1) << 8) | px(base + 2))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(bi, "png", bos)
            val (dw, dh, _, raster) = MediaCodecs.decodeImageIo(bos.toByteArray)
            def lum(x: Int, yy: Int): Long = {
              val o = (yy * dw + x) * 3
              ((raster(o) & 0xff) * 299L + (raster(o + 1) & 0xff) * 587L +
                (raster(o + 2) & 0xff) * 114L) / 1000L
            }
            var nEdge = 0L
            var gradSum = 0L
            var yy = 0
            while (yy < dh - 1) {
              var x = 0
              while (x < dw - 1) {
                val g = math.abs(lum(x + 1, yy) - lum(x, yy)) +
                  math.abs(lum(x, yy + 1) - lum(x, yy))
                gradSum += g
                if (g >= 40) nEdge += 1
                x += 1
              }
              yy += 1
            }
            val cells = (dw - 1).toLong * (dh - 1)
            (id, cells, nEdge, nEdge * 1000000L / cells, gradSum)
          }
          .toDF("img_id", "n_cells", "n_edge", "edge_ppm", "grad_sum")
          .groupBy(expr("edge_ppm div 100000").as("decile"))
          .agg(count(lit(1)).as("n_images"), sum("n_cells").as("cells_sum"),
            sum("n_edge").as("edge_sum"), sum("grad_sum").as("grad_total"),
            min("img_id").as("min_img"), sum("img_id").as("img_sum"))
      },
      Some("""
        WITH imgs AS (
          SELECT doc_id AS id, 16 + doc_id % 16 AS w, 16 + doc_id % 9 AS h
          FROM documents WHERE doc_id < 200),
        grads AS (
          SELECT id, (w - 1) * (h - 1) AS cells,
                 unnest(list_transform(range(0, (w - 1) * (h - 1)), j ->
                   ABS((((id*31 + 3*((j // (w-1)) * w + (j % (w-1)) + 1)) % 256) * 299
                        + ((id*31 + 3*((j // (w-1)) * w + (j % (w-1)) + 1) + 1) % 256) * 587
                        + ((id*31 + 3*((j // (w-1)) * w + (j % (w-1)) + 1) + 2) % 256) * 114) // 1000
                       - (((id*31 + 3*((j // (w-1)) * w + (j % (w-1)))) % 256) * 299
                          + ((id*31 + 3*((j // (w-1)) * w + (j % (w-1))) + 1) % 256) * 587
                          + ((id*31 + 3*((j // (w-1)) * w + (j % (w-1))) + 2) % 256) * 114) // 1000)
                   + ABS((((id*31 + 3*(((j // (w-1)) + 1) * w + (j % (w-1)))) % 256) * 299
                          + ((id*31 + 3*(((j // (w-1)) + 1) * w + (j % (w-1))) + 1) % 256) * 587
                          + ((id*31 + 3*(((j // (w-1)) + 1) * w + (j % (w-1))) + 2) % 256) * 114) // 1000
                         - (((id*31 + 3*((j // (w-1)) * w + (j % (w-1)))) % 256) * 299
                            + ((id*31 + 3*((j // (w-1)) * w + (j % (w-1))) + 1) % 256) * 587
                            + ((id*31 + 3*((j // (w-1)) * w + (j % (w-1))) + 2) % 256) * 114) // 1000))) AS g
          FROM imgs),
        per AS (
          SELECT id, MAX(cells) AS cells,
                 CAST(SUM(CASE WHEN g >= 40 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_edge,
                 CAST(SUM(g) AS BIGINT) AS grad_sum
          FROM grads GROUP BY 1),
        scored AS (
          SELECT id, cells, n_edge,
                 n_edge * 1000000 // cells AS edge_ppm, grad_sum
          FROM per)
        SELECT CAST(edge_ppm // 100000 AS BIGINT) AS decile,
               COUNT(*) AS n_images,
               CAST(SUM(cells) AS BIGINT) AS cells_sum,
               CAST(SUM(n_edge) AS BIGINT) AS edge_sum,
               CAST(SUM(grad_sum) AS BIGINT) AS grad_total,
               CAST(MIN(id) AS BIGINT) AS min_img,
               CAST(SUM(id) AS BIGINT) AS img_sum
        FROM scored GROUP BY 1""")),

    // ───── Zero-crossing rate through the REAL WAV path (r15): the
    // classic voiced/unvoiced + noisiness feature (high ZCR = noise or
    // fricatives, low = tonal), per clip from
    // [[MediaCodecs.decodePcmWav]]'s samples on the closed-form
    // RIFF/PCM-16 fixture — a strict sign change between consecutive
    // samples (zero samples break no crossing), exact ppm over n−1
    // adjacencies; the codec-free formula oracle proves the PCM path
    // end-to-end (the M-family discipline).
    QuerySpec(
      "mm_audio_zcr",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(col("doc_id"))
          .filter(col("doc_id") < 120).as[Long]
          .map { id =>
            def sample(i: Int): Int =
              ((id * 31 + i.toLong * 17) % 2048).toInt - 1024
            def le16(v: Int) = Array[Byte](
              (v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
            def le32(v: Int) = Array[Byte](
              (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
              ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
            val data = Array.tabulate(1024)(sample).flatMap(le16)
            val fmt = le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
              le16(2) ++ le16(16)
            val wav = "RIFF".getBytes ++
              le32(4 + 8 + fmt.length + 8 + data.length) ++
              "WAVE".getBytes ++ "fmt ".getBytes ++ le32(fmt.length) ++ fmt ++
              "data".getBytes ++ le32(data.length) ++ data
            val (_, _, wf) = MediaCodecs.decodePcmWav(wav)
            var zc = 0L
            var i = 0
            while (i < wf.length - 1) {
              if ((wf(i) > 0 && wf(i + 1) < 0) ||
                  (wf(i) < 0 && wf(i + 1) > 0)) zc += 1
              i += 1
            }
            (id, wf.length.toLong, zc,
              zc * 1000000L / (wf.length - 1))
          }
          .toDF("clip_id", "n_samples", "n_crossings", "zcr_ppm")
      },
      Some("""
        WITH clips AS (
          SELECT doc_id AS id FROM documents WHERE doc_id < 120),
        pairs AS (
          SELECT id, unnest(range(0, 1023)) AS i FROM clips),
        s AS (
          SELECT id,
                 ((id * 31 + i * 17) % 2048) - 1024 AS s0,
                 ((id * 31 + (i + 1) * 17) % 2048) - 1024 AS s1
          FROM pairs)
        SELECT id AS clip_id, CAST(1024 AS BIGINT) AS n_samples,
               CAST(SUM(CASE WHEN (s0 > 0 AND s1 < 0)
                               OR (s0 < 0 AND s1 > 0)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings,
               CAST(SUM(CASE WHEN (s0 > 0 AND s1 < 0)
                               OR (s0 < 0 AND s1 > 0)
                             THEN 1 ELSE 0 END) * 1000000 // 1023 AS BIGINT)
                 AS zcr_ppm
        FROM s GROUP BY 1""")),

    QuerySpec(
      "mm_audio_fingerprint",
      (s, d) => {
        import s.implicits._
        val hashes = Tables.documents(s, d).select(col("doc_id"))
          .filter(col("doc_id") < 120).as[Long]
          .flatMap(id =>
            (id, false) +: (if (id % 5 == 0) Seq((id, true)) else Nil))
          .map { case (id, perturb) =>
            def sample(i: Int): Int =
              ((id * 31 + i.toLong * 17) % 2048).toInt - 1024 +
                (if (perturb && i % 89 == 0) 50 else 0)
            def le16(v: Int) = Array[Byte](
              (v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
            def le32(v: Int) = Array[Byte](
              (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
              ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
            val data = Array.tabulate(1024)(sample).flatMap(le16)
            val fmt = le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
              le16(2) ++ le16(16)
            val wav = "RIFF".getBytes ++
              le32(4 + 8 + fmt.length + 8 + data.length) ++
              "WAVE".getBytes ++ "fmt ".getBytes ++ le32(fmt.length) ++ fmt ++
              "data".getBytes ++ le32(data.length) ++ data
            val (_, _, wf) = MediaCodecs.decodePcmWav(wav)
            val e = Array.tabulate(64)(k =>
              (0 until 16).map(j => math.abs(wf(k * 16 + j).toInt).toLong).sum)
            val mean = e.sum / 64
            val b = packBands(j => e(j) >= mean)
            (if (perturb) 10000L + id else id,
              b(0), b(1), b(2), b(3), b(4), b(5), b(6))
          }
          .toDF("clip_id", "b0", "b1", "b2", "b3", "b4", "b5", "b6")
          .localCheckpoint(true)
        bandNearDupPairs(hashes, "clip_id", "clip_a", "clip_b", maxHamming = 6)
      },
      Some {
        def sampleSql(i: String): String =
          s"""(((base_id * 31 + ($i) * 17) % 2048) - 1024
              + CASE WHEN perturb AND ($i) % 89 = 0 THEN 50 ELSE 0 END)"""
        s"""
        WITH clips AS (
          SELECT doc_id AS base_id, doc_id AS clip_id, FALSE AS perturb
          FROM documents WHERE doc_id < 120
          UNION ALL
          SELECT doc_id, 10000 + doc_id, TRUE
          FROM documents WHERE doc_id < 120 AND doc_id % 5 = 0),
        grids AS (
          SELECT clip_id,
                 list_transform(range(0, 64), k ->
                   list_sum(list_transform(range(0, 16), j ->
                     abs(${sampleSql("k * 16 + j")})))) AS e
          FROM clips),
        hashes AS (
          SELECT clip_id, ${bandSelectSql("e")}
          FROM (SELECT clip_id, e, CAST(list_sum(e) AS BIGINT) // 64 AS mean
                FROM grids)),
        cands AS (
          SELECT DISTINCT a.clip_id AS clip_a, b.clip_id AS clip_b
          FROM hashes a JOIN hashes b
            ON a.clip_id < b.clip_id AND ($bandMatchSql))
        SELECT c.clip_a, c.clip_b,
               CAST($bandHammingSql AS BIGINT) AS hamming
        FROM cands c
        JOIN hashes x ON x.clip_id = c.clip_a
        JOIN hashes y ON y.clip_id = c.clip_b
        WHERE $bandHammingSql <= 6"""
      }),

    QuerySpec(
      "mm_codec_roundtrip",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(col("doc_id"))
          .filter(col("doc_id") < 100).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val w = 1 + (id % 8).toInt
              val h = 1 + (id % 5).toInt
              val bi = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  // pixel linear index i = (y*w+x)*3 + ch; value = (id*31 + i) % 256
                  val base = id * 31 + (y * w + x) * 3
                  bi.setRGB(x, y,
                    (((base % 256).toInt) << 16) |
                      ((((base + 1) % 256).toInt) << 8) |
                      (((base + 2) % 256).toInt))
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(bi, "png", bos)
              val (dw, dh, dc, raster) = MediaCodecs.decodeImageIo(bos.toByteArray)
              var ok = dw == w && dh == h && dc == 3 && raster.length == w * h * 3
              var i = 0
              while (ok && i < raster.length) {
                ok = (raster(i) & 0xff) == ((id * 31 + i) % 256).toInt
                i += 1
              }
              (id, dw, dh, dc, ok)
            }
          }
          .toDF("doc_id", "width", "height", "channels", "roundtrip_ok")
      },
      Some("""
        SELECT doc_id,
               CAST(1 + doc_id % 8 AS INTEGER) AS width,
               CAST(1 + doc_id % 5 AS INTEGER) AS height,
               3 AS channels, TRUE AS roundtrip_ok
        FROM documents WHERE doc_id < 100"""))
  ,

    // ───── scene-cut detection (r9): the shot-boundary pass a video
    // curation pipeline runs before per-scene sampling — consecutive
    // frames whose perceptual hashes jump apart mark a cut. Runs
    // through the REAL codec path end-to-end: per clip, 12
    // deterministic RGB frames (every pixel a closed-form function of
    // clip, scene, position; injected cuts re-seed the scene term at
    // frames {4,8} / {6} / {} by clip id) → PNG encode → the engine's
    // actual JDK ImageIO decode → the mm_phash aHash, packed as TWO
    // 32-bit halves (DuckDB BIGINT rejects the 1<<63 full-pack) → ONE
    // lag window per clip → Hamming(prev, cur) via xor + bit_count,
    // cut iff > 6. Within a scene frames drift by a clamped ±2 jitter
    // (hash near-stable); across an injected boundary the re-seed
    // rewrites the pattern (measured Hamming ~25-35), so detected cuts
    // equal injected cuts — and the oracle recomputes hashes from the
    // closed-form pixels WITHOUT any codec, so decode → gray →
    // resample → threshold → lag → Hamming must be exact end-to-end.
    // Per-frame work is row-local; the window runs over frame
    // cardinality (12/clip); frames parallelize independently of clip
    // boundaries at 100 TB.
    QuerySpec(
      "mm_scene_cut",
      (s, d) => {
        import s.implicits._
        val frames = Tables.documents(s, d).select(col("doc_id"))
          .filter(col("doc_id") < 60).as[Long]
          .flatMap(clip => (0 until 12).map(f => (clip, f)))
          .map { case (clip, f) =>
            val scene = (clip % 3) match {
              case 0 => (if (f >= 4) 1 else 0) + (if (f >= 8) 1 else 0)
              case 1 => if (f >= 6) 1 else 0
              case _ => 0
            }
            val w = 16 + (clip % 16).toInt
            val h = 16 + (clip % 9).toInt
            def px(i: Int): Int = math.min(
              ((clip * 131 + scene * 977 + i.toLong * 7) % 256).toInt + f % 3, 255)
            val bi = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val base = (y * w + x) * 3
                bi.setRGB(x, y,
                  (px(base) << 16) | (px(base + 1) << 8) | px(base + 2))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(bi, "png", bos)
            val (dw, dh, _, raster) = MediaCodecs.decodeImageIo(bos.toByteArray)
            val gray = Array.tabulate(64) { k =>
              val sx = (k % 8) * dw / 8
              val sy = (k / 8) * dh / 8
              val i = (sy * dw + sx) * 3
              ((raster(i) & 0xff) + (raster(i + 1) & 0xff) +
                (raster(i + 2) & 0xff)) / 3
            }
            val mean = gray.sum / 64
            def half(lo: Int): Long = (lo until lo + 32).foldLeft(0L)((acc, k) =>
              if (gray(k) >= mean) acc | (1L << (k - lo)) else acc)
            (clip, f.toLong, half(0), half(32))
          }
          .toDF("clip_id", "frame_no", "h0", "h1")
        val w = org.apache.spark.sql.expressions.Window.partitionBy("clip_id").orderBy("frame_no")
        frames
          .withColumn("p0", lag(col("h0"), 1).over(w))
          .withColumn("p1", lag(col("h1"), 1).over(w))
          .withColumn("dist", expr(
            "case when p0 is null then null else bit_count(h0 ^ p0) + bit_count(h1 ^ p1) end"))
          .groupBy("clip_id")
          .agg(count(lit(1)).as("n_frames"),
            count(when(col("dist") > 6, 1)).as("n_cuts"),
            coalesce(sum(when(col("dist") > 6, col("frame_no"))), lit(0L))
              .as("cut_pos_sum"),
            coalesce(max(col("dist")), lit(0)).cast("long").as("max_dist"))
          .withColumn("n_scenes", expr("n_cuts + 1L"))
      },
      Some {
        def pxSql(j: String): String =
          s"LEAST(((clip_id * 131 + scene * 977 + ($j) * 7) % 256) + f % 3, 255)"
        val offSql = "(((k // 8) * h // 8) * w + (k % 8) * w // 8) * 3"
        s"""
        WITH frames AS (
          SELECT doc_id AS clip_id, f,
                 CASE WHEN doc_id % 3 = 0
                        THEN (f >= 4)::INT + (f >= 8)::INT
                      WHEN doc_id % 3 = 1 THEN (f >= 6)::INT
                      ELSE 0 END AS scene,
                 16 + doc_id % 16 AS w, 16 + doc_id % 9 AS h
          FROM documents, (SELECT unnest(range(0, 12)) AS f)
          WHERE doc_id < 60),
        grids AS (
          SELECT clip_id, f,
                 list_transform(range(0, 64), k ->
                   (${pxSql(offSql)} + ${pxSql(s"$offSql + 1")}
                    + ${pxSql(s"$offSql + 2")}) // 3) AS g
          FROM frames),
        hashes AS (
          SELECT clip_id, f,
                 CAST(list_sum(list_transform(range(0, 32), k ->
                   CASE WHEN g[k + 1] >= mean THEN (1::BIGINT << k)
                        ELSE 0::BIGINT END)) AS BIGINT) AS h0,
                 CAST(list_sum(list_transform(range(32, 64), k ->
                   CASE WHEN g[k + 1] >= mean THEN (1::BIGINT << (k - 32))
                        ELSE 0::BIGINT END)) AS BIGINT) AS h1
          FROM (SELECT clip_id, f, g,
                       CAST(list_sum(g) AS BIGINT) // 64 AS mean
                FROM grids)),
        lagged AS (
          SELECT clip_id, f,
                 lag(h0) OVER (PARTITION BY clip_id ORDER BY f) AS p0,
                 lag(h1) OVER (PARTITION BY clip_id ORDER BY f) AS p1,
                 h0, h1
          FROM hashes),
        dist AS (
          SELECT clip_id, f,
                 CASE WHEN p0 IS NULL THEN NULL
                      ELSE bit_count(xor(h0, p0)) + bit_count(xor(h1, p1))
                 END AS dist
          FROM lagged)
        SELECT clip_id, count(*) AS n_frames,
               CAST(count(CASE WHEN dist > 6 THEN 1 END) AS BIGINT) AS n_cuts,
               CAST(COALESCE(SUM(CASE WHEN dist > 6 THEN f END), 0) AS BIGINT)
                 AS cut_pos_sum,
               CAST(COALESCE(MAX(dist), 0) AS BIGINT) AS max_dist,
               CAST(count(CASE WHEN dist > 6 THEN 1 END) + 1 AS BIGINT) AS n_scenes
        FROM dist GROUP BY clip_id"""
      })
  )
}
