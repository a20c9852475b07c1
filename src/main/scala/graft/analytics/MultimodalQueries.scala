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
  )
}
