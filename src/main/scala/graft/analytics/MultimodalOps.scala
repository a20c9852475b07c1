package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-image record produced by the typed decode path.
  * `pixels` is the decoded sample buffer (row-major, bounded preview —
  * a real decode would emit the full plane).
  */
final case class DecodedImage(
    doc_id: Long, width: Int, height: Int, channels: Int, pixels: Array[Float])

/** Typed multimodal processing over opaque binary columns.
  *
  * This is the Scala analog of a vectorized-batch UDF pipeline: binary
  * payloads flow per-partition through `mapPartitions`, decoded in bounded
  * batches so a real codec could amortize native-library setup per batch
  * (the same batch shape `mapInPandas` would give a Python pipeline).
  *
  * ██ STUB ██ — this container ships no image/audio codecs, so
  * `decodeStub` derives a deterministic fake pixel buffer from the header
  * bytes instead of a real decode. Everything around it — BinaryType
  * schema, partition iteration, batching, typed Dataset output — is the
  * real engine plumbing a codec would drop into.
  *
  * Scale posture: per-partition map, no shuffle, no driver collection;
  * batch size bounds peak memory per task regardless of corpus size.
  */
object MultimodalOps {

  /** Attach the deterministic fake media payload (16 header bytes). */
  def withFakeMedia(docs: DataFrame): DataFrame =
    docs.withColumn("img", unhex(md5(col("text"))))

  /** Header fields from the fake payload — mirrors mm_decode_meta. */
  private def header(img: Array[Byte]): (Int, Int, Int) = {
    def u(b: Byte): Int = b & 0xff
    val width = 1 + ((u(img(0)) << 8 | u(img(1))) % 4096)
    val height = 1 + ((u(img(2)) << 8 | u(img(3))) % 4096)
    val channels = 1 + (u(img(4)) % 3)
    (width, height, channels)
  }

  /** ██ STUB ██ deterministic fake decode: pixel i cycles through the
    * payload bytes scaled to [0,1). A real implementation would call the
    * codec here and is the ONLY thing that changes at integration time.
    */
  private def decodeStub(img: Array[Byte], previewLen: Int): DecodedImage = {
    val (w, h, c) = header(img)
    val n = math.min(previewLen, w * h * c)
    val px = Array.tabulate(n)(i => (img(i % img.length) & 0xff) / 255f)
    DecodedImage(-1L, w, h, c, px)
  }

  /** Batched typed decode: (doc_id, img binary) → Dataset[DecodedImage].
    * Batches bound per-task memory and give codecs an amortization unit.
    */
  def decodeImages(df: DataFrame, batchSize: Int = 64, previewLen: Int = 16)
      : Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("img"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch seam: codec/native-lib setup would happen once here
          batch.iterator.map { case (id, img) =>
            decodeStub(img, previewLen).copy(doc_id = id)
          }
        }
      }
  }

  /** Frame sampling for a (fake) video payload: every `stride`-th byte
    * offset becomes a frame marker with a content digest — the shape of a
    * real frame-extraction pass (explode to frames, keyed by source doc).
    */
  def sampleFrames(df: DataFrame, stride: Int = 4): DataFrame =
    df.select(col("doc_id"), col("img"))
      .withColumn("frame_idx", explode(expr(s"sequence(0, length(img) - 1, $stride)")))
      .withColumn("frame_hash", md5(expr("substring(img, frame_idx + 1, 4)")))
      .select("doc_id", "frame_idx", "frame_hash")

  /** ██ STUB ██ resize: decode → subsample to the target raster. The
    * resample itself fakes nearest-neighbor over the stub pixel buffer; a
    * real implementation swaps `decodeStub` + this sampler for a codec
    * call, everything else (typed batch flow, bounded output schema)
    * stays. Output buffer length is exactly targetW*targetH — resize
    * normalizes heterogeneous media to a fixed shape, which is what lets
    * a downstream feature stage batch uniformly.
    */
  def resizeImages(df: DataFrame, targetW: Int, targetH: Int,
                   batchSize: Int = 64): Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("img"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, img) =>
            val full = decodeStub(img, previewLen = 64)
            val n = targetW * targetH
            // nearest-neighbor over the preview buffer (stub resample)
            val px = Array.tabulate(n) { i =>
              full.pixels(((i.toLong * full.pixels.length) / n).toInt)
            }
            DecodedImage(id, targetW, targetH, full.channels, px)
          }
        }
      }
  }

  /** ██ STUB ██ audio feature extraction: treats the payload as PCM-ish
    * samples and emits per-window energy (mean absolute amplitude per
    * `window`-byte hop) — the mel/MFCC shape without the codec. The
    * explode-to-windows layout matches sampleFrames: per-window rows
    * keyed by source doc, so feature work parallelizes past document
    * boundaries.
    */
  def audioFeatures(df: DataFrame, window: Int = 4): DataFrame =
    df.select(col("doc_id"), col("img"))
      .withColumn("win_start", explode(expr(s"sequence(0, length(img) - $window, $window)")))
      .withColumn("energy", expr(
        s"""aggregate(transform(sequence(1, $window),
              i -> cast(conv(hex(substring(img, win_start + i, 1)), 16, 10) as bigint)),
            0L, (acc, v) -> acc + v) / cast($window as double)"""))
      .select(col("doc_id"), (col("win_start") / window).cast("long").as("win_no"),
        col("energy"))
}
