package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-image record produced by the typed decode path.
  * `pixels` is the decoded sample buffer (row-major, bounded preview —
  * a real decode would emit the full plane). `decoder` is the
  * provenance tag — "real-ppm" / "real-jdk" / "stub" — so a pipeline
  * consumer can filter fabricated rasters out of training data instead
  * of discovering them by statistics (r6; stub rows were previously
  * indistinguishable downstream).
  */
final case class DecodedImage(
    doc_id: Long, width: Int, height: Int, channels: Int, pixels: Array[Float],
    decoder: String)

/** One decoded video/animation frame from the typed extraction path. */
final case class VideoFrame(
    doc_id: Long, frame_no: Int, width: Int, height: Int, channels: Int,
    frame_digest: String)

/** Typed multimodal processing over opaque binary columns.
  *
  * This is the Scala analog of a vectorized-batch UDF pipeline: binary
  * payloads flow per-partition through `mapPartitions`, decoded in bounded
  * batches so a real codec could amortize native-library setup per batch
  * (the same batch shape `mapInPandas` would give a Python pipeline).
  *
  * Decode dispatch is by magic bytes:
  *  - PPM (P6) and PCM-16 WAV payloads are REALLY decoded — pure byte
  *    parsing, no codec library needed ([[MediaCodecs]]); pixels/samples
  *    are the actual raster/waveform values.
  *  - PNG / JPEG / BMP / GIF payloads are REALLY decoded through the
  *    JDK's built-in `javax.imageio` readers
  *    ([[MediaCodecs.decodeImageIo]]) — actual rasters, zero external
  *    dependencies.
  *  - anything else (MP3/MP4/WebP/...: no JDK reader) falls to the
  *    ██ STUB ██ paths: `decodeStub` derives a deterministic fake
  *    buffer from the header bytes. Everything around the stub —
  *    BinaryType schema, partition iteration, batching, typed Dataset
  *    output — is the real engine plumbing a remaining-format codec
  *    would drop into.
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
    DecodedImage(-1L, w, h, c, px, "stub")
  }

  /** Provenance tag a payload gets under the decode dispatch — the
    * magic-byte rule [[decodeImages]]/[[resizeImages]] route by, exposed
    * so queries and specs can mirror it ("real-ppm" / "real-jdk" /
    * "stub").
    */
  def decoderTag(img: Array[Byte]): String =
    if (MediaCodecs.isPpm(img)) "real-ppm"
    else if (MediaCodecs.isImageIoFormat(img)) "real-jdk"
    else "stub"

  /** Real raster (PPM or ImageIO) → preview-bounded DecodedImage:
    * actual pixel values scaled to [0,1), bounded to `previewLen`
    * samples (the full plane of a 4k image is 50M floats — the PREVIEW
    * bound is the row-size contract; a full-plane consumer uses
    * [[resizeImages]], whose output size is caller-bounded).
    */
  private def fromRaster(w: Int, h: Int, c: Int, raster: Array[Byte],
                         previewLen: Int, decoder: String): DecodedImage = {
    val n = math.min(previewLen, raster.length)
    DecodedImage(-1L, w, h, c, Array.tabulate(n)(i => (raster(i) & 0xff) / 255f), decoder)
  }

  /** Real decode dispatch by [[decoderTag]]: P6 via the byte parser,
    * PNG/JPEG/BMP/GIF via the JDK's ImageIO readers
    * ([[MediaCodecs.decodeImageIo]]); None for formats that must take
    * the stub. The tag travels with the raster.
    */
  private def decodeReal(img: Array[Byte]): Option[(String, (Int, Int, Int, Array[Byte]))] =
    decoderTag(img) match {
      case "real-ppm" => Some("real-ppm" -> MediaCodecs.decodePpm(img))
      case "real-jdk" => Some("real-jdk" -> MediaCodecs.decodeImageIo(img))
      case _          => None
    }

  /** Batched typed decode: (doc_id, img binary) → Dataset[DecodedImage].
    * Batches bound per-task memory and give codecs an amortization unit.
    * P6 and PNG/JPEG/BMP/GIF payloads decode for real; others take the
    * stub (see object doc).
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
            val d = decodeReal(img) match {
              case Some((tag, (w, h, c, raster))) =>
                fromRaster(w, h, c, raster, previewLen, tag)
              case None => decodeStub(img, previewLen)
            }
            d.copy(doc_id = id)
          }
        }
      }
  }

  /** REAL frame extraction for animated-GIF payloads (M3): every frame
    * decoded through the JDK's GIF sequence reader
    * ([[MediaCodecs.decodeGifFrames]]), one row per frame keyed by the
    * source doc with dims and a raster digest — per-frame work then
    * parallelizes past document boundaries. Non-GIF payloads keep the
    * stride-stub shape in [[sampleFrames]].
    */
  def extractFramesGif(df: DataFrame): Dataset[VideoFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("img"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, img) =>
          MediaCodecs.decodeGifFrames(img).zipWithIndex.map {
            case ((w, h, c, raster), i) =>
              val md = java.security.MessageDigest.getInstance("MD5")
              val hex = md.digest(raster).map("%02x".format(_)).mkString
              VideoFrame(id, i, w, h, c, hex)
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

  /** Resize to a fixed raster — what lets a downstream feature stage
    * batch uniformly. P6 and PNG/JPEG/BMP/GIF payloads get a REAL 2D
    * nearest-neighbor resample over the full decoded plane (output is
    * exactly targetW×targetH×channels actual pixel values); other
    * payloads take the ██ STUB ██ path (1D nearest-neighbor over the
    * fake preview, targetW*targetH single-plane values) — a codec for a
    * remaining format swaps `decodeStub`, everything else stays.
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
            decodeReal(img) match {
              case Some((tag, (w, h, c, raster))) =>
                // real nearest-neighbor: out(x,y,ch) = in(x*w/tw, y*h/th, ch)
                val px = Array.tabulate(targetW * targetH * c) { i =>
                  val ch = i % c; val x = (i / c) % targetW; val y = i / (c * targetW)
                  val sx = (x.toLong * w / targetW).toInt
                  val sy = (y.toLong * h / targetH).toInt
                  (raster((sy * w + sx) * c + ch) & 0xff) / 255f
                }
                DecodedImage(id, targetW, targetH, c, px, tag)
              case None =>
                val full = decodeStub(img, previewLen = 64)
                val n = targetW * targetH
                // nearest-neighbor over the preview buffer (stub resample)
                val px = Array.tabulate(n) { i =>
                  full.pixels(((i.toLong * full.pixels.length) / n).toInt)
                }
                DecodedImage(id, targetW, targetH, full.channels, px, "stub")
            }
          }
        }
      }
  }

  /** REAL audio feature extraction over WAV payloads — PCM-16 through
    * the hand-rolled fast path, 8-bit/µ-law/a-law through the JDK's
    * `javax.sound.sampled` converters ([[MediaCodecs.decodeWav]]):
    * per-window RMS energy of the actual waveform (normalized to
    * [0,1]), the first stage of any mel/MFCC pipeline. Typed
    * mapPartitions (not a UDF): each doc explodes to (win_no, rms,
    * sample_rate, channels) rows, so feature work parallelizes past
    * document boundaries. Rejects non-WAV payloads loudly — mixing in
    * formats with no JDK decoder requires the stub path below, a
    * deliberate caller decision.
    */
  def audioFeaturesPcm(df: DataFrame, windowSamples: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("img"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, img) =>
          val (rate, ch, samples) = MediaCodecs.decodeWav(img)
          samples.grouped(windowSamples).zipWithIndex.map { case (win, no) =>
            val sumSq = win.foldLeft(0.0)((a, s) => a + s.toDouble * s)
            (id, no.toLong, math.sqrt(sumSq / win.length) / 32768.0, rate, ch, "real-wav")
          }
        }
      }
      .toDF("doc_id", "win_no", "rms", "sample_rate", "channels", "decoder")
  }

  /** ██ STUB ██ audio feature extraction for payloads without a parseable
    * waveform: treats the bytes as PCM-ish samples and emits per-window
    * energy (mean absolute amplitude per `window`-byte hop) — the
    * mel/MFCC shape without the codec. The explode-to-windows layout
    * matches sampleFrames and [[audioFeaturesPcm]].
    */
  def audioFeatures(df: DataFrame, window: Int = 4): DataFrame =
    df.select(col("doc_id"), col("img"))
      .withColumn("win_start", explode(expr(s"sequence(0, length(img) - $window, $window)")))
      .withColumn("energy", expr(
        s"""aggregate(transform(sequence(1, $window),
              i -> cast(conv(hex(substring(img, win_start + i, 1)), 16, 10) as bigint)),
            0L, (acc, v) -> acc + v) / cast($window as double)"""))
      .select(col("doc_id"), (col("win_start") / window).cast("long").as("win_no"),
        col("energy"), lit("stub").as("decoder"))
}
