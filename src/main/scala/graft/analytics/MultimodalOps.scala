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
}
