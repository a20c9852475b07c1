package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Transport seam for the CDC pipeline (SURVEY §2.9 S1): a connector
  * yields the unbounded frame of flat [[graft.model.CdcSchema.cdcRecord]]
  * rows; everything downstream — dedup, windows, the stateful ops,
  * [[CdcStream.applySink]] — is transport-agnostic.
  *
  * The reference's production transport is DynamoDB Streams → Lambda →
  * SQS FIFO (cdk/lib/cdk-stack.ts:47-100); on a Spark cluster that role
  * maps to a Kinesis/Kafka connector implementing this trait (the
  * connector jar provides the `readStream.format(...)`; the
  * implementation parses its wire format into cdcRecord rows). The
  * sandbox ships [[FileCdcSource]]; tests drive the same pipeline from a
  * MemoryStream-backed source — swapping transports is a constructor
  * argument, not an edit at every source call site.
  */
trait CdcSource {
  /** The unbounded stream of flat cdcRecord rows. */
  def stream(spark: SparkSession): DataFrame
}

/** Checkpointed JSON-lines directory transport — replayable storage, so
  * offsets + idempotent merge give exactly-once and a gated late start is
  * lossless (see [[CdcStream.cdcFileSource]]).
  */
final case class FileCdcSource(dir: String, maxFilesPerTrigger: Int = 1000)
    extends CdcSource {
  override def stream(spark: SparkSession): DataFrame =
    CdcStream.cdcFileSource(spark, dir, maxFilesPerTrigger)
}
