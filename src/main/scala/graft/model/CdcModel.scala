package graft.model

import org.apache.spark.sql.types._

/** Native stream element of the engine — the DynamoDB-Streams-shaped CDC
  * record (reference forwards it whole: app/lambdas/cdc-to-sqs/main.py:33;
  * consumed fields: eventName / dynamodb.NewImage / dynamodb.Keys at
  * app/lambdas/lambda-backfill/main.py:32-39). `keys`/`newImage`/`oldImage`
  * stay raw DynamoDB-JSON strings; decode is a separate step (AttributeValue).
  */
final case class CdcRecord(
    eventID: String,
    eventName: String, // INSERT | MODIFY | REMOVE
    approxCreationTs: java.sql.Timestamp,
    sequenceNumber: String, // zero-padded, orderable; per-key total order
    keys: String,
    newImage: Option[String],
    oldImage: Option[String])

object CdcSchema {
  val eventNames: Seq[String] = Seq("INSERT", "MODIFY", "REMOVE")
  val Remove = "REMOVE"

  /** Flat engine-side CDC record (SURVEY §1.1b). */
  val cdcRecord: StructType = StructType(Seq(
    StructField("eventID", StringType, nullable = false),
    StructField("eventName", StringType, nullable = false),
    StructField("approxCreationTs", TimestampType, nullable = false),
    StructField("sequenceNumber", StringType, nullable = false),
    StructField("keys", StringType, nullable = false),
    StructField("newImage", StringType, nullable = true),
    StructField("oldImage", StringType, nullable = true)))

  /** Full wire envelope of a DynamoDB Streams→Lambda record (public contract
    * of the event-source mapping, cdk/lib/cdk-stack.ts:96-100). Images ride
    * as raw JSON strings to dodge AttributeValue's unbounded recursion.
    */
  val streamEnvelope: StructType = StructType(Seq(
    StructField("eventID", StringType),
    StructField("eventName", StringType),
    StructField("eventVersion", StringType),
    StructField("eventSource", StringType),
    StructField("awsRegion", StringType),
    StructField("dynamodb", StructType(Seq(
      StructField("ApproximateCreationDateTime", TimestampType),
      StructField("SequenceNumber", StringType),
      StructField("SizeBytes", LongType),
      StructField("StreamViewType", StringType),
      StructField("Keys", StringType),
      StructField("NewImage", StringType),
      StructField("OldImage", StringType))))))

  /** CloudTrail/EventBridge control event (SURVEY §1.1d; pattern at
    * cdk/lib/cdk-stack.ts:116-123, extraction check-ddb-status/main.py:24).
    */
  val controlEvent: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("detailType", StringType),
    StructField("detail", StructType(Seq(
      StructField("eventSource", StringType),
      StructField("eventName", StringType),
      StructField("requestParameters", StructType(Seq(
        StructField("sourceTableName", StringType),
        StructField("targetTableName", StringType)))))))))
}
