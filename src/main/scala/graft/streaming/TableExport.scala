package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Table export/import in the public DynamoDB S3-export shape — the
  * reference domain's other restore path (`ExportTableToPointInTime`
  * with `DYNAMODB_JSON`): gzipped JSON lines, one `{"Item": <DynamoDB-
  * JSON item>}` object per live item, plus a `manifest-summary.json`
  * carrying the item count and format tag. Composed with the store's
  * retained versions, `exportDdbJson(asOf = Some(v))` IS
  * export-to-point-in-time; `importDdbJson` seeds a fresh target from
  * an export with a NULL sequence stamp (the store's pre-seeded-
  * snapshot rule), so every live CDC delta replayed afterwards
  * outranks the imported base — exactly the restore composition.
  *
  * Scale posture: the export is one applied-state read written
  * partition-parallel (no driver materialization; the one driver-side
  * number is the item count for the summary); the import is one text
  * scan + the store's normal merge. Item images must be DynamoDB-JSON
  * objects (the engine's wire form — see `cdc_ddb_roundtrip`).
  */
object TableExport {

  /** Export the target's applied state (live, or a retained version) as
    * DYNAMODB_JSON lines under `outDir/data/`, with a
    * `manifest-summary.json` at the root. Returns the item count.
    */
  def exportDdbJson(spark: SparkSession, targetDir: String, outDir: String,
                    asOf: Option[String] = None,
                    imageCol: String = "newImage"): Long = {
    val state = asOf
      .map(v => SnapshotStore.readTargetAsOf(spark, targetDir, v))
      .getOrElse(SnapshotStore.readTarget(spark, targetDir))
    state
      .select(concat(lit("""{"Item":"""), col(imageCol), lit("}")).as("value"))
      .write.mode("overwrite").option("compression", "gzip")
      .text(s"$outDir/data")
    val n = spark.read.text(s"$outDir/data").count()
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(outDir, "manifest-summary.json"), true)
    try out.write(
      s"""{"itemCount":$n,"outputFormat":"DYNAMODB_JSON"}""".getBytes("UTF-8"))
    finally out.close()
    n
  }

  /** Item count recorded by an export's manifest-summary.json. */
  def exportedItemCount(spark: SparkSession, outDir: String): Long = {
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(outDir, "manifest-summary.json"))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    """"itemCount":(\d+)""".r.findFirstMatchIn(body)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(
        s"no itemCount in $outDir/manifest-summary.json"))
  }

  /** Seed a target from a DYNAMODB_JSON export. `keyOf` extracts the
    * key from the Item image (DynamoDB keys live inside the item).
    * Imported rows carry a NULL sequence stamp, so any real CDC delta
    * merged later outranks the import — the pre-seeded-restore-snapshot
    * contract. Fails loudly if the line count disagrees with the
    * export's own manifest (a partial copy must not look complete).
    */
  def importDdbJson(spark: SparkSession, srcDir: String, targetDir: String,
                    keyOf: Column => Column, batchId: Long = 0L): Long = {
    val items = spark.read.text(s"$srcDir/data")
      .select(get_json_object(col("value"), "$.Item").as("newImage"))
    val declared = exportedItemCount(spark, srcDir)
    val actual = items.count()
    if (actual != declared)
      throw new IllegalStateException(
        s"export at '$srcDir' declares $declared items but data/ holds $actual — " +
          "refusing to import a partial export")
    val delta = items.select(
      keyOf(col("newImage")).as("keys"), lit("PUT").as("op"),
      lit(null).cast("string").as("sequenceNumber"), col("newImage"))
    SnapshotStore.mergeIntoTarget(spark, targetDir, delta, batchId)
    actual
  }

  /** Convenience composition: export (optionally as-of) then import
    * into a fresh target — restore-from-export as one call.
    */
  def restoreFromExport(spark: SparkSession, srcTarget: String,
                        stagingDir: String, dstTarget: String,
                        keyOf: Column => Column,
                        asOf: Option[String] = None): Long = {
    exportDdbJson(spark, srcTarget, stagingDir, asOf)
    importDdbJson(spark, stagingDir, dstTarget, keyOf)
  }
}
