package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format round trips (SURVEY §2.1): the engine's mainline
  * scan is parquet (S7) and the CDC log is JSON (S8), but a pipeline
  * ingests whatever lands — CSV exports, ORC lakes. Each format round
  * trips the same frame with a declared schema (schema-on-read,
  * PERMISSIVE parse where applicable) and must reproduce it exactly.
  */
class SourcesSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_id"), col("user_id"), col("event_type"),
      floor(col("value") * 100).cast("long").as("cents"))

  test("csv, json, and orc round-trip the events frame with a declared schema") {
    val base = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type", "value")
    val expected = canon(base)
    val schema = base.schema

    val csvDir = Files.createTempDirectory("src-csv").toFile.getAbsolutePath
    base.write.option("header", "true").mode("overwrite").csv(csvDir)
    val fromCsv = canon(spark.read.schema(schema).option("header", "true").csv(csvDir))
    assert(fromCsv.exceptAll(expected).count() == 0 &&
      expected.exceptAll(fromCsv).count() == 0)

    val jsonDir = Files.createTempDirectory("src-json").toFile.getAbsolutePath
    base.write.mode("overwrite").json(jsonDir)
    val fromJson = canon(spark.read.schema(schema).json(jsonDir))
    assert(fromJson.exceptAll(expected).count() == 0 &&
      expected.exceptAll(fromJson).count() == 0)

    val orcDir = Files.createTempDirectory("src-orc").toFile.getAbsolutePath
    base.write.mode("overwrite").orc(orcDir)
    val fromOrc = canon(spark.read.orc(orcDir))
    assert(fromOrc.exceptAll(expected).count() == 0 &&
      expected.exceptAll(fromOrc).count() == 0)
  }

  test("corrupt JSON lines land in _corrupt_record, valid rows still parse (P1 guard)") {
    val dir = Files.createTempDirectory("src-corrupt").toFile.getAbsolutePath
    val w = new java.io.PrintWriter(new java.io.File(dir, "mixed.json"))
    w.println("""{"event_id": 1, "event_type": "purchase"}""")
    w.println("""{"event_id": oops not json""")
    w.println("""{"event_id": 2, "event_type": "signup"}""")
    w.close()
    val df = spark.read
      .schema("event_id BIGINT, event_type STRING, _corrupt_record STRING")
      .json(dir)
      .cache() // PERMISSIVE corrupt-record column requires a materialized scan
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    df.unpersist()
    ()
  }

  /** Tables.normalizeTs must converge every physical timestamp encoding the
    * driver's generator has shipped (Long ns-since-epoch under nanosAsLong,
    * parquet timestamp[us]/NTZ) — plus already-ltz data — onto the SAME
    * TimestampType instants. One fixture per encoding, written as tiny
    * parquet files, so a future testdata regeneration that flips the
    * physical type fails here at build time, not in the round's
    * CORRECTNESS artifact (the r6 regression class).
    */
  test("normalizeTs converges Long-nanos, NTZ, and LTZ encodings to identical ltz instants") {
    import org.apache.spark.sql.types._
    val micros = Seq(0L, 1_700_000_000_123_456L, -62_135_596_800_000_000L / 1000)

    def roundTrip(dt: DataType, toVal: Long => Any): org.apache.spark.sql.DataFrame = {
      val rows = micros.zipWithIndex.map { case (us, i) =>
        org.apache.spark.sql.Row(i.toLong, toVal(us))
      }
      val schema = StructType(Seq(StructField("id", LongType), StructField("ts", dt)))
      val dir = Files.createTempDirectory(s"ts-${dt.typeName}").toFile.getAbsolutePath
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
        .write.mode("overwrite").parquet(dir)
      Tables.normalizeTs(spark.read.parquet(dir), "ts")
    }

    val fromLong = roundTrip(LongType, us => us * 1000L) // ns-since-epoch
    val fromNtz  = roundTrip(TimestampNTZType,
      us => java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1_000_000L), (Math.floorMod(us, 1_000_000L) * 1000).toInt,
        java.time.ZoneOffset.UTC))
    val fromLtz  = roundTrip(TimestampType,
      us => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1_000_000L), Math.floorMod(us, 1_000_000L) * 1000)))

    for (df <- Seq(fromLong, fromNtz, fromLtz))
      assert(df.schema("ts").dataType == TimestampType, df.schema.treeString)

    val asMicros = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }.toMap
    assert(asMicros(fromLong) == expected)
    assert(asMicros(fromNtz) == expected)
    assert(asMicros(fromLtz) == expected)
  }

  test("normalizeTs leaves non-timestamp columns and absent names untouched") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(Tables.normalizeTs(df, "ts", "no_such_col").schema == df.schema)
  }
}
