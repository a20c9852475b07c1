package graft.model

import com.fasterxml.jackson.core.{JsonFactory, JsonGenerator, JsonParser, JsonToken}
import org.apache.spark.sql.{Column, SparkSession}

/** DynamoDB AttributeValue ("DynamoDB JSON") codec — SURVEY §1.1a.
  *
  * The reference never decodes items (it passes `NewImage`/`Keys` opaquely to
  * batch_write_item, app/lambdas/lambda-backfill/main.py:44-46); decoding is
  * still a capability the engine must expose so decoded relations can be
  * queried. Tag set is public DynamoDB knowledge:
  * S N B BOOL NULL L M SS NS BS.
  *
  * `decode` strips tags into plain JSON: `{"pk":{"S":"a"},"n":{"N":"1.5"}}`
  * -> `{"pk":"a","n":1.5}`. `N` keeps arbitrary precision (emitted as a JSON
  * number backed by BigDecimal — 38-digit exactness survives; SURVEY §7.4.6).
  * Depth is bounded (default 32) because `M`/`L` nest arbitrarily but Spark
  * schemas cannot; deeper payloads throw rather than silently truncate.
  *
  * Implementation is a single streaming parse→emit pass (JsonParser →
  * JsonGenerator, no tree materialization, no per-row object graphs) —
  * this UDF is the engine's hottest per-row transform, and the streaming
  * form roughly halves its cost versus the tree-based version. It is a
  * per-row transform with no state — scales embarrassingly (no shuffle).
  *
  * Registered as UDF `ddb_decode`.
  */
object AttributeValue {
  private val factory = new JsonFactory()
  val MaxDepth = 32

  /** Strip AttributeValue tags from a DynamoDB-JSON document (a map of
    * attrName -> tagged value). Returns plain JSON text; null in, null out.
    */
  def decode(ddbJson: String): String = {
    if (ddbJson == null) return null
    val p = factory.createParser(ddbJson)
    val sw = new java.io.StringWriter(ddbJson.length)
    val g = factory.createGenerator(sw)
    try { decodeRoot(p, g); sw.toString } finally p.close()
  }

  /** Byte-level form for the native expression: UTF-8 in, UTF-8 out —
    * skips the UTF8String→String→UTF-16 round trip on BOTH sides of the
    * engine's hottest per-row transform.
    */
  def decodeUtf8(in: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val p = factory.createParser(in.getBytes)
    val out = new java.io.ByteArrayOutputStream(in.numBytes())
    val g = factory.createGenerator(out, com.fasterxml.jackson.core.JsonEncoding.UTF8)
    try {
      decodeRoot(p, g)
      org.apache.spark.unsafe.types.UTF8String.fromBytes(out.toByteArray)
    } finally p.close()
  }

  private def decodeRoot(p: JsonParser, g: JsonGenerator): Unit = {
    require(p.nextToken() == JsonToken.START_OBJECT,
      "DynamoDB item must be a JSON object")
    g.writeStartObject()
    while (p.nextToken() == JsonToken.FIELD_NAME) {
      g.writeFieldName(p.currentName())
      require(p.nextToken() == JsonToken.START_OBJECT,
        s"expected tagged AttributeValue for field ${p.currentName()}")
      decodeAttr(p, g, MaxDepth)
    }
    g.writeEndObject()
    g.close()
  }

  /** One tagged AttributeValue: parser is AT its START_OBJECT; consumes
    * through the matching END_OBJECT, emitting the untagged value.
    */
  private def decodeAttr(p: JsonParser, g: JsonGenerator, depth: Int): Unit = {
    require(depth > 0, s"AttributeValue nesting exceeds $MaxDepth")
    require(p.nextToken() == JsonToken.FIELD_NAME,
      "expected single-tag AttributeValue, got empty object")
    val tag = p.currentName()
    p.nextToken() // move to the payload
    tag match {
      case "S" | "B" => g.writeString(p.getText) // B = base64 passthrough
      case "N" => writeNumberText(g, p.getText)
      case "BOOL" => g.writeBoolean(p.getBooleanValue)
      case "NULL" => g.writeNull()
      case "L" =>
        require(p.currentToken() == JsonToken.START_ARRAY, "L payload must be an array")
        g.writeStartArray()
        while (p.nextToken() == JsonToken.START_OBJECT)
          decodeAttr(p, g, depth - 1)
        g.writeEndArray()
      case "M" =>
        require(p.currentToken() == JsonToken.START_OBJECT, "M payload must be an object")
        g.writeStartObject()
        while (p.nextToken() == JsonToken.FIELD_NAME) {
          g.writeFieldName(p.currentName())
          require(p.nextToken() == JsonToken.START_OBJECT,
            s"expected tagged AttributeValue for field ${p.currentName()}")
          decodeAttr(p, g, depth - 1)
        }
        g.writeEndObject()
      case "SS" | "BS" =>
        require(p.currentToken() == JsonToken.START_ARRAY, s"$tag payload must be an array")
        g.writeStartArray()
        while (p.nextToken() != JsonToken.END_ARRAY) {
          require(p.currentToken() == JsonToken.VALUE_STRING,
            s"$tag elements must be strings, got ${p.currentToken()}")
          g.writeString(p.getText)
        }
        g.writeEndArray()
      case "NS" =>
        require(p.currentToken() == JsonToken.START_ARRAY, "NS payload must be an array")
        g.writeStartArray()
        while (p.nextToken() != JsonToken.END_ARRAY) {
          require(p.currentToken() == JsonToken.VALUE_STRING,
            s"NS elements must be number strings, got ${p.currentToken()}")
          writeNumberText(g, p.getText)
        }
        g.writeEndArray()
      case other => throw new IllegalArgumentException(s"unknown AttributeValue tag: $other")
    }
    require(p.nextToken() == JsonToken.END_OBJECT,
      "expected single-tag AttributeValue (multiple tags found)")
  }

  /** JSON number grammar (RFC 8259): what can be emitted verbatim. */
  private val JsonNumber =
    java.util.regex.Pattern.compile("-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?")

  /** Emit an N payload. The text is validated as numeric (BigDecimal
    * throws otherwise) and then emitted VERBATIM when it is already a
    * legal JSON number — re-rendering through BigDecimal would change
    * exponent spellings ("1e2" -> "1E+2") and break the documented
    * decode∘encode identity. Only DynamoDB-legal-but-non-JSON spellings
    * ("+5", ".5", "05") go through the BigDecimal rendering.
    */
  private def writeNumberText(g: JsonGenerator, text: String): Unit = {
    val bd = new java.math.BigDecimal(text) // validation: must be numeric
    if (JsonNumber.matcher(text).matches()) g.writeRawValue(text)
    else g.writeNumber(bd)
  }

  /** The three DynamoDB set tags a hint may name. */
  private val SetTags = Set("SS", "NS", "BS")

  /** Parse a compact hint spec `"tags:SS,meta.ids:NS"` into the path→tag
    * map [[encode]] takes (the SQL-surface form, see `ddb_encode_set`).
    */
  def parseSetHints(spec: String): Map[String, String] =
    spec.split(',').iterator.map(_.trim).filter(_.nonEmpty).map { entry =>
      entry.split(':') match {
        case Array(path, tag) if SetTags.contains(tag) => path.trim -> tag
        case _ => throw new IllegalArgumentException(
          s"set hint must be path:SS|NS|BS, got '$entry'")
      }
    }.toMap

  /** Inverse direction: plain JSON document -> DynamoDB-JSON (tag every
    * value). Types map by JSON kind: string→S, number→N (text preserved
    * verbatim — arbitrary precision survives), boolean→BOOL, null→NULL,
    * array→L, object→M.
    *
    * Sets are not distinguishable from lists in plain JSON, so SS/NS/BS
    * emission is HINT-driven: `setHints` maps dotted attribute paths
    * (`"tags"`, `"meta.ids"` — root fields and fields inside M; list
    * elements are unnamed and cannot be hinted) to a set tag. A hinted
    * array gets DynamoDB's set-on-write semantics: elements must be
    * scalars of the set's kind, duplicates are DROPPED keeping the first
    * occurrence (NS dedups by NUMERIC equality — "1.0" duplicates "1" —
    * keeping the first spelling), and an empty set is rejected, exactly
    * as DynamoDB rejects empty sets. Unhinted arrays stay L, and
    * decode ∘ encode is the identity on its output domain
    * (property-tested; for hinted paths, identity modulo the set dedup).
    */
  def encode(plainJson: String, setHints: Map[String, String] = Map.empty): String = {
    if (plainJson == null) return null
    val p = factory.createParser(plainJson)
    val sw = new java.io.StringWriter(plainJson.length * 2)
    val g = factory.createGenerator(sw)
    try { encodeRoot(p, g, setHints); sw.toString } finally p.close()
  }

  /** Byte-level form for the native expression (see [[decodeUtf8]]). */
  def encodeUtf8(in: org.apache.spark.unsafe.types.UTF8String,
                 setHints: Map[String, String] = Map.empty)
      : org.apache.spark.unsafe.types.UTF8String = {
    val p = factory.createParser(in.getBytes)
    val out = new java.io.ByteArrayOutputStream(in.numBytes() * 2)
    val g = factory.createGenerator(out, com.fasterxml.jackson.core.JsonEncoding.UTF8)
    try {
      encodeRoot(p, g, setHints)
      org.apache.spark.unsafe.types.UTF8String.fromBytes(out.toByteArray)
    } finally p.close()
  }

  private def encodeRoot(p: JsonParser, g: JsonGenerator,
                         hints: Map[String, String]): Unit = {
    require(p.nextToken() == JsonToken.START_OBJECT,
      "item must be a JSON object")
    g.writeStartObject()
    while (p.nextToken() == JsonToken.FIELD_NAME) {
      val name = p.currentName()
      g.writeFieldName(name)
      p.nextToken()
      encodeValue(p, g, MaxDepth, name, hints)
    }
    g.writeEndObject()
    g.close()
  }

  /** One plain value (parser AT its first token) -> tagged AttributeValue.
    * `path` is the dotted attribute path used for set-hint lookup.
    */
  private def encodeValue(p: JsonParser, g: JsonGenerator, depth: Int,
                          path: String, hints: Map[String, String]): Unit = {
    require(depth > 0, s"nesting exceeds $MaxDepth")
    require(!hints.contains(path) || p.currentToken() == JsonToken.START_ARRAY,
      s"set-hinted path '$path' must be a JSON array, got ${p.currentToken()}")
    g.writeStartObject()
    p.currentToken() match {
      case JsonToken.VALUE_STRING =>
        g.writeFieldName("S"); g.writeString(p.getText)
      case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT =>
        g.writeFieldName("N"); g.writeString(p.getText) // N transports as string
      case JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE =>
        g.writeFieldName("BOOL"); g.writeBoolean(p.getBooleanValue)
      case JsonToken.VALUE_NULL =>
        g.writeFieldName("NULL"); g.writeBoolean(true)
      case JsonToken.START_ARRAY if hints.contains(path) =>
        encodeSet(p, g, hints(path), path)
      case JsonToken.START_ARRAY =>
        g.writeFieldName("L"); g.writeStartArray()
        // list elements are unnamed: "[]" can never collide with a field
        // path, so hints do not reach inside L
        while (p.nextToken() != JsonToken.END_ARRAY)
          encodeValue(p, g, depth - 1, path + "[]", hints)
        g.writeEndArray()
      case JsonToken.START_OBJECT =>
        g.writeFieldName("M"); g.writeStartObject()
        while (p.nextToken() == JsonToken.FIELD_NAME) {
          val name = p.currentName()
          g.writeFieldName(name)
          p.nextToken()
          encodeValue(p, g, depth - 1, path + "." + name, hints)
        }
        g.writeEndObject()
      case other => throw new IllegalArgumentException(s"unsupported JSON token: $other")
    }
    g.writeEndObject()
  }

  /** Emit a hinted array as a DynamoDB set: dedup-on-write (first
    * occurrence wins), element kinds enforced, empty sets rejected.
    * Parser is AT the START_ARRAY; consumes through END_ARRAY.
    */
  private def encodeSet(p: JsonParser, g: JsonGenerator, tag: String,
                        path: String): Unit = {
    g.writeFieldName(tag)
    g.writeStartArray()
    var n = 0
    tag match {
      case "SS" | "BS" | "NS" => ()
      case other => throw new IllegalArgumentException(
        s"set hint tag must be one of $SetTags, got $other (path '$path')")
    }
    tag match {
      case "SS" | "BS" =>
        val seen = new java.util.LinkedHashSet[String]()
        while (p.nextToken() != JsonToken.END_ARRAY) {
          require(p.currentToken() == JsonToken.VALUE_STRING,
            s"$tag elements at '$path' must be strings, got ${p.currentToken()}")
          seen.add(p.getText)
        }
        n = seen.size()
        seen.forEach(s => g.writeString(s))
      case "NS" =>
        // numeric-equality dedup: key on the stripped BigDecimal so
        // "1.0" duplicates "1"; the FIRST spelling is what transports
        val seen = new java.util.LinkedHashMap[java.math.BigDecimal, String]()
        while (p.nextToken() != JsonToken.END_ARRAY) {
          val tok = p.currentToken()
          require(tok == JsonToken.VALUE_NUMBER_INT || tok == JsonToken.VALUE_NUMBER_FLOAT,
            s"NS elements at '$path' must be numbers, got $tok")
          val text = p.getText
          seen.putIfAbsent(new java.math.BigDecimal(text).stripTrailingZeros(), text)
        }
        n = seen.size()
        seen.values.forEach(v => g.writeString(v)) // N transports as string
    }
    require(n > 0, s"DynamoDB rejects empty sets: '$path' ($tag) has no elements")
    g.writeEndArray()
  }

  /** Column form: raw DynamoDB-JSON string -> plain JSON string
    * (native expression, byte-level IO).
    */
  def ddbDecode(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      DdbDecode(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** Column form: plain JSON string -> DynamoDB-JSON string. Optional
    * `setHints` drive SS/NS/BS emission (see [[encode]]).
    */
  def ddbEncode(c: Column, setHints: Map[String, String] = Map.empty): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      DdbEncode(org.apache.spark.sql.GraftSqlBridge.expression(c), setHints))

  /** Register `ddb_decode` / `ddb_encode` / `ddb_encode_set` for SQL use
    * (UDF registry — the Column API above uses the native expressions
    * directly). `ddb_encode_set(json, 'tags:SS,meta.ids:NS')` is the SQL
    * spelling of the hinted encode.
    */
  // the spec string is constant per query but the UDF sees it per ROW:
  // memoize the parsed Map so N rows cost one parse, not N
  private val hintSpecCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  def register(spark: SparkSession): Unit = {
    spark.udf.register("ddb_decode", (s: String) => decode(s))
    spark.udf.register("ddb_encode", (s: String) => encode(s))
    spark.udf.register("ddb_encode_set",
      (s: String, spec: String) =>
        encode(s, hintSpecCache.computeIfAbsent(spec, parseSetHints)))
  }
}

/** Native expression for [[AttributeValue.decodeUtf8]]: the streaming
  * parse→emit pass runs directly on UTF-8 bytes — no UTF-16 conversion
  * of either the (large) input document or the output. CodegenFallback:
  * the win is inside eval, not expression fusion.
  */
case class DdbDecode(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{DataType, StringType}

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "ddb_decode"

  override def nullSafeEval(in: Any): Any =
    AttributeValue.decodeUtf8(in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): DdbDecode =
    copy(child = newChild)
}

/** Native expression for [[AttributeValue.encodeUtf8]]. `setHints` is a
  * STATIC (plan-time) path→set-tag map — set typing is schema knowledge,
  * not data, so it rides on the expression rather than a per-row column.
  */
case class DdbEncode(child: org.apache.spark.sql.catalyst.expressions.Expression,
                     setHints: Map[String, String] = Map.empty)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{DataType, StringType}

  // hint tags are plan-time knowledge: fail at expression construction,
  // not once per row in eval
  setHints.foreach { case (p, t) =>
    require(Set("SS", "NS", "BS").contains(t),
      s"set hint for '$p' must be SS|NS|BS, got $t")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "ddb_encode"

  override def nullSafeEval(in: Any): Any =
    AttributeValue.encodeUtf8(
      in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], setHints)

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): DdbEncode =
    copy(child = newChild)
}
