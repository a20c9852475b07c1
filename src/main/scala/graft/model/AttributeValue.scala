package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, JsonNodeFactory}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

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
  * Registered as UDF `ddb_decode`. This is a per-row string transform with no
  * state — it scales embarrassingly (no shuffle) and sits behind a codegen'd
  * from_json once the user supplies the decoded schema.
  */
object AttributeValue {
  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance
  val MaxDepth = 32

  /** Strip AttributeValue tags from a DynamoDB-JSON document (a map of
    * attrName -> tagged value). Returns plain JSON text; null in, null out.
    */
  def decode(ddbJson: String): String = {
    if (ddbJson == null) return null
    val root = mapper.readTree(ddbJson)
    require(root.isObject, s"DynamoDB item must be a JSON object, got: ${root.getNodeType}")
    val out = nf.objectNode()
    val it = root.properties().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.set[JsonNode](e.getKey, decodeAttr(e.getValue, MaxDepth))
    }
    mapper.writeValueAsString(out)
  }

  /** One tagged AttributeValue `{tag: payload}` -> plain JSON node. */
  private def decodeAttr(node: JsonNode, depth: Int): JsonNode = {
    require(depth > 0, s"AttributeValue nesting exceeds $MaxDepth")
    require(node.isObject && node.size == 1, s"expected single-tag AttributeValue, got: $node")
    val tag = node.fieldNames().next()
    val v = node.get(tag)
    tag match {
      case "S"    => nf.textNode(v.asText)
      case "N"    => nf.numberNode(new java.math.BigDecimal(v.asText))
      case "B"    => nf.textNode(v.asText) // base64 passthrough
      case "BOOL" => nf.booleanNode(v.asBoolean)
      case "NULL" => nf.nullNode()
      case "L" =>
        val arr = nf.arrayNode()
        v.forEach(el => arr.add(decodeAttr(el, depth - 1)))
        arr
      case "M" =>
        val obj = nf.objectNode()
        val it = v.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          obj.set[JsonNode](e.getKey, decodeAttr(e.getValue, depth - 1))
        }
        obj
      case "SS" | "BS" =>
        val arr = nf.arrayNode(); v.forEach(el => arr.add(nf.textNode(el.asText))); arr
      case "NS" =>
        val arr = nf.arrayNode()
        v.forEach(el => arr.add(nf.numberNode(new java.math.BigDecimal(el.asText))))
        arr
      case other => throw new IllegalArgumentException(s"unknown AttributeValue tag: $other")
    }
  }

  private val decodeUdf = udf((s: String) => decode(s))

  /** Column form: raw DynamoDB-JSON string -> plain JSON string. */
  def ddbDecode(c: Column): Column = decodeUdf(c)

  /** Register `ddb_decode` for SQL use. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("ddb_decode", (s: String) => decode(s))
}
