package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import scala.jdk.CollectionConverters._

/** DuckDB JSON long tail (probe tier 20), each pinned against DuckDB:
  *
  *   json_type('{"a":1}') = OBJECT; '[1]' = ARRAY; '1' = UBIGINT;
  *   '-1' = BIGINT; '1.5' = DOUBLE; '"a"' = VARCHAR; 'true' =
  *   BOOLEAN; 'null' = NULL.
  *
  *   json_merge_patch follows RFC 7386: objects merge recursively, a
  *   null in the patch DELETES the key, non-objects replace wholesale
  *   ('{"a":1,"b":2}' + '{"b":null,"c":3}' = '{"a":1,"c":3}').
  *
  *   json_contains(haystack, needle) is deep-subtree containment:
  *   true when some node of the haystack deep-equals the needle —
  *   including the root, array elements, and nested object values
  *   ('{"a":{"b":2}}' contains '{"b":2}'; '[1,2,3]' contains '2').
  */
object JsonTail {
  private val mapper = new ObjectMapper()

  private def parse(fn: String, s: String): JsonNode =
    try mapper.readTree(s)
    catch { case e: Exception =>
      throw new IllegalArgumentException(s"$fn: malformed JSON: ${e.getMessage}")
    }

  def jsonType(s: String): String = {
    val n = parse("json_type", s)
    if (n.isObject) "OBJECT"
    else if (n.isArray) "ARRAY"
    else if (n.isTextual) "VARCHAR"
    else if (n.isBoolean) "BOOLEAN"
    else if (n.isNull) "NULL"
    else if (n.isIntegralNumber) {
      if (n.asText().startsWith("-")) "BIGINT" else "UBIGINT"
    } else "DOUBLE"
  }

  def mergePatch(target: String, patch: String): String = {
    val t = parse("json_merge_patch", target)
    val p = parse("json_merge_patch", patch)
    mapper.writeValueAsString(patchNode(t, p))
  }

  private def patchNode(target: JsonNode, patch: JsonNode): JsonNode =
    if (!patch.isObject) patch.deepCopy[JsonNode]()
    else {
      val out: ObjectNode =
        if (target.isObject) target.deepCopy[ObjectNode]()
        else mapper.createObjectNode()
      patch.fields().asScala.foreach { e =>
        if (e.getValue.isNull) out.remove(e.getKey)
        else out.set[JsonNode](e.getKey,
          patchNode(Option(out.get(e.getKey))
            .getOrElse(mapper.createObjectNode()), e.getValue))
      }
      out
    }

  def contains(haystack: String, needle: String): Boolean = {
    val h = parse("json_contains", haystack)
    val n = parse("json_contains", needle)
    def walk(node: JsonNode): Boolean =
      node.equals(n) ||
        (node.isContainerNode && node.elements().asScala.exists(walk))
    walk(h)
  }
}
