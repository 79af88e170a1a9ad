package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** DuckDB `json_structure` semantics: render a JSON value's type
  * template using DuckDB's type vocabulary. Pinned against DuckDB:
  *
  *   json_structure('{"a":1}')          = {"a":"UBIGINT"}
  *   json_structure('-3')               = "BIGINT"
  *   json_structure('[1, 2.5]')         = ["DOUBLE"]
  *   json_structure('[1,"x"]')          = ["JSON"]
  *   json_structure('[]')               = ["NULL"]
  *   json_structure('[{"a":1},{"b":2}]')= [{"a":"UBIGINT","b":"UBIGINT"}]
  *
  * Structures are modeled as: Left(typeName) scalars, Right(map) for
  * objects (insertion-ordered), and single-element list for arrays.
  */
object JsonStructure {
  private val mapper = new ObjectMapper()

  sealed trait S
  private final case class Scalar(t: String) extends S
  private final case class Obj(fields: scala.collection.mutable.LinkedHashMap[String, S]) extends S
  private final case class Arr(elem: S) extends S

  def render(json: String): String = {
    val node =
      try mapper.readTree(json)
      catch { case e: Throwable =>
        throw new IllegalArgumentException(s"json_structure: malformed JSON: ${e.getMessage}")
      }
    if (node == null)
      throw new IllegalArgumentException("json_structure: malformed JSON: empty input")
    show(structure(node))
  }

  private def structure(n: JsonNode): S =
    if (n.isNull) Scalar("NULL")
    else if (n.isBoolean) Scalar("BOOLEAN")
    else if (n.isIntegralNumber)
      Scalar(if (n.asText().startsWith("-")) "BIGINT" else "UBIGINT")
    else if (n.isNumber) Scalar("DOUBLE")
    else if (n.isTextual) Scalar("VARCHAR")
    else if (n.isArray) {
      val elems = n.elements().asScala.map(structure).toSeq
      if (elems.isEmpty) Arr(Scalar("NULL"))
      else Arr(elems.reduce(unify))
    } else {
      val m = scala.collection.mutable.LinkedHashMap.empty[String, S]
      n.fields().asScala.foreach(e => m.put(e.getKey, structure(e.getValue)))
      Obj(m)
    }

  private val numericRank = Map("UBIGINT" -> 0, "BIGINT" -> 1, "DOUBLE" -> 2)

  private def unify(a: S, b: S): S = (a, b) match {
    case (x, y) if x == y => x
    case (Scalar("NULL"), x) => x
    case (x, Scalar("NULL")) => x
    case (Scalar(x), Scalar(y)) if numericRank.contains(x) && numericRank.contains(y) =>
      Scalar(if (numericRank(x) >= numericRank(y)) x else y)
    case (Arr(x), Arr(y)) => Arr(unify(x, y))
    case (Obj(x), Obj(y)) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, S]
      x.foreach { case (k, v) => m.put(k, v) }
      y.foreach { case (k, v) => m.put(k, m.get(k).map(unify(_, v)).getOrElse(v)) }
      Obj(m)
    case _ => Scalar("JSON")
  }

  private def show(s: S): String = s match {
    case Scalar(t) => "\"" + t + "\""
    case Arr(e) => "[" + show(e) + "]"
    case Obj(m) => m.map { case (k, v) =>
      "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\":" + show(v)
    }.mkString("{", ",", "}")
  }
}
