package graft.server

/** HTTP protocol surface of the reference server, re-expressed
  * (uquery-rs src/web/: content types mod.rs:1-6, negotiation
  * routers.rs:191-205, error shape core/error.rs:12-21 +
  * response.rs:27-40, request decode request.rs:23-67).
  */
object Protocol {
  val ContentTypeCsv = "text/csv"
  val ContentTypeJson = "application/json"
  val ContentTypeJsonLines = "application/jsonlines"
  val ContentTypeJsonl = "application/jsonl"
  val ContentTypeArrow = "application/vnd.apache.arrow.stream"
  val ContentTypeAny = "*/*"
  val ContentTypeProblem = "application/problem+json"

  val MaxBodyBytes: Int = 256 * 1024 // request.rs:41

  sealed trait Format { def contentType: String }
  case object Json extends Format { val contentType = ContentTypeJson }
  case object Csv extends Format { val contentType = ContentTypeCsv }
  case object JsonLines extends Format { val contentType = ContentTypeJsonLines }
  case object Arrow extends Format { val contentType = ContentTypeArrow }

  /** First compatible format wins across the comma-split Accept header;
    * the any-type wildcard maps to JSON; missing/unmatched → None
    * (→ 406). Mirrors routers.rs:191-205 exactly (parameters like
    * `;q=` are part of the non-matching token there too).
    */
  def negotiate(accept: Option[String]): Option[Format] =
    accept.flatMap { a =>
      a.toLowerCase.split(",").collectFirst {
        case ContentTypeJson | ContentTypeAny => Json
        case ContentTypeCsv => Csv
        case ContentTypeArrow => Arrow
        case ContentTypeJsonLines | ContentTypeJsonl => JsonLines
      }
    }

  final case class Problem(status: Int, title: String, detail: String) {
    def toJson: String =
      s"""{"status":$status,"title":${jsonString(title)},"detail":${jsonString(detail)}}"""
  }

  def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Body decode: JSON `{"query": "..."}` iff Content-Type contains
    * application/json, else raw UTF-8 SQL (request.rs:49-65).
    */
  def decodeSql(contentType: Option[String], body: Array[Byte]): Either[Problem, String] = {
    val ct = contentType.getOrElse("")
    if (ct.contains(ContentTypeJson)) parseQueryJson(new String(body, "UTF-8"))
    else Right(new String(body, "UTF-8"))
  }

  /** Minimal parser for the one accepted shape {"query": "<string>"}. */
  private[server] def parseQueryJson(s: String): Either[Problem, String] = {
    val t = s.trim
    val keyIdx = t.indexOf("\"query\"")
    if (!t.startsWith("{") || keyIdx < 0)
      return Left(Problem(400, "Invalid JSON", "expected {\"query\": \"...\"}"))
    val colon = t.indexOf(':', keyIdx + 7)
    if (colon < 0) return Left(Problem(400, "Invalid JSON", "missing value for \"query\""))
    val rest = t.substring(colon + 1).trim
    if (!rest.startsWith("\""))
      return Left(Problem(400, "Invalid JSON", "\"query\" must be a string"))
    val sb = new StringBuilder
    var i = 1
    var done = false
    while (!done && i < rest.length) {
      rest.charAt(i) match {
        case '\\' if i + 1 < rest.length =>
          rest.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'u' if i + 5 < rest.length =>
              try sb.append(Integer.parseInt(rest.substring(i + 2, i + 6), 16).toChar)
              catch { case _: NumberFormatException =>
                return Left(Problem(400, "Invalid JSON",
                  s"bad unicode escape \\u${rest.substring(i + 2, i + 6)}"))
              }
              i += 6
            case c => sb.append(c); i += 2
          }
        case '"' => done = true
        case c => sb.append(c); i += 1
      }
    }
    if (!done) Left(Problem(400, "Invalid JSON", "unterminated string"))
    else Right(sb.toString)
  }
}
