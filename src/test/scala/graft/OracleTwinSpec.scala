package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 contract (verdict #8): every oracle-exempt query (oracle =
  * None → the driver records only a rows-only check) must name an
  * oracle-CHECKED twin in its doc string via a machine-readable
  * `twin=<name>` marker, so the linkage "this engine-native variant is
  * backed by that oracle-passing portable variant" is verifiable
  * mechanically, not by prose archaeology.
  */
class OracleTwinSpec extends AnyFunSuite {

  private val twinRe = "twin=([a-z0-9_]+)".r
  private lazy val all = SparkEntry.modules.flatMap(_.queries)
  private lazy val byName = all.map(q => q.name -> q).toMap

  test("every oracle-exempt query names an oracle-checked twin") {
    val exempt = all.filter(_.oracle.isEmpty)
    assert(exempt.nonEmpty, "expected some oracle-exempt queries")
    val problems = exempt.flatMap { q =>
      twinRe.findFirstMatchIn(q.doc) match {
        case None => Some(s"${q.name}: no twin= marker in doc")
        case Some(m) =>
          val t = m.group(1)
          byName.get(t) match {
            case None => Some(s"${q.name}: twin=$t does not exist")
            case Some(tw) if tw.oracle.isEmpty =>
              Some(s"${q.name}: twin=$t is itself oracle-exempt")
            case _ => None
          }
      }
    }
    assert(problems.isEmpty, problems.mkString("; "))
  }

  test("twin markers never point at themselves") {
    for (q <- all; m <- twinRe.findFirstMatchIn(q.doc))
      assert(m.group(1) != q.name, s"${q.name} twins itself")
  }
}
