package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** Round-14 verdict #1: CaseMapDispatch's doGenCode emitted a call to a
  * companion method named `map`, which gets NO static forwarder (the
  * case class inherits TreeNode.map), so Janino failed to compile and
  * Spark silently fell back to interpreted execution for every served
  * upper/lower — values correct, plan degraded, invisible to every
  * value-checking spec.
  *
  * This spec makes the failure mode loud for ALL custom codegen
  * kernels: `GenerateUnsafeProjection.generate` THROWS on a compile
  * error (unlike `UnsafeProjection.create`, whose FALLBACK factory
  * mode swallows it), so each kernel below is proven to (a) compile
  * and (b) produce the same value as its interpreted eval. A future
  * forwarder collision or codegen typo fails here by name, not as a
  * WARN in a 195-second bench tail. (WarnAuditSpec separately
  * red-bars any `falling back to interpreter mode` warn in the full
  * inventory sweep.)
  */
class CodegenCompileSpec extends AnyFunSuite {

  private def str(i: Int) = BoundReference(i, StringType, nullable = true)
  private def dbl(i: Int) = BoundReference(i, DoubleType, nullable = true)

  /** Compile via codegen (throws on Janino failure), evaluate on
    * `row`, and assert the projected value equals interpreted eval. */
  private def compiled(expr: Expression, row: InternalRow): Any = {
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val out = proj(row)
    val got = if (out.isNullAt(0)) null else out.get(0, expr.dataType)
    val want = expr.eval(row)
    (got, want) match {
      case (g: UTF8String, w: UTF8String) => assert(g.toString == w.toString)
      case (g, w) => assert(g == w, s"codegen $g != interpreted $w for $expr")
    }
    got
  }

  test("CaseMapDispatch codegen compiles and matches interpreted (the r14 defect)") {
    val row = InternalRow(UTF8String.fromString("straße İstanbul ǅa"))
    val up = compiled(CaseMapDispatch(str(0), toUpper = true), row)
    assert(up.asInstanceOf[UTF8String].toString == "STRAẞE İSTANBUL ǄA")
    val low = compiled(CaseMapDispatch(str(0), toUpper = false), InternalRow(UTF8String.fromString("STRAẞE Ǆ")))
    assert(low.asInstanceOf[UTF8String].toString == "straße ǆ")
    // null flows through
    compiled(CaseMapDispatch(str(0), toUpper = true), InternalRow(null))
  }

  test("CharEntropy codegen compiles and matches interpreted") {
    compiled(CharEntropy(str(0)), InternalRow(UTF8String.fromString("aabb")))
    compiled(CharEntropy(str(0)), InternalRow(UTF8String.fromString("")))
  }

  test("SimHash64 codegen compiles and matches interpreted") {
    val hashes = BoundReference(0, ArrayType(LongType, containsNull = false), nullable = true)
    compiled(SimHash64(hashes),
      InternalRow(new GenericArrayData(Array[Any](0x1234L, -7L, 0xdeadbeefL, 42L))))
    compiled(SimHash64(hashes), InternalRow(new GenericArrayData(Array.empty[Any])))
  }

  test("CosineSimilarity codegen compiles and matches interpreted") {
    val at = ArrayType(FloatType, containsNull = false)
    val a = BoundReference(0, at, nullable = true)
    val b = BoundReference(1, at, nullable = true)
    val va = new GenericArrayData(Array[Any](1.0f, 2.0f, 3.0f))
    val vb = new GenericArrayData(Array[Any](-1.0f, 0.5f, 2.0f))
    val got = compiled(CosineSimilarity(a, b), InternalRow(va, vb))
    // dot = -1 + 1 + 6 = 6; |a|² = 14; |b|² = 5.25
    assert(math.abs(got.asInstanceOf[Double] - 6.0 / math.sqrt(14.0 * 5.25)) < 1e-12)
    // mismatched lengths → null on both paths
    compiled(CosineSimilarity(a, b),
      InternalRow(va, new GenericArrayData(Array[Any](1.0f))))
  }

  test("PlaneSignature codegen compiles and matches interpreted") {
    val at = ArrayType(FloatType, containsNull = true)
    val v = BoundReference(0, at, nullable = true)
    val planes = Array(Array(1, 0, -1), Array(-1, 1, 0), Array(0, 0, 1))
    val row = InternalRow(new GenericArrayData(Array[Any](0.5f, -2.0f, 0.25f)))
    compiled(PlaneSignature(v, planes), row)
    compiled(PlaneSignature(v, planes), InternalRow(null))
    compiled(PlaneSignature(v, planes),
      InternalRow(new GenericArrayData(Array[Any](0.5f, null, 0.25f))))
  }

  test("FloorCeilExpr / DuckRoundExpr / FloatingVarchar codegen compile and match interpreted") {
    compiled(FloorCeilExpr(dbl(0), isCeil = true), InternalRow(2.0000000001))
    compiled(FloorCeilExpr(dbl(0), isCeil = false), InternalRow(-2.0000000001))
    compiled(DuckRoundExpr(dbl(0), Literal(2)), InternalRow(2.675))
    compiled(FloatingVarchar(dbl(0)), InternalRow(0.1))
    compiled(FloatingVarchar(dbl(0)), InternalRow(1e300))
  }

  test("FeMinMaxExclCur codegen compiles and matches interpreted (r15 EXCLUDE kernel)") {
    val at = ArrayType(DoubleType, containsNull = true)
    val arr = BoundReference(0, at, nullable = true)
    val cur = dbl(1)
    def row(vals: Array[Any], c: Any) = InternalRow(new GenericArrayData(vals), c)
    // min survives removal of one instance of cur
    assert(compiled(FeMinMaxExclCur(arr, cur, isMin = true),
      row(Array[Any](3.0, 1.0, 2.0), 2.0)) == 1.0)
    // cur IS the minimum: second-smallest answers
    assert(compiled(FeMinMaxExclCur(arr, cur, isMin = true),
      row(Array[Any](1.0, 3.0, 2.0), 1.0)) == 2.0)
    // duplicate minimum: removing one instance keeps the value
    assert(compiled(FeMinMaxExclCur(arr, cur, isMin = true),
      row(Array[Any](1.0, 1.0, 2.0), 1.0)) == 1.0)
    // single-element frame empties to NULL
    assert(compiled(FeMinMaxExclCur(arr, cur, isMin = true),
      row(Array[Any](5.0), 5.0)) == null)
    // NULL current value removes nothing
    assert(compiled(FeMinMaxExclCur(arr, cur, isMin = true),
      row(Array[Any](4.0, 2.0), null)) == 2.0)
    // max mirror
    assert(compiled(FeMinMaxExclCur(arr, cur, isMin = false),
      row(Array[Any](1.0, 3.0, 2.0), 3.0)) == 2.0)
    // string elements (UTF8String comparison path)
    val sat = ArrayType(StringType, containsNull = true)
    val sArr = BoundReference(0, sat, nullable = true)
    val got = compiled(FeMinMaxExclCur(sArr, str(1), isMin = true), InternalRow(
      new GenericArrayData(Array[Any](UTF8String.fromString("b"), UTF8String.fromString("a"))),
      UTF8String.fromString("a")))
    assert(got.asInstanceOf[UTF8String].toString == "b")
  }

  test("FeMinMaxExclPeers codegen compiles and matches interpreted (r15 EXCLUDE kernel)") {
    val entry = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("v", DoubleType, nullable = false)))
    val at = ArrayType(entry, containsNull = true)
    val arr = BoundReference(0, at, nullable = true)
    val key = BoundReference(1, LongType, nullable = true)
    val self = dbl(2)
    def e(k: Any, v: Double) = InternalRow(k, v)
    def row(es: Array[Any], k: Any, s: Any) = InternalRow(new GenericArrayData(es), k, s)
    // GROUP: peers (k = 2) drop, others fold
    assert(compiled(FeMinMaxExclPeers(arr, key, self, isMin = true, ties = false),
      row(Array[Any](e(1L, 5.0), e(2L, 1.0), e(3L, 4.0)), 2L, 1.0)) == 4.0)
    // all entries are peers → NULL
    assert(compiled(FeMinMaxExclPeers(arr, key, self, isMin = true, ties = false),
      row(Array[Any](e(2L, 1.0), e(2L, 3.0)), 2L, 1.0)) == null)
    // TIES: self re-enters the reduction
    assert(compiled(FeMinMaxExclPeers(arr, key, self, isMin = true, ties = true),
      row(Array[Any](e(1L, 5.0), e(2L, 1.0), e(2L, 3.0)), 2L, 1.0)) == 1.0)
    // NULL order keys are peers of a NULL current key (null-safe test)
    assert(compiled(FeMinMaxExclPeers(arr, key, self, isMin = true, ties = false),
      row(Array[Any](e(null, 1.0), e(7L, 6.0)), null, 1.0)) == 6.0)
    // max mirror with TIES and a NULL self (nothing re-enters)
    assert(compiled(FeMinMaxExclPeers(arr, key, self, isMin = false, ties = true),
      row(Array[Any](e(1L, 5.0), e(2L, 9.0)), 2L, null)) == 5.0)
  }
}
