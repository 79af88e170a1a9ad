package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Fused codegen kernels for the window-frame EXCLUDE min/max rewrite
  * (Dialect.rewriteFrameExclude, round-15 optimization).
  *
  * min/max are not subtraction-decomposable, so EXCLUDE materializes
  * the frame as a collected array — but the round-15-build spelling
  * then paid per-row INTERPRETED higher-order functions over that
  * O(frame) array:
  *
  *   - CURRENT ROW: FOUR identical `array_sort(collect_list(x) OVER
  *     spec)` window expressions (Spark plans one per textual
  *     occurrence — WindowExec evaluated the collect four times per
  *     row and sorted three of the copies), then element_at picks.
  *   - GROUP/TIES: `transform(filter(collected, p -> NOT(p.k <=> k)),
  *     q -> q.v)` — two interpreted lambda passes building two
  *     intermediate arrays per row, then array_min/array_max, for
  *     O(partition²) interpreted lambda evaluations per partition on
  *     running/unbounded frames.
  *
  * These kernels take the SAME collected frame (one window expression)
  * and reduce it in ONE fused primitive loop with no intermediate
  * arrays. Value semantics are identical by construction — comparisons
  * go through Spark's own genComp / interpreted ordering, the exact
  * primitives array_sort / array_min / array_max / `<` / `<=>` used by
  * the HOF spelling (NaN-largest, -0.0 == 0.0, null-safe key test) —
  * and are pinned against DuckDB in DialectSpec and the fuzz planes.
  */

/** min/max over `arr` (the collected EXCLUDE-free frame, nulls already
  * skipped by collect_list) with exactly ONE instance of the current
  * row's value removed — the EXCLUDE CURRENT ROW decomposition.
  *
  * Mirrors the sorted-frame spelling exactly: a NULL current value
  * removes nothing (its NULL never entered the collect); otherwise, if
  * the frame's best value beats the current value strictly it survives
  * the removal, else the second-best is the answer (duplicates keep the
  * value, a single-element frame empties to NULL).
  */
case class FeMinMaxExclCur(arr: Expression, cur: Expression, isMin: Boolean)
    extends Expression {

  override def children: Seq[Expression] = Seq(arr, cur)
  override def dataType: DataType =
    arr.dataType.asInstanceOf[ArrayType].elementType
  override def nullable: Boolean = true
  override def foldable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = arr.dataType match {
    case ArrayType(et, _)
        if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(et) &&
          org.apache.spark.sql.catalyst.types.DataTypeUtils.sameType(cur.dataType, et) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fe_mm_excl_cur expects (array<T>, T) with orderable T, got $other / ${cur.dataType}")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(dataType)

  override def eval(input: InternalRow): Any = {
    val a = arr.eval(input)
    if (a == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val n = ad.numElements()
    var b1: Any = null
    var b2: Any = null
    var i = 0
    while (i < n) {
      if (!ad.isNullAt(i)) {
        val v = ad.get(i, dataType)
        val c1 = if (b1 == null) -1 else {
          val c = ordering.compare(v, b1); if (isMin) c else -c
        }
        if (c1 < 0) { b2 = b1; b1 = v }
        else {
          val c2 = if (b2 == null) -1 else {
            val c = ordering.compare(v, b2); if (isMin) c else -c
          }
          if (c2 < 0) b2 = v
        }
      }
      i += 1
    }
    val c = cur.eval(input)
    if (c == null) b1
    else if (b1 != null && {
      val cc = ordering.compare(b1, c); if (isMin) cc < 0 else cc > 0
    }) b1
    else b2
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val arrGen = arr.genCode(ctx)
    val curGen = cur.genCode(ctx)
    val jt = CodeGenerator.javaType(dataType)
    val dv = CodeGenerator.defaultValue(dataType)
    val i = ctx.freshName("i")
    val v = ctx.freshName("v")
    val b1 = ctx.freshName("b1")
    val b2 = ctx.freshName("b2")
    val g1 = ctx.freshName("g1")
    val g2 = ctx.freshName("g2")
    val getV = CodeGenerator.getValue(arrGen.value, dataType, i)
    // genComp gives Spark's total order (NaN-largest, -0.0 == 0.0) —
    // the same primitive array_sort / `<` compiled to in the HOF form
    def better(x: String, y: String): String =
      if (isMin) s"(${ctx.genComp(dataType, x, y)} < 0)"
      else s"(${ctx.genComp(dataType, x, y)} > 0)"
    ev.copy(code = code"""
        ${arrGen.code}
        ${curGen.code}
        boolean ${ev.isNull} = true;
        $jt ${ev.value} = $dv;
        if (!${arrGen.isNull}) {
          $jt $b1 = $dv; $jt $b2 = $dv;
          boolean $g1 = false; boolean $g2 = false;
          for (int $i = 0; $i < ${arrGen.value}.numElements(); $i++) {
            if (${arrGen.value}.isNullAt($i)) continue;
            $jt $v = $getV;
            if (!$g1 || ${better(v, b1)}) {
              $b2 = $b1; $g2 = $g1; $b1 = $v; $g1 = true;
            } else if (!$g2 || ${better(v, b2)}) {
              $b2 = $v; $g2 = true;
            }
          }
          if (${curGen.isNull}) {
            if ($g1) { ${ev.value} = $b1; ${ev.isNull} = false; }
          } else if ($g1 && ${better(b1, curGen.value.toString)}) {
            ${ev.value} = $b1; ${ev.isNull} = false;
          } else if ($g2) {
            ${ev.value} = $b2; ${ev.isNull} = false;
          }
        }""")
  }

  override def prettyName: String = "fe_mm_excl_cur"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FeMinMaxExclCur =
    copy(arr = newChildren(0), cur = newChildren(1))
}

/** min/max over the collected (k, v) frame with the current row's PEER
  * GROUP removed (null-safe key test, DuckDB treats NULL order keys as
  * peers) — EXCLUDE GROUP; with `ties = true` the current row's own
  * value re-enters the reduction (EXCLUDE TIES).
  *
  * `arr` is `collect_list(CASE WHEN v IS NULL THEN NULL ELSE
  * named_struct('k', key, 'v', v) END) OVER spec` — null values never
  * enter (min/max ignore NULLs), so every entry's v is non-null.
  */
case class FeMinMaxExclPeers(arr: Expression, key: Expression,
    self: Expression, isMin: Boolean, ties: Boolean)
    extends Expression {

  override def children: Seq[Expression] = Seq(arr, key, self)
  override def nullable: Boolean = true
  override def foldable: Boolean = false

  private def entryType: StructType =
    arr.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private def keyType: DataType = entryType.fields(0).dataType
  override def dataType: DataType = entryType.fields(1).dataType

  override def checkInputDataTypes(): TypeCheckResult = arr.dataType match {
    case ArrayType(st: StructType, _) if st.fields.length == 2 &&
        org.apache.spark.sql.catalyst.types.DataTypeUtils.sameType(key.dataType, st.fields(0).dataType) &&
        org.apache.spark.sql.catalyst.types.DataTypeUtils.sameType(self.dataType, st.fields(1).dataType) &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(st.fields(0).dataType) &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(st.fields(1).dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fe_mm_excl_peers expects (array<struct<k,v>>, k, v) orderable, got $other")
  }

  @transient private lazy val keyOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(keyType)
  @transient private lazy val valOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(dataType)

  override def eval(input: InternalRow): Any = {
    val a = arr.eval(input)
    if (a == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val curKey = key.eval(input)
    val n = ad.numElements()
    var best: Any = null
    var i = 0
    while (i < n) {
      if (!ad.isNullAt(i)) {
        val st = ad.getStruct(i, 2)
        val k = if (st.isNullAt(0)) null else st.get(0, keyType)
        // null-safe peer test (`<=>`): both-null is a peer, one-null is not
        val isPeer =
          if (k == null && curKey == null) true
          else if (k == null || curKey == null) false
          else keyOrdering.compare(k, curKey) == 0
        if (!isPeer && !st.isNullAt(1)) {
          val v = st.get(1, dataType)
          if (best == null || {
            val c = valOrdering.compare(v, best); if (isMin) c < 0 else c > 0
          }) best = v
        }
      }
      i += 1
    }
    if (ties) {
      val s = self.eval(input)
      if (s != null && (best == null || {
        val c = valOrdering.compare(s, best); if (isMin) c < 0 else c > 0
      })) best = s
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val arrGen = arr.genCode(ctx)
    val keyGen = key.genCode(ctx)
    val selfGen = self.genCode(ctx)
    val kjt = CodeGenerator.javaType(keyType)
    val vjt = CodeGenerator.javaType(dataType)
    val kdv = CodeGenerator.defaultValue(keyType)
    val i = ctx.freshName("i")
    val st = ctx.freshName("st")
    val k = ctx.freshName("k")
    val kNull = ctx.freshName("kNull")
    val v = ctx.freshName("v")
    val peer = ctx.freshName("peer")
    val getStruct = CodeGenerator.getValue(arrGen.value, entryType, i)
    val getK = CodeGenerator.getValue(st, keyType, "0")
    val getV = CodeGenerator.getValue(st, dataType, "1")
    def better(x: String, y: String): String =
      if (isMin) s"(${ctx.genComp(dataType, x, y)} < 0)"
      else s"(${ctx.genComp(dataType, x, y)} > 0)"
    val tiesBlock = if (ties) s"""
          if (!${selfGen.isNull}) {
            if (${ev.isNull} || ${better(selfGen.value.toString, ev.value.toString)}) {
              ${ev.value} = ${selfGen.value}; ${ev.isNull} = false;
            }
          }""" else ""
    ev.copy(code = code"""
        ${arrGen.code}
        ${keyGen.code}
        ${selfGen.code}
        boolean ${ev.isNull} = true;
        $vjt ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!${arrGen.isNull}) {
          for (int $i = 0; $i < ${arrGen.value}.numElements(); $i++) {
            if (${arrGen.value}.isNullAt($i)) continue;
            InternalRow $st = $getStruct;
            boolean $kNull = $st.isNullAt(0);
            $kjt $k = $kNull ? $kdv : $getK;
            boolean $peer;
            if ($kNull && ${keyGen.isNull}) { $peer = true; }
            else if ($kNull || ${keyGen.isNull}) { $peer = false; }
            else { $peer = (${ctx.genComp(keyType, k, keyGen.value.toString)} == 0); }
            if ($peer || $st.isNullAt(1)) continue;
            $vjt $v = $getV;
            if (${ev.isNull} || ${better(v, ev.value.toString)}) {
              ${ev.value} = $v; ${ev.isNull} = false;
            }
          }$tiesBlock
        }""")
  }

  override def prettyName: String = "fe_mm_excl_peers"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FeMinMaxExclPeers =
    copy(arr = newChildren(0), key = newChildren(1), self = newChildren(2))
}
