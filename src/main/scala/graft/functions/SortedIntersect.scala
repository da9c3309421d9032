package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for SORTED `ARRAY<BIGINT>` set
  * intersection — the per-edge kernel of the graph suite's shared
  * triangle pass.
  *
  * Why not the builtin `array_intersect` (VERDICT r13 #2): for every
  * row, `ArrayIntersect` builds an `OpenHashSet` over the left array,
  * probes every right element against it, and (for the counting case)
  * materializes the intersection array only for `size()` to throw it
  * away. The adjacency arrays this engine feeds it ([[graft.ops.Graph]]
  * `adjFullCached`) are already `sort_array(collect_set(...))` —
  * ascending, distinct, null-free — so a two-pointer merge scan gets
  * the same answer with zero allocation (count form) or one primitive
  * array (array form), and both fuse into whole-stage codegen as a
  * plain `long[]`-style loop over the `ArrayData` accessors. On the
  * co-purchase graph the support pass runs one intersection per edge:
  * at 100 TB that is the dominant compute of the whole graph family,
  * which is exactly where a per-row hash-set build hurts most.
  *
  * Contract (both forms): inputs must be sorted ascending. Duplicate
  * values are counted/emitted once (set semantics — matches
  * `array_intersect`). Null ELEMENTS sort first under Spark's
  * `sort_array(asc)` and are skipped (`array_intersect` would match
  * null∩null; the graph adjacency arrays are collect_set output and
  * cannot contain null, so the cheaper skip is safe and documented).
  * A null ARRAY yields null (BinaryExpression default). Unsorted input
  * is a contract violation: the merge scan then undercounts, exactly
  * like feeding an unsorted array to any merge-join. Spec:
  * SortedIntersectSpec cross-checks both forms against
  * `array_intersect` on randomized sorted arrays.
  *
  * These are PUBLIC SQL functions (ADVICE r14), so the contract is
  * enforced, not just documented: when the input ArrayType admits null
  * elements (`containsNull`), both eval paths guard every read and
  * throw a descriptive IllegalArgumentException on a null AFTER a
  * non-null element (which `sort_array(asc)` can never produce — it is
  * proof of unsorted or hand-built input) instead of silently reading
  * the null slot's garbage. When `containsNull = false` — the graph
  * chain's collect_set-derived arrays — the guards (and the
  * leading-null skip) are statically elided, so the hot path pays
  * nothing. The ExpressionInfo usage string carries the same contract
  * for `DESCRIBE FUNCTION` readers.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    SortedIntersect.checkLongArrays("sorted_intersect_count", left, right)

  override def dataType: DataType = LongType

  private lazy val guardL = SortedIntersect.nullsPossible(left)
  private lazy val guardR = SortedIntersect.nullsPossible(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements(); val n2 = y.numElements()
    var i = 0; var j = 0; var c = 0L
    if (guardL) while (i < n1 && x.isNullAt(i)) i += 1
    if (guardR) while (j < n2 && y.isNullAt(j)) j += 1
    while (i < n1 && j < n2) {
      if (guardL && x.isNullAt(i)) SortedIntersect.badNull(prettyName)
      if (guardR && y.isNullAt(j)) SortedIntersect.badNull(prettyName)
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        c += 1
        while (i < n1 && !(guardL && x.isNullAt(i)) && x.getLong(i) == xv) i += 1
        while (j < n2 && !(guardR && y.isNullAt(j)) && y.getLong(j) == xv) j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val c = ctx.freshName("c")
      val g = SortedIntersect.CodegenGuards(prettyName, guardL, guardR, a, b, i, j, n1, n2)
      s"""
        |int $n1 = $a.numElements(); int $n2 = $b.numElements();
        |int $i = 0; int $j = 0;
        |${g.skipLeading}
        |long $c = 0L;
        |while ($i < $n1 && $j < $n2) {
        |  ${g.interiorThrow}
        |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
        |  if ($xv < $yv) $i++;
        |  else if ($xv > $yv) $j++;
        |  else {
        |    $c++;
        |    while ($i < $n1 && ${g.advL}$a.getLong($i) == $xv) $i++;
        |    while ($j < $n2 && ${g.advR}$b.getLong($j) == $xv) $j++;
        |  }
        |}
        |${ev.value} = $c;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

/** Array form of [[SortedIntersectCount]]: the ascending distinct
  * intersection itself, as one `UnsafeArrayData` over a primitive
  * buffer — for the sites that `explode` the common neighbors (the
  * k-truss decremental witness expansion). Same sorted-input contract;
  * output ordering is ascending (the builtin preserves LEFT order, but
  * on sorted left input those coincide). */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    SortedIntersect.checkLongArrays("sorted_intersect", left, right)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val guardL = SortedIntersect.nullsPossible(left)
  private lazy val guardR = SortedIntersect.nullsPossible(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements(); val n2 = y.numElements()
    var i = 0; var j = 0; var k = 0
    if (guardL) while (i < n1 && x.isNullAt(i)) i += 1
    if (guardR) while (j < n2 && y.isNullAt(j)) j += 1
    val buf = new Array[Long](math.min(n1 - i, n2 - j).max(0))
    while (i < n1 && j < n2) {
      if (guardL && x.isNullAt(i)) SortedIntersect.badNull(prettyName)
      if (guardR && y.isNullAt(j)) SortedIntersect.badNull(prettyName)
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        buf(k) = xv; k += 1
        while (i < n1 && !(guardL && x.isNullAt(i)) && x.getLong(i) == xv) i += 1
        while (j < n2 && !(guardR && y.isNullAt(j)) && y.getLong(j) == xv) j += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(buf, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val buf = ctx.freshName("buf")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val cap = ctx.freshName("cap")
      val g = SortedIntersect.CodegenGuards(prettyName, guardL, guardR, a, b, i, j, n1, n2)
      s"""
        |int $n1 = $a.numElements(); int $n2 = $b.numElements();
        |int $i = 0; int $j = 0; int $k = 0;
        |${g.skipLeading}
        |int $cap = java.lang.Math.max(java.lang.Math.min($n1 - $i, $n2 - $j), 0);
        |long[] $buf = new long[$cap];
        |while ($i < $n1 && $j < $n2) {
        |  ${g.interiorThrow}
        |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
        |  if ($xv < $yv) $i++;
        |  else if ($xv > $yv) $j++;
        |  else {
        |    $buf[$k++] = $xv;
        |    while ($i < $n1 && ${g.advL}$a.getLong($i) == $xv) $i++;
        |    while ($j < $n2 && ${g.advR}$b.getLong($j) == $xv) $j++;
        |  }
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $k));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect"
}

object SortedIntersect {
  /** Whether the input's ArrayType admits null elements — guards are
    * generated only then; collect_set-derived arrays (containsNull =
    * false) keep the unguarded hot loop. A non-array type (pre-
    * type-check construction) conservatively reads as guarded. */
  private[functions] def nullsPossible(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  /** SQL-visible contract, shared by both ExpressionInfo usage strings
    * and the thrown violation message. */
  private[functions] val contract: String =
    "inputs must be sorted ascending with nulls (if any) leading, as " +
      "produced by sort_array(x); null elements past the leading run " +
      "raise an error, unsorted input undercounts like any merge join"

  private[functions] def badNull(name: String): Nothing =
    throw new IllegalArgumentException(
      s"$name: null element after a non-null element — $contract")

  /** Conditionally-emitted guard fragments for the codegen path: empty
    * strings when the input type proves nulls impossible, so the
    * generated loop is byte-identical to the unguarded r14 form. */
  private[functions] case class CodegenGuards(
      name: String, guardL: Boolean, guardR: Boolean,
      a: String, b: String, i: String, j: String, n1: String, n2: String) {
    // ASCII-only: this string lands inside janino-compiled Java source
    private val msg =
      s"$name: null element after a non-null element - $contract"
        .replace("\"", "\\\"")
    val skipLeading: String =
      (if (guardL) s"while ($i < $n1 && $a.isNullAt($i)) $i++;\n" else "") +
        (if (guardR) s"while ($j < $n2 && $b.isNullAt($j)) $j++;" else "")
    val interiorThrow: String =
      (if (guardL) s"""if ($a.isNullAt($i)) throw new IllegalArgumentException("$msg");\n""" else "") +
        (if (guardR) s"""if ($b.isNullAt($j)) throw new IllegalArgumentException("$msg");""" else "")
    val advL: String = if (guardL) s"!$a.isNullAt($i) && " else ""
    val advR: String = if (guardR) s"!$b.isNullAt($j) && " else ""
  }

  private[functions] def checkLongArrays(
      name: String, left: Expression, right: Expression): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects (ARRAY<BIGINT>, ARRAY<BIGINT>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
}
