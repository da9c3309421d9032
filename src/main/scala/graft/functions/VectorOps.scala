package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused dot product of two `ARRAY<FLOAT>` vectors, accumulated in double
  * with exactly the accumulation order of [[CosineSimilarity]]'s `dot`
  * term (ascending index, null elements as 0.0, shorter length wins).
  *
  * Exists so all-pairs similarity can hoist the norm work out of the
  * O(n²) loop: `cosine = dot(a,b) / (l2norm(a) * l2norm(b))` is
  * bit-identical to `cosine_sim(a,b)` — the denominators are the same
  * two doubles multiplied in the same order — but each pair now runs ONE
  * 1-mult-per-element loop instead of three accumulators plus two
  * sqrts. On a 12.5M-pair verifier that's the hot loop, and at 100 TB
  * the norms column rides the (tiny) per-row side of the join, never
  * the pair space. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (ARRAY<FLOAT>, ARRAY<FLOAT>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xv: Double = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      val yv: Double = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
      dot += xv * yv
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        |int $n = java.lang.Math.min($xa.numElements(), $ya.numElements());
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $xv = $xa.isNullAt($i) ? 0.0 : (double) $xa.getFloat($i);
        |  double $yv = $ya.isNullAt($i) ? 0.0 : (double) $ya.getFloat($i);
        |  $dot += $xv * $yv;
        |}
        |${ev.value} = $dot;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** L2 norm of an `ARRAY<FLOAT>` vector: `sqrt(Σ x_i²)` accumulated in
  * double, ascending index, null elements as 0.0 — the exact value
  * [[CosineSimilarity]] computes internally as `sqrt(nx)`. Zero-norm
  * input → null, so `dot / (l2norm(a) * l2norm(b))` inherits the
  * SQL-style undefined-cosine contract via null propagation. */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2norm expects ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var nx = 0.0
    var i = 0
    while (i < n) {
      val xv: Double = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      nx += xv * xv
      i += 1
    }
    if (nx == 0.0) null else math.sqrt(nx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val nx = ctx.freshName("nx")
    val xv = ctx.freshName("xv")
    val code =
      code"""
        |${childGen.code}
        |boolean ${ev.isNull} = true;
        |double ${ev.value} = 0.0;
        |if (!${childGen.isNull}) {
        |  int $n = ${childGen.value}.numElements();
        |  double $nx = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    double $xv = ${childGen.value}.isNullAt($i)
        |      ? 0.0 : (double) ${childGen.value}.getFloat($i);
        |    $nx += $xv * $xv;
        |  }
        |  if ($nx != 0.0) {
        |    ${ev.isNull} = false;
        |    ${ev.value} = java.lang.Math.sqrt($nx);
        |  }
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)

  override def prettyName: String = "l2norm"
}
