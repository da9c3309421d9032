package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two `ARRAY<FLOAT>`
  * embedding vectors, accumulated in double.
  *
  * Why a custom expression instead of a UDF (SURVEY.md §7.4): a Scala UDF
  * boxes both arrays per row and breaks whole-stage codegen; this expression
  * generates a primitive-typed loop inline inside the stage, so a 100 TB
  * brute-force scan stays in one codegen'd pipeline. Why not compose
  * `zip_with`/`aggregate` built-ins: that allocates an intermediate array
  * per row and traverses three times; the fused loop traverses once.
  *
  * Semantics (pinned for oracle parity with DuckDB `list_cosine_similarity`
  * up to float-vs-double accumulation, see Similarity scaladoc):
  *  - null array → null result (BinaryExpression default);
  *  - null *elements* count as 0.0;
  *  - mismatched lengths: the shorter length is used;
  *  - zero-norm input → null (SQL-style undefined, not NaN).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (ARRAY<FLOAT>, ARRAY<FLOAT>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  // zero-norm inputs produce null even when both arrays are non-null
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv: Double = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      val yv: Double = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val dot = ctx.freshName("dot")
    val nx = ctx.freshName("nx")
    val ny = ctx.freshName("ny")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val xv = ctx.freshName("xv")
    val yv = ctx.freshName("yv")
    val code =
      code"""
        |${leftGen.code}
        |${rightGen.code}
        |boolean ${ev.isNull} = true;
        |double ${ev.value} = 0.0;
        |if (!${leftGen.isNull} && !${rightGen.isNull}) {
        |  int $n = java.lang.Math.min(
        |    ${leftGen.value}.numElements(), ${rightGen.value}.numElements());
        |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    double $xv = ${leftGen.value}.isNullAt($i)
        |      ? 0.0 : (double) ${leftGen.value}.getFloat($i);
        |    double $yv = ${rightGen.value}.isNullAt($i)
        |      ? 0.0 : (double) ${rightGen.value}.getFloat($i);
        |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
        |  }
        |  if ($nx != 0.0 && $ny != 0.0) {
        |    ${ev.isNull} = false;
        |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        |  }
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}
