package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native expression: sign-random-projection LSH bucket ids for an
  * `ARRAY<FLOAT>` embedding, one bucket per hash table.
  *
  * `signs(p)(i)` is the ±1 component of hyperplane `p` at dimension `i`;
  * planes are grouped as `nTables` tables of `nPlanes` planes. Bucket bit
  * `b` of table `t` is the sign of the dot product with plane
  * `t*nPlanes + b`.
  *
  * Why a custom expression: inlining 32 planes × 64 dims as a
  * `element_at * lit ± ...` tree generates >64 KB of Janino bytecode per
  * method — whole-stage codegen aborts ("Code grows beyond 64 KB") and
  * the whole stage drops to interpreted mode. A loop over a referenced
  * constant matrix is a few hundred bytes of bytecode and stays fused in
  * the stage. (Observed: the expression-tree version knocked every LSH
  * stage out of codegen at sf0.01.)
  */
case class SignRandomProjection(
    child: Expression,
    signs: Array[Array[Byte]],
    nTables: Int,
    nPlanes: Int)
    extends UnaryExpression {

  require(signs.length == nTables * nPlanes,
    s"need ${nTables * nPlanes} planes, got ${signs.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_projection expects ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0
      var b = 0
      while (b < nPlanes) {
        val plane = signs(t * nPlanes + b)
        val dim = math.min(n, plane.length)
        var dot = 0.0
        var i = 0
        while (i < dim) {
          if (!v.isNullAt(i)) dot += v.getFloat(i) * plane(i)
          i += 1
        }
        if (dot > 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "byte[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val plane = ctx.freshName("plane")
      val bucket = ctx.freshName("bucket")
      val dim = ctx.freshName("dim")
      s"""
        |int[] $out = new int[$nTables];
        |for (int $t = 0; $t < $nTables; $t++) {
        |  int $bucket = 0;
        |  for (int $b = 0; $b < $nPlanes; $b++) {
        |    byte[] $plane = $signsRef[$t * $nPlanes + $b];
        |    int $dim = java.lang.Math.min($v.numElements(), $plane.length);
        |    double $dot = 0.0;
        |    for (int $i = 0; $i < $dim; $i++) {
        |      if (!$v.isNullAt($i)) $dot += $v.getFloat($i) * $plane[$i];
        |    }
        |    if ($dot > 0) $bucket |= (1 << $b);
        |  }
        |  $out[$t] = $bucket;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignRandomProjection =
    copy(child = newChild)

  override def prettyName: String = "sign_projection"
}
