package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native Catalyst expression: byte-wise `a AND NOT b` over two Spark
  * bitmaps (the BINARY values of `bitmap_construct_agg`/`bitmap_or_agg`)
  * — set difference in bitmap space.
  *
  * This is the BFS frontier step (`newly-reached = reached-this-round
  * AND NOT visited`) without ever leaving bitmap space: together with
  * [[BitmapPositions]] it lets an iterative traversal keep its whole
  * per-round state as O(sources × buckets) 4 KB buffers instead of
  * row-level (source, vertex) frames joined with left-anti shuffles.
  * ClickHouse ships the same primitive as `bitmapAndnot`.
  *
  * Inputs of unequal length are handled positionally (bytes past the
  * shorter input: kept from `a`, treated as unset in `b`), so an empty
  * or truncated accumulator behaves as the empty set.
  */
object BitmapAndNot {
  /** Static helper the generated code calls. */
  def andNot(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](a.length)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) { out(i) = (a(i) & ~b(i)).toByte; i += 1 }
    while (i < a.length) { out(i) = a(i); i += 1 }
    out
  }
}

case class BitmapAndNot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_and_not expects (BINARY, BINARY), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapAndNot.andNot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BitmapAndNot.andNot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndNot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bitmap_and_not"
}
