package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native Catalyst expression: decode a Spark bitmap (the BINARY value
  * produced by the builtin `bitmap_construct_agg` / `bitmap_or_agg`
  * aggregates) back into the sorted array of its set bit positions.
  *
  * Spark ships the ENCODE direction (`bitmap_bit_position` →
  * `bitmap_construct_agg`) and a popcount (`bitmap_count`) but no
  * decoder, which makes its bitmaps write-only for any algorithm that
  * needs the members back — exactly the shape of a distributed BFS
  * round: the frontier expansion dedups into per-source bitmaps with a
  * MAP-SIDE-COMBINED `bitmap_or_agg` (the shuffle carries one 4 KB
  * buffer per group instead of every pre-distinct expansion row), and
  * the next round needs those deduped members as rows again. This
  * expression closes the loop; `explode(bitmap_positions(bmp))` is the
  * row form. ClickHouse (`bitmapToArray`) and DuckDB ship the same
  * primitive for the same reason.
  *
  * Bit layout matches the builtin aggregates (`bytes[pos >> 3] |=
  * 1 << (pos & 7)`, LSB-first within a byte) — round-trip is
  * spec-asserted against `bitmap_construct_agg`, not assumed. Codegen'd
  * via a static helper call, so it stays inside whole-stage codegen.
  */
object BitmapPositions {
  /** Static helper the generated code calls. */
  def positions(bytes: Array[Byte]): ArrayData = {
    var n = 0
    var i = 0
    while (i < bytes.length) {
      n += java.lang.Integer.bitCount(bytes(i) & 0xff)
      i += 1
    }
    val out = new Array[Long](n)
    var k = 0
    i = 0
    while (i < bytes.length) {
      var b = bytes(i) & 0xff
      while (b != 0) {
        val bit = java.lang.Integer.numberOfTrailingZeros(b)
        out(k) = (i.toLong << 3) + bit
        k += 1
        b &= b - 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class BitmapPositions(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_positions expects BINARY, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BitmapPositions.positions(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BitmapPositions.positions($c)")

  override protected def withNewChildInternal(newChild: Expression): BitmapPositions =
    copy(child = newChild)

  override def prettyName: String = "bitmap_positions"
}
