package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: JARO–WINKLER SIMILARITY — the
  * entity-resolution scorer (record linkage's default since the Census
  * Bureau work it's named for) that [[graft.dedup.Dedup.fuzzyNames]]'s
  * levenshtein cutoff can't replace: edit distance counts operations,
  * Jaro–Winkler rewards shared prefixes and tolerates transpositions,
  * which is what name/title variants actually look like.
  *
  * Spark ships no Jaro–Winkler builtin (only levenshtein/soundex), and
  * a Scala UDF would box every row and break whole-stage codegen in the
  * pair-scoring stage where this runs — so it's a native expression
  * whose generated code is one static call, staying inside the fused
  * pipeline (the [[UnicodeNormalize]] pattern).
  *
  * Semantics are pinned to the textbook constants DuckDB's builtin
  * also uses (verified against `jaro_winkler_similarity` on the
  * classic Winkler pairs + edge cases): match window
  * max(⌊max(|a|,|b|)/2⌋−1, 0), transpositions counted over the matched
  * subsequences, boost l·0.1·(1−jaro) with l = common prefix ≤ 4
  * applied only when jaro > 0.7, and 0.0 when EITHER side is empty
  * (including both — DuckDB's convention, not 1.0). Comparison is
  * per-BYTE (exact for ASCII domains like the part dictionary;
  * multi-byte code points compare as byte runs, the same convention
  * DuckDB applies).
  */
object JaroWinkler {
  /** Static helper the generated code calls. */
  def jw(a: UTF8String, b: UTF8String): Double = {
    val la = a.numBytes
    val lb = b.numBytes
    if (la == 0 || lb == 0) return 0.0
    if (a.equals(b)) return 1.0
    val win = math.max(math.max(la, lb) / 2 - 1, 0)
    val amatch = new Array[Boolean](la)
    val bmatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - win)
      val hi = math.min(lb - 1, i + win)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bmatch(j) && a.getByte(i) == b.getByte(j)) {
          amatch(i) = true; bmatch(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: positions where the k-th matched byte differs
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (amatch(i)) {
        while (!bmatch(j)) j += 1
        if (a.getByte(i) != b.getByte(j)) t += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lmax = math.min(4, math.min(la, lb))
    while (l < lmax && a.getByte(l) == b.getByte(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (STRING, STRING), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinkler.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}
