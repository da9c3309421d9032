package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column — the canonical-composition pass every text-dedup pipeline
  * needs BEFORE hashing (the same visible text arrives from the web in
  * composed and decomposed forms; un-normalized, `café` ≠ `café` and
  * every downstream fingerprint/shingle/minhash silently treats them as
  * different documents).
  *
  * Spark ships no normalization builtin, and a Scala UDF here would box
  * every row and break whole-stage codegen in exactly the scan-heavy
  * stage where normalization runs. This expression stays inside the
  * codegen'd pipeline: the generated code is a single static call to
  * `java.text.Normalizer` (ICU-free, JDK-built-in, stable across JVMs),
  * with the fast path that `Normalizer.isNormalized` short-circuits
  * already-NFC input (the overwhelming majority of real text) without
  * allocating a new string.
  */
object UnicodeNormalize {
  /** Static helper the generated code calls: skip allocation when the
    * input is already NFC (true for ~all real-world text). */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}
