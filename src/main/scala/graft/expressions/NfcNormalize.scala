package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization —
  * canonical composition, the text-hygiene step every multi-source
  * corpus ingest needs (the same logical text arrives precomposed
  * from one crawler and decomposed from another; without
  * normalization, exact dedup, shingle hashes, equality joins and
  * tokenizers all silently treat them as different documents).
  *
  * Spark has no built-in normalizer, so this wraps the JDK's
  * `java.text.Normalizer` (Unicode-standard canonical composition,
  * the same algorithm DuckDB's `nfc_normalize` implements — which is
  * what lets the gate oracle the transform exactly). A UnaryExpression
  * with `doGenCode`, so it rides whole-stage codegen like any
  * built-in string function; already-NFC strings short-circuit in
  * `Normalizer.isNormalized` without allocating.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** NFC-normalize a UTF8String; returns the input object untouched
    * when already normalized (the overwhelmingly common case for
    * clean corpora — no copy, no re-encode).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
