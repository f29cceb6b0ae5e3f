package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable polynomial
  * rolling hash: fold over the string's codepoints of
  * `acc = (acc * 31 + cp) mod 1e9+7`.
  *
  * Semantically identical to the higher-order-function formulation
  * `aggregate(transform(split(s, ""), ascii), 0L, (a,c) => (a*31+c)%P)`
  * — but that plan shape is interpreted (`ArrayAggregate` is
  * CodegenFallback) and allocates a per-char string array per row.
  * This expression participates in whole-stage codegen and walks the
  * string once with zero allocation, which matters because the hash
  * sits in the hot path of four text operators (fingerprint, simhash,
  * chunk features, token stats).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val P = 1000000007L

  /** Codepoint-wise fold — matches `ascii()` per split("") char for
    * all BMP and astral codepoints (and any external oracle doing
    * unicode-char iteration).
    */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}
