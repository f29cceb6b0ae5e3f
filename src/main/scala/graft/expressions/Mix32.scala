package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** The 32-bit avalanche of the portable rolling hash (two
  * xorshift-multiply rounds, degski's multiplier) as a NATIVE
  * expression — bit-identical to the SQL formula every oracle
  * replays:
  *
  *   xm(h) = ((h XOR (h >> 16)) * 73244475) % 4294967296
  *   mix32(h) = let m = xm(xm(h)) in m XOR (m >> 16)
  *
  * Why native when the Column composition exists: the composed tree
  * references its input EIGHT times (each xor reads h twice, two
  * rounds square it, the final xor doubles it again). Whole-stage
  * codegen's subexpression elimination hides that in projections —
  * but FilterExec splits conjunctive predicates and evaluates each
  * conjunct separately, and optimizer pushdown substitutes the tree
  * per use site, so a bloom-probe FILTER re-ran the underlying
  * rolling hash tens of times per row (measured ~7× on the q315
  * gate). One native node = one evaluation anywhere it appears, and
  * the arithmetic is three lines of exact long math (all operands
  * non-negative by the rolling-hash contract; Java's %/>> match
  * Spark SQL's pmod-free `%` and arithmetic shiftright for every
  * input, so semantics are unchanged even off-contract).
  */
case class Mix32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix32 requires a bigint argument, got ${child.dataType.catalogString}")

  @inline private def xm(h: Long): Long =
    ((h ^ (h >> 16)) * 73244475L) % 4294967296L

  override def nullSafeEval(input: Any): Any = {
    val m = xm(xm(input.asInstanceOf[Long]))
    m ^ (m >> 16)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val a = ctx.freshName("mixA")
      val b = ctx.freshName("mixB")
      s"""
         |long $a = (($h ^ ($h >> 16)) * 73244475L) % 4294967296L;
         |long $b = (($a ^ ($a >> 16)) * 73244475L) % 4294967296L;
         |${ev.value} = $b ^ ($b >> 16);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Mix32 =
    copy(child = newChild)
}
