package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Asymmetric-distance lookup sum for product quantization: given a
  * row's `codes` (array<int>, one code per subspace) and a query's
  * `lut` (array<array<double>>, per-subspace sub-products), returns
  * Σ_j lut[j][codes[j]] — the approximate dot product.
  *
  * Semantically equals the built-ins form
  * `aggregate(zip_with(codes, lut, (c, l) => element_at(l, c + 1)),
  * 0.0, (acc, v) => acc + v)`, which executes interpreted
  * (ArrayAggregate is CodegenFallback) and boxes every lookup; this is
  * one primitive loop per row. The candidate side of an ADC scan
  * evaluates this once per (candidate, query) pair — the hot loop of
  * PQ search.
  *
  * NULL on malformed input (length mismatch or out-of-range code), so
  * a wrong model/encoding pairing surfaces as nulls, never as a
  * silently wrong score.
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "adc_score requires (array<int> codes, array<array<double>> lut), got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m != lut.numElements()) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      val row = lut.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements()) return null
      acc += row.getDouble(c)
      j += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcScore = copy(left = newLeft, right = newRight)
}
