package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of two numeric-array columns, accumulated in
  * double precision with a sequential left fold — bit-identical to
  * `aggregate(zip_with(a, b, (x,y) => x.cast(double)*y.cast(double)),
  * 0.0, (acc,v) => acc+v)` and to any external engine doing the same
  * sequential fold.
  *
  * The HOF formulation is interpreted (CodegenFallback `ArrayAggregate`)
  * and walks boxed lambda evaluations per element; in pairwise
  * similarity scans (n^2 pairs x dim elements) it dominated runtime by
  * >20x. One eval per row here is a primitive loop over the unsafe
  * array data.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<float|double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Mismatched lengths yield NULL, matching the zip_with oracle above
  // (zip_with pads the shorter array with nulls, and the padded
  // product poisons the aggregate to NULL) — never a silently
  // truncated partial dot product.
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}
