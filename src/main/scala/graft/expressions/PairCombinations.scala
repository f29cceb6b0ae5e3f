package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Generator emitting all unordered pair combinations (i < j) of an
  * array-of-struct column: input `array<struct<f1, f2, ...>>`, output
  * one row per pair with schema `(f1_a, f2_a, ..., f1_b, f2_b, ...)`.
  *
  * Purpose-built for inverted-index candidate generation (near-dup
  * posting lists): the built-ins-only formulation
  * `explode(flatten(transform(seq, i => transform(seq, j => ...))))`
  * allocates nested arrays per row and re-evaluates lambda bodies per
  * (i, j) in interpreted mode. This walks the unsafe array once and
  * emits d(d−1)/2 rows directly. Input order is preserved, so a sorted
  * input yields pairs with a-fields < b-fields.
  */
case class PairCombinations(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  private lazy val structType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def elementSchema: StructType = StructType(
    structType.fields.map(f => f.copy(name = f.name + "_a")) ++
      structType.fields.map(f => f.copy(name = f.name + "_b")))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StructType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_combinations requires array<struct<...>>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val n = arr.numElements()
    if (n < 2) return Nil
    val width = structType.length
    val fields = structType.fields
    // materialize field values once
    val vals = Array.tabulate(n) { i =>
      val s = arr.getStruct(i, width)
      Array.tabulate(width)(j => s.get(j, fields(j).dataType))
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](n * (n - 1) / 2)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val row = new Array[Any](2 * width)
        System.arraycopy(vals(i), 0, row, 0, width)
        System.arraycopy(vals(j), 0, row, width, width)
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(row)
        j += 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombinations =
    copy(child = newChild)
}
