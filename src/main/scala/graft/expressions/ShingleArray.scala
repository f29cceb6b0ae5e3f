package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text column, as a native expression:
  * ONE tokenization pass per row. `distinct = true` (the default)
  * yields the distinct shingle set (first-occurrence order);
  * `distinct = false` yields ALL window positions in order, duplicates
  * kept (the form repetition statistics need).
  *
  * Semantically equals the built-ins-only form
  * `[array_distinct(]transform(sequence(0, greatest(size(toks)-n, 0)),
  *   i => concat_ws(" ", slice(toks, i+1, n)))[)]` with
  * `toks = split(trim(text), "\s+")` — but that expression tree
  * re-evaluates the split inside every lambda iteration (tokens x
  * positions work per row; measured as ~95% of the near-dup pipeline's
  * runtime). Interpreted eval here is fine: it runs once per row and
  * the downstream explode/aggregate stages stay codegen'd.
  */
case class ShingleArray(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim
      .split("\\s+", -1)
    val last = math.max(toks.length - n, 0)
    if (distinct) {
      val seen = mutable.LinkedHashSet.empty[String]
      var i = 0
      while (i <= last) {
        val end = math.min(i + n, toks.length)
        seen.add(toks.slice(i, end).mkString(" "))
        i += 1
      }
      new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
    } else {
      val out = new Array[Any](last + 1)
      var i = 0
      while (i <= last) {
        val end = math.min(i + n, toks.length)
        out(i) = UTF8String.fromString(toks.slice(i, end).mkString(" "))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}
