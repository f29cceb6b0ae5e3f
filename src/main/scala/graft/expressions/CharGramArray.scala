package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character q-grams of a string column, as a native expression: one
  * pass over the string per row. `distinct = true` (the default)
  * yields the distinct gram SET in first-occurrence order — the form
  * Ed-Join-style edit-distance prefix filtering needs ([[graft.core
  * .Dedup.editNearDupPairs]]); `distinct = false` keeps every window
  * position (gram multiset, for count-filter style bounds).
  *
  * The word-shingle sibling is [[ShingleArray]]; this one windows over
  * CODEPOINTS (`substring` on UTF8String semantics), so its gram count
  * for an ASCII string of length L is max(L − q + 1, 0) — the quantity
  * the edit-distance destruction bound (each edit perturbs at most q
  * gram occurrences) is stated over. Strings shorter than q yield an
  * empty array (the caller's short-string fallback path).
  *
  * Semantically equals the built-ins-only HOF
  * `transform(sequence(1, greatest(length(s)-q+1, 0)), i -> substring(s, i, q))`
  * (+ array_distinct), which re-evaluates substring per lambda step in
  * interpreted mode; this walks the string once and the downstream
  * explode/aggregate stages stay codegen'd.
  */
case class CharGramArray(child: Expression, q: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  require(q >= 1, "gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_grams requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.codePointCount(0, s.length)
    if (n < q) return new GenericArrayData(Array.empty[Any])
    // walk codepoint offsets once so surrogate pairs window correctly
    val offs = new Array[Int](n + 1)
    var i = 0
    var o = 0
    while (i < n) { offs(i) = o; o = s.offsetByCodePoints(o, 1); i += 1 }
    offs(n) = s.length
    if (distinct) {
      val seen = mutable.LinkedHashSet.empty[String]
      var p = 0
      while (p + q <= n) { seen.add(s.substring(offs(p), offs(p + q))); p += 1 }
      new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
    } else {
      val out = new Array[Any](n - q + 1)
      var p = 0
      while (p + q <= n) {
        out(p) = UTF8String.fromString(s.substring(offs(p), offs(p + q)))
        p += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramArray =
    copy(child = newChild)
}
