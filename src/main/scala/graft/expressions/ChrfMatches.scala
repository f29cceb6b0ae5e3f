package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-order CLIPPED character n-gram matches of two strings — the
  * integer core of chrF (Popović, WMT 2015): element n−1 of the
  * result is m_n = Σ_g min(count_left(g), count_right(g)) over char
  * n-grams for n ∈ 1..maxN. Everything else in chrF (per-order
  * P_n = m_n/c_n, R_n = m_n/r_n, the order average, F_β) is a ratio
  * of these counts and the code-point lengths, so once m_n is exact
  * the whole metric micro-quantizes losslessly (the LcsLength /
  * rougeN rationale).
  *
  * A native expression instead of the relational formulation for the
  * PLAN, not the arithmetic: exploding char n-grams shuffles
  * maxN × corpus-characters rows through two grouped counts and a
  * join (measured 12.8 s at sf0.1), where the match count is a pure
  * function of the ROW — here it is one hash-count pass per order
  * (O(maxN · chars) time, per-row-bounded state), and chrF becomes a
  * shuffle-free scalar projection that distributes like any map.
  *
  * Code-point semantics: grams are windows over Unicode CODE POINTS
  * (what Spark's `length`/`substr` and DuckDB's `substr` count), so
  * the SQL oracle replays bit-for-bit. Null if either side is null
  * (BinaryExpression default).
  */
case class ChrfMatches(left: Expression, right: Expression, maxN: Int)
    extends BinaryExpression with CodegenFallback {
  require(maxN >= 1 && maxN <= 16, "maxN must be in [1, 16]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"chrf_matches requires string arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString.codePoints().toArray
    val b = r.asInstanceOf[UTF8String].toString.codePoints().toArray
    val out = new Array[Long](maxN)
    var n = 1
    while (n <= maxN) {
      if (a.length >= n && b.length >= n) {
        val counts = new java.util.HashMap[String, Integer]()
        var j = 0
        while (j + n <= b.length) {
          counts.merge(new String(b, j, n), Integer.valueOf(1),
            (x, y) => Integer.valueOf(x + y))
          j += 1
        }
        var m = 0L
        var i = 0
        while (i + n <= a.length) {
          val k = new String(a, i, n)
          val c = counts.get(k)
          if (c != null && c > 0) {
            m += 1L
            counts.put(k, Integer.valueOf(c - 1))
          }
          i += 1
        }
        out(n - 1) = m
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ChrfMatches =
    copy(left = newLeft, right = newRight)
}
