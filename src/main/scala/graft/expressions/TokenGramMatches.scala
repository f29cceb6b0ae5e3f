package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-order CLIPPED token n-gram matches of two token arrays — the
  * integer core shared by ROUGE-N's numerator and BLEU's modified
  * precisions (Papineni et al. 2002; Lin 2004): element n−fromN of the
  * result is m_n = Σ_g min(count_left(g), count_right(g)) over token
  * n-grams for n ∈ fromN..toN.
  *
  * The [[ChrfMatches]] rationale, applied to token grams: both texts
  * of a (candidate, reference) pair live in the SAME row, so the match
  * count is a pure row function — yet the relational formulation
  * explodes toN × corpus-token gram rows through grouped counts and a
  * (pair, n, gram) join (q308 measured 3.6–5.2 s at sf0.1, two
  * exchanges). Here it is one hash-count pass per order (O(orders ·
  * tokens) time, per-row-bounded state) and the metric becomes a
  * shuffle-free scalar projection.
  *
  * Gram identity replays the relational SQL exactly: a gram is the
  * window's tokens joined by one space with NULL elements skipped
  * (`concat_ws(' ', slice(toks, s+1, n))`), and a side has grams at
  * order n iff `size >= n AND NOT (size = 1 AND t[0] = '')` — the
  * blank-text guard, including its three-valued edge (a single NULL
  * token also yields no grams, because the SQL guard evaluates to
  * NULL). Null if either array is null (BinaryExpression default).
  */
case class TokenGramMatches(left: Expression, right: Expression,
                            fromN: Int, toN: Int)
    extends BinaryExpression with CodegenFallback {
  require(fromN >= 1 && toN >= fromN && toN <= 16,
    "need 1 <= fromN <= toN <= 16")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"token_gram_matches requires array<string> arguments, got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  private def toks(a: Any): Array[String] = {
    val ad = a.asInstanceOf[ArrayData]
    val n = ad.numElements()
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      out(i) = if (ad.isNullAt(i)) null else ad.getUTF8String(i).toString
      i += 1
    }
    out
  }

  /** The SQL side-guard: grams exist at order n only when the array is
    * long enough and is not the blank-tokenization ([''] — or [NULL],
    * where the guard's `t[0] = ''` is NULL and the CASE falls through
    * to the empty branch too).
    */
  private def hasGrams(t: Array[String], n: Int): Boolean =
    t.length >= n && !(t.length == 1 && (t(0) == null || t(0).isEmpty))

  /** concat_ws(' ', window): join non-null tokens with single spaces. */
  private def gram(t: Array[String], start: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    var first = true
    while (i < n) {
      val tok = t(start + i)
      if (tok != null) {
        if (!first) sb.append(' ')
        sb.append(tok)
        first = false
      }
      i += 1
    }
    sb.toString
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = toks(l)
    val b = toks(r)
    val out = new Array[Long](toN - fromN + 1)
    var n = fromN
    while (n <= toN) {
      if (hasGrams(a, n) && hasGrams(b, n)) {
        val counts = new java.util.HashMap[String, Integer]()
        var j = 0
        while (j + n <= b.length) {
          counts.merge(gram(b, j, n), Integer.valueOf(1),
            (x, y) => Integer.valueOf(x + y))
          j += 1
        }
        var m = 0L
        var i = 0
        while (i + n <= a.length) {
          val k = gram(a, i, n)
          val c = counts.get(k)
          if (c != null && c > 0) {
            m += 1L
            counts.put(k, Integer.valueOf(c - 1))
          }
          i += 1
        }
        out(n - fromN) = m
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TokenGramMatches =
    copy(left = newLeft, right = newRight)
}
