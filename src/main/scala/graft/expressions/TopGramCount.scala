package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of a document's most frequent word n-gram, as a
  * native single-pass expression.
  *
  * The statistic is PER-ROW — it depends only on the row's own text —
  * so computing it here keeps the Gopher repetition gate a pure
  * projection. The previous relational form (explode all grams →
  * groupBy(id, gram) → groupBy(id) max → join back) paid two key
  * exchanges and a join for what is local arithmetic; at corpus scale
  * those exchanges carried every gram instance of every document.
  * [[graft.core.TextAnalysis.repetitionStatsRelational]] keeps that
  * formulation as this expression's semantic oracle.
  *
  * Edge semantics match [[ShingleArray]] (distinct = false): a doc
  * with fewer than n tokens contributes its single truncated gram, so
  * the count is >= 1 for any non-empty text. Gram identity is the
  * space-joined token run — identical to the exploded form, so the
  * DuckDB oracle replays unchanged.
  *
  * Memory: one open-addressing count pass over the doc's own windows —
  * bounded by the document's token count, strictly less than what the
  * exploded gram rows of the same document materialized.
  */
case class TopGramCount(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "gram size must be >= 1")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_gram_count requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim
      .split("\\s+", -1)
    val last = math.max(toks.length - n, 0)
    // Count windows by CONTENT. Windows are compared as token runs via
    // a precomputed per-token hash (polynomial over the token string)
    // combined positionally, with full token-by-token equality on hash
    // collision — no per-window string materialization.
    val tokHash = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) { tokHash(i) = toks(i).hashCode; i += 1 }
    val m = new java.util.HashMap[Window, Long](math.min(last + 1, 1 << 10))
    var best = 0L
    i = 0
    while (i <= last) {
      val end = math.min(i + n, toks.length)
      var h = 1
      var j = i
      while (j < end) { h = h * 31 + tokHash(j); j += 1 }
      val w = new Window(toks, i, end, h)
      val c = m.merge(w, 1L, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }

  /** A token-run view used as a hash key: equality is exact
    * token-by-token comparison, so hash collisions cannot conflate
    * distinct grams.
    */
  private final class Window(toks: Array[String], val start: Int,
                             val end: Int, h: Int) {
    override def hashCode: Int = h
    override def equals(o: Any): Boolean = o match {
      case w: Window =>
        if (w.end - w.start != end - start) false
        else {
          var i = start
          var j = w.start
          var same = true
          while (same && i < end) {
            same = toks(i) == w.toks2(j); i += 1; j += 1
          }
          same
        }
      case _ => false
    }
    def toks2: Array[String] = toks
  }

  override protected def withNewChildInternal(newChild: Expression): TopGramCount =
    copy(child = newChild)
}
