package graft

import graft.core.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Composed curation pipeline invariants (q51 carries the end-to-end
  * oracle; these pin the stage wiring).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  lazy val audit = Curation.curate(Tables.documents(spark, Sf0001)).cache()

  test("audit covers every input doc exactly once") {
    val n = Tables.documents(spark, Sf0001).count()
    assert(audit.count() == n)
    assert(audit.select("doc_id").distinct().count() == n)
  }

  test("stage implications: survivor => kept_exact => quality_ok") {
    assert(audit.filter($"is_survivor" && !$"kept_exact").count() == 0)
    assert(audit.filter($"kept_exact" && !$"quality_ok").count() == 0)
    // dropped docs carry no survivor pointer
    assert(audit.filter(!$"kept_exact" && $"survivor_id".isNotNull).count() == 0)
    // kept docs always resolve to a surviving doc
    assert(audit.filter($"kept_exact" && $"survivor_id".isNull).count() == 0)
  }

  test("every survivor_id points at a doc that is itself a survivor") {
    val survivors = audit.filter($"is_survivor")
      .select($"doc_id".as("sid"))
    val dangling = audit.filter($"survivor_id".isNotNull)
      .join(survivors, $"survivor_id" === $"sid", "left_anti")
    assert(dangling.count() == 0)
  }

  test("surviving corpus has unique texts (exact level) and matches piecewise run") {
    val docs = Tables.documents(spark, Sf0001)
    val corpus = audit.filter($"is_survivor")
      .join(docs, "doc_id")
    // exact dedup: no two survivors share a text
    assert(corpus.groupBy(sha2($"text", 256)).count()
      .filter($"count" > 1).count() == 0)
    // composition == running the stages by hand
    val scored = TextAnalysis.qualityScore(docs, "text")
      .filter(round($"stopword_ratio" * 0.4 + $"alpha_ratio" * 0.6
        - $"punct_ratio" * 0.5, 6) >= 0.51)
    val kept = Dedup.dropExactDups(scored, "doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(kept, "doc_id", "text",
      n = 3, threshold = 0.2)
    val expected = Dedup.resolveSurvivors(kept, "doc_id", pairs)
      .filter($"is_survivor").select("doc_id").as[Long].collect().toSet
    val got = corpus.select("doc_id").as[Long].collect().toSet
    assert(got == expected)
  }
}
