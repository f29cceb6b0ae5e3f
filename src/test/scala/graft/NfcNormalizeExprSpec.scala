package graft

import graft.core.TextAnalysis
import graft.expressions.NfcNormalize
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native NFC-normalize codegen expression: Unicode canonical
  * composition semantics, idempotence, and clean-text passthrough.
  * All non-ASCII content is built from explicit code points so the
  * fixtures are independent of source-file encoding.
  */
class NfcNormalizeExprSpec extends SparkSpec {
  import spark.implicits._

  private val Acute = "́"     // combining acute, ccc 230
  private val Cedilla = "̧"   // combining cedilla, ccc 202
  private val EAcute = "é"    // precomposed e-acute

  private def nfc(s: String): String =
    NfcNormalize.nfc(UTF8String.fromString(s)).toString

  test("scalar semantics: composition, idempotence, passthrough") {
    val decomposed = "cafe" + Acute
    val precomposed = "caf" + EAcute
    assert(nfc(decomposed) == precomposed)
    assert(nfc(decomposed).length == 4)
    assert(nfc(nfc(decomposed)) == nfc(decomposed)) // idempotent
    assert(nfc("plain ascii") == "plain ascii")
    assert(nfc("") == "")
    // NFC composes only -- already-precomposed text is untouched
    assert(nfc(precomposed) == precomposed)
    // canonical reordering: cedilla (ccc 202) sorts before acute
    // (ccc 230), so both mark orders land on one normal form
    assert(nfc("a" + Cedilla + Acute) == nfc("a" + Acute + Cedilla))
  }

  test("expression in a plan: composes, shrinks codepoint length, null-safe") {
    val df = Seq(Some("he" + Acute + "llo"), Some("plain"), None)
      .toDF("text")
    val got = df.select(
        TextAnalysis.nfcNormalize($"text").as("n"),
        length(TextAnalysis.nfcNormalize($"text")).as("len"))
      .collect()
    assert(got(0).getString(0) == "h" + EAcute + "llo")
    assert(got(0).getInt(1) == 5)
    assert(got(1).getString(0) == "plain")
    assert(got(2).isNullAt(0) && got(2).isNullAt(1))
  }

  test("normalization heals dedup keys split by encoding form") {
    // the same logical text in two encoding forms must collide
    // after NFC
    val docs = Seq(
      (1L, "re" + Acute + "sume" + Acute),
      (2L, "r" + EAcute + "sum" + EAcute))
      .toDF("doc_id", "text")
    val rawKeys = docs.select(countDistinct($"text")).as[Long].head()
    val nfcKeys = docs
      .select(countDistinct(TextAnalysis.nfcNormalize($"text")))
      .as[Long].head()
    assert(rawKeys == 2L && nfcKeys == 1L)
  }
}
