package graft

import graft.core.SftFormat
import org.apache.spark.sql.functions._

/** SFT render + loss-mask-preserving packing: hand-computed straddle
  * cases (response split across sequences, prompt-only slices) and
  * the conservation property — per doc, the union of loss spans must
  * cover the response exactly.
  */
class SftFormatSpec extends SparkSpec {
  import spark.implicits._

  test("rendered: template shape, prompt/total token geometry, null text") {
    val df = Seq(
      (1L, "hello world", "en", "src0"),
      (2L, null.asInstanceOf[String], "de", "src1"))
      .toDF("doc_id", "text", "lang", "source")
    val r = SftFormat.rendered(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "prompt", "sft_text", "n_prompt", "n_tokens")
      .as[(Long, String, String, Long, Long)].collect()
    assert(r(0) == ((1L, "<|user|> en src0 <|assistant|>",
      "<|user|> en src0 <|assistant|> hello world <|end|>", 4L, 7L)))
    // null text renders empty: the double space collapses under \s+
    assert(r(1)._4 == 4L && r(1)._5 == 5L)
  }

  test("packedLossMasks: straddling response, prompt-only slice, " +
      "re-based offsets — hand-computed at seqLen 6") {
    // np = 4 for every doc (single-token lang/source)
    val df = Seq(
      (1L, "r1 r2 r3 r4", "en", "s"), // n = 9: spans seq 0 and 1
      (2L, "s1", "en", "s"))          // n = 6: prompt-only slice in seq 1
      .toDF("doc_id", "text", "lang", "source")
    val got = SftFormat.packedLossMasks(df, "doc_id", "text", seqLen = 6)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    assert(got == Seq(
      (0L, 1L, 0L, 6L, 4L, 2L),   // doc1 [0,6): resp [4,6) at off 4
      (1L, 1L, 0L, 3L, 0L, 3L),   // doc1 [6,9): resp tail at off 0
      (1L, 2L, 3L, 3L, -1L, 0L),  // doc2 [9,12): prompt only
      (2L, 2L, 0L, 3L, 1L, 2L)),  // doc2 [12,15): resp [4,6) -> off 1
      s"got $got")
  }

  test("conservation: per doc, loss spans sum to the response length " +
      "and never overlap sequence slices (sf0.001 corpus)") {
    val docs = Tables.documents(spark, Sf0001)
    val masks = SftFormat.packedLossMasks(docs, "doc_id", "text", seqLen = 128)
    val r = SftFormat.rendered(docs, "doc_id", "text")
      .select(col("doc_id"), (col("n_tokens") - col("n_prompt")).as("resp"))
    val covered = masks.groupBy("doc_id")
      .agg(sum("loss_len").as("covered"))
    val bad = covered.join(r, "doc_id")
      .filter(col("covered") =!= col("resp")).count()
    assert(bad == 0L, "every response token must be trained exactly once")
    // loss spans stay inside their slice: off >= seq_off, end <= seq_off+n_toks
    val oob = masks.filter(col("loss_len") > 0 &&
      (col("loss_off") < col("seq_off") ||
        col("loss_off") + col("loss_len") > col("seq_off") + col("n_toks")))
      .count()
    assert(oob == 0L)
  }
}
