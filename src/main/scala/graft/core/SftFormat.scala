package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SFT (instruction-tuning) data prep: render a chat template around
  * each document and compute the token geometry a trainer needs —
  * where the PROMPT ends and the RESPONSE (the trained span) begins —
  * then pack examples into fixed-length sequences while re-basing
  * every loss-mask span into in-sequence coordinates. Packing reuses
  * [[Packing]]'s two-phase prefix sum verbatim (the cost model is
  * just "rendered tokens"), so examples split across sequence
  * boundaries keep EXACT masks: a slice that covers only prompt
  * tokens gets loss_len 0, a straddling slice gets the clipped
  * response sub-span.
  *
  * Everything is whitespace-token arithmetic over BIGINTs (the q22
  * tokenization convention), so the whole cascade — render → count →
  * place → slice → mask — is engine-exact and fully oracle-able.
  */
object SftFormat {

  /** Rendered example + token geometry: (idCol, prompt, sft_text,
    * n_prompt, n_tokens). The template is
    * `<|user|> {lang} {source} <|assistant|> {text} <|end|>`;
    * n_prompt counts the tokens through `<|assistant|>` (the mask
    * boundary), n_tokens the full rendered example. Null text renders
    * as empty (both engines coalesce, keeping counts aligned).
    */
  def rendered(df: DataFrame, idCol: String, textCol: String,
               langCol: String = "lang",
               sourceCol: String = "source"): DataFrame = {
    val prompt = concat_ws(" ", lit("<|user|>"), col(langCol),
      col(sourceCol), lit("<|assistant|>"))
    val full = concat_ws(" ", prompt,
      coalesce(col(textCol), lit("")), lit("<|end|>"))
    df.select(col(idCol), prompt.as("prompt"), full.as("sft_text"),
      size(TextAnalysis.tokens(prompt)).cast("long").as("n_prompt"),
      size(TextAnalysis.tokens(full)).cast("long").as("n_tokens"))
  }

  /** Loss-mask-preserving sequence packing: each (doc, sequence)
    * slice of the packed stream carries its trained sub-span in
    * IN-SEQUENCE coordinates — (seq_id, doc, seq_off, n_toks,
    * loss_off, loss_len), where loss_off = −1 when the slice holds
    * prompt tokens only. The mask is the intersection of the slice's
    * doc-token range [doc_off, doc_off + n_toks) with the response
    * range [n_prompt, n_tokens), shifted by seq_off.
    *
    * Scale shape: [[Packing.packCompositionsBy]]'s prefix sum places
    * docs by offsets only (text never moves); the n_prompt join back
    * is id-keyed, 8 bytes per doc.
    */
  def packedLossMasks(df: DataFrame, idCol: String, textCol: String,
                      seqLen: Int, langCol: String = "lang",
                      sourceCol: String = "source"): DataFrame = {
    val r = rendered(df, idCol, textCol, langCol, sourceCol)
      .select(col(idCol), col("n_prompt"), col("n_tokens"))
    val comp = Packing.packCompositionsBy(
      r.select(col(idCol), col("n_tokens")), idCol, seqLen)
    comp.join(r, idCol)
      .withColumn("ov_start", greatest(col("doc_off"), col("n_prompt")))
      .withColumn("ov_end",
        least(col("doc_off") + col("n_toks"), col("n_tokens")))
      .withColumn("loss_len",
        greatest(lit(0L), col("ov_end") - col("ov_start")))
      .withColumn("loss_off",
        when(col("loss_len") > 0,
          col("seq_off") + col("ov_start") - col("doc_off"))
          .otherwise(lit(-1L)))
      .select(col("seq_id"), col(idCol), col("seq_off"), col("n_toks"),
        col("loss_off"), col("loss_len"))
  }
}
