package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Bpe, Curation, Packing}

/** Stage-by-stage timing of the q80 flagship composition (curate →
  * BPE train → id-encode → write → pack) — the `ProfileQ73` pattern:
  * mirrors `SparkEntry.corpusToSequences`'s exact boundaries so the
  * per-stage numbers decompose the gate query's time (budget
  * attribution, not a new code path).
  */
object ProfileQ80 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val scratch = java.nio.file.Files.createTempDirectory("graft_q80prof")
      .toString
    val t = scratch + "/enc"
    val docs = Tables.documents(spark, dir)
    // curateFullSurvivorIdsReleasable is NOT lazy — the LM stage runs
    // training actions at call time — so the CALL is a stage of its own
    val (survivors, curCaches) = time("curation call (eager work)") {
      Curation.curateFullSurvivorIdsReleasable(docs, maxNllMicro = 3450000L)
    }
    val curated = docs.join(survivors, Seq("doc_id"))
      .select(col("doc_id"), col("text"))
    val corpus = time("corpus materialize+write") {
      graft.sources.SnapshotTable.overwrite(curated, t + "_corpus")
      curCaches.unpersist()
      graft.sources.SnapshotTable.read(spark, t + "_corpus")
    }
    val wc = Bpe.wordCounts(corpus, "text").persist()
    val dict = time("bpe dict agg+collect") {
      wc.filter(col("cnt") >= 2L)
        .orderBy(col("cnt").desc, col("word")).limit(2000000)
        .collect().map(r => (r.getString(0), r.getLong(1)))
    }
    val model = time("bpe driver merge loop")(
      Bpe.trainFromDict(dict, numMerges = 100, minFrequency = 2L))
    val vocabIds = time("vocab from word dict") {
      Bpe.vocabFromCounts(wc, model)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    wc.unpersist()
    val enc = Bpe.encodeIds(corpus, "doc_id", "text", model, vocabIds)
    time("encode + snapshot write") {
      graft.sources.SnapshotTable.overwrite(enc, t)
    }
    val packed = Packing.packIdSequences(
      graft.sources.SnapshotTable.read(spark, t), "doc_id", seqLen = 512)
    time("pack from written table") {
      packed.select(col("seq_id"), col("n_docs"), col("n_tokens"),
        xxhash64(concat_ws(",", col("token_ids"))).as("ids_hash"))
        .write.format("noop").mode("overwrite").save()
    }
    // the full gate query, twice (cold-ish then warm context)
    time("full q80 #1") {
      SparkEntry.queries("q80_corpus_to_sequences")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.sharedState.cacheManager.clearCache()
    time("full q80 #2") {
      SparkEntry.queries("q80_corpus_to_sequences")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
