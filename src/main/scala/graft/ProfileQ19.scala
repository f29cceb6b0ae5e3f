package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Dedup, TextAnalysis}

/** Stage-by-stage timing of the ngram-jaccard plan — local tool. */
object ProfileQ19 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    val d = Tables.documents(spark, dir)
    time("scan")(d.count())
    time("tokenize")(d.select(explode(TextAnalysis.tokens(col("text")))).count())
    val sh = d.select(col("doc_id").as("doc"), Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    time("shingle arrays")(sh.count())
    val inv = sh.select(col("doc"), col("n_sh"), explode(col("sh")).as("shingle"))
    time("explode shingles")(inv.count())
    val byShingle = inv.groupBy("shingle")
      .agg(collect_list(struct(col("doc"), col("n_sh"))).as("ds"))
      .filter(size(col("ds")) > 1)
    time("group by shingle")(byShingle.count())
    val combos = byShingle.select(array_sort(col("ds")).as("ds"))
      .select(explode(flatten(
        transform(sequence(lit(0), size(col("ds")) - 2), i =>
          transform(sequence(i + 1, size(col("ds")) - 1), j =>
            struct(
              col("ds")(i).getField("doc").as("doc_a"),
              col("ds")(j).getField("doc").as("doc_b"),
              col("ds")(i).getField("n_sh").as("n_a"),
              col("ds")(j).getField("n_sh").as("n_b")))))).as("p"))
    time("pair combos")(combos.count())
    val pairs = combos.groupBy(col("p.doc_a"), col("p.doc_b"), col("p.n_a"), col("p.n_b"))
      .agg(count(lit(1)).as("n_common"))
    time("pair counts")(pairs.count())
    time("full q19")(SparkEntry.queries("q19_ngram_jaccard")(spark, dir).count())
    spark.stop()
  }
}
