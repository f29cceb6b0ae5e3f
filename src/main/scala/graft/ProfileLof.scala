package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the exact-LOF plan shape (q293/q303/q310 family):
  * confirms where the wall-clock goes (single-partition parents from
  * a one-row-group parquet scan serializing the n² scan) and measures
  * the repartitioned variant against the current one. Local tool;
  * numbers land in OPTIMIZATION_r16.md.
  */
object ProfileLof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.Similarity

    val emb = Tables.embeddings(spark, dir)
    println(s"[lofprof] scan partitions: ${emb.rdd.getNumPartitions}")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[lofprof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    // current shape, warm x3 (first pays codegen)
    (1 to 3).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      time(s"lof current #$i") {
        Similarity.lof(emb, k = 5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // repartitioned input (scale-adaptive: session default parallelism)
    val par = spark.sparkContext.defaultParallelism
    (1 to 3).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      time(s"lof repart($par) input #$i") {
        Similarity.lof(emb.repartition(par), k = 5)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // ---- stage decomposition of the current internals ----
    import org.apache.spark.sql.expressions.Window
    import graft.expressions.DotProduct
    import org.apache.spark.sql.GraftShim
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      GraftShim.column(DotProduct(GraftShim.expression(a), GraftShim.expression(b)))
    spark.sharedState.cacheManager.clearCache()
    val k = 5
    val pts = emb.repartition(par).select(col("vec_id").as("id"),
        expr(s"transform(embedding, v -> CAST(" +
          "floor(CAST(v AS DOUBLE) * 1000.0) AS DOUBLE))").as("vm"))
      .withColumn("n2", dot(col("vm"), col("vm")).cast("long"))
      .persist()
    time("s0 pts materialize")(pts.count(): Unit)
    val a = pts.select(col("id").as("p"), col("vm").as("va"), col("n2").as("na"))
    val b = pts.select(col("id").as("o"), col("vm").as("vb"), col("n2").as("nb"))
    val half = a.crossJoin(b).filter(col("p") < col("o"))
      .withColumn("d2",
        col("na") + col("nb") - lit(2L) * dot(col("va"), col("vb")).cast("long"))
      .select(col("p"), col("o"), col("d2"))
      .persist()
    time("s1 half (n^2 dots)")(half.count(): Unit)
    val pairs = half.unionByName(half.select(col("o").as("p"), col("p").as("o"), col("d2")))
    val w = Window.partitionBy("p").orderBy(col("d2"), col("o"))
    val kdist = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === k)
      .select(col("p"), col("d2").as("kdist_sq"))
    time("s2 kdist window (no cache)")(kdist.count(): Unit)
    val kdistC = kdist.persist()
    time("s2b kdist persist")(kdistC.count(): Unit)
    val nbrs = pairs.join(kdistC, "p").filter(col("d2") <= col("kdist_sq")).persist()
    time("s3 nbrs")(nbrs.count(): Unit)
    val reach = nbrs
      .join(kdistC.select(col("p").as("o"), col("kdist_sq").as("ko")), "o")
      .select(col("p"), col("o"), col("kdist_sq"), greatest(col("ko"), col("d2")).as("rd"))
    val lrd = reach.groupBy(col("p"), col("kdist_sq"))
      .agg(count(lit(1)).as("n_nb"), sum("rd").as("s"))
      .filter(col("s") > 0L)
      .select(col("p"), col("kdist_sq"), col("n_nb"),
        expr("n_nb * 1000000000000L DIV s").as("lrd_q")).persist()
    time("s4 lrd")(lrd.count(): Unit)
    val out = nbrs.select(col("p"), col("o"))
      .join(lrd.select(col("p").as("o"), col("lrd_q").as("lrd_o")), "o")
      .groupBy("p").agg(sum("lrd_o").as("sum_lrd_o"))
      .join(lrd, "p")
      .select(col("p").as("id"), col("kdist_sq"),
        col("n_nb").as("n_neighbors"), col("lrd_q"),
        expr("sum_lrd_o * 1000000L DIV (n_nb * lrd_q)").as("lof_micro"))
    time("s5 out + localCheckpoint")(out.localCheckpoint(true).count(): Unit)
    spark.stop()
  }
}
