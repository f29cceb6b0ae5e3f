package graft

import graft.core.{ProductQuantizer, Similarity}
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private val M = 8
  private val Ks = 64

  private def emb = Tables.embeddings(spark, Sf0001)

  /** Mean squared reconstruction error of a model over the corpus. */
  private def mse(model: ProductQuantizer.PQModel): Double = {
    val enc = ProductQuantizer.encode(emb, model)
    val dec = ProductQuantizer.decode(enc, model)
    emb.join(dec, "vec_id")
      .select(
        aggregate(
          zip_with(col("embedding"), col("decoded"),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (a, v) => a + v).as("se"))
      .agg(avg("se")).head().getDouble(0)
  }

  test("trained codebooks reconstruct better than hash codebooks") {
    val trained = ProductQuantizer.train(emb, M, Ks, maxIter = 6)
    val hashed = ProductQuantizer.hashCodebooks(M, Ks, 64 / M)
    val (mseTrained, mseHashed) = (mse(trained), mse(hashed))
    assert(mseTrained < mseHashed,
      s"training did not reduce quantization error: $mseTrained vs $mseHashed")
    // and the reconstruction carries real signal: error well below the
    // raw vector energy
    val energy = emb.select(
      Similarity.dot(col("embedding"), col("embedding")).as("e"))
      .agg(avg("e")).head().getDouble(0)
    assert(mseTrained < energy * 0.5, s"mse $mseTrained vs energy $energy")
  }

  test("encode is deterministic; codes in range; flat form matches") {
    val model = ProductQuantizer.hashCodebooks(M, Ks, 64 / M)
    val a = ProductQuantizer.encode(emb, model)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    val b = ProductQuantizer.encode(emb, model)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
    assert(a.values.forall(cs => cs.length == M && cs.forall(c => c >= 0 && c < Ks)))
    val flat = ProductQuantizer.encodeFlat(emb, model)
      .as[(Long, Long, Long)].collect()
    assert(flat.length == a.size * M)
    flat.foreach { case (id, j, code) => assert(a(id)(j.toInt).toLong == code) }
  }

  test("ADC recall: true nearest neighbor surfaces in the PQ top-10") {
    val model = ProductQuantizer.train(emb, M, Ks, maxIter = 6)
    val queries = emb.filter($"vec_id" % 50 === 1).limit(10)
    val truth = Similarity.cosineTopK(queries, emb, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val enc = ProductQuantizer.encode(emb, model)
    val adc = ProductQuantizer.adcTopK(queries, enc, model, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = truth.count { case (q, nn) => adc(q).contains(nn) }
    val recall = hits.toDouble / truth.size
    assert(recall >= 0.6, s"PQ recall@10 too low: $recall")
  }

  test("native AdcScore == HOF lookup-sum; NULL on malformed input") {
    val model = ProductQuantizer.hashCodebooks(M, Ks, 64 / M)
    val enc = ProductQuantizer.encode(emb, model)
    val q = emb.filter($"vec_id" % 100 === 7).limit(3)
    val lut = array((0 until model.m).map { j =>
      array(model.codebooks(j).map(c =>
        Similarity.dot(slice(col("embedding"), j * model.subDim + 1, model.subDim),
          array(c.map(lit): _*))).toIndexedSeq: _*)
    }: _*)
    val pairs = enc.crossJoin(broadcast(q.select(lut.as("lut"))))
    val mism = pairs
      .withColumn("a", ProductQuantizer.adcScore(col("codes"), col("lut")))
      .withColumn("b", ProductQuantizer.adcScoreHof(col("codes"), col("lut")))
      .filter(!(col("a") <=> col("b")))
      .count()
    assert(mism == 0L)
    // malformed: out-of-range code and length mismatch are NULL
    val bad = Seq(
      (Array(99), Seq(Seq(1.0, 2.0))),          // code out of range
      (Array(0, 0), Seq(Seq(1.0)))              // m mismatch
    ).toDF("codes", "lut")
      .select(ProductQuantizer.adcScore(col("codes"), col("lut")).as("s"))
      .collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("ivfPqTopK == independent recomposition (probe filter over full ADC ranking)") {
    val model = ProductQuantizer.hashCodebooks(M, 16, 64 / M)
    val centroids = emb.filter($"vec_id" % 97 === 3)
      .select($"vec_id".as("centroid_id"), $"embedding")
    val queries = emb.filter($"vec_id" < 8)
    val got = ProductQuantizer.ivfPqTopK(queries, emb, centroids, model,
      k = 5, nProbe = 2)
      .select("query_id", "rank", "neighbor_id", "cos_approx")
      .as[(Long, Int, Long, Double)].collect().toSet

    // independent recomposition: rank the WHOLE corpus by ADC, then
    // keep only candidates inside each query's probed buckets, re-rank
    val n = emb.count().toInt
    val full = ProductQuantizer.adcTopK(queries,
      ProductQuantizer.encode(emb, model), model, k = n)
    val buckets = Similarity.assignBuckets(emb, centroids)
      .select($"vec_id".as("neighbor_id"), $"bucket")
    val c = centroids.select($"centroid_id", $"embedding".as("cent_vec"))
    val probes = queries.select($"vec_id".as("query_id"), $"embedding".as("q_vec"))
      .crossJoin(broadcast(c))
      .withColumn("cos_c", Similarity.cosine($"q_vec", $"cent_vec"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy(desc("cos_c"), asc("centroid_id"))
    val probed = probes.withColumn("rnk", row_number().over(wq))
      .filter($"rnk" <= 2).select($"query_id", $"centroid_id".as("bucket"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy(desc("cos_approx"), asc("neighbor_id"))
    val expected = full.join(buckets, "neighbor_id")
      .join(probed, Seq("query_id", "bucket"))
      .withColumn("rank2", row_number().over(w2))
      .filter($"rank2" <= 5)
      .select($"query_id", $"rank2".cast("int"), $"neighbor_id", $"cos_approx")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("ADC approximates the exact cosine with bounded error") {
    val model = ProductQuantizer.train(emb, M, Ks, maxIter = 6)
    val queries = emb.filter($"vec_id" % 100 === 7).limit(5)
    val enc = ProductQuantizer.encode(emb, model)
    val approx = ProductQuantizer.adcTopK(queries, enc, model, k = 500)
      .select(col("query_id"), col("neighbor_id"), col("cos_approx"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("cv")).as("cos_exact"))
    val err = approx.join(exact, Seq("query_id", "neighbor_id"))
      .agg(avg(abs(col("cos_approx") - col("cos_exact")))).head().getDouble(0)
    assert(err < 0.15, s"mean |approx-exact| cosine error too high: $err")
  }
}
