package graft

import graft.ml.Perceptron
import org.apache.spark.sql.functions._

class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked separable pair: one update then convergence") {
    val df = Seq((Array(0.5f), true), (Array(-0.5f), false))
      .toDF("embedding", "pos")
    val got = Perceptron.trainBatch(df, "embedding", col("pos"), 3)
      .as[(String, Long, Long)].collect().toSet
    // epoch 1: w=0 -> both misclassified, delta = [1e6, 0]
    // epochs 2-3: margins +-5e11 correct -> no updates
    assert(got == Set(
      ("mis", 1L, 2L), ("mis", 2L, 0L), ("mis", 3L, 0L),
      ("w", 0L, 1000000L), ("w", 1L, 0L)))
  }

  test("xor-ish non-separable data keeps updating; counts deterministic") {
    val df = Seq(
      (Array(1.0f, 1.0f), true), (Array(-1.0f, -1.0f), true),
      (Array(1.0f, -1.0f), false), (Array(-1.0f, 1.0f), false))
      .toDF("embedding", "pos")
    val a = Perceptron.trainBatch(df, "embedding", col("pos"), 4)
      .collect().toSet
    val b = Perceptron.trainBatch(df.repartition(3), "embedding",
      col("pos"), 4).collect().toSet
    assert(a == b)
    // XOR is not linearly separable: some epoch after the first still
    // misclassifies
    val mis = a.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 == "mis")
    assert(mis.exists(m => m._2 > 1 && m._3 > 0))
  }

  test("sf0.001 embeddings: all-mis first epoch, then real margins") {
    // the synthetic labels are near-random vs the embeddings, so no
    // separation claim — pin the STRUCTURE: epoch 1 misclassifies
    // everything (w = 0), later epochs classify a nontrivial split
    // (the weights actually move margins off zero), weights cover
    // every dim + bias
    val emb = Tables.embeddings(spark, Sf0001)
    val out = Perceptron.trainBatch(emb, "embedding", col("label") < 5, 3)
      .as[(String, Long, Long)].collect()
    val curve = out.filter(_._1 == "mis").sortBy(_._2).map(_._3)
    val n = emb.count()
    assert(curve.head == n)
    assert(curve.drop(1).forall(c => c > 0 && c < n * 60 / 100),
      s"curve ${curve.toSeq} n=$n")
    assert(out.count(_._1 == "w") == 65)
  }
}
