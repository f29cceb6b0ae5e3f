package graft

import graft.ml.QualityClassifier
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // planted two-lexicon corpus: "good" docs draw from one vocabulary,
  // "bad" from a disjoint one, with shared filler so the problem isn't
  // trivially separable per token
  private def planted(n: Int) = {
    val good = Seq("insight", "method", "evidence", "theory", "result")
    val bad = Seq("clickbait", "miracle", "shocking", "secret", "trick")
    val fill = Seq("the", "a", "of", "is", "and")
    (0 until n).map { i =>
      val words = (0 until 20).map { j =>
        val r = (i * 31 + j * 7) % 10
        if (r < 3) fill(r % fill.length)
        else if (i % 2 == 0) good((r + j) % good.length)
        else bad((r + j) % bad.length)
      }
      (i.toLong, words.mkString(" "), if (i % 2 == 0) 1 else 0)
    }.toDF("doc_id", "text", "label")
  }

  test("train: loss decreases monotonically-ish and separates planted classes") {
    val docs = planted(200)
    val model = QualityClassifier.train(docs, "label", buckets = 256,
      iters = 15, learningRate = 40.0)
    assert(model.lossTrace.head > model.lossTrace.last,
      s"loss should fall: ${model.lossTrace}")
    assert(model.lossTrace.last < 0.25, s"final loss ${model.lossTrace.last}")
    val scored = QualityClassifier.score(docs, model)
      .join(docs.select($"doc_id", $"label"), "doc_id")
    val acc = scored.filter(($"prob" > 0.5) === ($"label" === 1)).count().toDouble /
      scored.count()
    assert(acc >= 0.95, s"training accuracy $acc")
  }

  test("trained model generalizes to unseen docs from the same lexicons") {
    val model = QualityClassifier.train(planted(200), "label",
      buckets = 256, iters = 15, learningRate = 40.0)
    // held-out docs: new index range → different filler mix, same lexicons
    val held = planted(300).filter($"doc_id" >= 200)
    val scored = QualityClassifier.score(held, model)
      .join(held.select($"doc_id", $"label"), "doc_id")
    val acc = scored.filter(($"prob" > 0.5) === ($"label" === 1)).count().toDouble /
      scored.count()
    assert(acc >= 0.9, s"held-out accuracy $acc")
  }

  test("fixed-point inference: exact, partition-invariant, matches driver recompute") {
    val docs = Tables.documents(spark, Sf0001).limit(50)
    val w = QualityClassifier.hashWeights(spark, 128)
    val out = QualityClassifier.scoreFixedPoint(docs, w, 128)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    val out2 = QualityClassifier.scoreFixedPoint(docs.repartition(11), w, 128)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == out2)
    // driver recompute of one doc via the same portable primitives
    val wMap = w.as[(Long, Long)].collect().toMap
    val row = docs.orderBy("doc_id").select("doc_id", "text").head()
    val toks = row.getString(1).trim.split("\\s+").toSeq
    val grams = toks ++ (if (toks.length >= 2)
      toks.sliding(2).map(_.mkString(" ")).toSeq else Seq(toks.mkString(" ")))
    val expect = grams.map(g =>
      wMap(graft.expressions.RollingHash.hash(g) % 128)).sum
    assert(out.find(_._1 == row.getLong(0)).get._2 == expect)
  }
}
