package graft

import graft.core.{Decontaminate, Sketches}
import org.apache.spark.sql.functions._

/** Relational bloom filter + the decontamination pre-filter built on
  * it: the no-false-negative contract, measured false-positive
  * sanity, and exact-path equality of the composed pipeline.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloomBuild/bloomTest: every built key hits (no false " +
      "negatives); absent keys mostly miss at sane sizing") {
    val in = (1 to 500).map(i => s"key number $i")
    val keys = in.toDF("k")
    val bloom = Sketches.bloomBuild(keys, col("k"),
      numBits = 1 << 14, numHashes = 4)
    val selfHits = Sketches.bloomTest(keys, col("k"), bloom,
        numBits = 1 << 14, numHashes = 4)
      .filter(col("bloom_hit")).count()
    assert(selfHits == 500L)
    // disjoint probe set: ~500 keys into 16384 bits ≈ 12% load,
    // expected FPR (1-e^(-4*500/16384))^4 << 10%; assert a loose bound
    val other = (1 to 500).map(i => s"other thing $i").toDF("k")
    val fp = Sketches.bloomTest(other, col("k"), bloom,
        numBits = 1 << 14, numHashes = 4)
      .filter(col("bloom_hit")).count()
    assert(fp < 50L, s"false-positive count $fp out of 500")
  }

  test("bloomTest: word boundaries and partition invariance — bits " +
      "land identically however the build side is partitioned") {
    val keys = (1 to 200).map(i => s"w$i").toDF("k")
    val a = Sketches.bloomBuild(keys, col("k"), 1 << 10, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sketches.bloomBuild(keys.repartition(13), col("k"),
        1 << 10, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // every word index within range, every bit below the sign bit
    assert(a.forall { case (w, bits) =>
      w >= 0 && w <= (1 << 10) / 62 && bits > 0L })
  }

  test("flagContaminatedBloom == flagContaminated exactly; " +
      "candidates bound hits; clean docs show zero candidates " +
      "unless a false positive fires") {
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon more tail"),
      (2L, "totally unrelated content with zero overlap here"),
      (3L, "one two three four five and then divergent text"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta copied"))
      .toDF("doc_id", "text")
    val exact = Decontaminate.flagContaminated(train, eval,
        "doc_id", "text", n = 5, minHits = 1)
      .select(col("doc_id"), col("n_hits"), col("contaminated"))
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val got = Decontaminate.flagContaminatedBloom(train, eval,
        "doc_id", "text", n = 5, minHits = 1,
        numBits = 1 << 14, numHashes = 4)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    got.foreach { case (id, (nsh, ncand, nhits, flag)) =>
      assert((nhits, flag) == exact(id), s"doc $id vs exact")
      assert(ncand >= nhits && ncand <= nsh, s"doc $id candidate bounds")
    }
    assert(got(4L)._4 && got(1L)._4 && !got(2L)._4 && got(3L)._4)
  }
}
