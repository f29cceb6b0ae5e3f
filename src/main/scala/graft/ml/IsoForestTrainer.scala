package graft.ml

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** From-scratch IsolationForest training (Liu/Ting/Zhou 2008) — the
  * SURVEY §7.3 stretch goal. Produces the same `IsoForestScorer.Model`
  * shape the artifact-derived scorer uses, so scoring/serving code is
  * shared.
  *
  * Division of labor at scale:
  *  - scaler statistics (mean, population stddev — sklearn
  *    StandardScaler semantics) and the contamination offset are
  *    DISTRIBUTED passes over the full data;
  *  - tree induction runs on the driver over `nTrees x maxSamples`
  *    rows (iForest trains each tree on a tiny uniform subsample by
  *    construction — 200x256 rows regardless of corpus size), drawn
  *    with a seeded distributed shuffle.
  *
  * Determinism: fixed `seed` drives the sample order, feature choices
  * and split thresholds, so fit() is reproducible run to run.
  */
object IsoForestTrainer {

  def fit(df: DataFrame, features: Seq[String], nTrees: Int = 200,
          maxSamples: Int = 256, contamination: Double = 0.05,
          seed: Long = 42L): IsoForestScorer.Model = {
    require(features.nonEmpty)

    // distributed pass 1: scaler stats (ddof=0, like sklearn)
    val statRow = df.agg(
      avg(col(features.head)).as("m0"),
      features.tail.map(f => avg(col(f))) ++
        features.map(f => stddev_pop(col(f))): _*).head()
    val mean = features.indices.map(statRow.getDouble).toArray
    val scale = features.indices.map(i => {
      val s = statRow.getDouble(features.length + i)
      if (s == 0.0 || s.isNaN) 1.0 else s
    }).toArray

    // single-pass distributed reservoir -> the tree subsamples (an
    // orderBy(rand).limit here would be a FULL global sort at scale)
    val need = nTrees * maxSamples
    val rows = graft.core.Sampling.reservoirDoubles(df, features, need, seed)
      .map(r => features.indices.map(i => (r(i) - mean(i)) / scale(i)).toArray)
    require(rows.length >= maxSamples, s"need >= $maxSamples rows, got ${rows.length}")

    val rng = new Random(seed)
    val heightLimit = math.ceil(math.log(maxSamples.toDouble) / math.log(2.0)).toInt
    val trees = Array.tabulate(nTrees) { t =>
      val lo = (t.toLong * maxSamples % rows.length).toInt
      val sample = Array.tabulate(maxSamples)(i => rows((lo + i) % rows.length))
      buildTree(sample, features.length, heightLimit, rng)
    }

    val uncalibrated = IsoForestScorer.Model(features.toArray, mean, scale,
      trees, maxSamples, offset = 0.0)

    // distributed pass 2: contamination offset — sklearn sets
    // offset_ = percentile(score_samples(X), 100 * contamination),
    // where score_samples = decision_function(offset=0)
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(uncalibrated)
    val scoreUdf = udf((xs: Seq[Double]) => bc.value.decisionFunction(xs.toArray))
    val offset = df
      .withColumn("__s", scoreUdf(array(features.map(f => col(f).cast("double")): _*)))
      .agg(expr(s"percentile(__s, $contamination)")).head().getDouble(0)

    uncalibrated.copy(offset = offset)
  }

  /** One isolation tree over a scaled sample: uniform random feature,
    * uniform random threshold within the node's value range; grow to
    * the height limit or single/duplicate points. Flat arrays in the
    * scorer's node layout.
    */
  private def buildTree(sample: Array[Array[Double]], nFeatures: Int,
                        heightLimit: Int, rng: Random): IsoForestScorer.Tree = {
    val left = collection.mutable.ArrayBuffer.empty[Int]
    val right = collection.mutable.ArrayBuffer.empty[Int]
    val feature = collection.mutable.ArrayBuffer.empty[Int]
    val threshold = collection.mutable.ArrayBuffer.empty[Double]
    val nNode = collection.mutable.ArrayBuffer.empty[Int]

    def grow(idx: Array[Int], depth: Int): Int = {
      val node = left.length
      left += -1; right += -1; feature += -1; threshold += 0.0; nNode += idx.length
      if (depth >= heightLimit || idx.length <= 1) return node
      // pick a feature with spread; give up after a few tries (all-dup node)
      var tries = 0
      while (tries < nFeatures) {
        val f = rng.nextInt(nFeatures)
        var mn = Double.MaxValue; var mx = Double.MinValue
        idx.foreach { i =>
          val v = sample(i)(f)
          if (v < mn) mn = v
          if (v > mx) mx = v
        }
        if (mx > mn) {
          val thr = mn + rng.nextDouble() * (mx - mn)
          val (l, r) = idx.partition(i => sample(i)(f) <= thr)
          if (l.nonEmpty && r.nonEmpty) {
            feature(node) = f; threshold(node) = thr
            val ln = grow(l, depth + 1)
            left(node) = ln
            right(node) = grow(r, depth + 1)
            return node
          }
        }
        tries += 1
      }
      node // leaf: no splittable feature
    }

    grow(sample.indices.toArray, 0)
    IsoForestScorer.Tree(left.toArray, right.toArray, feature.toArray,
      threshold.toArray, nNode.toArray)
  }
}
