package graft.ml

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** StandardScaler + IsolationForest scoring (SURVEY §2.9 M2) — the
  * reference's `pipeline.predict` / `decision_function`
  * (`/root/reference/function-app/ml_forecast_anomaly.py:218-222`),
  * re-implemented from the model artifact's exported parameters
  * (`tools/export_isoforest.py` -> `isoforest_model.json`: 200 trees,
  * max_samples 256, contamination 0.05, sklearn 1.2.2).
  *
  * Scoring math (public sklearn formulas):
  *   per tree: leaf depth + c(n_node_samples(leaf)), with
  *   c(n) = 2(ln(n−1)+γ) − 2(n−1)/n (Liu et al., "Isolation Forest").
  *   score(x)    = 2^( −Σ_depths / (n_trees · c(max_samples)) )
  *   decision(x) = −score(x) − offset;  anomaly ⇔ decision < 0.
  *
  * The flattened tree ensemble (~150k int/double array slots) is
  * broadcast once; scoring is a Scala UDF — O(avg depth · 200) per row,
  * embarrassingly parallel, no shuffle. A UDF (not a codegen'd
  * Expression) is the right cost point here: the array-walk dominates
  * and boxing overhead is one struct per row.
  */
object IsoForestScorer {

  /** Euler–Mascheroni constant (c(n) normalization). */
  private val Gamma = 0.5772156649015329

  final case class Tree(left: Array[Int], right: Array[Int], feature: Array[Int],
                        threshold: Array[Double], nNodeSamples: Array[Int])

  final case class Model(featureNames: Array[String], mean: Array[Double],
                         scale: Array[Double], trees: Array[Tree],
                         maxSamples: Int, offset: Double) {
    val cNorm: Double = avgPathLength(maxSamples)

    def decisionFunction(x: Array[Double]): Double = {
      val xs = new Array[Double](x.length)
      var i = 0
      while (i < x.length) { xs(i) = (x(i) - mean(i)) / scale(i); i += 1 }
      var depths = 0.0
      var t = 0
      while (t < trees.length) {
        depths += trees(t).pathDepth(xs)
        t += 1
      }
      val score = math.pow(2.0, -depths / (trees.length * cNorm))
      -score - offset
    }
  }

  implicit final class TreeOps(private val t: Tree) extends AnyVal {
    def pathDepth(x: Array[Double]): Double = {
      var node = 0
      var depth = 0
      while (t.left(node) != -1) {
        node = if (x(t.feature(node)) <= t.threshold(node)) t.left(node) else t.right(node)
        depth += 1
      }
      depth + avgPathLength(t.nNodeSamples(node))
    }
  }

  def avgPathLength(n: Int): Double =
    if (n <= 1) 0.0
    else if (n == 2) 1.0
    else 2.0 * (math.log(n - 1.0) + Gamma) - 2.0 * (n - 1.0) / n

  /** Load the exported model from the bundled resource (or a path). */
  lazy val bundled: Model = {
    val in = getClass.getResourceAsStream("/isoforest_model.json")
    require(in != null, "isoforest_model.json missing from resources")
    try parse(new ObjectMapper().readTree(in)) finally in.close()
  }

  def parse(root: JsonNode): Model = {
    def ints(n: JsonNode): Array[Int] = {
      val a = new Array[Int](n.size); var i = 0
      while (i < a.length) { a(i) = n.get(i).asInt; i += 1 }; a
    }
    def doubles(n: JsonNode): Array[Double] = {
      val a = new Array[Double](n.size); var i = 0
      while (i < a.length) { a(i) = n.get(i).asDouble; i += 1 }; a
    }
    val trees = (0 until root.get("trees").size).map { i =>
      val t = root.get("trees").get(i)
      Tree(ints(t.get("left")), ints(t.get("right")), ints(t.get("feature")),
        doubles(t.get("threshold")), ints(t.get("n_node_samples")))
    }.toArray
    Model(
      (0 until root.get("feature_names").size).map(root.get("feature_names").get(_).asText).toArray,
      doubles(root.get("scaler_mean")), doubles(root.get("scaler_scale")),
      trees, root.get("max_samples").asInt, root.get("offset").asDouble)
  }

  /** Append `score` (decision_function) and `anomaly` columns.
    * Feature columns must match the model's training order
    * ([total_kwh, unique_appliances, rolling_7_mean, dow]).
    */
  def scoreFeatures(df: DataFrame, features: Seq[String] = Seq(
      "total_kwh", "unique_appliances", "rolling_7_mean", "dow")): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(bundled)
    val scoreUdf = udf { (a: Double, b: Double, c: Double, d: Double) =>
      bc.value.decisionFunction(Array(a, b, c, d))
    }
    val cols: Seq[Column] = features.map(f => col(f).cast("double"))
    df.withColumn("score", scoreUdf(cols(0), cols(1), cols(2), cols(3)))
      .withColumn("anomaly", col("score") < 0.0)
  }
}
