package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Multimodal, Similarity}

/** Drives the multimodal pipeline end-to-end at the library surface:
  * synthesize binary payloads -> decode meta (mapPartitions batch) ->
  * resize -> frame-sample -> feature-extract -> ANN over the features.
  * Local verification tool — not part of the driver contract.
  */
object MediaSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val media = Multimodal.synthesize(spark, 300)
    val decoded = Multimodal.decodeMeta(media)
    println(s"[media-smoke] decoded=${decoded.count()} " +
      s"kinds=${decoded.groupBy("kind").count().collect().toSeq.sortBy(_.getString(0)).mkString(",")}")
    val resized = Multimodal.resize(decoded, 128)
    println(s"[media-smoke] resized>128 = " +
      resized.filter($"meta.width" > 128).count())
    val frames = Multimodal.sampleFrames(decoded, every = 4)
    println(s"[media-smoke] sampled frames=${frames.count()}")
    val feats = Multimodal.extractFeatures(media, k = 8)
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val ann = Similarity.cosineTopK(feats.filter($"vec_id" < 4), feats, k = 3)
    ann.show(12, false)
    println(s"[media-smoke] ann rows=${ann.count()} OK")

    // frame-level search: sample frames, embed each, nearest frames
    val frameVecs = Multimodal.frameFeatureTable(decoded, every = 6)
    println(s"[media-smoke] frame vectors=${frameVecs.count()}")
    val fvecs = frameVecs.select(
      concat_ws(":", $"media_id", $"frame_idx").as("vec_id"), $"embedding")
    Similarity.cosineTopK(fvecs.limit(2), fvecs, k = 2).show(4, false)
    spark.stop()
  }
}
