package graft

import graft.core.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: schema, partition-batched decode,
  * feature extraction feeding similarity search, frame sampling.
  * The codec is a deterministic stub (no image/audio libs in this
  * container) — the Spark-side shapes are the real thing.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.synthesize(spark, 60)

  test("decodeMeta: mapPartitions decode fills the typed meta struct deterministically") {
    val decoded = Multimodal.decodeMeta(media)
    assert(decoded.schema("payload").dataType.typeName == "binary")
    assert(decoded.filter($"meta.width".isNull).count() == 0)
    val twice = Multimodal.decodeMeta(media)
    val a = decoded.select("media_id", "meta.width", "meta.height").collect().toSet
    val b = twice.select("media_id", "meta.width", "meta.height").collect().toSet
    assert(a == b)
    val w = decoded.select(min("meta.width"), max("meta.width")).head()
    assert(w.getInt(0) >= 16 && w.getInt(1) <= 1024)
  }

  test("extractFeatures: fixed-dim vectors in [0,1) feed cosine top-k directly") {
    val feats = Multimodal.extractFeatures(media, k = 8)
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    assert(feats.filter(size($"embedding") =!= 8).count() == 0)
    val top = Similarity.cosineTopK(feats.filter($"vec_id" < 3), feats, k = 2)
    assert(top.count() == 6)
    assert(top.filter($"cosine" > 1.0001 || $"cosine" < -1.0001).count() == 0)
  }

  test("resize caps meta dims, payload untouched") {
    val decoded = Multimodal.decodeMeta(media)
    val resized = Multimodal.resize(decoded, maxSide = 64)
    assert(resized.filter($"meta.width" > 64 || $"meta.height" > 64).count() == 0)
    val before = decoded.select("media_id", "payload").as[(Long, Array[Byte])]
      .collect().map { case (i, p) => i -> p.toSeq }.toMap
    val after = resized.select("media_id", "payload").as[(Long, Array[Byte])]
      .collect().map { case (i, p) => i -> p.toSeq }.toMap
    assert(before == after)
  }

  test("frame features: per-frame vectors are distinct and ANN-ready") {
    val decoded = Multimodal.decodeMeta(media)
    val frames = Multimodal.frameFeatureTable(decoded, every = 3, k = 8)
    assert(frames.filter(size($"embedding") =!= 8).count() == 0)
    // frames of the same video differ (the stub rotates by frame_idx)
    val perVideo = frames.groupBy("media_id")
      .agg(countDistinct($"embedding").as("nd"), count(lit(1)).as("n"))
    assert(perVideo.filter($"nd" =!= $"n").count() == 0)
    // frame-level similarity search: top-2 neighbors per query frame
    val vecs = frames.select(
      concat_ws(":", $"media_id", $"frame_idx").as("vec_id"), $"embedding")
    val q = vecs.limit(3)
    val top = graft.core.Similarity.cosineTopK(q, vecs, k = 2)
    assert(top.count() == 6)
  }

  test("ingestFiles: binaryFile source -> multimodal schema, kind by extension") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    val img = Array[Byte](17, 42, 3, 9, 100, -5, 8, 77)
    val wav = Array.tabulate(32)(i => (i * 7 + 1).toByte)
    java.nio.file.Files.write(dir.resolve("a.png"), img)
    java.nio.file.Files.write(dir.resolve("b.wav"), wav)
    java.nio.file.Files.write(dir.resolve("c.mp4"), Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(dir.resolve("notes.txt"), "hi".getBytes)
    val media = graft.core.Multimodal.ingestFiles(spark, dir.toString)
    val byKind = media.select("kind", "payload", "n_bytes")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Array[Byte]](1), r.getLong(2))).toMap
    assert(byKind.keySet == Set("image", "audio", "video", "binary"))
    assert(byKind("image")._1.toSeq == img.toSeq && byKind("image")._2 == img.length)
    assert(byKind("audio")._1.toSeq == wav.toSeq)
    // ids are deterministic across re-ingests
    val again = graft.core.Multimodal.ingestFiles(spark, dir.toString)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(again == media.select("media_id").as[Long].collect().sorted.toSeq)
    // glob filter prunes at the source
    val onlyPng = graft.core.Multimodal.ingestFiles(spark, dir.toString,
      globFilter = Some("*.png"))
    assert(onlyPng.count() == 1)
    // ingested rows run straight through the codec operators
    val feats = graft.core.Multimodal.extractFeatures(
      graft.core.Multimodal.decodeMeta(
        onlyPng.select("media_id", "kind", "payload", "meta")), k = 4)
      .select("features").as[Seq[Float]].head()
    assert(feats == graft.core.Multimodal.StubCodec.features(img, 4).toSeq)
  }

  test("sampleFrames: one row per stride-sampled frame, video only") {
    val decoded = Multimodal.decodeMeta(media)
    val frames = Multimodal.sampleFrames(decoded, every = 5)
    assert(frames.select("kind").distinct().as[String].collect().toSeq == Seq("video"))
    // expected rows per video = ceil(n_frames / 5) = floor((n-1)/5)+1
    val expected = decoded.filter($"kind" === "video")
      .select(floor(($"meta.n_frames" - 1) / 5) + 1)
      .as[Long].collect().sum
    assert(frames.count() == expected)
  }
}
