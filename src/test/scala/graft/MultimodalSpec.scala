package graft

import graft.core.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: schema, partition-batched decode,
  * feature extraction feeding similarity search, frame sampling.
  * The IMAGE path decodes for real (javax.imageio: PNG/BMP round
  * trips with exact pixels); audio/video and non-image payloads use
  * the deterministic stub (no such codec libs in this container).
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

  test("resizeImages: real NN resample through the PNG roundtrip — " +
      "every target pixel equals the integer-mapped source pixel") {
    import graft.core.Multimodal.ImageIoCodec
    val ids = Seq(3L, 7L, 11L).toDF("doc_id")
    val pngs = Multimodal.synthesizeGradientPngs(ids)
    val resized = Multimodal.resizeImages(pngs, 4, 3)
      .select("media_id", "payload").as[(Long, Array[Byte])].collect().toMap
    for (id <- Seq(3L, 7L, 11L)) {
      val (w, h) = ((4 + id % 5).toInt, (3 + id % 4).toInt)
      val img = ImageIoCodec.decode(resized(id)).get
      assert(img.getWidth == 4 && img.getHeight == 3)
      for (x <- 0 until 4; y <- 0 until 3) {
        val (sx, sy) = (x * w / 4, y * h / 3)
        val v = (((id * 31 + 7L * sx + 13L * sy) % 256 + 256) % 256).toInt
        assert((img.getRGB(x, y) & 0xff) == v, s"id $id px ($x,$y)")
      }
    }
    // non-decodable payloads pass through untouched
    val opaque = Seq((99L, "blob", Array[Byte](1, 2, 3)))
      .toDF("media_id", "kind", "payload")
    val through = Multimodal.resizeImages(opaque, 4, 3)
      .select("payload").as[Array[Byte]].head()
    assert(through.toSeq == Seq[Byte](1, 2, 3))
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

  test("real codec: gradient PNG decodes via javax.imageio with exact pixels") {
    val id = 7L
    val png = Multimodal.ImageIoCodec.gradientPng(id)
    // genuine PNG magic — any image tool could open this payload
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val img = Multimodal.ImageIoCodec.decode(png).get
    assert(img.getWidth == (4 + id % 5).toInt && img.getHeight == (3 + id % 4).toInt)
    // every decoded pixel equals the generator formula (lossless roundtrip)
    for (x <- 0 until img.getWidth; y <- 0 until img.getHeight) {
      val v = ((id * 31 + 7 * x + 13 * y) % 256).toInt
      assert((img.getRGB(x, y) & 0xff) == v, s"pixel ($x,$y)")
    }
    // strip features match an independent scala computation
    val feats = Multimodal.ImageIoCodec.gridFeatures(img, 4)
    val (w, h) = (img.getWidth, img.getHeight)
    val expect = (0 until 4).map { i =>
      val vals = for (x <- (i * w / 4) until ((i + 1) * w / 4); y <- 0 until h)
        yield ((id * 31 + 7 * x + 13 * y) % 256).toDouble
      vals.sum / (255.0 * vals.size)
    }
    feats.zip(expect).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("real codec: BMP decodes too; dispatch keeps the stub for non-images") {
    val img = new java.awt.image.BufferedImage(6, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 6; y <- 0 until 5)
      img.setRGB(x, y, ((x * 40) << 16) | ((y * 50) << 8) | 17)
    val bmp = Multimodal.ImageIoCodec.encode(img, "bmp")
    val (w, h, nf, _) = Multimodal.MediaCodec.meta("image", bmp)
    assert((w, h, nf) == (6, 5, 1))
    val viaDispatch = Multimodal.MediaCodec.features("image", bmp, 3).toSeq
    val direct = Multimodal.ImageIoCodec
      .gridFeatures(Multimodal.ImageIoCodec.decode(bmp).get, 3).map(_.toFloat).toSeq
    assert(viaDispatch == direct)
    // non-image payload falls back to the stub byte-for-byte
    val junk = Array.tabulate[Byte](32)(i => (i * 11 + 3).toByte)
    assert(Multimodal.MediaCodec.features("image", junk, 4).toSeq ==
      Multimodal.StubCodec.features(junk, 4).toSeq)
    assert(Multimodal.MediaCodec.meta("audio", junk) ==
      (Multimodal.StubCodec.width(junk), Multimodal.StubCodec.height(junk),
        Multimodal.StubCodec.nFrames(junk), 16000))
  }

  test("real video codec: animated GIF roundtrips every frame's exact pixels") {
    val id = 11L
    val frames = Multimodal.ImageIoCodec.gradientGifFrames(id)
    val gif = Multimodal.ImageIoCodec.encodeAnimatedGif(frames)
    // genuine GIF89a magic — any player could open this payload
    assert(gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F' && gif(3) == '8')
    val decoded = Multimodal.ImageIoCodec.decodeFrames(gif).get
    assert(decoded.length == (2 + id % 4).toInt, "real frame count from the stream")
    val (w, h) = ((4 + id % 5).toInt, (3 + id % 4).toInt)
    for (f <- decoded.indices; x <- 0 until w; y <- 0 until h) {
      val v = ((id * 31 + 7 * x + 13 * y + 19 * f) % 256).toInt
      assert((decoded(f).getRGB(x, y) & 0xff) == v, s"frame $f pixel ($x,$y)")
    }
    // meta dispatch: video kind gets the REAL frame count, not the stub
    val (mw, mh, nf, _) = Multimodal.MediaCodec.meta("video", gif)
    assert((mw, mh, nf) == (w, h, decoded.length))
    // non-GIF video payload still falls back to the stub header parse
    val junk = Array.tabulate[Byte](32)(i => (i * 13 + 5).toByte)
    assert(Multimodal.MediaCodec.meta("video", junk) ==
      (Multimodal.StubCodec.width(junk), Multimodal.StubCodec.height(junk),
        Multimodal.StubCodec.nFrames(junk), 16000))
  }

  test("real video distributed: frame-sampled features from real GIF decode") {
    import spark.implicits._
    val ids = spark.range(0, 24).select(col("id").as("doc_id"))
    val media = Multimodal.synthesizeGradientGifs(ids)
    val feats = Multimodal.videoFrameFeatures(media, every = 2, k = 4)
      .as[(Long, Long, Long, Double)].collect()
    // every id contributes ceil(nf/2) sampled frames x k dims
    val expectRows = (0L until 24L).map(id => ((2 + id % 4) + 1) / 2 * 4).sum
    assert(feats.length == expectRows)
    // sampled frame indices are even; features match an independent
    // per-pixel computation from the generator formula
    assert(feats.forall(_._2 % 2 == 0))
    feats.filter(r => r._1 == 5L).foreach { case (id, f, d, v) =>
      val (w, h) = ((4 + id % 5).toInt, (3 + id % 4).toInt)
      val vals = for (x <- (d.toInt * w / 4) until ((d.toInt + 1) * w / 4); y <- 0 until h)
        yield ((id * 31 + 7 * x + 13 * y + 19 * f) % 256).toDouble
      assert(math.abs(v - vals.sum / (255.0 * vals.size)) < 1e-12)
    }
  }

  test("codec seam: multi-page TIFF payloads flow through the SAME video operators") {
    import spark.implicits._
    val id = 9L
    val frames = Multimodal.ImageIoCodec.gradientGifFrames(id)
    val tiff = Multimodal.ImageIoCodec.encodeMultipageTiff(frames)
    assert(tiff(0) == 0x49 || tiff(0) == 0x4d, "genuine TIFF magic")
    // exact per-frame pixel roundtrip through the shared decodeFrames
    val dec = Multimodal.ImageIoCodec.decodeFrames(tiff).get
    assert(dec.length == frames.length)
    val (w, h) = ((4 + id % 5).toInt, (3 + id % 4).toInt)
    for (f <- dec.indices; x <- 0 until w; y <- 0 until h)
      assert((dec(f).getRGB(x, y) & 0xff) ==
        ((id * 31 + 7 * x + 13 * y + 19 * f) % 256).toInt, s"frame $f ($x,$y)")
    // identical features whether the container is GIF or TIFF —
    // videoFrameFeatures never changed for the second container
    val ids = spark.range(0, 6).select(col("id").as("doc_id"))
    val asTiff = ids.select(col("doc_id").cast("long")).as[Long]
      .map(i => (i, "video",
        Multimodal.ImageIoCodec.encodeMultipageTiff(
          Multimodal.ImageIoCodec.gradientGifFrames(i))))
      .toDF("media_id", "kind", "payload")
    val viaTiff = Multimodal.videoFrameFeatures(asTiff, every = 2, k = 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2, r._3))
    val viaGif = Multimodal.videoFrameFeatures(
        Multimodal.synthesizeGradientGifs(ids), every = 2, k = 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2, r._3))
    assert(viaTiff.nonEmpty && viaTiff.toSeq == viaGif.toSeq)
  }

  test("frameFeatureTable: real GIF frames agree with videoFrameFeatures") {
    import spark.implicits._
    val ids = spark.range(0, 8).select(col("id").as("doc_id"))
    val media = Multimodal.decodeMeta(
      Multimodal.synthesizeGradientGifs(ids).withColumn("meta",
        lit(null).cast(Multimodal.mediaSchema("meta").dataType)))
    // meta carries the REAL frame count, so sampleFrames strides over
    // actual frames and the per-row UDF decodes the same pixels the
    // long-form operator does
    val viaTable = Multimodal.frameFeatureTable(media, every = 2, k = 4)
      .select(col("media_id"), col("frame_idx"),
        posexplode(col("embedding")).as(Seq("dim", "feature")))
      .as[(Long, Int, Int, Float)].collect()
      .map { case (m, f, d, v) => ((m, f.toLong, d.toLong), v) }.toMap
    val viaLong = Multimodal.videoFrameFeatures(media, every = 2, k = 4)
      .as[(Long, Long, Long, Double)].collect()
    assert(viaLong.nonEmpty && viaLong.length == viaTable.size)
    viaLong.foreach { case (m, f, d, v) =>
      assert(math.abs(viaTable((m, f, d)) - v) < 1e-6, s"($m,$f,$d)")
    }
  }

  test("real codec distributed: synthesized PNGs -> real meta + features, batch == per-row") {
    val ids = spark.range(1, 21).toDF("doc_id")
    val pngs = Multimodal.synthesizeGradientPngs(ids)
      .withColumn("meta", lit(null).cast(Multimodal.mediaSchema("meta").dataType))
    // decodeMeta takes the REAL path: generator dims are 4..8 x 3..6,
    // which the stub (multiples of 16, >= 16) can never produce
    val metas = Multimodal.decodeMeta(pngs)
      .select($"meta.width", $"meta.height", $"meta.n_frames").collect()
    assert(metas.forall(r =>
      r.getInt(0) >= 4 && r.getInt(0) <= 8 && r.getInt(1) >= 3 && r.getInt(1) <= 6
        && r.getInt(2) == 1))
    // per-row and batch feature extraction agree bit-for-bit on real images
    val perRow = Multimodal.extractFeatures(pngs, k = 4)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    val batched = Multimodal.extractFeaturesBatch(pngs, k = 4, batchSize = 7)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(perRow == batched)
    // and both equal the double-precision grid features (to float)
    val grid = Multimodal.imageGridFeatures(pngs, k = 4)
      .groupBy("media_id").agg(collect_list(struct($"dim", $"feature")).as("fs"))
      .as[(Long, Seq[(Long, Double)])].collect()
      .map { case (id, fs) => id -> fs.sortBy(_._1).map(_._2.toFloat).toSeq }.toMap
    assert(perRow == grid)
  }

  test("real audio codec: tone WAV roundtrips exact samples; dispatch + fallback") {
    val id = 11L
    val wav = Multimodal.AudioIoCodec.toneWav(id)
    assert(Multimodal.AudioIoCodec.looksLikeWav(wav))
    val (rate, samples) = Multimodal.AudioIoCodec.decode(wav).get
    assert(rate == 8000)
    assert(samples.length == (400 + id % 100).toInt)
    samples.zipWithIndex.foreach { case (s, t) =>
      assert(s == ((id * 31 + t * 17) % 4093 - 2046).toShort, s"sample $t")
    }
    // MediaCodec dispatch: real meta + features for decodable audio
    val (_, _, nf, sr) = Multimodal.MediaCodec.meta("audio", wav)
    assert(nf == samples.length && sr == 8000)
    val f = Multimodal.MediaCodec.features("audio", wav, 4).toSeq
    assert(f == Multimodal.AudioIoCodec
      .windowFeatures(samples, 4).map(_.toFloat).toSeq)
    // non-WAV payload falls back to the stub byte-for-byte
    val junk = Array.tabulate[Byte](32)(i => (i * 5 + 1).toByte)
    assert(Multimodal.MediaCodec.features("audio", junk, 4).toSeq ==
      Multimodal.StubCodec.features(junk, 4).toSeq)
    // distributed: synthesized WAVs -> features via the real decode path
    val feats = Multimodal.audioWindowFeatures(
      Multimodal.synthesizeToneWavs(spark.range(1, 11).toDF("doc_id")), k = 4)
    assert(feats.count() == 40)
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

  test("flip/crop index maps: double flip is the identity, crop is " +
      "pixel-exact, augment passes through opaque and undersized rows") {
    import graft.core.Multimodal.ImageIoCodec
    val img = ImageIoCodec.decode(ImageIoCodec.gradientPng(7L)).get
    val (w, h) = (img.getWidth, img.getHeight)
    // flip twice through a lossless PNG roundtrip = original pixels
    val ff = ImageIoCodec.decode(ImageIoCodec.encode(
      ImageIoCodec.flipHorizontal(ImageIoCodec.flipHorizontal(img)),
      "png")).get
    for (x <- 0 until w; y <- 0 until h)
      assert(ff.getRGB(x, y) == img.getRGB(x, y), s"($x,$y)")
    // crop: out(x,y) == src(x0+x, y0+y) exactly
    val crop = ImageIoCodec.cropCenter(img, 3, 2)
    val (x0, y0) = ((w - 3) / 2, (h - 2) / 2)
    for (x <- 0 until 3; y <- 0 until 2)
      assert(crop.getRGB(x, y) == img.getRGB(x0 + x, y0 + y), s"($x,$y)")
    // opaque payloads and images smaller than the crop pass through
    val media = Seq(
      (1L, "image", ImageIoCodec.gradientPng(1L)),
      (2L, "blob", Array[Byte](1, 2, 3)),
      (3L, "image", ImageIoCodec.encode(
        ImageIoCodec.cropCenter(img, 2, 2), "png"))) // 2x2 < 4x3 crop
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.augmentImages(media, 4, 3)
      .select("media_id", "payload")
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(out(1)._2.toSeq == Seq[Byte](1, 2, 3), "opaque must pass through")
    val keptSmall = ImageIoCodec.decode(out(2)._2).get
    assert(keptSmall.getWidth == 2 && keptSmall.getHeight == 2,
      "undersized image must pass through")
    val augmented = ImageIoCodec.decode(out(0)._2).get
    assert(augmented.getWidth == 4 && augmented.getHeight == 3)
  }

  test("reverseAudio: sample-exact index reversal through the codec, " +
      "double reverse is the identity, non-WAV passes through") {
    import graft.core.Multimodal.AudioIoCodec
    val wav = AudioIoCodec.toneWav(7L)
    val (rate, orig) = AudioIoCodec.decode(wav).get
    val media = Seq(
      (7L, "audio", wav),
      (8L, "blob", Array[Byte](9, 8, 7)))
      .toDF("media_id", "kind", "payload")
    val once = Multimodal.reverseAudio(media)
    val out = once.select("media_id", "payload")
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    // reversed(t) == orig(n-1-t), rate preserved, PCM lossless
    val (rRate, rev) = AudioIoCodec.decode(out(0)._2).get
    assert(rRate == rate)
    assert(rev.toSeq == orig.reverse.toSeq)
    // opaque payload byte-for-byte untouched
    assert(out(1)._2.toSeq == Seq[Byte](9, 8, 7))
    // reverse twice through two real WAV roundtrips = original samples
    val twice = Multimodal.reverseAudio(once)
      .filter($"media_id" === 7L)
      .select("payload").as[Array[Byte]].head()
    assert(AudioIoCodec.decode(twice).get._2.toSeq == orig.toSeq)
  }

  test("audioFrameEnergies + vadSegments: hand-computed energies, " +
      "tail drop, island merge/split, undecodable dropped") {
    import graft.core.Multimodal.AudioIoCodec
    // 11 samples, frame size 4 -> 2 full frames, 3 tail samples dropped
    // frame 0: |10|+|−20|+|30|+|−40| = 100; frame 1: 4*100 = 400
    val samples = Array[Short](10, -20, 30, -40, 100, -100, 100, -100, 7, 7, 7)
    val media = Seq(
      (1L, "audio", AudioIoCodec.encodeWav(8000, samples)),
      (2L, "blob", Array[Byte](1, 2, 3)))
      .toDF("media_id", "kind", "payload")
    val en = Multimodal.audioFrameEnergies(media, frameSize = 4)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(en.toSeq == Seq((1L, 0L, 100L), (1L, 1L, 400L)))
    // islands: frames 0,1,2 active / 3 gap / 4,5 active -> two segments
    val frames = Seq(
      (9L, 0L, 500L), (9L, 1L, 600L), (9L, 2L, 700L),
      (9L, 3L, 10L), (9L, 4L, 800L), (9L, 5L, 900L),
      (8L, 0L, 50L)) // doc 8 entirely below threshold -> no rows
      .toDF("media_id", "frame", "energy")
    val segs = Multimodal.vadSegments(frames, threshold = 100L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(segs.toSeq == Seq(
      (9L, 0L, 2L, 3L, 1800L),
      (9L, 4L, 5L, 2L, 1700L)))
    // partition invariance: the grouped shape is shuffle-order-free
    val segs7 = Multimodal.vadSegments(frames.repartition(7), threshold = 100L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(segs7.toSeq == segs.toSeq)
  }

  test("dHash64: known bit pattern on a 9x8 image (resize is the " +
      "identity at target dims), flip changes the hash") {
    import graft.core.Multimodal.ImageIoCodec
    // gray ramp increasing in x: every lum(x+1,y) > lum(x,y) -> all 64 bits
    val ramp = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 9; y <- 0 until 8) {
      val v = x * 20
      ramp.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    assert(ImageIoCodec.dHash64(ramp) == -1L) // all 64 bits set
    // decreasing ramp -> no bit set
    val fl = ImageIoCodec.flipHorizontal(ramp)
    assert(ImageIoCodec.dHash64(fl) == 0L)
    // one ascent at x==3 on row y==2 only -> exactly bit 2*8+3
    val one = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 9; y <- 0 until 8) {
      val v = if (y == 2 && x >= 4) 200 else 100
      one.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    assert(ImageIoCodec.dHash64(one) == (1L << 19))
    // hash survives a real PNG roundtrip (lossless)
    val rt = ImageIoCodec.decode(ImageIoCodec.encode(one, "png")).get
    assert(ImageIoCodec.dHash64(rt) == (1L << 19))
  }

  test("dhashNearDupPairs: pigeonhole losslessness vs brute force at " +
      "maxDist=3, cap drops only oversized-bucket pairs") {
    // hashes engineered around band boundaries: bits 0-15 band 0, etc.
    val hs = Seq(
      (1L, 0L),                       // zero
      (2L, 7L),                       // ham(1,2)=3, all in band 0
      (3L, 1L | (1L << 16) | (1L << 32)), // ham(1,3)=3 across 3 bands
      (4L, 1L | (1L << 16) | (1L << 32) | (1L << 48)), // ham(1,4)=4: out
      (5L, java.lang.Long.parseUnsignedLong("ffffffffffffffff", 16)),
      (6L, -1L ^ (1L << 63)))         // ham(5,6)=1 in the sign band
      .toDF("media_id", "dhash")
    val got = Multimodal.dhashNearDupPairs(hs, maxDist = 3)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // brute force over all 15 pairs
    val m = Map(1L -> 0L, 2L -> 7L,
      3L -> (1L | (1L << 16) | (1L << 32)),
      4L -> (1L | (1L << 16) | (1L << 32) | (1L << 48)),
      5L -> -1L, 6L -> (-1L ^ (1L << 63)))
    val brute = (for {
      a <- m.keys; b <- m.keys if a < b
      d = java.lang.Long.bitCount(m(a) ^ m(b)) if d <= 3
    } yield (a, b, d.toLong)).toSeq.sortBy(r => (r._1, r._2))
    assert(got.toSeq == brute,
      s"banded must equal brute force: ${got.toSeq} vs $brute")
    assert(brute.contains((5L, 6L, 1L)), "sign-band pair must survive")
    // cap=2: the size-3 band-3 bucket {1,2,3} is dropped, so (1,3)
    // (which shares ONLY band 3) is lost, while (1,2)/(3,4)/(5,6)
    // survive via their size-2 buckets in bands 0-2 — subset-only
    val capped = Multimodal.dhashNearDupPairs(hs, maxDist = 3, maxBandSize = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L, 3L), (3L, 4L, 1L), (5L, 6L, 1L)),
      s"capped must lose exactly the band-3-only pair: $capped")
    assert(capped.subsetOf(got.toSet), "capped output must be a subset")
  }

  test("audioFingerprint64: energy-delta bits at frameSize 1, short " +
      "and undecodable payloads dropped") {
    import graft.core.Multimodal.AudioIoCodec
    // frameSize 1: energy(f) = |sample(f)|. 66 samples; |s| strictly
    // ascends at even f -> bit set at even positions 0..62 only
    val s1 = Array.tabulate[Short](66) { t =>
      val base = (t / 2 + 1) * 10
      (if (t % 2 == 0) -(base + 5) else base).toShort
    }
    // |s1|: 15,10, 25,20, 35,30, ... -> e(2k)=10k+15 > e(2k-1)=10k
    // and e(2k+1)=10k+10 < e(2k)=10k+15: bit f set iff f odd... check
    // f even: e(f+1) < e(f) -> 0; f odd: e(f+1) > e(f) -> 1
    val expected = (0 until 64).filter(_ % 2 == 1)
      .foldLeft(0L)((h, b) => h | (1L << b))
    val media = Seq(
      (1L, "audio", AudioIoCodec.encodeWav(8000, s1)),
      (2L, "audio", AudioIoCodec.encodeWav(8000, Array.fill[Short](64)(9))),
      (3L, "blob", Array[Byte](1, 2)))
      .toDF("media_id", "kind", "payload")
    val fps = Multimodal.audioFingerprint64(media, frameSize = 1)
      .as[(Long, Long)].collect().toMap
    assert(fps.keySet == Set(1L), "short/undecodable payloads drop")
    assert(fps(1L) == expected,
      f"fingerprint ${fps(1L)}%016x vs expected $expected%016x")
  }

  test("patchifyImages: exact patch sums through a real PNG roundtrip, " +
      "ragged edges dropped, opaque payloads contribute nothing") {
    // id = 1: w = 4 + 1%5 = 5, h = 3 + 1%4 = 4 -> 2x2 patches give a
    // 2-col x 2-row grid; column x = 4 (the ragged edge) never counts
    val ids = Seq(1L).toDF("doc_id")
    val media = Multimodal.synthesizeGradientPngs(ids)
      .unionByName(Seq((99L, "blob", Array[Byte](1, 2, 3)))
        .toDF("media_id", "kind", "payload"))
    val got = Multimodal.patchifyImages(media, p = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, r, c, s) => ((id, r, c), s) }.toMap
    def px(id: Long, x: Long, y: Long) = ((id * 31 + 7 * x + 13 * y) % 256 + 256) % 256
    val expected = (for { r <- 0L until 2L; c <- 0L until 2L } yield
      ((1L, r, c), px(1, c * 2, r * 2) + px(1, c * 2 + 1, r * 2)
        + px(1, c * 2, r * 2 + 1) + px(1, c * 2 + 1, r * 2 + 1))).toMap
    assert(got == expected, s"$got vs $expected")
  }
}
