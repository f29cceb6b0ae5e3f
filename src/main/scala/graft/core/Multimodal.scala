package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * as opaque BINARY payloads + a typed metadata struct, with
  * decode / feature-extraction / resize / frame-sampling operators.
  *
  * The container ships no codec libraries, so the DECODE step is a
  * clearly-marked deterministic STUB (`StubCodec`) — a fake header
  * parse + byte-chunk features. Everything around it is the real
  * plumbing this pipeline needs at 100 TB:
  *
  *  - schema: payload stays an opaque `BinaryType` column; metadata is
  *    a typed struct; operators never round-trip through strings.
  *  - batch shape: heavy per-row decode runs through `mapPartitions`
  *    (the JVM analogue of a vectorized batch UDF) so a real codec
  *    amortizes init (decoder handles, GPU context) once per
  *    partition, not once per row.
  *  - partitioning: payload tables are processed embarrassingly
  *    parallel; feature output is a flat (id, dim, value) or
  *    fixed-width array column that feeds Similarity.* directly.
  *  - frame sampling: explode-with-stride — one row per sampled frame,
  *    distributed, no driver loop.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** STUB codec — stands in for a real image/audio decoder.
    * "Header": byte 0 -> width/16, byte 1 -> height/16, byte 2 ->
    * frame count; "features": k chunked polynomial byte-hashes scaled
    * to [0,1). Deterministic in the payload alone, so tests and
    * oracles can reproduce it; swap this object for a real codec and
    * nothing else changes.
    */
  object StubCodec {
    def width(payload: Array[Byte]): Int = 16 * ((payload(0) & 0xff) % 64 + 1)
    def height(payload: Array[Byte]): Int = 16 * ((payload(1) & 0xff) % 64 + 1)
    def nFrames(payload: Array[Byte]): Int = (payload(2) & 0xff) % 30 + 1

    /** k features: chunk the payload into k spans, polynomial-hash each
      * span mod 1e9+7, scale into [0,1).
      */
    def features(payload: Array[Byte], k: Int): Array[Float] =
      frameFeatures(payload, 0, k)

    /** Vectorized-call shape: one codec invocation per BATCH of
      * payloads — a real decoder (or a GPU feature extractor) takes
      * the whole batch in one native/device call; the stub just maps.
      * Deterministically identical to per-row [[features]].
      */
    def featuresBatch(payloads: Array[Array[Byte]], k: Int): Array[Array[Float]] =
      payloads.map(features(_, k))

    /** Per-frame variant: the "decode frame f" stub reads the payload
      * rotated by the frame index, so distinct frames of one video get
      * distinct (but deterministic) vectors.
      */
    def frameFeatures(payload: Array[Byte], frame: Int, k: Int): Array[Float] = {
      val out = new Array[Float](k)
      val n = payload.length
      val span = math.max(1, n / k)
      var i = 0
      while (i < k) {
        var h = 0L
        var j = 0
        while (j < span) {
          val idx = (i * span + j + frame) % n
          h = (h * 31 + (payload(idx) & 0xff)) % 1000000007L
          j += 1
        }
        out(i) = (h.toDouble / 1000000007.0).toFloat
        i += 1
      }
      out
    }
  }

  /** Decode metadata from the payload (stub header parse). Batch-shaped:
    * one `mapPartitions` pass, schema-preserving + meta overwrite.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    val out: Dataset[Row] = media.select("media_id", "kind", "payload", "meta")
      .mapPartitions { rows =>
        // per-partition init happens HERE in a real codec
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getLong(0), r.getString(1), payload,
            Row(StubCodec.width(payload), StubCodec.height(payload),
              StubCodec.nFrames(payload), 16000))
        }
      }(enc)
    out
  }

  /** Fixed-dimension feature vector per payload (stub features),
    * per-row UDF shape — kept as the semantic oracle for
    * [[extractFeaturesBatch]].
    */
  def extractFeatures(media: DataFrame, k: Int = 8): DataFrame = {
    val featUdf = udf((payload: Array[Byte]) => StubCodec.features(payload, k))
    media.withColumn("features", featUdf(col("payload")))
  }

  /** Columnar-batch feature extraction: the JVM analogue of
    * `mapInArrow` — one `mapPartitions` pass that (a) does
    * per-PARTITION codec init (decoder handles, GPU context) and then
    * (b) hands the codec `batchSize` payloads per CALL
    * ([[StubCodec.featuresBatch]]), so per-call overhead (JNI
    * crossing, device transfer) amortizes over the batch instead of
    * being paid per row. Output is bit-identical to
    * [[extractFeatures]]; schema = input + `features`.
    */
  def extractFeaturesBatch(media: DataFrame, k: Int = 8,
                           batchSize: Int = 64): DataFrame = {
    val inSchema = media.schema
    val outSchema = inSchema.add(StructField("features", ArrayType(FloatType), nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = inSchema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // per-partition init happens HERE in a real codec
      rows.grouped(batchSize).flatMap { batch =>
        val feats = StubCodec.featuresBatch(
          batch.iterator.map(_.getAs[Array[Byte]](payloadIdx)).toArray, k)
        batch.iterator.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ feats(i).toSeq)
        }
      }
    }(enc)
  }

  /** "Resize": metadata-level transform (a real impl re-encodes the
    * payload; the stub scales the header dims). Shows the
    * schema-stable transform shape.
    */
  def resize(media: DataFrame, maxSide: Int): DataFrame =
    media.withColumn("meta", struct(
      least(col("meta.width"), lit(maxSide)).as("width"),
      least(col("meta.height"), lit(maxSide)).as("height"),
      col("meta.n_frames").as("n_frames"),
      col("meta.sample_rate").as("sample_rate")))

  /** Frame sampling for video rows: one output row per sampled frame
    * index (stride `every`), distributed via sequence+explode — the
    * W2 calendar-densification idiom applied to frames.
    */
  def sampleFrames(media: DataFrame, every: Int): DataFrame =
    media
      .filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(every))))

  /** Frame-level feature table for video search: sample frames, then
    * one feature vector per (media, frame) — rows keyed
    * (media_id, frame_idx) feed Similarity.* directly, e.g. "find the
    * video frame most similar to this one" via cosineTopK.
    */
  def frameFeatureTable(media: DataFrame, every: Int, k: Int = 8): DataFrame = {
    val featUdf = udf((payload: Array[Byte], frame: Int) =>
      StubCodec.frameFeatures(payload, frame, k))
    sampleFrames(media, every)
      .select(col("media_id"), col("frame_idx"),
        featUdf(col("payload"), col("frame_idx")).as("embedding"))
  }

  /** Ingest a directory/glob of raw media FILES into the multimodal
    * schema via Spark's `binaryFile` source — the 100 TB entry point:
    * the scan is split across executors, payloads never touch the
    * driver, and `pathGlobFilter`/length pushdown prune at the source.
    * `media_id` is a deterministic hash of the file path (stable across
    * re-ingests); `kind` derives from the extension; the original path
    * and byte length are kept for lineage.
    */
  def ingestFiles(spark: org.apache.spark.sql.SparkSession, glob: String,
                  globFilter: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    val ext = lower(regexp_extract(col("path"), "\\.([^./\\\\]+)$", 1))
    globFilter.fold(reader)(g => reader.option("pathGlobFilter", g))
      .load(glob)
      .select(
        xxhash64(col("path")).as("media_id"),
        when(ext.isin("jpg", "jpeg", "png", "gif", "bmp"), "image")
          .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
          .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
          .otherwise("binary").as("kind"),
        col("content").as("payload"),
        lit(null).cast(mediaSchema("meta").dataType).as("meta"),
        col("path").as("source_path"),
        col("length").as("n_bytes"))
  }

  /** Deterministic synthetic media table (test/bench input): payload
    * bytes are a keyed xorshift stream — no external data needed.
    */
  def synthesize(spark: org.apache.spark.sql.SparkSession, n: Int,
                 bytesPerRow: Int = 256): DataFrame = {
    import spark.implicits._
    val kinds = Seq("image", "audio", "video")
    spark.range(n).map { id =>
      val rnd = new java.util.Random(id * 2654435761L + 7)
      val payload = new Array[Byte](bytesPerRow)
      rnd.nextBytes(payload)
      (id, kinds((id % 3).toInt), payload)
    }.toDF("media_id", "kind", "payload")
      .withColumn("meta", lit(null).cast(mediaSchema("meta").dataType))
  }
}
