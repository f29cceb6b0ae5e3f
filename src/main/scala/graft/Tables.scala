package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry reads through here so that the scan
  * options (and any future bucketing / caching decisions) live in one
  * place. Parquet + Catalyst give projection/predicate pushdown for free;
  * at 100 TB the same code reads a cloud-storage prefix instead of a
  * local dir — nothing else changes.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  /** `events.ts` has shipped as three different parquet logical types
    * across driver testdata regenerations; normalize all of them to one
    * session-TZ TIMESTAMP so every downstream operator sees one type:
    *  - TIMESTAMP(NANOS): Spark's reader rejects it outright; read as
    *    nanos-since-epoch long (`nanosAsLong`, set in [[configure]]) and
    *    convert with exact integer division (a double path would lose
    *    precision above 2^53).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ: cast
    *    to TIMESTAMP under the UTC session (wall-clock preserved).
    *  - TIMESTAMP(MICROS, adjusted) → already TimestampType.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Set defensively at runtime: the driver calls entry()/queries with
    // its own (unconfigured) session and the confs are session-scoped.
    // The timezone matters for flavor-equivalence: the NTZ→timestamp
    // cast reinterprets the wall-clock in the SESSION zone, so a
    // non-UTC session would shift the micros_ntz flavor against the
    // nanos/adjusted flavors by the zone offset.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // FLOOR division in pure long arithmetic (ts - pmod is always
        // a multiple of 1000): pyarrow's ns→us narrowing floors, while
        // SQL DIV truncates toward zero — they differ on pre-epoch
        // (negative) nanos by 1µs. A floor() through double would lose
        // precision above 2^53 ns (~1970+104 days).
        raw.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000L)) DIV 1000L")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  /** Normalize a column to `want` only when the shipped flavor
    * differs — the common path stays a bare scan (no cast in the way
    * of pushdown), and a regenerated-testdata type drift (the q38
    * incident, but for ints/arrays) lands on one pinned type instead
    * of surprising typed code (`Row.getLong` on an int32 column
    * throws; an encoder on `Array[Float]` breaks on list<double>).
    */
  private def pinType(df: DataFrame, column: String,
                      want: org.apache.spark.sql.types.DataType): DataFrame =
    if (df.schema(column).dataType == want) df
    else df.withColumn(column, col(column).cast(want))

  /** `doc_id`/`n_chars` pinned BIGINT (values compare numerically in
    * the driver gate, so a narrower shipped flavor stays green).
    */
  def documents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val raw = load(spark, dir, "documents")
    pinType(pinType(raw, "doc_id", LongType), "n_chars", LongType)
  }

  /** `vec_id` BIGINT, `embedding` array<float>, `label` INT — the
    * flavors every operator/spec was written against. float32→float64
    * drift casts back exactly (the shipped values are float32-exact).
    */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = load(spark, dir, "embeddings")
    val ided = pinType(pinType(raw, "vec_id", LongType), "label", IntegerType)
    ided.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => ided // nullability flavor is fine
      case _ => ided.withColumn("embedding",
        col("embedding").cast(ArrayType(FloatType)))
    }
  }

  /** Session defaults shared by Verify / Bench / tests.
    *
    * - ANSI off: the reference's ingest semantics are null-on-bad-cast
    *   (`blobToCosmos.py:62-70`); Spark 4 defaults ANSI on, which would
    *   throw instead.
    * - shuffle.partitions sized to the local core count; on a real
    *   cluster this is executor-count-aware (AQE coalesces anyway).
    */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
}
