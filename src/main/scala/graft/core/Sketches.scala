package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Sketch-based approximate aggregation — the single-pass, bounded-
  * memory summaries a 100 TB profile pass uses where exact answers
  * would shuffle the world. Complements the HLL++ distinct counts
  * already in [[TimeSeries.dailyRollupApprox]]:
  *
  *  - Count-Min (frequencies / heavy hitters): fixed eps×delta grid,
  *    merged tree-wise across partitions by Spark; estimates only ever
  *    OVERcount, so `support`-thresholded heavy hitters have no false
  *    negatives.
  *  - Bloom filter (membership): build once on the small/key side,
  *    broadcast into a pre-shuffle filter on the huge side — the
  *    manual form of the runtime bloom-filter join pruning pinned in
  *    `RuntimeFilterSpec`, for when the filter is reused across MANY
  *    queries (e.g. a static denylist) rather than derived per join.
  *  - Approximate quantiles: Greenwald-Khanna with a relative-error
  *    knob, one pass, no sort.
  *
  * All three return driver-side sketch objects a few KB–MB in size —
  * bounded by the sketch parameters, never by the data.
  */
object Sketches {

  /** Count-Min sketch of a string column's value frequencies. */
  def countMin(df: DataFrame, column: String,
               eps: Double = 0.001, confidence: Double = 0.99,
               seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(col(column), eps, confidence, seed)

  /** Heavy hitters by Count-Min: values from a (cheap, pre-aggregated)
    * candidate pass whose ESTIMATED count clears `minCount`. The
    * candidate set must cover the true heavy hitters (CMS alone cannot
    * enumerate); CMS overestimation means no true heavy hitter is
    * dropped.
    */
  def heavyHitters(df: DataFrame, column: String, minCount: Long,
                   sketch: CountMinSketch): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val candidates = df.select(col(column).cast("string")).distinct()
      .as[String].collect() // caller bounds cardinality (post-distinct)
    candidates.map(v => (v, sketch.estimateCount(v)))
      .filter(_._2 >= minCount)
      .toSeq.toDF(column, "est_count")
  }

  /** Bloom filter over a key column. `expectedItems` sets the bit
    * budget; `fpp` the false-positive rate.
    */
  def bloom(df: DataFrame, column: String,
            expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(col(column), expectedItems, fpp)

  /** Filter `df` to rows whose `column` might be in the filter —
    * broadcast-applied before any shuffle; false positives only, so
    * follow with an exact join when exactness matters. Dispatches on
    * the column's type the same way `bloomFilter` hashed it at build
    * time (long for integral keys, string otherwise) — a silent
    * cast-to-long of a string key would null-drop every row.
    */
  def mightContain(df: DataFrame, column: String, bf: BloomFilter): DataFrame = {
    val bcast = df.sparkSession.sparkContext.broadcast(bf)
    import org.apache.spark.sql.types._
    df.schema(column).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val mc = udf((v: Long) => bcast.value.mightContainLong(v))
        df.filter(mc(col(column).cast("long")))
      case StringType =>
        val mc = udf((v: String) => v != null && bcast.value.mightContainString(v))
        df.filter(mc(col(column)))
      case other => throw new IllegalArgumentException(
        s"bloom membership supports integral and string keys, got ${other.catalogString}")
    }
  }

  /** One-pass approximate quantiles (Greenwald-Khanna). */
  def approxQuantiles(df: DataFrame, column: String,
                      probabilities: Array[Double],
                      relativeError: Double = 0.01): Array[Double] =
    df.stat.approxQuantile(column, probabilities, relativeError)
}
