package graft

import java.sql.Timestamp
import graft.core.Joins
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asofBackward: latest right row at or before left ts, per key") {
    val quotes = Seq(
      ("A", t("2024-01-01 10:00:00"), 100.0),
      ("A", t("2024-01-01 10:05:00"), 101.0),
      ("A", t("2024-01-01 10:10:00"), 102.0),
      ("B", t("2024-01-01 10:03:00"), 50.0)
    ).toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", t("2024-01-01 10:04:00"), 1L), // -> 100.0
      ("A", t("2024-01-01 10:05:00"), 2L), // exact tie -> 101.0 (<=)
      ("A", t("2024-01-01 10:20:00"), 3L), // -> 102.0
      ("B", t("2024-01-01 10:00:00"), 4L), // before any quote -> null
      ("C", t("2024-01-01 10:00:00"), 5L)  // no quotes at all -> null
    ).toDF("sym", "tts", "trade_id")

    val expected = Map(1L -> Some(100.0), 2L -> Some(101.0),
      3L -> Some(102.0), 4L -> None, 5L -> None)
    val got = Joins.asofBackward(trades, quotes,
      leftKey = "sym", rightKey = "sym",
      leftTs = $"tts", rightTs = $"qts", valueCols = Seq("px"))
      .select($"trade_id", $"px").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == expected)

    // custom-plan implementation: identical semantics
    val native = Joins.asofBackwardNative(trades, quotes,
      leftKey = "sym", rightKey = "sym",
      leftTs = $"tts", rightTs = $"qts", valueCols = Seq("px"))
      .select($"trade_id", $"px").as[(Long, Option[Double])]
      .collect().toMap
    assert(native == expected)
  }

  test("asofBackward is row-atomic when right value columns hold nulls") {
    // The matched (latest) quote for trade 1 has px=NULL, bid=49.0 —
    // the as-of must emit that ROW's null px, never back-fill px from
    // the older 10:00 quote (which would mix columns of two rows).
    val quotes = Seq(
      ("A", t("2024-01-01 10:00:00"), Some(100.0), Some(48.0)),
      ("A", t("2024-01-01 10:05:00"), None, Some(49.0))
    ).toDF("sym", "qts", "px", "bid")
    val trades = Seq(
      ("A", t("2024-01-01 10:06:00"), 1L),
      ("A", t("2024-01-01 10:01:00"), 2L)  // -> (100.0, 48.0)
    ).toDF("sym", "tts", "trade_id")
    val expected = Map(
      1L -> (None, Some(49.0)),
      2L -> (Some(100.0), Some(48.0)))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"trade_id", $"px", $"bid")
      .as[(Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val composed = canon(Joins.asofBackward(trades, quotes,
      "sym", "sym", $"tts", $"qts", Seq("px", "bid")))
    assert(composed == expected, s"composed mixed rows: $composed")
    val native = canon(Joins.asofBackwardNative(trades, quotes,
      "sym", "sym", $"tts", $"qts", Seq("px", "bid")))
    assert(native == expected, s"native mixed rows: $native")
  }

  test("rangeJoin: bucketed join == naive equi-join+filter, any bucket width") {
    val ev = Tables.events(spark, Sf0001)
    val anchors = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("anchor_id"), col("user_id").as("a_user"),
        col("ts").as("a_ts"))
      .withColumn("a_end", col("a_ts") + expr("INTERVAL 2 HOURS"))
    val naive = ev.join(anchors,
        col("user_id") === col("a_user") &&
          col("ts") >= col("a_ts") && col("ts") < col("a_end"))
      .select("event_id", "anchor_id").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    for (width <- Seq(60L, 3600L, 86400L)) {
      val got = graft.core.Joins.rangeJoin(ev,
          anchors.withColumnRenamed("a_user", "user_id"),
          "user_id", "user_id", "ts", "a_ts", "a_end", bucketSeconds = width)
        .select("event_id", "anchor_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate matches at width $width")
      assert(got.toSet == naive, s"mismatch at bucket width $width")
    }
  }

  test("rangeJoin boundary semantics: start inclusive, end exclusive") {
    val pts = Seq((1L, "k", "2024-01-01 10:00:00"),
      (2L, "k", "2024-01-01 11:00:00"),
      (3L, "k", "2024-01-01 10:30:00"),
      (4L, "other", "2024-01-01 10:30:00"))
      .toDF("pid", "key", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val iv = Seq(("w1", "k", "2024-01-01 10:00:00", "2024-01-01 11:00:00"))
      .toDF("wid", "key", "s", "e")
      .withColumn("s", col("s").cast("timestamp"))
      .withColumn("e", col("e").cast("timestamp"))
    val got = graft.core.Joins.rangeJoin(pts, iv, "key", "key", "ts", "s", "e",
        bucketSeconds = 600L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 3L)) // 2 excluded (end), 4 excluded (key)
  }

  test("native as-of exec == composed as-of on the sf0.001 tables") {
    val ev = Tables.events(spark, Sf0001).select($"event_id", $"user_id", $"ts")
    val o = Tables.orders(spark, Sf0001)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max("o_totalprice").as("best_price"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_id", $"best_price").as[(Long, Option[Double])]
      .collect().toMap
    val composed = canon(Joins.asofBackward(ev, o, "user_id", "o_custkey",
      $"ts", $"o_orderdate", Seq("o_orderdate", "best_price")))
    val native = canon(Joins.asofBackwardNative(ev, o, "user_id", "o_custkey",
      $"ts", $"o_orderdate", Seq("o_orderdate", "best_price")))
    assert(native == composed)
    assert(native.size == 1000)
  }
}
