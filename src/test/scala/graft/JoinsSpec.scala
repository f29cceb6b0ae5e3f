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
