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

  test("intervalOverlapJoin: closed-interval overlap pairs, each emitted " +
      "exactly once even when the pair shares many buckets") {
    val a = Seq(
      (1L, t("2024-01-01 09:30:00"), t("2024-01-01 12:30:00")), // 3h: many shared buckets
      (2L, t("2024-01-01 13:00:00"), t("2024-01-01 13:00:00")), // zero-length point
      (3L, t("2024-01-02 08:00:00"), t("2024-01-02 08:30:00"))  // ends before b starts
    ).toDF("a_id", "a_start", "a_end")
    val b = Seq(
      (10L, t("2024-01-01 10:00:00"), t("2024-01-01 14:00:00")),
      (11L, t("2024-01-02 09:00:00"), t("2024-01-02 10:00:00"))
    ).toDF("b_id", "b_start", "b_end")
    val out = Joins.intervalOverlapJoin(a, b,
        "a_start", "a_end", "b_start", "b_end", bucketSeconds = 3600L)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted
    // interval 1 shares buckets 10:00-12:xx with window 10 but appears ONCE;
    // point 2 lies inside window 10; interval 3 touches nothing
    assert(out.toSeq == Seq((1L, 10L), (2L, 10L)))
  }

  test("intervalOverlapJoin: boundary touch counts (closed semantics) and " +
      "equality keys partition the candidate space") {
    val a = Seq(
      ("x", 1L, t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00")),
      ("y", 2L, t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"))
    ).toDF("k", "a_id", "a_start", "a_end")
    val b = Seq(
      ("x", 10L, t("2024-01-01 11:00:00"), t("2024-01-01 12:00:00")), // touches a1's end
      ("x", 11L, t("2024-01-01 11:00:01"), t("2024-01-01 12:00:00")), // 1s past: no overlap
      ("y", 12L, t("2024-01-01 10:30:00"), t("2024-01-01 10:40:00"))
    ).toDF("k", "b_id", "b_start", "b_end")
    val out = Joins.intervalOverlapJoin(a, b,
        "a_start", "a_end", "b_start", "b_end", keys = Seq("k"))
      .select("k", "a_id", "b_id").as[(String, Long, Long)].collect().sorted
    // key "x": only the exact-touch window 10 matches a1 (closed
    // intervals); key "y": window 12 nests inside a2 — and neither
    // crosses keys despite identical time spans
    assert(out.toSeq == Seq(("x", 1L, 10L), ("y", 2L, 12L)))
    // the surviving frame keeps exactly one copy of the key column
    val cols = Joins.intervalOverlapJoin(a, b,
      "a_start", "a_end", "b_start", "b_end", keys = Seq("k")).columns
    assert(cols.count(_ == "k") == 1)
  }

  test("fuzzyLinkPairs: entity collapse, blocking, threshold, once per pair") {
    import org.apache.spark.sql.functions.{col, split}
    val rows = Seq("hot bolt", "hot bolt", "hot bolt", // 3 rows, 1 entity
      "hot bold",                                      // dist 1 to hot bolt
      "hot plate",                                     // dist 4 to hot bolt
      "cold bolt"                                      // other block
    ).toDF("name")
    val got = Joins.fuzzyLinkPairs(rows, "name",
        split(col("entity"), " ").getItem(0), maxDist = 2)
      .select("entity_1", "entity_2", "dist", "rows_1", "rows_2")
      .as[(String, String, Long, Long, Long)].collect().toSet
    // only (hot bold, hot bolt) survives dist<=2; blocking excludes
    // cold bolt (dist 1 block apart); each pair appears exactly once
    assert(got == Set(("hot bold", "hot bolt", 1L, 1L, 3L)))
    // raising the threshold admits hot plate from the same block
    val loose = Joins.fuzzyLinkPairs(rows, "name",
        split(col("entity"), " ").getItem(0), maxDist = 4)
      .select("entity_1", "entity_2").as[(String, String)].collect().toSet
    assert(loose == Set(("hot bold", "hot bolt"), ("hot bolt", "hot plate")))
    // block-size cap drops the whole oversized block
    val capped = Joins.fuzzyLinkPairs(rows, "name",
        split(col("entity"), " ").getItem(0), maxDist = 4, maxBlockSize = 2)
      .count()
    assert(capped == 0L)
  }

  test("q182 custdist: outer join preserves zero-order customers; " +
    "distribution conserves the customer count") {
    val dist = SparkEntry.queries("q182_custdist")(spark, Sf0001)
      .as[(Long, Long)].collect().toMap
    val nCust = spark.read
      .parquet(s"$Sf0001/customer.parquet").count()
    assert(dist.values.sum == nCust) // every customer in exactly 1 bucket
    // order conservation: Σ c_count·custdist = the non-urgent order
    // count (the synthetic generator gives every customer orders, so
    // the zero bucket that motivates the OUTER join is empty at this
    // sf — conservation still breaks if the join type flips, because
    // an inner join can only be detected once buckets go missing;
    // both scalars together pin the whole distribution)
    val nOrd = spark.read.parquet(s"$Sf0001/orders.parquet")
      .filter($"o_orderpriority" =!= "1-URGENT").count()
    assert(dist.map { case (c, n) => c * n }.sum == nOrd)

    // fixture dir with a zero-order customer and an all-URGENT
    // customer: both must land in the 0 bucket (an inner join, or the
    // priority filter demoted to a WHERE, loses them)
    val fix = java.nio.file.Files
      .createTempDirectory("graft_q182_fix").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$fix/customer.parquet")
    Seq((10L, 1L, "5-LOW"), (11L, 1L, "1-URGENT"), (12L, 3L, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$fix/orders.parquet")
    val fdist = SparkEntry.queries("q182_custdist")(spark, fix)
      .as[(Long, Long)].collect().toMap
    assert(fdist == Map(0L -> 2L, 1L -> 1L))
  }

  test("q183 small-qty: part dim broadcasts; predicate is the exact " +
    "integer cross-multiplication") {
    val df = SparkEntry.queries("q183_small_qty_revenue")(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).nonEmpty, plan)
    val (rev, n) = df.as[(Double, Long)].collect().head
    assert(n > 0 && rev > 0)
    // replay the decorrelated predicate row-by-row on the driver
    val li = spark.read.parquet(s"$Sf0001/lineitem.parquet")
      .join(spark.read.parquet(s"$Sf0001/part.parquet")
        .filter($"p_brand" === "Brand#23"),
        $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity".cast("long"))
      .as[(Long, Long)].collect()
    val byPart = li.groupBy(_._1)
    val expected = li.count { case (pk, q) =>
      val qs = byPart(pk).map(_._2)
      5L * q * qs.length < qs.sum
    }
    assert(n == expected)
  }
}
