package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.types.TimestampType

/** Guards against driver-testdata timestamp logical-type drift.
  *
  * `events.ts` has shipped as TIMESTAMP(NANOS) (rounds <=5) and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 6) across driver
  * regenerations; the r6 flavor reached `sessionize`'s numeric cast as
  * TIMESTAMP_NTZ and broke q38 without any spec noticing, because every
  * spec built events in-memory (VERDICT r6 #1). This suite replays every
  * events-consuming gate query against checked-in parquet fixtures of all
  * three flavors (tools/gen_events_ts_fixtures.py) and requires identical
  * results, so `Tables.events` normalization can never silently regress
  * for one flavor again.
  */
class EventsTsFixtureSpec extends SparkSpec {

  private val variants = Seq("micros_ntz", "micros_utc", "nanos")

  private val otherTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  /** Per-variant testdata dir: sf0.001 tables + the variant's events file. */
  private lazy val dirs: Map[String, String] = variants.map { v =>
    val d = Files.createTempDirectory(s"graft_events_$v")
    otherTables.foreach { t =>
      Files.copy(Paths.get(s"$Sf0001/$t.parquet"), d.resolve(s"$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val in = getClass.getResourceAsStream(s"/events_ts/events_$v.parquet")
    assert(in != null, s"missing fixture events_$v.parquet")
    try Files.copy(in, d.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    v -> d.toString
  }.toMap

  test("Tables.events normalizes every parquet timestamp flavor to TimestampType") {
    variants.foreach { v =>
      val dt = Tables.events(spark, dirs(v)).schema("ts").dataType
      assert(dt == TimestampType, s"variant $v read ts as $dt")
    }
  }

  // Every gate query whose plan reads the events table. If a new
  // events-reading query lands, add it here (the q38 incident shows the
  // cost of a gap).
  private val eventQueries = Seq(
    "q05_daily_rollup", "q06_user_daily", "q07_rolling_mean", "q08_densify",
    "q09_dow_profile", "q10_union", "q11_validate_split", "q13_monthly_type",
    "q14_kpis", "q15_user_vs_global", "q28_anomaly_scores", "q31_cube",
    "q33_rank_lag", "q34_percentiles", "q35_pivot", "q36_distinct",
    "q38_sessionize", "q42_asof_join", "q44_setops", "q46_arrays_json",
    "q48_asof_native", "q58_range_join", "q61_per_key_trend",
    "q62_trend_anomalies")

  test("events-reading queries exist in SparkEntry.queries") {
    val missing = eventQueries.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"stale spec list: $missing")
  }

  test("flavors agree under a non-UTC session timezone") {
    // The NTZ→timestamp cast reinterprets wall-clock in the SESSION
    // zone: before Tables.events pinned the zone itself, a non-UTC
    // driver session shifted the micros_ntz flavor by the zone offset
    // while the nanos/utc flavors stayed put (ADVICE r7). TestSession
    // always configures UTC, so this exercises the defensive set by
    // breaking the session zone first.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      val fn = SparkEntry.queries("q38_sessionize")
      val results = variants.map { v =>
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        v -> fn(spark, dirs(v)).collect().map(_.toString).sorted.toSeq
      }
      val (refV, ref) = results.head
      results.tail.foreach { case (v, rows) =>
        assert(rows == ref, s"non-UTC session: $v diverges from $refV")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  eventQueries.foreach { name =>
    test(s"$name: identical results across ts flavors") {
      val fn = SparkEntry.queries(name)
      val results = variants.map { v =>
        v -> fn(spark, dirs(v)).collect().map(_.toString).sorted.toSeq
      }
      val (refV, ref) = results.head
      results.tail.foreach { case (v, rows) =>
        assert(rows.size == ref.size,
          s"$name: $v rows=${rows.size} vs $refV rows=${ref.size}")
        rows.zip(ref).zipWithIndex.collectFirst {
          case ((a, b), i) if a != b =>
            fail(s"$name: first diff at sorted row $i: $v=$a vs $refV=$b")
        }
      }
    }
  }
}
