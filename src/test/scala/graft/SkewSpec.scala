package graft

import graft.core.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join on skewed data; salt spreads the hot key") {
    // 10k rows on one hot key, a few on others
    val big = spark.range(10000).select(
      when($"id" < 9000, "hot").otherwise(concat(lit("k"), $"id" % 7)).as("key"),
      $"id".as("rid"))
    val small = Seq(("hot", 1.0), ("k0", 2.0), ("k3", 3.0)).toDF("key", "w")

    val plain = big.join(small, "key")
    val salted = Skew.saltedJoin(big, small, "key", col("rid"), buckets = 8)
    assert(salted.count() == plain.count())
    val a = plain.select("key", "rid", "w").collect().map(_.toSeq).toSet
    val b = salted.select("key", "rid", "w").collect().map(_.toSeq).toSet
    assert(a == b)

    // determinism: same salt assignment across runs
    val s1 = Skew.saltedJoin(big, small, "key", col("rid"), 8)
      .groupBy("key").count().collect().toSet
    val s2 = Skew.saltedJoin(big, small, "key", col("rid"), 8)
      .groupBy("key").count().collect().toSet
    assert(s1 == s2)

    // the hot key actually spreads across salt buckets
    val spread = big.withColumn("salt", pmod(abs(hash($"rid")), lit(8)))
      .filter($"key" === "hot").select("salt").distinct().count()
    assert(spread == 8L)
  }

  test("sessionize: gaps split sessions, running ids are per-key") {
    val ev = Seq(
      ("u1", "2024-01-01 10:00:00", 1.0),
      ("u1", "2024-01-01 10:30:00", 2.0),  // same session (30m gap)
      ("u1", "2024-01-01 12:00:00", 3.0),  // new session (90m gap)
      ("u2", "2024-01-01 10:00:00", 4.0)
    ).toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp($"ts_s"))
    val s = graft.core.TimeSeries.sessionize(ev, "user_id", "ts", 60)
      .select("user_id", "ts_s", "session_id")
      .as[(String, String, Long)].collect().toSet
    assert(s == Set(
      ("u1", "2024-01-01 10:00:00", 1L),
      ("u1", "2024-01-01 10:30:00", 1L),
      ("u1", "2024-01-01 12:00:00", 2L),
      ("u2", "2024-01-01 10:00:00", 1L)))
  }
}
