package graft.core

import org.apache.spark.sql.functions._

// in graft.core so the spec can replay the private[core] mix32 draw
class RandomizedResponseSpec extends graft.SparkSpec {
  import spark.implicits._

  test("flip set is the portable hash draw; debiasing algebra exact") {
    val n = 5000
    val rows = (1 to n).map(i => ("g", i.toLong, i % 3 == 0))
    val df = rows.toDF("g", "id", "t")
    val got = Privacy.randomizedResponse(df, col("g"), col("id"),
        col("t"), flipMicro = 100000L)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    val (_, nn, cTrue, cRep, est, err) = got
    assert(nn == n && cTrue == (1 to n).count(_ % 3 == 0))
    // recompute the reported count from the same portable draw
    val flips = df.select(col("id"), col("t"),
        (pmod(Sketches.mix32(TextAnalysis.rollingHash(
          concat(col("id").cast("string"), lit(":42")))),
          lit(1000000L)) < 100000L).as("f"))
      .as[(Long, Boolean, Boolean)].collect()
    val expRep = flips.count { case (_, t, f) => t != f }
    assert(cRep == expRep)
    // flip rate close to 10%
    val nf = flips.count(_._3)
    assert(math.abs(nf - n / 10) < 3 * math.sqrt(n * 0.1 * 0.9), s"nf=$nf")
    assert(est == (cRep * 1000000L - n * 100000L) * 1000000L / 800000L)
    assert(err == math.abs(est - cTrue * 1000000L))
    // the debiased estimate lands near the truth (3-sigma of RR noise)
    val sigma = math.sqrt(n * 0.1 * 0.9) / 0.8
    assert(math.abs(est / 1000000.0 - cTrue) < 3 * sigma)
  }

  test("deterministic across partitionings; rejects degenerate rates") {
    val df = (1 to 200).map(i => ("g", i.toLong, i % 2 == 0))
      .toDF("g", "id", "t")
    val a = Privacy.randomizedResponse(df, col("g"), col("id"),
      col("t"), 250000L).collect().toSeq
    val b = Privacy.randomizedResponse(df.repartition(7), col("g"),
      col("id"), col("t"), 250000L).collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Privacy.randomizedResponse(df, col("g"), col("id"), col("t"), 500000L)
    }
  }
}
