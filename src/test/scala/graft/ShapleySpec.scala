package graft

import graft.core.Eval
import org.apache.spark.sql.functions._

class ShapleySpec extends SparkSpec {
  import spark.implicits._

  // events: (user, channel); conversion marked by channel == "buy"
  private def attribution(rows: Seq[(Long, String)]) =
    Eval.shapleyAttribution(rows.toDF("u", "ch"),
      col("u"), col("ch"), col("ch") === "buy")
      .select("channel", "n_users", "shapley_num", "shapley_micro")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("hand-checked 2-channel lattice: exact numerators and efficiency") {
    // {A}: 2 users 1 conv (v=500000); {A,B}: 1/1 (v=1000000); {B}: 0/1
    val got = attribution(Seq(
      (1L, "A"), (1L, "buy"), (2L, "A"),
      (3L, "A"), (3L, "B"), (3L, "buy"),
      (4L, "B")))
    // phi_A = 1*(500000-0) + 1*(1000000-0) = 1500000; /2! = 750000
    // phi_B = 1*(0-0)      + 1*(1000000-500000) = 500000; /2 = 250000
    assert(got("A") == ((3L, 1500000L, 750000L)))
    assert(got("B") == ((2L, 500000L, 250000L)))
    // efficiency: sum of numerators = n! * v(N)
    assert(got.values.map(_._2).sum == 2L * 1000000L)
  }

  test("negative marginal contribution floors like the oracle (pmod identity)") {
    // {A}: 3 users 1 conv (v=333333); {A,B}: 1 user 0 conv (v=0)
    val got = attribution(Seq(
      (1L, "A"), (1L, "buy"), (2L, "A"), (3L, "A"),
      (4L, "A"), (4L, "B")))
    // phi_B: S=emptyset: 0; S={A}: v(AB)-v(A) = -333333
    // floor(-333333 / 2) = -166667 (NOT truncation's -166666)
    assert(got("B")._2 == -333333L)
    assert(got("B")._3 == -166667L)
  }

  test("unobserved coalitions contribute v=0; purchase-only users drop") {
    // user 9 converts with no touches: excluded entirely
    val got = attribution(Seq(
      (1L, "A"), (1L, "buy"), (9L, "buy")))
    // n=1 lattice: phi_A = 0!*0!*(v({A})-0) = 1000000; /1! same
    assert(got("A") == ((1L, 1000000L, 1000000L)))
  }
}
