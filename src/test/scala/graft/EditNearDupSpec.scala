package graft

import graft.core.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class EditNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("charGrams: hand-pinned windows, distinct set, short/empty safe") {
    val df = Seq("abcde", "aaaa", "ab", "", "x y z").toDF("s")
    val got = df.select(Dedup.charGrams(col("s"), 3).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("abc", "bcd", "cde"))
    assert(got(1) == Seq("aaa"))         // distinct set of repeated gram
    assert(got(2) == Seq.empty)          // shorter than q
    assert(got(3) == Seq.empty)
    assert(got(4) == Seq("x y", " y ", "y z"))
    // matches the built-ins HOF semantic oracle on longer strings
    val s = "the quick brown fox"
    val hof = spark.sql(
      s"""SELECT array_distinct(transform(
         |  sequence(1, greatest(length('$s') - 2, 0)),
         |  i -> substring('$s', i, 3))) AS g""".stripMargin)
      .as[Seq[String]].collect().head
    val native = Seq(s).toDF("s")
      .select(Dedup.charGrams(col("s"), 3)).as[Seq[String]].collect().head
    assert(native == hof)
  }

  test("editNearDupPairs: hand-checked pairs and exact distances") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),   // ed 0 vs 1
      (3L, "the quick brawn fox jumps"),   // ed 1 vs 1/2
      (4L, "the quick brawn fox lumps"),   // ed 1 vs 3, ed 2 vs 1
      (5L, "a completely different string")
    ).toDF("id", "s")
    val got = Dedup.editNearDupPairs(docs, "id", "s", k = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L),
      (1L, 4L, 2L), (2L, 4L, 2L), (3L, 4L, 1L)))
  }

  test("editNearDupPairs: lossless vs brute force, incl. shorts and repeats") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcd "
    def randStr(len: Int): String =
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    // clusters of perturbed strings + shorts + repetitive strings
    val base = (0 until 40).map(_ => randStr(6 + rnd.nextInt(30)))
    val rows = base.zipWithIndex.flatMap { case (s, i) =>
      val mut =
        if (s.length > 4) s.updated(rnd.nextInt(s.length), 'z') else s + "z"
      Seq((i * 10L, s), (i * 10L + 1L, mut))
    } ++ Seq((9001L, ""), (9002L, "ab"), (9003L, "ba"), (9004L, "abab"),
      (9005L, "ababab"), (9006L, "aaaaaaaaaaaaaaaa"), (9007L, "aaaaaaaaaaaaaaab"))
    val df = rows.toDF("id", "s")
    val got = Dedup.editNearDupPairs(df, "id", "s", k = 2)
      .as[(Long, Long, Long)].collect().toSet
    val brute = df.as("x").join(df.as("y"), $"x.id" < $"y.id")
      .select($"x.id", $"y.id",
        levenshtein($"x.s", $"y.s").cast("long").as("ed"))
      .filter($"ed" <= 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
    assert(got.nonEmpty)
  }

  test("editNearDupPairs: partition-invariant") {
    val docs = Seq((1L, "hello world"), (2L, "hello werld"),
      (3L, "hello"), (4L, "hallo")).toDF("id", "s")
    val a = Dedup.editNearDupPairs(docs, "id", "s", k = 2)
      .as[(Long, Long, Long)].collect().toSet
    val b = Dedup.editNearDupPairs(docs.repartition(7), "id", "s", k = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.contains((1L, 2L, 1L)) && a.contains((3L, 4L, 1L)))
  }
}
