package graft

import org.apache.spark.sql.functions._

/** The q184–q191 TPC-H decision-support shapes: each test pins the
  * SEMANTIC that distinguishes its shape (conditional-agg ratio,
  * max-equality view, disjunctive join residual, dual-role dimension,
  * scalar-subquery threshold, anti join, exists/not-exists
  * decorrelation) on fixtures built to trip the wrong formulation.
  */
class TpchShapesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTables(rows: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tpch_fix").toString
    rows.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("q184 promo share: ratio equals the driver-side replay and the " +
      "part dim broadcasts") {
    val df = SparkEntry.queries("q184_promo_share")(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val (pr, tr, share) = df.as[(Double, Double, Double)].head()
    assert(pr > 0 && tr > pr)
    val expected = math.rint(100.0 * pr / tr * 100) / 100
    assert(math.abs(share - expected) <= 0.011, s"$share vs $expected")
  }

  test("q185 top supplier: max-EQUALITY returns every tied supplier, " +
      "not an arbitrary top-1") {
    // two suppliers with identical cent-rounded revenue at the max
    val li = Seq(
      (1L, 10L, 100.0, 0.0, "2097-01-05"),
      (2L, 20L, 60.0, 0.0, "2097-01-06"),
      (3L, 20L, 40.0, 0.0, "2097-01-07"),
      (4L, 30L, 99.0, 0.0, "2097-01-08")
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "d")
      .withColumn("l_shipdate", col("d").cast("timestamp")).drop("d")
    val supp = Seq((10L, "sA"), (20L, "sB"), (30L, "sC"))
      .toDF("s_suppkey", "s_name")
    val dir = tmpTables("lineitem" -> li, "supplier" -> supp)
    // window: the fixture's dates (the gate's 1997 window misses them,
    // so build the same shape inline through the library pattern)
    val rev = li.filter(expr(
        "CAST(l_shipdate AS DATE) >= DATE '2097-01-01'"))
      .groupBy($"l_suppkey")
      .agg(round(sum(expr("l_extendedprice * (1 - l_discount)")), 2)
        .as("total_rev"))
    val mx = rev.agg(max($"total_rev").as("mx"))
    val got = rev.join(broadcast(mx), $"total_rev" === $"mx")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .select($"s_name").as[String].collect().toSet
    assert(got == Set("sA", "sB")) // both at 100.00
    // and the gate query itself returns the sf0.001 max row(s)
    val gate = SparkEntry.queries("q185_top_supplier")(spark, Sf0001)
      .as[(Long, String, Double)].collect()
    assert(gate.nonEmpty && gate.map(_._3).distinct.length == 1)
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("q186 disjunctive join: count equals the driver-side replay of " +
      "the OR-of-ANDs, and the plan still broadcasts") {
    val df = SparkEntry.queries("q186_disjunctive_join")(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val n = df.select($"n_items").as[Long].head()
    val li = spark.read.parquet(s"$Sf0001/lineitem.parquet")
      .select($"l_partkey", $"l_quantity".cast("double")).as[(Long, Double)]
      .collect()
    val part = spark.read.parquet(s"$Sf0001/part.parquet")
      .select($"p_partkey", $"p_brand", $"p_size").as[(Long, String, Int)]
      .collect().map(p => p._1 -> (p._2, p._3)).toMap
    val expected = li.count { case (pk, q) =>
      val (b, sz) = part(pk)
      (b == "Brand#12" && sz >= 1 && sz <= 5 && q >= 1 && q <= 11) ||
      (b == "Brand#23" && sz >= 1 && sz <= 10 && q >= 10 && q <= 20) ||
      (b == "Brand#15" && sz >= 1 && sz <= 15 && q >= 20 && q <= 30)
    }
    assert(n == expected)
  }

  test("q187 nation volume: only the two directed lanes appear, and a " +
      "shipment is attributed supplier-side vs customer-side correctly") {
    // supplier 10 in NATION_12, supplier 20 in NATION_10; customer 1
    // in NATION_10, customer 2 in NATION_12, customer 3 in NATION_3
    val li = Seq(
      (1L, 10L, 100.0, 0.0, "1996-02-01"), // N12 -> N10 lane
      (2L, 20L, 50.0, 0.0, "1997-03-01"),  // N10 -> N12 lane
      (3L, 10L, 75.0, 0.0, "1996-04-01"),  // N12 -> N3: excluded pair
      (4L, 10L, 60.0, 0.0, "1897-01-01")   // out of the date window
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "d")
      .withColumn("l_shipdate", col("d").cast("timestamp")).drop("d")
    val ord = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 1L))
      .toDF("o_orderkey", "o_custkey")
    val supp = Seq((10L, 1L), (20L, 2L)).toDF("s_suppkey", "s_nationkey")
    val cust = Seq((1L, 2L), (2L, 1L), (3L, 3L))
      .toDF("c_custkey", "c_nationkey")
    val nat = Seq((1L, "NATION_12"), (2L, "NATION_10"), (3L, "NATION_3"))
      .toDF("n_nationkey", "n_name")
    val dir = tmpTables("lineitem" -> li, "orders" -> ord,
      "supplier" -> supp, "customer" -> cust, "nation" -> nat)
    val got = SparkEntry.queries("q187_nation_volume")(spark, dir)
      .as[(String, String, Long, Double, Long)].collect().toSet
    assert(got == Set(
      ("NATION_12", "NATION_10", 1996L, 100.0, 1L),
      ("NATION_10", "NATION_12", 1997L, 50.0, 1L)))
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("q188 market share: shares in [0,100]; full-partition of revenue " +
      "(summing every nation's share of the same slice = 100)") {
    val got = SparkEntry.queries("q188_market_share")(spark, Sf0001)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, n, tr, sh) =>
      assert(n > 0 && tr > 0 && sh >= 0.0 && sh <= 100.0)
    }
  }

  test("q189 part concentration: returned = EXACTLY the parts above the " +
      "global threshold (no misses, no extras)") {
    val got = SparkEntry.queries("q189_part_concentration")(spark, Sf0001)
      .as[(Long, Double)].collect().toMap
    val li = spark.read.parquet(s"$Sf0001/lineitem.parquet")
      .select($"l_partkey",
        expr("l_extendedprice * (1 - l_discount)").as("r"))
      .as[(Long, Double)].collect()
    val byPart = li.groupBy(_._1).map { case (k, v) =>
      k -> math.rint(v.map(_._2).sum * 100) / 100
    }
    val thr = math.rint(li.map(_._2).sum * 0.00075 * 100) / 100
    val expected = byPart.filter(_._2 > thr)
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 0.011) }
  }

  test("q190 dormant rich: below-average excluded, above-average with a " +
      "recent order excluded, above-average dormant included") {
    val cust = Seq(
      (1L, 100.0, "SEG_A"), // above avg, dormant -> included
      (2L, 100.0, "SEG_A"), // above avg, recent order -> excluded
      (3L, 10.0, "SEG_B"),  // below avg -> excluded
      (4L, -50.0, "SEG_B")  // negative: not in the avg, below it anyway
    ).toDF("c_custkey", "c_acctbal", "c_mktsegment")
    val ord = Seq(
      (100L, 2L, "2000-08-01"), // recent -> disqualifies cust 2
      (101L, 1L, "1999-01-01")  // old -> cust 1 stays dormant
    ).toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
    val dir = tmpTables("customer" -> cust, "orders" -> ord)
    // avg over positive balances = (100+100+10)/3 = 70
    val got = SparkEntry.queries("q190_dormant_rich")(spark, dir)
      .as[(String, Long, Double)].collect()
      .map { case (k, n, b) => k -> ((n, b)) }.toMap
    assert(got == Map("SEG_A" -> ((1L, 100.0))))
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("q191 lone-fault supplier: only the sole returning supplier in a " +
      "multi-supplier finished order counts") {
    val li = Seq(
      // order 1: two suppliers, only supp 10 returned -> supp 10 counts
      (1L, 10L, "R"), (1L, 20L, "N"),
      // order 2: two suppliers BOTH returned -> nobody counts
      (2L, 10L, "R"), (2L, 20L, "R"),
      // order 3: single supplier returned -> no co-supplier, no count
      (3L, 30L, "R"),
      // order 4: open status (filtered by orders) -> ignored entirely
      (4L, 10L, "R"), (4L, 20L, "N")
    ).toDF("l_orderkey", "l_suppkey", "l_returnflag")
    val ord = Seq((1L, "F"), (2L, "F"), (3L, "F"), (4L, "O"))
      .toDF("o_orderkey", "o_orderstatus")
    val supp = Seq((10L, "s10"), (20L, "s20"), (30L, "s30"))
      .toDF("s_suppkey", "s_name")
    val dir = tmpTables("lineitem" -> li, "orders" -> ord,
      "supplier" -> supp)
    val got = SparkEntry.queries("q191_lone_return_supplier")(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((10L, "s10", 1L)))
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("q213 shipping priority: LIMIT runs as TakeOrderedAndProject, " +
      "never a global sort") {
    val df = SparkEntry.queries("q213_shipping_priority")(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val rows = df.collect()
    assert(rows.length == 10)
    // the cut order is (revenue DESC, o_date ASC, l_orderkey ASC)
    val revs = rows.map(_.getDouble(3))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q214 priority exists: an order with several qualifying lines " +
      "counts ONCE; zero-qualifying orders are excluded") {
    val ord = Seq(
      (1L, "1-URGENT", "1997-02-01"), // 3 qualifying lines -> counts 1
      (2L, "1-URGENT", "1997-02-01"), // only same-day/earlier -> excluded
      (3L, "5-LOW", "1997-02-01")     // one qualifying line -> counts 1
    ).toDF("o_orderkey", "o_orderpriority", "d")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
    val li = Seq(
      (1L, "1997-02-02"), (1L, "1997-02-03"), (1L, "1997-02-04"),
      (2L, "1997-02-01"), (2L, "1997-01-20"),
      (3L, "1997-05-01")
    ).toDF("l_orderkey", "d")
      .withColumn("l_shipdate", col("d").cast("timestamp")).drop("d")
    val dir = tmpTables("orders" -> ord, "lineitem" -> li)
    val got = SparkEntry.queries("q214_priority_exists")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == Map("1-URGENT" -> 1L, "5-LOW" -> 1L))
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("q216 big orders: the >300 threshold is an exact integer " +
      "boundary — 300 excluded, 301 included") {
    val li = Seq(
      (1L, 150.0), (1L, 150.0),        // sum = 300 -> excluded
      (2L, 150.0), (2L, 151.0)         // sum = 301 -> included
    ).toDF("l_orderkey", "l_quantity")
    val ord = Seq(
      (1L, 10L, 1000.0, "1997-01-01"), (2L, 10L, 2000.0, "1997-01-02"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "d")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
    val cust = Seq((10L, "cA")).toDF("c_custkey", "c_name")
    val dir = tmpTables("lineitem" -> li, "orders" -> ord,
      "customer" -> cust)
    val got = SparkEntry.queries("q216_big_orders")(spark, dir)
      .select("o_orderkey", "total_qty").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 301L)))
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("q225 revenue delta: band edges inclusive, quantity cap strict") {
    val mk = (qty: Double, disc: Double) =>
      (1L, 100.0, disc, qty, "1997-06-01")
    val li = Seq(
      mk(10.0, 0.05),  // in: low edge inclusive
      mk(10.0, 0.07),  // in: high edge inclusive
      mk(10.0, 0.049), // out: below band
      mk(10.0, 0.071), // out: above band
      mk(24.0, 0.06),  // out: quantity cap is STRICT <
      mk(23.0, 0.06))  // in
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_quantity", "d")
      .withColumn("l_shipdate", col("d").cast("timestamp")).drop("d")
    val dir = tmpTables("lineitem" -> li)
    val (rev, n) = SparkEntry.queries("q225_revenue_delta")(spark, dir)
      .as[(Double, Long)].head()
    assert(n == 3L, s"rows in band: $n")
    assert(math.abs(rev - (100.0 * 0.05 + 100.0 * 0.07 + 100.0 * 0.06))
      <= 0.011, s"$rev")
  }

  test("q227 min-cost supplier: every TIED minimum surfaces; " +
      "non-region suppliers never price") {
    // suppliers 1,2 (EUROPE) both hit unit price 500 cents on part 7;
    // supplier 3 (non-EUROPE) prices it cheaper but must be invisible
    val li = Seq(
      (7L, 1L, 10.0, 2.0),   // 500 cents
      (7L, 1L, 12.0, 2.0),   // 600 - min per (part,supp) is 500
      (7L, 2L, 5.0, 1.0),    // 500 cents - tie
      (7L, 3L, 1.0, 1.0),    // 100 cents but wrong region
      (8L, 1L, 30.0, 1.0))   // part 8: sole supplier
      .toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val part = Seq((7L, "alpha", 15, "STANDARD"), (8L, "beta", 15, "STANDARD"))
      .toDF("p_partkey", "p_name", "p_size", "p_type")
    val supp = Seq((1L, "s1", 100.0, 0L), (2L, "s2", 200.0, 1L),
      (3L, "s3", 300.0, 2L))
      .toDF("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    val nat = Seq((0L, "NAT_A", 3L), (1L, "NAT_B", 3L), (2L, "NAT_C", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val dir = tmpTables("lineitem" -> li, "part" -> part,
      "supplier" -> supp, "nation" -> nat)
    val got = SparkEntry.queries("q227_min_cost_supplier")(spark, dir)
      .select("p_partkey", "s_name", "unit_cents")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((7L, "s1", 500L), (7L, "s2", 500L),
      (8L, "s1", 3000L)), s"$got")
  }

  test("q228 supplier census: a complaint supplier vanishes from " +
      "every cell, not just its rows") {
    val li = Seq(
      (1L, 10L), (1L, 11L), // part 1: good suppliers 10, 11
      (2L, 12L), (2L, 10L), // part 2: bad supplier 12 + good 10
      (3L, 12L))            // part 3: ONLY the bad supplier -> no cell
      .toDF("l_partkey", "l_suppkey")
    val part = Seq((1L, "Brand#1", "SMALL", 5), (2L, "Brand#2", "LARGE", 15),
      (3L, "Brand#3", "SMALL", 25))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val supp = Seq((10L, 50.0), (11L, 60.0), (12L, -5.0))
      .toDF("s_suppkey", "s_acctbal")
    val dir = tmpTables("lineitem" -> li, "part" -> part, "supplier" -> supp)
    val got = SparkEntry.queries("q228_supplier_part_count")(spark, dir)
      .select("p_brand", "supplier_cnt").as[(String, Long)].collect().toMap
    assert(got == Map("Brand#1" -> 2L, "Brand#2" -> 1L), s"$got")
  }

  test("q229 dominant supplier: exactly-25% share is NOT dominant and " +
      "the nation filter bites after dominance") {
    // part 1 total 1997 qty = 40: supp 1 ships 10 (4*10 == 40, not
    // dominant), supp 2 ships 30 (dominant). supp 3 dominates part 2
    // but sits in the wrong nation
    val li = Seq(
      (1L, 1L, 10.0, "1997-03-01"), (1L, 2L, 30.0, "1997-04-01"),
      (2L, 3L, 9.0, "1997-05-01"), (2L, 1L, 1.0, "1997-05-02"),
      (1L, 2L, 99.0, "1998-06-01")) // outside the year: must not count
      .toDF("l_partkey", "l_suppkey", "l_quantity", "d")
      .withColumn("l_shipdate", col("d").cast("timestamp")).drop("d")
    val part = Seq((1L, "small ring"), (2L, "small bolt"))
      .toDF("p_partkey", "p_name")
    val supp = Seq((1L, "s1", 0L), (2L, "s2", 0L), (3L, "s3", 1L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nat = Seq((0L, "NATION_12"), (1L, "NATION_0"))
      .toDF("n_nationkey", "n_name")
    val dir = tmpTables("lineitem" -> li, "part" -> part,
      "supplier" -> supp, "nation" -> nat)
    val got = SparkEntry.queries("q229_dominant_supplier")(spark, dir)
      .select("s_name").as[String].collect().toSet
    assert(got == Set("s2"), s"$got")
  }

  test("q217 priority class: high+low partition is exhaustive — the " +
      "two counters sum to the joined row count") {
    val df = SparkEntry.queries("q217_priority_class")(spark, Sf0001)
      .as[(String, Long, Long)].collect()
    assert(df.nonEmpty)
    val total = df.map(r => r._2 + r._3).sum
    val li = Tables.load(spark, Sf0001, "lineitem")
      .filter(expr("CAST(l_shipdate AS DATE) >= DATE '1997-01-01'")
        && expr("CAST(l_shipdate AS DATE) < DATE '1998-01-01'"))
    assert(total == li.count())
  }
}
