package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-placement operators — the shard/worker assignment layer a
  * 100 TB pipeline sits on. Everything is the portable avalanched
  * hash (pure function of (key, shard, seed)), so placement is
  * engine-reproducible, replayable in SQL, and — the property these
  * algorithms exist for — STABLE under topology change.
  */
object Placement {

  /** Rendezvous / highest-random-weight placement (Thaler & Ravishankar
    * 1996, the consistent-hashing alternative without a ring): key k
    * lands on argmax over shards of hash(k, shard). Adding or removing
    * a shard moves ONLY the keys whose argmax changes — in expectation
    * n/(N+1) keys on grow, exactly the keys the new shard wins —
    * while modulo placement (`key % N`) reshuffles nearly everything.
    *
    * This operator audits that elasticity: it places every key under
    * `shards` and under `shards + 1`, and reports per-shard
    * populations for both topologies plus the exact moved-key count.
    * Determinism: weights are the avalanched hash of `key:shard:seed`
    * on the 1e9 lattice, argmax ties break to the smaller shard id
    * (max_by on the (weight, −shard) pair — a MAP-SIDE-COMBINABLE
    * aggregate, no window, no join; the shard spine is a broadcast
    * cross of N+1 literal rows).
    *
    * Output: one row per (topology, shard) — (topology 'n'|'n_plus_1',
    * shard, n_keys) — plus one ('moved', -1, count) row.
    */
  def rendezvousAudit(df: DataFrame, key: Column, shards: Int,
                      seed: Long = 42L): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(key.cast("string").as("k")).distinct()
    val spine = broadcast((0 until (shards + 1)).map(_.toLong)
      .toDF("shard"))
    val weighted = keys.crossJoin(spine)
      .withColumn("w", pmod(Sketches.mix32(TextAnalysis.rollingHash(
        concat(col("k"), lit(":"), col("shard").cast("string"),
          lit(":"), lit(seed.toString)))), lit(1000000000L)))
    // argmax by (weight desc, shard asc): max of (w, -shard) structs
    val placed = weighted
      .groupBy("k")
      .agg(
        max(when(col("shard") < shards,
          struct(col("w"), (-col("shard")).as("ns")))).as("old"),
        max(struct(col("w"), (-col("shard")).as("ns"))).as("nw"))
      .select(col("k"), (-col("old.ns")).as("shard_n"),
        (-col("nw.ns")).as("shard_n1"))
    val byOld = placed.groupBy(col("shard_n").as("shard"))
      .agg(count(lit(1)).as("n_keys"))
      .select(lit("n").as("topology"), col("shard"), col("n_keys"))
    val byNew = placed.groupBy(col("shard_n1").as("shard"))
      .agg(count(lit(1)).as("n_keys"))
      .select(lit("n_plus_1").as("topology"), col("shard"), col("n_keys"))
    val moved = placed.filter(col("shard_n") =!= col("shard_n1"))
      .agg(count(lit(1)).as("n_keys"))
      .select(lit("moved").as("topology"), lit(-1L).as("shard"),
        col("n_keys"))
    byOld.unionByName(byNew).unionByName(moved)
  }

  /** Largest-remainder (Hamilton) apportionment of an integer budget
    * across groups proportional to integer weights — the exact answer
    * to "split this token budget over sources by these mixture
    * weights" that per-group rounding can't give (floors under-
    * allocate, naive rounding over- or under-shoots; Hamilton hands
    * the Σfloor shortfall to the largest remainders, one unit each,
    * so quotas sum to the budget EXACTLY).
    *
    * All integer: base = B·w_g DIV W, remainder = B·w_g mod W, the
    * top-(B − Σbase) remainders (tie: group id asc) get +1. The rank
    * window orders the GROUP table (bounded by the group alphabet,
    * never corpus rows; the weight aggregation below it is map-side
    * combinable).
    *
    * Output: (group, weight, base, extra 0|1, quota), Σquota = B.
    */
  def apportion(df: DataFrame, group: Column, weight: Column,
                budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0L, "budget must be >= 0")
    val w = df.select(group.as("g"), weight.as("wt"))
      .groupBy("g").agg(sum("wt").as("weight"))
    val tot = w.agg(sum("weight").as("tw"))
    val based = w.crossJoin(broadcast(tot))
      .select(col("g"), col("weight"),
        expr(s"${budget}L * weight DIV tw").as("base"),
        expr(s"pmod(${budget}L * weight, tw)").as("rem"))
    val short = based.agg((lit(budget) - sum("base")).as("left"))
    based.crossJoin(broadcast(short))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("g"))))
      .select(col("g").as("group"), col("weight"), col("base"),
        when(col("rk") <= col("left"), 1L).otherwise(0L).as("extra"))
      .withColumn("quota", col("base") + col("extra"))
  }
}
