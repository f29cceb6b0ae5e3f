package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation: salted equi-join.
  *
  * When a join key is heavily skewed (one user/home with 10^8 rows), a
  * plain shuffle join sends the whole hot key to one task. Salting
  * splits each hot key into `buckets` sub-keys: the big side gets a
  * DETERMINISTIC per-row salt (hash of the whole row's unique column),
  * the small side is replicated once per salt value, and the join runs
  * on (key, salt) — the hot key now spreads over `buckets` tasks.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`, on by
  * default in Tables.configure) covers sort-merge joins at runtime;
  * this operator is the explicit, planner-independent form for the
  * cases AQE can't re-plan (e.g. when the skew is in an aggregation
  * feeding the join, or on a build side it can't split).
  */
object Skew {

  /** Inner equi-join of `big` (skewed) with `small` on `key`, salted
    * into `buckets` sub-keys. `saltSource` must be a column of `big`
    * that varies within a key (an id, a timestamp) so rows spread;
    * determinism (vs `rand()`) keeps results reproducible and retries
    * safe.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = big.withColumn("__salt", pmod(abs(hash(saltSource)), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
