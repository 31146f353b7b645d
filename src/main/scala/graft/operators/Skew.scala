package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for the 100 TB path.
  *
  * A shuffle join on a key with a few hot values puts entire hot keys on
  * single reducers. Salting splits each hot key into `saltFactor` synthetic
  * sub-keys: the big side gets a deterministic salt derived from a high-
  * entropy column, the small side is replicated once per salt value, and
  * the join runs on (key, salt). Results are identical to the unsalted
  * join; the reducer load for a hot key drops by ~saltFactor.
  *
  * (AQE's skew-join splitting handles sort-merge joins adaptively; explicit
  * salting remains the tool for aggregations and for engines/plans AQE
  * can't rewrite, so the engine ships it as a first-class helper.)
  */
object Skew {

  /** Deterministic salt in [0, saltFactor) from an arbitrary column —
    * hash-based, so re-runs produce identical partitioning.
    */
  def salt(entropy: Column, saltFactor: Int): Column =
    pmod(xxhash64(entropy), lit(saltFactor.toLong)).cast("int")

  /** Inner equi-join of `big` (skewed) with `small` on `key`, salted.
    * `entropy` must be a column of `big` with high cardinality (e.g. its
    * primary key) so the salt spreads hot keys evenly.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      entropy: String,
      saltFactor: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(col(entropy), saltFactor))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig
      .join(saltedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-phase (salted) aggregation: count per key where one key dominates.
    * Phase 1 aggregates per (key, salt), phase 2 merges per key — the
    * second shuffle carries at most saltFactor rows per key.
    */
  def saltedCount(
      df: DataFrame, key: String, entropy: String, saltFactor: Int): DataFrame =
    df.withColumn("__salt", salt(col(entropy), saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col(key))
      .agg(sum(col("partial")).as("n"))
}
