package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 / the 100 TB checklist:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default here)
  * already splits oversized SHUFFLE-JOIN partitions at runtime; these
  * helpers cover the cases AQE does not: single-key hash aggregations
  * whose one reducer receives a hot key, and broadcast-inflation joins
  * where one dimension row matches a huge fact slice.
  */
object Skew {

  /** Two-stage aggregation for skewed group keys: stage 1 aggregates on
    * (key, salt) — spreading a hot key over `numSalts` reducers — and
    * stage 2 combines the partials per key. Correct for any aggregate
    * with an associative partial form; exposed for the common
    * count/sum/min/max combos.
    *
    * The salt is a deterministic hash of a high-cardinality column
    * (spread evenly, reproducible) — never rand(), which breaks retries
    * and task re-execution semantics. */
  def saltedSumCount(df: DataFrame, key: Column, saltSource: Column,
                     value: Column, numSalts: Int = 16): DataFrame =
    df.groupBy(key.as("k"), (pmod(xxhash64(saltSource), lit(numSalts))).as("salt"))
      .agg(sum(value).as("partial_sum"), count(lit(1)).as("partial_cnt"))
      .groupBy(col("k"))
      .agg(sum("partial_sum").as("total"), sum("partial_cnt").as("cnt"))

  /** Salted join for a skewed fact ⋈ small-dim: the fact side gets a
    * deterministic salt in [0, numSalts); the dim side is exploded
    * `numSalts`× so every (key, salt) pair finds its row. The shuffle
    * then spreads each hot key over `numSalts` reducers. Use when the
    * dim is too big to broadcast but the fact's key distribution is
    * skewed; result is identical to `fact.join(dim, factKey === dimKey,
    * "inner")`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: Column, dimKey: Column, saltSource: Column,
                 numSalts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(numSalts)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedFact
      .join(saltedDim,
        factKey === dimKey && saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }
}
