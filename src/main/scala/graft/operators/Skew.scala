package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the 100 TB tooling layer.
  *
  * Spark's hash aggregation is already two-phase (map-side partial
  * combine), which absorbs groupBy skew for small-buffer monoids. The
  * cases that still die on one hot key are (a) joins, where every row
  * of the hot key lands on one task, and (b) aggregations whose per-key
  * state is large (collect_set/collect_list, distinct counting), where
  * the final task for the hot key holds the whole state. These helpers
  * spread that work:
  *
  *  - [[saltedJoin]]: replicate-and-salt — the fact side appends a
  *    deterministic salt in [0, n), the dim side is exploded n-fold, and
  *    the join key becomes (key, salt), spreading each hot key over n
  *    tasks. Classic skew-join salting; AQE's skew handling does the
  *    same adaptively for sort-merge joins, but salting also covers
  *    hash joins and deterministic plans.
  *  - [[saltedDistinct]]: two-phase distinct per key — phase 1 dedups
  *    (key, salt, value) with map-side combine on the salted key, phase
  *    2 merges per-salt partials, so no task ever holds a hot key's full
  *    value set.
  */
object Skew {

  /** Deterministic per-row salt in [0, n): hash of the whole row's id
    * stream — stable across retries (monotonically_increasing_id is
    * partition-stable under deterministic input splits). */
  private def salt(n: Int): Column = pmod(monotonically_increasing_id(), lit(n.toLong)).cast("int")

  /** Equi-join `fact` (big, possibly skewed) with `dim` (small-ish) on
    * `key`, spreading each fact key across `saltBuckets` tasks. The dim
    * side is replicated saltBuckets-fold — size dim×n accordingly. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    // only fact-preserving joins: the dim side is replicated n-fold, so a
    // right/full outer join would emit every unmatched dim row n times
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins only (got $joinType): " +
        "the replicated dim side would duplicate unmatched rows under outer semantics")
    val saltedFact = fact.withColumn("__salt", salt(saltBuckets))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Per-key exact distinct count of `value`, skew-spread: dedup on the
    * SALTED key first (map-side combinable, hot key split n ways), then
    * merge the per-salt distinct counts — exact because a value always
    * salts identically within a key is NOT required: phase 1 dedups
    * (key, salt, value) triples, phase 2 dedups (key, value) pairs that
    * survived, so each surviving pair is counted once. */
  def saltedDistinct(df: DataFrame, key: Column, value: Column,
                     saltBuckets: Int = 32): DataFrame =
    df.select(key.as("key"), value.as("v"), salt(saltBuckets).as("__salt"))
      .groupBy(col("key"), col("__salt"), col("v")).agg(count(lit(1)).as("__c"))
      .groupBy(col("key"), col("v")).agg(count(lit(1)).as("__c2"))
      .groupBy(col("key")).agg(count(lit(1)).as("n_distinct"))
}
