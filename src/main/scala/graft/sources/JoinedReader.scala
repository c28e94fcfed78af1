package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join semantics of the reference's JoinedDataReader
  * (readers/.../JoinedDataReader.scala:119-205): equi-join two keyed
  * DataFrames (inner / left_outer / full_outer only — JoinTypes.scala:35-43),
  * recursive left spine for n-way trees, then optional post-join windowed
  * re-aggregation ("secondary aggregation", JoinedDataReader.scala:234-347):
  * after a 1-to-many join, group back to the key and fold each feature
  * with its monoid, with the many-side features filtered to a time window
  * around a cutoff (TimeBasedFilter).
  *
  * Spark-first notes: the join itself is a plain `.join` — Catalyst picks
  * broadcast vs sort-merge (we hint broadcast for dimension-sized sides).
  * The secondary aggregation reuses the join's output partitioning when
  * the join key equals the group key (no extra shuffle under SMJ).
  */
object JoinedReader {
  val supportedJoinTypes: Set[String] = Set("inner", "left_outer", "full_outer")

  def join(left: DataFrame, right: DataFrame, leftKey: Column, rightKey: Column,
           joinType: String = "inner", broadcastRight: Boolean = false): DataFrame = {
    require(supportedJoinTypes.contains(joinType),
      s"join type $joinType not in $supportedJoinTypes (reference JoinTypes.scala:35-43)")
    val r = if (broadcastRight) broadcast(right) else right
    left.join(r, leftKey === rightKey, joinType)
  }

  /** Combined-key shape: `coalesce(leftKey, rightKey)` after an outer
    * join (reference JoinedDataReader.scala:135). */
  def combinedKey(leftKey: Column, rightKey: Column): Column = coalesce(leftKey, rightKey)

  /** Secondary aggregation: group the joined (1-to-many) frame back to
    * `key`; `parentSide` specs take any single value per key (all equal
    * after the join — the reference uses a "dummy" keep-one aggregator,
    * JoinedDataReader.scala:404); `manySide` specs aggregate only rows
    * whose `ts` falls in [cutoff - window, cutoff) — the TimeBasedFilter
    * predictor window (JoinedDataReader.scala:274-347).
    */
  def secondaryAggregate(
      joined: DataFrame,
      key: Column,
      parentSide: Seq[(String, Column)],
      manySide: Seq[AggSpec],
      ts: Column,
      cutoff: Column,
      window: Option[Column] = None): DataFrame = {
    val inWindow = window match {
      case Some(w) => ts >= cutoff - w && ts < cutoff
      case None    => ts < cutoff
    }
    val aggs =
      parentSide.map { case (n, c) => first(c, ignoreNulls = true).as(n) } ++
      manySide.map(s => s.agg(when(inWindow, s.value)).as(s.name))
    joined.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }
}
