package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance over algebraic aggregates: a keyed
  * aggregate is kept as a MERGEABLE state (count, decimal sum, min,
  * max per metric); new data folds into its own state and merges with
  * the standing state by re-aggregating the union — no rescan of the
  * base data, ever. The warehouse pattern that keeps a 100 TB rollup
  * fresh for the cost of the day's delta: state rows are bounded by the
  * key domain, the merge is one hash aggregation with map-side combine,
  * and every stored statistic is algebraic (sum/count/min/max — avg and
  * friends derive at read time in [[readout]]). Sums are exact
  * DECIMAL(38,6): merging is associative AND bit-reproducible in any
  * fold order, which a double sum would not be.
  */
object Incremental {

  /** Fold raw rows into a mergeable aggregate state: per key and per
    * metric column m, emits `m_cnt`, `m_sum`, `m_min`, `m_max`. */
  def aggState(df: DataFrame, keys: Seq[Column],
               metrics: Seq[(String, Column)]): DataFrame = {
    require(metrics.nonEmpty, "aggState needs at least one metric")
    val aggs = metrics.flatMap { case (name, c) =>
      val v = c.cast("decimal(18,6)")
      Seq(count(v).as(s"${name}_cnt"),
        sum(v).cast("decimal(38,6)").as(s"${name}_sum"),
        min(v).as(s"${name}_min"), max(v).as(s"${name}_max"))
    }
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of states produced by [[aggState]] with the same
    * keys and metric names: union + one re-aggregation (count and sum
    * add, min/max fold — all algebraic). */
  def mergeStates(keys: Seq[String], metricNames: Seq[String],
                  states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state")
    val unioned = states.reduce(_ unionByName _)
    val aggs = metricNames.flatMap { m =>
      Seq(sum(col(s"${m}_cnt")).as(s"${m}_cnt"),
        sum(col(s"${m}_sum")).cast("decimal(38,6)").as(s"${m}_sum"),
        min(col(s"${m}_min")).as(s"${m}_min"),
        max(col(s"${m}_max")).as(s"${m}_max"))
    }
    unioned.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Read-time derivation over a state: per metric, count / sum / mean
    * (sum over count, double) / min / max. */
  def readout(state: DataFrame, keys: Seq[String],
              metricNames: Seq[String]): DataFrame = {
    val cols = keys.map(col) ++ metricNames.flatMap { m =>
      Seq(col(s"${m}_cnt"),
        col(s"${m}_sum").cast("double").as(s"${m}_sum"),
        round(col(s"${m}_sum").cast("double") /
          col(s"${m}_cnt").cast("double"), 6).as(s"${m}_mean"),
        col(s"${m}_min").cast("double").as(s"${m}_min"),
        col(s"${m}_max").cast("double").as(s"${m}_max"))
    }
    state.select(cols: _*)
  }
}
