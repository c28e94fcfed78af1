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

  /** Keyed snapshot reconciliation: classify every key across two
    * table versions as added / removed / changed / unchanged by
    * comparing an md5 digest of the tracked payload columns. ONE full
    * outer join on the key — the nightly diff that validates a
    * migration or an incremental load against its source, emitting the
    * per-key status frame (aggregate downstream for the scoreboard).
    * Digest comparison keeps the shuffle payload at two hashes per key
    * regardless of row width. */
  def snapshotDiff(old: DataFrame, oldKey: Column, newDf: DataFrame,
                   newKey: Column, payload: Seq[Column]): DataFrame = {
    require(payload.nonEmpty, "snapshotDiff needs payload columns")
    // concat_ws silently DROPS null arguments, which would collide rows
    // differing only in null placement -- (null,"x") vs ("x",null), null
    // vs "" -- and misclassify them "unchanged". Encode each column as an
    // explicit null bit + coalesced value so the digest is injective
    // over null placement; every concat_ws argument is then non-null,
    // with the same chr(1) separator between all pieces.
    def digested(df: DataFrame, k: Column, tag: String) =
      df.select(k.as(s"k_$tag"),
        md5(concat_ws("\u0001",
          payload.flatMap(c => Seq(
            when(c.isNull, lit("0")).otherwise(lit("1")),
            coalesce(c.cast("string"), lit("")))): _*))
          .as(s"h_$tag"))
    digested(old, oldKey, "old")
      .join(digested(newDf, newKey, "new"),
        col("k_old") === col("k_new"), "full_outer")
      .select(coalesce(col("k_old"), col("k_new")).as("key"),
        when(col("k_old").isNull, "added")
          .when(col("k_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Column-level drill-down for keys [[snapshotDiff]] classifies as
    * "changed": per tracked column, how many changed keys differ in
    * THAT column — the scoreboard that turns "12k rows changed" into
    * "the price column moved on 11k of them". One inner join of the
    * two versions on the changed keys' ids, then a single aggregation
    * of per-column null-safe inequality flags. Null-safe (<=>): a
    * null→value or value→null transition counts as a change. */
  def snapshotColumnDiff(old: DataFrame, oldKey: Column, newDf: DataFrame,
                         newKey: Column, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "snapshotColumnDiff needs payload columns")
    val joined = old.select(oldKey.as("__k") +: payload.map(c =>
        col(c).as(s"__old_$c")): _*)
      .join(newDf.select(newKey.as("__k") +: payload.map(c =>
        col(c).as(s"__new_$c")): _*), "__k")
    val flags = payload.map(c =>
      sum(when(!(col(s"__old_$c") <=> col(s"__new_$c")), 1L).otherwise(0L))
        .as(s"__n_$c"))
    val agg = joined.agg(count(lit(1)).as("__n_common"), flags: _*)
    agg.select(explode(array(payload.map(c =>
        struct(lit(c).as("column"), col("__n_common").as("n_common_keys"),
          col(s"__n_$c").as("n_changed"),
          round(col(s"__n_$c").cast("double") /
            greatest(col("__n_common"), lit(1L)).cast("double"), 6)
            .as("changed_ratio"))): _*)).as("r"))
      .select(col("r.column"), col("r.n_common_keys"), col("r.n_changed"),
        col("r.changed_ratio"))
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
