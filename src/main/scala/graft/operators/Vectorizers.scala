package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fit-then-transform vectorization operators (reference §2.6): one-hot
  * top-K pivot, imputation with null indicators, standard scaling,
  * bucketizing, percentile calibration, string indexing. The "fit" pass
  * is an aggregation (counts / moments / quantiles) joined back to the
  * rows — both halves stay declarative so Catalyst plans one broadcast
  * join of tiny fitted stats against the full table.
  *
  * Determinism conventions copied from the reference:
  * top-K and indexer order is (-count, value) — count desc, value asc —
  * (reference OpOneHotVectorizer.scala:103, OpStringIndexer freq order);
  * indicator slots append Other then Null (TransmogrifierDefaults).
  *
  * Scale: fitted stats are O(cardinality) / O(1) rows — always
  * broadcastable; the transform side is a row-local projection.
  */
object Vectorizers {

  /** Fit half of the one-hot pivot: values with support >= minSupport,
    * ranked 1..k by (count desc, value asc). */
  def topKByCount(df: DataFrame, value: Column, k: Int, minSupport: Long): DataFrame =
    df.groupBy(value.as("value")).agg(count(lit(1)).as("cnt"))
      .where(col("value").isNotNull && col("cnt") >= minSupport)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("value").asc)))
      .where(col("rank") <= k)
      .select(col("value"), col("rank"))

  /** Transform half: indicator columns slot_1..slot_k plus slot_other
    * (non-null value outside top-K) and slot_null. */
  def oneHotColumns(valueInRow: Column, rankCol: Column, k: Int): Seq[Column] =
    (1 to k).map(i => when(rankCol === i, 1).otherwise(0).as(s"slot_$i")) ++ Seq(
      when(valueInRow.isNotNull && rankCol.isNull, 1).otherwise(0).as("slot_other"),
      when(valueInRow.isNull, 1).otherwise(0).as("slot_null"))

  /** One-hot top-K pivot of `value`, keyed by `id`. One broadcast join. */
  def oneHotTopK(df: DataFrame, id: Column, value: Column, k: Int, minSupport: Long): DataFrame = {
    val fitted = topKByCount(df, value, k, minSupport)
    df.select(id.as("id"), value.as("value"))
      .join(broadcast(fitted), Seq("value"), "left")
      .select(col("id") +: oneHotColumns(col("value"), col("rank"), k): _*)
  }

  /** Mean-impute `value` (nulls filled with the non-null mean) plus a
    * null indicator — the RealVectorizer trackNulls convention. */
  def imputeMean(df: DataFrame, id: Column, value: Column): DataFrame = {
    val stats = df.agg(avg(value).as("fill"))
    df.select(id.as("id"), value.as("value")).crossJoin(broadcast(stats))
      .select(col("id"),
        coalesce(col("value"), col("fill")).as("imputed"),
        when(col("value").isNull, 1).otherwise(0).as("is_null"))
  }

  /** Z-normalize: (x - mean) / stddev_samp (OpScalarStandardScaler). */
  def standardScale(df: DataFrame, id: Column, value: Column): DataFrame = {
    val stats = df.agg(avg(value).as("mu"), stddev_samp(value).as("sigma"))
    df.select(id.as("id"), value.as("value")).crossJoin(broadcast(stats))
      .select(col("id"), ((col("value") - col("mu")) / col("sigma")).as("z"))
  }

  /** Fixed-split bucketizer: index of the right-open interval
    * [splits(i), splits(i+1)) containing x; below-first → 0-th bucket
    * "underflow" not tracked (reference NumericBucketizer inclusion
    * convention: left-closed right-open). Null → null. */
  def bucketize(value: Column, splits: Seq[Double]): Column =
    splits.sliding(2).zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (Seq(lo, hi), i)) => when(value >= lo && value < hi, i).otherwise(acc)
    }

  /** Percentile calibration to [0, 100]: floor(percent_rank * 100)
    * (reference PercentileCalibrator via QuantileDiscretizer(100)). */
  def percentile100(value: Column): Column =
    floor(percent_rank().over(Window.orderBy(value)) * 100).cast("int")

  /** StringIndexer: 0-based index by (count desc, value asc). */
  def stringIndex(df: DataFrame, id: Column, value: Column): DataFrame = {
    val idx = df.where(value.isNotNull)
      .groupBy(value.as("value")).agg(count(lit(1)).as("cnt"))
      .withColumn("idx", row_number().over(
        Window.orderBy(col("cnt").desc, col("value").asc)) - 1)
      .select(col("value"), col("idx"))
    df.select(id.as("id"), value.as("value"))
      .join(broadcast(idx), Seq("value"), "left")
      .select(col("id"), col("value"), col("idx"))
  }
}
