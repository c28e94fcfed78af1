package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Map-feature vectorizers (reference TextMapPivotVectorizer.scala,
  * OPMapVectorizer.scala): keys are DISCOVERED at fit time by exploding
  * the map, then each key gets the scalar vectorizer treatment — here
  * the one-hot top-K pivot with Other + Null slots and the reference's
  * (-count, value) ordering.
  *
  * Scale: the fit is one explode + groupBy((key, value)) — shuffle keyed
  * on (key, value) pairs; the fitted table is O(#keys * K) and folds
  * into row-local literal expressions for the transform, so scoring is a
  * single codegen'd projection. */
object MapVectorizers {

  /** Fitted pivot table: (key, value, rank) with rank 1..k per key by
    * (count desc, value asc), support >= minSupport. The window
    * partitions by map key — never a single-partition global sort. */
  def fitMapPivot(df: DataFrame, m: Column, k: Int, minSupport: Long): DataFrame =
    df.select(explode(m).as(Seq("k", "v")))
      .where(col("v").isNotNull)
      .groupBy(col("k"), col("v")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minSupport)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("cnt").desc, col("v").asc)))
      .where(col("rank") <= k)
      .select(col("k"), col("v"), col("rank"))

  /** TextMapPivotVectorizer: one-hot columns `<key>_1..k`, `<key>_other`,
    * `<key>_null` for every discovered key. The fitted table is
    * collected (O(#keys * K) rows — map keys are schema-like) and folded
    * into literal when-expressions. */
  def textMapPivot(df: DataFrame, id: Column, m: Column, k: Int,
                   minSupport: Long = 1): DataFrame = {
    val fitted: Map[String, Seq[String]] = fitMapPivot(df, m, k, minSupport)
      .collect()
      .groupBy(_.getString(0))
      .map { case (key, rows) =>
        key -> rows.sortBy(_.getInt(2)).map(_.getString(1)).toSeq
      }
    val slotCols = fitted.toSeq.sortBy(_._1).flatMap { case (key, vals) =>
      val cell = element_at(m, key)
      val tops = (1 to k).map { i =>
        val c = if (i <= vals.length) when(cell === lit(vals(i - 1)), 1).otherwise(0) else lit(0)
        c.as(s"${key}_$i")
      }
      tops ++ Seq(
        when(cell.isNotNull && !cell.isin(vals: _*), 1).otherwise(0).as(s"${key}_other"),
        when(cell.isNull, 1).otherwise(0).as(s"${key}_null"))
    }
    df.select(id.as("id") +: slotCols: _*)
  }
}
