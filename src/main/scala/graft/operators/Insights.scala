package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis.hash60

/** Record-level model explanation (reference insights/
  * RecordInsightsLOCO.scala:100-117): leave-one-covariate-out score
  * deltas over vector slots, top-K per record by |delta| with a
  * deterministic slot tiebreak.
  *
  * For a linear scorer (logistic margin) LOCO is analytic —
  * delta_i = sigmoid(m) - sigmoid(m - w_i*x_i) — so the whole insight
  * is a row-local Column expression: no per-slot re-scoring pass, no
  * shuffle, O(dims) work per row. For tree models fall back to actual
  * re-scoring (not implemented — the reference also special-cases by
  * model family).
  */
object Insights {

  private def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  /** Deterministic md5-derived weight vector in [-1, 1), same family as
    * the SRP hyperplanes — lets the differential oracle replay LOCO
    * without training a model. */
  def md5Weights(emb: Column, salt: String): Column =
    transform(sequence(lit(0), size(emb) - 1),
      i => hash60(concat_ws(":", lit(salt), i)).cast("double") / 1.152921504606846976e18 * 2.0 - 1.0)

  /** LOCO top-K for a linear-logistic scorer given a per-row weights
    * column (literal weights from a trained LR, or [[md5Weights]]).
    * Output: (id, dim, loco, rank) — k rows per record, ranked by
    * |loco| desc with dim-asc tiebreak. */
  def locoLinearTopK(df: DataFrame, id: Column, emb: Column, weights: Column,
                     intercept: Double, k: Int): DataFrame = {
    val e = df.select(id.as("id"),
        zip_with(emb, weights, (x, w) => x * w).as("contribs"))
      .withColumn("margin",
        aggregate(col("contribs"), lit(intercept), (acc, x) => acc + x))
    e.select(col("id"), col("margin"),
        posexplode(col("contribs")).as(Seq("dim", "c")))
      .withColumn("loco", sigmoid(col("margin")) - sigmoid(col("margin") - col("c")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("id")).orderBy(abs(col("loco")).desc, col("dim").asc)))
      .where(col("rank") <= k)
      .select(col("id"), col("dim"), round(col("loco"), 6).as("loco"), col("rank"))
  }

  /** LOCO against a trained spark.ml LogisticRegressionModel: its
    * coefficients fold in as a literal array (broadcast-safe). */
  def locoForLR(df: DataFrame, id: Column, emb: Column,
                model: org.apache.spark.ml.classification.LogisticRegressionModel,
                k: Int): DataFrame =
    locoLinearTopK(df, id, emb, lit(model.coefficients.toArray), model.intercept, k)

  /** Model-agnostic LOCO by re-scoring (the reference's general path):
    * delta_i = score(x) - score(x with slot i zeroed), computed with the
    * model's local `predictProbability` inside one UDF — dims+1 local
    * predictions per row, no per-slot Spark pass. Use for tree
    * ensembles, where the analytic linear form doesn't apply. */
  def locoByRescoring(df: DataFrame, id: Column, emb: Column,
                      model: org.apache.spark.ml.classification.ProbabilisticClassificationModel[org.apache.spark.ml.linalg.Vector, _],
                      k: Int): DataFrame = {
    val deltas = udf { (a: Seq[Double]) =>
      val arr = a.toArray
      val base = model.predictProbability(org.apache.spark.ml.linalg.Vectors.dense(arr))(1)
      Array.tabulate(arr.length) { i =>
        val saved = arr(i); arr(i) = 0.0
        val d = base - model.predictProbability(org.apache.spark.ml.linalg.Vectors.dense(arr.clone()))(1)
        arr(i) = saved
        d
      }
    }
    df.select(id.as("id"), posexplode(deltas(emb)).as(Seq("dim", "loco")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("id")).orderBy(abs(col("loco")).desc, col("dim").asc)))
      .where(col("rank") <= k)
      .select(col("id"), col("dim"), round(col("loco"), 6).as("loco"), col("rank"))
  }

  /** Correlation-based record insights (reference insights/
    * RecordInsightsCorr.scala): Pearson correlation of every vector slot
    * against the model score, ranked by |corr| desc with dim-asc
    * tiebreak. ONE aggregation pass: slots posexplode to (dim, x, score)
    * and corr() runs per dim — a hash aggregation keyed on dim, never a
    * per-slot job. */
  def corrInsights(df: DataFrame, emb: Column, score: Column): DataFrame =
    df.select(score.as("s"), posexplode(emb).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(corr(col("x"), col("s")).as("corr_raw"))
      .withColumn("correlation", round(col("corr_raw"), 6))
      .withColumn("rank", row_number().over(
        Window.orderBy(abs(coalesce(col("corr_raw"), lit(0.0))).desc, col("dim").asc)))
      .select(col("dim"), col("correlation"), col("rank"))
}
