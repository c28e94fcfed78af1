package graft.tools

import org.apache.spark.sql.functions._

/** One-shot provenance tool for the q523 frozen-coefficient quality
  * scorer: fits the SAME logistic regression `q120_curation_quality_
  * classifier` trains (hashed unigram+bigram counts, dims=256,
  * "is src0" label, L2 reg 0.01), quantizes the fitted coefficients to
  * 6 decimals, and prints them as the Scala array + DuckDB VALUES rows
  * that get pasted into [[graft.operators.FrozenQualityLr]]. Re-run if
  * the feature extraction or fixture ever changes:
  *
  *   sbt "runMain graft.tools.FreezeQualityLr /root/testdata/sf0.01"
  *
  * Freezing turns the not-SQL-replayable model FIT into a shipped
  * constant table, so the SCORING pass (sigmoid of an exact decimal
  * dot product) becomes hash-gateable — the q511 pattern applied to
  * q120's second half.
  */
object FreezeQualityLr {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder(
      Runtime.getRuntime.availableProcessors()).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val dims = 256
    val model = graft.operators.Curation.fitQualityLr(
      docs, col("doc_id"), col("text"), col("source") === "src0", dims)
    val w = model.coefficients.toArray.map(v => BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    val b = BigDecimal(model.intercept).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    println("GRAFT_FROZEN_LR_BEGIN")
    println(s"intercept = $b")
    println(w.zipWithIndex
      .map { case (v, i) => s"$v" + (if (i % 8 == 7) ",\n    " else ", ") }
      .mkString("weights = Array(\n    ", "", ")"))
    println("GRAFT_FROZEN_LR_END")
    spark.stop()
  }
}
