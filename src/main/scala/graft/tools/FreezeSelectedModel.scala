package graft.tools

import org.apache.spark.sql.functions._

/** One-shot provenance tool for the q560 frozen SELECTED-model scorer:
  * replays q37's ModelSelector flow (LR grid + RF grid, train/validation
  * split 0.75, seed 42, auROC-maximizing best pick) on the embeddings
  * fixture, confirms the deterministic winner is a logistic regression,
  * refits that winner on the full frame exactly as
  * `ModelSelectorStage.fitCut` does, and prints the 6-decimal-quantized
  * coefficients as the Scala array + intercept to paste into
  * [[graft.operators.FrozenSelectedLr]]. Re-run if the fixture or the
  * selector defaults ever change:
  *
  *   sbt "runMain graft.tools.FreezeSelectedModel /root/testdata/sf0.01"
  *
  * Same pattern as [[FreezeQualityLr]] (q120 → q523): the model FIT is
  * not SQL-replayable and stays rows-only (q37); freezing the selected
  * coefficients makes the SCORING half — sigmoid of an exact integer
  * dot product over 1e6-quantized embeddings — hash-gateable, and is
  * the production shape: select once, ship constants, score 100 TB.
  */
object FreezeSelectedModel {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder(
      Runtime.getRuntime.availableProcessors()).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.workflow._
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .withColumn("emb_d", transform(col("embedding"), x => x.cast("double")))
      .withColumn("y", (col("label") < 5).cast("double"))
    val fVec = Feature.raw("emb_d", FeatureKind.VectorK)
    val fLab = Feature.raw("y", FeatureKind.RealK, isResponse = true)
    val sel = ModelSelector.binary(fVec, fLab, "sel",
      ModelSelector.binaryDefaults(fVec, fLab, "sel"),
      ModelSelector.TrainValidationSplit(0.75))
    new Workflow(sel.outputFeatures).fit(emb)
    println(s"bestName = ${sel.bestName}")
    println(sel.results.map(r => s"  ${r.name}: ${r.metric}").mkString("\n"))
    val regParam = sel.bestName match {
      case "lr_reg0" => 0.0
      case "lr_reg01" => 0.1
      case other =>
        sys.error(s"winner is $other, not an LR — freezing does not apply")
    }
    // refit the winner on the full frame, exactly what fitCut ships
    val prepared = emb.select(
      org.apache.spark.ml.functions.array_to_vector(col("emb_d")).as("__features"),
      col("y").as("__label"))
    val model = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(30).setRegParam(regParam)
      .setFeaturesCol("__features").setLabelCol("__label")
      .fit(prepared)
    val w = model.coefficients.toArray.map(v => BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    val b = BigDecimal(model.intercept).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    println("GRAFT_FROZEN_SEL_BEGIN")
    println(s"intercept = $b")
    println(w.zipWithIndex
      .map { case (v, i) => "\"" + v + "\"" + (if (i % 6 == 5) ",\n    " else ", ") }
      .mkString("weights = IndexedSeq(\n    ", "", ")"))
    println("GRAFT_FROZEN_SEL_END")
    spark.stop()
  }
}
