package graft.workflow

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guards the q560 frozen SELECTED-model scorer end-to-end: q560 ships
  * lr_reg0's coefficients frozen by tools/FreezeSelectedModel, but
  * nothing in the gate itself asserts the selector still PICKS lr_reg0
  * on the fixture — a silent winner flip (Spark upgrade, grid change,
  * fixture regeneration) would orphan the frozen table while q560
  * stayed green. This spec replays the exact q37/freeze selector flow
  * on the sf0.01 embeddings fixture and asserts the winner's identity
  * and validation auROC, so any flip fails loudly HERE with the
  * instruction to re-run the freeze tool. */
class SelectorStabilitySpec extends SparkSpec {

  test("ModelSelector still picks lr_reg0 on the freeze fixture (q560 guard)") {
    val sfDir = "/root/testdata/sf0.01"
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .withColumn("emb_d", transform(col("embedding"), x => x.cast("double")))
      .withColumn("y", (col("label") < 5).cast("double"))
    val fVec = Feature.raw("emb_d", FeatureKind.VectorK)
    val fLab = Feature.raw("y", FeatureKind.RealK, isResponse = true)
    val sel = ModelSelector.binary(fVec, fLab, "sel",
      ModelSelector.binaryDefaults(fVec, fLab, "sel"),
      ModelSelector.TrainValidationSplit(0.75))
    new Workflow(sel.outputFeatures).fit(emb)
    assert(sel.bestName == "lr_reg0",
      s"selector winner flipped to ${sel.bestName} — re-run " +
        "graft.tools.FreezeSelectedModel and update FrozenSelectedLr")
    // validation auROC recorded at freeze time: 0.446860 (seed-42 TVS;
    // labels are noise vs the embeddings, so < 0.5 is expected). The
    // band absorbs partial-sum order jitter across thread counts, not
    // model changes.
    val metric = sel.results.find(_.name == "lr_reg0").get.metric
    assert(math.abs(metric - 0.446860) < 0.02,
      s"lr_reg0 auROC $metric drifted from the frozen-time 0.446860")
    // and the pick is a strict argmax, not a tie resolved by luck
    val others = sel.results.filter(_.name != "lr_reg0").map(_.metric)
    assert(others.forall(_ < metric),
      s"lr_reg0 no longer a strict winner: $metric vs ${others.mkString(",")}")
  }
}
