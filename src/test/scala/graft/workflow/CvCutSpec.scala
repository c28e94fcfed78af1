package graft.workflow

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** cutDAG semantics (reference FitStagesUtil.cutDAG:302): under
  * Workflow.fitWithCvCut, label-dependent estimators refit on every
  * validation split (leakage control) while label-free estimators fit
  * exactly once. */
class CvCutSpec extends SparkSpec {

  lazy val df = {
    val s = spark; import s.implicits._
    (1 to 60).map { i =>
      val x = (i % 23).toDouble
      (i.toLong, x, if (x > 11) 1.0 else 0.0)
    }.toDF("id", "x", "y")
  }

  test("fitWithCvCut: label-dependent refit per fold, label-free fit once") {
    val s = spark
    val Seq(_, x, y) = Feature.fromSchema(df.schema, response = Some("y"))
    val freeFits = new AtomicInteger(0)
    val supFits = new AtomicInteger(0)

    val freeStage = new ColumnEstimator("countingFree", Seq(x)) {
      def outputNames = Seq("x_c")
      def fitExpressions(d: DataFrame): Seq[(String, org.apache.spark.sql.Column)] = {
        freeFits.incrementAndGet()
        Seq("x_c" -> (col(x.name) * 1.0))
      }
    }
    val supStage = new ColumnEstimator("countingSupervised",
        Seq(freeStage.outputFeatures.head, y)) {
      def outputNames = Seq("x_s")
      def fitExpressions(d: DataFrame): Seq[(String, org.apache.spark.sql.Column)] = {
        supFits.incrementAndGet()
        Seq("x_s" -> (col("x_c") + 0.0))
      }
    }
    val vec = Stages.assemble(Seq(supStage.outputFeatures.head), "fv")
    val sel = ModelSelector.binary(vec.outputFeatures.head, y, "m",
      candidates = Seq(
        "lr0" -> MLStages.logisticRegression(vec.outputFeatures.head, y, "m", maxIter = 10),
        "lr01" -> MLStages.logisticRegression(vec.outputFeatures.head, y, "m",
          maxIter = 10, regParam = 0.1)),
      validation = ModelSelector.KFold(3))

    val model = Workflow.fitWithCvCut(sel.outputFeatures, df)
    assert(freeFits.get == 1, s"label-free stage fit ${freeFits.get} times")
    assert(supFits.get == 3 + 1, s"supervised stage fit ${supFits.get} times (want folds+final)")
    assert(sel.bestName != null && sel.results.length == 2)

    val out = model.score(df, keep = Seq("id"))
    assert(out.columns.toSet == Set("id", "m_prediction", "m_prob_1"))
    assert(out.count() == 60)
  }

  test("decisionTreeBucketize is a label-dependent stage and buckets by fitted thresholds") {
    val s = spark
    val Seq(_, x, y) = Feature.fromSchema(df.schema, response = Some("y"))
    val st = Stages.decisionTreeBucketize(x, y, "x_b")
    assert(st.inputs.exists(_.isResponse))
    val out = new Workflow(st.outputFeatures).fit(df)
      .score(df, keep = Seq("id", "x", "y"))
    // the tree must split near the label boundary (x > 11)
    val byBucket = out.groupBy("x_b").agg(min("x").as("lo"), max("x").as("hi"))
      .orderBy("x_b").collect()
    assert(byBucket.length >= 2)
    val bucketOfLow = out.where(col("x") <= 11).select("x_b").distinct().collect()
    val bucketOfHigh = out.where(col("x") > 11).select("x_b").distinct().collect()
    assert(bucketOfLow.map(_.getInt(0)).toSet.intersect(
      bucketOfHigh.map(_.getInt(0)).toSet).isEmpty)
  }
}
