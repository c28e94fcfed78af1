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

  test("decisionTreeMapBucketize: per-key splits match the scalar fit; no-split keys emit only the null slot") {
    val s = spark; import s.implicits._
    // label is a pure function of key "a" (x > 11); key "flat" is the
    // constant 1.0 -> no informative split (reference shouldSplit=false)
    val mdf = (1 to 60).map { i =>
      val x = (i % 23).toDouble
      (i.toLong, x, 1.0, if (x > 11) 1.0 else 0.0)
    }.toDF("id", "a", "flat", "y")
      .select(col("id"),
        map(lit("a"), col("a"), lit("flat"), col("flat")).as("nm"), col("y"))
    val fMap = Feature.raw("nm", FeatureKind.RealMapK)
    val fLab = Feature.raw("y", FeatureKind.RealK, isResponse = true)
    val st = Stages.decisionTreeMapBucketize(fMap, fLab, "nm_b")
    assert(st.inputs.exists(_.isResponse)) // label-dependent under cutDAG
    val out = new Workflow(st.outputFeatures).fit(mdf)
      .score(mdf, keep = Seq("id", "y")).orderBy("id")
      .select(col("id"), col("y"), col("nm_b")).as[(Long, Double, Seq[Double])].collect()

    // per-key fit equality with the scalar path
    val scalarA = MLStages.decisionTreeBuckets(
      mdf.select(element_at(col("nm"), "a").as("a"), col("y")), col("a"), col("y"))
    val fitted = MLStages.decisionTreeMapBuckets(mdf, col("nm"), col("y"))
    assert(fitted.map(_._1) == Seq("a", "flat"))
    assert(fitted.toMap.apply("a") == scalarA && scalarA.nonEmpty)
    assert(fitted.toMap.apply("flat").isEmpty)

    // vector layout: a's one-hot buckets + a-null, then flat-null only
    val aSlots = scalarA.length + 1
    assert(out.head._3.length == aSlots + 1 + 1)
    // the label classes never share a bucket slot (the tree split at the
    // label boundary), and exactly one bucket fires per row
    val byClass = out.groupBy(_._2).map { case (c, rows) =>
      c -> rows.map(_._3.take(aSlots).indexOf(1.0)).toSet
    }
    assert(byClass(0.0).intersect(byClass(1.0)).isEmpty)
    assert(out.forall(_._3.take(aSlots).count(_ == 1.0) == 1))
    // no nulls anywhere -> both null slots stay 0
    assert(out.forall(r => r._3(aSlots) == 0.0 && r._3(aSlots + 1) == 0.0))
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
