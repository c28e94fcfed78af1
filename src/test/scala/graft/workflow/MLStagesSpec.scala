package graft.workflow

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MLStagesSpec extends SparkSpec {

  lazy val binTrain = {
    val s = spark; import s.implicits._
    (1 to 120).map { i =>
      val a = (i % 11).toDouble; val b = (i % 5).toDouble
      (i.toLong, Array(a, b), if (a + 2 * b > 8) 1.0 else 0.0)
    }.toDF("id", "emb", "y")
  }

  test("wrapped classifiers fit and score through the workflow") {
    val Seq(_, fEmb, fY) = Feature.fromSchema(binTrain.schema, response = Some("y"))
    for (mk <- Seq(
        MLStages.gbtClassifier(fEmb, fY, "m", maxIter = 5),
        MLStages.decisionTreeClassifier(fEmb, fY, "m"),
        MLStages.naiveBayes(fEmb, fY, "m"),
        MLStages.linearSVC(fEmb, fY, "m", maxIter = 10))) {
      val model = new Workflow(mk.outputFeatures).fit(binTrain)
      val scored = model.score(binTrain, keep = Seq("id", "y"))
      assert(scored.count() == 120)
      assert(scored.columns.contains("m_prediction"))
      val acc = scored.where(col("m_prediction") === col("y")).count().toDouble / 120
      // NB's multinomial likelihood is a mismatch for a linear threshold
      // task — only require better-than-chance there
      val floor = if (mk.name == "naiveBayes") 0.5 else 0.8
      assert(acc > floor, s"${mk.name} accuracy $acc")
    }
  }

  test("wrapped regressors fit and score") {
    val s = spark; import s.implicits._
    val reg = (1 to 120).map { i =>
      val a = (i % 11).toDouble; val b = (i % 5).toDouble
      (i.toLong, Array(a, b), 3 * a - 2 * b + 1)
    }.toDF("id", "emb", "y")
    val Seq(_, fEmb, fY) = Feature.fromSchema(reg.schema, response = Some("y"))
    for (mk <- Seq(
        MLStages.gbtRegressor(fEmb, fY, "m", maxIter = 5),
        MLStages.randomForestRegressor(fEmb, fY, "m"),
        MLStages.decisionTreeRegressor(fEmb, fY, "m"),
        MLStages.glmRegressor(fEmb, fY, "m"))) {
      val model = new Workflow(mk.outputFeatures).fit(reg)
      val scored = model.score(reg, keep = Seq("id", "y"))
      val rmse = MLTuning.regressionMetrics(scored, "m_prediction", "y").rmse
      assert(rmse < 5.0, s"${mk.name} rmse $rmse")
    }
  }

  test("multiclassMetrics match hand-computed confusion values") {
    val s = spark; import s.implicits._
    // labels: 0,0,0,1,1,2 ; preds: 0,1,0,1,1,0
    // acc = 4/6; per-class: c0 tp=2 predC=3 labC=3 -> p=2/3 r=2/3 f1=2/3
    // c1 tp=2 predC=3 labC=2 -> p=2/3 r=1 f1=0.8 ; c2 tp=0 -> 0
    // weighted: p = (2/3*3 + 2/3*2 + 0)/6 = 10/18; r = (2+2+0)/6 = 2/3...
    // r = (2/3*3 + 1*2 + 0)/6 = 4/6 ; f1 = (2/3*3 + 0.8*2 + 0)/6 = 3.6/6
    val df0 = Seq((0, 0), (0, 1), (0, 0), (1, 1), (1, 1), (2, 0)).toDF("y", "p")
    val m = MLTuning.multiclassMetrics(df0, "p", "y")
    assert(math.abs(m.accuracy - 4.0 / 6) < 1e-12)
    assert(math.abs(m.weightedPrecision - 10.0 / 18) < 1e-12)
    assert(math.abs(m.weightedRecall - 4.0 / 6) < 1e-12)
    assert(math.abs(m.weightedF1 - 3.6 / 6) < 1e-12)
  }

  test("decisionTreeBuckets recovers a planted threshold") {
    val s = spark; import s.implicits._
    val df0 = (1 to 200).map(i => (i.toDouble / 2.0, if (i / 2.0 >= 50.0) 1.0 else 0.0))
      .toDF("v", "y")
    val th = MLStages.decisionTreeBuckets(df0, col("v"), col("y"), maxDepth = 1)
    assert(th.length == 1)
    assert(th.head >= 49.0 && th.head < 50.5, s"threshold ${th.head}")
    val bucketed = df0.select(col("v"),
      MLStages.bucketizeByThresholds(col("v"), th).as("b"))
    assert(bucketed.where(col("v") < 49.0 && col("b") =!= 0).count() == 0)
    assert(bucketed.where(col("v") > 50.5 && col("b") =!= 1).count() == 0)
  }

  test("new predictor kinds round-trip through ModelIO") {
    val Seq(_, fEmb, fY) = Feature.fromSchema(binTrain.schema, response = Some("y"))
    val gbt = MLStages.gbtClassifier(fEmb, fY, "m", maxIter = 3)
    val model = new Workflow(gbt.outputFeatures).fit(binTrain)
    val orig = model.score(binTrain, keep = Seq("id")).orderBy("id").collect()
    val dir = java.nio.file.Files.createTempDirectory("graft_gbt").toString
    ModelIO.save(model, dir, spark)
    val replay = ModelIO.load(spark, dir).score(binTrain, keep = Seq("id")).orderBy("id").collect()
    assert(orig.map(_.toSeq).toSeq == replay.map(_.toSeq).toSeq)
  }

  test("mlpClassifier round-trips through ModelIO") {
    val Seq(_, fEmb, fY) = Feature.fromSchema(binTrain.schema, response = Some("y"))
    val mlp = MLStages.mlpClassifier(fEmb, fY, "m",
      layers = Seq(2, 4, 2), maxIter = 10)
    val model = new Workflow(mlp.outputFeatures).fit(binTrain)
    val orig = model.score(binTrain, keep = Seq("id")).orderBy("id").collect()
    val dir = java.nio.file.Files.createTempDirectory("graft_mlp").toString
    ModelIO.save(model, dir, spark)
    val replay = ModelIO.load(spark, dir).score(binTrain, keep = Seq("id")).orderBy("id").collect()
    assert(orig.map(_.toSeq).toSeq == replay.map(_.toSeq).toSeq)
  }

  test("conformalIntervals picks the exact conformal rank residual as qhat") {
    val s = spark; import s.implicits._
    // calibration residuals |y - pred| = 1..10 (pred = 0); n = 10,
    // alpha = 0.2 -> rank ceil(11 * 0.8) = 9 -> qhat = 9.0
    val cal = (1 to 10).map(i => (i.toLong, i.toDouble, 0.0)).toDF("id", "y", "p")
    val test = Seq((100L, 5.0, 3.0), (101L, 20.0, 3.0)).toDF("id", "y", "p")
    val out = MLTuning.conformalIntervals(cal, test, col("id"), col("y"), col("p"), 0.2)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toMap
    assert(out(100L) == ((3.0, -6.0, 12.0, 1)))  // |5-3|=2 <= 9 -> covered
    assert(out(101L) == ((3.0, -6.0, 12.0, 0)))  // |20-3|=17 > 9
  }

  test("conformalIntervals yields null bounds when alpha is too small for n_cal") {
    val s = spark; import s.implicits._
    val cal = (1 to 3).map(i => (i.toLong, i.toDouble, 0.0)).toDF("id", "y", "p")
    val test = Seq((9L, 1.0, 0.0)).toDF("id", "y", "p")
    // alpha = 0.1 < 1/(n+1) = 0.25 -> conformal interval unbounded -> null lo/hi
    val r = MLTuning.conformalIntervals(cal, test, col("id"), col("y"), col("p"), 0.1)
      .collect().head
    assert(r.isNullAt(2) && r.isNullAt(3) && r.getInt(4) == 0)
  }

  test("alsRecommend recovers block preference structure") {
    val s = spark; import s.implicits._
    // users 0-7 rate items 0-3 high and 4-7 low; users 8-15 the reverse
    val ratings = for {
      u <- 0 until 16; i <- 0 until 8
      inBlockA = u < 8; itemA = i < 4
    } yield (u, i, if (inBlockA == itemA) 5.0 else 1.0)
    val df = ratings.toDF("u", "i", "r")
    val recs = MLTuning.alsRecommend(df, col("u"), col("i"), col("r"),
        rank = 4, topK = 2, maxIter = 15)
      .as[(Int, Int, Int)].collect()
    assert(recs.length == 32) // 16 users x top-2
    // the TOP recommendation must come from the user's preferred block;
    // deeper ranks may leak across under regularization
    recs.filter(_._2 == 1).foreach { case (u, _, item) =>
      assert((u < 8) == (item < 4), s"user $u top-rec is cross-block item $item")
    }
    val inBlock = recs.count { case (u, _, item) => (u < 8) == (item < 4) }
    assert(inBlock >= 28, s"only $inBlock/32 recommendations in-block")
  }
}
