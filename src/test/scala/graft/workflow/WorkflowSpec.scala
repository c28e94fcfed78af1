package graft.workflow

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.workflow.FeatureKind._

class WorkflowSpec extends SparkSpec {

  lazy val df = {
    val s = spark; import s.implicits._
    Seq[(Long, Option[Double], String)]((1L, Some(10.0), "a"), (2L, Some(20.0), "b"), (3L, None, "a"))
      .toDF("id", "x", "cat")
  }

  test("fromSchema infers kinds") {
    val fs = Feature.fromSchema(df.schema)
    assert(fs.map(_.kind) == Seq(IntegralK, RealK, TextK))
    assert(fs.forall(_.isRaw))
  }

  test("plan layers by distance and dedups shared stages") {
    val Seq(_, x, cat) = Feature.fromSchema(df.schema)
    val imp = Stages.imputeMean(x, "x_f") // layer 2 (shared parent)
    val imputed = imp.outputFeatures.head
    val scaled = Stages.standardScale(imputed, "x_z") // layer 1, child of imp
    val hot = Stages.oneHotTopK(cat, "cat", 2) // layer 1 (independent)
    val wf = new Workflow(scaled.outputFeatures ++ hot.outputFeatures ++ Seq(imputed))
    val layers = wf.plan()
    assert(layers.length == 2)
    assert(layers.head.map(_.uid) == Seq(imp.uid)) // farthest first
    assert(layers(1).map(_.uid).toSet == Set(scaled.uid, hot.uid))
    // imp appears once even though it is both a result's origin and a parent
    assert(layers.flatten.map(_.uid).distinct.length == layers.flatten.length)
  }

  test("fit + score computes fitted pipeline") {
    val Seq(_, x, _) = Feature.fromSchema(df.schema)
    val imp = Stages.imputeMean(x, "x_f")
    val model = new Workflow(imp.outputFeatures).fit(df)
    val out = model.score(df, keep = Seq("id")).orderBy("id").collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(10.0, 20.0, 15.0)) // null -> mean
    assert(out.map(_.getInt(2)).toSeq == Seq(0, 0, 1)) // indicator
  }

  test("layer fusion: row-level stages collapse into the scan projection") {
    val Seq(_, x, _) = Feature.fromSchema(df.schema)
    val a = ColumnStage("double", Seq(x), "x2", RealK)(c => c.head * 2)
    val b = ColumnStage("square", Seq(x), "xx", RealK)(c => c.head * c.head)
    val scored = new Workflow(a.outputFeatures ++ b.outputFeatures)
      .fit(df).score(df, keep = Seq("id"))
    val plan = scored.queryExecution.optimizedPlan.toString()
    // both expressions live in ONE Project over the relation (or the
    // optimizer folded everything into the LocalRelation — zero Projects)
    assert(plan.split("Project").length <= 2, s"expected at most one Project:\n$plan")
  }

  test("fitWithRawFeatureFilter purges features built on dropped raws") {
    val s = spark; import s.implicits._
    // "bad" is mostly null in train (fails minFill); "x" is healthy
    val train = Seq[(Long, Option[Double], Option[Double])](
      (1L, Some(1.0), None), (2L, Some(2.0), None),
      (3L, Some(3.0), Some(9.0)), (4L, Some(4.0), None)
    ).toDF("id", "x", "bad")
    val Seq(_, x, bad) = Feature.fromSchema(train.schema)
    val goodStage = Stages.imputeMean(x, "x_f")
    val badStage = Stages.imputeMean(bad, "bad_f")
    val (model, dropped) = Workflow.fitWithRawFeatureFilter(
      goodStage.outputFeatures ++ badStage.outputFeatures,
      train, train, minFill = 0.5, maxFillDifference = 1.0)
    assert(dropped == Seq("bad"))
    val out = model.score(train, keep = Seq("id"))
    assert(out.columns.contains("x_f"))
    assert(!out.columns.exists(_.startsWith("bad")))
  }

  test("binaryMetrics F1/accuracy match hand-computed confusion values") {
    val s = spark; import s.implicits._
    // threshold 0.5 on prob: preds = 1,1,0,0,1,0 ; labels = 1,0,1,0,1,1
    // TP=2 FP=1 FN=2 TN=1 -> acc=3/6, precision=2/3, recall=2/4
    // F1 = 2*2/(2*2+1+2) = 4/7
    val scored = Seq(
      (0.9, 1), (0.8, 0), (0.4, 1), (0.2, 0), (0.7, 1), (0.3, 1)
    ).toDF("p", "y")
    val m = MLTuning.binaryMetrics(scored, "p", "y")
    assert(math.abs(m.f1 - 4.0 / 7.0) < 1e-12)
    assert(math.abs(m.accuracy - 0.5) < 1e-12)
  }

  test("balanceBinary works on an integer label column") {
    val s = spark; import s.implicits._
    val df0 = ((1 to 90).map(i => (i, 0)) ++ (1 to 10).map(i => (100 + i, 1))).toDF("id", "y")
    val bal = MLTuning.balanceBinary(df0, "y", targetPositiveFraction = 0.4)
    val counts = bal.groupBy("y").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(1) == 10) // positives all kept
    assert(counts(0) > 0 && counts(0) < 90) // negatives down-sampled, not dropped
  }

  test("stringIndexer stage indexes via broadcast join, unseen -> null") {
    val s = spark; import s.implicits._
    val train = Seq((1L, "b"), (2L, "b"), (3L, "a"), (4L, "c"), (5L, "c"), (6L, "c")).toDF("id", "cat")
    val Seq(_, cat) = Feature.fromSchema(train.schema)
    val st = Stages.stringIndexer(cat, "cat_idx")
    val model = new Workflow(st.outputFeatures).fit(train)
    val out = model.score(train, keep = Seq("id")).orderBy("id").collect()
    // freq order: c(3)=0, b(2)=1, a(1)=2
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 1, 2, 0, 0, 0))
    val test2 = Seq((9L, "zz"), (10L, "b")).toDF("id", "cat")
    val out2 = model.score(test2, keep = Seq("id")).orderBy("id").collect()
    assert(out2(0).isNullAt(1)) // unseen value
    assert(out2(1).getInt(1) == 1)
  }

  test("ModelIO round-trip: loaded model (column + indexer + LR stages) scores identically") {
    val s = spark; import s.implicits._
    val train = (1 to 60).map { i =>
      val cat = Seq("a", "b", "c")(i % 3)
      (i.toLong, Array(i % 7 * 1.0, i % 5 * 1.0), cat, if (i % 7 >= 3) 1.0 else 0.0)
    }.toDF("id", "emb", "cat", "y")
    val Seq(_, fEmb, fCat, fY) = Feature.fromSchema(train.schema, response = Some("y"))
    val catIdx = Stages.stringIndexer(fCat, "cat_idx")
    val lr = MLStages.logisticRegression(fEmb, fY, "lr", maxIter = 20)
    val scaled = Stages.standardScale(
      Feature.raw("id", FeatureKind.RealK), "id_z") // column estimator too
    val model = new Workflow(catIdx.outputFeatures ++ lr.outputFeatures ++ scaled.outputFeatures)
      .fit(train)
    val orig = model.score(train, keep = Seq("id")).orderBy("id").collect()

    val dir = java.nio.file.Files.createTempDirectory("graft_model_spec").toString
    ModelIO.save(model, dir, s)
    val loaded = ModelIO.load(s, dir)
    val replay = loaded.score(train, keep = Seq("id")).orderBy("id").collect()
    assert(orig.map(_.toSeq).toSeq == replay.map(_.toSeq).toSeq)
    // saving an anonymous DataFrameStage must fail loudly
    val anon = new DataFrameStage("opaque", Seq(fCat)) {
      def outputs = Seq("z" -> FeatureKind.RealK)
      def transform(d: org.apache.spark.sql.DataFrame) = d
    }
    val badModel = new WorkflowModel(Seq(Seq(anon)), anon.outputFeatures)
    intercept[UnsupportedOperationException] { ModelIO.save(badModel, dir + "2", s) }
  }

  test("ModelSelector picks the best candidate deterministically and refits") {
    val s = spark; import s.implicits._
    // y is a noisy-free linear threshold of the features: LR should beat
    // a depth-1 single-tree forest on held-out auROC
    val train = (1 to 200).map { i =>
      val a = (i % 13).toDouble; val b = (i % 7).toDouble
      (i.toLong, Array(a, b), if (2 * a + 3 * b > 22) 1.0 else 0.0)
    }.toDF("id", "emb", "y")
    val Seq(_, fEmb, fY) = Feature.fromSchema(train.schema, response = Some("y"))
    val cands = Seq(
      "lr" -> MLStages.logisticRegression(fEmb, fY, "sel", maxIter = 30),
      "rf_stump" -> MLStages.randomForest(fEmb, fY, "sel", numTrees = 1, maxDepth = 1))
    val sel = ModelSelector.binary(fEmb, fY, "sel", cands,
      ModelSelector.KFold(k = 3, seed = 7L))
    val model = new Workflow(sel.outputFeatures).fit(train)
    assert(sel.bestName == "lr")
    assert(sel.results.length == 2)
    val lrAuc = sel.results.find(_.name == "lr").get.metric
    val rfAuc = sel.results.find(_.name == "rf_stump").get.metric
    assert(lrAuc > rfAuc)
    val scored = model.score(train, keep = Seq("id", "y"))
    assert(scored.columns.toSet == Set("id", "y", "sel_prediction", "sel_prob_1"))
    // winner was refit on the full frame: training accuracy near-perfect
    val acc = MLTuning.binaryMetrics(scored, "sel_prob_1", "y").accuracy
    assert(acc > 0.95)
  }

  test("cutMulticlass keeps only frequent labels") {
    val s = spark; import s.implicits._
    val df0 = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(15)("c") ++ Seq.fill(5)("d"))
      .zipWithIndex.map(_.swap).toDF("id", "lab")
    val cut2 = ModelSelector.cutMulticlass(df0, "lab", maxClasses = 2, minLabelFraction = 0.0)
    assert(cut2.select("lab").distinct().as[String].collect().toSet == Set("a", "b"))
    val cutFrac = ModelSelector.cutMulticlass(df0, "lab", maxClasses = 10, minLabelFraction = 0.10)
    assert(cutFrac.select("lab").distinct().as[String].collect().toSet == Set("a", "b", "c"))
    assert(cutFrac.count() == 95)
  }

  test("LocalScoring: row closures equal cluster scores (no Spark jobs per record)") {
    val s = spark; import s.implicits._
    val train = (1 to 60).map { i =>
      val cat = Seq("a", "b", "c")(i % 3)
      (i.toLong, Array(i % 7 * 1.0, i % 5 * 1.0), cat, if (i % 7 >= 3) 1.0 else 0.0)
    }.toDF("id", "emb", "cat", "y")
    val Seq(_, fEmb, fCat, fY) = Feature.fromSchema(train.schema, response = Some("y"))
    val catIdx = Stages.stringIndexer(fCat, "cat_idx")
    val lr = MLStages.logisticRegression(fEmb, fY, "lr", maxIter = 20)
    val idZ = Stages.standardScale(Feature.raw("id", FeatureKind.RealK), "id_z")
    val model = new Workflow(catIdx.outputFeatures ++ lr.outputFeatures ++ idZ.outputFeatures)
      .fit(train)
    val cluster = model.score(train, keep = Seq("id")).orderBy("id").collect()

    val localFn = LocalScoring.scoreFunction(model, train.schema, s, keep = Seq("id"))
    val rows = train.orderBy("id").collect()
    val cols = model.score(train, keep = Seq("id")).columns
    rows.zip(cluster).foreach { case (in, expected) =>
      val rec = in.schema.fieldNames.zip(in.toSeq).toMap
        .map { case (k, v: Seq[_]) => k -> v; case kv => kv } // arrays arrive as WrappedArray
      val out = localFn(rec)
      cols.zipWithIndex.foreach { case (c, i) =>
        val e = expected.get(i)
        val g = out(c)
        (e, g) match {
          case (a: Double, b: Double) => assert(math.abs(a - b) < 1e-9, s"$c: $a vs $b")
          case (a, b) => assert(a == b, s"$c: $a vs $b")
        }
      }
    }
  }

  test("assemble records slot metadata; dropSlotsByName slices by name") {
    val s = spark; import s.implicits._
    val df0 = Seq((1L, 2.0, 3.0)).toDF("id", "a", "b")
    val Seq(_, fa, fb) = Feature.fromSchema(df0.schema)
    val asm = Stages.assemble(Seq(fa, fb), "vec")
    val out = new Workflow(asm.outputFeatures).fit(df0).score(df0, keep = Seq("id"))
    assert(Stages.slotNames(out, "vec") == Seq("a", "b"))
    val sliced = Stages.dropSlotsByName(out, "vec")(_ == "a")
    assert(Stages.slotNames(sliced, "vec") == Seq("b"))
    assert(sliced.select("vec").as[Seq[Double]].head() == Seq(3.0))
  }

  test("ModelInsights summarize emits stages, selection and sanity JSON") {
    val s = spark; import s.implicits._
    val train = (1 to 60).map { i =>
      (i.toLong, Array((i % 7).toDouble, (i % 5).toDouble), if (i % 7 >= 3) 1.0 else 0.0)
    }.toDF("id", "emb", "y")
    val Seq(_, fEmb, fY) = Feature.fromSchema(train.schema, response = Some("y"))
    val sel = ModelSelector.binary(fEmb, fY, "sel",
      Seq("lr" -> MLStages.logisticRegression(fEmb, fY, "sel", maxIter = 10)),
      ModelSelector.TrainValidationSplit(0.75))
    val model = new Workflow(sel.outputFeatures).fit(train)
    val stats = graft.operators.DataQuality.sanityCheckStats(
      train.withColumn("x", col("id").cast("double")), "y", Seq("x"), 0.0, 1.0, 0.0)
    val json = ModelInsights.summarize(model, Some(sel), Some(stats))
    assert(json.contains("\"modelSelection\""))
    assert(json.contains("\"best\": \"lr\""))
    assert(json.contains("\"sanityCheck\""))
    assert(json.contains("\"sel_prediction\""))
    // well-formed JSON: Spark's own parser accepts it
    val parsed = s.read.json(Seq(json).toDS)
    assert(parsed.columns.contains("modelSelection"))
  }

  test("Transmogrifier semantic dispatch: email pivots on domain, id excluded") {
    val s = spark; import s.implicits._
    val df0 = Seq(
      (1L, "a@x.com", "u1", 10.0),
      (2L, "b@x.com", "u2", 20.0),
      (3L, "c@y.org", "u3", 30.0)
    ).toDF("id", "mail", "uid", "x")
    val fMail = Feature.rawTagged("mail", FeatureKind.TextK, "email")
    val fUid = Feature.rawTagged("uid", FeatureKind.TextK, "id")
    val fX = Feature.raw("x", FeatureKind.RealK)
    val plan = Transmogrifier.transmogrify(Seq(fMail, fUid, fX), "vec", topK = 2)
    val out = new Workflow(plan.resultFeatures).fit(df0).score(df0, keep = Seq("id"))
      .orderBy("id")
    val vecs = out.select("vec").as[Seq[Double]].collect()
    // slots: mail domain one-hot (2 + other + null) then x impute (2); uid excluded
    assert(vecs.head.length == 6, s"got ${vecs.head.length} slots")
    // x.com is the top domain (2 docs): slot 0 fires for rows 1 and 2
    assert(vecs(0)(0) == 1.0 && vecs(1)(0) == 1.0 && vecs(2)(0) == 0.0)
  }

  test("lineage traversal annotates max distance") {
    val x = Feature.raw("x", RealK)
    val s1 = ColumnStage("a", Seq(x), "y", RealK)(_.head)
    val y = s1.outputFeatures.head
    val s2 = ColumnStage("b", Seq(y, x), "z", RealK)(_.head)
    val z = s2.outputFeatures.head
    val d = z.parentStages()
    assert(d(s2) == 0)
    assert(d(s1) == 1)
  }
}
