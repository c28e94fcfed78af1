package graft.workflow

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Uniform per-stage contract (reference OpTransformerSpec /
  * OpEstimatorSpec, features/.../test/OpTransformerSpec.scala:53): every
  * stage must (1) produce exactly its declared output columns, (2)
  * transform an EMPTY frame to the same schema, (3) hand the DAG fitted
  * outputs with the same feature identities it declared before fitting
  * (the copyWithNewStages swap contract), and (4) where serializable,
  * survive a ModelIO round-trip bit-for-bit. One suite applies the
  * contract to a representative stage of every family. */
class StageContractSpec extends SparkSpec {

  lazy val train = {
    val s = spark; import s.implicits._
    Seq[(Long, Option[Double], String, java.sql.Timestamp)](
      (1L, Some(10.0), "a", java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
      (2L, Some(20.0), "b", java.sql.Timestamp.valueOf("2024-03-10 00:00:00")),
      (3L, None, "a", java.sql.Timestamp.valueOf("2024-07-15 00:00:00")),
      (4L, Some(40.0), "c", java.sql.Timestamp.valueOf("2024-11-20 00:00:00"))
    ).toDF("id", "x", "cat", "ts")
  }

  def checkContract(label: String, mkStage: Seq[Feature] => Stage,
                    serializable: Boolean = true): Unit = test(s"contract: $label") {
    val features = Feature.fromSchema(train.schema)
    val stage = mkStage(features)
    val declared = stage.outputFeatures.map(_.name)
    assert(declared.nonEmpty, "stage declares no outputs")

    val model = new Workflow(stage.outputFeatures).fit(train)
    val scored = model.score(train, keep = Seq("id"))
    // (1) declared outputs are exactly the produced (non-key) columns
    assert(scored.columns.toSet == (declared :+ "id").toSet,
      s"declared $declared vs produced ${scored.columns.toSeq}")

    // (2) empty input -> same schema, zero rows
    val empty = model.score(train.where(lit(false)), keep = Seq("id"))
    assert(empty.schema.fieldNames.toSeq == scored.schema.fieldNames.toSeq)
    assert(empty.count() == 0)

    // (3) fitted stages expose the estimator's feature identities
    // (direct-fit only meaningful when the stage consumes raw columns)
    stage match {
      case e: EstimatorStage if stage.inputs.forall(_.isRaw) =>
        val fitted = e.fit(train)
        assert(fitted.outputFeatures.map(_.uid) == stage.outputFeatures.map(_.uid),
          "fitted stage must keep the declared output feature identities")
      case _ =>
    }

    // (4) ModelIO round-trip equivalence
    if (serializable) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_contract").toString
      ModelIO.save(model, dir, spark)
      val replay = ModelIO.load(spark, dir).score(train, keep = Seq("id"))
      assert(replay.orderBy("id").collect().map(_.toSeq).toSeq ==
        scored.orderBy("id").collect().map(_.toSeq).toSeq)
    }
  }

  checkContract("imputeMean (ColumnEstimator)",
    fs => Stages.imputeMean(fs(1), "x_f"))
  checkContract("standardScale (ColumnEstimator)",
    fs => Stages.standardScale(fs(1), "x_z"))
  checkContract("oneHotTopK (pivot estimator)",
    fs => Stages.oneHotTopK(fs(2), "cat", k = 2, minSupport = 1))
  checkContract("stringIndexer (broadcast-join DataFrameStage)",
    fs => Stages.stringIndexer(fs(2), "cat_idx"))
  checkContract("monthUnitCircle (pure ColumnStage)",
    fs => Stages.monthUnitCircle(fs(3), "m"))
  checkContract("lambda ColumnStage",
    fs => ColumnStage("double", Seq(fs(1)), "x2", FeatureKind.RealK)(c => c.head * 2))
  checkContract("bucketize (pure ColumnStage over splits)",
    fs => Stages.bucketize(fs(1), "x_b", Seq(0, 15, 30, 50)))
  checkContract("assemble (vector with slot metadata)",
    fs => Stages.assemble(Seq(fs(0), fs(1)), "fv"))
  checkContract("imputeMode (integral ColumnEstimator)",
    fs => Stages.imputeMode(fs(1), "x_m"))
  checkContract("decisionTreeMapBucketize (label-dependent map estimator)",
    fs => {
      val mkMap = new ColumnStage("mkmap", Seq(fs(1))) {
        def expressions = Seq("nm" ->
          map(lit("a"), coalesce(col(fs(1).name), lit(0.0)), lit("b"), lit(1.0)))
        override protected def outputKind(n: String): FeatureKind = FeatureKind.RealMapK
      }
      val label = ColumnStage("mklabel", Seq(fs(0)), "y", FeatureKind.RealK)(
        c => when(c.head % 2 === 0, 1.0).otherwise(0.0))
      Stages.decisionTreeMapBucketize(mkMap.outputFeatures.head,
        label.outputFeatures.head, "nm_b")
    })
  checkContract("logisticRegression (predictor over a derived DAG)",
    fs => {
      val xf = Stages.imputeMean(fs(1), "x_f")
      val vec = Stages.assemble(Seq(xf.outputFeatures.head), "fv")
      val label = ColumnStage("mklabel", Seq(fs(0)), "y", FeatureKind.RealK)(
        c => when(c.head % 2 === 0, 1.0).otherwise(0.0))
      // predictor consumes derived features — exercises a 4-layer DAG
      MLStages.logisticRegression(vec.outputFeatures.head, label.outputFeatures.head,
        "m", maxIter = 10)
    })
}
