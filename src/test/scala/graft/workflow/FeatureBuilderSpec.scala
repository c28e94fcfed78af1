package graft.workflow

import graft.SparkSpec
import graft.workflow.FeatureKind._
import org.apache.spark.sql.functions._

case class Passenger(pid: Long, fare: Option[Double], cabin: Option[String], survived: Boolean)

class FeatureBuilderSpec extends SparkSpec {

  lazy val records = Seq(
    Passenger(1L, Some(7.25), Some("C85"), false),
    Passenger(2L, None, Some("E46"), true),
    Passenger(3L, Some(8.05), None, true))

  lazy val extracts = Seq(
    ExtractSpec[Passenger]("fare", RealK, _.fare),
    ExtractSpec[Passenger]("cabin", TextK, _.cabin),
    ExtractSpec[Passenger]("deck", TextK, _.cabin.map(_.take(1)), semantic = Some("picklist")),
    ExtractSpec[Passenger]("survived", BinaryK, _.survived, isResponse = true))

  test("fromRecords assembles a keyed row per record, Options unwrap to null") {
    val s = spark; import s.implicits._
    val (df, features) = FeatureBuilder.fromRecords(
      records.toDS(), (p: Passenger) => p.pid.toString, extracts)
    assert(df.columns.toSeq == Seq("key", "fare", "cabin", "deck", "survived"))
    val rows = df.orderBy("key").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1", "2", "3"))
    assert(rows(1).isNullAt(1)) // fare None -> null
    assert(rows(2).isNullAt(2)) // cabin None -> null
    assert(rows(0).getString(3) == "C") // derived extract ran
    assert(features.map(_.kind) == Seq(RealK, TextK, TextK, BinaryK))
    assert(features.count(_.isResponse) == 1)
    assert(features(2).semantic.contains("picklist"))
  }

  test("extracted features feed a workflow DAG end-to-end") {
    val s = spark; import s.implicits._
    val (df, features) = FeatureBuilder.fromRecords(
      records.toDS(), (p: Passenger) => p.pid.toString, extracts)
    val fare = features.find(_.name == "fare").get
    val imp = Stages.imputeMean(fare, "fare_f")
    val out = new Workflow(imp.outputFeatures).fit(df)
      .score(df, keep = Seq("key")).orderBy("key").collect()
    // mean of (7.25, 8.05) = 7.65 fills the missing row
    assert(out.map(_.getDouble(1)).toSeq == Seq(7.25, 7.65, 8.05))
  }

  test("predictionMap packs and extracts the reference Prediction shape") {
    val s = spark; import s.implicits._
    import graft.functions.MapFunctions
    val scored = Seq((1L, 1.0, 0.2, 0.8)).toDF("id", "pred", "p0", "p1")
      .select(col("id"),
        MapFunctions.predictionMap(col("pred"), col("p0"), col("p1")).as("pm"))
    val row = scored.select(
      MapFunctions.predictionValue(col("pm")),
      MapFunctions.probabilityValue(col("pm"), 0),
      MapFunctions.probabilityValue(col("pm"), 1)).collect().head
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) == 0.2)
    assert(row.getDouble(2) == 0.8)
  }
}
