package graft.operators

import graft.SparkSpec
import graft.workflow.{Feature, MLStages, Stages, Workflow}
import org.apache.spark.sql.functions._

case class CustRow(c_custkey: Long, c_name: String)

/** Round-2 coverage batch: generic LOCO re-scoring, word2vec/LDA/countVec
  * wrappers, scaler/descaler metadata pair, typed product readers,
  * collection lifts, stateful streaming. */
class CoverageSpec extends SparkSpec {

  lazy val docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha delta"),
      (3L, "omega beta beta"),
      (4L, "zeta eta theta")
    ).toDF("id", "text")
  }

  test("countVectorize counts vocabulary slots") {
    val s = spark; import s.implicits._
    val out = TextVectorizers.countVectorize(docs, col("id"), col("text"), vocabSize = 10)
      .as[(Long, Seq[Double])].collect().toMap
    assert(out(1L).sum == 4.0) // four tokens in doc 1
    assert(out(1L).max == 2.0) // "alpha" twice
    assert(out.values.head.length == out.values.last.length) // shared vocab space
  }

  test("word2vec and LDA produce well-shaped deterministic outputs") {
    val s = spark; import s.implicits._
    val emb = TextVectorizers.word2vec(docs, col("id"), col("text"), vectorSize = 4)
      .as[(Long, Seq[Double])].collect().toMap
    assert(emb.size == 4 && emb.values.forall(_.length == 4))
    val counts = TextVectorizers.countVectorize(docs, col("id"), col("text"), vocabSize = 10)
    val topics = TextVectorizers.ldaTopics(counts, col("id"), col("counts"), numTopics = 2)
      .as[(Long, Seq[Double])].collect().toMap
    assert(topics.size == 4 && topics.values.forall(t => t.length == 2 && math.abs(t.sum - 1.0) < 1e-9))
  }

  test("word2vec distributed fit: same-vocabulary docs embed closer than disjoint ones") {
    val s = spark; import s.implicits._
    // two disjoint vocabularies; doc embedding = mean of word vectors,
    // so same-vocab docs share word vectors and must be closer on
    // average than cross-vocab docs regardless of training noise
    val vocabA = Seq("apple", "banana", "cherry", "date")
    val vocabB = Seq("wrench", "hammer", "pliers", "drill")
    val docs = (0 until 40).map { i =>
      val v = if (i % 2 == 0) vocabA else vocabB
      (i.toLong, (0 until 6).map(j => v((i + j) % v.length)).mkString(" "))
    }.toDF("id", "text")
    // numPartitions defaults to the session parallelism: the distributed
    // fit path (no setNumPartitions(1) determinism crutch)
    val emb = TextVectorizers.word2vec(docs, col("id"), col("text"), vectorSize = 8)
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    val (groupA, groupB) = emb.partition(_._1 % 2 == 0)
    def avgWithin(g: Map[Long, Seq[Double]]) = {
      val vs = g.values.toSeq
      val ps = for (i <- vs.indices; j <- i + 1 until vs.length) yield cos(vs(i), vs(j))
      ps.sum / ps.length
    }
    val cross = (for (a <- groupA.values; b <- groupB.values) yield cos(a, b))
    val crossAvg = cross.sum / cross.size
    assert(avgWithin(groupA) > crossAvg + 0.2, s"within-A ${avgWithin(groupA)} vs cross $crossAvg")
    assert(avgWithin(groupB) > crossAvg + 0.2, s"within-B ${avgWithin(groupB)} vs cross $crossAvg")
  }

  test("locoByRescoring equals analytic LOCO for a linear model") {
    val s = spark; import s.implicits._
    val train = (1 to 100).map { i =>
      (i.toLong, Array((i % 7).toDouble, (i % 5).toDouble, (i % 3).toDouble),
        if ((i % 7) + 2 * (i % 5) > 8) 1.0 else 0.0)
    }.toDF("id", "emb", "y")
    val Seq(_, fEmb, fY) = Feature.fromSchema(train.schema, response = Some("y"))
    val lrStage = MLStages.logisticRegression(fEmb, fY, "m", maxIter = 25)
    val fitted = lrStage.fit(train).asInstanceOf[graft.workflow.FittedPredictor]
    val lr = fitted.model.asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    val analytic = Insights.locoForLR(train, col("id"), col("emb"), lr, k = 3)
      .as[(Long, Int, Double, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val rescored = Insights.locoByRescoring(train, col("id"), col("emb"), lr, k = 3)
      .as[(Long, Int, Double, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(analytic.keySet == rescored.keySet)
    analytic.foreach { case (k, v) => assert(math.abs(v - rescored(k)) < 1e-6, s"$k: $v vs ${rescored(k)}") }
  }

  test("scale records metadata; descale inverts through it") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 10.0), (2L, 30.0)).toDF("id", "x")
    val scaled = Stages.scale(df, "x", "x_s", slope = 2.0, intercept = 5.0)
    assert(scaled.select("x_s").as[Double].collect().toSet == Set(25.0, 65.0))
    val back = Stages.descale(scaled, "x_s", "x_s", "x_back")
    assert(back.select("x_back").as[Double].collect().toSet == Set(10.0, 30.0))
  }

  test("typed product readers yield Dataset[T] with pruned scans") {
    val s = spark; import s.implicits._
    val ds = graft.sources.FormatReaders
      .readParquetAs[CustRow](s, "/root/testdata/sf0.001/customer.parquet")
    val first = ds.orderBy("c_custkey").head()
    assert(first.c_custkey >= 0L && first.c_name.nonEmpty)
    // column pruning: the physical scan reads only the two encoder fields
    val read = ds.queryExecution.executedPlan.toString()
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("c_custkey") && !read.contains("c_acctbal"), read)
    // CSV side: write then read back typed
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_typed").toString
    ds.limit(5).write.mode("overwrite").option("header", "true").csv(dir)
    val back = graft.sources.FormatReaders.readCsvAs[CustRow](s, dir)
    assert(back.count() == 5)
  }

  test("geolocationVectorize fills missing coords with the geo midpoint") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Some(10.0), Some(20.0), Some(1.0)),
      (2L, Some(20.0), Some(40.0), Some(2.0)),
      (3L, Option.empty[Double], Option.empty[Double], Option.empty[Double])
    ).toDF("id", "lat", "lon", "acc")
    val out = Vectorizers.geolocationVectorize(df, col("id"), col("lat"), col("lon"), col("acc"))
      .orderBy("id").collect()
    assert(out(0).getInt(4) == 0 && out(2).getInt(4) == 1)
    val (fLat, fLon) = (out(2).getDouble(1), out(2).getDouble(2))
    assert(fLat > 10.0 && fLat < 20.0, s"midpoint lat $fLat")
    assert(fLon > 20.0 && fLon < 40.0, s"midpoint lon $fLon")
  }

  test("stateful streaming running state equals batch aggregation") {
    val s = spark
    val stream = graft.streaming.Streaming.eventStream(s, "/root/testdata/sf0.001")
    val agg = graft.streaming.Streaming.runningUserState(s, stream)
    val q = agg.writeStream.format("memory").queryName("user_state")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = s.table("user_state")
      .groupBy("userId").agg(max("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.sources.Tables.events(s, "/root/testdata/sf0.001")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
