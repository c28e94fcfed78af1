package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed co-keyed join plans with no shuffle Exchange") {
    val s = spark; import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val left = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "x")
    val right = (1L to 1000L).map(i => (i, s"r$i")).toDF("k", "nm")
    Bucketing.writeBucketed(left, "bkt_left", "k", buckets = 8, s"$base/left")
    Bucketing.writeBucketed(right, "bkt_right", "k", buckets = 8, s"$base/right")
    val joined = Bucketing.readBucketed(s, "bkt_left")
      .join(Bucketing.readBucketed(s, "bkt_right"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join:\n$plan")
    assert(joined.count() == 1000L)
    // groupBy on the bucket key also skips the shuffle
    val agg = Bucketing.readBucketed(s, "bkt_left").groupBy("k").agg(sum("x"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed agg:\n$aggPlan")
  }
}
