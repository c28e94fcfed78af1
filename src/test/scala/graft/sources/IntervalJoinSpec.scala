package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucket-expansion interval join: equivalence with the naive theta
  * join, boundary inclusivity, multi-cell intervals, and the plan shape
  * (an equi hash/merge join — never BroadcastNestedLoopJoin, which is
  * what Spark plans for a bare BETWEEN predicate).
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = (0L until 500L).map(i => (i, i * 3 % 97)).toDF("pid", "pos")
  private def intervals = Seq(
    (1L, 0L, 5L),      // short, single cell
    (2L, 10L, 40L),    // spans several cells at width 8
    (3L, 95L, 96L),    // tail boundary
    (4L, 50L, 50L),    // degenerate single point
    (5L, 200L, 300L)   // matches nothing
  ).toDF("iid", "lo", "hi")

  test("matches the naive theta join exactly, boundaries inclusive") {
    val got = JoinedReader.bucketedIntervalJoin(
        points, col("pos"), intervals, col("lo"), col("hi"), bucketWidth = 8)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = points.join(intervals, col("pos") >= col("lo") && col("pos") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === want)
    // inclusivity: pos == lo and pos == hi both match
    assert(want.exists { case (_, iid) => iid == 4L })
  }

  test("no duplicate matches for intervals spanning many cells") {
    val joined = JoinedReader.bucketedIntervalJoin(
      points, col("pos"), intervals, col("lo"), col("hi"), bucketWidth = 4)
    assert(joined.groupBy("pid", "iid").count().where(col("count") > 1).isEmpty)
  }

  test("plans as an equi join, not BroadcastNestedLoopJoin") {
    val plan = JoinedReader.bucketedIntervalJoin(
        points, col("pos"), intervals, col("lo"), col("hi"), bucketWidth = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan.take(400))
  }

  test("bucketWidth must be positive") {
    intercept[IllegalArgumentException] {
      JoinedReader.bucketedIntervalJoin(
        points, col("pos"), intervals, col("lo"), col("hi"), bucketWidth = 0)
    }
  }
}
