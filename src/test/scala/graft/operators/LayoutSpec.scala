package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Z-order layout: interleave correctness against the driver-side
  * reference, the out-of-range guard, the physical plan shape, and the
  * actual pruning advantage — per-partition bounding boxes from a
  * z-order layout intersect a narrow second-dimension filter in far
  * fewer partitions than a single-dimension sort layout does, which is
  * exactly the min-max file-pruning win at 100 TB.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("column interleave matches the driver-side reference") {
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (12345L, 54321L), ((1L << 21) - 1, (1L << 21) - 1))
    val df = samples.toDF("x", "y")
    val got = df.select(Layout.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    val want = samples.map { case (x, y) => Layout.zValueLocal(x, y) }
    assert(got === want)
    // adjacent cells differ in the low bits only: (2,3) and (3,3)
    assert(Layout.zValueLocal(2, 3) === 14 && Layout.zValueLocal(3, 3) === 15)
  }

  test("out-of-range dimension fails loudly, not by aliasing") {
    val ex = intercept[Exception] {
      Seq((1L << 21, 0L)).toDF("x", "y")
        .select(Layout.zValue(col("x"), col("y"))).collect()
    }
    assert(ex.getMessage.contains("zValue") ||
      ex.getCause != null && ex.getCause.getMessage.contains("zValue"))
  }

  test("layout plan is range-partition + in-partition sort, no extra shuffle") {
    val df = (0L until 1024L).map(i => (i % 32, i / 32)).toDF("x", "y")
    val plan = Layout.zOrderLayout(df, col("x"), col("y"), 8, bits = 6)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"), plan.take(400))
    assert(plan.contains("Sort"), plan.take(400))
  }

  test("z-order bounding boxes prune a second-dim filter; x-sort cannot") {
    // a full 64x64 grid into 16 equal partitions: z-order yields 16x16
    // quadrant boxes, an x-only sort yields 4-wide full-height strips
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)).toDF("x", "y")

    def partitionsIntersectingLowY(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg(min("y").as("lo"), max("y").as("hi"))
        .where(col("lo") <= 15 && col("hi") >= 0) // filter: y in [0, 15]
        .count()

    val zLaid = Layout.zOrderLayout(grid, col("x"), col("y"), 16, bits = 6)
    val xLaid = grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
    val zHit = partitionsIntersectingLowY(zLaid)
    val xHit = partitionsIntersectingLowY(xLaid)
    // every x-strip spans all y values; z-quadrants in the low-y band
    // are a quarter of the partitions (sampled range bounds give a
    // little slack)
    assert(xHit === 16, s"x-sort should hit all 16, hit $xHit")
    assert(zHit <= 8, s"z-order should hit ~4 of 16, hit $zHit")
  }
}
