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

  test("writePartitioned prunes partitions at planning time and bounds file counts") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = (1 to 1000).map(i => (i.toLong, s"g${i % 4}", i * 1.5)).toDF("id", "grp", "v")
    Layout.writePartitioned(df, dir, Seq("grp"))
    val read = s.read.parquet(dir)
    assert(read.count() == 1000)
    // partition filter reaches the scan: directory pruning, not a row filter
    val plan = read.where(col("grp") === "g1").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("grp"), plan.take(1500))
    assert(read.where(col("grp") === "g1").count() == 250)
    // one data file per partition directory
    for (g <- 0 until 4) {
      val files = new java.io.File(s"$dir/grp=g$g").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"grp=g$g has ${files.length} files")
    }
  }

  test("compactParquet rewrites to the target file count with identical content") {
    val s = spark; import s.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_frag").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val df = (1 to 900).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    df.repartition(30).write.mode("overwrite").parquet(in)   // 30 small files
    Layout.compactParquet(s, in, out, targetRowsPerFile = 300)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 3, s"expected 3 files, got ${files.length}")
    val a = s.read.parquet(in); val b = s.read.parquet(out)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
