package graft.aggregators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  // 40 keys x 500 candidates with deliberate score ties (score quantized
  // to one decimal) so the (score, id) tie-break is actually exercised
  private lazy val scored = {
    spark.range(20000).select(
      (col("id") % 40).as("query_id"),
      col("id").as("neighbor_id"),
      round(sin(col("id").cast("double")) * 5, 1).as("cos"))
  }

  private def windowed(desc: Boolean, k: Int) = {
    val o = if (desc) Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    else Window.partitionBy(col("query_id"))
      .orderBy(col("cos").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(o))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.get(3).toString.toInt)).toSet

  test("topKPerKey equals window row_number for desc and asc, ties included") {
    for (desc <- Seq(true, false); k <- Seq(1, 7, 50)) {
      val agg = TopK.topKPerKey(scored, "query_id", "neighbor_id", "cos", k, desc)
      assert(rows(agg) == rows(windowed(desc, k)), s"desc=$desc k=$k")
    }
  }

  test("k larger than the group emits the whole group in rank order") {
    val tiny = scored.where(col("query_id") === 0).limit(5)
    val out = TopK.topKPerKey(tiny, "query_id", "neighbor_id", "cos", 100)
    assert(out.count() == 5)
    val ranks = out.orderBy(col("rank")).collect().map(_.getInt(3)).toSeq
    assert(ranks == (1 to 5))
  }

  test("topKPerKeyStr equals window row_number with string-id tie-break") {
    val strScored = scored.select(col("query_id"),
      concat(lit("t"), lpad(col("neighbor_id") % 100, 3, "0")).as("tok"), col("cos"))
    val agg = TopK.topKPerKeyStr(strScored, "query_id", "tok", "cos", 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet
    val win = strScored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("tok"))))
      .where(col("rank") <= 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet
    assert(agg == win)
  }

  test("plan: partial+final ObjectHashAggregate, no Window, no full sort before rank") {
    val p = TopK.topKPerKey(scored, "query_id", "neighbor_id", "cos", 10)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    // typed aggregator -> ObjectHashAggregate, partial then final around
    // ONE exchange: only ~2k candidates per (mapper, key) cross the wire
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2, p)
    assert(p.linesIterator.count(_.contains("Exchange")) == 1, p)
  }
}
