package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** observe()-based instrumentation: the piggybacked metrics must equal a
  * direct aggregation pass, and must ride the materializing job (no
  * second scan). Not oracle-gated — the metrics live on the Observation,
  * not in a result frame.
  */
class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("observed fill rates equal a direct aggregation pass") {
    val df = Seq(
      (Some(1.0), Some("a")), (None, Some("b")),
      (Some(3.0), None), (None, None), (Some(5.0), Some("e"))
    ).toDF("x", "s")
    val (observed, obs) = DataQuality.observedFillRates(df, Seq("x", "s"))
    // one action both materializes the frame and fills the observation
    assert(observed.count() === 5)
    val m = obs.get
    assert(m("n_rows") === 5L)
    assert(math.abs(m("fill_x").asInstanceOf[Double] - 0.6) < 1e-9)
    assert(math.abs(m("fill_s").asInstanceOf[Double] - 0.6) < 1e-9)
  }

  test("metrics ride the real pipeline output, not a side query") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), nullif(col("l_discount"), lit(0.0)).as("nz_discount"))
    val (observed, obs) = DataQuality.observedFillRates(li, Seq("nz_discount"))
    val out = observed.where(col("l_orderkey") % 2 === 0).count()
    assert(out > 0)
    val direct = li.agg(
      count(lit(1)), avg(col("nz_discount").isNotNull.cast("double"))).head
    val m = obs.get
    // observe sits on the full frame (before the downstream filter)
    assert(m("n_rows") === direct.getLong(0))
    assert(math.abs(m("fill_nz_discount").asInstanceOf[Double] - direct.getDouble(1)) < 1e-9)
  }

  test("empty column list is rejected") {
    intercept[IllegalArgumentException] {
      DataQuality.observedFillRates(Seq((1, 2)).toDF("a", "b"), Seq.empty)
    }
  }
}
