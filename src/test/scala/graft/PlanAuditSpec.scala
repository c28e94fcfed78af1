package graft

import org.apache.spark.sql.functions._

/** Plan audits: assert the physical plans actually have the scale
  * properties the operator docs claim — filters/projection pushed to the
  * parquet scan, dimension joins broadcast, typed map aggregations
  * partial+final — so regressions in plan shape fail CI, not the
  * 100 TB run. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString()

  test("q01: filter and projection reach the parquet scan") {
    val p = plan("q01_scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_comment") && !read.contains("l_tax"), read)
  }

  test("q12: dimension join is a broadcast hash join") {
    val p = plan("q12_join_broadcast_agg")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q49: map-monoid aggregation runs partial then final") {
    val p = plan("q49_map_union_sum")
    val aggs = p.linesIterator.count(l => l.contains("ObjectHashAggregate") || l.contains("SortAggregate"))
    assert(aggs >= 2, s"expected partial+final aggregate pair:\n$p")
  }

  test("q56: hashed tf is one explode + one shuffle keyed on (id, bucket)") {
    val p = plan("q56_text_hashed_tf")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1, p)
  }
}
