package graft.queries

import graft.SparkSpec

/** Plan-shape gates for the round-4 queries: column pruning must reach
  * the parquet scan (ReadSchema) and no plan may degenerate into a
  * cartesian product. Asserting the EXECUTED plan keeps these
  * scale-contract properties from regressing silently — a scan that
  * reads all columns for a two-column projection is wrong at 100 TB
  * even when the answer is right at sf0.001. */
class QueryPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  private def readSchemas(plan: String): Seq[String] =
    plan.linesIterator.filter(_.contains("ReadSchema")).toSeq

  test("q92 remove-stopwords scan prunes to (doc_id, text)") {
    val scans = readSchemas(planOf("q92_remove_stopwords"))
    assert(scans.nonEmpty)
    assert(scans.forall(s => s.contains("doc_id") && s.contains("text")
      && !s.contains("n_chars") && !s.contains("source")))
  }

  test("q94 mode-impute scan prunes to the three referenced columns") {
    val scans = readSchemas(planOf("q94_impute_mode"))
    assert(scans.nonEmpty)
    assert(scans.forall(s => s.contains("l_quantity")
      && !s.contains("l_discount") && !s.contains("l_extendedprice")))
  }

  test("q93/q96 plans avoid cartesian products and single-partition exchanges") {
    for (q <- Seq("q93_multipicklist_map", "q96_hash_space_strategy")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!plan.contains("Exchange SinglePartition"),
        s"$q collapses to a single partition")
    }
  }

  test("q96 shared and separate branches each scan documents once per column") {
    val plan = planOf("q96_hash_space_strategy")
    // 2 modes x 2 columns = 4 pruned scans of documents, no more
    val scans = readSchemas(plan).filter(_.contains("doc_id"))
    assert(scans.length == 4, s"expected 4 scans, got ${scans.length}")
    assert(scans.forall(!_.contains("lang")))
  }

  test("q102 PII scrub is a pure map stage: no exchange at all") {
    val plan = planOf("q102_curation_pii_redact")
    assert(!plan.contains("Exchange"), "row-local scrub must not shuffle")
    assert(readSchemas(plan).forall(!_.contains("lang")))
  }

  test("q103 sequence packing shuffles once, on the shard hash") {
    val plan = planOf("q103_curation_pack_sequences")
    val exchanges = plan.linesIterator.count(_.trim.startsWith("+- Exchange")) +
      plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(plan.contains("hashpartitioning"), "window must partition by shard")
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
  }

  test("q104 span removal anti-joins a BROADCAST hot-span set") {
    val plan = planOf("q104_curation_drop_spans")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      "hot spans must broadcast to the anti-join")
    assert(!plan.contains("CartesianProduct"))
  }

  test("shingle queries keep the emptiness filter off the generated array") {
    // InferFiltersFromGenerate would re-derive size(shingles)>0 under the
    // explode and pushdown re-inlines the O(tokens^2) lambda into the
    // scan filter; the session excludes the rule — a Generate node must
    // never sit directly above a Filter mentioning the shingle lambda
    for (q <- Seq("q100_curation_decontaminate", "q23_dedup_ngram_jaccard")) {
      val plan = planOf(q)
      assert(!plan.contains("Filter (size(transform("),
        s"$q re-inlined the shingle lambda into a filter")
    }
  }
}
