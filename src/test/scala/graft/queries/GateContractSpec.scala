package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Meta-gate: the driver's correctness harness only checks queries that
  * declare an oracle; a query silently missing its `oracleSql` entry
  * would degrade to a rows-only check without anyone deciding that. This
  * spec forces the decision to be explicit — every query either has an
  * oracle or is on the documented rows-only list (with the reason). */
class GateContractSpec extends AnyFunSuite {

  // rows-only by design: outputs that are not SQL-replayable
  private val rowsOnlyByDesign = Map(
    "q37_ml_train_score" -> "model SELECTION + FIT (grid of spark.ml fits) aren't SQL-replayable; q560_selected_model_score hash-gates the SCORING half via the frozen selected-model coefficient table",
    "q95_dt_map_bucketize" -> "spark.ml's sample/sketch-based split binning isn't SQL-replayable; q511_gini_stump_map is the hash-gated exact companion",
    "q120_curation_quality_classifier" -> "the L-BFGS FIT isn't SQL-replayable (feature extraction shares q116's gated path); q523_quality_classifier_score hash-gates the SCORING half via the frozen coefficient table",
    "q189_pca" -> "eigenvector signs are an SVD convention, not SQL-replayable; variance contract spec-gated in ProjectionSpec",
    "q194_als_recommend" -> "iterative ALS factor values are not SQL-replayable; block-preference recovery spec-gated in MLStagesSpec",
    "q195_kmeans_assign" -> "iterative Lloyd centroids are not SQL-replayable; blob-recovery spec-gated in ClusteringSpec")

  test("every query has an oracle or a documented rows-only justification") {
    val queries = graft.SparkEntry.queries.keySet
    val oracles = graft.SparkEntry.oracleSql.keySet
    val missing = queries -- oracles -- rowsOnlyByDesign.keySet
    assert(missing.isEmpty,
      s"queries with no oracle and no rows-only justification: $missing")
    val stale = (oracles -- queries) ++ (rowsOnlyByDesign.keySet -- queries)
    assert(stale.isEmpty, s"oracle/rows-only entries for nonexistent queries: $stale")
    val both = oracles.intersect(rowsOnlyByDesign.keySet)
    assert(both.isEmpty, s"queries marked rows-only but carrying an oracle: $both")
  }

  test("query names are unique across modules and follow the qNN_ scheme") {
    val names = graft.SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")), names.filterNot(_.matches("q\\d+_[a-z0-9_]+")))
  }
}
