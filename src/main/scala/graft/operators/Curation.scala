package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis.hash60

/** Corpus-curation operators for training-data pipelines: deterministic
  * hash sampling, reproducible train/val/test splits, per-group token
  * budgeting, and keeper-based near-dup filtering. (Beyond the
  * reference's surface — these are the selection steps a 100 TB
  * pretraining pipeline runs after dedup/quality scoring.)
  *
  * Everything is md5-derived and row-local: runs are reproducible
  * across re-executions, partitionings, and cluster sizes (unlike
  * `df.sample`/`rand()`, whose draws depend on partition layout), and
  * the DuckDB differential oracle replays every decision
  * bit-identically — the auditability property a curation pipeline
  * needs when a sample has to be justified after the fact.
  */
object Curation {

  /** Deterministic per-row bucket in [0, 1e6): hash60 of "salt:id".
    * Different salts give independent draws over the same ids. */
  def sampleBucket(id: Column, salt: String): Column =
    pmod(hash60(concat_ws(":", lit(salt), id)), lit(1000000L))

  /** Uniform deterministic sample: keep a row iff its [[sampleBucket]]
    * falls below fraction*1e6. Row-local filter — pushes down to the
    * scan, no shuffle, stable under re-partitioning. */
  def deterministicSample(df: DataFrame, id: Column, fraction: Double,
                          salt: String = "sample"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.where(sampleBucket(id, salt) < (fraction * 1e6).toLong)
  }

  /** Deterministic split assignment: a `split` column with the label of
    * the weight band the row's bucket lands in (weights normalized;
    * order of `weights` defines the bands). Reproducible train/val/test
    * carving — the same id lands in the same split on every run. */
  def hashSplit(df: DataFrame, id: Column, weights: Seq[(String, Double)],
                salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .map(c => (c * 1e6).toLong)
    val b = sampleBucket(id, salt)
    val expr = weights.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((label, _), i)) =>
        when(b >= cuts(i) && b < cuts(i + 1), label).otherwise(acc)
    }
    // the last band absorbs the rounding remainder up to 1e6
    val withLast = when(b >= cuts.last, lit(weights.last._1)).otherwise(expr)
    df.withColumn("split", withLast)
  }

  /** Per-group token budgeting: keep each group's best documents while
    * the group's running token total stays within `budget`. Order is
    * (quality desc, id asc) — deterministic under ties. The window is
    * partitioned by group, so parallelism = #groups (domains/sources —
    * bounded and coarse); within a group the running sum is the
    * sequential semantics the budget requires. A doc is kept iff the
    * cumulative count INCLUDING it fits. */
  def tokenBudgetPerGroup(df: DataFrame, id: Column, group: Column,
                          quality: Column, tokens: Column,
                          budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(quality.desc, id.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__cum", sum(tokens).over(w))
      .where(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Intra-document repetition ratio (Gopher-style rep filter): the
    * fraction of word k-gram POSITIONS whose shingle already occurred —
    * 1 - distinct/total, 0 for docs with fewer than k tokens. Pass a
    * MATERIALIZED token-array column (see the [[Dedup.wordShingles]]
    * CSE hazard — an inline `tokens(text)` here is O(tokens²) per
    * row). Row-local; pipelines at scan speed. */
  def duplicateShingleRatioOf(toks: Column, k: Int): Column = {
    val total = greatest(size(toks) - (k - 1), lit(0))
    val distinctN = size(Dedup.wordShinglesOf(toks, k))
    when(total > 0,
      lit(1.0) - distinctN.cast("double") / total).otherwise(lit(0.0))
  }

  /** Benchmark decontamination (test-set leakage detection): for every
    * (corpus doc, probe doc) pair sharing word k-gram shingles, the
    * CONTAINMENT |shingles(corpus) ∩ shingles(probe)| / |shingles(probe)|
    * — asymmetric on purpose: a benchmark item fully quoted inside a
    * long document scores 1.0 where Jaccard would vanish.
    *
    * Scale: the probe side (benchmark suites) is small by nature, so
    * its exploded shingles BROADCAST — the corpus is scanned once,
    * shingled row-locally, hash-joined with no shuffle of corpus data
    * and no hot-shingle blowup (candidate fan-out is bounded by the
    * probe set). */
  def containmentPairs(corpus: DataFrame, corpusId: Column, corpusText: Column,
                       probes: DataFrame, probeId: Column, probeText: Column,
                       k: Int, threshold: Double): DataFrame = {
    val cs = Dedup.shingleFrame(corpus, corpusId, corpusText, k)
      .select(col("doc").as("corpus_id"), explode(col("shingles")).as("s"))
    // probe shingle count rides along the exploded rows: one broadcast,
    // one shuffle (the groupBy), no second probe-side join
    val pex = Dedup.shingleFrame(probes, probeId, probeText, k)
      .select(col("doc").as("probe_id"), size(col("shingles")).as("n_p"),
        explode(col("shingles")).as("s"))
    cs.join(broadcast(pex), "s")
      .groupBy(col("corpus_id"), col("probe_id"), col("n_p"))
      .agg(count(lit(1)).as("n_inter"))
      .select(col("corpus_id"), col("probe_id"),
        (col("n_inter").cast("double") / col("n_p")).as("containment"))
      .where(col("containment") >= threshold)
  }

  /** End-to-end near-dup removal: given the corpus and a near-dup pair
    * list, drop every document that is NOT its component's keeper
    * (min id). One anti-join against the (small) non-keeper side —
    * documents in no pair survive untouched. */
  def dropNearDups(df: DataFrame, id: Column, pairs: DataFrame): DataFrame = {
    val losers = Dedup.connectedComponents(pairs)
      .where(col("doc_id") =!= col("component"))
      .select(col("doc_id").as("__loser"))
    df.join(losers, id === col("__loser"), "left_anti")
  }
}
