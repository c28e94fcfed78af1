package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application (Sennrich et
  * al. 2016 — the subword-vocabulary fit every LLM pretraining pipeline
  * runs before token counting / sequence packing; beyond the
  * reference's surface, which only consumes pre-tokenized text).
  *
  * Scale design: the fit never touches the corpus after one initial
  * word-count pass — its state is the DISTINCT-WORD frequency table
  * (Zipf-bounded vocabulary, orders of magnitude smaller than a 100 TB
  * corpus and independent of corpus growth once saturated). Each merge
  * iteration is one explode+groupBy shuffle over that vocab table plus
  * a 1-row argmax collect (bounded by construction, the
  * Lloyd-iteration pattern [[Similarity]] documents), with
  * `localCheckpoint` truncating the iterative lineage exactly like the
  * connected-components loop in [[Dedup]]. Applying a fitted merge
  * list is row-local and UDF-free: a greedy left-to-right merge is a
  * sequential left fold, which Catalyst's higher-order `aggregate`
  * expresses directly.
  */
object Tokenizer {

  /** End-of-word sentinel appended to every word's symbol sequence so a
    * merge can capture word-final context (the standard BPE marker). */
  val EndOfWord = "</w>"

  /** Seed symbol sequence for one word: its characters plus
    * [[EndOfWord]]. */
  def seedSymbols(word: Column): Column =
    concat(filter(split(word, ""), s => length(s) > 0), array(lit(EndOfWord)))

  /** Greedy left-to-right merge of every adjacent (a, b) occurrence
    * into the single symbol a+b — one BPE merge rule applied as a
    * sequential left fold over the symbol array. Row-local, pure
    * Column expression. */
  def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Distinct-word frequency table of a text column: (syms, cnt) with
    * `syms` the [[seedSymbols]] sequence. The only corpus-wide pass of
    * the fit. */
  def wordFrequencies(df: DataFrame, text: Column): DataFrame = {
    import graft.functions.TextAnalysis.tokens
    df.select(explode(tokens(text)).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(seedSymbols(col("w")).as("syms"), col("cnt"))
  }

  /** Weighted adjacent-symbol pair counts of a symbol-table state —
    * the statistic each merge iteration maximizes. Exposed separately
    * so the first iteration's table can be differentially checked. */
  def pairCounts(words: DataFrame): DataFrame =
    words.select(
        explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            j => struct(element_at(col("syms"), j).as("a"),
              element_at(col("syms"), j + 1).as("b"))))).as("p"),
        col("cnt"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("n"))

  /** Fit `numMerges` BPE merge rules on a text column. Deterministic:
    * ties in pair frequency break lexicographically on (a, b), so the
    * fitted vocabulary is reproducible across runs and partitionings.
    * Stops early when no adjacent pair remains. */
  def fitBpeMerges(df: DataFrame, text: Column, numMerges: Int): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    var words = wordFrequencies(df, text).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // One action per merge iteration instead of two: the new state is a
    // LAZY localCheckpoint whose blocks materialize as a side effect of
    // the next iteration's argmax collect (the pairCounts scan computes
    // and stores them in the same job). The previous state must stay
    // resident until that collect runs — its blocks are the lazy cut's
    // only input (lineage was truncated) — so it unpersists one
    // iteration late. Shallow nesting: exactly one unmaterialized cache
    // level at any time, consumed by exactly one downstream chain.
    var prev: DataFrame = null
    var continue = true
    while (merges.size < numMerges && continue) {
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect() // materializes `words` if it was a lazy cut
      if (prev != null) { prev.unpersist(false); prev = null }
      if (top.isEmpty) continue = false
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        prev = words
        words = words
          .select(mergePair(col("syms"), a, b).as("syms"), col("cnt"))
          .localCheckpoint(false)
      }
    }
    words.unpersist(false)
    if (prev != null) prev.unpersist(false)
    merges.toSeq
  }

  /** Tokenize a text column with a fitted merge list: per word, seed
    * symbols then apply each merge in fit order; word streams
    * concatenate. Pure Column expression — codegen size grows linearly
    * with the merge count, so this form suits the bounded vocabularies
    * the differential tests fit; production-size vocabularies
    * (30k+ merges) belong in a broadcast-ranked mapPartitions loop,
    * the same justified-imperative tier as the multimodal codecs. */
  def bpeTokenize(text: Column, merges: Seq[(String, String)]): Column = {
    import graft.functions.TextAnalysis.tokens
    flatten(transform(filter(tokens(text), w => length(w) > 0), w =>
      merges.foldLeft(seedSymbols(w)) { case (acc, (a, b)) => mergePair(acc, a, b) }))
  }
}
