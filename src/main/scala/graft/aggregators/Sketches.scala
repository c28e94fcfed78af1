package graft.aggregators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches as typed [[Aggregator]]s — the bounded-
  * memory path to corpus-wide frequency questions ("which tokens /
  * domains / shingles are heavy?") that at 100 TB must not materialize
  * a full `groupBy item` result just to read off its head.
  *
  * Reference behavior: TransmogrifAI bounds its categorical fits the
  * same way (HLL guards + topK cutoffs in the vectorizer fits, e.g.
  * `SmartTextVectorizer`'s coverage-based topK); this generalizes the
  * idea to a reusable sketch.
  */
object Sketches {

  /** Misra-Gries summary (Misra & Gries 1982; merge rule from Agarwal
    * et al. 2013, "Mergeable Summaries"): at most `k` counters; any item
    * with true frequency > n/(k+1) is GUARANTEED to hold a counter, and
    * each counter undercounts its item by at most n/(k+1).
    *
    * The buffer is a plain (item -> count) map capped at k entries:
    * - reduce: increment a held counter, claim a free slot, or decrement
    *   all counters by 1 (dropping zeros) — the classic update;
    * - merge: sum counts, then subtract the (k+1)-largest total from
    *   every counter and keep the positive ones — associative,
    *   commutative, and error-additive, which is what makes the sketch
    *   safe under Spark's arbitrary partial-aggregation merge order.
    *
    * The candidate SET can vary with merge order (any order satisfies
    * the guarantee); downstream exact verification makes results
    * order-independent — see [[heavyHittersExact]]. */
  class MisraGriesAggregator(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"k must be >= 1: $k")
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      if (b.contains(item)) b.updated(item, b(item) + 1L)
      else if (b.size < k) b.updated(item, 1L)
      else b.flatMap { case (i, c) => if (c > 1L) Some(i -> (c - 1L)) else None }
    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val summed = y.foldLeft(x) { case (acc, (i, c)) =>
        acc.updated(i, acc.getOrElse(i, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.flatMap { case (i, c) => if (c > cut) Some(i -> (c - cut)) else None }
      }
    }
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Heavy-hitter CANDIDATES for threshold `phi` (fraction of total
    * occurrences): one pass, bounded memory, superset of the truth.
    * Emits (item, lower_bound) — `lower_bound` is the sketch's
    * undercount-only estimate. k is sized ceil(1/phi) so every item
    * with frequency >= phi*n is guaranteed present. */
  def heavyHitterCandidates(df: DataFrame, item: Column, phi: Double): DataFrame = {
    require(phi > 0 && phi <= 1, s"phi out of range: $phi")
    val k = math.ceil(1.0 / phi).toInt
    val agg = udaf(new MisraGriesAggregator(k), ExpressionEncoder[String]())
    df.select(item.cast("string").as("__item"))
      .agg(agg(col("__item")).as("__mg"))
      .select(explode(col("__mg")).as(Seq("item", "lower_bound")))
  }

  /** EXACT heavy hitters (frequency >= phi * n) via the standard two
    * passes: sketch pass for a bounded candidate set, then an exact
    * recount of ONLY the candidates (broadcast semi-join — the recount
    * aggregates at most ceil(1/phi) distinct keys, so no full
    * `groupBy item` ever materializes). Deterministic regardless of the
    * sketch's merge order, hence oracle-checkable. Emits
    * (item, n_occurrences) for the true heavy hitters. */
  def heavyHittersExact(df: DataFrame, item: Column, phi: Double): DataFrame = {
    val items = df.select(item.cast("string").as("item"))
    val cands = heavyHitterCandidates(df, item, phi).select(col("item"))
    val total = items.agg(count(lit(1)).as("__n"))
    items.join(broadcast(cands), Seq("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n_occurrences"))
      .crossJoin(broadcast(total))
      .where(col("n_occurrences").cast("double") >= lit(phi) * col("__n"))
      .select(col("item"), col("n_occurrences"))
  }
}
