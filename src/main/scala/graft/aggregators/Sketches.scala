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

  /** KMV (k minimum values) distinct-count sketch (Bar-Yossef et al.
    * 2002; Beyer et al. 2007 unbiased estimator): hash every value to
    * [0, 2^60), keep the k smallest DISTINCT hashes; with U_k the k-th
    * smallest normalized to (0,1], the estimate is (k-1)/U_k. Mergeable
    * (union, keep k smallest) and — because the hash is md5-derived —
    * fully deterministic: the same estimate on every run, partitioning,
    * and cluster size, and the differential oracle replays it exactly,
    * which an HLL register array never allows.
    *
    * Shape: one partial+final TopK-style aggregation over value hashes;
    * the buffer is bounded at ~2k longs. Emits ONE row:
    * (est_distinct, k_used). For exact-oracle gating pair it with an
    * exact countDistinct (cheap at test SF; the sketch is the 100 TB
    * path). */
  def kmvDistinct(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2: $k")
    import graft.functions.TextAnalysis.hash60
    val agg = udaf(new BottomKLongs(k), ExpressionEncoder[Long]())
    df.select(hash60(value.cast("string")).as("__h"))
      .agg(agg(col("__h")).as("__mins"))
      .select(
        // fewer than k distinct hashes -> the sketch holds everything;
        // the count is then exact
        when(size(col("__mins")) < k, size(col("__mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (element_at(col("__mins"), k).cast("double") /
              lit(1152921504606846976.0)))
          .as("est_distinct"),
        size(col("__mins")).as("k_used"))
  }

  /** Bounded buffer of the k smallest DISTINCT longs — the KMV /
    * bottom-k primitive. Compaction at 2k keeps reduce amortized. */
  class BottomKLongs(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    private def cap(b: Seq[Long]): Seq[Long] =
      if (b.length <= 2 * k) b else b.distinct.sorted.take(k)
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], h: Long): Seq[Long] = cap(b :+ h)
    def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = cap(x ++ y)
    def finish(b: Seq[Long]): Seq[Long] = b.distinct.sorted.take(k)
    def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Deterministic uniform sample of EXACTLY k rows via min-k md5
    * priorities over `id` (a bottom-k sketch on row identity):
    * mergeable, stable under any partitioning, and the oracle replays
    * the exact member set (`ORDER BY priority LIMIT k`). The scale path
    * for "estimate a quantile / histogram of a 100 TB column" — unlike
    * [[graft.operators.Curation.deterministicSample]]'s fraction
    * filter, the sample SIZE is exact, which estimators need.
    *
    * Two scan-only passes, no full-column shuffle: a TopK aggregation
    * forwards at most ~2k candidates per mapper to pick the winning
    * ids, then a broadcast semi-join re-attaches the original columns.
    * (Priorities compare as doubles — same IEEE rounding both engines;
    * ties impossible at any realistic k since ids are distinct.)
    * Emits the sampled rows with a 1-based `sample_rank`. */
  def minKSample(df: DataFrame, id: Column, k: Int,
                 salt: String = "minks"): DataFrame = {
    val pri = graft.functions.TextAnalysis.hash60(
      concat_ws(":", lit(salt), id.cast("string")))
    val picked = TopK.topKPerKey(
      df.select(lit(1).as("__g"), id.cast("long").as("__id"),
        pri.cast("double").as("__pri")),
      "__g", "__id", "__pri", k, descending = false)
      .select(col("__id"), col("rank").as("sample_rank"))
    df.join(broadcast(picked), id.cast("long") === col("__id"))
      .drop("__id")
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

  /** Per-group KMV distinct-count sketches: [[kmvDistinct]] run for
    * every group in ONE pass — distinct (group, hash) pairs, then the
    * k smallest hashes per group via a group-partitioned window (never
    * a global sort). State per group is O(k) no matter the group's
    * cardinality — the bounded answer to "distinct users per segment"
    * that an exact per-group countDistinct can't give at 100 TB.
    * Deterministic (md5 hash), so the estimate itself is oracle-gated,
    * exactly like the global sketch. */
  def kmvDistinctByGroup(df: DataFrame, group: Column, value: Column,
                         k: Int): DataFrame = {
    import graft.functions.TextAnalysis.hash60
    require(k >= 2, s"k must be >= 2, got $k")
    val hashes = df.select(group.as("grp"),
      hash60(value.cast("string")).as("h")).distinct()
    val kept = hashes.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("grp")).orderBy(col("h"))))
      .where(col("rn") <= k)
    kept.groupBy(col("grp"))
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("hk"))
      .select(col("grp"), col("k_used"),
        round(when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (col("hk").cast("double") / math.pow(2.0, 60))), 6)
          .as("est_distinct"))
  }

  /** Count-Min sketch matrix (Cormode & Muthukrishnan 2005): `depth`
    * hash rows × `width` buckets, h_i(x) = md5("i|x") % width. Counters
    * are purely ADDITIVE, so unlike Misra-Gries the materialized matrix
    * is identical under every merge order and partitioning — the
    * differential oracle replays it cell-for-cell. The plan is an
    * O(depth) row expansion + ONE groupBy((row, bucket)) shuffle into at
    * most depth·width cells — bounded output no matter the item domain.
    * Zero cells are omitted (sparse form). */
  def cmsSketch(df: DataFrame, item: Column, depth: Int, width: Int): DataFrame = {
    import graft.functions.TextAnalysis.hash60
    require(depth >= 1 && width >= 1, s"bad CMS shape: $depth x $width")
    df.select(item.cast("string").as("__item"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row"), col("__item"))
      .select(col("row"),
        pmod(hash60(concat(col("row").cast("string"), lit("|"), col("__item"))),
          lit(width)).cast("int").as("bucket"))
      .groupBy(col("row"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the CMS: estimate(x) = min_i matrix[i][h_i(x)] — an
    * overcount-only estimate (never below the true frequency; within
    * e·n of it with probability 1 - delta for width = ceil(e/eps),
    * depth = ceil(ln 1/delta)). `queries` is one item per row; the
    * matrix side is broadcast (≤ depth·width cells). */
  def cmsEstimate(matrix: DataFrame, queries: DataFrame, item: Column,
                  depth: Int, width: Int): DataFrame = {
    import graft.functions.TextAnalysis.hash60
    queries.select(item.cast("string").as("item")).distinct()
      .select(col("item"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("item"), col("row"),
        pmod(hash60(concat(col("row").cast("string"), lit("|"), col("item"))),
          lit(width)).cast("int").as("bucket"))
      .join(broadcast(matrix), Seq("row", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Re-aggregatable distinct-count STATES via Spark's built-in
    * DataSketches HLL: per-key binary sketches you can store, ship,
    * and union later — the warehouse pattern where daily partitions
    * keep a sketch column and any date range's distinct count is a
    * union of states, never a re-scan. Register maxing is commutative
    * and associative, so estimates are independent of Spark's
    * partial-merge order (unlike a float sum). lgK=12 ≈ ±1.6% rel.
    * error at 4 KB per state. */
  def hllStates(df: DataFrame, keys: Seq[Column], value: Column,
                lgK: Int = 12): DataFrame =
    df.groupBy(keys: _*)
      .agg(hll_sketch_agg(value.cast("string"), lit(lgK)).as("hll_state"))

  /** Union previously-built states down to estimates — `by` is the
    * (coarser) grouping of the rollup, e.g. states per (day, country)
    * rolled up to per-country. */
  def hllRollup(states: DataFrame, by: Seq[Column]): DataFrame =
    states.groupBy(by: _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll_state"), lit(true)))
        .as("n_distinct_est"))

  /** Fully DETERMINISTIC HyperLogLog (Flajolet et al. 2007) on the md5
    * hash60 family: m = 64 registers, bucket = h mod 64, rho = leading-
    * zero rank of the remaining 54 bits via `bin()` string length
    * (exact integer ops — no libm), and the harmonic mean folded as
    * Σ 2^(55-rho) in BIGINT so the whole estimate — including the
    * alpha_m bias constant — replays bit-for-bit in SQL. The gated
    * counterpart to [[hllStates]]' opaque DataSketches states: same
    * register algebra, auditable numbers. One groupBy to registers
    * (64/group), one rollup — never a distinct of the raw values.
    * Emits per group (buckets_set, est_distinct) with est unrounded
    * (caller rounds at the readout). */
  def hllDeterministic(df: DataFrame, groups: Seq[Column], value: Column)
    : DataFrame = {
    val gcols = groups.indices.map(i => col(s"__g$i"))
    hllEstimate(hllRegisters(df, groups, value), gcols)
  }

  /** The (group..., bucket, register) table behind [[hllDeterministic]]
    * — exposed so register tables can be MERGED (per-bucket max) before
    * estimating: union cardinality is the estimate of the merged
    * registers, intersection follows by inclusion-exclusion. This is
    * the algebra that makes HLL the warehouse primitive: states built
    * per partition/day combine without re-scanning. */
  def hllRegisters(df: DataFrame, groups: Seq[Column], value: Column)
    : DataFrame = {
    import graft.functions.TextAnalysis.hash60
    val g = groups.zipWithIndex.map { case (c, i) => c.as(s"__g$i") }
    val gcols = groups.indices.map(i => col(s"__g$i"))
    val h = hash60(value)
    val base = df.select(g :+ pmod(h, lit(64L)).as("__b") :+
      shiftright(h, 6).as("__w"): _*)
    base
      .withColumn("__rho", when(col("__w") === 0, lit(55))
        .otherwise(lit(55) - length(bin(col("__w")))))
      .groupBy(gcols :+ col("__b"): _*).agg(max(col("__rho")).as("__r"))
  }

  /** Fold a register table down to (group..., buckets_set,
    * est_distinct); `gcols` empty → one global row. Estimate unrounded
    * (caller rounds at the readout). */
  def hllEstimate(regs: DataFrame, gcols: Seq[Column]): DataFrame = {
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0))
    regs.groupBy(gcols: _*)
      .agg(count(lit(1)).as("buckets_set"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - __r)")).as("__sp"))
      .withColumn("__s", col("__sp") +
        (lit(64L) - col("buckets_set")) * lit(36028797018963968L))
      .select(gcols ++ Seq(col("buckets_set"),
        (alpha * lit(4096.0) * lit(3.6028797018963968e16) /
          col("__s").cast("double")).as("est_distinct")): _*)
  }

  /** KMV set-overlap estimate between two value sets (Beyer et al.
    * 2007): take the k minimum md5 hashes of the UNION's distinct
    * values; the fraction of those present in both sides estimates the
    * Jaccard similarity, and resemblance x union-distinct estimates
    * the intersection size. md5-deterministic (no RNG), so every
    * number replays exactly in SQL — unlike probabilistic sketches,
    * this one is bit-reproducible across engines. Cost: one distinct
    * per side + a TakeOrdered of k rows; the drift check that says
    * "did this column's VALUE SET shift" when histograms can't (high
    * cardinality, no order). */
  def kmvJaccard(a: DataFrame, aCol: Column, b: DataFrame, bCol: Column,
                 k: Int, salt: String = "kmv"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import graft.functions.TextAnalysis.hash60
    def side(df: DataFrame, c: Column, tag: Int) = df
      .select(c.cast("string").as("v")).where(col("v").isNotNull).distinct()
      .select(hash60(concat_ws(":", lit(salt), col("v"))).as("h"),
        lit(tag).as("side"))
    val u = side(a, aCol, 1)
      .unionByName(side(b, bCol, 2))
      .groupBy(col("h"))
      .agg(max(when(col("side") === 1, 1).otherwise(0)).as("in_a"),
        max(when(col("side") === 2, 1).otherwise(0)).as("in_b"))
      .orderBy(col("h")).limit(k)
    u.agg(count(lit(1)).as("k_used"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("n_both"))
      .select(col("k_used"), col("n_both"),
        round(col("n_both").cast("double") /
          greatest(col("k_used"), lit(1L)).cast("double"), 6)
          .as("jaccard_est"))
  }
}
