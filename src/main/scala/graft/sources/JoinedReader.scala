package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join semantics of the reference's JoinedDataReader
  * (readers/.../JoinedDataReader.scala:119-205): equi-join two keyed
  * DataFrames (inner / left_outer / full_outer only — JoinTypes.scala:35-43),
  * recursive left spine for n-way trees, then optional post-join windowed
  * re-aggregation ("secondary aggregation", JoinedDataReader.scala:234-347):
  * after a 1-to-many join, group back to the key and fold each feature
  * with its monoid, with the many-side features filtered to a time window
  * around a cutoff (TimeBasedFilter).
  *
  * Spark-first notes: the join itself is a plain `.join` — Catalyst picks
  * broadcast vs sort-merge (we hint broadcast for dimension-sized sides).
  * The secondary aggregation reuses the join's output partitioning when
  * the join key equals the group key (no extra shuffle under SMJ).
  */
object JoinedReader {
  val supportedJoinTypes: Set[String] = Set("inner", "left_outer", "full_outer")

  def join(left: DataFrame, right: DataFrame, leftKey: Column, rightKey: Column,
           joinType: String = "inner", broadcastRight: Boolean = false): DataFrame = {
    require(supportedJoinTypes.contains(joinType),
      s"join type $joinType not in $supportedJoinTypes (reference JoinTypes.scala:35-43)")
    val r = if (broadcastRight) broadcast(right) else right
    left.join(r, leftKey === rightKey, joinType)
  }

  /** Combined-key shape: `coalesce(leftKey, rightKey)` after an outer
    * join (reference JoinedDataReader.scala:135). */
  def combinedKey(leftKey: Column, rightKey: Column): Column = coalesce(leftKey, rightKey)

  /** Secondary aggregation: group the joined (1-to-many) frame back to
    * `key`; `parentSide` specs take any single value per key (all equal
    * after the join — the reference uses a "dummy" keep-one aggregator,
    * JoinedDataReader.scala:404); `manySide` specs aggregate only rows
    * whose `ts` falls in [cutoff - window, cutoff) — the TimeBasedFilter
    * predictor window (JoinedDataReader.scala:274-347).
    */
  def secondaryAggregate(
      joined: DataFrame,
      key: Column,
      parentSide: Seq[(String, Column)],
      manySide: Seq[AggSpec],
      ts: Column,
      cutoff: Column,
      window: Option[Column] = None): DataFrame = {
    val inWindow = window match {
      case Some(w) => ts >= cutoff - w && ts < cutoff
      case None    => ts < cutoff
    }
    val aggs =
      parentSide.map { case (n, c) => first(c, ignoreNulls = true).as(n) } ++
      manySide.map(s => s.agg(when(inWindow, s.value)).as(s.name))
    joined.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }

  /** Bloom-prefiltered fact-dim join (beyond the reference): build a
    * Bloom filter over the dim side's join keys, then map-side filter
    * the fact BEFORE its shuffle with a `might_contain` probe. The
    * bloom admits false positives and the subsequent exact join removes
    * them, so the result is byte-identical to a plain join — the q123
    * oracle is exactly that plain join.
    *
    * Scale rationale: at 100 TB the fact's shuffle write dominates a
    * fact-dim join whose dim is too big to broadcast-hash-join outright
    * (100M keys ≈ several GB of hashed relation) but whose KEY SET fits
    * a bloom (100M keys @ 3% fpp ≈ 90 MB of bits). With a selective
    * dim, the prefilter cuts the fact's shuffle bytes by the dim's
    * selectivity. Spark's own runtime row-level filters
    * (spark.sql.optimizer.runtime.bloomFilter.enabled) inject this very
    * shape below a creation-side size threshold; this is the explicit,
    * threshold-free form for when the planner's heuristics decline.
    *
    * No UDF anywhere: the build side is Spark's native
    * `BloomFilterAggregate` (one distributed agg over `xxhash64(key)`),
    * the probe is the codegen'd `BloomFilterMightContain` over a binary
    * literal of the fitted bits — both the exact expressions the
    * runtime-filter optimizer rule uses, so the probe fuses into the
    * fact's scan projection. Driver memory is bounded by `numBits/8`
    * regardless of dim cardinality.
    */
  /** Batch interval join via bucket expansion (beyond the reference —
    * the batch sibling of the streaming interval join): match points
    * `p` to intervals `[lo, hi]` WITHOUT an equi-key. Spark plans a
    * bare range predicate as BroadcastNestedLoopJoin — O(|points| x
    * |intervals|) work and a broadcast of a whole side, a job-killer
    * at scale. Discretizing positions into `bucketWidth` cells turns
    * it into an equi-join: each interval is exploded to the cells it
    * covers, each point probes its single cell, and the residual
    * `BETWEEN` predicate filters within the cell. One equi-shuffle
    * keyed on cells; no duplicates by construction (a point lives in
    * exactly one cell).
    *
    * Cost model: interval expansion is |intervals| x (span/bucketWidth
    * + 1) rows — pick bucketWidth near the TYPICAL interval span so
    * expansion stays O(|intervals|) while cells stay selective. A
    * pathological giant interval expands to span/width cells; cap or
    * split those upstream (same discipline as the hot-shingle cap).
    *
    * Positions are integer (caller quantizes: epoch days/seconds).
    * Columns of both frames pass through; `pointPos`/`lo`/`hi` must be
    * column REFERENCES on the respective frames. */
  def bucketedIntervalJoin(points: DataFrame, pointPos: Column,
                           intervals: DataFrame, lo: Column, hi: Column,
                           bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val p = points.withColumn("__cell", floor(pointPos.cast("long") / bucketWidth))
    val iv = intervals.withColumn("__cells",
        sequence(floor(lo.cast("long") / bucketWidth),
                 floor(hi.cast("long") / bucketWidth)))
      .withColumn("__cell", explode(col("__cells"))).drop("__cells")
    // inner only: an exploded interval appears once per covered cell, so
    // interval-side outer-ness would need a post-hoc anti-join on an
    // interval id — compose that at the call site when empty intervals
    // must survive
    p.join(iv, Seq("__cell"))
      .where(pointPos >= lo && pointPos <= hi)
      .drop("__cell")
  }

  def bloomPrefilteredFact(fact: DataFrame, factKey: Column,
                           dim: DataFrame, dimKey: Column,
                           expectedKeys: Long,
                           numBits: Long = 8L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64, BloomFilterMightContain}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.ColumnSql.{columnOf, eagerExpressionOf}
    import org.apache.spark.sql.types.BinaryType
    val aggExpr = new BloomFilterAggregate(
        new XxHash64(Seq(eagerExpressionOf(dimKey))),
        Literal(expectedKeys), Literal(numBits))
      .toAggregateExpression()
    val bits = dim.select(columnOf(aggExpr).as("bf")).head.getAs[Array[Byte]](0)
    if (bits == null) fact.where(lit(false)) // empty dim: no key can match
    else fact.where(columnOf(BloomFilterMightContain(
      Literal(bits, BinaryType),
      new XxHash64(Seq(eagerExpressionOf(factKey))))))
  }
}
