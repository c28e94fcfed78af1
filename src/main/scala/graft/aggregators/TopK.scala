package graft.aggregators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k-per-group as a typed [[Aggregator]] — the scale-correct
  * replacement for `row_number().over(Window.partitionBy(key))` when only
  * the first k rows per group survive.
  *
  * The window form shuffles EVERY scored row to its group's reducer and
  * sorts the whole group before discarding all but k rows; at ANN scale
  * (|corpus| x |queries| scored pairs) that makes the shuffle the
  * dominant cost. This aggregator runs under ObjectHashAggregate with a
  * map-side partial pass, so each mapper forwards at most ~2k candidates
  * per group it saw: shuffle volume drops from O(rows) to
  * O(mappers x groups x k), independent of corpus size — the property
  * that keeps a 100 TB brute-force/bucketed ANN scan viable.
  *
  * Determinism: the comparator is the total order (score desc|asc, id
  * asc) — identical to the `ROW_NUMBER() OVER (ORDER BY score, id)`
  * ordering the DuckDB oracle replays, so swapping the window for the
  * aggregator is hash-invisible.
  */
object TopK {

  /** One scored candidate. */
  case class Hit(id: Long, score: Double)

  /** Keeps at most 2k hits between compactions (amortized O(log k) per
    * row); `finish` emits exactly the k best in rank order.
    *
    * The buffer is a PRIMITIVE Array[Long] of interleaved
    * (doubleToLongBits(score), id) pairs, not Seq[Hit]: a typed
    * Aggregator's buffer is serialized/deserialized through its encoder
    * on EVERY update, and for a Seq[Product] that round trip is a
    * per-element object walk — measured ~18µs/row on q256's 1.5M
    * scored pairs (28s of a 61s query). A primitive long array encodes
    * as one UnsafeArrayData bulk copy. Ordering is decoded back to
    * doubles and compared with the exact same (score desc|asc, id asc)
    * total order as before (Double.TotalOrdering — NaN sorts after all
    * reals in both directions), so results are hash-identical. */
  class TopKAggregator(k: Int, descending: Boolean)
      extends Aggregator[Hit, Array[Long], Seq[Hit]] {
    require(k >= 1, s"k must be >= 1: $k")
    @transient private lazy val ord: Ordering[(Double, Long)] =
      if (descending) Ordering.by(t => (-t._1, t._2))
      else Ordering.by(identity)
    private def pairs(b: Array[Long]): Array[(Double, Long)] =
      Array.tabulate(b.length / 2)(i =>
        (java.lang.Double.longBitsToDouble(b(2 * i)), b(2 * i + 1)))
    private def pack(ps: Array[(Double, Long)]): Array[Long] = {
      val out = new Array[Long](ps.length * 2)
      var i = 0
      while (i < ps.length) {
        out(2 * i) = java.lang.Double.doubleToLongBits(ps(i)._1)
        out(2 * i + 1) = ps(i)._2
        i += 1
      }
      out
    }
    private def cap(b: Array[Long]): Array[Long] =
      if (b.length <= 4 * k) b else pack(pairs(b).sorted(ord).take(k))
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], a: Hit): Array[Long] = {
      val out = java.util.Arrays.copyOf(b, b.length + 2)
      out(b.length) = java.lang.Double.doubleToLongBits(a.score)
      out(b.length + 1) = a.id
      cap(out)
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      val out = java.util.Arrays.copyOf(x, x.length + y.length)
      System.arraycopy(y, 0, out, x.length, y.length)
      cap(out)
    }
    def finish(b: Array[Long]): Seq[Hit] =
      pairs(b).sorted(ord).take(k).toSeq.map { case (s, id) => Hit(id, s) }
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Hit]] = ExpressionEncoder()
  }

  /** Top-k rows of `scored` per `key`, ranked by `score` (desc by
    * default, ties to the smaller `id`), with a 1-based `rank` column —
    * drop-in for the window-rank idiom, same rows, same order. */
  def topKPerKey(scored: DataFrame, key: String, id: String, score: String,
                 k: Int, descending: Boolean = true): DataFrame = {
    val agg = udaf(new TopKAggregator(k, descending), ExpressionEncoder[Hit]())
    scored.groupBy(col(key))
      .agg(agg(col(id), col(score)).as("__top"))
      .select(col(key), posexplode(col("__top")).as(Seq("__i", "__h")))
      .select(col(key), col("__h.id").as(id), col("__h.score").as(score),
        (col("__i") + 1).cast("int").as("rank"))
  }

  /** String-id variant (n-grams, tokens, domains): same contract with
    * ties broken by the id's binary order — matching Spark's and
    * DuckDB's ORDER BY on ASCII strings. */
  case class SHit(id: String, score: Double)

  class TopKStrAggregator(k: Int, descending: Boolean)
      extends Aggregator[SHit, Seq[SHit], Seq[SHit]] {
    require(k >= 1, s"k must be >= 1: $k")
    @transient private lazy val ord: Ordering[SHit] =
      if (descending) Ordering.by((h: SHit) => (-h.score, h.id))
      else Ordering.by((h: SHit) => (h.score, h.id))
    private def cap(b: Seq[SHit]): Seq[SHit] =
      if (b.length <= 2 * k) b else b.sorted(ord).take(k)
    def zero: Seq[SHit] = Vector.empty
    def reduce(b: Seq[SHit], a: SHit): Seq[SHit] = cap(b :+ a)
    def merge(x: Seq[SHit], y: Seq[SHit]): Seq[SHit] = cap(x ++ y)
    def finish(b: Seq[SHit]): Seq[SHit] = b.sorted(ord).take(k)
    def bufferEncoder: Encoder[Seq[SHit]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[SHit]] = ExpressionEncoder()
  }

  def topKPerKeyStr(scored: DataFrame, key: String, id: String, score: String,
                    k: Int, descending: Boolean = true): DataFrame = {
    val agg = udaf(new TopKStrAggregator(k, descending), ExpressionEncoder[SHit]())
    scored.groupBy(col(key))
      .agg(agg(col(id), col(score)).as("__top"))
      .select(col(key), posexplode(col("__top")).as(Seq("__i", "__h")))
      .select(col(key), col("__h.id").as(id), col("__h.score").as(score),
        (col("__i") + 1).cast("int").as("rank"))
  }
}
