package graft.aggregators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Map-monoid aggregators (reference features/.../aggregators/Maps.scala:43-171):
  * union maps across rows, combining values on key collision with the
  * value monoid — sum, mean, min, max, logical-or, set-union, and
  * event-time-ordered concat. All are typed `Aggregator`s, so Spark runs
  * them partial+final (map-side combine before the shuffle); buffers are
  * bounded by the number of distinct map keys, which for map *features*
  * is schema-like (tens, not millions) — safe at any row count.
  *
  * Determinism: set-union finishes sorted and concat orders by the
  * event timestamp (tie-broken by value), so results are stable under
  * any partitioning — required for the differential oracle.
  */
object MapAggregators {

  /** Union + sum over Long values (exact in any order — use for counts
    * and integral measures; reference UnionIntegralMap). */
  object UnionSumLongMap extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: Map[String, Long]): Map[String, Long] =
      merge(b, if (a == null) Map.empty else a)
    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  }

  /** Union + mean over Double values ((sum, count) pair monoid per key;
    * reference UnionMeanMap, Maps.scala:58-74). */
  object UnionMeanMap extends Aggregator[Map[String, Double], Map[String, (Double, Long)], Map[String, Double]] {
    def zero: Map[String, (Double, Long)] = Map.empty
    def reduce(b: Map[String, (Double, Long)], a: Map[String, Double]): Map[String, (Double, Long)] =
      if (a == null) b
      else a.foldLeft(b) { case (m, (k, v)) =>
        val (s, n) = m.getOrElse(k, (0.0, 0L)); m.updated(k, (s + v, n + 1))
      }
    def merge(x: Map[String, (Double, Long)], y: Map[String, (Double, Long)]): Map[String, (Double, Long)] =
      y.foldLeft(x) { case (m, (k, (s2, n2))) =>
        val (s1, n1) = m.getOrElse(k, (0.0, 0L)); m.updated(k, (s1 + s2, n1 + n2))
      }
    def finish(b: Map[String, (Double, Long)]): Map[String, Double] =
      b.map { case (k, (s, n)) => k -> s / n }
    def bufferEncoder: Encoder[Map[String, (Double, Long)]] = ExpressionEncoder[Map[String, (Double, Long)]]()
    def outputEncoder: Encoder[Map[String, Double]] = ExpressionEncoder[Map[String, Double]]()
  }

  /** Union + min / max over Double values (reference UnionMinMax*Map,
    * Maps.scala:106-126). */
  class UnionExtremeMap(keepMax: Boolean)
      extends Aggregator[Map[String, Double], Map[String, Double], Map[String, Double]] {
    private def pick(a: Double, b: Double): Double =
      if (keepMax) math.max(a, b) else math.min(a, b)
    def zero: Map[String, Double] = Map.empty
    def reduce(b: Map[String, Double], a: Map[String, Double]): Map[String, Double] =
      merge(b, if (a == null) Map.empty else a)
    def merge(x: Map[String, Double], y: Map[String, Double]): Map[String, Double] =
      y.foldLeft(x) { case (m, (k, v)) =>
        m.updated(k, m.get(k).map(pick(_, v)).getOrElse(v))
      }
    def finish(b: Map[String, Double]): Map[String, Double] = b
    def bufferEncoder: Encoder[Map[String, Double]] = ExpressionEncoder[Map[String, Double]]()
    def outputEncoder: Encoder[Map[String, Double]] = ExpressionEncoder[Map[String, Double]]()
  }
  object UnionMinMap extends UnionExtremeMap(keepMax = false)
  object UnionMaxMap extends UnionExtremeMap(keepMax = true)

  /** Union + logical OR over Boolean values (reference UnionBinaryMap,
    * Maps.scala:159). */
  object UnionOrMap extends Aggregator[Map[String, Boolean], Map[String, Boolean], Map[String, Boolean]] {
    def zero: Map[String, Boolean] = Map.empty
    def reduce(b: Map[String, Boolean], a: Map[String, Boolean]): Map[String, Boolean] =
      merge(b, if (a == null) Map.empty else a)
    def merge(x: Map[String, Boolean], y: Map[String, Boolean]): Map[String, Boolean] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, false) || v) }
    def finish(b: Map[String, Boolean]): Map[String, Boolean] = b
    def bufferEncoder: Encoder[Map[String, Boolean]] = ExpressionEncoder[Map[String, Boolean]]()
    def outputEncoder: Encoder[Map[String, Boolean]] = ExpressionEncoder[Map[String, Boolean]]()
  }

  /** Union + set-union over String values; finishes each key's set as a
    * SORTED array for deterministic output (reference UnionSetMap,
    * Maps.scala:171). */
  object UnionSetMap extends Aggregator[Map[String, String], Map[String, Set[String]], Map[String, Seq[String]]] {
    def zero: Map[String, Set[String]] = Map.empty
    def reduce(b: Map[String, Set[String]], a: Map[String, String]): Map[String, Set[String]] =
      if (a == null) b
      else a.foldLeft(b) { case (m, (k, v)) =>
        if (v == null) m else m.updated(k, m.getOrElse(k, Set.empty) + v)
      }
    def merge(x: Map[String, Set[String]], y: Map[String, Set[String]]): Map[String, Set[String]] =
      y.foldLeft(x) { case (m, (k, s)) => m.updated(k, m.getOrElse(k, Set.empty) ++ s) }
    def finish(b: Map[String, Set[String]]): Map[String, Seq[String]] =
      b.map { case (k, s) => k -> s.toSeq.sorted }
    def bufferEncoder: Encoder[Map[String, Set[String]]] = Encoders.kryo[Map[String, Set[String]]]
    def outputEncoder: Encoder[Map[String, Seq[String]]] = ExpressionEncoder[Map[String, Seq[String]]]()
  }

  /** Union + event-time-ordered concat over String values (reference
    * UnionConcat*Map, Maps.scala:132-153 — made deterministic by
    * ordering on (timestamp, value) instead of encounter order).
    * Input: (eventTimeMicros, map). */
  object ConcatMapByTime
      extends Aggregator[(Long, Map[String, String]), Map[String, Seq[(Long, String)]], Map[String, String]] {
    def zero: Map[String, Seq[(Long, String)]] = Map.empty
    def reduce(b: Map[String, Seq[(Long, String)]], a: (Long, Map[String, String])): Map[String, Seq[(Long, String)]] = {
      val (ts, m0) = a
      if (m0 == null) b
      else m0.foldLeft(b) { case (m, (k, v)) =>
        if (v == null) m else m.updated(k, m.getOrElse(k, Seq.empty) :+ ((ts, v)))
      }
    }
    def merge(x: Map[String, Seq[(Long, String)]], y: Map[String, Seq[(Long, String)]]): Map[String, Seq[(Long, String)]] =
      y.foldLeft(x) { case (m, (k, s)) => m.updated(k, m.getOrElse(k, Seq.empty) ++ s) }
    def finish(b: Map[String, Seq[(Long, String)]]): Map[String, String] =
      b.map { case (k, s) => k -> s.sorted.map(_._2).mkString(",") }
    def bufferEncoder: Encoder[Map[String, Seq[(Long, String)]]] = Encoders.kryo[Map[String, Seq[(Long, String)]]]
    def outputEncoder: Encoder[Map[String, String]] = ExpressionEncoder[Map[String, String]]()
  }

  // ---- Column-API handles ----------------------------------------------
  def unionSumLongMap(c: Column): Column =
    udaf(UnionSumLongMap, ExpressionEncoder[Map[String, Long]]()).apply(c)
  def unionMeanMap(c: Column): Column =
    udaf(UnionMeanMap, ExpressionEncoder[Map[String, Double]]()).apply(c)
  def unionMinMap(c: Column): Column =
    udaf(UnionMinMap, ExpressionEncoder[Map[String, Double]]()).apply(c)
  def unionMaxMap(c: Column): Column =
    udaf(UnionMaxMap, ExpressionEncoder[Map[String, Double]]()).apply(c)
  def unionOrMap(c: Column): Column =
    udaf(UnionOrMap, ExpressionEncoder[Map[String, Boolean]]()).apply(c)
  def unionSetMap(c: Column): Column =
    udaf(UnionSetMap, ExpressionEncoder[Map[String, String]]()).apply(c)
  def concatMapByTime(tsMicros: Column, m: Column): Column =
    udaf(ConcatMapByTime, ExpressionEncoder[(Long, Map[String, String])]()).apply(tsMicros, m)
}
