package graft.aggregators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Monoid-style aggregations mirroring the reference's per-type default
  * aggregator table (reference: features/.../aggregators/
  * MonoidAggregatorDefaults.scala:52-125), re-expressed as Spark typed
  * `Aggregator`s (partial + final merge — map-side combine for free) or,
  * where a codegen'd builtin exists, as plain `Column` functions.
  *
  * Design rule for 100 TB scale: every aggregator here is associative and
  * commutative with a bounded buffer, so Spark can always run it as
  * partial aggregation before the shuffle.
  */
object MonoidAggregators {

  // ---- Builtin-backed monoids (whole-stage codegen, preferred) ----------
  /** Sum* family (SumReal/SumCurrency/SumIntegral). */
  def sumOf(c: Column): Column = sum(c)
  /** Min/Max* family. */
  def minOf(c: Column): Column = min(c)
  def maxOf(c: Column): Column = max(c)
  /** Mean* family — Spark computes as (sum, count) pair monoid already. */
  def meanOf(c: Column): Column = avg(c)
  /** LogicalOr / LogicalAnd. */
  def logicalOr(c: Column): Column = max(c.cast("boolean"))
  def logicalAnd(c: Column): Column = min(c.cast("boolean"))
  /** LogicalXor = parity of true-count (reference aggregators/Numerics.scala:112-148). */
  def logicalXor(c: Column): Column =
    (sum(when(c.cast("boolean"), 1L).otherwise(0L)) % 2 === 1)
  /** First/Last by event time (reference TimeBasedAggregator.scala:38-73). */
  def firstByTime(value: Column, ts: Column): Column = min_by(value, ts)
  def lastByTime(value: Column, ts: Column): Column = max_by(value, ts)
  /** ConcatText* family — order-sensitive concat by event time.
    * Deterministic: sort collected (ts, value) pairs, then join. */
  def concatByTime(value: Column, ts: Column, sep: String = ","): Column =
    array_join(
      transform(array_sort(collect_list(struct(ts.as("t"), value.as("v")))),
        x => x.getField("v")),
      sep)
  /** UnionMultiPickList — set union, deterministic sorted form. */
  def unionSet(c: Column): Column = array_sort(collect_set(c))
  /** ConcatList family — flattened element concat (order by event time). */
  def concatLists(value: Column, ts: Column): Column =
    flatten(transform(array_sort(collect_list(struct(ts.as("t"), value.as("v")))),
      x => x.getField("v")))
  /** Max/MinDateList family (reference aggregators/Lists.scala:56-74):
    * union the per-row date lists and keep the single extreme value, as
    * a one-element list (the reference's DateList-of-one shape). Nulls
    * and empty lists are transparent: array_max/min of an empty list is
    * null and max/min skip nulls. */
  def maxDateList(c: Column): Column = array(max(array_max(c)))
  def minDateList(c: Column): Column = array(min(array_min(c)))
  /** CombineVector (reference aggregators/OPVector.scala:43):
    * concatenate vectors across rows. The reference's monoid is
    * encounter-ordered (non-deterministic under shuffle); ours orders by
    * an explicit sort key so results are stable under any partitioning. */
  def combineVectors(v: Column, ord: Column): Column = concatLists(v, ord)
  /** HLL cardinality guard (reference OpOneHotVectorizer.scala:260-267):
    * error ≈ 1.04/sqrt(2^bits); rsd for bits=12 ≈ 0.0162. */
  def hllDistinct(c: Column, bits: Int = 12): Column =
    approx_count_distinct(c, 1.04 / math.sqrt(math.pow(2, bits)))

  // ---- Custom typed Aggregators (no codegen'd builtin) -----------------

  /** ModePickList: most frequent value; tiebreak = smallest value
    * (reference aggregators/Text.scala:73, ordering at
    * OpOneHotVectorizer.scala:103 (-count, value)). */
  object ModeString extends Aggregator[String, Map[String, Long], String] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)
    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    def finish(b: Map[String, Long]): String =
      if (b.isEmpty) null else b.minBy { case (k, v) => (-v, k) }._1
    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Union+sum map monoid (reference aggregators/Maps.scala:43-53):
    * merge maps, summing values on key collision. */
  object UnionSumMap extends Aggregator[Map[String, Double], Map[String, Double], Map[String, Double]] {
    def zero: Map[String, Double] = Map.empty
    def reduce(b: Map[String, Double], a: Map[String, Double]): Map[String, Double] = merge(b, if (a == null) Map.empty else a)
    def merge(x: Map[String, Double], y: Map[String, Double]): Map[String, Double] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0.0) + v) }
    def finish(b: Map[String, Double]): Map[String, Double] = b
    def bufferEncoder: Encoder[Map[String, Double]] = Encoders.kryo[Map[String, Double]]
    def outputEncoder: Encoder[Map[String, Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Double]]()
  }

  /** Geolocation midpoint: mean of 3-D cartesian coordinates, keeping the
    * best (max) accuracy (reference aggregators/Geolocation.scala:43). */
  case class GeoBuf(x: Double, y: Double, z: Double, n: Long, acc: Double)
  object GeoMidpoint extends Aggregator[(Double, Double, Double), GeoBuf, Seq[Double]] {
    private def rad(d: Double) = d * math.Pi / 180.0
    def zero: GeoBuf = GeoBuf(0, 0, 0, 0L, 0)
    def reduce(b: GeoBuf, a: (Double, Double, Double)): GeoBuf = {
      val (lat, lon, acc) = a
      GeoBuf(b.x + math.cos(rad(lat)) * math.cos(rad(lon)),
             b.y + math.cos(rad(lat)) * math.sin(rad(lon)),
             b.z + math.sin(rad(lat)), b.n + 1, math.max(b.acc, acc))
    }
    def merge(p: GeoBuf, q: GeoBuf): GeoBuf =
      GeoBuf(p.x + q.x, p.y + q.y, p.z + q.z, p.n + q.n, math.max(p.acc, q.acc))
    def finish(b: GeoBuf): Seq[Double] =
      if (b.n == 0) Seq.empty
      else {
        val (x, y, z) = (b.x / b.n, b.y / b.n, b.z / b.n)
        val lon = math.atan2(y, x)
        val lat = math.atan2(z, math.sqrt(x * x + y * y))
        Seq(lat * 180.0 / math.Pi, lon * 180.0 / math.Pi, b.acc)
      }
    def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Column-API handles (registered lazily — udaf() wraps the typed
    * aggregator so it runs as a real Catalyst aggregate with partials). */
  def modeString(c: Column): Column = udaf(ModeString).apply(c)
  def unionSumMap(c: Column): Column =
    udaf(UnionSumMap,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Double]]()
    ).apply(c)
}
