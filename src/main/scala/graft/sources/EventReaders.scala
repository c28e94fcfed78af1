package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time cutoff configuration (reference: features/.../aggregators/
  * CutOffTime.scala:41-70). A cutoff partitions each key's event history:
  * predictor features aggregate events strictly BEFORE the cutoff,
  * response features aggregate events AT/AFTER it — the leakage guard at
  * the heart of the reference's reader semantics
  * (FeatureAggregator.scala:105-130).
  */
sealed trait CutOff { def toColumn: Column }
object CutOff {
  /** Fixed timestamp cutoff (micros/ISO string both fine). */
  case class At(ts: String) extends CutOff { def toColumn: Column = to_timestamp(lit(ts)) }
  case class AtColumn(c: Column) extends CutOff { def toColumn: Column = c }
  /** N days before `now` (reference CutOffTime.DaysAgo — `now` is an
    * explicit argument instead of wall-clock so runs are reproducible). */
  case class DaysAgo(n: Int, now: String) extends CutOff {
    def toColumn: Column = to_timestamp(lit(now)) - expr(s"INTERVAL $n DAYS")
  }
  /** N weeks before `now` (reference CutOffTime.WeeksAgo). */
  case class WeeksAgo(n: Int, now: String) extends CutOff {
    def toColumn: Column = to_timestamp(lit(now)) - expr(s"INTERVAL ${n * 7} DAYS")
  }
  /** ddMMyyyy-encoded date (reference CutOffTime.DDMMYYYY). */
  case class DDMMYYYY(s: String) extends CutOff {
    def toColumn: Column = to_timestamp(lit(s), "ddMMyyyy")
  }
  case object None extends CutOff { def toColumn: Column = lit(null).cast("timestamp") }
}

/** A named aggregation over a value column, applied conditionally to the
  * predictor or response side of the cutoff.
  */
case class AggSpec(name: String, agg: Column => Column, value: Column)

/** Keyed event aggregation with event-time cutoffs — the Spark-first
  * re-expression of the reference's AggregatedReader
  * (readers/.../DataReader.scala:216-263). One shuffle on the key, all
  * aggregations partial+final (map-side combine), cutoff realized as a
  * `when` filter inside each aggregate so no second pass is needed.
  *
  * Scale note: this is a single hash-aggregate over the key column; at
  * 100 TB the only tunables are shuffle partition count and (for skewed
  * keys) AQE skew handling — there is no row explosion and no join.
  */
object AggregateReader {

  /** Aggregate `predictors` over events where ts < cutoff and `responses`
    * over events where ts >= cutoff, grouped by `key`. Windows (optional)
    * bound how far from the cutoff each side looks, mirroring
    * `aggregateParams.window` in the reference.
    */
  def aggregateWithCutoff(
      events: DataFrame,
      key: Column,
      ts: Column,
      cutoff: CutOff,
      predictors: Seq[AggSpec],
      responses: Seq[AggSpec] = Seq.empty,
      predictorWindow: Option[Column] = None,
      responseWindow: Option[Column] = None): DataFrame = {
    val cut = cutoff.toColumn
    def predFilter: Column = {
      val base = cutoff match {
        case CutOff.None => lit(true)
        case _ => ts < cut
      }
      predictorWindow.map(w => base && ts >= cut - w).getOrElse(base)
    }
    def respFilter: Column = {
      val base = ts >= cut
      responseWindow.map(w => base && ts < cut + w).getOrElse(base)
    }
    val aggs =
      predictors.map(s => s.agg(when(predFilter, s.value)).as(s.name)) ++
      responses.map(s => s.agg(when(respFilter, s.value)).as(s.name))
    events.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }

  /** Plain keyed aggregation (no cutoff). */
  def aggregate(events: DataFrame, key: Column, aggs: Seq[AggSpec]): DataFrame =
    events.groupBy(key).agg(aggs.head.agg(aggs.head.value).as(aggs.head.name),
      aggs.tail.map(s => s.agg(s.value).as(s.name)): _*)
}

/** Which qualifying event time becomes the per-key cutoff
  * (reference TimeStampToKeep, DataReader.scala:303-384). `Random` is
  * md5-deterministic — the qualifying event with the smallest
  * hash60(key|ts) wins, giving the reference's "random pick" semantics
  * with reproducible (and oracle-replayable) output; the reference left
  * seeding as a TODO (DataReader.scala:382). */
object TimeStampToKeep extends Enumeration { val Min, Max, Random = Value }

/** Conditional (as-of) aggregation: the cutoff is not a constant but a
  * per-key event time — the first/last time `targetCondition` held. The
  * reference implements this as a second scan (DataReader.scala:310-340);
  * here it is ONE aggregation: the conditional min/max of the timestamp
  * and every conditional aggregate are computed in the same groupBy by
  * exploiting that `min/max(when(cond, ts))` and `agg(when(ts < cutoff,
  * v))` can be fused via a two-phase agg over the same shuffle — we do a
  * groupBy computing the cutoff, then a broadcast-join back (cutoffs are
  * one row per key, tiny relative to events) and a second groupBy.
  *
  * Scale note: the cutoff table is |keys| rows; at 100 TB of events with
  * even 10^9 keys it's ~16 GB — we keep the join keyed (sort-merge on the
  * same key partitioning Spark reuses from the first agg) and let AQE
  * downgrade to broadcast when small.
  */
object ConditionalReader {
  def aggregateAsOf(
      events: DataFrame,
      key: Column,
      ts: Column,
      targetCondition: Column,
      keep: TimeStampToKeep.Value,
      predictors: Seq[AggSpec],
      responses: Seq[AggSpec],
      dropIfConditionNotMet: Boolean = true): DataFrame = {
    val pickedTs = when(targetCondition, ts)
    val picked: Column = keep match {
      case TimeStampToKeep.Min => min(pickedTs)
      case TimeStampToKeep.Max => max(pickedTs)
      case TimeStampToKeep.Random =>
        min_by(pickedTs, when(targetCondition,
          graft.functions.TextAnalysis.hash60(
            concat_ws("|", key, unix_micros(ts)))))
    }
    val cutoffs = events.groupBy(key.as("__key"))
      .agg(picked.as("__cutoff"))
    val withCut = events.join(cutoffs, key === col("__key"),
      if (dropIfConditionNotMet) "inner" else "left")
      .where(if (dropIfConditionNotMet) col("__cutoff").isNotNull else lit(true))
    AggregateReader.aggregateWithCutoff(
      withCut, key, ts, CutOff.AtColumn(col("__cutoff")), predictors, responses)
  }
}
