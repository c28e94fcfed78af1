package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-level map-feature transforms (reference dsl/RichMapFeature.scala):
  * key filtering (FilterMap, RichMapFeature.scala:58), value transforms
  * over map subtypes (EmailToPickListMapTransformer, TimePeriod map
  * variants, RichMapFeature.scala:730-860). All are pure Column
  * expressions over Spark's higher-order map functions — codegen'd,
  * no UDFs. */
object MapFunctions {

  /** Keep only allow-listed keys (FilterMap allowList). */
  def filterKeysAllow(m: Column, allow: Seq[String]): Column =
    map_filter(m, (k, _) => k.isInCollection(allow))

  /** Drop block-listed keys (FilterMap blockList). */
  def filterKeysBlock(m: Column, block: Seq[String]): Column =
    map_filter(m, (k, _) => !k.isInCollection(block))

  /** Drop entries with null/empty values (TextMap cleaning convention:
    * reference stores absent text as missing, not as ""). */
  def dropEmptyValues(m: Column): Column =
    map_filter(m, (_, v) => v.isNotNull && length(v) > 0)

  /** Uppercase all values (PickListMap normalization example). */
  def upperValues(m: Column): Column = transform_values(m, (_, v) => upper(v))

  /** EmailMap → PickListMap of domains (EmailToPickListMapTransformer). */
  def emailDomains(m: Column): Column =
    transform_values(m, (_, v) => substring_index(v, "@", -1))

  /** DateMap → IntegralMap of the month-of-year time period
    * (TimePeriodMapTransformer, MonthOfYear). */
  def monthOfYearValues(m: Column): Column =
    transform_values(m, (_, v) => month(v))

  /** Remaining TimePeriodMapTransformer periods (reference TimePeriod
    * enum: DayOfMonth/DayOfWeek/DayOfYear/HourOfDay/WeekOfYear). */
  def dayOfMonthValues(m: Column): Column =
    transform_values(m, (_, v) => dayofmonth(v))
  def dayOfWeekValues(m: Column): Column =
    transform_values(m, (_, v) => dayofweek(v))
  def dayOfYearValues(m: Column): Column =
    transform_values(m, (_, v) => dayofyear(v))
  def hourOfDayValues(m: Column): Column =
    transform_values(m, (_, v) => hour(v))
  def weekOfYearValues(m: Column): Column =
    transform_values(m, (_, v) => weekofyear(v))

  /** Map value by key with null default (Prediction extract analog). */
  def valueAt(m: Column, key: String): Column = element_at(m, key)

  /** UrlMap → PickListMap of domains (UrlMapToPickListMapTransformer):
    * host part of each URL value. */
  def urlDomains(m: Column): Column =
    transform_values(m, (_, v) =>
      regexp_extract(v, "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@]+@)?([^/:?#]+)", 1))

  /** TextMapLenEstimator analog: per-key value lengths (absent/null
    * value → 0, the reference's length-of-missing convention). */
  def valueLengths(m: Column): Column =
    transform_values(m, (_, v) => coalesce(length(v), lit(0)))

  /** TextMapNullEstimator analog: per-key null indicator map (1 when
    * the key's value is null or empty). */
  def nullIndicators(m: Column): Column =
    transform_values(m, (_, v) =>
      when(v.isNull || length(v) === 0, 1).otherwise(0))

  /** Prediction map (reference types/Maps.scala:339 — a NonNullable
    * RealMap with reserved keys `prediction` / `probability_*`): pack
    * flat predictor outputs into the reference's map shape. Kept
    * optional — the engine scores into flat columns for column pruning,
    * and lifts to the map form only where Prediction-typed parity is
    * wanted. */
  def predictionMap(prediction: Column, probabilities: Column*): Column =
    map(Seq(lit("prediction"), prediction.cast("double")) ++
      probabilities.zipWithIndex.flatMap { case (p, i) =>
        Seq(lit(s"probability_$i"), p.cast("double")) }: _*)

  /** Prediction extract (reference RichMapFeature.scala:1118-1152). */
  def predictionValue(m: Column): Column = element_at(m, "prediction")
  def probabilityValue(m: Column, i: Int): Column = element_at(m, s"probability_$i")

  /** DateMap → unit-circle sin/cos of month-of-year, as a map of
    * 2-element arrays (DateMapToUnitCircleVectorizer.scala:134). */
  def monthUnitCircleValues(m: Column): Column =
    transform_values(m, (_, v) => {
      val angle = (month(v) - 1) * lit(2 * math.Pi / 12)
      array(sin(angle), cos(angle))
    })
}
