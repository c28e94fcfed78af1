package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Map-feature vectorizers (reference TextMapPivotVectorizer.scala,
  * OPMapVectorizer.scala): keys are DISCOVERED at fit time by exploding
  * the map, then each key gets the scalar vectorizer treatment — here
  * the one-hot top-K pivot with Other + Null slots and the reference's
  * (-count, value) ordering.
  *
  * Scale: the fit is one explode + groupBy((key, value)) — shuffle keyed
  * on (key, value) pairs; the fitted table is O(#keys * K) and folds
  * into row-local literal expressions for the transform, so scoring is a
  * single codegen'd projection. */
object MapVectorizers {

  /** Default bound on discovered map keys per vectorizer fit. Map keys
    * are schema-like, so real data sits far below this; the cap exists
    * so an adversarial column (ids-as-keys) cannot OOM the driver. */
  val DefaultMaxKeys: Int = 1024

  /** Discover map keys, BOUNDED: the top `maxKeys` keys by document
    * frequency (ties broken alphabetically), returned sorted. The fit
    * collect is O(maxKeys) no matter the data's key domain — an
    * unbounded `.distinct().collect()` here is a driver OOM at 100 TB.
    * Truncation is loud (stderr) because dropping keys changes the
    * output schema. */
  def discoverKeys(df: DataFrame, m: Column, maxKeys: Int = DefaultMaxKeys): Seq[String] = {
    require(maxKeys >= 1, s"maxKeys must be >= 1, got $maxKeys")
    val byFreq = df.select(explode(map_keys(m)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("k").asc)
      .limit(maxKeys + 1)
      .collect().map(_.getString(0))
    if (byFreq.length > maxKeys)
      System.err.println(
        s"[graft] map-key discovery hit the $maxKeys-key cap; keeping the " +
          s"$maxKeys most frequent keys and dropping the rest of the domain")
    byFreq.take(maxKeys).sorted
  }

  /** Fitted pivot table: (key, value, rank) with rank 1..k per key by
    * (count desc, value asc), support >= minSupport. The window
    * partitions by map key — never a single-partition global sort. */
  def fitMapPivot(df: DataFrame, m: Column, k: Int, minSupport: Long): DataFrame =
    df.select(explode(m).as(Seq("k", "v")))
      .where(col("v").isNotNull)
      .groupBy(col("k"), col("v")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minSupport)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("cnt").desc, col("v").asc)))
      .where(col("rank") <= k)
      .select(col("k"), col("v"), col("rank"))

  /** TextMapPivotVectorizer: one-hot columns `<key>_1..k`, `<key>_other`,
    * `<key>_null` for every discovered key. The fitted table is
    * collected (O(#keys * K) rows — map keys are schema-like) and folded
    * into literal when-expressions. */
  def textMapPivot(df: DataFrame, id: Column, m: Column, k: Int,
                   minSupport: Long = 1,
                   maxKeys: Int = DefaultMaxKeys): DataFrame = {
    val kept = discoverKeys(df, m, maxKeys)
    val fitted: Map[String, Seq[String]] = fitMapPivot(df, m, k, minSupport)
      .where(col("k").isin(kept: _*))
      .collect()
      .groupBy(_.getString(0))
      .map { case (key, rows) =>
        key -> rows.sortBy(_.getInt(2)).map(_.getString(1)).toSeq
      }
    val slotCols = fitted.toSeq.sortBy(_._1).flatMap { case (key, vals) =>
      val cell = element_at(m, key)
      val tops = (1 to k).map { i =>
        val c = if (i <= vals.length) when(cell === lit(vals(i - 1)), 1).otherwise(0) else lit(0)
        c.as(s"${key}_$i")
      }
      tops ++ Seq(
        when(cell.isNotNull && !cell.isin(vals: _*), 1).otherwise(0).as(s"${key}_other"),
        when(cell.isNull, 1).otherwise(0).as(s"${key}_null"))
    }
    df.select(id.as("id") +: slotCols: _*)
  }

  /** MultiPickListMapVectorizer (reference
    * MultiPickListMapVectorizer.scala:64): pivot a SET-VALUED map
    * (`map<string, array<string>>`). Fit discovers keys (bounded) and,
    * per key, the top-K set values by document frequency — each row's
    * set counts a value once — ranked (count desc, value asc), support
    * >= minSupport, mirroring the reference's getTopValues tiebreak
    * (Transmogrifier.scala:654). Transform per key: indicator `<key>_i`
    * when the set contains top value i (a set can light several slots),
    * `<key>_other` COUNTS the set's non-top values (the reference emits
    * the count, not an indicator — MultiPickListMapVectorizer.scala:111),
    * `<key>_null` marks rows where the key is absent. Keys unseen at fit
    * are ignored, like the reference.
    *
    * Scale: fit = one explode+explode+groupBy((key, value)) shuffle;
    * the fitted table is O(#keys * K) and folds into row-local literal
    * expressions, so the transform is a single codegen'd projection. */
  def multiPickListMapVectorize(df: DataFrame, id: Column, m: Column, k: Int,
                                minSupport: Long = 1,
                                maxKeys: Int = DefaultMaxKeys): DataFrame = {
    val kept = discoverKeys(df, m, maxKeys)
    val fitted: Map[String, Seq[String]] = df
      .select(explode(m).as(Seq("k", "vs")))
      .where(col("k").isin(kept: _*))
      .select(col("k"), explode(array_distinct(col("vs"))).as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("k"), col("v")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minSupport)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("cnt").desc, col("v").asc)))
      .where(col("rank") <= k)
      .collect()
      .groupBy(_.getString(0))
      .map { case (key, rows) =>
        key -> rows.sortBy(_.getInt(3)).map(_.getString(1)).toSeq
      }
    val slotCols = kept.flatMap { key =>
      val cell = array_distinct(element_at(m, key))
      val vals = fitted.getOrElse(key, Nil)
      val tops = (1 to k).map { i =>
        val c = if (i <= vals.length)
          when(cell.isNotNull && array_contains(cell, vals(i - 1)), 1).otherwise(0)
        else lit(0)
        c.as(s"${key}_$i")
      }
      val other =
        if (vals.isEmpty) when(cell.isNotNull, size(cell)).otherwise(0)
        else when(cell.isNotNull,
          size(array_except(cell, lit(vals.toArray)))).otherwise(0)
      tops ++ Seq(other.as(s"${key}_other"),
        when(cell.isNull, 1).otherwise(0).as(s"${key}_null"))
    }
    df.select(id.as("id") +: slotCols: _*)
  }

  /** SmartTextMapVectorizer (reference SmartTextMapVectorizer.scala):
    * discover keys, compute per-key TextStats (distinct count + length
    * variance) in ONE explode + groupBy pass, then dispatch each key to
    * pivot (low cardinality), hash (free text), or ignore — the same
    * decision table as the scalar SmartTextVectorizer, applied per
    * discovered key. */
  def smartTextMapVectorize(df: DataFrame, id: Column, m: Column,
                            maxCardinality: Long, topK: Int, dims: Int,
                            maxKeys: Int = DefaultMaxKeys): DataFrame = {
    val kept = discoverKeys(df, m, maxKeys)
    val stats = df.select(explode(m).as(Seq("k", "v")))
      .where(col("k").isin(kept: _*))
      .groupBy(col("k")).agg(
        countDistinct(col("v")).as("nd"),
        var_samp(length(col("v")).cast("double")).as("lv"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) 0.0 else r.getDouble(2))).sortBy(_._1)
    // ONE fitted pivot table for every key (per-key window rank, no
    // per-key jobs), consulted only for keys the stats route to pivot
    val pivotVals: Map[String, Seq[String]] =
      fitMapPivot(df, m, topK, minSupport = 1).collect()
        .groupBy(_.getString(0))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getInt(2)).map(_.getString(1)).toSeq
        }
    val src = df.select(id.as("id"), m.as("__m"))
    stats.foldLeft(src) { case (acc, (key, nd, lv)) =>
      val cell = element_at(col("__m"), key)
      if (nd <= maxCardinality) {
        val vals = pivotVals.getOrElse(key, Nil)
        val tops = vals.zipWithIndex.map { case (v, i) =>
          when(cell === lit(v), 1).otherwise(0).as(s"${key}_${i + 1}")
        }
        val pad = (vals.length + 1 to topK).map(i => lit(0).as(s"${key}_$i"))
        // guard the empty-vals case: isin() with zero args is undefined
        // behavior; with no fitted values every non-null cell is "other"
        val notTop = if (vals.isEmpty) lit(true) else !cell.isin(vals: _*)
        acc.select(col("*") +: (tops ++ pad ++ Seq(
          when(cell.isNotNull && notTop, 1).otherwise(0).as(s"${key}_other"),
          when(cell.isNull, 1).otherwise(0).as(s"${key}_null"))): _*)
      } else if (lv > 0) {
        // hash: dense tf vector over the key's tokenized value; docs
        // with no tokens get an explicit zero vector
        val tf = TextVectorizers.tfVector(
            TextVectorizers.hashedTf(df, id, element_at(m, key), dims), dims)
          .withColumnRenamed("tf", s"${key}_tf")
        val zeros = array_repeat(lit(0.0), dims)
        acc.join(tf, Seq("id"), "left")
          .withColumn(s"${key}_tf", coalesce(col(s"${key}_tf"), zeros))
      } else acc
    }.drop("__m")
  }

  /** RealMapVectorizer (reference OPMapVectorizer.scala RealMap branch):
    * discover keys at fit time, mean-impute each key's value and emit a
    * null indicator — columns `<key>_v`, `<key>_null`. Fit = one explode
    * + groupBy(key) (O(#keys) rows, map keys are schema-like); the means
    * fold into literals so the transform is a single codegen'd select. */
  def realMapVectorize(df: DataFrame, id: Column, m: Column,
                       maxKeys: Int = DefaultMaxKeys): DataFrame = {
    // discover keys from map_keys (matching binaryMapVectorize) so a key
    // whose values are ALL null still gets its columns — its mean is
    // undefined, so it fills 0.0 with the null indicator lit for every row
    val keys = discoverKeys(df, m, maxKeys)
    val means = df.select(explode(m).as(Seq("k", "v")))
      .where(col("v").isNotNull && col("k").isin(keys: _*))
      .groupBy(col("k")).agg(avg(col("v").cast("double")).as("mean"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val cols = keys.flatMap { key =>
      val cell = element_at(m, key)
      Seq(coalesce(cell.cast("double"), lit(means.getOrElse(key, 0.0))).as(s"${key}_v"),
        when(cell.isNull, 1).otherwise(0).as(s"${key}_null"))
    }
    df.select(id.as("id") +: cols.toSeq: _*)
  }

  /** BinaryMapVectorizer (reference OPMapVectorizer BinaryMap branch):
    * each discovered key becomes a 0/1 column (null → 0) plus a null
    * indicator, matching the reference's false-fill convention. */
  def binaryMapVectorize(df: DataFrame, id: Column, m: Column,
                         maxKeys: Int = DefaultMaxKeys): DataFrame = {
    val keys = discoverKeys(df, m, maxKeys)
    val cols = keys.flatMap { key =>
      val cell = element_at(m, key)
      Seq(coalesce(cell.cast("int"), lit(0)).as(s"${key}_b"),
        when(cell.isNull, 1).otherwise(0).as(s"${key}_null"))
    }
    df.select(id.as("id") +: cols.toSeq: _*)
  }

  /** GeolocationMapVectorizer (reference GeolocationMapVectorizer.scala):
    * map values are (lat, lon, accuracy) arrays; each discovered key is
    * filled with that key's geodesic midpoint (3-D cartesian mean) and
    * given a null indicator — the scalar geolocationVectorize treatment
    * per key. Fit = explode + per-key midpoint agg (O(#keys) rows). */
  def geoMapVectorize(df: DataFrame, id: Column, m: Column,
                      maxKeys: Int = DefaultMaxKeys): DataFrame = {
    val rad = math.Pi / 180.0
    val kept = discoverKeys(df, m, maxKeys)
    val ex = df.select(explode(m).as(Seq("k", "g")))
      .where(col("g").isNotNull && col("k").isin(kept: _*))
      .select(col("k"),
        col("g").getItem(0).as("lat"), col("g").getItem(1).as("lon"),
        coalesce(col("g").getItem(2), lit(0.0)).as("acc"))
    val mids = ex.groupBy(col("k")).agg(
        avg(cos(col("lat") * rad) * cos(col("lon") * rad)).as("x"),
        avg(cos(col("lat") * rad) * sin(col("lon") * rad)).as("y"),
        avg(sin(col("lat") * rad)).as("z"),
        avg(col("acc")).as("macc"))
      .collect().map { r =>
        val (x, y, z) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
        val lat = math.atan2(z, math.sqrt(x * x + y * y)) / rad
        val lon = math.atan2(y, x) / rad
        r.getString(0) -> ((lat, lon, r.getDouble(4)))
      }.sortBy(_._1)
    val cols = mids.flatMap { case (key, (mLat, mLon, mAcc)) =>
      val cell = element_at(m, key)
      Seq(coalesce(cell.getItem(0), lit(mLat)).as(s"${key}_lat"),
        coalesce(cell.getItem(1), lit(mLon)).as(s"${key}_lon"),
        coalesce(cell.getItem(2), lit(mAcc)).as(s"${key}_acc"),
        when(cell.isNull, 1).otherwise(0).as(s"${key}_geo_null"))
    }
    df.select(id.as("id") +: cols.toSeq: _*)
  }
}
