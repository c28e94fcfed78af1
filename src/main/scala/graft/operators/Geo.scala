package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial self-join within a radius, without a cross join (extends the
  * reference's Geolocation feature family — midpoint/vectorize live in
  * `Vectorizers` — with the pairwise operation a dedup/linkage pipeline
  * needs over point columns; cf. reference
  * features/src/main/scala/com/salesforce/op/features/types/Geolocation.scala).
  *
  * Scale design: each point lands in one square grid cell sized so the
  * search radius never spans more than the 3x3 neighborhood; the LEFT
  * side replicates into its 9 neighbor cells (a bounded 9x explode),
  * the RIGHT side keeps its home cell, and candidates come from a plain
  * equi-join on the cell key — shuffle-partitioned, broadcastable,
  * AQE-skew-splittable, never a theta join. Each qualifying pair is
  * produced exactly once (the right row's home cell is unique) so no
  * dedup pass is needed. Exact haversine verification runs inside the
  * join's codegen stage. At 100 TB the cell key bounds per-task work by
  * cell occupancy, not corpus size; pathological hot cells (everyone in
  * one city) are the documented caveat — salt the cell key or shrink
  * the cell size toward the radius to split them.
  */
object Geo {

  private val EarthRadiusKm = 6371.0
  private val KmPerDegLat = 111.32

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    // sin(x)*sin(x), not pow(sin(x),2): exact squaring keeps the value
    // reproducible across engines (libm pow is platform-1-ulp)
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLon = sin(radians(lon2 - lon1) / 2)
    val h = sLat * sLat +
      cos(radians(lat1)) * cos(radians(lat2)) * (sLon * sLon)
    lit(2 * EarthRadiusKm) * asin(sqrt(h))
  }

  /** All pairs (idA < idB) within `radiusKm`, with their distance.
    *
    * `maxAbsLat` bounds the longitude shrink factor: cells are sized by
    * the worst-case (highest-latitude) degree-per-km so the 3x3
    * neighborhood is guaranteed to cover the radius everywhere in the
    * data's latitude band.
    */
  /** Per-entity trajectory statistics over an ordered point stream:
    * total haversine path length, net displacement (first -> last
    * point), and straightness (= displacement / path). Each step
    * distance quantizes to DECIMAL(18,12) before the per-entity
    * DECIMAL fold (libm trig is 1-ulp engine-variant; the fold must
    * not be), and the endpoint coordinates travel through
    * min_by/max_by on a SINGLE scalar order key so no engine needs a
    * struct comparator. One window pass + one aggregation. */
  def trajectoryStats(df: DataFrame, key: Column, ord: Column,
                      lat: Column, lon: Column): DataFrame = {
    val base = df.select(key.as("k"), ord.cast("long").as("o"),
      lat.cast("double").as("lat"), lon.cast("double").as("lon"))
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
    val steps = base
      .withColumn("plat", lag(col("lat"), 1).over(w))
      .withColumn("plon", lag(col("lon"), 1).over(w))
      .withColumn("step", when(col("plat").isNotNull,
        haversineKm(col("plat"), col("plon"), col("lat"), col("lon"))
          .cast("decimal(18,12)")))
    val agg = steps.groupBy(col("k"))
      .agg(count(lit(1)).as("n_points"), sum(col("step")).as("path"),
        min_by(col("lat"), col("o")).as("lat0"),
        min_by(col("lon"), col("o")).as("lon0"),
        max_by(col("lat"), col("o")).as("lat1"),
        max_by(col("lon"), col("o")).as("lon1"))
      .where(col("n_points") >= 2)
    val disp = haversineKm(col("lat0"), col("lon0"), col("lat1"),
      col("lon1")).cast("decimal(18,12)").cast("double")
    agg.select(col("k").as("key"), col("n_points"),
      round(col("path").cast("double"), 6).as("path_km"),
      round(disp, 6).as("disp_km"),
      round(disp / col("path").cast("double"), 6).as("straightness"))
  }

  def radiusJoinPairs(points: DataFrame, id: Column, lat: Column, lon: Column,
      radiusKm: Double, maxAbsLat: Double = 60.0): DataFrame = {
    require(maxAbsLat < 89.0, s"degenerate longitude cells at |lat|=$maxAbsLat")
    val cellLatDeg = radiusKm / KmPerDegLat
    val cellLonDeg = radiusKm / (KmPerDegLat * math.cos(math.toRadians(maxAbsLat)))
    // longitude cells wrap modulo the globe so antimeridian-straddling
    // pairs still share a neighborhood. floor + uniform width 360/n:
    // ceil would leave a final SEAM cell narrower than cellLonDeg, and
    // a pair straddling it could sit 2 cell indices apart while still
    // inside the radius — silently outside the 3x3. Uniform cells are
    // >= cellLonDeg by construction, so coverage holds everywhere.
    val nLonCells = math.max(math.floor(360.0 / cellLonDeg).toLong, 1L)
    val lonCellDegUniform = 360.0 / nLonCells
    require(nLonCells >= 3,
      s"radius $radiusKm km spans >1/3 of the globe in longitude at |lat|=$maxAbsLat")
    // LOUD per-row guard (runs inside the scan stage, no extra job): a
    // point outside the declared latitude band gets longitude cells too
    // wide for the 3x3 neighborhood and would silently DROP qualifying
    // pairs — fail the query instead (same policy as Dedup's hot-block
    // guards).
    val checkedLat = when(abs(lat) > maxAbsLat,
      raise_error(concat(
        lit(s"radiusJoinPairs: |lat| > maxAbsLat=$maxAbsLat for point "),
        lat.cast("string")))).otherwise(lat)
    val base = points.select(id.as("id"), checkedLat.as("lat"), lon.as("lon"))
      .withColumn("cx", floor(col("lat") / cellLatDeg))
      .withColumn("cy",
        pmod(floor((col("lon") + lit(180.0)) / lonCellDegUniform), lit(nLonCells)))
    val offsets = Seq(-1L, 0L, 1L)
    val expanded = base.withColumn("dx", explode(array(offsets.map(lit): _*)))
      .withColumn("dy", explode(array(offsets.map(lit): _*)))
      .select(col("id").as("id_a"), col("lat").as("lat_a"), col("lon").as("lon_a"),
        (col("cx") + col("dx")).as("jx"),
        pmod(col("cy") + col("dy"), lit(nLonCells)).as("jy"))
    val home = base.select(col("id").as("id_b"), col("lat").as("lat_b"),
      col("lon").as("lon_b"), col("cx").as("jx"), col("cy").as("jy"))
    expanded.join(home, Seq("jx", "jy"))
      .where(col("id_a") < col("id_b"))
      .withColumn("dist_km",
        haversineKm(col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b")))
      .where(col("dist_km") <= radiusKm)
      .select(col("id_a"), col("id_b"), col("dist_km"))
  }

  /** k nearest neighbors within `radiusKm` for every point, from the
    * same grid-blocked candidate join — but the per-point top-k runs
    * through the bounded [[graft.aggregators.TopK]] aggregator
    * (ascending by distance, id tiebreak), so a dense cell forwards at
    * most ~2k candidates per mapper instead of ranking every candidate
    * row under a window. Emits (id, neighbor, dist_km, rank); points
    * with no neighbor inside the radius emit nothing. Directional: both
    * (a,b) and (b,a) are scored. */
  /** Getis-Ord Gi* hotspot z-scores over a square grid: per-cell point
    * counts, each cell's 3x3-neighborhood sum S_i (self included), and
    * the standardized z against the global cell-count distribution —
    * the spatial "where is activity anomalously concentrated" audit.
    *
    * Scale: the neighborhood sum is a bounded 9x EXPLODE of the cell
    * table into its neighbor keys + one hash agg (radiusJoinPairs'
    * replication trick, no spatial join); the global mean/std is a
    * 1-row sufficient-stat frame crossed back. Everything after the
    * first per-cell count is cell-domain-sized, not point-sized.
    * Emits (cy, cx, c, s_i, k_i, gi_z) for occupied cells; k_i counts
    * the OCCUPIED cells in the neighborhood (empty cells contribute 0
    * to S_i either way). */
  def hotspotGiStar(points: DataFrame, lat: Column, lon: Column,
                    cellDeg: Double): DataFrame = {
    require(cellDeg > 0, s"cellDeg must be > 0: $cellDeg")
    val cells = points
      .select(floor(lat / cellDeg).cast("long").as("cy"),
        floor(lon / cellDeg).cast("long").as("cx"))
      .groupBy(col("cy"), col("cx")).agg(count(lit(1)).as("c"))
      .persist()
    val g = cells.agg(count(lit(1)).as("nn"), sum(col("c")).as("sc"),
      sum(col("c") * col("c")).as("scc"))
    val offsets = for { dy <- -1L to 1L; dx <- -1L to 1L } yield (dy, dx)
    val contrib = cells
      .select(col("cy"), col("cx"), col("c"),
        explode(typedLit(offsets)).as("o"))
      .groupBy((col("cy") + col("o._1")).as("ty"),
        (col("cx") + col("o._2")).as("tx"))
      .agg(sum(col("c")).as("s_i"), count(lit(1)).as("k_i"))
    val xbar = col("sc").cast("double") / col("nn").cast("double")
    val sd = sqrt(col("scc").cast("double") / col("nn").cast("double") -
      xbar * xbar)
    val ki = col("k_i").cast("double")
    cells.join(contrib, col("cy") === col("ty") && col("cx") === col("tx"))
      .crossJoin(broadcast(g))
      .select(col("cy"), col("cx"), col("c"), col("s_i"), col("k_i"),
        round((col("s_i").cast("double") - xbar * ki) /
          (sd * sqrt((col("nn").cast("double") * ki - ki * ki) /
            (col("nn").cast("double") - lit(1.0)))), 6).as("gi_z"))
  }

  /** Grid-DBSCAN: density clustering that IS hash-gateable (k-means'
    * iterative float centroids are not). A cell of side `cellDeg` is
    * CORE when it holds >= `minPts` points; adjacent (8-neighborhood)
    * core cells merge into one cluster labeled by the min cell id;
    * non-core cells are noise (null cluster). This is DBSCAN on the
    * grid quantization: deterministic, two data-sized passes (cell
    * count, then everything is cell-domain-sized), and the merge is
    * [[graft.operators.Dedup.connectedComponents]] over the bounded
    * core-cell adjacency — the exact shape at 100 TB, where the cell
    * table is millions of rows against billions of points. Emits
    * (cy, cx, n_points, cluster). */
  def gridDbscan(points: DataFrame, lat: Column, lon: Column,
                 cellDeg: Double, minPts: Long): DataFrame = {
    require(cellDeg > 0 && minPts >= 1, s"bad params: $cellDeg, $minPts")
    val cells = points
      .select(floor(lat / cellDeg).cast("long").as("cy"),
        floor(lon / cellDeg).cast("long").as("cx"))
      .groupBy(col("cy"), col("cx")).agg(count(lit(1)).as("n_points"))
      .withColumn("cell", col("cy") * 100000L + col("cx"))
      .persist()
    val core = cells.where(col("n_points") >= minPts)
      .select(col("cell"), col("cy"), col("cx"))
    val offsets =
      for { dy <- -1L to 1L; dx <- -1L to 1L if dy != 0 || dx != 0 }
        yield (dy, dx)
    val nbr = core
      .select(col("cell").as("id_a"), col("cy"), col("cx"),
        explode(typedLit(offsets)).as("o"))
      .select(col("id_a"), (col("cy") + col("o._1")).as("ny"),
        (col("cx") + col("o._2")).as("nx"))
      .join(core.select(col("cell").as("id_b"), col("cy").as("ny"),
        col("cx").as("nx")), Seq("ny", "nx"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    // Size-dispatched CC, not min-label propagation: a core-cell GRID
    // graph's diameter grows with the map extent (10x10 at sf0.1
    // already needs ~18 propagation rounds — pure iteration cadence,
    // r10's entire q305 cost). Under the 10k-edge bound a driver
    // union-find resolves it in one collect; above it the O(log n)
    // star contraction runs. Labels identical (component = min cell
    // id) either way, so the oracle replay is unchanged.
    val comp = Dedup.connectedComponentsAuto(nbr)
    val out = cells
      .join(comp.select(col("doc_id").as("cell"), col("component")),
        Seq("cell"), "left")
      .select(col("cy"), col("cx"), col("n_points"),
        when(col("n_points") >= minPts,
          coalesce(col("component"), col("cell"))).as("cluster"))
    val chk = out.localCheckpoint(true)
    cells.unpersist(blocking = false)
    chk
  }

  def nearestNeighbors(points: DataFrame, id: Column, lat: Column, lon: Column,
                       k: Int, radiusKm: Double,
                       maxAbsLat: Double = 60.0): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val pairs = radiusJoinPairs(points, id, lat, lon, radiusKm, maxAbsLat)
    val directed = pairs.select(col("id_a").as("p"), col("id_b").as("nb"),
        col("dist_km"))
      .unionByName(pairs.select(col("id_b").as("p"), col("id_a").as("nb"),
        col("dist_km")))
    graft.aggregators.TopK.topKPerKey(
        directed.select(col("p"), col("nb").cast("long").as("nb"),
          col("dist_km").as("score")),
        "p", "nb", "score", k, descending = false)
      .select(col("p").as("id"), col("nb").as("neighbor"),
        col("score").as("dist_km"), col("rank"))
  }
}
