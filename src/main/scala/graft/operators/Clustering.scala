package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-facing clustering over embedding columns.
  *
  * Delegates to spark.ml KMeans (k-means|| init): each Lloyd iteration
  * broadcasts the k×d centroid matrix and reduces per-partition partial
  * (sum, count) pairs — cost O(rows·k·d) map-side with a k×d-bounded
  * combine, the same contract as the IVF coarse quantizer in
  * [[Similarity]]. Cluster IDs are init-order artifacts, not data
  * semantics, so assignments are canonicalized (relabelled by each
  * cluster's smallest member id) to be stable across equivalent runs;
  * the gate is rows-only plus a blob-recovery spec.
  */
object Clustering {

  /** Normalized (u &lt; v) candidate pairs within `radius` via the same
    * 3×3 grid blocking as [[dbscan]] — density-bounded, never
    * all-pairs. Emits (u, v, d2) with d2 the exact squared euclidean
    * distance. */
  def radiusPairs(df: DataFrame, id: Column, x: Column, y: Column,
                  radius: Double): DataFrame = {
    require(radius > 0, s"radius must be positive: $radius")
    val pts = df.select(id.as("pid"), x.cast("double").as("px"),
        y.cast("double").as("py"))
      .withColumn("gx", floor(col("px") / radius).cast("long"))
      .withColumn("gy", floor(col("py") / radius).cast("long"))
    val spark = df.sparkSession
    val offs = spark.range(-1, 2).select(col("id").as("ox"))
      .crossJoin(spark.range(-1, 2).select(col("id").as("oy")))
    val probes = pts.crossJoin(broadcast(offs))
      .select(col("pid").as("qid"), col("px").as("qx"),
        col("py").as("qy"), (col("gx") + col("ox")).as("gx"),
        (col("gy") + col("oy")).as("gy"))
    val d2 = (col("px") - col("qx")) * (col("px") - col("qx")) +
      (col("py") - col("qy")) * (col("py") - col("qy"))
    probes.join(pts, Seq("gx", "gy"))
      .where(col("qid") < col("pid"))
      .where(d2 <= lit(radius * radius))
      .select(col("qid").as("u"), col("pid").as("v"), d2.as("d2"))
  }

  /** DBSCAN over 2-D points via grid-cell blocking: cell size = eps,
    * each point probes its 3×3 cell neighborhood, so candidate pairs
    * are density-bounded — never the all-pairs product (the reason a
    * naive DBSCAN dies at scale). Cores by |N_eps| ≥ minPts (self
    * included); clusters = connected components of the core-core
    * eps-graph labeled by min core id ([[Dedup.connectedComponents]]'
    * label propagation — O(diameter) rounds of co-partitioned joins
    * with per-round lineage cuts); border points adopt the minimum
    * cluster among their core neighbors; the rest is noise. Every tie
    * resolves to a minimum and every distance test is an exact-double
    * comparison, so a brute-force SQL replay reproduces the labeling
    * bit-for-bit. Emits (id, cluster, role) with cluster = -1 for
    * noise. */
  def dbscan(df: DataFrame, id: Column, x: Column, y: Column,
             eps: Double, minPts: Int): DataFrame = {
    require(eps > 0 && minPts >= 1, s"bad DBSCAN params: $eps $minPts")
    val lv = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pts = df.select(id.as("pid"), x.cast("double").as("px"),
        y.cast("double").as("py"))
      .withColumn("gx", floor(col("px") / eps).cast("long"))
      .withColumn("gy", floor(col("py") / eps).cast("long"))
      .persist(lv)
    val spark = df.sparkSession
    val offs = spark.range(-1, 2).select(col("id").as("ox"))
      .crossJoin(spark.range(-1, 2).select(col("id").as("oy")))
    val probes = pts.crossJoin(broadcast(offs))
      .select(col("pid").as("qid"), col("px").as("qx"),
        col("py").as("qy"), (col("gx") + col("ox")).as("gx"),
        (col("gy") + col("oy")).as("gy"))
    val nbr = probes.join(pts, Seq("gx", "gy"))
      .where(col("pid") =!= col("qid"))
      .where((col("px") - col("qx")) * (col("px") - col("qx")) +
        (col("py") - col("qy")) * (col("py") - col("qy")) <=
        lit(eps * eps))
      .select(col("qid"), col("pid"))
      .persist(lv)
    val cores = nbr.groupBy(col("qid")).agg(count(lit(1)).as("deg"))
      .where(col("deg") + 1 >= minPts)
      .select(col("qid").as("core_id"))
      .persist(lv)
    val coreEdges = nbr
      .join(cores.select(col("core_id").as("qid")), Seq("qid"))
      .join(cores.select(col("core_id").as("pid")), Seq("pid"))
      .where(col("qid") < col("pid"))
      .select(col("qid").as("id_a"), col("pid").as("id_b"))
    // size-dispatched CC (labels identical to min-label propagation:
    // component = min core id): eps-graphs of dense clusters are
    // high-diameter chains, where min-label walks O(diameter) rounds
    // of 2 jobs each; the auto dispatch collapses a bounded core graph
    // into one driver union-find and keeps the O(log n) star
    // contraction for big ones
    val comp = Dedup.connectedComponentsAuto(coreEdges)
    val coreLabel = cores
      .join(comp.select(col("doc_id").as("core_id"), col("component")),
        Seq("core_id"), "left")
      .select(col("core_id"),
        coalesce(col("component"), col("core_id")).as("cluster"))
      .persist(lv)
    val borders = nbr
      .join(cores.select(col("core_id").as("qid")), Seq("qid"), "left_anti")
      .join(coreLabel.select(col("core_id").as("pid"), col("cluster")),
        Seq("pid"))
      .groupBy(col("qid")).agg(min(col("cluster")).as("cluster"))
    val assigned = coreLabel
      .select(col("core_id").as("pid"), col("cluster"),
        lit("core").as("role"))
      .unionByName(borders.select(col("qid").as("pid"), col("cluster"),
        lit("border").as("role")))
    pts.select(col("pid")).join(assigned, Seq("pid"), "left")
      .select(col("pid").as("id"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"),
        coalesce(col("role"), lit("noise")).as("role"))
  }

  /** (id, cluster, dist) rows: canonicalized cluster label (smallest
    * member id in the cluster) and Euclidean distance to the fitted
    * centroid, rounded to `scale`. */
  def kmeansAssign(df: DataFrame, id: Column, vec: Column, k: Int,
                   maxIter: Int = 20, seed: Long = 7L,
                   scale: Int = 6): DataFrame = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    require(k >= 2, s"k must be >= 2: $k")
    val assembled = df.select(id.as("id"),
      array_to_vector(vec.cast("array<double>")).as("features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("__cluster")
      .fit(assembled)
    val centers = model.clusterCenters.map(_.toArray)
    val centerLit = array(centers.map(c => array(c.map(lit): _*)): _*)
    val assigned = model.transform(assembled)
      .select(col("id"), col("__cluster"),
        vector_to_array(col("features")).as("arr"))
      .withColumn("dist",
        round(sqrt(aggregate(
          zip_with(col("arr"), element_at(centerLit, col("__cluster") + 1),
            (x, c) => (x - c) * (x - c)),
          lit(0.0), (acc, v) => acc + v)), scale))
    // canonical labels: each cluster takes its smallest member id
    val relabel = assigned.groupBy(col("__cluster"))
      .agg(min(col("id")).as("cluster"))
    assigned.join(broadcast(relabel), "__cluster")
      .select(col("id"), col("cluster"), col("dist"))
  }

  /** Gonzalez farthest-point k-center selection (the classic 2-approx
    * coreset / diverse-subset picker a training-data pipeline uses to
    * seed clustering or pick a representative sample): start from the
    * smallest id, then k−1 rounds of "argmax over the corpus of the
    * min integer distance to the chosen set" (1e6-quantized squared
    * Euclidean, ties to the smaller id — the argmax compares the total
    * (d, −id) struct, so it is deterministic cross-engine and the
    * oracle unrolls every round).
    *
    * Scale: k full-corpus aggregations (the Gonzalez lower bound) with
    * centers riding as plan literals — each round is one narrow
    * codegen map + one max_by agg, no shuffle beyond the agg, and the
    * projected corpus is persisted across rounds. Emits
    * (round, center_id, dmin_q): each pick's distance to the
    * previously chosen set (round 1 → 0).
    *
    * CONTRACT — may return FEWER than k rows: when max dmin hits 0
    * before round k (the corpus has < k distinct quantized points),
    * selection stops instead of emitting duplicate centers, so the
    * result has one row per DISTINCT center, `min(k, #distinct)` rows
    * total. Callers (q550 and its oracle, which replays the same loop
    * with the same stop rule) must tolerate a short result; a caller
    * that requires exactly k rows must check the corpus has ≥ k
    * distinct points first. Degenerate case spec-gated in
    * ClusteringSpec. */
  def kCenterGreedy(df: DataFrame, id: Column, vec: Column,
                    k: Int): DataFrame = {
    require(k >= 2 && k <= 64, s"k must be in [2,64]: $k")
    val spark = df.sparkSession
    val e = df.select(id.as("id"),
      transform(vec.cast("array<double>"),
        x => round(x * 1e6).cast("long")).as("xq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def sqDist(c: Array[Long]): Column = {
      val cl = array(c.map(lit): _*)
      aggregate(zip_with(col("xq"), cl, (x, s) => (x - s) * (x - s)),
        lit(0L), (acc, v) => acc + v)
    }
    val firstRows = e.orderBy(col("id")).limit(1).collect()
    if (firstRows.isEmpty) {
      e.unpersist(blocking = false)
      throw new IllegalArgumentException("kCenterGreedy: empty input")
    }
    val first = firstRows(0)
    val chosen = scala.collection.mutable.Buffer(
      (first.getLong(0), first.getSeq[Long](1).toArray, 0L))
    var saturated = false
    for (_ <- 2 to k if !saturated) {
      val ds = chosen.toSeq.map(c => sqDist(c._2))
      val dmin = if (ds.size == 1) ds.head else least(ds: _*)
      val pick = e.select(col("id"), col("xq"), dmin.as("dm"))
        .agg(max_by(struct(col("id"), col("xq"), col("dm")),
          struct(col("dm"), (-col("id")).as("nid"))).as("p"))
        .select(col("p.id"), col("p.xq"), col("p.dm"))
        .collect()(0)
      // max dmin == 0 ⇒ every remaining point coincides with a chosen
      // center (corpus has < k distinct points); picking would emit a
      // duplicate center every remaining round. Stop early instead.
      if (pick.getLong(2) == 0L) saturated = true
      else chosen += ((pick.getLong(0), pick.getSeq[Long](1).toArray,
        pick.getLong(2)))
    }
    e.unpersist(blocking = false)
    import spark.implicits._
    chosen.zipWithIndex
      .map { case ((cid, _, d), i) => (i + 1, cid, d) }.toSeq
      .toDF("round", "center_id", "dmin_q")
  }

  /** ONE exact Lloyd round — the hash-gated companion to
    * [[kmeansAssign]], whose spark.ml fit carries float-sum order
    * jitter and is rows-only by necessity. Seeds are the embeddings of
    * the k smallest ids (oracle-replayable); assignment is the argmin
    * of INTEGER squared Euclidean distance over 1e6-quantized
    * coordinates (ties to the smaller cell id); the refined centroid
    * coordinate is the exact per-(cell,dim) mean re-quantized with one
    * HALF_UP round; the re-assignment repeats the same integer argmin
    * against the refined centroids. Every step replays bit-identically
    * in SQL.
    *
    * Scale: centroids ride as collected k×d fit scalars (the IVF
    * pattern — k, d require-bounded), each assignment is one narrow
    * codegen map (k·d integer ops per row, no shuffle), and the
    * centroid update is one (cell,dim)-keyed partial+final agg — never
    * a per-cell vector list in one buffer. Emits
    * (id, cell0, cell1, dist1_q): seed-round cell, refined cell, and
    * the integer squared distance to the refined centroid. */
  def kmeansLloydExact(df: DataFrame, id: Column, vec: Column,
                       k: Int): DataFrame = {
    require(k >= 2 && k <= 64, s"k must be in [2,64]: $k")
    def halfUp(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val e = df.select(id.as("id"),
      transform(vec.cast("array<double>"),
        x => round(x * 1e6).cast("long")).as("xq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seeds: Array[Array[Long]] = e.orderBy(col("id")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    val dims = seeds.head.length
    // 64 matches the q530 oracle's fixed dim grid (range(1,65)); a
    // wider embedding would silently NULL-pad the oracle's refined
    // centroids past dim 64 and diverge from this plan.
    require(dims <= 64, s"dims must be <= 64: $dims")
    def sqDist(cents: Array[Array[Long]]): Array[Column] =
      cents.map { c =>
        val cl = array(c.map(lit): _*)
        aggregate(zip_with(col("xq"), cl, (x, s) => (x - s) * (x - s)),
          lit(0L), (acc, v) => acc + v)
      }
    // argmin with ties to the smaller cell: ordered when-chain on the
    // least() of the k distance columns
    def argmin(ds: Array[Column]): (Column, Column) = {
      val m = least(ds: _*)
      val cell = ds.zipWithIndex.tail.foldLeft(when(ds(0) === m, 0)) {
        case (acc, (dc, i)) => acc.when(dc === m, i)
      }
      (cell, m)
    }
    val (cell0, _) = argmin(sqDist(seeds))
    // cache the assigned frame: it feeds the mean collect AND the
    // returned re-assignment scan (the k·d argmin is not free twice)
    val a0 = e.select(col("id"), col("xq"), cell0.as("cell0"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact per-(cell,dim) mean, re-quantized HALF_UP — k×d fit scalar
    val meanRows = a0
      .select(col("cell0"), posexplode(col("xq")).as(Seq("dim", "x")))
      .groupBy(col("cell0"), col("dim"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .collect()
    e.unpersist(blocking = false)
    val refined: Array[Array[Long]] = seeds.map(_.clone())
    meanRows.foreach { r =>
      refined(r.getAs[Number](0).intValue)(r.getAs[Number](1).intValue) =
        halfUp(r.getLong(2).toDouble / r.getLong(3).toDouble)
    }
    val d1 = sqDist(refined)
    val (cell1, m1) = argmin(d1)
    // Materialize the narrow 4-column result so a0's cache can be
    // released before returning (same pattern as Graph.edgeSupport:
    // localCheckpoint(true) makes the frame self-contained).
    val out = a0.select(col("id"), col("cell0"), cell1.as("cell1"),
      m1.as("dist1_q")).localCheckpoint(true)
    a0.unpersist(blocking = false)
    out
  }
}
