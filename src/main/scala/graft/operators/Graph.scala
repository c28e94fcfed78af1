package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph scoring over an edge frame — PageRank with a fixed
  * iteration count (the deterministic form: no convergence race, so the
  * result is exactly replayable by an unrolled-CTE oracle).
  *
  * Scale: each iteration is ONE join (ranks to out-edges, both sides
  * hash-partitioned on the source key) plus ONE groupBy on the
  * destination — the canonical distributed PageRank shuffle pattern.
  * The degree-annotated edge set is computed once and persisted across
  * iterations; per-round rank frames are lazily localCheckpoint-ed
  * (lineage CUT, not just cached — stacked self-joins double the
  * Catalyst tree per round otherwise, the trap documented on
  * [[Dedup.connectedComponents]]) and superseded rounds' blocks are
  * freed deterministically.
  */
object Graph {

  private def checkpointedRdd(df: DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** PageRank: pr'(v) = (1-d)/N + d · Σ_{u→v} pr(u)/outdeg(u), run for
    * exactly `iters` rounds from the uniform start. Conventions (both
    * replayed by the oracle): N = |distinct src ∪ dst|; parallel edges
    * collapse (distinct); dangling nodes (no out-edges) keep receiving
    * rank but their mass is NOT redistributed — at web-graph scale add
    * the dangling-sum broadcast term; the hook is the 1-row aggregate
    * this plan already shapes for totals elsewhere.
    *
    * Unlike label-propagation CC, a round references the previous ranks
    * ONCE, so the composed plan grows linearly — rounds are left LAZY
    * and fuse into a single job. The lineage cut (localCheckpoint +
    * materialize + free superseded blocks) runs only every
    * `checkpointEvery` rounds, the cadence deep iteration needs to keep
    * Catalyst analysis and failure-recovery cost O(1) per round. The
    * result is always checkpointed: self-contained, so the internal
    * caches can be released before returning. */
  def pageRank(edges: DataFrame, src: Column, dst: Column,
               iters: Int = 3, damping: Double = 0.85,
               checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1")
    // persist the deduped edge set FIRST: withDeg reads it twice and
    // nodes twice more — without the cache the upstream edge build
    // (often a join + distinct) recomputes up to 4x before the first
    // iteration starts (measured 9.7 s -> 4.9 s on the sf0.1 trade graph)
    val e = edges.select(src.as("src"), dst.as("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // hash-partition the cached edge frame on the per-round join key:
    // each iteration joins ranks to out-edges on src, and without the
    // explicit repartition the 2|E|-row side re-exchanges every round
    // (the rank side is |V| rows — the small side by far). Same cached
    // co-partitioning labelPropagation uses for its edges-to-labels join.
    val withDeg = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // N rides as a 1-row broadcast frame instead of a collected scalar
    // (the triangleCount pattern): the two setup actions the scalar
    // forced (nodes.count, withDeg.count) disappear — the final cp
    // action materializes e, withDeg and nodes once through the block-
    // locked caches (shallow nesting: two cache levels, linear DAG).
    // Values unchanged: lit(1.0)/N and lit(1-d)/N are the same IEEE
    // double divisions the driver-side literals computed.
    val nF = nodes.agg(count(lit(1)).as("__n"))
    var pr = nodes.crossJoin(broadcast(nF))
      .select(col("node"), (lit(1.0) / col("__n")).as("pr"))
    var liveCp: Option[org.apache.spark.rdd.RDD[_]] = None
    for (i <- 1 to iters) {
      val contrib = withDeg.join(pr, col("src") === col("node"))
        .select(col("dst").as("node"), (col("pr") / col("outdeg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      var next = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nF))
        .select(col("node"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("pr"))
      if (i % checkpointEvery == 0 || i == iters) {
        next = next.localCheckpoint(false)
        next.count() // materialize while the previous cut's blocks live
        liveCp.foreach(_.unpersist(blocking = false))
        liveCp = checkpointedRdd(next)
      }
      pr = next
    }
    e.unpersist(blocking = false)
    withDeg.unpersist()
    nodes.unpersist()
    pr
  }

  /** Synchronous label propagation (community detection), run for
    * exactly `iters` rounds so the differential oracle replays it:
    * every node starts labeled with itself; each round every node
    * adopts the most frequent label among its NEIGHBORS (both
    * directions), ties to the smallest label; isolated rounds keep the
    * current label. Deterministic by construction — the async/randomized
    * variants converge faster but are irreproducible, the wrong trade
    * for an auditable pipeline. Per round: one join (edges × labels) +
    * one two-level groupBy — the same join-per-round shape as
    * [[pageRank]], lineage cut on the same cadence. A fixed small
    * `iters` is the documented operating point (communities of
    * near-dup/interaction graphs are shallow); convergence detection
    * would add a digest action per round like Dedup's CC loop. */
  def labelPropagation(edges: DataFrame, src: Column, dst: Column,
                       iters: Int = 2,
                       checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // one distinct over the symmetrized set (the final distinct already
    // collapses duplicates — a pre-distinct on the raw edges would just
    // add a second full shuffle), then hash-partition on the join key v
    // so each round's edges-to-labels join reuses the cached layout
    // instead of re-exchanging 2|E| rows per iteration
    val e0 = edges.select(src.as("u"), dst.as("v")).where(col("u") =!= col("v"))
    val e = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .repartition(col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("u").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the setup count STAYS (r12 measured removing it at +36%, 3.76 →
    // 5.10 s same-session probe: the final action then materializes the
    // caches concurrently from multiple plan branches and the
    // block-lock convoy costs more than the bounded action saves;
    // pageRank/PPR tolerate the lazy form — their round plans reference
    // each cache once)
    nodes.count() // materialize both caches
    var labels = nodes.withColumn("label", col("node"))
    var liveCp: Option[org.apache.spark.rdd.RDD[_]] = None
    for (i <- 1 to iters) {
      val votes = e.join(labels, col("v") === col("node"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("cnt"))
      // most frequent neighbor label, ties to the smallest label:
      // min over the (-cnt, label) lexicographic order
      val winner = votes.groupBy(col("u").as("node"))
        .agg(min_by(col("label"), struct((-col("cnt")).as("nc"), col("label")))
          .as("vote"))
      var next = labels.join(winner, Seq("node"), "left")
        .select(col("node"), coalesce(col("vote"), col("label")).as("label"))
      if (i % checkpointEvery == 0 || i == iters) {
        next = next.localCheckpoint(false)
        next.count()
        liveCp.foreach(_.unpersist(blocking = false))
        liveCp = checkpointedRdd(next)
      }
      labels = next
    }
    e.unpersist()
    nodes.unpersist()
    labels
  }

  /** Exact triangle count via degree-ordered orientation (the
    * MapReduce-classic: Suri & Vassilvitskii's "last reducer" fix).
    * Each undirected edge is oriented from its lower-(degree, id)
    * endpoint to the higher one; every triangle then has exactly ONE
    * node with both out-edges inside it, so counting
    * wedge-(u→v, u→w) closures against the oriented edge (v→w) counts
    * each triangle once.
    *
    * Scale: orientation bounds out-degree by O(sqrt(m)) regardless of
    * hubs — a celebrity node of degree 10^6 contributes wedges only at
    * its (few, high-degree) out-neighbors, so no reducer sees the
    * quadratic fan of a raw hub. Both the wedge build and the closure
    * check are hash equi-joins on node keys; nothing is quadratic in a
    * skewed degree. Emits one row (n_nodes, n_edges, n_triangles). */
  def triangleCount(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    val und = edges.select(
        least(src, dst).as("a"), greatest(src, dst).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // orient by (deg, node): rank keys ride along so wedge ordering
    // needs no further join
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("degb")), "b")
      .select(
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
          struct(col("a").as("u"), col("b").as("v"),
            struct(col("degb").as("d"), col("b").as("n")).as("rkv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"),
            struct(col("dega").as("d"), col("a").as("n")).as("rkv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.rkv").as("rkv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // node/edge totals ride as 1-row broadcast frames instead of
    // driver collects: the old shape paid two extra materializing
    // actions (deg.count, oriented.count) before the wedge join could
    // even start — with persisted inputs the single final action
    // computes everything once, and block-level cache locking keeps the
    // shared frames single-computed across plan branches
    val nNodesF = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdgesF = oriented.agg(count(lit(1)).as("n_edges"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.rkv") < col("e2.rkv"))
      .select(col("e1.v").as("u"), col("e2.v").as("v"))
    val triangles = wedges.join(oriented.select(col("u"), col("v")), Seq("u", "v"))
      .agg(count(lit(1)).as("n_triangles"))
      .crossJoin(broadcast(nNodesF)).crossJoin(broadcast(nEdgesF))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
      .localCheckpoint(true) // self-contained: caches can go
    und.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    oriented.unpersist(blocking = false)
    triangles
  }

  /** Per-edge triangle support over a normalized (a&lt;b) undirected
    * edge set, via the same degree-ordered orientation as
    * [[triangleCount]] (hub-safe: out-degree bounded O(√m)); each
    * enumerated triangle credits its three unordered edges. Edges in
    * no triangle get support 0. */
  private def edgeSupport(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("degb")), "b")
      .select(
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
          struct(col("a").as("u"), col("b").as("v"),
            struct(col("degb").as("d"), col("b").as("n")).as("rkv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"),
            struct(col("dega").as("d"), col("a").as("n")).as("rkv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.rkv").as("rkv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.rkv") < col("e2.rkv"))
      .select(col("e1.u").as("w0"), col("e1.v").as("w1"),
        col("e2.v").as("w2"))
    // closure edge is oriented (w1 -> w2): within the wedge rkv(w1) <
    // rkv(w2), and orientation always points up the (deg, id) rank
    val tri = wedges.join(
      oriented.select(col("u").as("w1"), col("v").as("w2")), Seq("w1", "w2"))
    val cnt = tri.select(explode(array(
        struct(least(col("w0"), col("w1")).as("a"),
          greatest(col("w0"), col("w1")).as("b")),
        struct(least(col("w0"), col("w2")).as("a"),
          greatest(col("w0"), col("w2")).as("b")),
        struct(least(col("w1"), col("w2")).as("a"),
          greatest(col("w1"), col("w2")).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("supp"))
    val out = und.join(cnt, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("supp"), lit(0L)).as("supp"))
      .localCheckpoint(true) // materialize before dropping the cache
    oriented.unpersist(blocking = false)
    out
  }

  /** Deterministic DeepWalk-style random walks: from every node, `len`
    * md5-seeded uniform neighbor steps over the (directed) adjacency.
    * Step s from node v on a walk started at `start` picks neighbor
    * rank pmod(hash60("walk:start:s:v"), outdeg(v)) + 1 — seeded by
    * the (start, step, current) triple so walks diverge like real
    * draws, yet replay bit-identically in SQL (the corpus-prep step
    * for skip-gram graph embeddings; the walk table IS the training
    * corpus). Dead-end nodes terminate their walk (null steps).
    *
    * Scale: adjacency ranks are one src-partitioned window; each step
    * is one equi-join on the node key — len joins total, no iteration
    * state on the driver. */
  def randomWalks(edges: DataFrame, src: Column, dst: Column,
                  len: Int): DataFrame = {
    require(len >= 1 && len <= 8, s"len must be in [1,8]: $len")
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(src.as("s"), dst.as("d")).distinct()
    val adj = e
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("s")).orderBy(col("d"))))
      .withColumn("odeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("s"))))
    // every node starts a walk — pure sinks included (their first hop
    // finds no adjacency row and null-terminates, per the contract)
    val nodes = e.select(col("s").as("start"))
      .union(e.select(col("d").as("start"))).distinct()
    var walk = nodes.withColumn("cur", col("start"))
    val hash60 = graft.functions.TextAnalysis.hash60(_: Column)
    for (step <- 1 to len) {
      val pick = adj.select(col("s").as("pc"), col("d").as("nxt"),
        col("rn"), col("odeg"))
      walk = walk.join(pick,
          col("cur") === col("pc") &&
            col("rn") === pmod(hash60(concat_ws(":", lit("walk"),
              col("start"), lit(step), col("cur"))), col("odeg")) + 1,
          "left")
        .select(col("start") +:
          (1 until step).map(i => col(s"n$i")) :+
          col("nxt").as(s"n$step"): _*)
        .withColumn("cur", col(s"n$step"))
    }
    walk.drop("cur")
  }

  /** k-truss peeling for a FIXED number of rounds: each round drops
    * every edge with triangle support &lt; k−2, then support is
    * recomputed on the survivors. Fixed rounds keep the computation
    * oracle-replayable (each round is one triangle enumeration +
    * count, unrolled in SQL) and bound the job count; real graphs
    * converge in a few peels because support only decreases. Emits the
    * surviving (a, b, supp) edges with the last round's support.
    *
    * Scale: each round is the [[triangleCount]] machinery (orientation
    * joins + wedge closure, all hash equi-joins, O(√m)-bounded
    * out-degree) plus one edge-keyed count; rounds are lineage-cut via
    * localCheckpoint so depth stays constant. */
  def trussPeel(edges: DataFrame, src: Column, dst: Column,
                k: Int, rounds: Int = 2): DataFrame = {
    require(k >= 3 && rounds >= 1 && rounds <= 4,
      s"bad truss params: k=$k rounds=$rounds")
    var e = edges.select(least(src, dst).as("a"), greatest(src, dst).as("b"))
      .where(col("a") =!= col("b")).distinct()
    var support: DataFrame = null
    for (_ <- 1 to rounds) {
      support = edgeSupport(e) // localCheckpointed: constant lineage depth
      e = support.where(col("supp") >= k - 2).select(col("a"), col("b"))
    }
    support.where(col("supp") >= k - 2)
  }

  /** Personalized PageRank: identical recurrence to [[pageRank]] but
    * the teleport mass returns to a SEED distribution instead of the
    * uniform vector — pr'(v) = (1-d)*s(v) + d * sum pr(u)/outdeg(u),
    * s uniform over the seed set. The recommendation/affinity variant:
    * ranks every node by proximity to the seeds. Same plan shape as
    * pageRank (one join + one groupBy per round, bounded lineage); the
    * seed vector rides as a column on the persisted node frame, so no
    * extra join per iteration. */
  def personalizedPageRank(edges: DataFrame, src: Column, dst: Column,
                           seeds: DataFrame, iters: Int = 2,
                           damping: Double = 0.85,
                           checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(src.as("src"), dst.as("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val withDeg = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .repartition(col("src")) // co-partition for the per-round join
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seedSet = seeds.select(seeds.columns.head).distinct()
      .select(col(seeds.columns.head).as("node"), lit(1).as("__seed"))
    val nSeeds = seedSet.count()
    require(nSeeds > 0, "personalizedPageRank needs a non-empty seed set")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(broadcast(seedSet), Seq("node"), "left")
      .select(col("node"),
        when(col("__seed").isNotNull, lit(1.0 / nSeeds)).otherwise(lit(0.0))
          .as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // no setup counts (see pageRank): the final cp action materializes
    // e, withDeg and nodes once through the block-locked caches
    var pr = nodes.withColumn("pr", col("s"))
    var liveCp: Option[org.apache.spark.rdd.RDD[_]] = None
    for (i <- 1 to iters) {
      val contrib = withDeg.join(pr, col("src") === col("node"))
        .select(col("dst").as("node"), (col("pr") / col("outdeg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      var next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), col("s"),
          (lit(1.0 - damping) * col("s") +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("pr"))
      if (i % checkpointEvery == 0 || i == iters) {
        next = next.localCheckpoint(false)
        next.count()
        liveCp.foreach(_.unpersist(blocking = false))
        liveCp = checkpointedRdd(next)
      }
      pr = next
    }
    e.unpersist(blocking = false)
    withDeg.unpersist()
    nodes.unpersist()
    pr.select(col("node"), col("pr"))
  }

  /** Neighborhood-overlap link prediction over an undirected graph:
    * for every non-adjacent pair sharing >= `minCommon` neighbors, the
    * common-neighbor count and the Adamic-Adar score
    * (sum over shared neighbors of 1/ln(deg)).
    *
    * Scale: wedges enumerate through the SHARED node — per-node work is
    * deg^2, so hubs dominate. `maxDegree` excludes hub CENTERS from
    * wedge generation (the standard truncation: a node adjacent to
    * everything predicts nothing); the cut is part of the operator's
    * declared semantics so an oracle can replay it. One wedge self-join
    * keyed on the center + one groupBy on the (u,w) pair + one
    * broadcast-free anti-join against the edge set. Determinism: each
    * 1/ln(deg) term is rounded to DECIMAL(18,12) BEFORE the pair sum,
    * so the fold order can't perturb the double the oracle compares. */
  def linkPrediction(edges: DataFrame, src: Column, dst: Column,
                     minCommon: Int = 1, maxDegree: Int = 10000): DataFrame = {
    val und = edges.select(
        least(src, dst).as("a"), greatest(src, dst).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nbr = und.select(col("a").as("n"), col("b").as("c"))
      .union(und.select(col("b").as("n"), col("a").as("c")))
    val deg = nbr.groupBy(col("c").as("node")).agg(count(lit(1)).as("deg"))
    // aa term carried on the wedge center; decimal-rounded once per node
    val centers = deg.where(col("deg") >= 2 && col("deg") <= maxDegree)
      .select(col("node").as("c"),
        (lit(1.0) / log(col("deg").cast("double"))).cast("decimal(18,12)").as("aa"))
    val half = nbr.join(centers, Seq("c"))
    val pairs = half.as("e1").join(half.as("e2"),
        col("e1.c") === col("e2.c") && col("e1.n") < col("e2.n"))
      .groupBy(col("e1.n").as("u"), col("e2.n").as("w"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("e1.aa")).cast("double").as("adamic_adar"))
      .where(col("common_neighbors") >= minCommon)
    val out = pairs.join(und,
        pairs("u") === und("a") && pairs("w") === und("b"), "left_anti")
      .select(col("u"), col("w"), col("common_neighbors"),
        round(col("adamic_adar"), 6).as("adamic_adar"))
    val chk = out.localCheckpoint(true) // self-contained: caches can go
    und.unpersist(blocking = false)
    chk
  }

  /** Per-node local clustering coefficient: 2*T(v) / (deg(v)*(deg(v)-1))
    * with T(v) the triangles through v. Same degree-ordered orientation
    * as [[triangleCount]] (hub-safe O(m^1.5) wedge enumeration); each
    * closed wedge credits its three corners via a 3-row explode, then
    * one groupBy(node) joins back to degrees. Degree-1 nodes emit 0. */
  def clusteringCoefficient(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    val und = edges.select(
        least(src, dst).as("a"), greatest(src, dst).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // deg is referenced three times (two orientation joins + the final
    // coefficient join): cache it; lazy rounds — the single final
    // action materializes everything once (no per-step count barriers)
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("degb")), "b")
      .select(
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
          struct(col("a").as("u"), col("b").as("v"),
            struct(col("degb").as("d"), col("b").as("n")).as("rkv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"),
            struct(col("dega").as("d"), col("a").as("n")).as("rkv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.rkv").as("rkv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.rkv") < col("e2.rkv"))
      .select(col("e1.u").as("c"), col("e1.v").as("u"), col("e2.v").as("v"))
    val perNode = wedges.join(oriented.select(col("u"), col("v")), Seq("u", "v"))
      .select(explode(array(col("c"), col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    val out = deg.join(perNode, Seq("node"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .select(col("node"), col("deg"), col("n_triangles"),
        round(when(col("deg") < 2, lit(0.0)).otherwise(
          lit(2.0) * col("n_triangles").cast("double") /
            (col("deg").cast("double") * (col("deg").cast("double") - lit(1.0)))),
          6).as("clustering_coeff"))
    val chk = out.localCheckpoint(true) // self-contained: caches can go
    und.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    oriented.unpersist(blocking = false)
    chk
  }

  /** Flatten a parent-pointer hierarchy (org chart, bill-of-materials,
    * category tree) to (key, root_key, depth) — the engine's recursive
    * query answer (analog of the reference DAG walks and of SQL's
    * WITH RECURSIVE, which Spark lacks natively).
    *
    * Pointer doubling, not per-level descent: each round every node's
    * ancestor pointer jumps to its ancestor's ancestor, so a depth-d
    * hierarchy settles in ceil(log2 d) rounds instead of d. Each round
    * is ONE hash equi-join of the state frame with itself on the
    * ancestor key; lineage is cut per round (localCheckpoint) so the
    * Catalyst tree stays O(1) like [[pageRank]]'s cadence. Roots are
    * rows whose `parent == key` (self-loop), which contributes depth 0
    * to the jump, so settled rows are fixpoints of the join.
    *
    * Scale: at 100 TB a billion-node forest of depth 30 is 5 rounds of
    * co-partitioned joins — no driver state beyond the one-row settled
    * probe per round; a cycle (corrupt parent pointers) never settles,
    * so `maxRounds` bounds the loop and fails loudly rather than
    * spinning. */
  def flattenHierarchy(parents: DataFrame, key: Column, parent: Column,
                       maxRounds: Int = 40): DataFrame = {
    var st = parents.select(key.as("key"), parent.as("anc"),
        when(parent === key, lit(0L)).otherwise(lit(1L)).as("depth"))
      .localCheckpoint(false)
    st.count()
    val roots = st.where(col("depth") === 0).select(col("key").as("rk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def unsettled(): Long =
      st.join(roots, col("anc") === col("rk"), "left_anti").limit(1).count()
    var liveCp: Option[org.apache.spark.rdd.RDD[_]] = checkpointedRdd(st)
    var round = 0
    while (unsettled() > 0) {
      round += 1
      require(round <= maxRounds,
        s"hierarchy did not settle in $maxRounds pointer-doubling rounds " +
          "(cycle in parent pointers?)")
      val p = st.select(col("key").as("k2"), col("anc").as("anc2"),
        col("depth").as("d2"))
      val next = st.join(p, col("anc") === col("k2"))
        .select(col("key"), col("anc2").as("anc"),
          (col("depth") + col("d2")).as("depth"))
        .localCheckpoint(false)
      next.count() // materialize while the previous cut's blocks live
      liveCp.foreach(_.unpersist(blocking = false))
      liveCp = checkpointedRdd(next)
      st = next
    }
    roots.unpersist(blocking = false)
    st.select(col("key"), col("anc").as("root_key"), col("depth"))
  }

  /** Borůvka minimum spanning forest over integer-weighted undirected
    * edges (src &lt; dst normalized, weight `wq` an exact long): each
    * round every component picks its minimum outgoing edge under the
    * STRICT total order (wq, src, dst) — lexicographic struct-min, so
    * ties cannot fork the tree and the MSF is unique — picked edges
    * merge components through [[Dedup.connectedComponents]]' min-label
    * propagation, and the round count is O(log n) (components at least
    * halve). Because the edge order is total, a sequential Kruskal
    * replay produces the IDENTICAL forest — that is the oracle gate.
    *
    * Scale: rounds are co-partitioned joins on the component label;
    * the per-round CC runs on the picked-edge COMPONENT graph (at most
    * one edge per component — component-count-bounded, not
    * edge-bounded); labels are lineage-cut per round like
    * [[flattenHierarchy]]. Emits the forest edges (u, v, wq). */
  def boruvkaMst(edges: DataFrame, src: Column, dst: Column, wq: Column,
                 maxRounds: Int = 20): DataFrame = {
    val e = edges.select(least(src, dst).as("u"), greatest(src, dst).as("v"),
        wq.cast("long").as("wq"))
      .groupBy(col("u"), col("v")).agg(min(col("wq")).as("wq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Per-round label checkpoints stay EAGER (count per round): the
    // lazy-ride-the-next-probe variant was measured at +28% (9.40 →
    // 12.05 s same-session probe) — comp is referenced up to 6x per
    // round (two ec lookups through the sides union + two cPairs
    // lookups), and an unmaterialized cut consumed from that many plan
    // branches recomputes/lock-convoys, the r11 finding-2 trap.
    var comp = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node"))).distinct()
      .withColumn("c", col("node")).localCheckpoint(false)
    comp.count()
    var liveCp = checkpointedRdd(comp)
    var mst: DataFrame = null
    var round = 0
    var done = false
    while (!done) {
      round += 1
      require(round <= maxRounds,
        s"Boruvka did not converge in $maxRounds rounds")
      // round 1 runs on the IDENTITY labeling (comp(x) = x), so the two
      // |E|-row component-lookup joins reduce to a projection — the
      // heaviest round (every edge still live) skips two shuffles
      val ec = if (round == 1)
        e.where(col("u") =!= col("v"))
          .select(col("u"), col("v"), col("wq"),
            col("u").as("cu"), col("v").as("cv"))
      else e
        .join(comp.select(col("node").as("u"), col("c").as("cu")), Seq("u"))
        .join(comp.select(col("node").as("v"), col("c").as("cv")), Seq("v"))
        .where(col("cu") =!= col("cv"))
      val sides = ec.select(col("cu").as("c"), col("wq"), col("u"), col("v"))
        .union(ec.select(col("cv").as("c"), col("wq"), col("u"), col("v")))
      val picked = sides.groupBy(col("c"))
        .agg(min(struct(col("wq"), col("u"), col("v"))).as("m"))
        .select(col("m.u").as("u"), col("m.v").as("v"),
          col("m.wq").as("wq"))
        .distinct()
        .localCheckpoint(false)
      // merge components: CC over the picked COMPONENT pairs.
      // The picked-edge component graph can chain (each component's
      // min edge pointing to the next) — use the size-dispatched CC
      // (shared helper; the fast path was born here): one row per
      // component, and components at least halve every round, so
      // once it fits the machine-checked 10k bound a driver
      // union-find (min-root, identical labels to the star CC)
      // replaces ~15 jobs of distributed contraction per round;
      // past the bound the distributed O(log n) star path stands.
      // Both paths are spec-asserted label-identical on the helper.
      // The counted variant's edge count doubles as the termination
      // test (picked nonempty ⇔ component pairs nonempty, since every
      // picked edge crosses two distinct components), replacing the
      // separate picked.isEmpty action the loop used to pay per round.
      val cPairs = if (round == 1)
        picked.select(col("u").as("id_a"), col("v").as("id_b"))
      else picked
        .join(comp.select(col("node").as("u"), col("c").as("ca")),
          Seq("u"))
        .join(comp.select(col("node").as("v"), col("c").as("cb")),
          Seq("v"))
        .select(col("ca").as("id_a"), col("cb").as("id_b"))
      val (labels, nPairs) = Dedup.connectedComponentsAutoCounted(cPairs)
      if (nPairs == 0) {
        done = true
      } else {
        mst = if (mst == null) picked
          else mst.unionByName(picked).localCheckpoint(false)
        val merged = labels
          .select(col("doc_id").as("c"), col("component").as("nc"))
        val next = comp.join(merged, Seq("c"), "left")
          .select(col("node"), coalesce(col("nc"), col("c")).as("c"))
          .localCheckpoint(false)
        next.count()
        liveCp.foreach(_.unpersist(blocking = false))
        liveCp = checkpointedRdd(next)
        comp = next
      }
    }
    liveCp.foreach(_.unpersist(blocking = false))
    e.unpersist(blocking = false)
    if (mst == null)
      e.sparkSession.emptyDataFrame
        .select(lit(0L).as("u"), lit(0L).as("v"), lit(0L).as("wq"))
        .limit(0)
    else mst.select(col("u"), col("v"), col("wq"))
  }

  /** HITS (hubs & authorities), fixed iterations: auth(v) = Σ_{u→v}
    * hub(u), hub(u) = Σ_{u→v} auth(v), each L2-normalized per round —
    * the bipartite-natural ranking PageRank isn't (who aggregates
    * supply vs who supplies the aggregators). Per round: two
    * co-partitioned joins + two hash aggs + two 1-row norm frames
    * crossed back — [[pageRank]]'s shuffle shape, doubled. Every
    * cross-node sum folds 1e-9-quantized terms in exact decimal
    * (order-invariant), so a fixed iteration count makes the scores
    * oracle-replayable. Emits (node, hub, auth) rounded to 1e-6. */
  def hits(edges: DataFrame, src: Column, dst: Column,
           iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val dec9 = (c: Column) => round(c, 9).cast("decimal(38,9)")
    val e = edges.select(src.as("src"), dst.as("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    nodes.count()
    var hub = nodes.withColumn("h", lit(1.0))
    var auth = nodes.withColumn("a", lit(1.0))
    for (_ <- 1 to iters) {
      // lineage cut BEFORE normalization, not after: checkpointing the
      // normalized frame made the half-iteration's one action compute
      // the heavy subtree (edge join + agg + node outer join) TWICE —
      // once under the broadcast norm subquery and once on the main
      // path — plus a crossJoin pass. Checkpointing the un-normalized
      // sums runs the heavy subtree ONCE; the norm is then a narrow
      // 1-row agg over the cut and the division rides lazily into the
      // next half-iteration's join (shallow nesting: one cache level,
      // consumed once — not the deep per-round chain the r11 lazy
      // experiment showed recomputing under AQE). Values unchanged:
      // identical expressions, same dec9 quantization points.
      val an = nodes.join(
          e.join(hub, col("src") === col("node"))
            .groupBy(col("dst").as("node"))
            .agg(sum(dec9(col("h"))).cast("double").as("a")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("a"), lit(0.0)).as("a"))
        .localCheckpoint(false)
      an.count()
      val na = an.agg(
        sqrt(sum(dec9(col("a") * col("a"))).cast("double")).as("na"))
      auth = an.crossJoin(broadcast(na))
        .select(col("node"), (col("a") / col("na")).as("a"))
      val hn = nodes.join(
          e.join(auth, col("dst") === col("node"))
            .groupBy(col("src").as("node"))
            .agg(sum(dec9(col("a"))).cast("double").as("h")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("h"), lit(0.0)).as("h"))
        .localCheckpoint(false)
      hn.count()
      val nh = hn.agg(
        sqrt(sum(dec9(col("h") * col("h"))).cast("double")).as("nh"))
      hub = hn.crossJoin(broadcast(nh))
        .select(col("node"), (col("h") / col("nh")).as("h"))
    }
    val out = hub.join(auth, Seq("node"))
      .select(col("node"), round(col("h"), 6).as("hub"),
        round(col("a"), 6).as("auth"))
    e.unpersist(blocking = false)
    out
  }

  /** k-core peeling: iteratively delete nodes of degree < k (with their
    * edges) for a FIXED number of rounds — the subgraph-density
    * decomposition that separates a graph's cohesive core from its
    * tendrils (spam rings and bot farms peel away; organic communities
    * survive). Input edges must be symmetrized (both directions), so
    * per-src counts are full degrees. Each round is one hash agg + two
    * semi-join-shaped filters on the shrinking edge frame, lineage-cut;
    * a fixed round count keeps the result oracle-replayable (true cores
    * converge in a handful of peels on real graphs — convergence
    * detection would add a digest action per round, the
    * [[labelPropagation]] trade). Emits (node, deg) of the survivors'
    * residual degrees. */
  def kCorePeel(edges: DataFrame, src: Column, dst: Column, k: Int,
                rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"bad params: k=$k rounds=$rounds")
    var e = edges.select(src.as("src"), dst.as("dst")).distinct()
      .localCheckpoint(false)
    e.count()
    var cp: Option[org.apache.spark.rdd.RDD[_]] = checkpointedRdd(e)
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("src").as("node"))
      val e2 = e
        .join(keep.select(col("node").as("src")), Seq("src"))
        .join(keep.select(col("node").as("dst")), Seq("dst"))
        .select(col("src"), col("dst"))
        .localCheckpoint(false)
      e2.count()
      cp.foreach(_.unpersist(blocking = false))
      cp = checkpointedRdd(e2)
      e = e2
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }

  /** Bounded Bellman-Ford: minimum path COST from any seed within
    * `maxHops` relaxation rounds, over non-negative edge weights —
    * [[bfsDistances]]'s weighted generalization. Each round is one
    * min-plus step: join the LAST ROUND'S IMPROVED nodes (the
    * label-correcting frontier) to the out-edges, add the weight, and
    * fold the candidates into the standing bests with a full-outer
    * least() merge (one co-partitioned join + one hash agg — the
    * classic distributed SSSP shape). Lineage cut per round. Unlike
    * BFS a node can improve after it is first reached, so the frontier
    * is the improved set, not the newly-reached set; at planetary
    * scale swap in delta-stepping, which keeps this exact join shape
    * per bucket. Emits (node, cost) for nodes reachable within
    * `maxHops`. */
  def shortestPaths(edges: DataFrame, src: Column, dst: Column, weight: Column,
                    seeds: DataFrame, seedKey: Column,
                    maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges.select(src.as("src"), dst.as("dst"), weight.as("w"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Label-correcting frontier, not whole-frame min-plus: only nodes
    // whose cost improved last round can produce new improvements this
    // round (a node whose cost is unchanged re-derives relaxations
    // already folded in an earlier round), so each round joins the
    // improved set — carried as a flag on the round's own checkpointed
    // merge — instead of the entire best frame, and stops early once
    // nothing improves. After round h both forms hold exactly
    // "min cost over paths of <= h edges" (each round propagates one
    // edge; a node's last improvement <= h-1 relaxes at <= h), so the
    // result is identical to the previous shape round for round.
    var best = seeds.select(seedKey.as("node")).distinct()
      .select(col("node"), lit(0L).as("cost"), lit(true).as("__imp"))
      .localCheckpoint(false)
    var frontierN = best.count()
    var bestCp: Option[org.apache.spark.rdd.RDD[_]] = checkpointedRdd(best)
    var h = 1
    while (h <= maxHops && frontierN > 0) {
      val cand = best.where(col("__imp"))
        .join(e, col("node") === col("src"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("cost") + col("w")).as("newc"))
      val merged = best.select(col("node"), col("cost"))
        .join(cand, Seq("node"), "full")
        .select(col("node"), least(col("cost"), col("newc")).as("cost"),
          (col("newc").isNotNull &&
            (col("cost").isNull || col("newc") < col("cost"))).as("__imp"))
        .localCheckpoint(false)
      frontierN = merged.where(col("__imp")).count()
      bestCp.foreach(_.unpersist(blocking = false))
      bestCp = checkpointedRdd(merged)
      best = merged
      h += 1
    }
    e.unpersist(blocking = false)
    best.select(col("node"), col("cost"))
  }

  /** Ancestor transitive closure of a parent-pointer hierarchy:
    * (key, anc, hops) for every ancestor of every node, INCLUDING the
    * reflexive (key, key, 0) row — the join shape hierarchical rollups
    * need (each node's measure contributes to every enclosing subtree).
    *
    * Level-by-level ascent (depth rounds, each one co-partitioned join
    * of the shrinking frontier against the parent table) — the closure
    * output is Θ(n·depth) rows no matter how it's built, so doubling
    * tricks only save rounds, not volume; for depth ≤ a few dozen
    * (real BOM/org/category trees) the simple ascent is the cheaper
    * plan. `maxDepth` bounds corrupt-pointer cycles with a loud
    * failure. */
  def ancestorClosure(parents: DataFrame, key: Column, parent: Column,
                      maxDepth: Int = 40): DataFrame = {
    val par = parents.select(key.as("k2"), parent.as("p2"))
      .repartition(col("k2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = par.select(col("k2").as("key"), col("p2").as("anc"),
        lit(1L).as("hops"))
      .where(col("key") =!= col("anc"))
      .localCheckpoint(false)
    var frontierN = frontier.count()
    val levels = scala.collection.mutable.ArrayBuffer(
      par.select(col("k2").as("key"), col("k2").as("anc"), lit(0L).as("hops")))
    var depth = 1
    while (frontierN > 0) {
      require(depth <= maxDepth,
        s"hierarchy deeper than $maxDepth (cycle in parent pointers?)")
      levels += frontier
      val nxt = frontier.join(par, col("anc") === col("k2"))
        .where(col("p2") =!= col("anc")) // ancestor was not yet a root
        .select(col("key"), col("p2").as("anc"), (col("hops") + 1).as("hops"))
        .localCheckpoint(false)
      frontierN = nxt.count()
      frontier = nxt
      depth += 1
    }
    val out = levels.reduce(_ unionByName _)
    par.unpersist(blocking = false)
    out
  }

  /** Multi-source BFS: minimum hop distance from any seed node, out to
    * `maxHops`. Classic frontier expansion — round h joins the (shrinking)
    * frontier to the out-edges, anti-joins already-visited nodes, and
    * stamps the survivors with distance h. Unreached nodes are absent
    * from the result (distance infinity).
    *
    * Scale: the per-round join is frontier-sized against the cached,
    * src-partitioned edge frame — each edge is traversed at most once
    * over the whole run (its source joins a frontier exactly once), so
    * total work is O(|E| + |V| log) like the single-machine BFS, spread
    * over `maxHops` co-partitioned shuffles. The visited set rides
    * lineage-cut checkpoints; no driver-side state beyond the per-round
    * frontier count (already needed as the emptiness test). */
  def bfsDistances(edges: DataFrame, src: Column, dst: Column,
                   seeds: DataFrame, seedKey: Column,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges.select(src.as("src"), dst.as("dst")).distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var known = seeds.select(seedKey.as("node")).distinct()
      .select(col("node"), lit(0L).as("dist"), lit(true).as("__new"))
      .localCheckpoint(false)
    var frontierN = known.count() // materializes both the seeds and e
    var knownCp: Option[org.apache.spark.rdd.RDD[_]] = checkpointedRdd(known)
    var h = 1
    while (h <= maxHops && frontierN > 0) {
      // The round's frontier count rides the round's OWN checkpointed
      // output (an `__new` flag on the union) instead of a separately
      // materialized frontier frame: one cp + one action per round
      // where the old shape paid two (nxt cp+count, merged cp+count).
      // The count job is a narrow scan of the fresh cut — no shuffle.
      val frontier = known.where(col("__new"))
      val nxt = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(known, Seq("node"), "left_anti")
        .select(col("node"), lit(h.toLong).as("dist"), lit(true).as("__new"))
      val merged = known.select(col("node"), col("dist"),
          lit(false).as("__new"))
        .unionByName(nxt).localCheckpoint(false)
      frontierN = merged.where(col("__new")).count()
      knownCp.foreach(_.unpersist(blocking = false))
      knownCp = checkpointedRdd(merged)
      known = merged
      h += 1
    }
    e.unpersist(blocking = false)
    known.select(col("node"), col("dist"))
  }

  /** Time-respecting reachability with min-date dominance: starting from
    * `seeds` (node, date), a dated edge (src, dst, d) propagates exposure
    * to dst with new exposure date d whenever d is strictly AFTER the
    * current exposure date of src. Returns each reached node's minimum
    * achievable exposure date over all time-increasing paths of at most
    * `maxHops` edges — the contagion / provenance-tracking primitive
    * (which records could this upstream record have influenced, and
    * when at the earliest?).
    *
    * Correctness of the min-date state: an earlier exposure date strictly
    * enlarges the set of usable outgoing edges and the propagated date is
    * the edge's own date (independent of the incoming date), so the
    * minimal date per node DOMINATES all other states at that node — a
    * label-correcting frontier over (node, minDate) explores every
    * optimal path the full (node, date) state graph has. The oracle
    * enumerates the full state space in a recursive CTE and takes the
    * same min, giving a differential check of the dominance argument.
    *
    * Scale: per hop ONE equi-join frontier⋈edges (edges persisted and
    * pre-partitioned on src) + ONE min-groupBy + an anti-style improve
    * check against the known set; frontier carries only improved nodes,
    * so rounds shrink. Lineage is cut per round via localCheckpoint.
    */
  def temporalReachMinDate(edges: DataFrame, src: Column, dst: Column,
                           date: Column, seeds: DataFrame, seedKey: Column,
                           seedDate: Column, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges.select(src.as("src"), dst.as("dst"), date.as("d")).distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var known = seeds
      .groupBy(seedKey.as("node")).agg(min(seedDate).as("exp_d"))
      .withColumn("__imp", lit(true))
      .localCheckpoint(false)
    var frontierN = known.count()
    var knownCp: Option[org.apache.spark.rdd.RDD[_]] = checkpointedRdd(known)
    var h = 1
    while (h <= maxHops && frontierN > 0) {
      // One cp + one action per round (was two: improved cp+count,
      // merged cp+count): the improved set is re-derived as a flag on
      // the round's own full-outer merge — a candidate improves exactly
      // when it is new or strictly earlier, the same predicate the
      // separate `improved` frame filtered on; least() ignores nulls,
      // so non-improving candidates keep the standing date. Labels and
      // the frontier are unchanged; the count is a narrow cut scan.
      val frontier = known.where(col("__imp"))
      val cand = frontier.join(e, col("node") === col("src") &&
          col("d") > col("exp_d"))
        .groupBy(col("dst").as("node")).agg(min(col("d")).as("new_d"))
      val merged = known.select(col("node"), col("exp_d"))
        .join(cand, Seq("node"), "full")
        .select(col("node"), least(col("exp_d"), col("new_d")).as("exp_d"),
          (col("new_d").isNotNull &&
            (col("exp_d").isNull || col("new_d") < col("exp_d"))).as("__imp"))
        .localCheckpoint(false)
      frontierN = merged.where(col("__imp")).count()
      knownCp.foreach(_.unpersist(blocking = false))
      knownCp = checkpointedRdd(merged)
      known = merged
      h += 1
    }
    e.unpersist(blocking = false)
    known.select(col("node"), col("exp_d"))
  }

  /** All-pairs hop distances on a BOUNDED entity graph: every node
    * seeds its own BFS, carried as a source tag, so one co-partitioned
    * (state ⋈ edges) join + one min-groupBy per round relaxes all
    * sources at once — [[shortestPaths]] with the source in the key.
    *
    * Scale contract: the state is Θ(V²) rows by definition of
    * all-pairs, so this runs on AGGREGATED entity graphs (nations,
    * categories, data centers — V in the thousands), never on raw-key
    * graphs; the 100 TB work is the upstream edge rollup that built the
    * entity graph. For V where V² breaks, closeness needs sampling or
    * hyperball sketches, which change the answer — this operator is the
    * exact small-V primitive. Emits (s, node, dist) for each reached
    * pair within `maxHops` (including the reflexive dist-0 row). */
  def allPairsDistances(edges: DataFrame, src: Column, dst: Column,
                        maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges.select(src.as("esrc"), dst.as("edst")).distinct()
      .repartition(col("esrc"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("esrc").as("node"))
      .unionByName(e.select(col("edst").as("node"))).distinct()
    // Tagged multi-source BFS, not per-round min-plus over the whole
    // state: with unit hops a (s, node) pair's FIRST discovery round is
    // its minimum distance, so each round expands only the previous
    // round's frontier (carried as a flag on the round's own
    // checkpointed union — one cp + one narrow-count action per round,
    // where the min-plus shape re-joined and re-aggregated the entire
    // Θ(V²) state every round) and stops early once no pair is new
    // (identical output: the skipped rounds were no-ops). Same min-hop
    // distances as the min-plus recurrence, pair for pair.
    var best = nodes.select(col("node").as("s"), col("node"),
        lit(0L).as("dist"), lit(true).as("__new"))
      .localCheckpoint(false)
    var frontierN = best.count()
    var bestCp: Option[org.apache.spark.rdd.RDD[_]] = checkpointedRdd(best)
    var h = 1
    while (h <= maxHops && frontierN > 0) {
      val nxt = best.where(col("__new"))
        .join(e, col("node") === col("esrc"))
        .select(col("s"), col("edst").as("node")).distinct()
        .join(best, Seq("s", "node"), "left_anti")
        .select(col("s"), col("node"), lit(h.toLong).as("dist"),
          lit(true).as("__new"))
      val merged = best.select(col("s"), col("node"), col("dist"),
          lit(false).as("__new"))
        .unionByName(nxt).localCheckpoint(false)
      frontierN = merged.where(col("__new")).count()
      bestCp.foreach(_.unpersist(blocking = false))
      bestCp = checkpointedRdd(merged)
      best = merged
      h += 1
    }
    e.unpersist(blocking = false)
    best.select(col("s"), col("node"), col("dist"))
  }
}
