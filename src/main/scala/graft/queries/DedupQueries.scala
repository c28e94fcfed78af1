package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.Dedup

/** Oracle-gated deduplication queries over `documents`: exact hash
  * dedup, exact n-gram Jaccard via shingle-share join, MinHash+LSH with
  * md5-derived hash family (the DuckDB oracle replays the identical
  * signatures, bands and candidates), and SimHash chunk-blocked pairs.
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // first-word-blocked fuzzy pairs over the part-type DOMAIN scored
    // with the native banded graft_lev_bounded expression (exact
    // distance iff <= 3, else 4 — O(k*n) per pair with a length-gap
    // fast path, not a full DP table); the distance histogram is the
    // gate, replayed in the oracle as least(levenshtein, 4)
    "q419_bounded_edit_pairs" -> ((s, d) => {
      import org.apache.spark.sql.graftshim.ColumnSql
      val t = Tables.part(s, d).select(col("p_type").as("nm")).distinct()
        .withColumn("w1", split(col("nm"), " ").getItem(0))
      val a = t.select(col("w1"), col("nm").as("nm_a"))
      val b = t.select(col("w1"), col("nm").as("nm_b"))
      val lev = ColumnSql.columnOf(graft.expressions.BoundedLevenshtein(
        ColumnSql.expressionOf(col("nm_a")),
        ColumnSql.expressionOf(col("nm_b")),
        ColumnSql.expressionOf(lit(3))))
      a.join(b, Seq("w1")).where(col("nm_a") < col("nm_b"))
        .select(lev.cast("long").as("dist"))
        .where(col("dist") <= 3)
        .groupBy(col("dist")).agg(count(lit(1)).as("n_pairs"))
    }),
    // fixed-iteration PageRank over the customer<->supplier trade graph
    // (suppliers offset into their own key space; both directions so
    // mass flows through the bipartite structure)
    "q142_pagerank" -> ((s, d) => {
      val trade = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"),
          (col("l_suppkey") + 1000000L).as("p"))
      val edges = trade.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(trade.select(col("p").as("src"), col("c").as("dst")))
      val pr = graft.operators.Graph.pageRank(edges, col("src"), col("dst"),
        iters = 3, damping = 0.85)
      // emit size-normalized rank (pr * N, ~1.0 scale): rounding the raw
      // ~1/N ranks would sit too close to the 1e-6 grid for a stable gate
      val n = pr.agg(count(lit(1)).as("n"))
      pr.crossJoin(broadcast(n))
        .select(col("node"), round(col("pr") * col("n"), 6).as("pr_scaled"))
    }),

    // image near-dup via perceptual dHash over the stub codec: 4x14-bit
    // chunk blocking + exact popcount verify (with the fake md5 "pixels"
    // only byte-identical payloads land inside the radius — the blocking
    // and verify machinery are what the gate exercises)
    "q158_image_dhash_neardup" -> ((s, d) => {
      val docs = graft.operators.Multimodal.withPayload(Tables.documents(s, d), "text")
      graft.operators.Multimodal.dHashNearDupPairs(docs, col("doc_id"),
        col("payload"), maxHamming = 3)
    }),

    // dedup diagnostics: per-source share of documents with at least
    // one MinHash-LSH near-duplicate (the curation report that decides
    // which ingest feeds need scrubbing)
    "q238_dup_rate_by_source" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minHashLshPairs(docs, col("doc_id"), col("text"),
        k = 3, numHashes = 12, numBands = 6, threshold = 0.35)
      val dup = pairs.select(col("id_a").as("doc_id"))
        .union(pairs.select(col("id_b").as("doc_id")))
        .distinct().withColumn("isdup", lit(1))
      docs.join(dup, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("isdup"), lit(0))).as("n_with_dup"))
        .select(col("source"), col("n_docs"), col("n_with_dup"),
          round(col("n_with_dup").cast("double") / col("n_docs").cast("double"), 6)
            .as("dup_rate"))
    }),

    // record linkage: match odd-key part names to their top-3 even-key
    // canonical parts. p_name draws 5 words from a ~16-word vocabulary,
    // so token blocking degenerates (25% of all pairs share a token);
    // delete-one signature blocking stays selective, and at t = 0.65
    // (>= (n-1)/(n+1) for 5-token names) it is exact — the oracle
    // verifies plain all-pairs Jaccard
    "q159_fuzzy_match" -> ((s, d) => {
      val part = Tables.part(s, d)
      Dedup.nearExactMatchTopK(
          part.where(col("p_partkey") % 2 === 0), col("p_partkey"), col("p_name"),
          part.where(col("p_partkey") % 2 === 1), col("p_partkey"), col("p_name"),
          k = 3, minJaccard = 0.65)
        .withColumn("jaccard", round(col("jaccard"), 6))
    }),

    // Bayardo prefix-filtered fuzzy join (the loose record-linkage
    // tier): a small probe batch (5% of parts) matched against the
    // even-key canon half at Jaccard >= 0.5, top-3 per probe — the
    // lookup-shaped workload the operator exists for (cost scales with
    // the probe batch, not canon²; part names are a DENSE 92-word
    // vocabulary, the prefix filter's worst case, so an all-vs-all gate
    // would be quadratic by construction — see nearExactMatchTopK for
    // that regime). Prefix filtering is EXACT vs share-a-token blocking
    // (no token exceeds the hot cap at this scale), so the oracle
    // verifies with plain all-candidates semantics.
    "q256_fuzzy_join_topk" -> ((s, d) => {
      val part = Tables.part(s, d)
      Dedup.fuzzyJoinTopK(
          part.where(col("p_partkey") % 2 === 0), col("p_partkey"), col("p_name"),
          part.where(col("p_partkey") % 20 === 1), col("p_partkey"), col("p_name"),
          k = 3, minJaccard = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 6))
    }),

    // synchronous label propagation (2 fixed rounds) over the bipartite
    // customer<->supplier trade graph: neighbor-majority labels with
    // min tiebreak — communities, not components
    "q167_label_propagation" -> ((s, d) => {
      // the orders projection is a 2-column ~MB dimension against the
      // lineitem fact: broadcast it so the edge build never shuffles
      // the fact side
      val trade = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("p"))
      graft.operators.Graph.labelPropagation(trade, col("c"), col("p"), iters = 2)
    }),

    // modularity of the q167 label-propagation communities: Q = sum_c
    // [w_c/E - (d_c/E)^2] in the directed-double edge representation —
    // the community-quality readout that tells you whether the
    // propagation found real structure. w_c/d_c are exact integer
    // counts; per-community terms quantize to DECIMAL(18,12) before
    // the final fold so the cross-community sum is order-independent.
    "q365_modularity" -> ((s, d) => {
      val trade = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("p"))
      // dedup the trade edges ONCE and cache: the un-persisted shape
      // re-ran the orders⋈lineitem build + distinct up to 6x across the
      // modularity readout's three references to the symmetrized edge
      // set (labelPropagation caches its own copy, but t/e did not).
      // Feeding t to labelPropagation is label-identical — it distincts
      // its symmetrized input anyway.
      val t = trade.select(col("c"), col("p")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val labels = graft.operators.Graph.labelPropagation(
        t, col("c"), col("p"), iters = 2)
      val e = t.select(col("c").as("u"), col("p").as("v"))
        .unionByName(t.select(col("p").as("u"), col("c").as("v")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val lab = labels.select(col("node"), col("label"))
      val eL = e.join(lab.select(col("node").as("u"), col("label").as("lu")),
          Seq("u"))
        .join(lab.select(col("node").as("v"), col("label").as("lv")), Seq("v"))
      val within = eL.where(col("lu") === col("lv"))
        .groupBy(col("lu").as("label")).agg(count(lit(1)).as("w"))
      val degs = e.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
        .join(lab, Seq("node"))
        .groupBy(col("label")).agg(sum(col("deg")).as("dc"))
      val tot = e.agg(count(lit(1)).as("E"))
      val out = degs.join(within, Seq("label"), "left")
        .select(col("label"), coalesce(col("w"), lit(0L)).as("w"), col("dc"))
        .crossJoin(broadcast(tot))
        .select((col("w").cast("double") / col("E") -
            (col("dc").cast("double") / col("E")) *
            (col("dc").cast("double") / col("E")))
          .cast("decimal(18,12)").as("term"))
        .agg(count(lit(1)).as("n_communities"),
          round(sum(col("term")).cast("double"), 6).as("modularity"))
        // eager 1-row materialization so t/e release at the LIBRARY
        // surface (repeated invocations no longer accumulate caches
        // across queries — the bench-level clearCache was the only
        // thing releasing them before)
        .localCheckpoint(true)
      t.unpersist(blocking = false)
      e.unpersist(blocking = false)
      out
    }),

    // exact triangle count over the part-affinity graph (parts bought
    // together in large-quantity lineitems of the same order), via
    // degree-ordered orientation — the O(m^1.5), hub-safe algorithm
    "q190_triangle_count" -> ((s, d) => {
      val li = Tables.lineitem(s, d).where(col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      graft.operators.Graph.triangleCount(e, col("pa"), col("pb"))
    }),

    "q22_dedup_exact" -> ((s, d) => {
      Dedup.exactGroups(Tables.documents(s, d), col("doc_id"), col("text"))
    }),

    // DeepWalk corpus prep: 3-step md5-seeded random walks from every
    // node of the (undirected) part-affinity graph — the walk table a
    // skip-gram graph-embedding trainer consumes; seeds key on
    // (start, step, current) so walks diverge like real draws yet
    // replay exactly
    "q552_random_walks" -> ((s, d) => {
      val li = Tables.lineitem(s, d).where(col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_partkey"))
      val e0 = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      val und = e0.unionByName(
        e0.select(col("pb").as("pa"), col("pa").as("pb")))
      graft.operators.Graph.randomWalks(und, col("pa"), col("pb"), len = 3)
    }),

    // 4-truss of the part-affinity graph (q190's edges): two fixed
    // peel rounds drop every edge in fewer than 2 triangles, support
    // recomputed on survivors — the cohesion filter that separates
    // genuinely clustered co-purchases from incidental pairs (denser
    // than k-core: edges, not nodes, must be triangle-supported)
    "q532_ktruss" -> ((s, d) => {
      val li = Tables.lineitem(s, d).where(col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      graft.operators.Graph.trussPeel(e, col("pa"), col("pb"),
        k = 4, rounds = 2)
    }),

    // homoglyph-evasion detection: exact dedup (q22) keys on raw bytes,
    // so a Cyrillic-о or zero-width-space swap defeats it; hashing the
    // confusable SKELETON catches exactly those. The adversarial twins
    // are generated in-query (every 37th doc gets a latin->cyrillic
    // substituted copy with a ZWSP appended, replayed verbatim by the
    // oracle); the detector is the groupBy — row-local skeleton, one
    // shuffle on the skeleton hash, scales like exact dedup
    "q526_homoglyph_evasion" -> ((s, d) => {
      import graft.functions.TextAnalysis
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val evaded = docs.where(col("doc_id") % 37 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(translate(col("text"), "aeopcxy", "аеорсху"),
            lit("\u200B")).as("text"))
      docs.unionByName(evaded)
        .select(col("doc_id"), md5(col("text")).as("raw_md5"),
          md5(TextAnalysis.confusableSkeleton(col("text"))).as("skeleton_md5"))
        .groupBy(col("skeleton_md5"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("raw_md5")).as("n_raw_variants"),
          min(col("doc_id")).as("keeper_id"))
        .where(col("n_raw_variants") > 1)
    }),

    "q23_dedup_ngram_jaccard" -> ((s, d) => {
      Dedup.jaccardPairs(Tables.documents(s, d), col("doc_id"), col("text"), 3, 0.4,
          maxShingleDocFreq = 1000)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // the SQL-first surface end-to-end: a pure spark.sql query over a
    // temp view using the natively-registered graft_* functions
    // (SparkSessionExtensions) — proves the engine's SQL entry point
    // under the same differential gate as the DataFrame API
    "q317_sql_surface" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part_v")
      s.sql("""
        WITH p AS (SELECT p_partkey AS id, p_name AS nm,
                          split(p_name, ' ')[0] AS blk
                   FROM part_v
                   WHERE graft_hash60(p_name) % 4 = 0)
        SELECT a.id AS id_a, b.id AS id_b,
               ROUND(graft_jaro_winkler(a.nm, b.nm), 6) AS jw
        FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
        WHERE graft_jaro_winkler(a.nm, b.nm) >= 0.85
      """)
    }),

    // dedup threshold-tuning curve: how many candidate pairs survive at
    // each Jaccard cutoff — the sweep a pipeline runs ONCE (over the
    // already-computed candidate scores, 11-bucket domain) before
    // committing to a threshold
    // LSH power planner: the S-curve P(candidate) = 1 - (1 - s^r)^b
    // over the Jaccard grid for the three (bands, rows) splits of a
    // 12-hash signature — the design table read BEFORE picking q86's
    // (6,2) config; q320 is the empirical counterpart. Powers are
    // explicit multiplication chains (no libm pow), so both engines
    // compute bit-identical doubles
    "q520_lsh_power_planner" -> ((s, d) => {
      val grid = s.range(1, 20)
        .select((col("id").cast("double") / lit(20.0)).as("s"))
      def cfg(b: Int, r: Int) = struct(lit(b).as("b"), lit(r).as("r"))
      val rows = grid.select(col("s"),
        explode(array(cfg(6, 2), cfg(4, 3), cfg(3, 4))).as("c"))
        .select(col("s"), col("c.b").as("b"), col("c.r").as("r"))
      val sC = col("s")
      val pBand = when(col("r") === 2, sC * sC)
        .when(col("r") === 3, sC * sC * sC)
        .otherwise(sC * sC * sC * sC)
      val t = lit(1.0) - pBand
      val miss = when(col("b") === 6, t * t * t * t * t * t)
        .when(col("b") === 4, t * t * t * t)
        .otherwise(t * t * t)
      rows.select(col("s"), col("b"), col("r"),
        round(pBand, 6).as("p_band"),
        round(lit(1.0) - miss, 6).as("p_detect"))
    }),

    "q320_dedup_threshold_curve" -> ((s, d) => {
      val pairs = Dedup.minHashLshPairs(Tables.documents(s, d),
        col("doc_id"), col("text"), k = 3, numHashes = 12, numBands = 6,
        threshold = 0.0)
      val buckets = pairs
        .select(floor(col("jaccard") * 10).cast("int").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("bucket").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      buckets.select(col("bucket"),
        round(col("bucket").cast("double") / 10, 1).as("threshold"),
        col("n"), sum(col("n")).over(w).as("n_pairs_ge"))
    }),

    // near-dup cluster canonicalization: per cluster, elect the keeper
    // (longest doc, ties to the smaller id) + membership stats — the
    // decision step between "found near-dups" and "rewrote the corpus"
    "q315_dedup_canonicalize" -> ((s, d) => {
      val pairs = Dedup.minHashLshPairs(Tables.documents(s, d),
        col("doc_id"), col("text"), k = 3, numHashes = 12, numBands = 6,
        threshold = 0.35)
      val comp = Dedup.connectedComponents(pairs)
      val meta = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      // scalar sort key (DuckDB min_by has no struct comparator):
      // longest doc first, ties to the smaller id — ids stay < 1e9
      comp.join(meta, Seq("doc_id"))
        .groupBy(col("component"))
        .agg(min_by(col("doc_id"),
          (-col("n_chars")) * lit(1000000000L) + col("doc_id"))
          .as("canonical_id"),
          count(lit(1)).as("n_members"),
          max(col("n_chars")).as("max_chars"))
    }),

    // HITS hubs & authorities (2 fixed iterations) over the DIRECTED
    // customer->supplier trade graph: who aggregates supply (hubs) vs
    // who supplies the aggregators (authorities) — the bipartite
    // ranking PageRank's single score conflates
    "q325_hits" -> ((s, d) => {
      val trade = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      graft.operators.Graph.hits(trade, col("src"), col("dst"), iters = 2)
    }),

    // end-to-end entity resolution: blocked pairs -> FS-EM pattern
    // weights -> threshold (match_weight >= 2) -> connected components
    // -> cluster roster. The full ER pipeline as ONE gated query: the
    // probabilistic scorer (q306) and the cluster machinery (q86)
    // composing, which is what an MDM deployment actually runs.
    "q321_er_pipeline" -> ((s, d) => {
      val prof = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long")
            .as("cents"),
          max(col("o_orderpriority")).as("maxprio"))
        .withColumn("b1", expr("cents div 5000000"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"),
          col("c_nationkey").as("nat"))
        .join(prof, col("c_custkey") === col("o_custkey"))
      def side(t: String) = c.select(col("c_custkey").as(s"k$t"),
        col("seg"), col("nat"), col("b1").as(s"b1$t"),
        col("n_orders").as(s"no$t"), col("maxprio").as(s"mp$t"))
      val pairs = side("a").join(side("b"), Seq("seg", "nat"))
        .where(col("ka") < col("kb"))
        .select(col("ka"), col("kb"),
          when(col("b1a") === col("b1b"), 1).otherwise(0).as("g1"),
          when(abs(col("noa") - col("nob")) <= 1, 1).otherwise(0).as("g2"),
          when(col("mpa") === col("mpb"), 1).otherwise(0).as("g3"))
        .persist()
      val pat = pairs.groupBy(col("g1"), col("g2"), col("g3"))
        .agg(count(lit(1)).as("n"))
      // materialize the <=8-row weights table: the EM chain's plan
      // re-aggregates the 900k-pair frame once per REFERENCE otherwise
      // (each of the 2 iterations' params is itself a pat crossJoin)
      val weights = Dedup.fellegiSunterEM(pat, iters = 2)
        .select(col("g1"), col("g2"), col("g3"), col("match_weight"))
        .localCheckpoint(true)
      val edges = pairs
        .join(broadcast(weights), Seq("g1", "g2", "g3"))
        .where(col("match_weight") >= 2.0)
        .select(col("ka").as("id_a"), col("kb").as("id_b"))
      // large-star/small-star, NOT plain label propagation: the g2
      // predicate (|n_orders| diff <= 1) chains matches, so components
      // are high-diameter paths — min-label walked ~18 rounds (~7 jobs
      // each, 10s of pure round overhead at sf0.1) where the star
      // contraction lands in O(log n). (r11 measured the size-dispatched
      // CC here at 1.12x — the canon distinct+count over the ~1M-pair
      // match graph costs more than the dispatch saves; Star stays.)
      Dedup.connectedComponentsStar(edges)
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"),
          min(col("doc_id")).as("min_key"), max(col("doc_id")).as("max_key"))
    }),

    // train/test near-dup leakage audit: hash-split the corpus 80/20,
    // then count test docs with an LSH near-duplicate in train — the
    // eval-hygiene number every benchmark split should report
    "q323_split_leakage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sp = graft.operators.Curation.hashSplit(docs, col("doc_id"),
          Seq("train" -> 0.8, "test" -> 0.2))
        .select(col("doc_id"), col("split"))
      val pairs = Dedup.minHashLshPairs(docs, col("doc_id"), col("text"),
        k = 3, numHashes = 12, numBands = 6, threshold = 0.35)
      val cross = pairs
        .join(sp.select(col("doc_id").as("id_a"), col("split").as("sp_a")),
          "id_a")
        .join(sp.select(col("doc_id").as("id_b"), col("split").as("sp_b")),
          "id_b")
        .where(col("sp_a") =!= col("sp_b"))
      val leaked = cross.select(when(col("sp_a") === "test", col("id_a"))
        .otherwise(col("id_b")).as("doc_id")).distinct()
      val nTest = sp.where(col("split") === "test")
        .agg(count(lit(1)).as("n_test"))
      val nLeak = leaked.agg(count(lit(1)).as("n_leaked"))
      nTest.crossJoin(broadcast(nLeak))
        .select(col("n_test"), col("n_leaked"),
          round(col("n_leaked").cast("double") / col("n_test"), 6)
            .as("leak_rate"))
    }),

    // k-core peeling (k=3, 4 fixed rounds) over the trade graph:
    // survivors and their residual degrees after tendrils peel away
    "q309_kcore_peel" -> ((s, d) => {
      val trade = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("p"))
      val edges = trade.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(trade.select(col("p").as("src"), col("c").as("dst")))
      graft.operators.Graph.kCorePeel(edges, col("src"), col("dst"),
        k = 3, rounds = 4)
    }),

    // Fellegi-Sunter probabilistic linkage: agreement patterns over
    // (segment, nation)-blocked customer pairs on three order-profile
    // fields (spend bucket, order-count proximity, max priority), then
    // 2 unrolled EM iterations -> per-pattern posterior w + log2 match
    // weight. The data-sized work is ONE blocked pair count; EM runs on
    // the 8-row pattern table.
    "q306_fs_linkage_em" -> ((s, d) => {
      val prof = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long")
            .as("cents"),
          max(col("o_orderpriority")).as("maxprio"))
        .withColumn("b1", expr("cents div 5000000"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"),
          col("c_nationkey").as("nat"))
        .join(prof, col("c_custkey") === col("o_custkey"))
      def side(t: String) = c.select(col("c_custkey").as(s"k$t"),
        col("seg"), col("nat"), col("b1").as(s"b1$t"),
        col("n_orders").as(s"no$t"), col("maxprio").as(s"mp$t"))
      val pat = side("a").join(side("b"), Seq("seg", "nat"))
        .where(col("ka") < col("kb"))
        .select(
          when(col("b1a") === col("b1b"), 1).otherwise(0).as("g1"),
          when(abs(col("noa") - col("nob")) <= 1, 1).otherwise(0).as("g2"),
          when(col("mpa") === col("mpb"), 1).otherwise(0).as("g3"))
        .groupBy(col("g1"), col("g2"), col("g3")).agg(count(lit(1)).as("n"))
      Dedup.fellegiSunterEM(pat, iters = 2)
    }),

    // bounded Bellman-Ford over the trade graph with deterministic
    // (src+dst)%3-derived weights: min path cost within 4 min-plus
    // relaxation rounds from the seed customers — BFS's weighted
    // generalization; oracle replays states via WITH RECURSIVE (cost
    // domain is bounded, so the state CTE stays small)
    "q294_bellman_ford" -> ((s, d) => {
      val trade = broadcast(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("p"))
      val edges = trade.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(trade.select(col("p").as("src"), col("c").as("dst")))
        .withColumn("w", lit(1L) + pmod(col("src") + col("dst"), lit(3L)))
      val seeds = Tables.customer(s, d).where(col("c_custkey") % 100 === 0)
        .select(col("c_custkey").cast("long").as("node"))
      graft.operators.Graph.shortestPaths(edges, col("src"), col("dst"),
        col("w"), seeds, col("node"), maxHops = 4)
    }),

    // MinHash estimator audit: signature-agreement Jaccard estimate vs
    // the exact shingle Jaccard on every LSH candidate pair — the
    // sketch-trust check a pipeline runs before letting the estimate
    // gate billions of pairs
    "q295_minhash_estimate" -> ((s, d) => {
      Dedup.minHashEstimatePairs(Tables.documents(s, d), col("doc_id"),
        col("text"), k = 3, numHashes = 12, numBands = 6)
    }),

    // corpus-level source-pair overlap matrix: distinct trigram sets
    // per source, pairwise shared counts via ONE equi-join on the
    // shingle (fan bounded by sources² per shingle, never by corpus
    // size) — the cross-source contamination readout
    "q296_source_overlap" -> ((s, d) => {
      val sh = Dedup.shingleFrame(Tables.documents(s, d), col("source"),
        col("text"), 3)
      val ss = sh.select(col("doc").as("src"), explode(col("shingles")).as("s"))
        .distinct()
        .persist()
      val sizes = ss.groupBy(col("src")).agg(count(lit(1)).as("n"))
      val shared = ss.as("a").join(ss.as("b"),
          col("a.s") === col("b.s") && col("a.src") < col("b.src"))
        .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
      shared
        .join(broadcast(sizes.select(col("src").as("src_a"),
          col("n").as("n_a"))), "src_a")
        .join(broadcast(sizes.select(col("src").as("src_b"),
          col("n").as("n_b"))), "src_b")
        .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"),
          col("n_b"),
          round(col("n_shared").cast("double") /
            (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard"),
          round(col("n_shared").cast("double") /
            least(col("n_a"), col("n_b")).cast("double"), 6)
            .as("containment"))
    }),

    // directed shingle containment (|A∩B|/|A|, /|B|): catches a short
    // doc embedded in a long one, which Jaccard's union denominator
    // hides — the contamination-detection geometry. Shares q23's
    // candidate core (hot-shingle-capped share join).
    "q290_dedup_containment" -> ((s, d) => {
      Dedup.containmentPairs(Tables.documents(s, d), col("doc_id"), col("text"),
        k = 3, threshold = 0.5, maxShingleDocFreq = 1000)
    }),

    "q24_dedup_minhash_lsh" -> ((s, d) => {
      Dedup.minHashLshPairs(Tables.documents(s, d), col("doc_id"), col("text"),
          k = 3, numHashes = 12, numBands = 6, threshold = 0.35)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // blocking-quality scorecard for the q24 LSH scheme: reduction
    // ratio vs the full pair space + pair completeness vs exact
    // share-a-shingle ground truth
    "q262_blocking_quality" -> ((s, d) => {
      Dedup.blockingQuality(Tables.documents(s, d), col("doc_id"), col("text"),
        k = 3, numHashes = 12, numBands = 6, threshold = 0.35,
        truthSampleMod = 2L, maxShingleDocFreq = 1000L)
    }),

    "q25_dedup_simhash" -> ((s, d) => {
      Dedup.simHashPairs(Tables.documents(s, d), col("doc_id"), col("text"), maxHamming = 2)
    }),

    // connected components over the MinHash near-dup pairs: transitive
    // dedup clusters with min-id canonical keeper per component
    "q86_dedup_components" -> ((s, d) => {
      val pairs = Dedup.minHashLshPairs(Tables.documents(s, d),
        col("doc_id"), col("text"), k = 3, numHashes = 12, numBands = 6,
        threshold = 0.35)
      Dedup.connectedComponents(pairs)
    }),

    // near-dup pair explanation: the exact shared-shingle evidence (top
    // 3 in binary order + total) behind each q24-style LSH match — what
    // a reviewer reads when a dedup drop is appealed
    "q558_neardup_explain" -> ((s, d) => {
      graft.operators.Dedup.neardupExplain(Tables.documents(s, d),
        col("doc_id"), col("text"), k = 3, numHashes = 12, numBands = 6,
        threshold = 0.35)
    }),

    // the dedup BUSINESS readout over q86's clusters: how many docs the
    // min-id-keeper policy would drop and the corpus-level savings rate
    // — the number that justifies (or kills) running dedup at all
    "q557_dedup_savings" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minHashLshPairs(docs, col("doc_id"), col("text"),
        k = 3, numHashes = 12, numBands = 6, threshold = 0.35)
      val cl = Dedup.connectedComponents(pairs)
        .groupBy(col("component")).agg(count(lit(1)).as("sz"))
      val st = cl.agg(count(lit(1)).as("n_clusters"),
        sum(col("sz")).as("docs_in_clusters"),
        max(col("sz")).as("max_cluster"))
      val tot = docs.agg(count(lit(1)).as("n_docs"))
      st.crossJoin(broadcast(tot)).select(
        col("n_docs"), col("docs_in_clusters"), col("n_clusters"),
        col("max_cluster"),
        (col("docs_in_clusters") - col("n_clusters")).as("n_dropped"),
        round((col("docs_in_clusters") - col("n_clusters")).cast("double") /
          col("n_docs").cast("double"), 6).as("savings_rate"))
    }),

    // B-cubed precision/recall/F1 of the LSH near-dup clustering (q86's
    // system) against exact-text duplicate groups as gold — the
    // standard extrinsic evaluation of an ER/dedup clustering, computed
    // from the (sys, gold) contingency cells: P = Σ n_ab²/n_sys / N,
    // R = Σ n_ab²/n_gold / N, per-cell terms quantized to DECIMAL so
    // the sums are order-independent. Docs in no LSH pair are their own
    // singleton system cluster (coalesce to doc_id)
    "q515_bcubed_cluster_eval" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("gold"))
      val pairs = Dedup.minHashLshPairs(Tables.documents(s, d),
        col("doc_id"), col("text"), k = 3, numHashes = 12, numBands = 6,
        threshold = 0.35)
      val comp = Dedup.connectedComponents(pairs)
      val assign = docs.join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"), col("gold"),
          coalesce(col("component"), col("doc_id")).as("sys"))
        .localCheckpoint(false)
      val cell = assign.groupBy(col("sys"), col("gold"))
        .agg(count(lit(1)).as("nab"))
      val nb = cell.groupBy(col("sys")).agg(sum(col("nab")).as("nbs"))
      val na = cell.groupBy(col("gold")).agg(sum(col("nab")).as("nas"))
      val terms = cell.join(nb, Seq("sys")).join(na, Seq("gold"))
        .select(
          ((col("nab") * col("nab")).cast("double") /
            col("nbs").cast("double")).cast("decimal(28,12)").as("tp"),
          ((col("nab") * col("nab")).cast("double") /
            col("nas").cast("double")).cast("decimal(28,12)").as("tr"))
      val tot = assign.agg(count(lit(1)).as("n"),
        countDistinct(col("sys")).as("n_sys"),
        countDistinct(col("gold")).as("n_gold"))
      val p = col("sp").cast("double") / col("n").cast("double")
      val r = col("sr").cast("double") / col("n").cast("double")
      terms.agg(sum(col("tp")).as("sp"), sum(col("tr")).as("sr"))
        .crossJoin(broadcast(tot))
        .select(col("n").as("n_docs"), col("n_sys"), col("n_gold"),
          round(p, 6).as("bcubed_p"), round(r, 6).as("bcubed_r"),
          round(lit(2.0) * p * r / (p + r), 6).as("bcubed_f1"))
    }),

    // same clusters via large-star/small-star (the O(log n)-round CC
    // for high-diameter graphs) — hash-gated against the identical
    // recursive-CTE oracle as q86's label propagation
    "q111_dedup_components_star" -> ((s, d) => {
      val pairs = Dedup.minHashLshPairs(Tables.documents(s, d),
        col("doc_id"), col("text"), k = 3, numHashes = 12, numBands = 6,
        threshold = 0.35)
      Dedup.connectedComponentsStar(pairs)
    }),

    // incremental-ingest dedup: a new batch (doc_id % 5 == 0) filtered
    // against the standing corpus — any incoming doc near-duplicating an
    // existing one is dropped before ingestion
    "q114_dedup_against_corpus" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.dedupAgainstCorpus(
        docs.where(col("doc_id") % 5 =!= 0), docs.where(col("doc_id") % 5 === 0),
        col("doc_id"), col("text"), k = 3, numHashes = 12, numBands = 6,
        threshold = 0.35)
        .select(col("doc_id"), col("source"))
    }),

    // END-TO-END near-dup removal: candidate pairs → components → drop
    // every non-keeper; documents in no pair survive untouched
    "q99_dedup_drop_neardups" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minHashLshPairs(docs, col("doc_id"), col("text"),
        k = 3, numHashes = 12, numBands = 6, threshold = 0.35)
      graft.operators.Curation.dropNearDups(docs, col("doc_id"), pairs)
        .select(col("doc_id"), col("source"))
    }),

    // quality-aware canonical selection over the SAME near-dup graph as
    // q99: keep the LONGEST member of each cluster (ties -> smallest
    // id) instead of the smallest-id convention — what production
    // pipelines actually do with duplicates
    "q528_dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minHashLshPairs(docs, col("doc_id"), col("text"),
        k = 3, numHashes = 12, numBands = 6, threshold = 0.35)
      graft.operators.Curation.keepBestPerCluster(
        docs, col("doc_id"), col("n_chars"), pairs)
    })
  )

  // DuckDB 60-bit md5 hash, shingles, and tokens shared across oracles.
  private val H60 = (x: String) => s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"
  private val TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"
  private val SHINGLES =
    s"""SELECT doc_id,
          list_distinct([array_to_string(toks[i:i+2], ' ')
                         for i in range(1, greatest(len(toks) - 2, 0) + 1)]) AS shingles
        FROM (SELECT doc_id, $TOKS AS toks FROM documents)"""

  /** CTE chain producing the per-doc LSH band table `band`
    * (doc_id, shingles, bucket). */
  private val MINHASH_BAND_CTES =
    s"""sh AS ($SHINGLES),
        f AS (SELECT * FROM sh WHERE len(shingles) > 0),
        sig AS (
          -- universal MinHash family over one md5 per shingle:
          -- slot j = min((a_j*(h60(s)%p) + b_j) % p), p = 2^31-1
          SELECT doc_id, shingles,
            [list_min(list_transform(shingles, s ->
               (((j*2654435761) % 2147483647) * (${H60("s")} % 2147483647)
                + ((j*913841963) % 2147483647)) % 2147483647))
             for j in range(1, 13)] AS sig
          FROM f),
        band AS (
          SELECT doc_id, shingles,
            unnest([md5(CAST(b AS VARCHAR) || '|' ||
                        array_to_string(sig[CAST(b*2+1 AS INT):CAST(b*2+2 AS INT)], ','))
                    for b in range(0, 6)]) AS bucket
          FROM sig)"""

  /** [[MINHASH_BAND_CTES]] + the self-join candidate table `cand`
    * (id_a, id_b, sh_a, sh_b) — shared by q24 (pair list) and q86/q111
    * (connected components over the pairs). */
  private[queries] val MINHASH_PAIR_CTES =
    s"""$MINHASH_BAND_CTES,
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
            a.shingles AS sh_a, b.shingles AS sh_b
          FROM band a JOIN band b ON a.bucket = b.bucket AND a.doc_id < b.doc_id)"""

  // Fellegi-Sunter oracle building blocks (q306 + the q321 ER pipeline):
  // blocked customer pairs -> 8-row agreement-pattern table -> unrolled
  // EM iterations, every arithmetic step mirroring the Spark op order.
  private def fsLm(i: Int) = s"(CASE WHEN g$i = 1 THEN m$i ELSE 1.0 - m$i END)"
  private def fsLu(i: Int) = s"(CASE WHEN g$i = 1 THEN u$i ELSE 1.0 - u$i END)"
  private val FS_PM = s"p * ${fsLm(1)} * ${fsLm(2)} * ${fsLm(3)}"
  private val FS_PU = s"(1.0 - p) * ${fsLu(1)} * ${fsLu(2)} * ${fsLu(3)}"
  private def fsDec9(x: String) = s"CAST(round($x, 9) AS DECIMAL(38,9))"
  private def fsIter(e: String, st: String, prev: String, next: String) =
    s"""$e AS (SELECT pat.*, ($FS_PM) / (($FS_PM) + ($FS_PU)) AS w
               FROM pat CROSS JOIN $prev),
        $st AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                  sum(${fsDec9("n * w")}) AS nw,
                  sum(${fsDec9("n * (1.0 - w)")}) AS nv,
                  sum(${fsDec9("n * w * g1")}) AS nwg1,
                  sum(${fsDec9("n * w * g2")}) AS nwg2,
                  sum(${fsDec9("n * w * g3")}) AS nwg3,
                  sum(${fsDec9("n * (1.0 - w) * g1")}) AS nvg1,
                  sum(${fsDec9("n * (1.0 - w) * g2")}) AS nvg2,
                  sum(${fsDec9("n * (1.0 - w) * g3")}) AS nvg3
                FROM $e),
        $next AS (SELECT
            CAST(nw AS DOUBLE) / CAST(nn AS DOUBLE) AS p,
            CAST(nwg1 AS DOUBLE) / CAST(nw AS DOUBLE) AS m1,
            CAST(nwg2 AS DOUBLE) / CAST(nw AS DOUBLE) AS m2,
            CAST(nwg3 AS DOUBLE) / CAST(nw AS DOUBLE) AS m3,
            CAST(nvg1 AS DOUBLE) / CAST(nv AS DOUBLE) AS u1,
            CAST(nvg2 AS DOUBLE) / CAST(nv AS DOUBLE) AS u2,
            CAST(nvg3 AS DOUBLE) / CAST(nv AS DOUBLE) AS u3
          FROM $st)"""
  /** prof/c/cpairs/pat/p0: the blocked pair + pattern-count CTE chain.
    * `cpairs` keeps the per-pair keys and agreement bits so the ER
    * pipeline can join pattern weights back to pairs. */
  private val FS_BASE_CTES =
    """prof AS (SELECT o_custkey, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                 AS BIGINT) AS cents,
               max(o_orderpriority) AS maxprio
             FROM orders GROUP BY 1),
      c AS (SELECT c_custkey, c_mktsegment AS seg, c_nationkey AS nat,
                   cents // 5000000 AS b1, n_orders, maxprio
            FROM customer JOIN prof ON c_custkey = o_custkey),
      cpairs AS (SELECT a.c_custkey AS ka, b.c_custkey AS kb,
                   CASE WHEN a.b1 = b.b1 THEN 1 ELSE 0 END AS g1,
                   CASE WHEN abs(a.n_orders - b.n_orders) <= 1 THEN 1 ELSE 0
                     END AS g2,
                   CASE WHEN a.maxprio = b.maxprio THEN 1 ELSE 0 END AS g3
                 FROM c a JOIN c b ON a.seg = b.seg AND a.nat = b.nat
                                  AND a.c_custkey < b.c_custkey),
      pat AS (SELECT g1, g2, g3, count(*) AS n
              FROM cpairs GROUP BY 1, 2, 3),
      p0 AS (SELECT CAST(0.1 AS DOUBLE) AS p,
                    CAST(0.9 AS DOUBLE) AS m1, CAST(0.9 AS DOUBLE) AS m2,
                    CAST(0.9 AS DOUBLE) AS m3,
                    CAST(0.1 AS DOUBLE) AS u1, CAST(0.1 AS DOUBLE) AS u2,
                    CAST(0.1 AS DOUBLE) AS u3)"""

  private[queries] val PAIR_JACCARD =
    """CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) /
       (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)))"""

  /** dHash bit terms: pixel (r, c) = hex byte c of md5(text || ':' || r);
    * bit (r*8+c) set when pixel (r, c+1) > pixel (r, c). Mirrors
    * Multimodal.dHash56 bit-exactly. */
  private val DHASH: String = {
    def pix(r: Int, c: Int) =
      s"CAST(('0x' || substr(md5(text || ':$r'), ${2 * c + 1}, 2)) AS BIGINT)"
    (for { r <- 0 until 7; c <- 0 until 8 } yield
      s"CASE WHEN ${pix(r, c + 1)} > ${pix(r, c)} THEN ${1L << (r * 8 + c)} ELSE 0 END")
      .mkString("\n             + ")
  }

  /** Shared 2-iteration label-propagation CTE chain (q167 + the q365
    * modularity readout): neighbor-majority labels with min tiebreak. */
  private val LP_CTES =
    """t AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS p
             FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       e AS (SELECT c AS u, p AS v FROM t UNION SELECT p, c FROM t),
       nodes AS (SELECT DISTINCT u AS node FROM e),
       l0 AS (SELECT node, node AS label FROM nodes),
       v1 AS (SELECT e.u, l0.label, count(*) AS cnt
              FROM e JOIN l0 ON e.v = l0.node GROUP BY 1, 2),
       w1 AS (SELECT u AS node, label FROM (
                SELECT u, label, row_number() OVER (
                  PARTITION BY u ORDER BY cnt DESC, label) AS rn FROM v1)
              WHERE rn = 1),
       l1 AS (SELECT nodes.node, coalesce(w1.label, nodes.node) AS label
              FROM nodes LEFT JOIN w1 USING (node)),
       v2 AS (SELECT e.u, l1.label, count(*) AS cnt
              FROM e JOIN l1 ON e.v = l1.node GROUP BY 1, 2),
       w2 AS (SELECT u AS node, label FROM (
                SELECT u, label, row_number() OVER (
                  PARTITION BY u ORDER BY cnt DESC, label) AS rn FROM v2)
              WHERE rn = 1)"""

  val oracles: Map[String, String] = Map(
    "q419_bounded_edit_pairs" ->
      """WITH t AS (SELECT DISTINCT p_type AS nm FROM part),
          k AS (SELECT nm, str_split(nm, ' ')[1] AS w1 FROM t),
          pr AS (SELECT x.nm AS a, y.nm AS b
                 FROM k x JOIN k y ON x.w1 = y.w1 AND x.nm < y.nm),
          d AS (SELECT CAST(least(levenshtein(a, b), 4) AS BIGINT) AS dist
                FROM pr)
         SELECT dist, count(*) AS n_pairs
         FROM d WHERE dist <= 3 GROUP BY dist""",
    "q238_dup_rate_by_source" ->
      s"""WITH $MINHASH_PAIR_CTES,
          pr AS (SELECT id_a, id_b FROM cand WHERE $PAIR_JACCARD >= 0.35),
          dup AS (SELECT DISTINCT doc_id FROM
                  (SELECT id_a AS doc_id FROM pr
                   UNION ALL SELECT id_b FROM pr))
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_with_dup,
                 ROUND(CAST(sum(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                     AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_rate
          FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
          GROUP BY source""",

    "q158_image_dhash_neardup" ->
      s"""WITH h AS (
            SELECT doc_id,
              $DHASH AS dhash
            FROM documents)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
          FROM h a JOIN h b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""",

    "q159_fuzzy_match" ->
      """WITH c AS (
            SELECT p_partkey AS canon_id,
              list_distinct(regexp_split_to_array(lower(trim(p_name)), '\s+')) AS ct
            FROM part WHERE p_partkey % 2 = 0),
          p AS (
            SELECT p_partkey AS probe_id,
              list_distinct(regexp_split_to_array(lower(trim(p_name)), '\s+')) AS pt
            FROM part WHERE p_partkey % 2 = 1),
          cand AS (
            SELECT DISTINCT probe_id, canon_id
            FROM (SELECT probe_id, unnest(pt) AS tok FROM p) pp
            JOIN (SELECT canon_id, unnest(ct) AS tok FROM c) cc USING (tok)),
          scored AS (
            SELECT probe_id, canon_id,
              CAST(len(list_intersect(pt, ct)) AS DOUBLE) /
                (len(pt) + len(ct) - len(list_intersect(pt, ct))) AS j
            FROM cand JOIN p USING (probe_id) JOIN c USING (canon_id))
          SELECT probe_id, canon_id, ROUND(j, 6) AS jaccard,
            CAST(row_number() OVER (
              PARTITION BY probe_id ORDER BY j DESC, canon_id) AS INT) AS rank
          FROM scored
          WHERE j >= 0.65
          QUALIFY rank <= 3""",

    "q256_fuzzy_join_topk" ->
      """WITH c AS (
            SELECT p_partkey AS canon_id,
              list_distinct(regexp_split_to_array(lower(trim(p_name)), '\s+')) AS ct
            FROM part WHERE p_partkey % 2 = 0),
          p AS (
            SELECT p_partkey AS probe_id,
              list_distinct(regexp_split_to_array(lower(trim(p_name)), '\s+')) AS pt
            FROM part WHERE p_partkey % 20 = 1),
          cand AS (
            SELECT DISTINCT probe_id, canon_id
            FROM (SELECT probe_id, unnest(pt) AS tok FROM p) pp
            JOIN (SELECT canon_id, unnest(ct) AS tok FROM c) cc USING (tok)),
          scored AS (
            SELECT probe_id, canon_id,
              CAST(len(list_intersect(pt, ct)) AS DOUBLE) /
                (len(pt) + len(ct) - len(list_intersect(pt, ct))) AS j
            FROM cand JOIN p USING (probe_id) JOIN c USING (canon_id))
          SELECT probe_id, canon_id, ROUND(j, 6) AS jaccard,
            CAST(row_number() OVER (
              PARTITION BY probe_id ORDER BY j DESC, canon_id) AS INT) AS rank
          FROM scored
          WHERE j >= 0.5
          QUALIFY rank <= 3""",

    "q190_triangle_count" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 40),
          e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                 FROM li a JOIN li b
                   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
          SELECT (SELECT count(DISTINCT n)
                  FROM (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)) AS n_nodes,
                 (SELECT count(*) FROM e0) AS n_edges,
                 (SELECT count(*) FROM e0 x
                    JOIN e0 y ON y.a = x.a AND y.b > x.b
                    JOIN e0 z ON z.a = x.b AND z.b = y.b) AS n_triangles""",

    "q552_random_walks" -> {
      def seed(step: Int, cur: String) =
        s"'walk:' || CAST(start AS VARCHAR) || ':$step:' || CAST($cur AS VARCHAR)"
      def hop(step: Int, prevCte: String, cur: String, cols: String) =
        s"""w$step AS (SELECT $prevCte.start, $cols a.d AS n$step
            FROM $prevCte LEFT JOIN adj a
            ON a.s = $prevCte.$cur
              AND a.rn = ${H60(seed(step, s"$prevCte.$cur"))} % a.odeg + 1)"""
      s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                      WHERE l_quantity > 40),
          e0 AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
                 FROM li a JOIN li b
                   ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey),
          e AS (SELECT pa AS s, pb AS d FROM e0
                UNION SELECT pb, pa FROM e0),
          adj AS (SELECT s, d, row_number() OVER (
                    PARTITION BY s ORDER BY d) AS rn,
                  count(*) OVER (PARTITION BY s) AS odeg FROM e),
          n0 AS (SELECT s AS start FROM e UNION SELECT d FROM e),
          ${hop(1, "n0", "start", "")},
          ${hop(2, "w1", "n1", "w1.n1,")},
          ${hop(3, "w2", "n2", "w2.n1, w2.n2,")}
         SELECT start, n1, n2, n3 FROM w3"""
    },

    "q532_ktruss" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                     WHERE l_quantity > 40),
          e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                 FROM li a JOIN li b
                   ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey),
          t0 AS (SELECT x.a AS u, x.b AS v, y.b AS w
                 FROM e0 x JOIN e0 y ON y.a = x.a AND y.b > x.b
                   JOIN e0 z ON z.a = x.b AND z.b = y.b),
          s0 AS (SELECT a, b, count(*) AS supp FROM (
                   SELECT u AS a, v AS b FROM t0
                   UNION ALL SELECT u, w FROM t0
                   UNION ALL SELECT v, w FROM t0)
                 GROUP BY 1, 2),
          e1 AS (SELECT a, b FROM s0 WHERE supp >= 2),
          t1 AS (SELECT x.a AS u, x.b AS v, y.b AS w
                 FROM e1 x JOIN e1 y ON y.a = x.a AND y.b > x.b
                   JOIN e1 z ON z.a = x.b AND z.b = y.b),
          s1 AS (SELECT a, b, count(*) AS supp FROM (
                   SELECT u AS a, v AS b FROM t1
                   UNION ALL SELECT u, w FROM t1
                   UNION ALL SELECT v, w FROM t1)
                 GROUP BY 1, 2)
         SELECT a, b, supp FROM s1 WHERE supp >= 2""",

    "q142_pagerank" ->
      """WITH t AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS p
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          e AS (SELECT c AS src, p AS dst FROM t
                UNION SELECT p AS src, c AS dst FROM t),
          deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
          nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          nn AS (SELECT count(*) AS n FROM nodes),
          p0 AS (SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN nn),
          c1 AS (SELECT dst AS node, sum(pr / outdeg) AS m
                 FROM e JOIN deg USING (src) JOIN p0 ON e.src = p0.node
                 GROUP BY 1),
          p1 AS (SELECT nodes.node, 0.15 / n + 0.85 * coalesce(m, 0) AS pr
                 FROM nodes CROSS JOIN nn LEFT JOIN c1 USING (node)),
          c2 AS (SELECT dst AS node, sum(pr / outdeg) AS m
                 FROM e JOIN deg USING (src) JOIN p1 ON e.src = p1.node
                 GROUP BY 1),
          p2 AS (SELECT nodes.node, 0.15 / n + 0.85 * coalesce(m, 0) AS pr
                 FROM nodes CROSS JOIN nn LEFT JOIN c2 USING (node)),
          c3 AS (SELECT dst AS node, sum(pr / outdeg) AS m
                 FROM e JOIN deg USING (src) JOIN p2 ON e.src = p2.node
                 GROUP BY 1),
          p3 AS (SELECT nodes.node, 0.15 / n + 0.85 * coalesce(m, 0) AS pr
                 FROM nodes CROSS JOIN nn LEFT JOIN c3 USING (node))
          SELECT node, ROUND(pr * n, 6) AS pr_scaled FROM p3 CROSS JOIN nn""",

    "q167_label_propagation" ->
      s"""WITH $LP_CTES
          SELECT nodes.node, coalesce(w2.label, nodes.node) AS label
          FROM nodes LEFT JOIN w2 USING (node)""",

    "q365_modularity" ->
      s"""WITH $LP_CTES,
          lab AS (SELECT nodes.node, coalesce(w2.label, nodes.node) AS label
                  FROM nodes LEFT JOIN w2 USING (node)),
          el AS (SELECT e.u, e.v, a.label AS lu, b.label AS lv
                 FROM e JOIN lab a ON e.u = a.node
                        JOIN lab b ON e.v = b.node),
          wi AS (SELECT lu AS label, count(*) AS w FROM el
                 WHERE lu = lv GROUP BY 1),
          degs AS (SELECT lab.label, CAST(sum(cnt) AS BIGINT) AS dc
                   FROM (SELECT u AS node, count(*) AS cnt FROM e GROUP BY u)
                        dd JOIN lab ON dd.node = lab.node
                   GROUP BY lab.label),
          tot AS (SELECT count(*) AS E FROM e),
          terms AS (SELECT CAST(CAST(coalesce(wi.w, 0) AS DOUBLE) / tot.E
                      - (CAST(degs.dc AS DOUBLE) / tot.E)
                        * (CAST(degs.dc AS DOUBLE) / tot.E)
                      AS DECIMAL(18,12)) AS term
                    FROM degs LEFT JOIN wi USING (label), tot)
         SELECT CAST(count(*) AS BIGINT) AS n_communities,
                ROUND(CAST(sum(term) AS DOUBLE), 6) AS modularity
         FROM terms""",

    "q22_dedup_exact" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS keeper_id, count(*) AS n_docs
         FROM documents GROUP BY 1""",

    // skeleton fold generated from the SAME confusable table the Spark
    // side translates with; DuckDB regexp_replace needs the explicit
    // 'g' flag (Spark's is global by default)
    "q526_homoglyph_evasion" -> {
      import graft.functions.TextAnalysis
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         ev AS (SELECT doc_id + 1000000 AS doc_id,
                  translate(text, 'aeopcxy', 'аеорсху') || '​' AS text
                FROM docs WHERE doc_id % 37 = 0),
         a AS (SELECT * FROM docs UNION ALL SELECT * FROM ev),
         h AS (SELECT doc_id, md5(text) AS raw_md5,
                 md5(translate(
                   regexp_replace(text, '${TextAnalysis.invisibleClass}', '', 'g'),
                   '${TextAnalysis.confusableFrom}',
                   '${TextAnalysis.confusableTo}')) AS skeleton_md5
               FROM a)
         SELECT skeleton_md5, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT raw_md5) AS BIGINT) AS n_raw_variants,
           min(doc_id) AS keeper_id
         FROM h GROUP BY 1
         HAVING count(DISTINCT raw_md5) > 1"""
    },

    "q23_dedup_ngram_jaccard" ->
      s"""WITH sh AS ($SHINGLES),
          shf AS (SELECT * FROM sh WHERE len(shingles) > 0),
          ex AS (SELECT doc_id, unnest(shingles) AS s FROM shf),
          kept AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 1000),
          exk AS (SELECT ex.doc_id, ex.s FROM ex JOIN kept USING (s)),
          cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM exk a JOIN exk b ON a.s = b.s AND a.doc_id < b.doc_id)
          SELECT id_a, id_b,
            ROUND(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
                  (len(sa.shingles) + len(sb.shingles) -
                   len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
          FROM cand
            JOIN shf sa ON sa.doc_id = id_a
            JOIN shf sb ON sb.doc_id = id_b
          WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
                (len(sa.shingles) + len(sb.shingles) -
                 len(list_intersect(sa.shingles, sb.shingles))) >= 0.4""",

    "q317_sql_surface" ->
      s"""WITH p AS (SELECT p_partkey AS id, p_name AS nm,
                            str_split(p_name, ' ')[1] AS blk
                     FROM part
                     WHERE ${"CAST(('0x' || substr(md5(p_name), 1, 15)) AS BIGINT)"} % 4 = 0)
          SELECT a.id AS id_a, b.id AS id_b,
                 ROUND(jaro_winkler_similarity(a.nm, b.nm), 6) AS jw
          FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
          WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.85""",

    "q320_dedup_threshold_curve" ->
      s"""WITH $MINHASH_PAIR_CTES,
          sc AS (SELECT CAST(floor(($PAIR_JACCARD) * 10) AS INT) AS bucket
                 FROM cand),
          g AS (SELECT bucket, count(*) AS n FROM sc GROUP BY bucket)
          SELECT bucket, ROUND(CAST(bucket AS DOUBLE) / 10, 1) AS threshold,
                 n,
                 CAST(sum(n) OVER (ORDER BY bucket DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_pairs_ge
          FROM g""",

    "q315_dedup_canonicalize" ->
      s"""WITH RECURSIVE $MINHASH_PAIR_CTES,
          pairs AS (SELECT id_a, id_b FROM cand WHERE $PAIR_JACCARD >= 0.35),
          edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT a AS n FROM edges),
          reach(n, m) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m),
          comp AS (SELECT n AS doc_id, MIN(m) AS component
                   FROM reach GROUP BY n)
          SELECT component,
            min_by(comp.doc_id,
              -n_chars * 1000000000 + comp.doc_id) AS canonical_id,
            count(*) AS n_members,
            CAST(max(n_chars) AS BIGINT) AS max_chars
          FROM comp JOIN documents ON comp.doc_id = documents.doc_id
          GROUP BY component""",

    "q309_kcore_peel" -> {
      def round(i: Int) =
        s"""k$i AS (SELECT src AS node FROM e${i - 1}
                    GROUP BY src HAVING count(*) >= 3),
            e$i AS (SELECT e${i - 1}.src, e${i - 1}.dst FROM e${i - 1}
                    JOIN k$i a ON e${i - 1}.src = a.node
                    JOIN k$i b ON e${i - 1}.dst = b.node)"""
      s"""WITH t AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS p
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          e0 AS (SELECT c AS src, p AS dst FROM t
                 UNION SELECT p AS src, c AS dst FROM t),
          ${round(1)}, ${round(2)}, ${round(3)}, ${round(4)}
          SELECT src AS node, count(*) AS deg FROM e4 GROUP BY src"""
    },

    "q325_hits" -> {
      def d9(x: String) = s"CAST(round($x, 9) AS DECIMAL(38,9))"
      def iter(i: Int, prevHub: String) =
        s"""a$i AS (SELECT dst AS node,
                      CAST(sum(${d9("h")}) AS DOUBLE) AS a
                    FROM e JOIN $prevHub ph ON e.src = ph.node GROUP BY dst),
            an$i AS (SELECT nodes.node, coalesce(a, 0.0) AS a
                     FROM nodes LEFT JOIN a$i USING (node)),
            na$i AS (SELECT sqrt(CAST(sum(${d9("a * a")}) AS DOUBLE)) AS na
                     FROM an$i),
            auth$i AS (SELECT node, a / na AS a FROM an$i CROSS JOIN na$i),
            h$i AS (SELECT src AS node,
                      CAST(sum(${d9("a")}) AS DOUBLE) AS h
                    FROM e JOIN auth$i au ON e.dst = au.node GROUP BY src),
            hn$i AS (SELECT nodes.node, coalesce(h, 0.0) AS h
                     FROM nodes LEFT JOIN h$i USING (node)),
            nh$i AS (SELECT sqrt(CAST(sum(${d9("h * h")}) AS DOUBLE)) AS nh
                     FROM hn$i),
            hub$i AS (SELECT node, h / nh AS h FROM hn$i CROSS JOIN nh$i)"""
      s"""WITH t AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS p
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          e AS (SELECT c AS src, p AS dst FROM t),
          nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          hub0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS h FROM nodes),
          ${iter(1, "hub0")},
          ${iter(2, "hub1")}
          SELECT hub2.node, ROUND(hub2.h, 6) AS hub, ROUND(auth2.a, 6) AS auth
          FROM hub2 JOIN auth2 ON hub2.node = auth2.node"""
    },

    "q321_er_pipeline" ->
      s"""WITH RECURSIVE $FS_BASE_CTES,
          ${fsIter("e1", "s1", "p0", "p1")},
          ${fsIter("e2", "s2", "p1", "p2")},
          wts AS (SELECT g1, g2, g3,
                    ROUND(log2((${fsLm(1)} * ${fsLm(2)} * ${fsLm(3)}) /
                               (${fsLu(1)} * ${fsLu(2)} * ${fsLu(3)})), 6)
                      AS match_weight
                  FROM pat CROSS JOIN p2),
          edges0 AS (SELECT ka, kb FROM cpairs
                     JOIN wts USING (g1, g2, g3)
                     WHERE match_weight >= 2.0),
          edges AS (SELECT ka AS a, kb AS b FROM edges0
                    UNION SELECT kb, ka FROM edges0),
          nodes AS (SELECT DISTINCT a AS n FROM edges),
          reach(n, m) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m),
          comp AS (SELECT n AS k, MIN(m) AS component FROM reach GROUP BY n)
          SELECT component, count(*) AS n_members,
                 min(k) AS min_key, max(k) AS max_key
          FROM comp GROUP BY component""",

    "q323_split_leakage" ->
      s"""WITH $MINHASH_PAIR_CTES,
          pairs AS (SELECT id_a, id_b FROM cand WHERE $PAIR_JACCARD >= 0.35),
          sp AS (SELECT doc_id,
                   CASE WHEN ${"CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"}
                          % 1000000 < 800000
                        THEN 'train' ELSE 'test' END AS split
                 FROM documents),
          cr AS (SELECT id_a, id_b, sa.split AS sp_a, sb.split AS sp_b
                 FROM pairs
                   JOIN sp sa ON sa.doc_id = id_a
                   JOIN sp sb ON sb.doc_id = id_b
                 WHERE sa.split <> sb.split),
          leaked AS (SELECT DISTINCT CASE WHEN sp_a = 'test' THEN id_a
                                          ELSE id_b END AS doc_id
                     FROM cr),
          t AS (SELECT count(*) AS n_test FROM sp WHERE split = 'test'),
          l AS (SELECT count(*) AS n_leaked FROM leaked)
          SELECT n_test, n_leaked,
                 ROUND(CAST(n_leaked AS DOUBLE) / n_test, 6) AS leak_rate
          FROM t CROSS JOIN l""",

    "q306_fs_linkage_em" ->
      s"""WITH $FS_BASE_CTES,
          ${fsIter("e1", "s1", "p0", "p1")},
          ${fsIter("e2", "s2", "p1", "p2")}
          SELECT g1, g2, g3, n,
            ROUND(($FS_PM) / (($FS_PM) + ($FS_PU)), 6) AS w,
            ROUND(log2((${fsLm(1)} * ${fsLm(2)} * ${fsLm(3)}) /
                       (${fsLu(1)} * ${fsLu(2)} * ${fsLu(3)})), 6)
              AS match_weight
          FROM pat CROSS JOIN p2""",

    "q294_bellman_ford" ->
      """WITH RECURSIVE
          t AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS p
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          e AS (SELECT c AS src, p AS dst FROM t
                UNION SELECT p AS src, c AS dst FROM t),
          ew AS (SELECT src, dst, CAST(1 + (src + dst) % 3 AS BIGINT) AS w
                 FROM e),
          sp AS (
            SELECT CAST(c_custkey AS BIGINT) AS node, CAST(0 AS BIGINT) AS cost,
                   0 AS hop
            FROM customer WHERE c_custkey % 100 = 0
            UNION
            SELECT ew.dst, sp.cost + ew.w, sp.hop + 1
            FROM sp JOIN ew ON ew.src = sp.node WHERE sp.hop < 4
          )
          SELECT node, min(cost) AS cost FROM sp GROUP BY node""",

    "q295_minhash_estimate" ->
      s"""WITH $MINHASH_BAND_CTES,
          candp AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM band a JOIN band b ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
          SELECT id_a, id_b,
            ROUND(CAST(len(list_filter(range(1, 13), i ->
                sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)]))
              AS DOUBLE) / 12, 6) AS est_jaccard,
            ROUND(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
                  (len(sa.shingles) + len(sb.shingles) -
                   len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
          FROM candp
            JOIN sig sa ON sa.doc_id = id_a
            JOIN sig sb ON sb.doc_id = id_b""",

    "q296_source_overlap" ->
      """WITH ss AS (
           SELECT DISTINCT source AS src, s FROM (
             SELECT source,
               unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                 for i in range(1, greatest(len(toks) - 2, 0) + 1)])) AS s
             FROM (SELECT source,
                     regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                   FROM documents))),
          sizes AS (SELECT src, count(*) AS n FROM ss GROUP BY src),
          shared AS (SELECT a.src AS src_a, b.src AS src_b,
                            count(*) AS n_shared
                     FROM ss a JOIN ss b ON a.s = b.s AND a.src < b.src
                     GROUP BY 1, 2)
         SELECT src_a, src_b, n_shared, sa.n AS n_a, sb.n AS n_b,
           ROUND(CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared), 6)
             AS jaccard,
           ROUND(CAST(n_shared AS DOUBLE) / least(sa.n, sb.n), 6)
             AS containment
         FROM shared
           JOIN sizes sa ON sa.src = src_a
           JOIN sizes sb ON sb.src = src_b""",

    "q290_dedup_containment" ->
      s"""WITH sh AS ($SHINGLES),
          shf AS (SELECT * FROM sh WHERE len(shingles) > 0),
          ex AS (SELECT doc_id, unnest(shingles) AS s FROM shf),
          kept AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 1000),
          exk AS (SELECT ex.doc_id, ex.s FROM ex JOIN kept USING (s)),
          cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM exk a JOIN exk b ON a.s = b.s AND a.doc_id < b.doc_id),
          sc AS (
            SELECT id_a, id_b,
              len(list_intersect(sa.shingles, sb.shingles)) AS n_inter,
              len(sa.shingles) AS n_a, len(sb.shingles) AS n_b
            FROM cand
              JOIN shf sa ON sa.doc_id = id_a
              JOIN shf sb ON sb.doc_id = id_b)
          SELECT id_a, id_b,
            ROUND(CAST(n_inter AS DOUBLE) / n_a, 6) AS cont_a,
            ROUND(CAST(n_inter AS DOUBLE) / n_b, 6) AS cont_b
          FROM sc
          WHERE ROUND(CAST(n_inter AS DOUBLE) / n_a, 6) >= 0.5
             OR ROUND(CAST(n_inter AS DOUBLE) / n_b, 6) >= 0.5""",

    "q24_dedup_minhash_lsh" ->
      s"""WITH $MINHASH_PAIR_CTES
          SELECT id_a, id_b, ROUND($PAIR_JACCARD, 6) AS jaccard
          FROM cand
          WHERE $PAIR_JACCARD >= 0.35""",

    "q262_blocking_quality" ->
      s"""WITH $MINHASH_PAIR_CTES,
          nd AS (SELECT count(*) AS n_docs FROM f),
          nc AS (SELECT count(*) AS n_candidates FROM cand),
          exp AS (SELECT doc_id, shingles, unnest(shingles) AS s FROM f
                  WHERE doc_id % 2 = 0),
          cold AS (SELECT s FROM exp GROUP BY s HAVING count(*) <= 1000),
          expc AS (SELECT exp.* FROM exp JOIN cold USING (s)),
          tcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.shingles AS sh_a, b.shingles AS sh_b
                    FROM expc a JOIN expc b
                      ON a.s = b.s AND a.doc_id < b.doc_id),
          truth AS (SELECT id_a, id_b FROM tcand
                    WHERE $PAIR_JACCARD >= 0.35),
          nt AS (SELECT count(*) AS n_true FROM truth),
          -- found = TRUTH pairs the banding proposed (mirror of the
          -- Spark semi-join; never re-scored from the cand side)
          nf AS (SELECT count(*) AS n_found
                 FROM truth JOIN (SELECT DISTINCT id_a, id_b FROM cand) c
                 USING (id_a, id_b))
          SELECT n_docs, CAST(n_docs * (n_docs - 1) // 2 AS BIGINT) AS n_total_pairs,
            n_candidates, n_true, n_found,
            ROUND(1.0 - CAST(n_candidates AS DOUBLE)
              / CAST(greatest(n_docs * (n_docs - 1) // 2, 1) AS DOUBLE), 6)
              AS reduction_ratio,
            ROUND(CAST(n_found AS DOUBLE)
              / CAST(greatest(n_true, 1) AS DOUBLE), 6) AS pair_completeness
          FROM nd, nc, nf, nt""",

    "q520_lsh_power_planner" ->
      """WITH grid AS (SELECT CAST(k AS DOUBLE) / 20.0 AS s
                       FROM range(1, 20) t(k)),
          cfg AS (SELECT * FROM (VALUES (6, 2), (4, 3), (3, 4)) c(b, r)),
          rows_ AS (SELECT s, b, r,
                      CASE WHEN r = 2 THEN s * s
                           WHEN r = 3 THEN s * s * s
                           ELSE s * s * s * s END AS p_band_raw
                    FROM grid CROSS JOIN cfg),
          m AS (SELECT s, b, r, p_band_raw,
                  CASE WHEN b = 6 THEN
                    (1.0 - p_band_raw) * (1.0 - p_band_raw) * (1.0 - p_band_raw)
                      * (1.0 - p_band_raw) * (1.0 - p_band_raw) * (1.0 - p_band_raw)
                  WHEN b = 4 THEN
                    (1.0 - p_band_raw) * (1.0 - p_band_raw)
                      * (1.0 - p_band_raw) * (1.0 - p_band_raw)
                  ELSE (1.0 - p_band_raw) * (1.0 - p_band_raw) * (1.0 - p_band_raw)
                  END AS miss
                FROM rows_)
          SELECT s, b, r, ROUND(p_band_raw, 6) AS p_band,
            ROUND(1.0 - miss, 6) AS p_detect
          FROM m""",

    "q515_bcubed_cluster_eval" ->
      s"""WITH RECURSIVE $MINHASH_PAIR_CTES,
          pairs AS (SELECT id_a, id_b FROM cand WHERE $PAIR_JACCARD >= 0.35),
          edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT a AS n FROM edges),
          reach(n, m) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m),
          comp AS (SELECT n AS doc_id, MIN(m) AS component
                   FROM reach GROUP BY n),
          assign AS (SELECT d.doc_id, md5(d.text) AS gold,
                       coalesce(c.component, d.doc_id) AS sys
                     FROM documents d LEFT JOIN comp c USING (doc_id)),
          cell AS (SELECT sys, gold, count(*) AS nab
                   FROM assign GROUP BY 1, 2),
          nb AS (SELECT sys, CAST(sum(nab) AS BIGINT) AS nbs
                 FROM cell GROUP BY 1),
          na AS (SELECT gold, CAST(sum(nab) AS BIGINT) AS nas
                 FROM cell GROUP BY 1),
          terms AS (SELECT
                      CAST(CAST(nab * nab AS DOUBLE) / CAST(nbs AS DOUBLE)
                        AS DECIMAL(28,12)) AS tp,
                      CAST(CAST(nab * nab AS DOUBLE) / CAST(nas AS DOUBLE)
                        AS DECIMAL(28,12)) AS tr
                    FROM cell JOIN nb USING (sys) JOIN na USING (gold)),
          tot AS (SELECT count(*) AS n, count(DISTINCT sys) AS n_sys,
                    count(DISTINCT gold) AS n_gold
                  FROM assign),
          ssum AS (SELECT sum(tp) AS sp, sum(tr) AS sr FROM terms)
          SELECT n AS n_docs, n_sys, n_gold,
            ROUND(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE), 6) AS bcubed_p,
            ROUND(CAST(sr AS DOUBLE) / CAST(n AS DOUBLE), 6) AS bcubed_r,
            ROUND(2.0 * (CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))
              / (CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)
                 + CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS bcubed_f1
          FROM ssum, tot""",

    "q558_neardup_explain" ->
      s"""WITH $MINHASH_PAIR_CTES,
          sc AS (SELECT id_a, id_b,
                   $PAIR_JACCARD AS jac,
                   list_sort(list_intersect(sh_a, sh_b)) AS shared
                 FROM cand),
          kept AS (SELECT id_a, id_b, jac, shared FROM sc WHERE jac >= 0.35)
         SELECT id_a, id_b, ROUND(jac, 6) AS jaccard,
                CAST(len(shared) AS INT) AS n_shared,
                CAST(i AS INT) AS rnk,
                shared[CAST(i AS INT)] AS shingle
         FROM kept, LATERAL (SELECT unnest(range(1,
           least(len(shared), 3) + 1)) AS i)""",

    "q557_dedup_savings" ->
      s"""WITH RECURSIVE $MINHASH_PAIR_CTES,
          pairs AS (SELECT id_a, id_b FROM cand WHERE $PAIR_JACCARD >= 0.35),
          edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT a AS n FROM edges),
          reach(n, m) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m),
          comp AS (SELECT n AS doc_id, MIN(m) AS component
                   FROM reach GROUP BY n),
          cl AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
                 FROM comp GROUP BY 1),
          st AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters,
                        CAST(sum(sz) AS BIGINT) AS docs_in_clusters,
                        CAST(max(sz) AS BIGINT) AS max_cluster FROM cl),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
         SELECT n_docs, docs_in_clusters, n_clusters, max_cluster,
                docs_in_clusters - n_clusters AS n_dropped,
                ROUND(CAST(docs_in_clusters - n_clusters AS DOUBLE) /
                  CAST(n_docs AS DOUBLE), 6) AS savings_rate
         FROM st CROSS JOIN tot""",

    "q86_dedup_components" ->
      s"""WITH RECURSIVE $MINHASH_PAIR_CTES,
          pairs AS (SELECT id_a, id_b FROM cand WHERE $PAIR_JACCARD >= 0.35),
          edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT a AS n FROM edges),
          reach(n, m) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m)
          SELECT n AS doc_id, MIN(m) AS component FROM reach GROUP BY n""",

    "q114_dedup_against_corpus" ->
      s"""WITH $MINHASH_BAND_CTES,
          cn AS (SELECT * FROM band WHERE doc_id % 5 = 0),
          co AS (SELECT * FROM band WHERE doc_id % 5 <> 0),
          cand AS (
            SELECT DISTINCT a.doc_id AS id_new, a.shingles AS sh_a,
              b.doc_id AS id_old, b.shingles AS sh_b
            FROM cn a JOIN co b ON a.bucket = b.bucket),
          dup AS (SELECT DISTINCT id_new FROM cand
                  WHERE $PAIR_JACCARD >= 0.35)
          SELECT doc_id, source FROM documents
          WHERE doc_id % 5 = 0
            AND doc_id NOT IN (SELECT id_new FROM dup)""",

    // identical ground truth to q86 — the star algorithm must produce
    // byte-identical clusters to label propagation
    "q111_dedup_components_star" ->
      s"""WITH RECURSIVE $MINHASH_PAIR_CTES,
          pairs AS (SELECT id_a, id_b FROM cand WHERE $PAIR_JACCARD >= 0.35),
          edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT a AS n FROM edges),
          reach(n, m) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m)
          SELECT n AS doc_id, MIN(m) AS component FROM reach GROUP BY n""",

    "q99_dedup_drop_neardups" ->
      s"""WITH RECURSIVE $MINHASH_PAIR_CTES,
          pairs AS (SELECT id_a, id_b FROM cand WHERE $PAIR_JACCARD >= 0.35),
          edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT a AS n FROM edges),
          reach(n, m) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m),
          losers AS (
            SELECT n AS doc_id FROM reach GROUP BY n HAVING n <> MIN(m))
          SELECT d.doc_id, d.source FROM documents d
          WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)""",

    // same transitive closure as q99; keeper = longest member, ties to
    // the smallest id (the Spark side's max_by(doc_id, (q, -id)))
    "q528_dedup_keep_best" ->
      s"""WITH RECURSIVE $MINHASH_PAIR_CTES,
          pairs AS (SELECT id_a, id_b FROM cand WHERE $PAIR_JACCARD >= 0.35),
          edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT a AS n FROM edges),
          reach(n, m) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m),
          comp AS (SELECT n AS doc_id, MIN(m) AS cluster
                   FROM reach GROUP BY n),
          k AS (SELECT cluster, doc_id AS keeper_id,
                  ROW_NUMBER() OVER (PARTITION BY cluster
                    ORDER BY d.n_chars DESC, doc_id) AS rn
                FROM comp JOIN documents d USING (doc_id))
          SELECT c.doc_id, c.cluster, k.keeper_id,
            c.doc_id = k.keeper_id AS kept
          FROM comp c JOIN k ON c.cluster = k.cluster AND k.rn = 1""",

    "q25_dedup_simhash" ->
      s"""WITH th AS (
            SELECT doc_id,
              list_transform(list_distinct($TOKS), t -> ${H60("t")}) AS th
            FROM documents),
          sig AS (
            SELECT doc_id,
              CAST(list_sum(list_transform(range(0, 60), j ->
                CASE WHEN list_sum(list_transform(th, h ->
                       CASE WHEN (h >> CAST(j AS INT)) % 2 = 1 THEN 1 ELSE -1 END)) > 0
                     THEN CAST(power(2, j) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
            FROM th),
          chunks AS (
            SELECT doc_id, simhash, c,
              (simhash >> CAST(c * 15 AS INT)) % 32768 AS chunk
            FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS c) t)
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
          FROM chunks a
            JOIN chunks b ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 2"""
  )
}
