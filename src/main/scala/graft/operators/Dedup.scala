package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis.{tokens, hash60, contentHash}

/** Corpus deduplication operators for training-data pipelines: exact
  * (hash-groupBy), n-gram Jaccard (shingle-share join, exact), MinHash+LSH
  * (band-bucket join, approximate candidate generation), and SimHash
  * (bit-chunk blocking). All hash functions are md5-derived so the whole
  * pipeline — including the approximate ones — replays bit-identically in
  * the DuckDB differential oracle.
  *
  * Scale design (100 TB): every pipeline is
  *   row-local signature → explode to (bucket, doc) → shuffle on bucket →
  *   within-bucket pair join → exact verify,
  * i.e. one wide shuffle keyed on content-derived buckets, never an
  * all-pairs product. Hot shingle buckets are capped by document
  * frequency before the candidate join (maxShingleDocFreq).
  *
  * Cache lifecycle: the signature/shingle tables feeding multiple plan
  * branches are persist()ed (recomputing them would inline one md5 pass
  * per branch) and stay in executor storage until the caller releases
  * them — materialize the result, then `spark.catalog.clearCache()` (as
  * Bench/Verify do between queries) or `unpersist` the inputs. A
  * resident service should treat one dedup pass as
  * materialize-then-release.
  */
object Dedup {

  /** The checkpointed RDD behind a `localCheckpoint()`ed frame (its plan
    * is a LogicalRDD leaf) — lets iterative loops free a superseded
    * round's blocks deterministically without guessing at persistent-RDD
    * ids, which could catch persisted INPUTS materialized by the same
    * job (measured: unpersisting the LSH pair table this way forced a
    * full recompute and a 4x slowdown of the star-CC query). */
  private def checkpointedRdd(df: DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Distinct word k-gram shingles of lowercased whitespace tokens.
    * Guarded so fewer than k tokens yields an empty array (Spark's
    * `sequence(1, n)` with n < 1 would count DOWN, not empty).
    *
    * PERF HAZARD: the slice inside the transform lambda re-evaluates
    * `toks` PER SHINGLE POSITION (Catalyst does no CSE across lambda
    * boundaries), so calling this with an inline `tokens(text)`
    * expression is O(tokens²) per doc — measured 50x slower than the
    * attribute form at sf0.1. Pass a MATERIALIZED token-array column
    * (see [[shingleFrame]]), or accept the inline cost only for tiny
    * frames/tests. */
  def wordShingles(text: Column, k: Int): Column = wordShinglesOf(tokens(text), k)

  /** Shingles over an (ideally materialized) token-array column. */
  def wordShinglesOf(toks: Column, k: Int): Column =
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - (k - 1)),
          i => array_join(slice(toks, i, lit(k)), " ")))
        .otherwise(array().cast("array<string>")))

  /** (doc, shingles) frame with the token array materialized in its own
    * projection. The middle select references `__toks` three times, so
    * CollapseProject cannot re-inline the split into the lambda body —
    * shingling stays O(tokens) per doc.
    *
    * The non-empty filter is `size(tokens) >= k` (equivalent to
    * `size(shingles) > 0` by construction) and sits BEFORE the shingle
    * projection: a filter on `shingles` would be pushed down past the
    * projection, re-inlining the whole O(tokens²) shingle lambda into
    * the scan's filter predicate — the same CSE trap, resurfacing
    * through predicate pushdown. */
  def shingleFrame(df: DataFrame, id: Column, text: Column, k: Int): DataFrame =
    // spread the raw (id, text) rows before tokenizing: the corpus
    // arrives as single-row-group parquet, so without the (narrow,
    // text-column-only) exchange the ICU tokenization + shingle build
    // of the WHOLE corpus pipelines into the one-task scan stage and
    // runs on one core — guide §2.5's unsplittable-input fix. No-op at
    // cluster scale (see Tables.spreadIfNarrow). Measured at sf0.1:
    // q262 7.05 s → 3.93 s best-of-2 (and cold q24 42.7 s → 2.2 s).
    graft.sources.Tables.spreadIfNarrow(
        df.select(id.as("doc"), text.as("__txt")))
      .select(col("doc"), tokens(col("__txt")).as("__toks"))
      .where(size(col("__toks")) >= k)
      .select(col("doc"), col("__toks"), wordShinglesOf(col("__toks"), k).as("shingles"))
      .drop("__toks")

  /** Exact dedup: group identical content by md5, keep the smallest id
    * as the canonical representative. One shuffle on the digest. */
  def exactGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(contentHash(text).as("content_md5"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n_docs"))

  /** N-gram Jaccard near-dup pairs via shingle-share join with a
    * stop-shingle frequency cap. Candidates: pairs of docs co-occurring
    * in at least one shingle whose document frequency is <= `maxShingleDocFreq`;
    * verification: exact Jaccard over the FULL (uncapped) shingle sets.
    * Recall guarantee: any pair with J >= t sharing at least one non-hot
    * shingle is found — the cap only loses pairs whose every common
    * shingle occurs in more than `maxShingleDocFreq` docs (stop-phrase
    * boilerplate, which is exactly what should not define near-dups).
    * Scale: a shingle in m docs produces m^2 candidate rows; without the
    * cap one boilerplate trigram at 100 TB is a job-killer. */
  def jaccardPairs(df: DataFrame, id: Column, text: Column, k: Int, threshold: Double,
                   maxShingleDocFreq: Int = 1000): DataFrame =
    sharedShingleCounts(df, id, text, k, maxShingleDocFreq)
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)

  /** Directed shingle CONTAINMENT per candidate pair: |A∩B|/|A| and
    * |A∩B|/|B| — the asymmetric companion to Jaccard that catches a
    * short doc wholly embedded in a long one (quote farms, wrapper
    * pages, prompt-in-completion contamination), which Jaccard misses
    * because the union is dominated by the long side. Same candidate
    * generation + hot-shingle cap as [[jaccardPairs]] (shared core), so
    * the same scale guarantees hold. Keeps pairs where EITHER direction
    * clears `threshold`. */
  def containmentPairs(df: DataFrame, id: Column, text: Column, k: Int,
                       threshold: Double,
                       maxShingleDocFreq: Int = 1000): DataFrame =
    sharedShingleCounts(df, id, text, k, maxShingleDocFreq)
      .select(col("id_a"), col("id_b"),
        round(col("n_inter").cast("double") / col("n_a"), 6).as("cont_a"),
        round(col("n_inter").cast("double") / col("n_b"), 6).as("cont_b"))
      .where(col("cont_a") >= threshold || col("cont_b") >= threshold)

  /** Shared pair core for [[jaccardPairs]] / [[containmentPairs]]:
    * (id_a, id_b, n_inter, n_a, n_b) over every candidate pair sharing
    * at least one non-hot shingle, with the exact intersection size
    * (hot shares added back from bounded per-doc hot arrays). */
  private def sharedShingleCounts(df: DataFrame, id: Column, text: Column,
                                  k: Int, maxShingleDocFreq: Int): DataFrame = {
    // persist: the shingle table feeds four independent branches
    // (frequency count, anti-join, self-join, per-doc arrays); without
    // it each branch would recompute the shingling per reference
    val sh = shingleFrame(df, id, text, k).persist()
    val exploded = sh.select(col("doc"), explode(col("shingles")).as("s"))
    // hot = shingles in more than maxShingleDocFreq docs. Bounded by
    // (total shingle occurrences / cap), so the set is small — its
    // per-doc projection below is a short array per row.
    val hot = exploded.groupBy(col("s")).agg(count(lit(1)).as("df_s"))
      .where(col("df_s") > maxShingleDocFreq)
      .select(col("s"))
    val ex = exploded.join(hot, Seq("s"), "left_anti")
    // one-pass shared-shingle count over NON-hot shingles only; the
    // within-candidate hot shares are added back from the small per-doc
    // hot arrays, so the Jaccard stays exact while the join never
    // explodes on a boilerplate shingle
    val interKept = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("n_inter_kept"))
    val hotPerDoc = exploded.join(hot, "s")
      .groupBy(col("doc")).agg(collect_list(col("s")).as("hot_sh"))
    val aug = sh.select(col("doc"), size(col("shingles")).as("n"))
      .join(hotPerDoc, Seq("doc"), "left")
      .select(col("doc"), col("n"),
        coalesce(col("hot_sh"), array().cast("array<string>")).as("hot_sh"))
    interKept
      .join(aug.select(col("doc").as("id_a"), col("n").as("n_a"), col("hot_sh").as("hot_a")), "id_a")
      .join(aug.select(col("doc").as("id_b"), col("n").as("n_b"), col("hot_sh").as("hot_b")), "id_b")
      .withColumn("n_inter",
        col("n_inter_kept") + size(array_intersect(col("hot_a"), col("hot_b"))))
      .select(col("id_a"), col("id_b"), col("n_inter"), col("n_a"), col("n_b"))
  }

  /** Connected components over a near-dup pair list — the step that
    * turns pairwise matches into dedup CLUSTERS with one canonical
    * keeper (min id) per component, so "drop all but the keeper" is
    * well-defined even for transitive chains (a~b, b~c but not a~c).
    *
    * Algorithm: min-label propagation — every node starts labeled with
    * itself; each round every node takes the min label among itself and
    * its neighbors; converges in O(component diameter) rounds. Each
    * round is one join + one groupBy keyed on node ids, checkpointed by
    * persist, so the shape is scale-safe; for graphs with huge diameters
    * at extreme scale swap in large-star/small-star (Kiveris et al.),
    * which keeps the same join-per-round shape with O(log n) rounds.
    * Near-dup clusters are shallow (dup groups, not social graphs), so
    * propagation converges in a handful of rounds in practice.
    *
    * Returns (doc_id, component) for every node that appears in a pair;
    * unpaired docs are their own trivial component by definition. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().persist()
    // per-round LAZY localCheckpoint (not persist): each round's plan
    // references the previous labels twice, so composing rounds doubles
    // the Catalyst tree per iteration — lineage must be CUT, not just
    // cached, or the driver chokes on plan traversal past ~20 rounds
    // (same trap documented on connectedComponentsStarWithRounds).
    // Lazy (eager = false) so the changed-count job both materializes
    // the round and checkpoints it — one job per round, like the
    // original persist discipline, with O(1)-size plans.
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(false)
    var changed = 1L
    var i = 0
    // free each superseded round's checkpoint blocks deterministically
    // (GC-driven cleanup leaves R rounds of dead blocks on storage
    // memory otherwise); the checkpointed RDD is extracted from the
    // round's LogicalRDD plan, so ONLY our own blocks are ever touched
    var liveCp = checkpointedRdd(labels)
    while (changed > 0 && i < maxIter) {
      // the previous label rides the round as the `own`-flagged row of
      // the union (every node has exactly ONE self row), so the
      // changed-count needs no join back to the previous labels — it is
      // a narrow scan of the round's own checkpointed output. The old
      // shape paid one extra node-keyed shuffle join per round just to
      // diff the labels.
      val newLabels = edges.join(labels, edges("dst") === labels("node"))
        .select(col("src").as("node"), col("label"), lit(false).as("own"))
        .union(labels.select(col("node"), col("label"), lit(true).as("own")))
        .groupBy(col("node")).agg(min(col("label")).as("label"),
          max(when(col("own"), col("label"))).as("old"))
        .localCheckpoint(false)
      // the changed-count job materializes newLabels AND still reads the
      // previous labels — only free those blocks after it completes
      changed = newLabels.where(col("label") =!= col("old")).count()
      liveCp.foreach(_.unpersist(blocking = false))
      liveCp = checkpointedRdd(newLabels)
      labels = newLabels.select(col("node"), col("label"))
      i += 1
    }
    edges.unpersist()
    // an unconverged result would silently split true clusters — fail
    // loudly instead (diameter > maxIter means the caller must raise it
    // or switch to large-star/small-star)
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds " +
        "(component diameter exceeds maxIter)")
    labels.select(col("node").as("doc_id"), col("label").as("component"))
  }

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SOCC'14) — the high-diameter upgrade [[connectedComponents]]
    * documents: O(log n) rounds regardless of component diameter, vs
    * O(diameter) for min-label propagation. Same output contract:
    * (doc_id, component = min id in the component).
    *
    * Each round is two neighborhood aggregations over the canonical
    * (hi, lo) edge set:
    *  - large-star: every node links its LARGER neighbors to the min of
    *    its closed neighborhood;
    *  - small-star: every node links its smaller neighbors (and itself)
    *    to the min of the smaller ones.
    * Both are groupBy-node + join shapes — the same scale contract as
    * one propagation round — and the edge set only shrinks toward the
    * star forest, so per-round cost decreases. Converged when a
    * large-star + small-star pass leaves the edge set unchanged; the
    * result is then a star forest whose roots are component minima. */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponentsStarWithRounds(pairs, maxIter)._1

  /** Size-dispatched connected components (the Graph.scala Borůvka
    * fast-path pattern, extracted): count the distinct edge set once;
    * at or under `bound` edges a driver union-find (min-root, so labels
    * are IDENTICAL to the star contraction's component = min id)
    * replaces ~15 distributed jobs per star round with one collect —
    * on a tiny graph the distributed path is pure job-cadence overhead
    * (q305's 10x10 core-cell grid spent ~3s on ~350 edges). Past the
    * bound the O(log n) star contraction stands, so the operator is
    * still cluster-shaped at 100 TB; the bound caps driver memory at
    * ~10k rows regardless of input scale. Output: (doc_id, component),
    * broadcast when the fast path fired (component frames this small
    * always join broadcast-side). */
  /** Dispatch decisions recorded by [[connectedComponentsAuto]] —
    * (distinct edges, took driver union-find). Same evidence contract
    * as `DataQuality.dispatchLog`: the 100×-scale claim on every
    * CC-backed pipeline (q86 clusters, Borůvka merges, q305 cell
    * graphs) rests on the distributed fallback actually firing once
    * the edge count outgrows the driver bound — a spec and the scale
    * probe read the branch taken here instead of inferring it from
    * timings. Bounded: reader drains, writer evicts past the cap. */
  private[graft] val CcDispatchLogCap = 64
  private[graft] val ccDispatchLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Boolean)]()

  def connectedComponentsAuto(pairs: DataFrame, bound: Long = 10000L,
                              maxIter: Int = 50): DataFrame =
    connectedComponentsAutoCounted(pairs, bound, maxIter)._1

  /** [[connectedComponentsAuto]] plus the distinct canonical edge count
    * its dispatch already pays for — callers that also need an
    * emptiness/progress signal (Borůvka's merge loop) read it here
    * instead of running a separate isEmpty/count action. */
  def connectedComponentsAutoCounted(pairs: DataFrame, bound: Long = 10000L,
                                     maxIter: Int = 50): (DataFrame, Long) = {
    val canon = pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .where(col("u") =!= col("v")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE action for both the dispatch test and the fast-path edge
    // list: limit(bound+1) returning <= bound rows proves the input is
    // exhausted (take scans until it has bound+1 or runs out), so those
    // rows ARE the complete edge set and their count is exact — the old
    // shape paid a full count() and then a second collect() for the
    // same data. The slow path still counts (it never collects).
    val head = canon.limit(bound.toInt + 1).collect()
    val fast = head.length <= bound
    val nEdges = if (fast) head.length.toLong else canon.count()
    ccDispatchLog.add((nEdges, fast))
    while (ccDispatchLog.size > CcDispatchLogCap) ccDispatchLog.poll()
    val out = if (fast) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent(c); parent(c) = r; c = nxt
        }
        r
      }
      head.foreach { r =>
        val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
      }
      val nodes = parent.keySet ++ parent.values
      val s = pairs.sparkSession
      import s.implicits._
      broadcast(nodes.toSeq.sorted.map(n => (n, find(n)))
        .toDF("doc_id", "component"))
    } else connectedComponentsStar(
      canon.select(col("u").as("id_a"), col("v").as("id_b")), maxIter)
    // the fast path has already collected; the star path checkpoints
    // its own first round before returning, so the input can drop
    canon.unpersist(blocking = false)
    (out, nEdges)
  }

  /** [[connectedComponentsStar]] plus the round count (exposed so specs
    * can assert the O(log n) bound on high-diameter graphs). */
  def connectedComponentsStarWithRounds(pairs: DataFrame, maxIter: Int = 50)
      : (DataFrame, Int) = {
    def bothDirs(e: DataFrame) =
      e.union(e.select(col("v").as("u"), col("u").as("v")))
    // large-star over closed neighborhoods: m(u) = min(N(u) + {u});
    // emit (v, m) for larger neighbors v — (v, m) is already (hi, lo)
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = bothDirs(e)
      val mins = nbrs.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      nbrs.where(col("v") > col("u")).join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
    }
    // small-star over smaller neighborhoods: m(u) = min of the smaller
    // neighbors; relink them (and u) to m, dropping self-loops
    def smallStar(e: DataFrame): DataFrame = {
      val sm = bothDirs(e).where(col("v") < col("u"))
      val mins = sm.groupBy(col("u")).agg(min(col("v")).as("m"))
      sm.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v")).distinct()
    }
    // each round MUST cut the logical lineage, not just cache execution:
    // largeStar/smallStar reference their input several times, so
    // composing rounds grows the Catalyst tree ~16x per round and the
    // driver chokes on plan traversal long before execution. A LAZY
    // localCheckpoint replaces the round's plan with a LogicalRDD —
    // O(1)-size plans every round — and the convergence count doubles
    // as the materializing action (the standard fix for iterative
    // DataFrame algorithms).
    // convergence via a one-action digest: (count, sum of xxhash64(u,v)).
    // Equal digests on consecutive rounds mean the edge set reached its
    // fixed point — an order-independent check that replaces the old
    // count + except() pair (a full distinct anti-join per round) with
    // a single map-side-combined aggregate. A hash-sum collision would
    // need two different edge sets with identical count AND identical
    // 64-bit hash sum in the same round (~2^-64); the sf0.01 oracle
    // gate would surface any miscluster it ever caused.
    def digest(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v"))), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .where(col("u") =!= col("v")).distinct().localCheckpoint(false)
    var prevDigest = digest(edges) // materializes the initial checkpoint
    // The node set for the final label join comes from the CHECKPOINTED
    // initial edges, eagerly checkpointed itself (node-sized) before the
    // round loop frees those edge blocks. Deriving it from `pairs`
    // instead re-executes the whole upstream pair pipeline when the
    // result materializes — on the LSH near-dup graph that recompute
    // was 5x the cost of the rounds themselves (q111: 11 s → ~2 s).
    // Degenerate self-pairs (id_a == id_b) carry no edge and no longer
    // surface as singleton rows; near-dup pair lists never contain them.
    val allNodes = edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node"))).distinct()
      .localCheckpoint(true)
    var converged = prevDigest._1 == 0L
    var rounds = 0
    // the live round's checkpointed RDD — freed deterministically once
    // the next round materializes, instead of waiting for a GC to notice
    // the dropped reference (R rounds of leaked blocks otherwise sit on
    // storage memory for the rest of the session). Extracted from the
    // LogicalRDD plan so only our own blocks are ever unpersisted —
    // never a persisted input like the LSH candidate table.
    var liveCp = checkpointedRdd(edges)
    while (!converged && rounds < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(false)
      val dg = digest(next) // materializes the checkpoint
      converged = dg == prevDigest
      liveCp.foreach(_.unpersist(blocking = false))
      liveCp = checkpointedRdd(next)
      prevDigest = dg
      edges = next
      rounds += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds")
    // star forest: non-roots carry exactly one (node, root) edge; roots
    // and isolated nodes label themselves. min() guards the (never
    // observed) multi-edge case rather than silently duplicating rows.
    val labels = allNodes
      .join(edges.groupBy(col("u")).agg(min(col("v")).as("component")),
        allNodes("node") === col("u"), "left")
      .select(col("node").as("doc_id"),
        coalesce(col("component"), col("node")).as("component"))
    (labels, rounds)
  }

  /** Mersenne prime modulus for the universal MinHash family; all
    * intermediates stay below 2^62 so the arithmetic replays exactly in
    * DuckDB BIGINTs (which error on overflow rather than wrap). */
  val MinHashP = 2147483647L

  /** MinHash signature via a universal hash family over ONE md5 per
    * shingle: h = hash60(shingle) % p, slot j (1-based) =
    * min over shingles of (a_j*h + b_j) mod p with
    * a_j = j*2654435761 mod p, b_j = j*913841963 mod p, p = 2^31-1.
    * The md5 is the dominant cost at corpus scale (it runs once per
    * shingle instead of numHashes times); the per-slot mixing is plain
    * codegen-able integer arithmetic, and the whole family replays
    * bit-identically in the DuckDB oracle. */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    minHashSignatureFromHashes(transform(shingles, s => hash60(s) % lit(MinHashP)), numHashes)

  /** Signature from PRE-HASHED shingles (hash60 % p). Callers that can
    * materialize the hash array in a persisted frame should — a lambda
    * like `transform(shingles, md5...)` embedded in the per-slot loop is
    * re-evaluated once per slot (Catalyst does no CSE across lambda
    * boundaries), which silently multiplies the md5 cost numHashes-fold. */
  def minHashSignatureFromHashes(hmod: Column, numHashes: Int): Column = {
    val p = lit(MinHashP)
    transform(sequence(lit(1), lit(numHashes)), j =>
      array_min(transform(hmod,
        h => pmod(pmod(j * lit(2654435761L), p) * h + pmod(j * lit(913841963L), p), p))))
  }

  /** LSH band hashes of a minhash signature: bands of `rowsPerBand`
    * consecutive signature slots, each hashed to one bucket id. */
  def bandHashes(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => md5(concat_ws("|", b,
        array_join(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), ","))))

  /** MinHash+LSH near-dup pairs: shingle → signature → band buckets →
    * bucket join for candidates → exact Jaccard verification of the
    * candidates. Deterministic end-to-end (md5 hash family), so the
    * oracle replays candidate generation exactly: the output is "pairs
    * the LSH surfaces AND whose true Jaccard >= threshold". */
  /** Shared LSH candidate generation — the banding scheme q24 ships
    * and the scorecard measures MUST be one piece of code. Returns
    * (shingle+signature table, banded bucket table, candidate id
    * pairs); sh and banded are PERSISTED (materialization discipline:
    * the md5 signature is an interpreted higher-order expression and
    * must be computed exactly once per doc, never inlined into both
    * sides of the self-join), candIds is left lazy — the caller
    * decides its lifecycle and owns all releases. */
  private[operators] def lshCandidates(df: DataFrame, id: Column, text: Column,
      k: Int, numHashes: Int, numBands: Int): (DataFrame, DataFrame, DataFrame) = {
    val rowsPerBand = numHashes / numBands
    val sh = shingleFrame(df, id, text, k)
      .select(col("doc"), col("shingles"),
        transform(col("shingles"), s => hash60(s) % lit(MinHashP)).as("hmod"))
      .persist()
    val banded = sh.select(col("doc"),
      explode(bandHashes(minHashSignatureFromHashes(col("hmod"), numHashes),
        numBands, rowsPerBand)).as("bucket"))
      .persist()
    val candIds = banded.as("a").join(banded.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
    (sh, banded, candIds)
  }

  /** Near-dup pair EXPLANATION: for every LSH pair over the threshold,
    * the exact shared-shingle count and the first `topN` shared
    * shingles in binary-sort order — the evidence rows a human (or an
    * appeal process) reads when a dedup decision is challenged. Same
    * banded candidate generation as [[minHashLshPairs]]; the
    * explanation is a row-local array intersect over the pair's
    * bounded shingle arrays. Emits
    * (id_a, id_b, jaccard, n_shared, rnk, shingle). */
  def neardupExplain(df: DataFrame, id: Column, text: Column, k: Int,
                     numHashes: Int, numBands: Int, threshold: Double,
                     topN: Int = 3): DataFrame = {
    val (sh, _, candIds) = lshCandidates(df, id, text, k, numHashes, numBands)
    val cands = candIds
      .join(sh.select(col("doc").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("doc").as("id_b"), col("shingles").as("sh_b")), "id_b")
    val shared = array_intersect(col("sh_a"), col("sh_b"))
    val jac = size(shared).cast("double") /
      (size(col("sh_a")) + size(col("sh_b")) - size(shared))
    cands.select(col("id_a"), col("id_b"), jac.as("jaccard"),
        array_sort(shared).as("is"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"),
        size(col("is")).as("n_shared"),
        posexplode(slice(col("is"), 1, topN)).as(Seq("r0", "shingle")))
      .select(col("id_a"), col("id_b"), col("jaccard"), col("n_shared"),
        (col("r0") + 1).as("rnk"), col("shingle"))
  }

  def minHashLshPairs(df: DataFrame, id: Column, text: Column, k: Int,
                      numHashes: Int, numBands: Int, threshold: Double): DataFrame = {
    val (sh, _, candIds) = lshCandidates(df, id, text, k, numHashes, numBands)
    val cands = candIds
      .join(sh.select(col("doc").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("doc").as("id_b"), col("shingles").as("sh_b")), "id_b")
    cands.select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) -
            size(array_intersect(col("sh_a"), col("sh_b"))))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Fellegi-Sunter probabilistic record linkage over an
    * agreement-pattern count table: 2 unrolled EM iterations estimate
    * the match proportion p and the per-field m = P(agree|match) /
    * u = P(agree|non-match) probabilities, then every pattern gets its
    * posterior match probability w and the classic log2 match weight
    * log2(P(γ|M)/P(γ|U)) — the score a linkage pipeline thresholds.
    *
    * Scale split is the whole point: the DATA-sized work is counting
    * agreement patterns over blocked candidate pairs (one groupBy the
    * caller provides); EM itself runs on the 2^#fields-row pattern
    * table — here as dataframe algebra (1-row param frames crossed over
    * the 8-row pattern frame per iteration) so the oracle replays every
    * arithmetic step. Cross-pattern sums quantize to the 1e-9 grid and
    * fold in exact decimal, making them order-invariant; fixed init
    * p=0.1, m=0.9, u=0.1 and a fixed iteration count keep the whole
    * fit deterministic (no convergence race).
    * Input: (g1, g2, g3 ∈ {0,1}, n); output: per-pattern
    * (g1, g2, g3, n, w, match_weight). */
  def fellegiSunterEM(pat: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val s = pat.sparkSession
    val dec9 = (c: Column) => round(c, 9).cast("decimal(38,9)")
    var params = s.range(1).select(
      lit(0.1).as("p"),
      lit(0.9).as("m1"), lit(0.9).as("m2"), lit(0.9).as("m3"),
      lit(0.1).as("u1"), lit(0.1).as("u2"), lit(0.1).as("u3"))
    def lik(tag: String) = (i: Int) =>
      when(col(s"g$i") === 1, col(s"$tag$i"))
        .otherwise(lit(1.0) - col(s"$tag$i"))
    def wExpr: Column = {
      val pm = col("p") * lik("m")(1) * lik("m")(2) * lik("m")(3)
      val pu = (lit(1.0) - col("p")) * lik("u")(1) * lik("u")(2) * lik("u")(3)
      pm / (pm + pu)
    }
    for (_ <- 1 to iters) {
      val j = pat.crossJoin(broadcast(params)).withColumn("w", wExpr)
      params = j.agg(
          sum(col("n")).as("nn"),
          sum(dec9(col("n") * col("w"))).as("nw"),
          sum(dec9(col("n") * (lit(1.0) - col("w")))).as("nv"),
          sum(dec9(col("n") * col("w") * col("g1"))).as("nwg1"),
          sum(dec9(col("n") * col("w") * col("g2"))).as("nwg2"),
          sum(dec9(col("n") * col("w") * col("g3"))).as("nwg3"),
          sum(dec9(col("n") * (lit(1.0) - col("w")) * col("g1"))).as("nvg1"),
          sum(dec9(col("n") * (lit(1.0) - col("w")) * col("g2"))).as("nvg2"),
          sum(dec9(col("n") * (lit(1.0) - col("w")) * col("g3"))).as("nvg3"))
        .select(
          (col("nw").cast("double") / col("nn").cast("double")).as("p"),
          (col("nwg1").cast("double") / col("nw").cast("double")).as("m1"),
          (col("nwg2").cast("double") / col("nw").cast("double")).as("m2"),
          (col("nwg3").cast("double") / col("nw").cast("double")).as("m3"),
          (col("nvg1").cast("double") / col("nv").cast("double")).as("u1"),
          (col("nvg2").cast("double") / col("nv").cast("double")).as("u2"),
          (col("nvg3").cast("double") / col("nv").cast("double")).as("u3"))
    }
    val mProd = lik("m")(1) * lik("m")(2) * lik("m")(3)
    val uProd = lik("u")(1) * lik("u")(2) * lik("u")(3)
    pat.crossJoin(broadcast(params))
      .select(col("g1"), col("g2"), col("g3"), col("n"),
        round(wExpr, 6).as("w"),
        round(log2(mProd / uProd), 6).as("match_weight"))
  }

  /** MinHash ESTIMATOR audit over the LSH candidate pairs: the
    * signature-agreement Jaccard estimate (matching slots / numHashes)
    * side-by-side with the exact shingle Jaccard — the cheap check that
    * the sketch a pipeline trusts for billions of pairs is actually
    * unbiased on THIS corpus (estimator drift = wrong hash family size,
    * shingle pathology, or banding bugs). Same persisted-signature
    * discipline as [[minHashLshPairs]]; the estimate is an O(numHashes)
    * row-local fold, no extra shuffle over the verify join. */
  def minHashEstimatePairs(df: DataFrame, id: Column, text: Column, k: Int,
                           numHashes: Int, numBands: Int): DataFrame = {
    val (sh, _, candIds) = lshCandidates(df, id, text, k, numHashes, numBands)
    // materialize the signature ONCE: it is an interpreted higher-order
    // expression and the candidate join reads it from both sides
    val sigs = sh.select(col("doc"), col("shingles"),
        minHashSignatureFromHashes(col("hmod"), numHashes).as("sig"))
      .persist()
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    candIds
      .join(sigs.select(col("doc").as("id_a"), col("shingles").as("sh_a"),
        col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("doc").as("id_b"), col("shingles").as("sh_b"),
        col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / numHashes, 6)
          .as("est_jaccard"),
        round(inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter), 6).as("jaccard"))
  }

  /** Blocking-quality scorecard for the MinHash-LSH blocking scheme —
    * the observability a production dedup pipeline reports before
    * anyone trusts its recall: REDUCTION RATIO (what fraction of the
    * n·(n−1)/2 pair space the blocking avoided scoring) and PAIR
    * COMPLETENESS (what fraction of the TRUE near-dup pairs the blocks
    * still cover). Ground truth comes from share-a-shingle blocked
    * exact Jaccard — exact for any threshold > 0, and the scalable way
    * to get truth without an all-pairs scan (the same shape as
    * [[jaccardPairs]], uncapped). One row out; every count is a
    * broadcast-sized aggregate crossed together, no driver loops. */
  def blockingQuality(df: DataFrame, id: Column, text: Column, k: Int,
                      numHashes: Int, numBands: Int, threshold: Double,
                      truthSampleMod: Long = 1L,
                      maxShingleDocFreq: Long = 10000L): DataFrame = {
    require(truthSampleMod >= 1, s"truthSampleMod must be >= 1: $truthSampleMod")
    // the EXACT candidate pipeline q24 ships — shared code, so the
    // scorecard can never measure a different scheme than production
    val (sh, banded, candIdsLazy) =
      lshCandidates(df, id, text, k, numHashes, numBands)
    val candIds = candIdsLazy.persist()
    // Ground truth: [[jaccardPairs]] (count-based exact verify, no
    // per-pair array intersections) over a DETERMINISTIC doc sample
    // (doc % truthSampleMod == 0). Completeness is a ratio, so an
    // unbiased pair sample estimates it — full-corpus truth is an
    // O(n²/hot-shingle) job nobody runs at 100 TB; the hot-shingle cap
    // is q23's exact-recall discipline. A true pair is "found" when the
    // LSH banding proposed it, so n_found is a semi-join of the truth
    // pairs against the candidate ids — no re-verification.
    val truth = jaccardPairs(
        df.where(pmod(id, lit(truthSampleMod)) === 0), id, text, k, threshold,
        maxShingleDocFreq.toInt)
      .select(col("id_a"), col("id_b"))
      .persist()
    // Counts resolved as SEQUENTIAL bounded actions, not crossJoined
    // broadcast subtrees: concurrent broadcast materialization races
    // the shared persisted frames before the cache fills, and each
    // branch then recomputes the md5 signatures from scratch (measured
    // ~3x on this fit). Every action returns one long; the scorecard
    // frame is then a pure literal projection — exactly replayable.
    val nDocs = sh.count()
    val nCand = candIds.count()
    val nTrue = truth.count()
    val nFound = truth.join(candIds, Seq("id_a", "id_b"), "left_semi").count()
    sh.unpersist(blocking = false)
    banded.unpersist(blocking = false)
    candIds.unpersist(blocking = false)
    truth.unpersist(blocking = false)
    val nTotal = nDocs * (nDocs - 1) / 2
    df.sparkSession.range(1).select(
      lit(nDocs).as("n_docs"), lit(nTotal).as("n_total_pairs"),
      lit(nCand).as("n_candidates"), lit(nTrue).as("n_true"),
      lit(nFound).as("n_found"),
      round(lit(1.0) - lit(nCand).cast("double") /
        lit(math.max(nTotal, 1L)).cast("double"), 6).as("reduction_ratio"),
      round(lit(nFound).cast("double") /
        lit(math.max(nTrue, 1L)).cast("double"), 6).as("pair_completeness"))
  }

  /** Incremental-ingest near-dup filter: drop each INCOMING document
    * that is a near-duplicate (shared LSH band bucket + exact Jaccard >=
    * threshold) of ANY standing-corpus document; survivors pass through
    * untouched. This is the nightly-ingest shape — at 100 TB the corpus
    * side's signatures/buckets would be precomputed and stored, and the
    * join cost scales with the (small) incoming batch, not the corpus.
    * Exact-duplicate ingestion is the degenerate case: identical text ⇒
    * identical signature ⇒ same buckets ⇒ Jaccard 1. Incoming docs with
    * fewer than k tokens carry no signal and always survive. */
  def dedupAgainstCorpus(corpus: DataFrame, incoming: DataFrame,
                         id: Column, text: Column, k: Int, numHashes: Int,
                         numBands: Int, threshold: Double): DataFrame = {
    val rowsPerBand = numHashes / numBands
    def prep(df: DataFrame) = shingleFrame(df, id, text, k)
      .select(col("doc"), col("shingles"),
        transform(col("shingles"), s => hash60(s) % lit(MinHashP)).as("hmod"))
      .persist()
    // band tables persisted like minHashLshPairs's: the signature is a
    // higher-order-function expression (outside whole-stage codegen), so
    // recomputing it per run is the dominant steady-state cost; a
    // resident ingest pipeline keeps the corpus-side buckets stored
    def banded(sh: DataFrame) = sh.select(col("doc"),
      explode(bandHashes(minHashSignatureFromHashes(col("hmod"), numHashes),
        numBands, rowsPerBand)).as("bucket"))
      .persist()
    val co = prep(corpus)
    val inc = prep(incoming)
    val candIds = banded(inc).as("a").join(banded(co).as("b"),
        col("a.bucket") === col("b.bucket"))
      .select(col("a.doc").as("id_new"), col("b.doc").as("id_old"))
      .distinct()
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val dupNew = candIds
      .join(inc.select(col("doc").as("id_new"), col("shingles").as("sh_a")), "id_new")
      .join(co.select(col("doc").as("id_old"), col("shingles").as("sh_b")), "id_old")
      .where(inter / (size(col("sh_a")) + size(col("sh_b")) - inter) >= threshold)
      .select(col("id_new")).distinct()
    incoming.join(dupNew, id === col("id_new"), "left_anti")
  }

  /** Record-linkage fuzzy join (entity matching): each probe row's
    * top-`k` canonical matches by whole-token-set Jaccard — the "match
    * a dirty feed against a canonical dimension" step, cross-table
    * where [[jaccardPairs]] is within-corpus.
    *
    * Candidate generation is PREFIX-FILTERED (Bayardo et al., "Scaling
    * Up All Pairs Similarity Search"): under any consistent global
    * token order, a pair with J >= t must share a token among each
    * side's first L = n - ceil(t*n) + 1 tokens (the smallest common
    * token of a qualifying pair sits inside both prefixes), so only
    * prefix tokens enter the blocking join. The order used is
    * (canon-side document frequency asc, token) — rarity-first, which
    * makes prefixes maximally selective; on a dense vocabulary this cut
    * the candidate set ~10x vs naive share-a-token blocking (22s -> 2s
    * at sf0.1) with EXACT recall, so the differential oracle still
    * verifies against plain share-a-token semantics. Tokens above
    * `maxTokenDocFreq` canon docs are additionally dropped from the
    * join (the [[jaccardPairs]] hot cap — a boilerplate token fans
    * every probe out df ways; pairs sharing only hot tokens are the
    * documented recall trade). Verify: exact Jaccard via
    * array_intersect over the (pruned) candidates' full token sets.
    * Rank: the bounded [[graft.aggregators.TopK]] aggregator per probe.
    * Ties go to the smaller canon id.
    * Emits (probe_id, canon_id, jaccard, rank). */
  def fuzzyJoinTopK(canon: DataFrame, canonId: Column, canonText: Column,
                    probes: DataFrame, probeId: Column, probeText: Column,
                    k: Int, minJaccard: Double,
                    maxTokenDocFreq: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard must be in (0,1] for prefix filtering: $minJaccard")
    // persisted: each side feeds its prefix explode AND the verify
    // join-back; lifecycle is the object's materialize-then-release
    val c = canon.select(canonId.as("canon_id"),
        array_distinct(tokens(canonText)).as("ct"))
      .where(size(col("ct")) > 0).persist()
    val p = probes.select(probeId.as("probe_id"),
        array_distinct(tokens(probeText)).as("pt"))
      .where(size(col("pt")) > 0).persist()
    // global token order = (canon document frequency, token); probe-only
    // tokens get df 0 — any total order is correct, selectivity is why
    // rarity leads. Bounded: O(distinct canon tokens).
    val dfTab = c.select(explode(col("ct")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df_t"))
      .persist()
    def prefixTok(side: DataFrame, id: String, arr: String) = {
      val t = minJaccard
      side.select(col(id), explode(col(arr)).as("tok"), size(col(arr)).as("n"))
        .join(dfTab, Seq("tok"), "left")
        .select(col(id), col("n"), col("tok"),
          coalesce(col("df_t"), lit(0L)).as("df_t"))
        .where(col("df_t") <= maxTokenDocFreq)
        .groupBy(col(id), col("n"))
        .agg(array_sort(collect_list(struct(col("df_t"), col("tok")))).as("o"))
        .select(col(id),
          explode(slice(col("o"), lit(1),
            (col("n") - ceil(col("n") * t) + 1).cast("int"))).as("s"))
        .select(col(id), col("s.tok").as("tok"))
    }
    // The prefix frames are tiny relative to the candidate pairs the
    // join emits (sf0.1 10x probe: ~1 MB of prefix rows -> 23M pairs),
    // so AQE's coalescer folds the pre-join shuffles into ONE partition
    // and the entire pair generation runs serially (measured 17s of a
    // 35s query in one task). Pin both sides to an explicit
    // defaultParallelism-way hash partitioning on the join key — an
    // explicit repartition is exempt from AQE coalescing, and
    // generation parallelism then scales with the cluster, bounded
    // only by per-token serialization (inherent to a token join).
    val nPart = canon.sparkSession.sparkContext.defaultParallelism
    val cands = prefixTok(p, "probe_id", "pt").repartition(nPart, col("tok"))
      .join(prefixTok(c, "canon_id", "ct").repartition(nPart, col("tok")), "tok")
      .select(col("probe_id"), col("canon_id")).distinct()
    val scored = cands.join(p, "probe_id").join(c, "canon_id")
      .select(col("probe_id"), col("canon_id"),
        size(array_intersect(col("pt"), col("ct"))).cast("double").as("n_inter"),
        size(col("pt")).as("n_p"), size(col("ct")).as("n_c"))
      .select(col("probe_id"), col("canon_id"),
        (col("n_inter") / (col("n_p") + col("n_c") - col("n_inter"))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
    graft.aggregators.TopK.topKPerKey(scored, "probe_id", "canon_id", "jaccard", k)
  }

  /** Near-exact entity match: each probe row's top-`k` canonical rows
    * whose token SETS differ by at most one token per side — the
    * high-confidence tier of record linkage (typos, one changed word),
    * where [[fuzzyJoinTopK]]'s prefix filter is the loose tier. On a
    * DENSE vocabulary prefix/token blocking degenerates (a 16-word
    * vocabulary makes ~25% of all cross pairs share a token — measured
    * 22 s of candidate explosion at sf0.1); DELETE-ONE signature
    * blocking stays selective because a signature is a whole sorted
    * (n-1)-subset: two sets with |a \\ b| <= 1 and |b \\ a| <= 1 share
    * the signature that drops each side's odd token out, and a
    * signature's document frequency is tiny even when every single
    * token is hot (the spelling-correction trick, Norvig-style, lifted
    * to token sets). EXACT for that predicate; for uniform n-token
    * names it equals Jaccard >= (n-1)/(n+1) (5-token names: 0.667), so
    * pass a `minJaccard` at or above that and the differential oracle
    * can verify against plain all-pairs Jaccard semantics. Verify is
    * exact Jaccard over candidate pairs' full sets; rank is the bounded
    * [[graft.aggregators.TopK]]. Emits (probe_id, canon_id, jaccard,
    * rank). Cost: sides emit n+1 signatures per row; one equi-join on
    * signature; candidates ~ sum of squared signature frequencies —
    * vocabulary-independent. */
  def nearExactMatchTopK(canon: DataFrame, canonId: Column, canonText: Column,
                         probes: DataFrame, probeId: Column, probeText: Column,
                         k: Int, minJaccard: Double,
                         maxSigDocFreq: Int = 1000): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // full sorted set + each delete-one subset, joined to strings
    def sigsOf(arr: Column): Column = {
      val sorted = array_sort(arr)
      concat(
        array(array_join(sorted, " ")),
        transform(sequence(lit(0), size(sorted) - 1), i =>
          array_join(
            concat(slice(sorted, lit(1), i),
              slice(sorted, i + lit(2), size(sorted))), " ")))
    }
    val c = canon.select(canonId.as("canon_id"),
        array_distinct(tokens(canonText)).as("ct"))
      .where(size(col("ct")) > 0).persist()
    val p = probes.select(probeId.as("probe_id"),
        array_distinct(tokens(probeText)).as("pt"))
      .where(size(col("pt")) > 0).persist()
    val cSig = c.select(col("canon_id"), explode(sigsOf(col("ct"))).as("sig"))
    // hot-signature cap — same recall trade as every blocking stage
    // here: a signature in more than maxSigDocFreq canon rows fans each
    // probe out df ways (short names make their delete-one sigs near-
    // single tokens, which can be corpus-hot while carrying no identity)
    val hot = cSig.groupBy(col("sig")).agg(count(lit(1)).as("df_s"))
      .where(col("df_s") > maxSigDocFreq).select(col("sig"))
    val cands = p.select(col("probe_id"), explode(sigsOf(col("pt"))).as("sig"))
      .join(hot, Seq("sig"), "left_anti")
      .join(cSig, "sig")
      .select(col("probe_id"), col("canon_id")).distinct()
    val scored = cands.join(p, "probe_id").join(c, "canon_id")
      .select(col("probe_id"), col("canon_id"),
        size(array_intersect(col("pt"), col("ct"))).cast("double").as("n_inter"),
        size(col("pt")).as("n_p"), size(col("ct")).as("n_c"))
      .select(col("probe_id"), col("canon_id"),
        (col("n_inter") / (col("n_p") + col("n_c") - col("n_inter"))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
    graft.aggregators.TopK.topKPerKey(scored, "probe_id", "canon_id", "jaccard", k)
  }

  /** Per-token 60-bit hashes (one md5 per distinct token) — the input to
    * simHashOf. Materialize once; the 60 bit-sums then fold over plain
    * longs with no further hashing. */
  def tokenHashes(text: Column): Column =
    transform(array_distinct(tokens(text)), t => hash60(t))

  /** 60-bit SimHash over a token-hash array column: bit j of the result
    * is set iff more token hashes have bit j set than unset. Expressed as
    * a SQL expression because the shift amount is itself a lambda
    * variable (the Scala DSL's shiftright only takes literal shifts).
    * pow(2, j) is exact for j <= 62 (power-of-two doubles are exact). */
  def simHashOf(tokenHashCol: String): Column = expr(
    s"""aggregate(
          transform(sequence(0, 59), j ->
            CASE WHEN aggregate($tokenHashCol, 0L, (acc, h) ->
                   acc + CASE WHEN shiftright(h, j) % 2 = 1 THEN 1L ELSE -1L END) > 0
                 THEN CAST(pow(2, j) AS BIGINT) ELSE 0L END),
          0L, (acc, x) -> acc + x)""")

  /** SimHash near-dup pairs: block on the 4 disjoint 15-bit chunks of
    * the 60-bit simhash (two docs within hamming distance d share at
    * least one chunk when d < 4 is violated only past 3 flipped chunks —
    * the standard Charikar blocking), join per chunk, verify by true
    * hamming distance. */
  def simHashPairs(df: DataFrame, id: Column, text: Column, maxHamming: Int): DataFrame = {
    // `_th` MUST be persisted before simHashOf reads it: the per-bit
    // lambda references the column 60 times, and CollapseProject inlines
    // a merely-projected alias straight into the lambda body, re-hashing
    // every token 60x per row (measured 59s -> 1s at sf0.1). The persist
    // is a hard materialization boundary the optimizer cannot cross;
    // both tables release on the caller's clearCache (see object doc).
    val th = df.select(id.as("doc"), tokenHashes(text).as("_th")).persist()
    val sigs = th.select(col("doc"), simHashOf("_th").as("simhash"))
      .persist()
    val posed = sigs.select(col("doc"), col("simhash"),
      posexplode(expr("transform(sequence(0, 3), c -> shiftright(simhash, c * 15) % 32768)")))
      .withColumnRenamed("pos", "c").withColumnRenamed("col", "chunk")
    posed.as("a").join(posed.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Edit-distance record linkage: all pairs within the same block
    * whose names are within `maxDist` Levenshtein edits. The blocking
    * columns ARE the scale contract — the join is a plain equi-join on
    * the block key (hash-partitioned both sides, no theta join), and
    * `levenshtein` runs only inside blocks, so work is
    * O(Σ block_size²), not O(n²). Pick blocks the way the reference's
    * fuzzy stages do (exact attributes that near-duplicates must
    * share); the hot-block guard mirrors [[jaccardPairs]]'
    * `maxShingleDocFreq`: blocks bigger than `maxBlockSize` rows are
    * dropped loudly rather than silently quadrupling the stage.
    *
    * Spark's codegen'd `levenshtein` (same dynamic-program as DuckDB's)
    * keeps the verify step inside whole-stage codegen — no UDF. */
  def editDistancePairs(df: DataFrame, id: Column, name: Column,
                        blockKeys: Seq[Column], maxDist: Int,
                        maxBlockSize: Int = 100000): DataFrame = {
    require(blockKeys.nonEmpty, "editDistancePairs needs >= 1 blocking column")
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val keyed = df.select(
      (blockKeys.zipWithIndex.map { case (c, i) => c.as(s"bk$i") } :+
        id.as("pk") :+ name.as("nm")): _*)
    val bks = blockKeys.indices.map(i => col(s"bk$i"))
    val oversized = keyed.groupBy(bks: _*)
      .agg(count(lit(1)).as("bsz")).where(col("bsz") > maxBlockSize)
    val bigBlocks = oversized.limit(1).collect() // bounded: 1 row
    require(bigBlocks.isEmpty,
      s"editDistancePairs: block over maxBlockSize=$maxBlockSize rows " +
        s"(${bigBlocks.mkString}); refine the blocking key")
    val a = keyed.select((bks :+ col("pk").as("id_a") :+ col("nm").as("nm_a")): _*)
    val b = keyed.select((bks :+ col("pk").as("id_b") :+ col("nm").as("nm_b")): _*)
    a.join(b, blockKeys.indices.map(i => s"bk$i"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("nm_a"), col("nm_b")).as("edit_dist"))
      .where(col("edit_dist") <= maxDist)
  }

  /** Jaro-Winkler record linkage within equi-join blocks — the same
    * blocked self-join shape as [[editDistancePairs]] (equi-keyed
    * shuffle, loud hot-block guard), scored by the native
    * [[graft.expressions.JaroWinkler]] expression inside the join's
    * codegen stage. Emits (id_a, id_b, jw) for pairs at or above
    * `minSim`. */
  def jaroWinklerPairs(df: DataFrame, id: Column, name: Column,
                       blockKeys: Seq[Column], minSim: Double,
                       maxBlockSize: Int = 100000): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnSql
    require(blockKeys.nonEmpty, "jaroWinklerPairs needs >= 1 blocking column")
    require(minSim >= 0.0 && minSim <= 1.0, s"minSim out of [0,1]: $minSim")
    val keyed = df.select(
      (blockKeys.zipWithIndex.map { case (c, i) => c.as(s"bk$i") } :+
        id.as("pk") :+ name.as("nm")): _*)
    val bks = blockKeys.indices.map(i => col(s"bk$i"))
    val oversized = keyed.groupBy(bks: _*)
      .agg(count(lit(1)).as("bsz")).where(col("bsz") > maxBlockSize)
    val bigBlocks = oversized.limit(1).collect() // bounded: 1 row
    require(bigBlocks.isEmpty,
      s"jaroWinklerPairs: block over maxBlockSize=$maxBlockSize rows " +
        s"(${bigBlocks.mkString}); refine the blocking key")
    val a = keyed.select((bks :+ col("pk").as("id_a") :+ col("nm").as("nm_a")): _*)
    val b = keyed.select((bks :+ col("pk").as("id_b") :+ col("nm").as("nm_b")): _*)
    val jw = ColumnSql.columnOf(graft.expressions.JaroWinkler(
      ColumnSql.expressionOf(col("nm_a")), ColumnSql.expressionOf(col("nm_b"))))
    a.join(b, blockKeys.indices.map(i => s"bk$i"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jw.as("jw"))
      .where(col("jw") >= minSim)
  }

  /** [[jaroWinklerPairs]] scored on the DISTINCT-name domain: when the
    * name column repeats heavily (catalog names, normalized addresses),
    * scoring raw row pairs re-evaluates the same string pair millions of
    * times — here every distinct name pair is scored ONCE (with blocks
    * derived from the name via `blockOf`), then qualifying name pairs
    * expand back to id pairs through two equi-joins, and same-name id
    * pairs (similarity exactly 1) come from one self-equi-join on the
    * name. Identical output contract to [[jaroWinklerPairs]] with
    * name-derived blocks; measured 7.5 s -> sub-second on the 20k-part /
    * 64-name catalog at sf0.1. At 100 TB the scoring cost is bounded by
    * the name DOMAIN, not the corpus. */
  def jaroWinklerPairsByName(df: DataFrame, id: Column, name: Column,
                             blockOf: Column => Column, minSim: Double,
                             maxBlockSize: Int = 100000): DataFrame = {
    // no persist: rows is a 2-column projection read 4x — each read is a
    // pruned columnar scan, cheaper than a cache round-trip, and the
    // result needs no checkpoint/release choreography
    val rows = df.select(id.as("pid"), name.as("nm"))
    val names = rows.select(col("nm")).distinct()
    val namePairs = jaroWinklerPairs(names, col("nm"), col("nm"),
        Seq(blockOf(col("nm"))), minSim, maxBlockSize)
      .select(col("id_a").as("na"), col("id_b").as("nb"), col("jw"))
    val cross = namePairs
      .join(rows.select(col("pid").as("pa"), col("nm").as("na")), Seq("na"))
      .join(rows.select(col("pid").as("pb"), col("nm").as("nb")), Seq("nb"))
      .select(least(col("pa"), col("pb")).as("id_a"),
        greatest(col("pa"), col("pb")).as("id_b"), col("jw"))
    val same = rows.as("x").join(rows.as("y"),
        col("x.nm") === col("y.nm") && col("x.pid") < col("y.pid"))
      .select(col("x.pid").as("id_a"), col("y.pid").as("id_b"),
        lit(1.0).as("jw"))
    if (minSim <= 1.0) cross.unionByName(same) else cross
  }
}
