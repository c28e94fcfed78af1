package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis.hash60

/** Embedding similarity operators: exact cosine (zip_with + sequential
  * aggregate — same summation order the DuckDB oracle uses), brute-force
  * top-k, cosine near-dup pairs, and a sign-random-projection (SRP) LSH
  * bucketing as the approximate scale path. The SRP hyperplanes are
  * md5-derived, so even the approximate pipeline is deterministic and
  * oracle-replayable.
  *
  * Scale design (100 TB): brute-force top-k is the per-query baseline
  * (one broadcast of the query set, one pass over the corpus, bounded
  * top-k aggregation — see [[graft.aggregators.TopK]]); the SRP variant turns near-dup search
  * into a bucket-keyed shuffle like the MinHash pipeline — no all-pairs
  * product anywhere.
  */
object Similarity {

  /** Element-wise double cast (embeddings arrive as array<float>;
    * widening float→double is exact). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-to-right dot product — matches list_sum order in
    * the DuckDB oracle so results agree bit-for-bit. Expression form
    * (codegen-friendly for small fixed work like SRP planes). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Same sum as a native Catalyst expression (graft.expressions
    * .DotProduct): codegen'd primitive loop reading Tungsten arrays
    * directly — fuses into WholeStageCodegen with the surrounding
    * projection, no UDF serialization, no per-element interpretation.
    * Left-to-right order keeps doubles bit-identical to `dot` and to
    * the DuckDB oracle. */
  def dotFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnSql
    ColumnSql.columnOf(graft.expressions.DotProduct(
      ColumnSql.expressionOf(a), ColumnSql.expressionOf(b)))
  }

  def norm(a: Column): Column = sqrt(dotFast(a, a))

  def cosine(a: Column, b: Column): Column = dotFast(a, b) / (norm(a) * norm(b))

  /** Cosine when per-row norms were hoisted out of the join (compute n
    * norms once instead of 2 per pair — at all-pairs scale that is the
    * difference between O(n) and O(n^2) norm work). */
  def cosinePreNormed(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** Brute-force exact top-k neighbors for each row of `queries` over
    * `corpus` (both: id + array<float> embedding). Queries are expected
    * to be a small set — Spark broadcasts them; the corpus is scanned
    * once. Rank ties broken by neighbor id. */
  /** All (query, candidate) cosines with the query side broadcast —
    * the shared probe stage under [[bruteForceTopK]] and
    * [[hardNegativesTopK]]. */
  private def scoredPairs(corpus: DataFrame, queries: DataFrame): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), toDouble(col("embedding")).as("c_emb"))
      .withColumn("c_nrm", norm(col("c_emb")))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val q = queries.select(col("vec_id").as("query_id"), toDouble(col("embedding")).as("q_emb"))
      .withColumn("q_nrm", norm(col("q_emb")))
    c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePreNormed(dotFast(col("q_emb"), col("c_emb")),
          col("q_nrm"), col("c_nrm")).as("cos"))
  }

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    rankCosTopK(scoredPairs(corpus, queries), k)

  /** Hard-negative mining for contrastive / embedding training: per
    * anchor, the top-k most-similar candidates INSIDE the band
    * [lo, hi) — similar enough to be informative negatives, below the
    * near-dup ceiling where a "negative" is really a positive (the
    * sampling step of DPR/SimCSE-style pipelines; random negatives are
    * q164's job). The gate path scores brute-force (the q26 oracle
    * shape, broadcast probe set only — never all-pairs); at corpus
    * scale feed the same band filter from the IVF/SRP candidate
    * streams ([[ivfTopK]]/[[srpTopK]]) instead. The band compares RAW
    * cosines: both engines compute them from identical operands, so
    * the cut is deterministic cross-engine (q511's exact-double
    * contract). */
  def hardNegativesTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        lo: Double, hi: Double): DataFrame =
    rankCosTopK(scoredPairs(corpus, queries)
      .where(col("cos") >= lo && col("cos") < hi), k)

  /** Per-query top-k by (cos desc, id asc) through the bounded
    * [[graft.aggregators.TopK]] aggregator: map-side partials forward at
    * most ~2k candidates per (mapper, query) instead of shuffling and
    * sorting every scored pair under a window. */
  private def rankCosTopK(scored: DataFrame, k: Int): DataFrame =
    graft.aggregators.TopK.topKPerKey(scored, "query_id", "neighbor_id", "cos", k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"), col("rank"))

  /** Maximal-marginal-relevance re-ranking (Carbonell-Goldstein) of a
    * bounded per-query candidate list: greedily pick k items maximizing
    * λ·rel(q,c) − (1−λ)·max_{s∈S} sim(c,s). λ rides as the exact
    * integer pair (lamNum, lamDen−lamNum) over 1e-6-quantized scores,
    * so every argmax compares exact longs (ties → smaller id) and the
    * oracle unrolls the same k rounds verbatim. Candidate lists are
    * expected k-bounded per query (the ANN top-k output) — each round
    * is one equi-join + hash agg + window over those bounded groups,
    * never the corpus — the RAG diversity re-rank that runs after
    * [[bruteForceTopK]]/IVF retrieval.
    *
    * cands: (query_id, cand_id, relq); sims: (query_id, ca, cb, simq)
    * with BOTH orientations present. Emits (query_id, pos, cand_id,
    * rel_q6, mmr_q6) with mmr_q6 = lamNum·rel − (lamDen−lamNum)·maxSim
    * (position 1 has no diversity term).
    *
    * Computed ROW-LOCALLY per query: the per-query state is k-bounded
    * by construction (≤k candidates, ≤k² candidate-pair sims), so
    * instead of k rounds of join + window jobs the candidates and sims
    * are grouped into per-query arrays — ONE shuffle each — and the
    * greedy argmax loop runs inside a scalar UDF over those bounded
    * arrays. A candidate with no sim to any chosen row is skipped that
    * round (mirrors the join-based plan's inner join).
    *
    * CONTRACT (narrower than the retired join-based plan): cand_id /
    * ca / cb must be integral (castable to bigint without loss) and
    * relq / simq must already be 1e6-QUANTIZED LONGS — the row-local
    * greedy compares exact longs. String ids or raw doubles are
    * rejected up front rather than silently null-cast / truncated. */
  def mmrRerank(cands: DataFrame, sims: DataFrame, k: Int,
                lamNum: Long = 7L, lamDen: Long = 10L): DataFrame = {
    require(k >= 1 && lamNum >= 0 && lamNum <= lamDen,
      s"bad MMR params: k=$k lambda=$lamNum/$lamDen")
    // Fail fast on schema drift: every id/score column must be an
    // integral type (the UDF consumes exact longs).
    def requireIntegral(df: DataFrame, cols: Seq[String], who: String): Unit =
      cols.foreach { c =>
        val dt = df.schema(c).dataType
        require(Seq("byte", "short", "integer", "long")
          .contains(dt.typeName),
          s"mmrRerank $who.$c must be integral (bigint ids, 1e6-" +
            s"quantized long scores); got ${dt.typeName}")
      }
    requireIntegral(cands, Seq("cand_id", "relq"), "cands")
    requireIntegral(sims, Seq("ca", "cb", "simq"), "sims")
    val muNum = lamDen - lamNum
    val greedy = udf((cs: Seq[Seq[Long]], ss: Seq[Seq[Long]]) => {
      val cand = cs.map(a => (a(0), a(1))).sortBy(_._1)
      val sim = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
      if (ss != null) ss.foreach { a =>
        val key = (a(0), a(1))
        if (a(2) > sim.getOrElse(key, Long.MinValue)) sim(key) = a(2)
      }
      val chosen = scala.collection.mutable.Buffer.empty[Long]
      val out = scala.collection.mutable.Buffer.empty[(Int, Long, Long, Long)]
      var pos = 1
      var exhausted = false
      while (pos <= k && chosen.size < cand.size && !exhausted) {
        var bestId = -1L; var bestRel = 0L; var bestMmr = Long.MinValue
        var found = false
        cand.foreach { case (id, rel) =>
          if (!chosen.contains(id)) {
            var msim = Long.MinValue
            chosen.foreach { c =>
              val s = sim.getOrElse((id, c), Long.MinValue)
              if (s > msim) msim = s
            }
            if (pos == 1 || msim != Long.MinValue) {
              val mmr = if (pos == 1) lamNum * rel
                        else lamNum * rel - muNum * msim
              // ascending-id iteration + strict '>' = ties to smaller id
              if (!found || mmr > bestMmr) {
                bestId = id; bestRel = rel; bestMmr = mmr; found = true
              }
            }
          }
        }
        if (!found) exhausted = true
        else { out += ((pos, bestId, bestRel, bestMmr)); chosen += bestId }
        pos += 1
      }
      out.toSeq
    })
    val ca = cands.groupBy(col("query_id")).agg(collect_list(
      array(col("cand_id").cast("long"), col("relq").cast("long"))).as("cs"))
    val sa = sims.groupBy(col("query_id")).agg(collect_list(
      array(col("ca").cast("long"), col("cb").cast("long"),
        col("simq").cast("long"))).as("ss"))
    ca.join(sa, Seq("query_id"), "left")
      .select(col("query_id"), explode(greedy(col("cs"), col("ss"))).as("g"))
      .select(col("query_id"), col("g._1").as("pos"), col("g._2").as("cand_id"),
        col("g._3").as("rel_q6"), col("g._4").as("mmr_q6"))
  }

  /** Per-query top-k by ascending ADC distance, same aggregator. */
  private def rankDistTopK(scored: DataFrame, k: Int): DataFrame =
    graft.aggregators.TopK.topKPerKey(scored, "query_id", "neighbor_id", "d", k,
        descending = false)
      .select(col("query_id"), col("neighbor_id"),
        round(col("d"), 6).as("approx_dist"), col("rank"))

  /** All pairs with cosine >= threshold (near-duplicate detection),
    * exact, computed as a distributed block-matrix join.
    *
    * Why not a pair join: pushing n^2/2 candidate rows through Spark's
    * join machinery costs ~20us/row (array copy + predicate eval per
    * row), which dwarfs the actual flop cost of the dot products by
    * ~1000x. And why not LSH blocking: at moderate thresholds (<~0.8)
    * sign-random-projection banding has a poor recall/cost frontier
    * (measured on this corpus at t=0.45: 81% recall still evaluates 31%
    * of all pairs) — for *exact* semantics the n^2 dot products are
    * inherent, so the scale problem is purely "do them at memory
    * bandwidth, distributed". Design: rows hash into `numBlocks` blocks;
    * each row is replicated to every block-pair key (min(b,k),max(b,k))
    * — an equi-key, so the shuffle is a plain hash partition of n x
    * numBlocks rows, no broadcast, no theta join; each of the
    * numBlocks*(numBlocks+1)/2 groups computes its pair block with a
    * tight compiled loop. Work and memory per task are (n/numBlocks)^2*d
    * and 2n/numBlocks rows — pick numBlocks ~ sqrt(n^2*d / work-per-task)
    * as the corpus grows, independent of executor count. For corpora
    * where exact n^2 is genuinely infeasible (1e9+ rows) use
    * [[cosineNearDupPairsLSH]] at a high threshold instead.
    * Dot products accumulate left-to-right, matching the DuckDB oracle
    * bit-for-bit. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double, numBlocks: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val e = df.select(col("vec_id").cast("long").as("vec_id"),
        toDouble(col("embedding")).as("emb"))
      .withColumn("nrm", norm(col("emb")))
      .withColumn("block", pmod(col("vec_id"), lit(numBlocks)).cast("int"))
    val replicated = e
      .withColumn("k", explode(sequence(lit(0), lit(numBlocks - 1))))
      .select(least(col("block"), col("k")).as("bi"),
        greatest(col("block"), col("k")).as("bj"),
        col("block"), col("vec_id"), col("emb"), col("nrm"))
      .as[(Int, Int, Int, Long, Array[Double], Double)]
    replicated
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Int, Long, Array[Double], Double)]) =>
        val (bi, bj) = key
        val left = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
        val right = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
        it.foreach { case (_, _, blk, id, emb, nrm) =>
          if (blk == bi) left += ((id, emb, nrm))
          else right += ((id, emb, nrm))
        }
        def dotl(a: Array[Double], b: Array[Double]): Double = {
          var s = 0.0; var i = 0; val n = a.length
          while (i < n) { s += a(i) * b(i); i += 1 }
          s
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        def emit(a: (Long, Array[Double], Double), b: (Long, Array[Double], Double)): Unit = {
          val (lo, hi) = if (a._1 < b._1) (a, b) else (b, a)
          val cos = dotl(lo._2, hi._2) / (lo._3 * hi._3)
          if (cos >= threshold) out += ((lo._1, hi._1, cos))
        }
        if (bi == bj) {
          var i = 0
          while (i < left.length) {
            var j = i + 1
            while (j < left.length) { emit(left(i), left(j)); j += 1 }
            i += 1
          }
        } else {
          var i = 0
          while (i < left.length) {
            var j = 0
            while (j < right.length) { emit(left(i), right(j)); j += 1 }
            i += 1
          }
        }
        out
      }
      .toDF("id_a", "id_b", "cos")
      // round via Spark's HALF_UP so hashes agree with the DuckDB oracle
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }

  /** Per-band SRP bucket ids: band b hashes with its own `planesPerBand`
    * md5-derived hyperplanes (global plane index b*planesPerBand+p), so
    * bands are independent bucketings. */
  def srpBandBuckets(emb: Column, planesPerBand: Int, numBands: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)), b =>
      aggregate(
        transform(sequence(lit(0), lit(planesPerBand - 1)), p =>
          when(aggregate(
                 zip_with(emb, sequence(lit(0), size(emb) - 1),
                   (x, i) => x * planeWeight(b * planesPerBand + p, i)),
                 lit(0.0), (acc, x) => acc + x) > 0,
               pow(lit(2.0), p).cast("long")).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x))

  /** [[srpBandBuckets]] with the hyperplanes folded in as literal weight
    * arrays (plan-time md5, codegen'd dot products per band) — use when
    * the embedding width is known; the dynamic variant pays one md5 per
    * (plane, dim) per ROW. */
  def srpBandBucketsLit(emb: Column, planesPerBand: Int, numBands: Int, dim: Int): Column =
    array((0 until numBands).map(b =>
      (0 until planesPerBand).map { p =>
        val w = Array.tabulate(dim)(i => planeWeightValue(b * planesPerBand + p, i))
        when(dotFast(emb, lit(w)) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)): _*)

  /** Approximate near-dup pairs for high thresholds: SRP banded LSH
    * candidates (pair is a candidate when any band's bucket matches —
    * same band shape as the MinHash dedup pipeline) then exact cosine
    * verify. Recall per pair at cosine s: 1-(1-(1-acos(s)/pi)^P)^B, e.g.
    * ~0.97 for s=0.9 with P=8,B=8. Each shuffle key is (band, bucket) —
    * fully hash-partitioned, no broadcast; use for corpora where exact
    * [[cosineNearDupPairs]] is infeasible. */
  def cosineNearDupPairsLSH(df: DataFrame, threshold: Double,
      planesPerBand: Int = 8, numBands: Int = 8, dim: Int = 64): DataFrame = {
    val e = df.select(col("vec_id"), toDouble(col("embedding")).as("emb"))
      .withColumn("nrm", norm(col("emb")))
      .withColumn("bands", srpBandBucketsLit(col("emb"), planesPerBand, numBands, dim))
      .select(col("vec_id"), col("emb"), col("nrm"),
        posexplode(col("bands")).as(Seq("band", "bucket")))
    e.as("a").join(e.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        cosinePreNormed(dotFast(col("a.emb"), col("b.emb")),
          col("a.nrm"), col("b.nrm")).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
      .distinct()
  }

  /** Deterministic md5-derived hyperplane weight for (plane, dim):
    * uniform in [-1, 1). 2^60 = 1152921504606846976. */
  private def planeWeight(p: Column, i: Column): Column =
    hash60(concat_ws(":", lit("srp"), p, i)).cast("double") / 1.152921504606846976e18 * 2.0 - 1.0

  /** Scala-side twin of [[planeWeight]] — identical arithmetic, computed
    * once at plan time instead of one md5 PER ROW per (plane, dim):
    * with 64 dims and 6 planes the per-row expression form costs 384
    * md5 calls per row, which dominated the ANN queries. */
  private[graft] def planeWeightValue(p: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"srp:$p:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) / 1.152921504606846976e18 * 2.0 - 1.0
  }

  /** Sign-random-projection LSH bucket: bit p of the bucket id is the
    * sign of the projection onto md5-derived hyperplane p. Rows landing
    * in the same bucket are near-neighbor candidates. `dim` fixes the
    * embedding width so the hyperplanes fold in as literal arrays. */
  def srpBucket(emb: Column, numPlanes: Int, dim: Int): Column =
    (0 until numPlanes).map { p =>
      val w = Array.tabulate(dim)(i => planeWeightValue(p, i))
      when(dotFast(emb, lit(w)) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Dynamic-width variant (one md5 per (plane, dim) per ROW — prefer
    * the literal-weight overload when the width is known). */
  def srpBucket(emb: Column, numPlanes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(numPlanes - 1)), p =>
        when(aggregate(
               zip_with(emb, sequence(lit(0), size(emb) - 1),
                 (x, i) => x * planeWeight(p, i)),
               lit(0.0), (acc, x) => acc + x) > 0,
             pow(lit(2.0), p).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** Multi-probe SRP ANN: a corpus row is a candidate when its bucket is
    * within hamming distance 1 of the query's bucket — realized as an
    * EQUI-join by exploding each query into numPlanes+1 probe buckets
    * (exact + each single-bit flip), so the plan is a hash join keyed on
    * bucket, never a theta join. Probing recovers the recall that more
    * planes cost: numPlanes should grow ~log2(corpus/targetBucketSize)
    * as the corpus grows; radius-1 probing then multiplies candidates by
    * ~(numPlanes+1) while buckets shrink 2^planes-fold. Deterministic
    * md5 hyperplanes — the oracle replays candidates via
    * bit_count(xor(buckets)) <= 1. */
  def srpTopKProbed(corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int,
                    dim: Int = 64): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      toDouble(col("embedding")).as("c_emb"))
      .withColumn("bucket", srpBucket(col("c_emb"), numPlanes, dim))
      .withColumn("c_nrm", norm(col("c_emb")))
    val q = queries.select(col("vec_id").as("query_id"),
      toDouble(col("embedding")).as("q_emb"))
      .withColumn("bucket", srpBucket(col("q_emb"), numPlanes, dim))
      .withColumn("q_nrm", norm(col("q_emb")))
      .withColumn("probe", explode(transform(sequence(lit(0), lit(numPlanes)), j =>
        when(j === numPlanes, col("bucket"))
          .otherwise(col("bucket").bitwiseXOR(pow(lit(2.0), j).cast("long"))))))
    val scored = c.join(broadcast(q), c("bucket") === q("probe"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePreNormed(dotFast(col("q_emb"), col("c_emb")),
          col("q_nrm"), col("c_nrm")).as("cos"))
    rankCosTopK(scored, k)
  }

  /** IVF (inverted-file) coarse quantization — the other classic ANN
    * scale path next to LSH: partition the corpus into `nList` cells
    * around centroid vectors; a query probes only the `nProbe` cells
    * whose centroids score highest, then exact-re-ranks inside them, so
    * query work drops from O(n) to ~O(n·nProbe/nList) while the
    * assignment pass stays one corpus scan against a broadcast centroid
    * table. Centroids are tiny (nList×dim doubles) so the fit collects
    * them to the driver and broadcasts — the same per-iteration shape
    * spark.ml KMeans uses; at 100 TB grow nList ~ sqrt(n) and the
    * mechanics are unchanged.
    *
    * Centroid fit: deterministic seeds (the embeddings of the nList
    * smallest ids — oracle-replayable), optionally refined with
    * `lloydRounds` spherical k-means rounds (mean of assigned unit
    * vectors; refined centroids are float-sum order-sensitive, so gate
    * refined indexes with recall specs, not hash oracles). */
  def ivfCentroids(corpus: DataFrame, nList: Int, lloydRounds: Int = 0): Array[Array[Double]] = {
    val e = corpus.select(col("vec_id"), toDouble(col("embedding")).as("emb"))
    // each round is an INDEPENDENT shallow job (centroids live in a
    // driver array captured by the next round's udf — lineage depth is
    // constant by construction); persist the projected frame so rounds
    // re-read cached vectors instead of re-scanning the corpus
    if (lloydRounds > 0)
      e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Array[Array[Double]] = e.orderBy(col("vec_id")).limit(nList)
      .collect().map(_.getSeq[Double](1).toArray)
    var round = 0
    while (round < lloydRounds) {
      val assign = ivfAssignUdf(cents)
      // per-(cell, dim) mean via posexplode: partial+final avg, never a
      // whole-cell vector list in one buffer — the 100 TB-safe form
      val refined = e.withColumn("cell", assign(col("emb")))
        .select(col("cell"), posexplode(col("emb")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("m"))
        .collect().groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray }
      cents = Array.tabulate(cents.length)(i => refined.getOrElse(i, cents(i)))
      round += 1
    }
    if (lloydRounds > 0) e.unpersist(blocking = false)
    cents
  }

  /** Cell id = argmax over centroids of cosine(emb, centroid), ties to
    * the smaller cell id — the exact ordering the oracle replays with
    * ROW_NUMBER OVER (ORDER BY cos DESC, cid ASC). */
  private def ivfAssignUdf(cents: Array[Array[Double]]) = {
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    udf((e: Seq[Double]) => {
      val a = e.toArray
      var en = 0.0; var i = 0
      while (i < a.length) { en += a(i) * a(i); i += 1 }
      en = math.sqrt(en)
      var best = Double.NegativeInfinity; var bestC = 0; var c = 0
      while (c < cents.length) {
        val cc = cents(c); var s = 0.0; var j = 0
        while (j < cc.length) { s += a(j) * cc(j); j += 1 }
        val cos = s / (en * norms(c))
        if (cos > best) { best = cos; bestC = c }
        c += 1
      }
      bestC
    })
  }

  /** The query-side probe list: the nProbe cells with the highest
    * centroid cosine, in (cos desc, cid asc) order. */
  private def ivfProbeUdf(cents: Array[Array[Double]], nProbe: Int) = {
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    udf((e: Seq[Double]) => {
      val a = e.toArray
      var en = 0.0; var i = 0
      while (i < a.length) { en += a(i) * a(i); i += 1 }
      en = math.sqrt(en)
      val scored = Array.tabulate(cents.length) { c =>
        val cc = cents(c); var s = 0.0; var j = 0
        while (j < cc.length) { s += a(j) * cc(j); j += 1 }
        (s / (en * norms(c)), c)
      }
      scored.sortBy { case (cos, c) => (-cos, c) }.take(nProbe).map(_._2)
    })
  }

  /** IVF ANN top-k: assign the corpus once (broadcast centroids, one
    * scan), explode each query into its nProbe probe cells, hash-join
    * on the cell id, exact cosine re-rank — no all-pairs product, every
    * shuffle keyed on a cell id. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nList: Int,
              nProbe: Int, lloydRounds: Int = 0): DataFrame = {
    val cents = ivfCentroids(corpus, nList, lloydRounds)
    val c = corpus.select(col("vec_id").as("neighbor_id"),
        toDouble(col("embedding")).as("c_emb"))
      .withColumn("cell", ivfAssignUdf(cents)(col("c_emb")))
      .withColumn("c_nrm", norm(col("c_emb")))
    val q = queries.select(col("vec_id").as("query_id"),
        toDouble(col("embedding")).as("q_emb"))
      .withColumn("probe", explode(ivfProbeUdf(cents, nProbe)(col("q_emb"))))
      .withColumn("q_nrm", norm(col("q_emb")))
    val scored = c.join(broadcast(q), c("cell") === q("probe"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePreNormed(dotFast(col("q_emb"), col("c_emb")),
          col("q_nrm"), col("c_nrm")).as("cos"))
    rankCosTopK(scored, k)
  }

  /** Product quantization (PQ) — the memory-compression scale path for
    * ANN: each embedding is split into `m` subvectors and every
    * subvector replaced by the id of its nearest per-subspace centroid,
    * so a 64-float (256 B) embedding becomes m small codes (m bytes at
    * nCodes<=256). A query scans codes with an ADC lookup table
    * (per-subspace distance to every centroid, computed once per
    * query), never touching raw vectors — at 100 TB the corpus fits in
    * a fraction of the memory and the scan is table lookups + adds.
    * Codebooks here are deterministic seeds (the subvectors of the
    * nCodes smallest ids) so the whole pipeline replays in the oracle;
    * production codebooks come from per-subspace k-means (swap the
    * seeding, nothing else changes). */
  def pqCodebooks(corpus: DataFrame, m: Int, nCodes: Int): Array[Array[Array[Double]]] = {
    val seeds = corpus.select(col("vec_id"), toDouble(col("embedding")).as("emb"))
      .orderBy(col("vec_id")).limit(nCodes)
      .collect().map(_.getSeq[Double](1).toArray)
    val dsub = seeds(0).length / m
    Array.tabulate(m)(j => seeds.map(_.slice(j * dsub, (j + 1) * dsub)))
  }

  /** Per-subspace L2 argmin encode, ties to the smaller code id. */
  private def pqEncodeUdf(books: Array[Array[Array[Double]]]) = {
    val dsub = books(0)(0).length
    udf((e: Seq[Double]) => {
      val a = e.toArray
      books.indices.map { j =>
        var best = Double.PositiveInfinity; var bestC = 0; var c = 0
        while (c < books(j).length) {
          val cent = books(j)(c); var s = 0.0; var i = 0
          while (i < dsub) { val d = a(j * dsub + i) - cent(i); s += d * d; i += 1 }
          if (s < best) { best = s; bestC = c }
          c += 1
        }
        bestC
      }
    })
  }

  /** ADC lookup tables for a query: lut(j)(c) = ||q_j - centroid_jc||². */
  private def pqLutUdf(books: Array[Array[Array[Double]]]) = {
    val dsub = books(0)(0).length
    udf((e: Seq[Double]) => {
      val a = e.toArray
      books.indices.map(j => books(j).indices.map { c =>
        val cent = books(j)(c); var s = 0.0; var i = 0
        while (i < dsub) { val d = a(j * dsub + i) - cent(i); s += d * d; i += 1 }
        s
      })
    })
  }

  private val pqAdcUdf = udf((codes: Seq[Int], luts: Seq[Seq[Double]]) => {
    var s = 0.0; var j = 0
    while (j < codes.length) { s += luts(j)(codes(j)); j += 1 }
    s
  })

  /** PQ ANN top-k by ascending ADC distance: corpus encoded once
    * (broadcast codebooks, one scan), queries carry their lookup
    * tables, candidates scored with m table lookups per pair. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int, nCodes: Int): DataFrame = {
    val books = pqCodebooks(corpus, m, nCodes)
    val c = corpus.select(col("vec_id").as("neighbor_id"),
        pqEncodeUdf(books)(toDouble(col("embedding"))).as("codes"))
    val q = queries.select(col("vec_id").as("query_id"),
        pqLutUdf(books)(toDouble(col("embedding"))).as("luts"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        pqAdcUdf(col("codes"), col("luts")).as("d"))
    rankDistTopK(scored, k)
  }

  /** IVF-PQ — the composition FAISS made canonical for billion-scale
    * ANN: IVF coarse cells prune the search to nProbe cells' candidates,
    * PQ codes replace raw vectors inside the cells, and queries rank the
    * surviving candidates by ADC lookup. Memory per corpus row = one
    * cell id + m codes; query cost = nProbe/nList of the corpus at m
    * lookups per candidate. Both component fits are the deterministic
    * seed variants, so the composition replays in the oracle end-to-end. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nList: Int, nProbe: Int, m: Int, nCodes: Int): DataFrame = {
    val cents = ivfCentroids(corpus, nList)
    val books = pqCodebooks(corpus, m, nCodes)
    val c = corpus.select(col("vec_id").as("neighbor_id"),
        toDouble(col("embedding")).as("c_emb"))
      .withColumn("cell", ivfAssignUdf(cents)(col("c_emb")))
      .withColumn("codes", pqEncodeUdf(books)(col("c_emb")))
      .drop("c_emb") // raw vectors are NOT carried into the scan
    val q = queries.select(col("vec_id").as("query_id"),
        toDouble(col("embedding")).as("q_emb"))
      .withColumn("probe", explode(ivfProbeUdf(cents, nProbe)(col("q_emb"))))
      .withColumn("luts", pqLutUdf(books)(col("q_emb")))
      .drop("q_emb")
    val scored = c.join(broadcast(q), c("cell") === q("probe"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        pqAdcUdf(col("codes"), col("luts")).as("d"))
    rankDistTopK(scored, k)
  }

  /** LSH-bucketed ANN: candidates share the query's SRP bucket; exact
    * cosine re-rank within the bucket. Approximate (recall < 1) but
    * deterministic — the oracle replays the identical buckets. */
  def srpTopK(corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int,
              dim: Int = 64): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      toDouble(col("embedding")).as("c_emb"))
      .withColumn("bucket", srpBucket(col("c_emb"), numPlanes, dim))
      .withColumn("c_nrm", norm(col("c_emb")))
    val q = queries.select(col("vec_id").as("query_id"),
      toDouble(col("embedding")).as("q_emb"))
      .withColumn("bucket", srpBucket(col("q_emb"), numPlanes, dim))
      .withColumn("q_nrm", norm(col("q_emb")))
    val scored = c.join(broadcast(q), "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePreNormed(dotFast(col("q_emb"), col("c_emb")),
          col("q_nrm"), col("c_nrm")).as("cos"))
    rankCosTopK(scored, k)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, public arXiv
    * 2303.09540): cluster embeddings into IVF cells, call two documents
    * semantic duplicates when their cosine inside a shared cell clears
    * `threshold`, connect the pairs into components, and keep one
    * representative (min id) per component. Emits every vector with its
    * cell, component label, and the keep decision — the caller filters.
    *
    * Scale shape: cell assignment is one scan against broadcast
    * centroids (same as [[ivfTopK]]); the pair search is an EQUI-join
    * on the cell id — within-cell quadratic, which is the published
    * algorithm's own design point (choose nList so cells average
    * n/nList docs; at 100 TB grow nList ~ sqrt(n) and hot cells stay
    * bounded). Deterministic-seed centroids keep the whole decision
    * replayable by the differential oracle; production would swap in
    * k-means centroids and gate with recall specs instead. */
  def semanticDedup(corpus: DataFrame, threshold: Double, nList: Int): DataFrame = {
    val assign = ivfAssignUdf(ivfCentroids(corpus, nList))
    // persisted: feeds both sides of the pair join and the final output
    val e = corpus.select(col("vec_id"), toDouble(col("embedding")).as("emb"))
      .withColumn("cell", assign(col("emb")))
      .withColumn("nrm", norm(col("emb")))
      .persist()
    val pairs = e.as("a").join(e.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .where(cosinePreNormed(dotFast(col("a.emb"), col("b.emb")),
        col("a.nrm"), col("b.nrm")) >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    val comp = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("vec_id"), col("component"))
    e.select(col("vec_id"), col("cell"))
      .join(comp, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("component"), col("vec_id")).as("component"),
        (col("component").isNull || col("component") === col("vec_id")).as("keep"))
  }

  /** NDCG@k of an approximate retrieval against an exact ranking: both
    * inputs are (query_id, neighbor_id, rank) frames (the shape every
    * top-k operator here emits). Binary relevance — an approx hit is
    * relevant iff it appears in the truth's top k — discounted by
    * 1/log2(rank+1); IDCG assumes the ideal ordering of the truth set,
    * so ndcg = 1.0 iff the approx list contains exactly the truth set in
    * rank order. Join keyed on (query, neighbor); per-query frames are
    * O(k) rows, so every aggregate is bounded. Queries the approx side
    * missed entirely score 0 (right outer join on the truth's query
    * set). */
  /** Recall@k: fraction of the exact top-k each query's approximate
    * list recovered — the blunt companion to [[ndcgAtK]] (rank-blind).
    * Same (query_id, neighbor_id, rank) contract and join shape. */
  def recallAtK(approx: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = approx.select(col("query_id"), col("neighbor_id"))
      .where(col("rank") <= k)
    val t = truth.select(col("query_id"), col("neighbor_id"))
      .where(col("rank") <= k)
    val hits = a.join(t, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    t.groupBy(col("query_id")).agg(count(lit(1)).as("n_truth"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        round(coalesce(col("n_hit"), lit(0L)) / col("n_truth"), 6).as("recall"))
  }

  def ndcgAtK(approx: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = approx.select(col("query_id"), col("neighbor_id"), col("rank"))
      .where(col("rank") <= k)
    val t = truth.select(col("query_id"), col("neighbor_id"))
      .where(col("rank") <= k).withColumn("rel", lit(1))
    val dcg = a.join(t, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("rel"), lit(0)) / log2(col("rank") + 1)).as("dcg"))
    val idcg = truth.where(col("rank") <= k)
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_truth"))
      .select(col("query_id"),
        aggregate(sequence(lit(1), col("n_truth").cast("int")), lit(0.0),
          (acc, i) => acc + lit(1.0) / log2(i + 1)).as("idcg"))
    idcg.join(dcg, Seq("query_id"), "left")
      .select(col("query_id"),
        round(coalesce(col("dcg"), lit(0.0)) / col("idcg"), 6).as("ndcg"))
  }

  /** Mean-reciprocal-rank@k per query: 1/rank of the FIRST relevant
    * neighbor inside the approximate top-k (relevance = membership in
    * the truth top-k), 0 when none lands — the metric that rewards
    * putting A relevant answer early, where recall@k only counts
    * coverage. Same join shape as [[recallAtK]]. */
  def mrrAtK(approx: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = approx.select(col("query_id"), col("neighbor_id"), col("rank"))
      .where(col("rank") <= k)
    val t = truth.select(col("query_id"), col("neighbor_id"))
      .where(col("rank") <= k)
    val firstHit = a.join(t, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(min(col("rank")).as("first_hit"))
    truth.select(col("query_id")).distinct()
      .join(firstHit, Seq("query_id"), "left")
      .select(col("query_id"),
        round(coalesce(lit(1.0) / col("first_hit"), lit(0.0)), 6).as("rr"))
  }

  /** Symmetric per-vector int8 quantization — the 4x storage/bandwidth
    * cut every 100 TB embedding store takes before ANN: scale =
    * max|x| / 127 (degenerate all-zero vectors pin scale via an eps
    * floor), q_i = clamp(round(x_i / scale), ±127). Row-local,
    * codegen'd, exactly replayable (float→double widening is exact,
    * round is half-away-from-zero in both engines). Emits the scale and
    * the quantization summary (exact int sum/min/max of codes, max
    * absolute dequantization error) rather than the code array itself —
    * the verifiable fingerprint of the full codes. */
  def quantizeInt8(corpus: DataFrame, id: Column, embedding: Column): DataFrame = {
    val emb = toDouble(embedding)
    corpus.select(id.as("vec_id"), emb.as("__emb"))
      .withColumn("__scale", greatest(
        aggregate(col("__emb"), lit(0.0), (a, x) => greatest(a, abs(x))),
        lit(1e-30)) / 127.0)
      .withColumn("__q", transform(col("__emb"), x =>
        least(greatest(round(x / col("__scale")), lit(-127.0)), lit(127.0))
          .cast("int")))
      .select(col("vec_id"),
        size(col("__q")).as("n_dims"),
        round(col("__scale"), 9).as("scale"),
        aggregate(col("__q"), lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(col("__q")).as("q_min"),
        array_max(col("__q")).as("q_max"),
        round(aggregate(zip_with(col("__emb"), col("__q"),
            (x, q) => abs(x - q.cast("double") * col("__scale"))),
          lit(0.0), (a, e) => greatest(a, e)), 9).as("max_abs_err"))
  }

  /** Brute top-k over ROW-SYMMETRIC int8 codes (per-row scale =
    * max|x|/127, the standard serving-time quantization
    * [[quantizeInt8]] fingerprints): ranking cosine =
    * dot/(√self_q·√self_c) over EXACT integer sums, so the quantized
    * ranking — and therefore its recall against the f32
    * [[bruteForceTopK]] truth — replays bit-stable in SQL. Same
    * broadcast-probe-set scan shape as the brute oracle path; codes
    * are a narrow per-row map. */
  def int8TopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    def codes(df: DataFrame, idAs: String, qAs: String, selfAs: String) = {
      val emb = toDouble(col("embedding"))
      df.select(col("vec_id").as(idAs), emb.as("__e"))
        .withColumn("__scale", greatest(
          aggregate(col("__e"), lit(0.0), (a, x) => greatest(a, abs(x))),
          lit(1e-30)) / 127.0)
        .withColumn(qAs, transform(col("__e"), x =>
          least(greatest(round(x / col("__scale")), lit(-127.0)),
            lit(127.0)).cast("long")))
        .select(col(idAs), col(qAs),
          aggregate(col(qAs), lit(0L), (a, x) => a + x * x).as(selfAs))
    }
    val c = codes(corpus, "neighbor_id", "qc", "sc")
    val q = codes(queries, "query_id", "qq", "sq")
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (aggregate(zip_with(col("qq"), col("qc"), (a, b) => a * b),
          lit(0L), (acc, v) => acc + v).cast("double") /
          (sqrt(col("sq").cast("double")) * sqrt(col("sc").cast("double"))))
          .as("cos"))
    rankCosTopK(scored, k)
  }
}
