package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Projection, Similarity}

/** Oracle-gated similarity-search queries over `embeddings`:
  * brute-force cosine top-k, cosine near-dup pairs, and SRP-LSH
  * bucketed approximate top-k. Dot products are sequential
  * left-to-right in both engines so doubles agree.
  */
object SimilarityQueries {

  type Q = (SparkSession, String) => DataFrame

  private val K = 10
  private val QUERY_PRED = "vec_id < 5"

  val queries: Map[String, Q] = Map(
    // per-label centroid drift matrix: label centroids via
    // order-invariant integer folds (components quantized to 1e-9 with
    // round-half-away — identical in both engines even on exact ties,
    // unlike a raw double->bigint cast, which rounds half-even in
    // DuckDB), then pairwise cosine + euclidean between the k=10
    // centroids with 1e-12-quantized products. The embedding-space
    // audit for "did this label's cluster move between snapshots";
    // everything after the per-(label, dim) agg is k²·dim-bounded.
    "q299_centroid_drift" -> ((s, d) => {
      val ex = Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("label"), col("dim"),
          round(col("x").cast("double") * 1e9, 0).cast("long").as("xq"))
      val cent = ex.groupBy(col("label"), col("dim"))
        .agg(sum(col("xq")).as("sq"), count(lit(1)).as("n"))
        .select(col("label"), col("dim"),
          (col("sq").cast("double") / col("n").cast("double") / 1e9).as("m"))
      val a = cent.select(col("label").as("la"), col("dim"), col("m").as("ma"))
      val b = cent.select(col("label").as("lb"), col("dim"), col("m").as("mb"))
      a.join(b, Seq("dim")).where(col("la") < col("lb"))
        .groupBy(col("la").cast("int").as("label_a"),
          col("lb").cast("int").as("label_b"))
        .agg(
          sum(round(col("ma") * col("mb") * 1e12, 0).cast("long")).as("pq"),
          sum(round(col("ma") * col("ma") * 1e12, 0).cast("long")).as("pp"),
          sum(round(col("mb") * col("mb") * 1e12, 0).cast("long")).as("qq"),
          sum(round((col("ma") - col("mb")) * (col("ma") - col("mb")) * 1e12, 0)
            .cast("long")).as("dd"))
        .select(col("label_a"), col("label_b"),
          round(col("pq").cast("double") /
            sqrt(col("pp").cast("double") * col("qq").cast("double")), 6)
            .as("cosine"),
          round(sqrt(col("dd").cast("double") / 1e12), 6).as("euclidean"))
    }),

    // k-NN CLASSIFIER under the hash gate: 10-nearest-by-cosine
    // majority label (ties to the smaller label) for every 29th vector
    // — a whole trained-model inference that IS SQL-replayable, unlike
    // the iterative fits on the rows-only list
    "q327_knn_classify" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val topk = Similarity.bruteForceTopK(e,
        e.where(col("vec_id") % 29 === 0), K)
      val lab = e.select(col("vec_id").as("neighbor_id"),
        col("label").cast("int").as("nl"))
      val votes = topk.join(broadcast(lab), Seq("neighbor_id"))
        .groupBy(col("query_id"), col("nl")).agg(count(lit(1)).as("votes"))
      val pred = votes.groupBy(col("query_id"))
        .agg(min_by(col("nl"), (-col("votes")) * 100 + col("nl"))
          .as("pred_label"),
          max(col("votes")).as("top_votes"))
      pred.join(broadcast(e.select(col("vec_id").as("query_id"),
          col("label").cast("int").as("true_label"))), Seq("query_id"))
        .select(col("query_id"), col("pred_label"), col("true_label"),
          col("top_votes"),
          when(col("pred_label") === col("true_label"), 1).otherwise(0)
            .as("correct"))
    }),

    // symmetric int8 quantization of the embedding store: per-vector
    // scale + exact code-summary fingerprint (sum/min/max/max-error)
    "q261_embedding_quantize" -> ((s, d) => {
      Similarity.quantizeInt8(Tables.embeddings(s, d),
        col("vec_id"), col("embedding"))
    }),

    "q26_sim_bruteforce_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(e, e.where(expr(QUERY_PRED)), K)
    }),

    "q27_sim_cosine_neardup" -> ((s, d) => {
      Similarity.cosineNearDupPairs(Tables.embeddings(s, d), 0.45)
    }),

    // hard-negative mining (contrastive-training sampling step): per
    // anchor, top-10 candidates inside the cosine band [0.15, 0.35) —
    // informative negatives above the noise floor, below this corpus's
    // near-dup zone (q27 cuts at 0.45). Brute-force gate path; the
    // banded filter drops onto the IVF/SRP candidate streams at scale
    "q527_hard_negatives" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.hardNegativesTopK(e, e.where(expr(QUERY_PRED)), K,
        lo = 0.15, hi = 0.35)
    }),

    // embedding-space isotropy probe: mean (and mean absolute) cosine
    // over a deterministic md5 sample of vector pairs — anisotropic
    // (cone-shaped) embedding spaces show mean cosine >> 0, which
    // degrades cosine-based dedup/ANN; this is the health check run
    // before trusting them. Pair draws are md5-derived, cosines fold
    // through DECIMAL(18,12), so the oracle replays the exact numbers
    "q237_embedding_isotropy" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("emb"))
      // corpus size rides a 1-row broadcast frame (house standard)
      val n = e.agg(count(lit(1)).as("n"))
      val pairs = s.range(2000).crossJoin(broadcast(n)).select(
          pmod(graft.functions.TextAnalysis.hash60(
            concat(lit("isoA:"), col("id"))), col("n")).as("ia"),
          pmod(graft.functions.TextAnalysis.hash60(
            concat(lit("isoB:"), col("id"))), col("n")).as("ib"))
        .where(col("ia") =!= col("ib"))
      val cos = Similarity.cosine(col("ea"), col("eb"))
      pairs
        .join(e.select(col("vec_id").as("ia"), col("emb").as("ea")), Seq("ia"))
        .join(e.select(col("vec_id").as("ib"), col("emb").as("eb")), Seq("ib"))
        .select(cos.cast("decimal(18,12)").as("c"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(col("c")).cast("double"), 6).as("mean_cos"),
          round(avg(abs(col("c"))).cast("double"), 6).as("mean_abs_cos"),
          round(max(abs(col("c"))).cast("double"), 6).as("max_abs_cos"))
    }),

    // top covariance eigenvector of the first 16 embedding dims via 5
    // power-iteration rounds — the HASH-GATED principal component
    // (q189's Breeze PCA is rows-only by necessity; this replays every
    // round in the oracle): d²-bounded covariance pass, then joins
    // over a 16-row vector frame
    "q455_power_iteration" -> ((s, d) => {
      Projection.powerIteration(Tables.embeddings(s, d), col("vec_id"),
        col("embedding"), dims = 16, iters = 5)
    }),

    // MMR diversity re-ranking of the q26 top-10 lists (λ=0.7, k=5):
    // greedy argmax of 7·rel − 3·maxSim over 1e-6-quantized cosines —
    // exact-integer comparisons, ties to the smaller id — unrolled 5
    // rounds in the oracle; the post-retrieval step a RAG pipeline
    // runs to avoid returning five near-duplicates
    "q451_mmr_rerank" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cand = Similarity.bruteForceTopK(e, e.where(expr(QUERY_PRED)), K)
        .select(col("query_id"), col("neighbor_id").as("cand_id"),
          round(col("cosine") * 1e6).cast("long").as("relq"))
      val emb = e.select(col("vec_id"),
        Similarity.toDouble(col("embedding")).as("emb"))
      val ids = cand.select(col("query_id"), col("cand_id"))
      val prs = ids
        .join(ids.select(col("query_id"), col("cand_id").as("cb")),
          Seq("query_id"))
        .where(col("cand_id") =!= col("cb"))
      val sims = prs
        .join(emb.select(col("vec_id").as("cand_id"), col("emb").as("ea")),
          Seq("cand_id"))
        .join(emb.select(col("vec_id").as("cb"), col("emb").as("eb")),
          Seq("cb"))
        .select(col("query_id"), col("cand_id").as("ca"), col("cb"),
          round(Similarity.cosine(col("ea"), col("eb")) * 1e6).cast("long")
            .as("simq"))
      Similarity.mmrRerank(cand, sims, 5)
    }),

    // Matryoshka-style serving ablation: recall@10 of the PREFIX-dim
    // ranking (first 16 / 32 of 64 dims) against the full-dim truth —
    // the "how much ranking do I lose if I truncate stored vectors"
    // number a serving deployment reads before cutting memory 4x/2x.
    // Brute force on the gate path (broadcast probe set, never
    // all-pairs); at scale the same slice feeds the IVF/SRP streams.
    "q561_dim_ablation_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val truth = Similarity.bruteForceTopK(e, e.where(expr(QUERY_PRED)), K)
      def prefix(dd: Int) =
        e.select(col("vec_id"), slice(col("embedding"), 1, dd).as("embedding"))
      Seq(16, 32).map { dd =>
        val p = prefix(dd)
        Similarity.recallAtK(
            Similarity.bruteForceTopK(p, p.where(expr(QUERY_PRED)), K),
            truth, K)
          .withColumn("dims", lit(dd))
      }.reduce(_.unionByName(_))
        .select(col("dims"), col("query_id"), col("recall"))
    }),

    // label-error mining via embedding geometry: per label, the 5
    // vectors LEAST similar to their own label centroid (cosine to the
    // exact integer-mean centroid, ties to the smaller id) — the
    // "probably mislabeled" worklist a data-cleaning pass reviews.
    // Centroids are <=10x64 integer fit scalars (the IVF/kmeans
    // pattern: coordinates 1e6-quantized, per-(label,dim) exact-mean
    // collect, HALF_UP requantize), so scoring is one narrow codegen
    // map and the bottom-k rides the bounded TopK aggregator.
    "q565_label_outliers" -> ((s, d) => {
      def halfUp(x: Double): Long =
        BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val e = Tables.embeddings(s, d).select(col("vec_id"),
        col("label"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1e6).cast("long")).as("xq"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val centRows = e
        .select(col("label"), posexplode(col("xq")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect() // <= |labels| x 64 fit scalars
      val labels = centRows.map(_.getInt(0)).distinct.sorted
      require(labels.length <= 64, s"label domain too wide: ${labels.length}")
      val dims = centRows.map(_.getInt(1)).max + 1
      val cents: Map[Int, Array[Long]] = labels.map { l =>
        val a = new Array[Long](dims)
        centRows.filter(_.getInt(0) == l).foreach { r =>
          a(r.getInt(1)) = halfUp(r.getLong(2).toDouble / r.getLong(3).toDouble)
        }
        l -> a
      }.toMap
      def cosTo(c: Array[Long]): Column = {
        val cl = array(c.map(lit): _*)
        val dot = aggregate(zip_with(col("xq"), cl, (x, s) => x * s),
          lit(0L), (a, v) => a + v).cast("double")
        val nx = sqrt(aggregate(transform(col("xq"), x => x * x),
          lit(0L), (a, v) => a + v).cast("double"))
        val nc = lit(math.sqrt(c.map(v => v.toDouble * v.toDouble).sum))
        dot / (nx * nc)
      }
      val cosCol = labels.tail.foldLeft(
        when(col("label") === labels.head, cosTo(cents(labels.head)))) {
        (acc, l) => acc.when(col("label") === l, cosTo(cents(l)))
      }
      val scored = e.select(col("label"), col("vec_id"),
        round(cosCol, 6).as("cos_centroid"))
      val out = graft.aggregators.TopK.topKPerKey(scored, "label", "vec_id",
          "cos_centroid", 5, descending = false)
        .select(col("label"), col("vec_id"), col("cos_centroid"), col("rank"))
        .localCheckpoint(true)
      e.unpersist(blocking = false)
      out
    }),

    "q28_sim_srp_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.srpTopK(e, e.where(expr(QUERY_PRED)), K, numPlanes = 4)
    }),

    // recall@10 of the SRP-LSH list vs the brute-force truth
    "q155_ann_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val truth = Similarity.bruteForceTopK(e, e.where(expr(QUERY_PRED)), K)
      val approx = Similarity.srpTopK(e, e.where(expr(QUERY_PRED)), K, numPlanes = 4)
      Similarity.recallAtK(approx, truth, K)
    }),

    // retrieval-quality evaluation: MRR@10 — how early the SRP list
    // surfaces its first exact-top-k neighbor, per query
    "q268_ann_mrr" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val truth = Similarity.bruteForceTopK(e, e.where(expr(QUERY_PRED)), K)
      val approx = Similarity.srpTopK(e, e.where(expr(QUERY_PRED)), K, numPlanes = 4)
      Similarity.mrrAtK(approx, truth, K)
    }),

    // retrieval-quality evaluation: NDCG@10 of the SRP-LSH top-k
    // against the exact brute-force ranking, per query
    "q149_ann_ndcg" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val truth = Similarity.bruteForceTopK(e, e.where(expr(QUERY_PRED)), K)
      val approx = Similarity.srpTopK(e, e.where(expr(QUERY_PRED)), K, numPlanes = 4)
      Similarity.ndcgAtK(approx, truth, K)
    }),

    // int8 serving-quantization recall audit: recall@10 of the
    // integer-dot int8 ranking (q261's codes) against the f32
    // brute-force truth — the "what does 4x memory compression cost in
    // ranking" number an embedding-serving deployment reads before
    // switching formats
    "q548_int8_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val truth = Similarity.bruteForceTopK(e, e.where(expr(QUERY_PRED)), K)
      val approx = Similarity.int8TopK(e, e.where(expr(QUERY_PRED)), K)
      Similarity.recallAtK(approx, truth, K)
    }),

    // IVF coarse-quantization ANN: 16 deterministic-seed cells, queries
    // probe the 4 nearest cells, exact re-rank within them
    "q74_sim_ivf_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(e, e.where(expr(QUERY_PRED)), K, nList = 16, nProbe = 4)
    }),

    // SRP banded-LSH near-dup pairs + exact verify (the scale path for
    // cosine near-dup when the exact block-matrix is infeasible)
    "q89_sim_lsh_neardup" -> ((s, d) => {
      Similarity.cosineNearDupPairsLSH(Tables.embeddings(s, d), 0.45,
        planesPerBand = 4, numBands = 4)
    }),

    // IVF-PQ: coarse cells prune to nProbe candidates, PQ codes + ADC
    // rank them — the canonical billion-scale ANN composition
    "q88_sim_ivfpq_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfPqTopK(e, e.where(expr(QUERY_PRED)), K,
        nList = 16, nProbe = 4, m = 8, nCodes = 16)
    }),

    // PQ ANN: 8 subspaces x 16 deterministic-seed centroids, ADC scan
    "q84_sim_pq_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.pqTopK(e, e.where(expr(QUERY_PRED)), K, m = 8, nCodes = 16)
    }),

    // SemDeDup-style semantic dedup: IVF cells -> within-cell cosine
    // pairs -> connected components -> min-id keeper per component
    "q105_sim_semantic_dedup" -> ((s, d) => {
      Similarity.semanticDedup(Tables.embeddings(s, d), threshold = 0.45, nList = 16)
    }),

    // RecordInsightsLOCO over a linear-logistic scorer with md5-derived
    // weights (deterministic, so the oracle replays the exact insight)
    "q60_loco_insights" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("emb"))
      graft.operators.Insights.locoLinearTopK(
        e, col("vec_id"), col("emb"),
        graft.operators.Insights.md5Weights(col("emb"), "loco"),
        intercept = 0.0, k = 3)
    })
  )

  // --- DuckDB oracle building blocks -----------------------------------
  private val H60 = (x: String) => s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"
  /** Sequential dot product of two double-list expressions. */
  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[CAST(i AS INT)] * $b[CAST(i AS INT)]))"
  private def cosSql(a: String, b: String) =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
  /** One unrolled MMR greedy round: score the not-yet-picked candidates
    * against the selected set, pick the argmax, append to the running
    * selection. */
  private def mmrRound(i: Int): String = {
    val prev = s"sel${i - 1}all"
    s"""sc$i AS (SELECT m.query_id, m.cand_id, m.relq,
                   7 * m.relq - 3 * max(m.simq) AS mmrq
                 FROM (SELECT c.query_id, c.cand_id, c.relq, s.simq
                       FROM cand c
                       JOIN sims s ON s.query_id = c.query_id
                         AND s.ca = c.cand_id
                       JOIN $prev p ON p.query_id = s.query_id
                         AND p.cand_id = s.cb
                       LEFT JOIN $prev x ON x.query_id = c.query_id
                         AND x.cand_id = c.cand_id
                       WHERE x.cand_id IS NULL) m
                 GROUP BY 1, 2, 3),
       pick$i AS (SELECT query_id, $i AS pos, cand_id, relq, mmrq
                  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY mmrq DESC, cand_id) AS rn
                        FROM sc$i) WHERE rn = 1),
       sel${i}all AS (SELECT query_id, pos, cand_id, relq, mmrq FROM $prev
                      UNION ALL
                      SELECT query_id, pos, cand_id, relq, mmrq
                      FROM pick$i)"""
  }

  /** One unrolled power-iteration round for the q455 oracle: matvec by
    * 1e-12-quantized integer folds, L2 norm the same way, renormalize
    * through DECIMAL(18,12). */
  private def powRound(t: Int): String = {
    val prev = s"v${t - 1}"
    s"""w$t AS (SELECT c.i,
                  CAST(sum(CAST(round(c.c * v.v * 1e12) AS BIGINT))
                    AS BIGINT) AS sw
                FROM covd c JOIN $prev v ON c.j = v.j GROUP BY 1),
       wd$t AS (SELECT i, CAST(sw AS DOUBLE) / 1e12 AS w FROM w$t),
       n$t AS (SELECT sqrt(CAST(CAST(sum(CAST(round(w * w * 1e12)
                  AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) AS nrm
               FROM wd$t),
       v$t AS (SELECT w.i AS j,
                 CAST(CAST(w.w / n.nrm AS DECIMAL(18,12)) AS DOUBLE) AS v
               FROM wd$t w, n$t n)"""
  }

  /** md5-derived hyperplane weight for (plane p, dim i) in [-1, 1). */
  private val W = s"(${H60("'srp:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} / 1152921504606846976.0 * 2.0 - 1.0)"
  /** SRP bucket id of a double-list expression (4 planes). */
  private def bucketSql(e: String) =
    s"""CAST(list_sum(list_transform(range(0, 4), p ->
          CASE WHEN list_sum(list_transform(range(0, len($e)), i ->
                 $e[CAST(i + 1 AS INT)] * $W)) > 0
               THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)) AS BIGINT)"""

  val oracles: Map[String, String] = Map(
    "q299_centroid_drift" ->
      """WITH ex AS (
           SELECT label, CAST(j AS INT) AS dim,
                  CAST(round(CAST(embedding[CAST(j AS INT) + 1] AS DOUBLE)
                    * 1e9) AS BIGINT) AS xq
           FROM embeddings, range(0, 64) t(j)),
          cent AS (
           SELECT label, dim,
                  CAST(sum(xq) AS DOUBLE) / count(*) / 1e9 AS m
           FROM ex GROUP BY label, dim),
          p AS (
           SELECT a.label AS la, b.label AS lb,
                  CAST(sum(CAST(round(a.m * b.m * 1e12) AS BIGINT)) AS BIGINT)
                    AS pq,
                  CAST(sum(CAST(round(a.m * a.m * 1e12) AS BIGINT)) AS BIGINT)
                    AS pp,
                  CAST(sum(CAST(round(b.m * b.m * 1e12) AS BIGINT)) AS BIGINT)
                    AS qq,
                  CAST(sum(CAST(round((a.m - b.m) * (a.m - b.m) * 1e12)
                    AS BIGINT)) AS BIGINT) AS dd
           FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
           GROUP BY 1, 2)
         SELECT CAST(la AS INT) AS label_a, CAST(lb AS INT) AS label_b,
                ROUND(CAST(pq AS DOUBLE) /
                      sqrt(CAST(pp AS DOUBLE) * CAST(qq AS DOUBLE)), 6)
                  AS cosine,
                ROUND(sqrt(CAST(dd AS DOUBLE) / 1e12), 6) AS euclidean
         FROM p""",
    "q261_embedding_quantize" ->
      """WITH e AS (SELECT vec_id,
              list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
            FROM embeddings),
          s AS (SELECT vec_id, emb,
              greatest(list_aggregate(list_transform(emb, v -> abs(v)), 'max'),
                1e-30) / 127.0 AS scale
            FROM e),
          q AS (SELECT vec_id, emb, scale,
              list_transform(emb, v ->
                CAST(least(greatest(round(v / scale), -127.0), 127.0) AS INT)) AS qs
            FROM s)
          SELECT vec_id,
            CAST(len(qs) AS INT) AS n_dims,
            ROUND(scale, 9) AS scale,
            CAST(list_aggregate(qs, 'sum') AS BIGINT) AS q_sum,
            CAST(list_aggregate(qs, 'min') AS INT) AS q_min,
            CAST(list_aggregate(qs, 'max') AS INT) AS q_max,
            ROUND(list_aggregate(
              list_transform(emb, (v, i) -> abs(v - qs[i] * scale)), 'max'),
              9) AS max_abs_err
          FROM q""",

    "q327_knn_classify" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          q AS (SELECT * FROM e WHERE vec_id % 29 = 0),
          scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ${cosSql("q.emb", "c.emb")} AS cos
            FROM e c CROSS JOIN q
            WHERE q.vec_id <> c.vec_id),
          ranked AS (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored),
          tk AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= $K),
          votes AS (SELECT query_id, CAST(l.label AS INT) AS nl,
                           count(*) AS votes
                    FROM tk JOIN embeddings l ON l.vec_id = tk.neighbor_id
                    GROUP BY 1, 2),
          pred AS (SELECT query_id,
                     min_by(nl, -votes * 100 + nl) AS pred_label,
                     CAST(max(votes) AS BIGINT) AS top_votes
                   FROM votes GROUP BY query_id)
          SELECT p.query_id, p.pred_label, CAST(t.label AS INT) AS true_label,
                 p.top_votes,
                 CASE WHEN p.pred_label = CAST(t.label AS INT) THEN 1 ELSE 0
                   END AS correct
          FROM pred p JOIN embeddings t ON t.vec_id = p.query_id""",

    // the cosine operands are EXACT on both sides: quantized coords,
    // integer dot/norm sums < 2^53, one requantized-integer centroid —
    // so the final double division + sqrt are bit-identical
    "q565_label_outliers" ->
      """WITH q AS (SELECT vec_id, label,
               list_transform(embedding, x ->
                 CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xq
             FROM embeddings),
          ex AS (SELECT label, u.i AS dim, u.x AS x
                 FROM q, LATERAL (SELECT unnest(list_transform(q.xq,
                   (x, i) -> {'i': i, 'x': x})) AS u)),
          mn AS (SELECT label, dim,
                   CAST(round(CAST(sum(x) AS DOUBLE) /
                     CAST(count(*) AS DOUBLE)) AS BIGINT) AS cq
                 FROM ex GROUP BY 1, 2),
          cent AS (SELECT label, list(cq ORDER BY dim) AS cq
                   FROM mn GROUP BY label),
          sc AS (SELECT q.vec_id, q.label,
                   CAST(list_sum(list_transform(range(1, len(q.xq) + 1),
                       i -> q.xq[CAST(i AS INT)] * c.cq[CAST(i AS INT)]))
                     AS DOUBLE) /
                   (sqrt(CAST(list_sum(list_transform(q.xq, x -> x * x))
                      AS DOUBLE)) *
                    sqrt(CAST(list_sum(list_transform(c.cq, x -> x * x))
                      AS DOUBLE))) AS cos
                 FROM q JOIN cent c USING (label)),
          r AS (SELECT label, vec_id, ROUND(cos, 6) AS cos_centroid,
                  ROW_NUMBER() OVER (PARTITION BY label
                    ORDER BY ROUND(cos, 6) ASC, vec_id) AS rank
                FROM sc)
         SELECT label, vec_id, cos_centroid, CAST(rank AS INT) AS rank
         FROM r WHERE rank <= 5""",

    "q561_dim_ablation_recall" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          qr AS (SELECT * FROM e WHERE $QUERY_PRED),
          truth AS (
            SELECT query_id, neighbor_id FROM (
              SELECT qr.vec_id AS query_id, c.vec_id AS neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY qr.vec_id
                       ORDER BY ${cosSql("qr.emb", "c.emb")} DESC, c.vec_id)
                       AS rank
              FROM e c CROSS JOIN qr WHERE qr.vec_id <> c.vec_id)
            WHERE rank <= $K),
          dimgrid AS (SELECT unnest([16, 32]) AS dims),
          ep AS (SELECT dims, vec_id, emb[1:dims] AS pemb
                 FROM e CROSS JOIN dimgrid),
          qp AS (SELECT * FROM ep WHERE $QUERY_PRED),
          approx AS (
            SELECT dims, query_id, neighbor_id FROM (
              SELECT qp.dims, qp.vec_id AS query_id, c.vec_id AS neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY qp.dims, qp.vec_id
                       ORDER BY ${cosSql("qp.pemb", "c.pemb")} DESC, c.vec_id)
                       AS rank
              FROM ep c JOIN qp USING (dims)
              WHERE qp.vec_id <> c.vec_id)
            WHERE rank <= $K),
          hits AS (
            SELECT a.dims, a.query_id, CAST(count(*) AS BIGINT) AS n_hit
            FROM approx a JOIN truth t
              ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
            GROUP BY 1, 2),
          tc AS (SELECT dims, qr.vec_id AS query_id,
                        CAST($K AS BIGINT) AS n_truth
                 FROM qr CROSS JOIN dimgrid)
          SELECT CAST(tc.dims AS INT) AS dims, tc.query_id,
            ROUND(coalesce(n_hit, 0) * 1.0 / n_truth, 6) AS recall
          FROM tc LEFT JOIN hits
            ON tc.dims = hits.dims AND tc.query_id = hits.query_id""",

    "q26_sim_bruteforce_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          q AS (SELECT * FROM e WHERE $QUERY_PRED),
          scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ${cosSql("q.emb", "c.emb")} AS cos
            FROM e c CROSS JOIN q
            WHERE q.vec_id <> c.vec_id),
          ranked AS (
            SELECT query_id, neighbor_id, cos,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
          SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, CAST(rank AS INT) AS rank
          FROM ranked WHERE rank <= $K""",

    // banded variant of q26: raw-cosine band cut is deterministic
    // cross-engine because both sides compute cos from identical
    // operands (exact-double contract)
    "q527_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          q AS (SELECT * FROM e WHERE $QUERY_PRED),
          scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ${cosSql("q.emb", "c.emb")} AS cos
            FROM e c CROSS JOIN q
            WHERE q.vec_id <> c.vec_id),
          banded AS (SELECT * FROM scored WHERE cos >= 0.15 AND cos < 0.35),
          ranked AS (
            SELECT query_id, neighbor_id, cos,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM banded)
          SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, CAST(rank AS INT) AS rank
          FROM ranked WHERE rank <= $K""",

    "q237_embedding_isotropy" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          nn AS (SELECT count(*) AS n FROM e),
          pr AS (SELECT ${H60("'isoA:' || CAST(j AS VARCHAR)")} % n AS ia,
                        ${H60("'isoB:' || CAST(j AS VARCHAR)")} % n AS ib
                 FROM (SELECT unnest(range(0, 2000)) AS j), nn),
          c AS (SELECT CAST(${cosSql("a.emb", "b.emb")} AS DECIMAL(18,12)) AS c
                FROM pr JOIN e a ON pr.ia = a.vec_id
                        JOIN e b ON pr.ib = b.vec_id
                WHERE pr.ia <> pr.ib)
          SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                 ROUND(CAST(avg(c) AS DOUBLE), 6) AS mean_cos,
                 ROUND(CAST(avg(abs(c)) AS DOUBLE), 6) AS mean_abs_cos,
                 ROUND(CAST(max(abs(c)) AS DOUBLE), 6) AS max_abs_cos
          FROM c""",

    "q27_sim_cosine_neardup" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings)
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 ROUND(${cosSql("a.emb", "b.emb")}, 6) AS cosine
          FROM e a JOIN e b ON a.vec_id < b.vec_id
          WHERE ${cosSql("a.emb", "b.emb")} >= 0.45""",

    "q455_power_iteration" ->
      s"""WITH ex AS (SELECT vid, u.d AS d,
                        CAST(round(CAST(u.x AS DOUBLE) * 1e9) AS BIGINT)
                          AS xq
                      FROM (SELECT vec_id AS vid,
                              unnest(list_transform(embedding,
                                (x, i) -> {'d': i, 'x': x})) AS u
                            FROM embeddings)
                      WHERE u.d <= 16),
          mu AS (SELECT d, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(xq) AS BIGINT) AS sq
                 FROM ex GROUP BY 1),
          mud AS (SELECT d, n,
                    CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1e9 AS m
                  FROM mu),
          cx AS (SELECT e.vid, e.d,
                   CAST(e.xq AS DOUBLE) / 1e9 - m.m AS cx, m.n
                 FROM ex e JOIN mud m USING (d)),
          cov AS (SELECT a.d AS i, b.d AS j, max(a.n) AS n,
                    CAST(sum(CAST(round(a.cx * b.cx * 1e12) AS BIGINT))
                      AS BIGINT) AS pq
                  FROM cx a JOIN cx b ON a.vid = b.vid GROUP BY 1, 2),
          covd AS (SELECT i, j,
                     CAST(pq AS DOUBLE) / CAST(n AS DOUBLE) / 1e12 AS c
                   FROM cov),
          v0 AS (SELECT CAST(j AS BIGINT) AS j, CAST(0.25 AS DOUBLE) AS v
                 FROM (SELECT unnest(range(1, 17)) AS j)),
          ${powRound(1)},
          ${powRound(2)},
          ${powRound(3)},
          ${powRound(4)},
          ${powRound(5)}
         SELECT v.j AS d, ROUND(v.v, 6) AS v, ROUND(n5.nrm, 6) AS eigval,
                nn.n
         FROM v5 v, n5, (SELECT max(n) AS n FROM mu) nn""",

    "q451_mmr_rerank" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding,
                       x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          q AS (SELECT * FROM e WHERE $QUERY_PRED),
          scored0 AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   ${cosSql("q.emb", "c.emb")} AS cos
            FROM e c CROSS JOIN q
            WHERE q.vec_id <> c.vec_id),
          ranked AS (
            SELECT query_id, cand_id, cos,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, cand_id) AS rank
            FROM scored0),
          cand AS (SELECT query_id, cand_id,
                     CAST(round(ROUND(cos, 6) * 1e6) AS BIGINT) AS relq
                   FROM ranked WHERE rank <= $K),
          sims AS (SELECT c1.query_id, c1.cand_id AS ca, c2.cand_id AS cb,
                     CAST(round(${cosSql("e1.emb", "e2.emb")} * 1e6)
                       AS BIGINT) AS simq
                   FROM cand c1
                   JOIN cand c2 ON c1.query_id = c2.query_id
                     AND c1.cand_id <> c2.cand_id
                   JOIN e e1 ON e1.vec_id = c1.cand_id
                   JOIN e e2 ON e2.vec_id = c2.cand_id),
          sel1all AS (SELECT query_id, 1 AS pos, cand_id, relq,
                        7 * relq AS mmrq
                      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY
                              query_id ORDER BY 7 * relq DESC, cand_id)
                              AS rn FROM cand) WHERE rn = 1),
          ${mmrRound(2)},
          ${mmrRound(3)},
          ${mmrRound(4)},
          ${mmrRound(5)}
         SELECT query_id, CAST(pos AS INT) AS pos, cand_id,
                relq AS rel_q6, mmrq AS mmr_q6
         FROM sel5all""",

    "q28_sim_srp_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          c AS (SELECT vec_id AS neighbor_id, emb AS c_emb, ${bucketSql("emb")} AS bucket FROM e),
          q AS (SELECT vec_id AS query_id, emb AS q_emb, ${bucketSql("emb")} AS bucket FROM e
                WHERE $QUERY_PRED),
          scored AS (
            SELECT query_id, neighbor_id, ${cosSql("q_emb", "c_emb")} AS cos
            FROM c JOIN q USING (bucket)
            WHERE query_id <> neighbor_id),
          ranked AS (
            SELECT query_id, neighbor_id, cos,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
          SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, CAST(rank AS INT) AS rank
          FROM ranked WHERE rank <= $K""",

    "q548_int8_recall" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          qr AS (SELECT * FROM e WHERE $QUERY_PRED),
          tscored AS (
            SELECT qr.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ${cosSql("qr.emb", "c.emb")} AS cos
            FROM e c CROSS JOIN qr
            WHERE qr.vec_id <> c.vec_id),
          truth AS (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM tscored QUALIFY rank <= $K),
          cz AS (SELECT vec_id,
                   list_transform(emb, x -> CAST(least(greatest(
                     round(x / (greatest(list_max(list_transform(emb,
                       v -> abs(v))), 1e-30) / 127.0)), -127.0), 127.0)
                     AS BIGINT)) AS q
                 FROM e),
          cs AS (SELECT vec_id, q,
                   CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT)
                     AS sf
                 FROM cz),
          ascored AS (
            SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
                   CAST(${dotSql("qq.q", "cc.q")} AS DOUBLE) /
                     (sqrt(CAST(qq.sf AS DOUBLE)) *
                      sqrt(CAST(cc.sf AS DOUBLE))) AS cos
            FROM cs cc CROSS JOIN (SELECT * FROM cs WHERE $QUERY_PRED) qq
            WHERE qq.vec_id <> cc.vec_id),
          approx AS (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM ascored QUALIFY rank <= $K),
          hits AS (
            SELECT a.query_id, CAST(count(*) AS BIGINT) AS n_hit
            FROM approx a JOIN truth t
              ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
            GROUP BY 1),
          tc AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth
                 FROM truth GROUP BY 1)
          SELECT tc.query_id,
            ROUND(coalesce(n_hit, 0) * 1.0 / n_truth, 6) AS recall
          FROM tc LEFT JOIN hits ON tc.query_id = hits.query_id""",

    "q155_ann_recall" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          qr AS (SELECT * FROM e WHERE $QUERY_PRED),
          tscored AS (
            SELECT qr.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ${cosSql("qr.emb", "c.emb")} AS cos
            FROM e c CROSS JOIN qr
            WHERE qr.vec_id <> c.vec_id),
          truth AS (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM tscored QUALIFY rank <= $K),
          cb AS (SELECT vec_id AS neighbor_id, emb AS c_emb,
                   ${bucketSql("emb")} AS bucket FROM e),
          qb AS (SELECT vec_id AS query_id, emb AS q_emb,
                   ${bucketSql("emb")} AS bucket FROM e WHERE $QUERY_PRED),
          ascored AS (
            SELECT query_id, neighbor_id, ${cosSql("q_emb", "c_emb")} AS cos
            FROM cb JOIN qb USING (bucket)
            WHERE query_id <> neighbor_id),
          approx AS (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM ascored QUALIFY rank <= $K),
          hits AS (
            SELECT a.query_id, CAST(count(*) AS BIGINT) AS n_hit
            FROM approx a JOIN truth t
              ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
            GROUP BY 1),
          tc AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth
                 FROM truth GROUP BY 1)
          SELECT tc.query_id,
            ROUND(coalesce(n_hit, 0) * 1.0 / n_truth, 6) AS recall
          FROM tc LEFT JOIN hits ON tc.query_id = hits.query_id""",

    "q268_ann_mrr" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          qr AS (SELECT * FROM e WHERE $QUERY_PRED),
          tscored AS (
            SELECT qr.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ${cosSql("qr.emb", "c.emb")} AS cos
            FROM e c CROSS JOIN qr
            WHERE qr.vec_id <> c.vec_id),
          truth AS (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM tscored QUALIFY rank <= $K),
          cb AS (SELECT vec_id AS neighbor_id, emb AS c_emb,
                   ${bucketSql("emb")} AS bucket FROM e),
          qb AS (SELECT vec_id AS query_id, emb AS q_emb,
                   ${bucketSql("emb")} AS bucket FROM e WHERE $QUERY_PRED),
          ascored AS (
            SELECT query_id, neighbor_id, ${cosSql("q_emb", "c_emb")} AS cos
            FROM cb JOIN qb USING (bucket)
            WHERE query_id <> neighbor_id),
          approx AS (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM ascored QUALIFY rank <= $K),
          mr AS (SELECT a.query_id, min(a.rank) AS first_hit
                 FROM approx a JOIN truth t
                   ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
                 GROUP BY 1),
          qs AS (SELECT DISTINCT query_id FROM truth)
          SELECT qs.query_id,
            ROUND(coalesce(1.0 / first_hit, 0.0), 6) AS rr
          FROM qs LEFT JOIN mr USING (query_id)""",

    "q149_ann_ndcg" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          qr AS (SELECT * FROM e WHERE $QUERY_PRED),
          tscored AS (
            SELECT qr.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ${cosSql("qr.emb", "c.emb")} AS cos
            FROM e c CROSS JOIN qr
            WHERE qr.vec_id <> c.vec_id),
          truth AS (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM tscored QUALIFY rank <= $K),
          cb AS (SELECT vec_id AS neighbor_id, emb AS c_emb,
                   ${bucketSql("emb")} AS bucket FROM e),
          qb AS (SELECT vec_id AS query_id, emb AS q_emb,
                   ${bucketSql("emb")} AS bucket FROM e WHERE $QUERY_PRED),
          ascored AS (
            SELECT query_id, neighbor_id, ${cosSql("q_emb", "c_emb")} AS cos
            FROM cb JOIN qb USING (bucket)
            WHERE query_id <> neighbor_id),
          approx AS (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM ascored QUALIFY rank <= $K),
          dcg AS (
            SELECT a.query_id,
              sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1.0 ELSE 0.0 END
                  / log2(a.rank + 1)) AS dcg
            FROM approx a LEFT JOIN truth t
              ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
            GROUP BY 1),
          idcg AS (
            SELECT query_id,
              list_sum(list_transform(range(1, CAST(count(*) AS INT) + 1),
                i -> 1.0 / log2(i + 1))) AS idcg
            FROM truth GROUP BY 1)
          SELECT idcg.query_id,
            ROUND(coalesce(dcg, 0.0) / idcg, 6) AS ndcg
          FROM idcg LEFT JOIN dcg ON idcg.query_id = dcg.query_id""",

    "q89_sim_lsh_neardup" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          bandidx AS (SELECT CAST(unnest(range(0, 4)) AS INT) AS b),
          bands AS (
            SELECT vec_id, b,
              CAST(list_sum(list_transform(range(0, 4), p ->
                CASE WHEN list_sum(list_transform(range(0, len(emb)), i ->
                       emb[CAST(i + 1 AS INT)] *
                       (${H60("'srp:' || CAST(b*4 + p AS VARCHAR) || ':' || CAST(i AS VARCHAR)")}
                        / 1152921504606846976.0 * 2.0 - 1.0))) > 0
                     THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)) AS BIGINT) AS bucket
            FROM e CROSS JOIN bandidx),
          cand AS (
            SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
            FROM bands a JOIN bands c
              ON a.b = c.b AND a.bucket = c.bucket AND a.vec_id < c.vec_id)
          SELECT id_a, id_b, ROUND(${cosSql("ea.emb", "eb.emb")}, 6) AS cosine
          FROM cand
            JOIN e ea ON ea.vec_id = id_a
            JOIN e eb ON eb.vec_id = id_b
          WHERE ${cosSql("ea.emb", "eb.emb")} >= 0.45""",

    "q88_sim_ivfpq_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          cents AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, emb AS cemb
            FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)),
          assigned AS (
            SELECT vec_id, cid AS cell FROM (
              SELECT a.vec_id, c.cid,
                ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                   ORDER BY ${cosSql("a.emb", "c.cemb")} DESC, c.cid ASC) AS rn
              FROM e a CROSS JOIN cents c)
            WHERE rn = 1),
          probes AS (
            SELECT vec_id AS query_id, cid AS probe FROM (
              SELECT q.vec_id, c.cid,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                   ORDER BY ${cosSql("q.emb", "c.cemb")} DESC, c.cid ASC) AS rn
              FROM e q CROSS JOIN cents c WHERE $QUERY_PRED)
            WHERE rn <= 4),
          seeds AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS scid, emb AS semb
            FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)),
          subs AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS j),
          books AS (
            SELECT j, scid AS cid,
              list_transform(range(1, 9), i -> semb[CAST(j * 8 + i AS INT)]) AS cent
            FROM seeds CROSS JOIN subs),
          enc AS (
            SELECT vec_id, j, cid FROM (
              SELECT a.vec_id, b.j, b.cid,
                ROW_NUMBER() OVER (PARTITION BY a.vec_id, b.j ORDER BY
                  list_sum(list_transform(range(1, 9), i ->
                    (a.emb[CAST(b.j * 8 + i AS INT)] - b.cent[CAST(i AS INT)]) *
                    (a.emb[CAST(b.j * 8 + i AS INT)] - b.cent[CAST(i AS INT)]))) ASC,
                  b.cid ASC) AS rn
              FROM e a CROSS JOIN books b)
            WHERE rn = 1),
          dist AS (
            SELECT p.query_id, a.vec_id AS neighbor_id,
              list_sum(list(
                list_sum(list_transform(range(1, 9), i ->
                  (qe.emb[CAST(enc.j * 8 + i AS INT)] - b.cent[CAST(i AS INT)]) *
                  (qe.emb[CAST(enc.j * 8 + i AS INT)] - b.cent[CAST(i AS INT)])))
                ORDER BY enc.j)) AS d
            FROM probes p
            JOIN assigned a ON a.cell = p.probe
            JOIN enc ON enc.vec_id = a.vec_id
            JOIN books b ON b.j = enc.j AND b.cid = enc.cid
            JOIN e qe ON qe.vec_id = p.query_id
            WHERE p.query_id <> a.vec_id
            GROUP BY 1, 2),
          ranked AS (
            SELECT query_id, neighbor_id, d,
              ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY d ASC, neighbor_id) AS rank
            FROM dist)
          SELECT query_id, neighbor_id, ROUND(d, 6) AS approx_dist, CAST(rank AS INT) AS rank
          FROM ranked WHERE rank <= $K""",

    "q84_sim_pq_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          seeds AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, emb
            FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)),
          subs AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS j),
          books AS (
            SELECT j, cid,
              list_transform(range(1, 9), i -> emb[CAST(j * 8 + i AS INT)]) AS cent
            FROM seeds CROSS JOIN subs),
          enc AS (
            SELECT vec_id, j, cid FROM (
              SELECT a.vec_id, b.j, b.cid,
                ROW_NUMBER() OVER (PARTITION BY a.vec_id, b.j ORDER BY
                  list_sum(list_transform(range(1, 9), i ->
                    (a.emb[CAST(b.j * 8 + i AS INT)] - b.cent[CAST(i AS INT)]) *
                    (a.emb[CAST(b.j * 8 + i AS INT)] - b.cent[CAST(i AS INT)]))) ASC,
                  b.cid ASC) AS rn
              FROM e a CROSS JOIN books b)
            WHERE rn = 1),
          dist AS (
            SELECT q.vec_id AS query_id, enc.vec_id AS neighbor_id,
              list_sum(list(
                list_sum(list_transform(range(1, 9), i ->
                  (q.emb[CAST(enc.j * 8 + i AS INT)] - b.cent[CAST(i AS INT)]) *
                  (q.emb[CAST(enc.j * 8 + i AS INT)] - b.cent[CAST(i AS INT)])))
                ORDER BY enc.j)) AS d
            FROM e q
            JOIN enc ON q.vec_id <> enc.vec_id
            JOIN books b ON b.j = enc.j AND b.cid = enc.cid
            WHERE q.$QUERY_PRED
            GROUP BY 1, 2),
          ranked AS (
            SELECT query_id, neighbor_id, d,
              ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY d ASC, neighbor_id) AS rank
            FROM dist)
          SELECT query_id, neighbor_id, ROUND(d, 6) AS approx_dist, CAST(rank AS INT) AS rank
          FROM ranked WHERE rank <= $K""",

    "q74_sim_ivf_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          cents AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, emb AS cemb
            FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)),
          assigned AS (
            SELECT vec_id, cid AS cell FROM (
              SELECT a.vec_id, c.cid,
                ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                   ORDER BY ${cosSql("a.emb", "c.cemb")} DESC, c.cid ASC) AS rn
              FROM e a CROSS JOIN cents c)
            WHERE rn = 1),
          probes AS (
            SELECT vec_id AS query_id, cid AS probe FROM (
              SELECT q.vec_id, c.cid,
                ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                   ORDER BY ${cosSql("q.emb", "c.cemb")} DESC, c.cid ASC) AS rn
              FROM e q CROSS JOIN cents c WHERE $QUERY_PRED)
            WHERE rn <= 4),
          scored AS (
            SELECT p.query_id, a.vec_id AS neighbor_id,
                   ${cosSql("qe.emb", "ce.emb")} AS cos
            FROM probes p
            JOIN assigned a ON a.cell = p.probe
            JOIN e qe ON qe.vec_id = p.query_id
            JOIN e ce ON ce.vec_id = a.vec_id
            WHERE p.query_id <> a.vec_id),
          ranked AS (
            SELECT query_id, neighbor_id, cos,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
          SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, CAST(rank AS INT) AS rank
          FROM ranked WHERE rank <= $K""",

    "q105_sim_semantic_dedup" ->
      s"""WITH RECURSIVE
          e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                FROM embeddings),
          cents AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, emb AS cemb
            FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)),
          assigned AS (
            SELECT vec_id, cid AS cell FROM (
              SELECT a.vec_id, c.cid,
                ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                   ORDER BY ${cosSql("a.emb", "c.cemb")} DESC, c.cid ASC) AS rn
              FROM e a CROSS JOIN cents c)
            WHERE rn = 1),
          pairs AS (
            SELECT aa.vec_id AS id_a, bb.vec_id AS id_b
            FROM assigned aa
            JOIN assigned bb ON aa.cell = bb.cell AND aa.vec_id < bb.vec_id
            JOIN e a ON a.vec_id = aa.vec_id
            JOIN e b ON b.vec_id = bb.vec_id
            WHERE ${cosSql("a.emb", "b.emb")} >= 0.45),
          edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT a AS n FROM edges),
          reach(n, m) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT r.n, e2.b FROM reach r JOIN edges e2 ON e2.a = r.m),
          comp AS (SELECT n, MIN(m) AS component FROM reach GROUP BY n)
          SELECT ass.vec_id, ass.cell,
            coalesce(c.component, ass.vec_id) AS component,
            (c.component IS NULL OR c.component = ass.vec_id) AS keep
          FROM assigned ass LEFT JOIN comp c ON c.n = ass.vec_id""",

    "q60_loco_insights" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                     FROM embeddings),
          c AS (SELECT vec_id,
                  list_transform(range(0, len(emb)), i ->
                    emb[CAST(i + 1 AS INT)] *
                    (${H60("'loco:' || CAST(i AS VARCHAR)")} / 1152921504606846976.0 * 2.0 - 1.0)) AS contribs
                FROM e),
          m AS (SELECT vec_id, contribs, list_sum(contribs) AS margin FROM c),
          ex AS (SELECT vec_id AS id, margin, CAST(i AS INT) AS dim,
                   contribs[CAST(i + 1 AS INT)] AS cv
                 FROM m CROSS JOIN (SELECT unnest(range(0, 64)) AS i) t),
          loco AS (SELECT id, dim,
                     1.0/(1.0 + exp(-margin)) - 1.0/(1.0 + exp(-(margin - cv))) AS loco
                   FROM ex),
          ranked AS (SELECT id, dim, loco,
                       ROW_NUMBER() OVER (PARTITION BY id ORDER BY abs(loco) DESC, dim ASC) AS rank
                     FROM loco)
          SELECT id, dim, ROUND(loco, 6) AS loco, CAST(rank AS INT) AS rank
          FROM ranked WHERE rank <= 3"""
  )
}
