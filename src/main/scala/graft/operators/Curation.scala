package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis.hash60

/** Corpus-curation operators for training-data pipelines: deterministic
  * hash sampling, reproducible train/val/test splits, per-group token
  * budgeting, and keeper-based near-dup filtering. (Beyond the
  * reference's surface — these are the selection steps a 100 TB
  * pretraining pipeline runs after dedup/quality scoring.)
  *
  * Everything is md5-derived and row-local: runs are reproducible
  * across re-executions, partitionings, and cluster sizes (unlike
  * `df.sample`/`rand()`, whose draws depend on partition layout), and
  * the DuckDB differential oracle replays every decision
  * bit-identically — the auditability property a curation pipeline
  * needs when a sample has to be justified after the fact.
  */
object Curation {

  /** Deterministic per-row bucket in [0, 1e6): hash60 of "salt:id".
    * Different salts give independent draws over the same ids. */
  def sampleBucket(id: Column, salt: String): Column =
    pmod(hash60(concat_ws(":", lit(salt), id)), lit(1000000L))

  /** Uniform deterministic sample: keep a row iff its [[sampleBucket]]
    * falls below fraction*1e6. Row-local filter — pushes down to the
    * scan, no shuffle, stable under re-partitioning. */
  def deterministicSample(df: DataFrame, id: Column, fraction: Double,
                          salt: String = "sample"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.where(sampleBucket(id, salt) < (fraction * 1e6).toLong)
  }

  /** Deterministic split assignment: a `split` column with the label of
    * the weight band the row's bucket lands in (weights normalized;
    * order of `weights` defines the bands). Reproducible train/val/test
    * carving — the same id lands in the same split on every run. */
  def hashSplit(df: DataFrame, id: Column, weights: Seq[(String, Double)],
                salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .map(c => (c * 1e6).toLong)
    val b = sampleBucket(id, salt)
    val expr = weights.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((label, _), i)) =>
        when(b >= cuts(i) && b < cuts(i + 1), label).otherwise(acc)
    }
    // the last band absorbs the rounding remainder up to 1e6
    val withLast = when(b >= cuts.last, lit(weights.last._1)).otherwise(expr)
    df.withColumn("split", withLast)
  }

  /** Per-group token budgeting: keep each group's best documents while
    * the group's running token total stays within `budget`. Order is
    * (quality desc, id asc) — deterministic under ties. The window is
    * partitioned by group, so parallelism = #groups (domains/sources —
    * bounded and coarse); within a group the running sum is the
    * sequential semantics the budget requires. A doc is kept iff the
    * cumulative count INCLUDING it fits. */
  def tokenBudgetPerGroup(df: DataFrame, id: Column, group: Column,
                          quality: Column, tokens: Column,
                          budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(quality.desc, id.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__cum", sum(tokens).over(w))
      .where(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Deterministic negative sampling for contrastive training pairs:
    * draw `k` pseudo-random corpus documents per anchor, excluding the
    * anchor itself and its known positives. Draw j for an anchor is
    * hash60(salt:anchor:j) mod N mapped to a corpus id through a dense
    * rank table — built WITHOUT a global sort via the two-level
    * cumulative count ([[DataQuality.cumulativeByValue]]), the same
    * no-single-partition-window discipline as the KS machinery. The
    * anti-join against positives (and the self-check) can leave an
    * anchor with fewer than k negatives; collisions are dropped, not
    * re-drawn — the deterministic convention the oracle replays (callers
    * wanting exactly-k draw with a larger k and truncate). One rank
    * equi-join + one anti-join; nothing driver-side. Emits
    * (anchor_id, j, neg_id). */
  def negativeSample(corpus: DataFrame, id: Column,
                     anchors: DataFrame, anchorId: Column,
                     positives: DataFrame, posAnchor: Column, posId: Column,
                     k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val counts = corpus.select(id.as("v")).distinct()
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val idx = DataQuality.cumulativeByValue(counts, Seq("c"))
      .select(col("v").as("neg_id"), col("cum_c").as("rank"))
    val nDf = counts.agg(sum(col("c")).cast("long").as("n"))
    val draws = anchors.select(anchorId.as("anchor_id"))
      .crossJoin(broadcast(nDf))
      .select(col("anchor_id"), explode(sequence(lit(1), lit(k))).as("j"), col("n"))
      .select(col("anchor_id"), col("j"),
        (pmod(hash60(concat_ws(":", lit(salt), col("anchor_id"), col("j"))),
          col("n")) + 1).as("rank"))
    draws.join(idx, "rank")
      .join(positives.select(posAnchor.as("anchor_id"), posId.as("neg_id")),
        Seq("anchor_id", "neg_id"), "left_anti")
      .where(col("neg_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("j"), col("neg_id"))
  }

  /** Code-quality signal battery (The Stack / StarCoder-style filters
    * for source-code corpora): per-document line statistics — average
    * and maximum line length, the fraction of overlong lines, the
    * alphanumeric character fraction, and the duplicate-line ratio
    * (1 - distinct/total over non-blank lines). All row-local column
    * expressions over a split-once line array; RE2-safe so the oracle
    * replays each signal. Returned as (name, Column) pairs to select
    * onto a frame, like [[gopherQualityOf]]. */
  def codeQualitySignals(text: Column, longLine: Int = 100): Seq[(String, Column)] = {
    val lines = split(text, "\n")
    val nLines = size(lines)
    val nonBlank = filter(lines, l => length(trim(l)) > 0)
    val lens = transform(lines, l => length(l))
    val total = aggregate(lens, lit(0L), (a, x) => a + x)
    Seq(
      "n_lines" -> nLines.cast("long"),
      "avg_line_len" -> round(total.cast("double") / greatest(nLines, lit(1)), 6),
      "max_line_len" -> coalesce(array_max(lens), lit(0)).cast("long"),
      "frac_long_lines" -> round(
        size(filter(lens, l => l > longLine)).cast("double") /
          greatest(nLines, lit(1)), 6),
      "alnum_frac" -> round(
        (length(text) - length(regexp_replace(text, "[A-Za-z0-9]", "")))
          .cast("double") / greatest(length(text), lit(1)), 6),
      "dup_line_ratio" -> round(
        when(size(nonBlank) > 0,
          lit(1.0) - size(array_distinct(nonBlank)).cast("double") / size(nonBlank))
          .otherwise(0.0), 6))
  }

  /** RAG-style document chunking: split each document's token stream
    * into chunks of `chunkSize` tokens advancing by
    * `chunkSize - overlap`, so consecutive chunks share `overlap`
    * tokens — the retrieval-index preparation step between curation
    * and embedding. Chunk identity is (doc, chunk_idx), the join key an
    * embedding/ANN stage uses to map hits back to source documents.
    *
    * Pure row-local column work — tokenize, explode the chunk starts,
    * slice — no shuffle anywhere; output cardinality is
    * Σ ceil(n_tok / stride) rows, each independent, so the stage
    * pipelines at scan speed at any corpus size. An empty document is
    * one empty chunk (`split("") = [""]`, the same convention the
    * token-count ops replay in the oracle). */
  def chunkByTokens(df: DataFrame, id: Column, text: Column,
                    chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1: $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap")
    val stride = chunkSize - overlap
    df.select(id.as("doc"), graft.functions.TextAnalysis.tokens(text).as("__toks"))
      .select(col("doc"), col("__toks"),
        posexplode(sequence(lit(0), size(col("__toks")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "start_tok")))
      .select(col("doc"), col("chunk_idx"), col("start_tok"),
        least(lit(chunkSize), size(col("__toks")) - col("start_tok")).as("n_tokens"),
        array_join(slice(col("__toks"), col("start_tok") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Per-group document cap (the Common-Crawl-style per-domain cap: no
    * single domain/source may contribute more than `k` documents):
    * keeps each group's `k` best rows by (quality desc, id asc) and
    * tags them with their within-group rank. Runs on the bounded
    * [[graft.aggregators.TopK]] aggregator, NOT a window — each mapper
    * forwards at most ~2k candidates per group it saw, so a hot domain
    * with millions of pages costs the shuffle k rows, not its full
    * page count. Emits (group, id, quality, rank). */
  def capPerGroup(df: DataFrame, group: Column, id: Column, quality: Column,
                  k: Int): DataFrame =
    graft.aggregators.TopK.topKPerKey(
      df.select(group.as("group"), id.as("id"), quality.cast("double").as("quality")),
      "group", "id", "quality", k)

  /** Intra-document repetition ratio (Gopher-style rep filter): the
    * fraction of word k-gram POSITIONS whose shingle already occurred —
    * 1 - distinct/total, 0 for docs with fewer than k tokens. Pass a
    * MATERIALIZED token-array column (see the [[Dedup.wordShingles]]
    * CSE hazard — an inline `tokens(text)` here is O(tokens²) per
    * row). Row-local; pipelines at scan speed. */
  def duplicateShingleRatioOf(toks: Column, k: Int): Column = {
    val total = greatest(size(toks) - (k - 1), lit(0))
    val distinctN = size(Dedup.wordShinglesOf(toks, k))
    when(total > 0,
      lit(1.0) - distinctN.cast("double") / total).otherwise(lit(0.0))
  }

  /** Benchmark decontamination (test-set leakage detection): for every
    * (corpus doc, probe doc) pair sharing word k-gram shingles, the
    * CONTAINMENT |shingles(corpus) ∩ shingles(probe)| / |shingles(probe)|
    * — asymmetric on purpose: a benchmark item fully quoted inside a
    * long document scores 1.0 where Jaccard would vanish.
    *
    * Scale: the probe side (benchmark suites) is small by nature, so
    * its exploded shingles BROADCAST — the corpus is scanned once,
    * shingled row-locally, hash-joined with no shuffle of corpus data
    * and no hot-shingle blowup (candidate fan-out is bounded by the
    * probe set). */
  def containmentPairs(corpus: DataFrame, corpusId: Column, corpusText: Column,
                       probes: DataFrame, probeId: Column, probeText: Column,
                       k: Int, threshold: Double): DataFrame = {
    val cs = Dedup.shingleFrame(corpus, corpusId, corpusText, k)
      .select(col("doc").as("corpus_id"), explode(col("shingles")).as("s"))
    // probe shingle count rides along the exploded rows: one broadcast,
    // one shuffle (the groupBy), no second probe-side join
    val pex = Dedup.shingleFrame(probes, probeId, probeText, k)
      .select(col("doc").as("probe_id"), size(col("shingles")).as("n_p"),
        explode(col("shingles")).as("s"))
    cs.join(broadcast(pex), "s")
      .groupBy(col("corpus_id"), col("probe_id"), col("n_p"))
      .agg(count(lit(1)).as("n_inter"))
      .select(col("corpus_id"), col("probe_id"),
        (col("n_inter").cast("double") / col("n_p")).as("containment"))
      .where(col("containment") >= threshold)
  }

  /** End-to-end near-dup removal: given the corpus and a near-dup pair
    * list, drop every document that is NOT its component's keeper
    * (min id). One anti-join against the (small) non-keeper side —
    * documents in no pair survive untouched. */
  def dropNearDups(df: DataFrame, id: Column, pairs: DataFrame): DataFrame = {
    val losers = Dedup.connectedComponents(pairs)
      .where(col("doc_id") =!= col("component"))
      .select(col("doc_id").as("__loser"))
    df.join(losers, id === col("__loser"), "left_anti")
  }

  /** Quality-aware near-dup canonicalization: within each near-dup
    * cluster keep the HIGHEST-quality member (ties → smallest id)
    * rather than [[dropNearDups]]'s smallest-id convention —
    * production pipelines keep the longest/cleanest duplicate, not an
    * arbitrary one. Emits one row per CLUSTERED doc:
    * (doc_id, cluster, keeper_id, kept); singletons are unaffected by
    * dedup and not emitted. Same scale shape as dropNearDups: the
    * O(log n) component rounds dominate; the keeper argmax is one
    * max_by over each bounded cluster. */
  def keepBestPerCluster(df: DataFrame, id: Column, quality: Column,
                         pairs: DataFrame): DataFrame = {
    val comp = Dedup.connectedComponents(pairs)
    val q = df.select(id.as("doc_id"), quality.as("__q"))
    val labeled = comp.join(q, Seq("doc_id"))
    val keepers = labeled.groupBy(col("component"))
      .agg(max_by(col("doc_id"),
        struct(col("__q"), (-col("doc_id")).as("negid"))).as("keeper_id"))
    labeled.join(keepers, Seq("component"))
      .select(col("doc_id"), col("component").as("cluster"),
        col("keeper_id"), (col("doc_id") === col("keeper_id")).as("kept"))
  }

  // ---- PII scrubbing --------------------------------------------------

  /** RE2-safe patterns (no lookaround), so the same strings run under
    * Spark's java.util.regex AND the differential oracle's RE2. Redaction
    * order matters: emails first (an address contains digit runs a naive
    * phone pattern could bite), then IPv4, then phone shapes. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3,4}-\\d{4}"

  /** Per-document PII hit counts (email, ipv4, phone) — row-local
    * `regexp_count`, pipelines at scan speed. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(text, lit(EmailRe)),
    "n_ip" -> regexp_count(text, lit(Ipv4Re)),
    "n_phone" -> regexp_count(text, lit(PhoneRe)))

  /** Redact PII in place with typed placeholders. Row-local; at 100 TB
    * this is a pure map stage fused into whatever scan feeds it. */
  def redactPII(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  // ---- Sequence packing ----------------------------------------------

  /** Deterministic corpus shuffle order: hash60 of "salt:id". Sorting by
    * it is the reproducible analog of the random document shuffle every
    * pretraining run does before packing; (order, id) is a total order
    * so ties can't reorder across runs. */
  def shuffleOrder(id: Column, salt: String = "shuffle"): Column =
    hash60(concat_ws(":", lit(salt), id))

  /** Concat-then-chunk sequence packing (the standard LLM pretraining
    * layout): documents are laid end-to-end in deterministic shuffled
    * order within a shard, and the resulting token stream is cut into
    * fixed `seqLen` windows. Emits (shard, seq, offset) per document —
    * `offset` is the doc's start position within its sequence; docs
    * straddling a cut simply span two seqs, as trainers expect.
    *
    * Scale: the only sequential semantics is the running token sum
    * WITHIN a shard, expressed as a window over (shard) ordered by the
    * shuffle hash — parallelism = numShards (thousands at 100 TB), and
    * assignment is reproducible across partitionings and cluster sizes
    * because nothing depends on physical row order. */
  def packSequences(df: DataFrame, id: Column, tokens: Column,
                    seqLen: Long, numShards: Int,
                    salt: String = "pack"): DataFrame = {
    require(seqLen > 0 && numShards > 0, "seqLen and numShards must be positive")
    val ord = shuffleOrder(id, salt)
    val shard = pmod(hash60(concat_ws(":", lit(salt + ":shard"), id)), lit(numShards.toLong))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard")).orderBy(col("__ord").asc, id.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__ord", ord).withColumn("__shard", shard)
      .withColumn("__cum", sum(tokens).over(w))
      .withColumn("__start", col("__cum") - tokens)
      .select(id.as("doc_id"), col("__shard").as("shard"),
        (col("__start") / seqLen).cast("bigint").as("seq"),
        pmod(col("__start"), lit(seqLen)).as("offset"))
  }

  // ---- Stratified sampling -------------------------------------------

  /** Per-group deterministic sampling (language/source-balanced corpus
    * carving): each row keeps iff its bucket falls under ITS group's
    * fraction. Row-local like [[deterministicSample]] — the group only
    * selects which literal threshold applies, so the filter still
    * pushes to the scan and nothing shuffles. */
  def deterministicSamplePerGroup(df: DataFrame, id: Column, group: Column,
                                  fractions: Map[String, Double],
                                  defaultFraction: Double = 1.0,
                                  salt: String = "sample"): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq)
      .forall(f => f >= 0 && f <= 1), s"fractions out of range: $fractions")
    val cut = fractions.foldLeft(lit((defaultFraction * 1e6).toLong)) {
      case (acc, (g, f)) => when(group === g, lit((f * 1e6).toLong)).otherwise(acc)
    }
    df.where(sampleBucket(id, salt) < cut)
  }

  /** Deterministic k-fold assignment + stratification report: fold =
    * md5-hash(id) mod k — row-local (no shuffle for the assignment
    * itself, reproducible on any cluster size), near-balanced within
    * every stratum by hash uniformity. Emits the per-(stratum, fold)
    * cell counts and each cell's deviation from the stratum's ideal
    * 1/k share — the audit that catches a broken split before a model
    * trains on it. Exact-balanced per-stratum ranks would need a
    * per-stratum sort (the hot-stratum single-task trap at 100 TB);
    * hash folds are the scale-correct choice and the report PROVES the
    * balance instead of assuming it. */
  def stratifiedFoldReport(df: DataFrame, id: Column, stratum: Column,
                           k: Int, salt: String = "fold"): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val fold = pmod(graft.functions.TextAnalysis.hash60(
      concat_ws(":", lit(salt), id.cast("string"))), lit(k.toLong))
    val cells = df.select(stratum.as("stratum"), fold.as("fold"))
      .groupBy(col("stratum"), col("fold")).agg(count(lit(1)).as("n"))
    val strata = cells.groupBy(col("stratum"))
      .agg(sum(col("n")).as("n_stratum"))
    cells.join(strata, "stratum")
      .select(col("stratum"), col("fold"), col("n"),
        round(col("n").cast("double") / col("n_stratum").cast("double"), 6)
          .as("frac"),
        round(abs(col("n").cast("double") / col("n_stratum").cast("double")
          - lit(1.0 / k)), 6).as("abs_dev_from_ideal"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): each row draws u in (0,1] from its md5 bucket and
    * gets key = ln(u)/w; the n largest keys are the sample. Inclusion
    * probability is proportional to weight, the draw is reproducible
    * (same id+salt → same key on every run and every cluster size), and
    * the oracle replays the selection exactly. Weights must be > 0.
    *
    * Scale: the key is row-local; the global top-n is a TakeOrdered
    * (per-partition heap + driver merge of n-row heads), so nothing
    * shuffles — the right shape for "sample 1M docs from 100 TB".
    * Emits the sampled rows with their `sample_key`. */
  def weightedSample(df: DataFrame, id: Column, weight: Column, n: Int,
                     salt: String = "wsample"): DataFrame = {
    require(n > 0, s"sample size must be positive: $n")
    // u in (0,1]: (hash60+1) / 2^60 — hash60 is uniform on [0, 2^60)
    val u = (hash60(concat_ws(":", lit(salt), id)) + 1L).cast("double") /
      lit(1152921504606846976.0)
    df.withColumn("sample_key", log(u) / weight.cast("double"))
      .orderBy(col("sample_key").desc, id.asc)
      .limit(n)
  }

  /** Per-group weighted sampling without replacement (Efraimidis-
    * Spirakis per group): top `nPerGroup` rows by the deterministic key
    * ln(u)/w inside each group, selected by the bounded
    * [[graft.aggregators.TopK]] aggregator — map-side partials forward
    * ~2k candidates per mapper per group instead of sorting every row
    * under a window. The per-group form of [[weightedSample]]. */
  def weightedSamplePerGroup(df: DataFrame, group: Column, id: Column,
                             weight: Column, nPerGroup: Int,
                             salt: String = "wsample"): DataFrame = {
    require(nPerGroup > 0, s"sample size must be positive: $nPerGroup")
    val u = (hash60(concat_ws(":", lit(salt), id)) + 1L).cast("double") /
      lit(1152921504606846976.0)
    val keyed = df.select(group.as("g"), id.cast("long").as("id"),
      (log(u) / weight.cast("double")).as("sample_key"))
    graft.aggregators.TopK.topKPerKey(keyed, "g", "id", "sample_key",
        nPerGroup, descending = true)
      // + 0.0 folds a rounded -0.0 into +0.0 (the signed-zero hash trap)
      .select(col("g"), col("id"),
        (round(col("sample_key"), 6) + lit(0.0)).as("sample_key"), col("rank"))
  }

  // ---- Corpus-fitted LM quality signal -------------------------------

  /** CCNet-style language-model quality signal, self-fitted: per-doc
    * mean unigram surprisal -ln p(token) under the CORPUS's own MLE
    * unigram distribution. Low surprisal ≈ common fluent tokens; high ≈
    * rare/garbage tokens — the cheap stand-in for the KenLM perplexity
    * filter of public pretraining pipelines (no LM jar in this
    * container, and the fit is the corpus itself, so the differential
    * oracle replays it exactly).
    *
    * Scale shape: one explode + one count aggregation keyed on token
    * (vocab-sized result, stays distributed), one equi-join of the
    * exploded tokens back to their counts (token-keyed shuffle join —
    * NOT a broadcast: a 100 TB corpus's vocabulary is not
    * driver-sized), a broadcast single-row total, and one final groupBy
    * doc. Hot tokens skew the join; AQE skew-split handles it since
    * both sides are plain shuffles. */
  def unigramSurprisal(df: DataFrame, id: Column, text: Column): DataFrame = {
    import graft.functions.TextAnalysis.tokens
    val ex = df.select(id.as("doc_id"), explode(tokens(text)).as("tok"))
    val counts = ex.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("tot"))
    ex.join(counts, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(avg(-log(col("cnt").cast("double") / col("tot"))).as("surprisal"))
  }

  /** Bigram conditional-LM surprisal, self-fitted like
    * [[unigramSurprisal]] but over transition probabilities: per-doc
    * mean of -ln p(w_i | w_{i-1}) with MLE p(b|a) = c(a,b) / c(a·)
    * where c(a·) counts `a` in bigram-context position. Docs with
    * fewer than two tokens score 0. Two vocabulary-keyed shuffles
    * (bigram counts, context counts) and two joins back — the same
    * distributed shape as the unigram fit, one order higher. */
  /** Adjacent (w1, w2) bigram structs of a token array — empty for
    * arrays under two tokens. Shared by the bigram LM fits and the PMI
    * collocation query so the Spark side cannot drift between them
    * (the DuckDB twin is the `[toks[i] ... for i in range]` fragment). */
  def bigramsOf(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"),
          element_at(toks, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  def bigramSurprisal(df: DataFrame, id: Column, text: Column): DataFrame = {
    import graft.functions.TextAnalysis.tokens
    val t = df.select(id.as("doc_id"), tokens(text).as("__toks"))
    val bi = t.select(col("doc_id"), explode(bigramsOf(col("__toks"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val cab = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
    val ca = bi.groupBy(col("w1")).agg(count(lit(1)).as("ca"))
    val scored = bi.join(cab, Seq("w1", "w2")).join(ca, Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(avg(-log(col("cab").cast("double") / col("ca"))).as("surprisal2"))
    t.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("surprisal2"), lit(0.0)).as("surprisal2"))
  }

  /** Interpolated Kneser-Ney bigram surprisal (absolute discount
    * D = 0.75), self-fitted on the corpus: per-doc mean of
    * −ln P_KN(w2|w1) with
    *   P_KN = max(c(w1,w2)−D, 0)/c(w1·)
    *        + D·N1+(w1,·)/c(w1·) · N1+(·,w2)/|bigram types|
    * — the real LM smoothing (discount mass reallocated to continuation
    * probability) that [[bigramSurprisal]]'s raw MLE lacks; the
    * perplexity-quality filter a curation pipeline actually runs. Same
    * distributed shape as the MLE fit: vocabulary-keyed count
    * aggregates (bigram, context, two continuation-type counts — each a
    * partial+final hash agg) joined back to the bigram stream, plus one
    * 1-row bigram-type-count broadcast. Docs with fewer than two tokens
    * score 0. */
  def kneserNeySurprisal(df: DataFrame, id: Column, text: Column,
                         discount: Double = 0.75): DataFrame = {
    import graft.functions.TextAnalysis.tokens
    require(discount > 0 && discount < 1, s"bad discount: $discount")
    val t = df.select(id.as("doc_id"), tokens(text).as("__toks"))
    val bi = t.select(col("doc_id"), explode(bigramsOf(col("__toks"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val cab = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
    val ca = bi.groupBy(col("w1")).agg(count(lit(1)).as("ca"))
    val n1f = cab.groupBy(col("w1")).agg(count(lit(1)).as("n1f"))
    val n1b = cab.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val nbig = cab.agg(count(lit(1)).as("nbig"))
    // op order mirrored verbatim in the oracle so IEEE results match:
    // max(cab-D,0)/ca + D*n1f/ca*(n1b/nbig)
    val p =
      greatest(col("cab").cast("double") - lit(discount), lit(0.0)) /
        col("ca").cast("double") +
      lit(discount) * col("n1f").cast("double") / col("ca").cast("double") *
        (col("n1b").cast("double") / col("nbig").cast("double"))
    val scored = bi.join(cab, Seq("w1", "w2")).join(ca, Seq("w1"))
      .join(n1f, Seq("w1")).join(n1b, Seq("w2"))
      .crossJoin(broadcast(nbig))
      .groupBy(col("doc_id"))
      .agg(avg(-log(p)).as("surprisal_kn"))
    t.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("surprisal_kn"), lit(0.0)).as("surprisal_kn"))
  }

  // ---- Source-mix resampling -----------------------------------------

  /** Deterministic source-mix resampling: replicate each document
    * `weight(source)` times, where fractional weights round
    * probabilistically-but-deterministically per document (weight 2.3 →
    * every doc appears twice, and the 30% of docs whose md5 bucket
    * falls below .3 appear a third time). This is how a pretraining mix
    * upsamples high-quality sources ("epochs per source") without an
    * RNG — the same doc gets the same copy count on every run, and the
    * copy index is emitted so downstream packing can shuffle copies
    * apart via [[shuffleOrder]] on (id, copy).
    *
    * Row-local explode (no shuffle); unlisted sources default to
    * weight 1.0. Weights must be < ~100 — replication is for mixing
    * epochs, not amplification. */
  def resampleByWeight(df: DataFrame, id: Column, source: Column,
                       weights: Map[String, Double],
                       salt: String = "mix"): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 100),
      s"weights out of range: $weights")
    val wcol = weights.foldLeft(lit(1.0)) { case (acc, (s, w)) =>
      when(source === s, lit(w)).otherwise(acc)
    }
    val base = floor(wcol).cast("int")
    val extra = when(
      sampleBucket(id, salt) < (pmod(wcol * 1e6, lit(1e6))).cast("long"), 1)
      .otherwise(0)
    df.withColumn("__copies", base + extra)
      .where(col("__copies") > 0)
      .select(df.columns.map(col) :+
        explode(sequence(lit(1), col("__copies"))).as("copy"): _*)
      .drop("__copies")
  }

  // ---- Corpus-wide duplicate-span removal ----------------------------

  /** Remove boilerplate spans shared across many documents (the
    * paragraph-dedup step of C4/Dolma-style pipelines, re-expressed over
    * fixed k-token spans since this corpus has no paragraph breaks):
    * chunk each document's tokens into consecutive k-token spans, count
    * how many DISTINCT documents each span string occurs in corpus-wide,
    * drop every span occurring in more than `maxDocs` documents, and
    * reassemble the surviving spans in order.
    *
    * Returns (doc_id, clean_text, n_dropped). Documents reduced to
    * nothing survive with an empty string — dropping them is a separate
    * policy decision ([[deterministicSample]]-style filters compose).
    *
    * Scale shape: one explode + groupBy on the span string (the only
    * full shuffle), a broadcast anti-join against the hot-span set
    * (bounded: spans exceeding `maxDocs` distinct docs are by
    * definition few relative to the corpus), and one groupBy doc to
    * reassemble. The span count aggregation is partial+final — no
    * hot-key skew reaches a single task's memory beyond its count. */
  // ---- Gopher-style document-quality rules ---------------------------

  /** The closed-class words Gopher's "stop word" rule checks for
    * (Rae et al. 2021, table A1: a document must contain at least two
    * of these to look like running English prose). */
  val gopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style per-document quality signals + keep verdict
    * (Rae et al. 2021 §A1.1; the rule family Dolma/RefinedWeb reuse):
    * word count in [minWords, maxWords], mean word length in
    * [minMeanLen, maxMeanLen], at least `minStopWords` stop-word hits,
    * and at least `minAlphaRatio` of words containing an alphabetic
    * character. Pass a MATERIALIZED token-array column (the
    * [[Dedup.wordShingles]] CSE hazard). Entirely row-local — the whole
    * rule battery pipelines at scan speed with no shuffle, which is
    * what makes it the FIRST pass of a 100 TB pipeline (cut cheap,
    * before any shuffling op sees the data).
    *
    * Returns named signal columns so downstream audits can see WHY a
    * document was cut, not just that it was. */
  def gopherQualityOf(toks: Column,
                      minWords: Int, maxWords: Int,
                      minMeanLen: Double, maxMeanLen: Double,
                      minStopWords: Int, minAlphaRatio: Double,
                      stopWords: Seq[String] = gopherStopWords): Seq[(String, Column)] = {
    val n = size(toks)
    val meanLen = when(n > 0,
      aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / n)
      .otherwise(lit(0.0))
    val stopArr = array(stopWords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t)))
    val alphaRatio = when(n > 0,
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / n)
      .otherwise(lit(0.0))
    val keep = n.between(minWords, maxWords) &&
      meanLen.between(minMeanLen, maxMeanLen) &&
      nStop >= minStopWords && alphaRatio >= minAlphaRatio
    Seq("n_words" -> n, "mean_word_len" -> meanLen,
      "n_stop" -> nStop, "alpha_ratio" -> alphaRatio, "keep" -> keep)
  }

  // ---- DSIR importance weights ---------------------------------------

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much more likely its hashed n-gram features are
    * under a TARGET distribution (e.g. a curated/high-quality slice)
    * than under the raw corpus. Weight = Σ_positions ln(p̂_t(b)/p̂_r(b))
    * with add-one-smoothed bucket probabilities over `dims` buckets;
    * features are unigrams plus space-joined bigrams, bucketed by
    * [[graft.functions.TextAnalysis.hash60]] so the differential oracle
    * replays every bucket assignment bit-identically.
    *
    * Single-action plan, [[graft.operators.TextVectorizers.hashedTfIdf]]
    * discipline: the exploded feature frame feeds both the fitted
    * bucket-stats branch and the per-doc scoring branch, so it is
    * persisted for the query's lifetime (caller releases via
    * `clearCache`/unpersist). Both model tables are tiny by
    * construction — `dims` rows of counts and a 1-row total — and
    * broadcast; the only full shuffles are the bucket-count aggregation
    * (map-side partials make it O(dims) per task) and the final per-doc
    * sum. Nothing here grows with corpus size except the scan. */
  /** Hashed unigram+bigram feature positions per doc: one row per
    * (doc, n-gram occurrence) with the n-gram's md5 bucket in
    * [0, dims) — the shared feature extraction under [[dsirWeights]]
    * and [[qualityClassifierScores]]. `extra` columns pass through
    * row-locally (e.g. a label). */
  private def hashedNgramBuckets(df: DataFrame, id: Column, text: Column,
                                 dims: Int, extra: Seq[(String, Column)]): DataFrame = {
    import graft.functions.TextAnalysis.tokens
    require(dims > 0, s"dims must be positive: $dims")
    val passNames = extra.map(e => col(e._1))
    val t = df.select(id.as("doc_id") +: extra.map { case (n, c) => c.as(n) } :+
      tokens(text).as("__toks"): _*)
    val uni = t.select(col("doc_id") +: passNames :+ explode(col("__toks")).as("f"): _*)
    val bi = t.select(col("doc_id") +: passNames :+
      explode(when(size(col("__toks")) >= 2,
        transform(sequence(lit(1), size(col("__toks")) - 1),
          i => concat_ws(" ", element_at(col("__toks"), i),
            element_at(col("__toks"), i + 1))))).as("f"): _*)
    uni.unionByName(bi)
      .select(col("doc_id") +: passNames :+
        pmod(hash60(col("f")), lit(dims.toLong)).as("bucket"): _*)
  }

  def dsirWeights(df: DataFrame, id: Column, text: Column,
                  isTarget: Column, dims: Int): DataFrame = {
    val feats = hashedNgramBuckets(df, id, text, dims, Seq("__tgt" -> isTarget))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = feats.groupBy(col("bucket")).agg(
      count(lit(1)).as("c_raw"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("c_tgt"))
    val tots = stats.agg(sum(col("c_raw")).as("tot_raw"), sum(col("c_tgt")).as("tot_tgt"))
    feats.join(broadcast(stats), "bucket").crossJoin(broadcast(tots))
      .select(col("doc_id"),
        log(((col("c_tgt") + 1.0) / (col("tot_tgt") + dims)) /
            ((col("c_raw") + 1.0) / (col("tot_raw") + dims))).as("__lr"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__lr")).as("dsir_weight"))
  }

  /** Model-based quality filtering (the fasttext-style classifier step
    * of the GPT-3/LLaMA data pipelines, Brown et al. 2020 §A /
    * Touvron et al. 2023): fit a logistic regression on hashed
    * unigram+bigram counts with a "looks like the curated slice" label,
    * then score every document with the positive-class probability.
    * DSIR ([[dsirWeights]]) is the closed-form importance-weight cousin;
    * this is the discriminative variant production pipelines train.
    *
    * Scale: features are a bounded `dims`-wide hashed space (no vocab
    * fit, no driver state), assembled sparse then densified per doc —
    * O(dims) per row; the LR fit is spark.ml's distributed L-BFGS.
    * The feature frame feeds the fit's iterations and the final scoring
    * pass, so it is persisted — caller releases via unpersist/
    * `clearCache` after the scores materialize (house contract, see
    * [[graft.operators.Dedup]]). Model-based output: gate with specs /
    * rows-only, not a SQL oracle. */
  /** The (doc_id, __label, __feat) frame both the LR fit and the
    * scoring pass consume: hashed n-gram counts densified to a
    * `dims`-wide vector; docs tokenizing to nothing get the zero
    * vector, not a dropped row. Persisted — the fit iterates over it. */
  private def qualityFeatureFrame(df: DataFrame, id: Column, text: Column,
                                  isTarget: Column, dims: Int): DataFrame = {
    val tf = hashedNgramBuckets(df, id, text, dims, Nil)
      .select(col("doc_id"), col("bucket").cast("int").as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val dense = tf.groupBy(col("doc_id"))
      .agg(map_from_arrays(collect_list(col("bucket")), collect_list(col("cnt"))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dims - 1)),
          b => coalesce(element_at(col("m"), b), lit(0L)).cast("double")).as("f"))
    df.select(id.as("doc_id"), isTarget.cast("double").as("__label"))
      .join(dense, Seq("doc_id"), "left")
      .withColumn("f", coalesce(col("f"), array_repeat(lit(0.0), dims)))
      .select(col("doc_id"), col("__label"),
        org.apache.spark.ml.functions.array_to_vector(col("f")).as("__feat"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Fit only — exposed so the fitted coefficients can be frozen into
    * the hash-gated scoring replay (tools.FreezeQualityLr → q523). */
  def fitQualityLr(df: DataFrame, id: Column, text: Column,
                   isTarget: Column, dims: Int = 512,
                   regParam: Double = 0.01, maxIter: Int = 50)
      : org.apache.spark.ml.classification.LogisticRegressionModel =
    fitQualityLrOn(qualityFeatureFrame(df, id, text, isTarget, dims),
      regParam, maxIter)

  /** Fit on an ALREADY-prepared feature frame — so a caller that also
    * scores the same frame (qualityClassifierScores) fits and
    * transforms the one plan instead of rebuilding it and relying on
    * cache canonicalization to deduplicate. */
  private def fitQualityLrOn(prepared: DataFrame, regParam: Double,
                             maxIter: Int)
      : org.apache.spark.ml.classification.LogisticRegressionModel = {
    // score with a summary-free copy: the training summary drags the
    // SparkSession into the scoring closure (see MLStages.stripTrainingSummary)
    graft.workflow.MLStages.stripTrainingSummary(
      new org.apache.spark.ml.classification.LogisticRegression()
        .setFeaturesCol("__feat").setLabelCol("__label")
        .setRegParam(regParam).setMaxIter(maxIter)
        .fit(prepared))
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
  }

  def qualityClassifierScores(df: DataFrame, id: Column, text: Column,
                              isTarget: Column, dims: Int = 512,
                              regParam: Double = 0.01, maxIter: Int = 50): DataFrame = {
    val prepared = qualityFeatureFrame(df, id, text, isTarget, dims)
    val model = fitQualityLrOn(prepared, regParam, maxIter)
    model.transform(prepared)
      .select(col("doc_id"),
        org.apache.spark.ml.functions.vector_to_array(col("probability"))
          .getItem(1).as("quality_prob"))
  }

  /** Score documents with a FROZEN logistic model — the deployment half
    * of [[qualityClassifierScores]] split out so it hash-gates: the
    * coefficients are a quantized literal table (decimal(12,6)), the
    * dot product folds exact decimals (weight x BIGINT count — order
    * never matters), and only the final sigmoid runs in double space.
    * At 100 TB this is the common production shape anyway: train once
    * offline, ship constants, score the corpus with one broadcast join.
    * Every doc scores — empty-token docs get the intercept-only prob. */
  def frozenLrScores(df: DataFrame, id: Column, text: Column,
                     weights: Seq[BigDecimal], intercept: BigDecimal): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val dims = weights.size
    val wDf = broadcast(weights.zipWithIndex
      .map { case (w, b) => (b.toLong, w.toString) }.toDF("bucket", "w")
      .select(col("bucket"), col("w").cast("decimal(12,6)").as("w")))
    val cnts = hashedNgramBuckets(df, id, text, dims, Nil)
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val dot = cnts.join(wDf, "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("w") * col("cnt")).as("dot"))
    df.select(id.as("doc_id")).join(dot, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(lit(intercept.toString).cast("decimal(12,6)") +
            coalesce(col("dot"), lit(0))).cast("double"))), 6)
          .as("quality_prob"))
  }

  /** Exact duplicated-span detection over OVERLAPPING k-token windows
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better" — the ExactSubstr criterion, re-expressed
    * relationally): a window is duplicated iff its k-token string
    * occurs in at least `minDocs` distinct documents; a document's
    * duplication coverage is the fraction of its token positions lying
    * under at least one duplicated window. Overlapping windows merge
    * into maximal intervals first (gaps-and-islands over window starts),
    * so coverage counts positions, not windows.
    *
    * Emits (doc_id, n_tokens, n_dup_windows, covered_tokens,
    * dup_coverage) — the signal the paper thresholds to cut documents,
    * kept as a score here so the cut composes with the other filters.
    *
    * Scale shape: the window explode is linear in corpus tokens; the
    * only corpus-wide shuffles are the span-keyed count aggregation
    * (partial+final, so hot boilerplate spans cost their count, not
    * their row list) and the span-keyed join back — both AQE-splittable.
    * The interval merge windows over (doc, start) where only DUPLICATED
    * windows remain — per-doc work bounded by the doc's own dup count.
    * Suffix automata do this with cross-doc positional state; the
    * relational shape trades a constant factor for shuffles that
    * partition freely at 100 TB. */
  def duplicatedSpanCoverage(df: DataFrame, id: Column, text: Column,
                             k: Int, minDocs: Int = 2): DataFrame = {
    import graft.functions.TextAnalysis.tokens
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"span length must be positive: $k")
    require(minDocs >= 2, s"minDocs below 2 marks everything duplicated: $minDocs")
    val t = df.select(id.as("doc_id"), tokens(text).as("__toks"))
    // guard: sequence(0, n-k) DESCENDS when n < k — gate on size first
    val wins = t.select(col("doc_id"),
        posexplode(when(size(col("__toks")) >= k,
          transform(sequence(lit(0), size(col("__toks")) - k),
            i => array_join(slice(col("__toks"), i + 1, lit(k)), " ")))
          .otherwise(array().cast("array<string>"))).as(Seq("start", "span")))
    val dup = wins.groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .where(col("__nd") >= minDocs).select(col("span"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    val islands = wins.join(dup, Seq("span"))
      .withColumn("__end", col("start") + k)
      .withColumn("__prev_max",
        max(col("__end")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__prev_max").isNull || col("start") >= col("__prev_max"), 1L)
          .otherwise(0L))
      .withColumn("__isl",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("start")).as("__s"), max(col("__end")).as("__e"),
        count(lit(1)).as("__nw"))
    val perDoc = islands.groupBy(col("doc_id"))
      .agg(sum(col("__e") - col("__s")).as("covered_tokens"),
        sum(col("__nw")).as("n_dup_windows"))
    t.select(col("doc_id"), size(col("__toks")).cast("bigint").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        when(col("n_tokens") > 0,
          coalesce(col("covered_tokens"), lit(0L)).cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)).as("dup_coverage"))
  }

  def dropBoilerplateSpans(df: DataFrame, id: Column, text: Column,
                           k: Int, maxDocs: Long): DataFrame = {
    import graft.functions.TextAnalysis.tokens
    require(k > 0, s"span length must be positive: $k")
    // materialize toks in its own projection (CSE hazard — see Dedup)
    val spans = df.select(id.as("doc_id"), tokens(text).as("__toks"))
      .select(col("doc_id"),
        transform(
          sequence(lit(0), floor((size(col("__toks")) - 1) / k).cast("int")),
          i => array_join(slice(col("__toks"), i * k + 1, lit(k)), " ")
        ).as("__spans"))
      .select(col("doc_id"), posexplode(col("__spans")).as(Seq("pos", "span")))
    val hot = spans.groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .where(col("__nd") > maxDocs)
      .select(col("span"))
    spans.join(broadcast(hot), Seq("span"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("span")))),
          s => s.getField("span")), " ").as("kept_text"),
        count(lit(1)).as("__kept"))
      .join(df.select(id.as("doc_id"),
        (floor((size(tokens(text)) - 1) / k) + 1).cast("bigint").as("__total")),
        Seq("doc_id"), "right")
      .select(col("doc_id"),
        coalesce(col("kept_text"), lit("")).as("clean_text"),
        (col("__total") - coalesce(col("__kept"), lit(0L))).as("n_dropped"))
  }
}
