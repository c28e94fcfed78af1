package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.{Curation, TimeSeries}
import graft.functions.TextAnalysis

/** Oracle-gated corpus-curation queries over `documents`: deterministic
  * hash sampling, reproducible split assignment, and per-group token
  * budgeting. Every decision is md5-derived so the DuckDB oracle
  * replays the exact kept/dropped sets — the audit property these
  * selection steps need in a production pretraining pipeline.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Greedy 4-round set-cover source selection over a (source, w)
    * shingle frame. Two label-identical formulations, dispatched on the
    * source count (both spec-gated in SetCoverSpec):
    *  - 1..62 sources: bitmask fast path — one cached long column of
    *    per-shingle membership masks; each round is ONE narrow scan.
    *  - >62 sources: the set-algebra greedy (per round one anti-join
    *    against the covered set + one source-count agg, 1-row argmax
    *    collected) — handles any source cardinality.
    *  - empty source list: empty result, no failure. */
  private[graft] def setCoverGreedy(s: SparkSession, srcList: Seq[String],
                                    shingled: DataFrame): DataFrame = {
    val s2 = s; import s2.implicits._
    var rows = Vector.empty[(Int, String, Long, Long)]
    if (srcList.nonEmpty && srcList.length <= 62) {
      val bitOf = srcList.zipWithIndex.toMap
      val bitExpr = srcList.tail.foldLeft(
        when(col("source") === srcList.head, lit(1L << bitOf(srcList.head)))) {
        case (acc, sn) => acc.when(col("source") === sn, lit(1L << bitOf(sn)))
      }
      val wm = shingled
        .select(col("w"), bitExpr.as("b"))
        .groupBy(col("w")).agg(expr("bit_or(b)").as("mask"))
        .select(col("mask"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var pickedMask = 0L
      var picked = Vector.empty[String]
      var cum = 0L
      var done = false
      for (step <- 1 to 4 if !done) {
        val unpicked = srcList.filterNot(picked.contains)
        if (unpicked.isEmpty) done = true
        else {
          val aggs = unpicked.map { sn =>
            sum(when(col("mask").bitwiseAND(lit(pickedMask)) === 0 &&
                shiftright(col("mask"), bitOf(sn)).bitwiseAND(lit(1L)) === 1,
              1L).otherwise(0L)).as(s"m_${bitOf(sn)}")
          }
          val r = wm.agg(aggs.head, aggs.tail: _*).head()
          unpicked.map(sn => (sn, r.getAs[Long](s"m_${bitOf(sn)}")))
            .filter(_._2 > 0)
            .sortBy { case (sn, m) => (-m, sn) }
            .headOption match {
            case None => done = true // coverage saturated: stop, like the
            case Some((sn, m)) =>    // oracle's empty p_k branches
              picked = picked :+ sn
              pickedMask |= (1L << bitOf(sn))
              cum += m
              rows = rows :+ ((step, sn, m, cum))
          }
        }
      }
      wm.unpersist(blocking = false)
    } else if (srcList.nonEmpty) {
      // set-algebra fallback for >62 sources (the pre-bitmask greedy,
      // step-identical): the bitmask formulation would overflow a long
      val ts = shingled.distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ts.count()
      var covered = Seq.empty[String].toDF("w")
      var picked = Vector.empty[String]
      var done = false
      for (step <- 1 to 4 if !done) {
        val notPicked =
          if (picked.isEmpty) lit(true) else !col("source").isin(picked: _*)
        val best = ts.join(covered, Seq("w"), "left_anti").where(notPicked)
          .groupBy(col("source")).agg(count(lit(1)).as("m"))
          .orderBy(col("m").desc, col("source")).limit(1).collect()
        if (best.isEmpty) done = true
        else {
          picked = picked :+ best.head.getString(0)
          covered = ts.where(col("source").isin(picked: _*))
            .select(col("w")).distinct().localCheckpoint(false)
          rows = rows :+ ((step, best.head.getString(0),
            best.head.getLong(1), covered.count()))
        }
      }
      ts.unpersist(blocking = false)
    } // srcList empty (no documents): fall through to the empty frame
    rows.toDF("step", "source", "marginal_new_tokens", "cum_tokens")
  }

  val queries: Map[String, Q] = Map(
    // greedy set-cover source selection (data-mixture curation): pick 4
    // sources one at a time, each maximizing the count of NOT-yet-
    // covered distinct tokens (ties broken by source name) — the
    // classical ln(n)-approximate corpus-selection step. Each round is
    // one anti-join + one 20-group agg whose 1-row argmax is collected
    // (bounded by the SOURCE count, never the corpus); the covered set
    // stays distributed. The oracle unrolls the same 4 rounds.
    "q347_set_cover_greedy" -> ((s, d) => {
      // Bitmask formulation of the same greedy: one cached column of
      // per-shingle source-membership masks replaces the per-round
      // (anti-join + agg + covered-distinct + checkpoint + count)
      // cadence — bit_or is idempotent, so the (source, w) pre-distinct
      // disappears too (the partial agg collapses duplicates map-side).
      // Each round is ONE narrow scan of the cached mask column; the
      // marginal for source s is #masks with no picked bit and s's bit,
      // and cum_tokens = running sum of marginals (covered sets grow by
      // exactly the marginal — disjoint increments), both identical to
      // the set-algebra the old shape computed. Ties still break to the
      // smallest source name; saturation (all marginals 0) still stops.
      val docs = Tables.documents(s, d)
      val srcList = docs.select(col("source")).distinct()
        .collect().map(_.getString(0)).sorted
      // spread the (source, text) rows before tokenize+shingle: the
      // per-row ICU tokenize + shingle build otherwise pipelines into
      // the single-row-group scan's ONE task (guide §2.5); project
      // first so the exchange carries only the two used columns
      val spreadDocs = Tables.spreadIfNarrow(
        docs.select(col("source"), col("text")))
      val shingled = spreadDocs
        .select(col("source"),
          explode(graft.operators.Dedup.wordShinglesOf(
            TextAnalysis.tokens(col("text")), 2)).as("w"))
      setCoverGreedy(s, srcList, shingled)
    }),

    // sequential Poisson sampling (Ohlsson): a size-weighted sample of
    // 3 docs per source with priority xi = u/w folded as the EXACT
    // integer (u29 << 33) div n_chars — no float division, so the
    // selected sample and its ranks replay bit-for-bit. The md5 draw
    // makes the "random" order deterministic and auditable.
    "q348_sps_sample" -> ((s, d) => {
      val u29 = pmod(TextAnalysis.hash60(concat_ws(":", lit("sps"),
        col("doc_id"))), lit(536870912L))
      val ranked = Tables.documents(s, d).where(col("n_chars") > 0)
        .select(col("source"), col("doc_id"), col("n_chars"), u29.as("u29"))
        .withColumn("q", expr("(u29 * 8589934592L) div n_chars"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("q"), col("doc_id"))))
      ranked.where(col("rank") <= 3)
        .select(col("source"), col("doc_id"), col("n_chars"), col("q"),
          col("rank"))
    }),

    // deterministic 50% sample, then 80/10/10 split assignment over the
    // kept rows — both md5-derived, both replayed exactly
    "q97_curation_sample_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val kept = Curation.deterministicSample(docs, col("doc_id"), 0.5, salt = "s1")
      Curation.hashSplit(kept, col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"),
          Curation.sampleBucket(col("doc_id"), "split").as("bucket"),
          col("split"))
    }),

    // per-source token budget: keep the longest documents of each
    // source while its running token total stays within 5000
    "q98_curation_token_budget" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("ntok", TextAnalysis.tokenCount(col("text")))
      Curation.tokenBudgetPerGroup(docs, col("doc_id"), col("source"),
          col("n_chars"), col("ntok"), budget = 5000L)
        .select(col("source"), col("doc_id"), col("ntok"))
    }),

    // benchmark decontamination: a held-out probe slice of the corpus
    // checked for shingle CONTAINMENT inside the remaining documents
    // (probe side broadcast — benchmark suites are small by nature)
    "q100_curation_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val probes = docs.where(col("doc_id") % 13 === 0)
      val corpus = docs.where(col("doc_id") % 13 =!= 0)
      Curation.containmentPairs(corpus, col("doc_id"), col("text"),
          probes, col("doc_id"), col("text"), k = 3, threshold = 0.2)
        .select(col("corpus_id"), col("probe_id"),
          round(col("containment"), 6).as("containment"))
    }),

    // decontamination DEPTH: q100's containment says how much of a
    // probe leaks; this says how LONG the longest verbatim leak is —
    // per corpus doc, the maximal run of consecutive token positions
    // whose 5-gram occurs in the (broadcast, distinct) probe shingle
    // set, i.e. the longest shared substring ≥5 tokens, the statistic
    // the "N-gram overlap ≥ 8 tokens" eval-decontamination rules
    // actually threshold. Positional shingles are a narrow per-row
    // map; the run-length is one doc-keyed window over matched
    // positions (p − row_number grouping) — scales like q100.
    "q535_contamination_span" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val K = 5
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
      def positional(df: DataFrame) = df.where(size(col("tk")) >= K)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("tk")) - lit(K - 1)),
          i => struct(i.as("p"), concat_ws(" ",
            (0 until K).map(o => element_at(col("tk"), i + lit(o))): _*)
            .as("sh")))).as("g"))
        .select(col("doc_id"), col("g.p").as("p"), col("g.sh").as("sh"))
      val probeSh = positional(t.where(col("doc_id") % 13 === 0))
        .select(col("sh")).distinct()
      val m = positional(t.where(col("doc_id") % 13 =!= 0))
        .join(broadcast(probeSh), "sh")
        .select(col("doc_id"), col("p"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      val runs = m.withColumn("grp", col("p") - row_number().over(w))
        .groupBy(col("doc_id"), col("grp")).agg(count(lit(1)).as("run"))
      runs.groupBy(col("doc_id"))
        .agg(sum(col("run")).as("n_matched"), max(col("run")).as("max_run"))
        .select(col("doc_id"), col("n_matched"), col("max_run"),
          (col("max_run") + lit(K - 1)).as("span_tokens"),
          (col("max_run") + lit(K - 1) >= 8).as("contaminated"))
    }),

    // data-constrained epoch allocation (the Muennighoff-style repeat
    // schedule): each source's e-th epoch is worth Q_s·0.5^(e−1) per
    // char (repeats decay geometrically, better sources decay from a
    // higher base) and costs U_s chars; candidates (source, e≤8) are
    // taken in marginal-value order until the 60%-of-corpus char
    // budget is spent. Q_s = Σ min(chars,2000)/(2000·docs) — exact
    // integer sums, ONE IEEE division; 0.5-powers are exact binary
    // scalings, so the greedy order replays bit-stable. One hash agg
    // over documents; the greedy runs on the collected per-source
    // stats (source domain ≤1000, require'd — a fit scalar).
    "q536_data_budget_epochs" -> ((s, d) => {
      val stRows = Tables.documents(s, d).groupBy(col("source"))
        .agg(sum(col("n_chars")).as("u"),
          sum(least(col("n_chars"), lit(2000))).as("qn"),
          count(lit(1)).as("nd"))
        .collect()
      require(stRows.length <= 1000,
        s"source domain too large for driver greedy: ${stRows.length}")
      val total = stRows.map(_.getLong(1)).sum
      val budget = total * 3 / 5
      case class Src(source: String, u: Long, q: Double)
      val srcs = stRows.map(r => Src(r.getString(0), r.getLong(1),
        r.getLong(2).toDouble / (r.getLong(3) * 2000L).toDouble))
      val cand = for (src <- srcs; e <- 1 to 8)
        yield (src, e, src.q * math.pow(0.5, (e - 1).toDouble))
      val ordered = cand.sortBy { case (src, e, m) => (-m, src.source, e) }
      var cum = 0L
      val kept = ordered.takeWhile { case (src, _, _) =>
        cum += src.u; cum <= budget }
      val epochs = kept.groupBy(_._1).map { case (src, rows) =>
        (src.source, src.u, math.round(src.q * 1e6), rows.size.toLong,
          rows.size * src.u)
      }.toSeq.sortBy(_._1)
      import s.implicits._
      epochs.toDF("source", "u_chars", "quality_q6", "epochs", "chars_used")
    }),

    // LLM-watermark detection (Kirchenbauer-style green-list bias):
    // the md5-derived half-vocabulary "green list" a watermarking
    // sampler would favor; per doc, z = (2g − n)/√n measures how far
    // the green-token count g sits above the n/2 chance level. A
    // synthetic-text detector that is pure row-local arithmetic — one
    // token explode + hash per position, exact integer counts, one
    // sqrt + one division at the end — so it runs at scan speed and
    // replays bit-stable in the oracle.
    "q537_watermark_detect" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      tok.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(pmod(TextAnalysis.hash60(col("w")), lit(2L)) === 0L, 1L)
            .otherwise(0L)).as("n_green"))
        .select(col("doc_id"), col("n_tokens"), col("n_green"),
          round((lit(2L) * col("n_green") - col("n_tokens")).cast("double") /
            sqrt(col("n_tokens").cast("double")), 6).as("z_green"),
          ((lit(2L) * col("n_green") - col("n_tokens")).cast("double") /
            sqrt(col("n_tokens").cast("double")) > 4.0).as("watermarked"))
    }),

    // vocabulary-level distribution shift per source: KL(P_s ‖ P_corpus)
    // over the corpus unigram vocabulary with add-1 smoothing on the
    // source side (so absent words contribute their smoothed mass, not
    // a 0·ln0) — the "how far is this source's language from the
    // pooled mix" number a source-weighting pipeline (q519's DoReMi,
    // q106's mix) reads before reweighting. Every KL term is quantized
    // to a 1e12 long before the (order-free) sum; the grid is
    // vocab-keyed × a broadcast source domain — scales with vocabulary,
    // never vocabulary². Emits the exact integer kl_q12.
    "q540_source_vocab_kl" -> ((s, d) => {
      val tok = Tables.documents(s, d).select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      val cs = tok.groupBy(col("source"), col("w")).agg(count(lit(1)).as("csw"))
      val cw = tok.groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val ns = tok.groupBy(col("source")).agg(count(lit(1)).as("ns"))
      val tot = tok.agg(count(lit(1)).as("n"),
        countDistinct(col("w")).as("v"))
      val grid = cw.crossJoin(broadcast(ns))
        .join(cs, Seq("source", "w"), "left")
        .crossJoin(broadcast(tot))
      val p = (coalesce(col("csw"), lit(0L)) + lit(1L)).cast("double") /
        (col("ns") + col("v")).cast("double")
      val q = col("cw").cast("double") / col("n").cast("double")
      grid.select(col("source"), col("ns"), col("v"),
          round(p * log(p / q) * lit(1e12)).cast("long").as("t"))
        .groupBy(col("source"))
        .agg(max(col("ns")).as("n_tokens"), max(col("v")).as("vocab"),
          sum(col("t")).as("kl_q12"))
    }),

    // self-BLEU diversity probe: per source, a deterministic md5-drawn
    // 6-doc sample; each sampled doc's clipped unigram precision
    // against the other sampled docs of its source — high self-BLEU
    // flags a template-y / mode-collapsed source (the diversity check
    // run on synthetic-data mixes before training on them). Sample is
    // k-bounded per source, so the reference-max join fans out at most
    // k−1 per (doc, word); clipped counts are exact integers and the
    // precision is ONE IEEE division.
    "q539_self_bleu" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val samp = Tables.documents(s, d)
        .withColumn("pri", TextAnalysis.hash60(
          concat(lit("sb:"), col("doc_id").cast("string"))))
        .withColumn("rk", row_number().over(Window.partitionBy(col("source"))
          .orderBy(col("pri"), col("doc_id"))))
        .where(col("rk") <= 6)
        .select(col("source"), col("doc_id"),
          TextAnalysis.tokens(col("text")).as("tk"))
      val cnt = samp
        .select(col("source"), col("doc_id"), explode(col("tk")).as("w"))
        .groupBy(col("source"), col("doc_id"), col("w"))
        .agg(count(lit(1)).as("c"))
      val lens = samp.select(col("source"), col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"))
      val rf = cnt.as("a").join(cnt.as("b"),
          col("a.source") === col("b.source") && col("a.w") === col("b.w") &&
            col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.source").as("source"), col("a.doc_id").as("doc_id"),
          col("a.w").as("w"), col("a.c").as("c"))
        .agg(max(col("b.c")).as("rc"))
      val cl = rf.groupBy(col("source"), col("doc_id"))
        .agg(sum(least(col("c"), col("rc"))).as("clipped"))
      lens.join(cl, Seq("source", "doc_id"), "left")
        .select(col("source"), col("doc_id"), col("n_tokens"),
          coalesce(col("clipped"), lit(0L)).as("clipped"),
          round(coalesce(col("clipped"), lit(0L)).cast("double") /
            col("n_tokens").cast("double"), 6).as("selfbleu1"))
    }),

    // boilerplate-prefix detection (the C4 header/footer cleanup): docs
    // sharing an identical first-12-token prefix are template copies —
    // one row-local prefix projection, one hash groupBy, flag prefixes
    // carried by ≥2 docs. Scales like exact dedup (q22): shuffle keys
    // are the prefix hashes, never doc pairs.
    "q542_boilerplate_prefix" -> ((s, d) => {
      val pre = Tables.documents(s, d)
        .select(col("doc_id"), array_join(
          slice(TextAnalysis.tokens(col("text")), 1, 12), " ").as("prefix"))
      pre.groupBy(col("prefix"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
        .where(col("n_docs") >= 2)
        .select(TextAnalysis.hash60(col("prefix")).as("prefix_h60"),
          col("prefix"), col("n_docs"), col("min_doc"))
    }),

    // PMI collocations among the top-100 corpus tokens: adjacent-pair
    // pointwise mutual information ln(c(a,b)·N / (c(a,·)·c(·,b))), the
    // phrase-mining signal a tokenizer-vocabulary or stopword pipeline
    // reads. Products cross into DECIMAL(19,0)·N before the division
    // (the 100 TB overflow guard); the top-100 filter is a TakeOrdered
    // k-bounded frame broadcast into two semi-joins, so the pair space
    // is 100², never vocab².
    "q544_pmi_collocations" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      val bi = t.select(explode(Curation.bigramsOf(col("__toks"))).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val cw = t.select(explode(col("__toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      val top = cw.orderBy(col("cnt").desc, col("w")).limit(100)
        .select(col("w"))
      val nbi = bi.agg(count(lit(1)).as("nb"))
      val ca = bi.groupBy(col("w1")).agg(count(lit(1)).as("ca"))
      val cb = bi.groupBy(col("w2")).agg(count(lit(1)).as("cb"))
      bi.join(broadcast(top.select(col("w").as("w1"))), Seq("w1"), "left_semi")
        .join(broadcast(top.select(col("w").as("w2"))), Seq("w2"), "left_semi")
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
        .where(col("cab") >= 5)
        .join(ca, Seq("w1")).join(cb, Seq("w2"))
        .crossJoin(broadcast(nbi))
        .select(col("w1"), col("w2"), col("cab"),
          round(log((col("cab").cast("decimal(19,0)") * col("nb"))
              .cast("double") /
            (col("ca").cast("decimal(19,0)") * col("cb")).cast("double")), 6)
            .as("pmi"))
    }),

    // Wasserstein-1 distance between each source's doc-length
    // (n_chars) distribution and the pooled corpus — the
    // distribution-drift number with units (chars), complementing the
    // unitless KL of q540: W1 = Σ_v |F_s(v) − F(v)|·gap(v) over the
    // merged value domain, kept exact as
    // |cum_s·n − cum·n_s|·gap / (n_s·n) with DECIMAL(38,0) numerator
    // sums and ONE IEEE division. The grid is value-domain keyed with
    // a broadcast source domain; cumulatives are source-partitioned
    // windows — no single-partition pass anywhere.
    "q545_wasserstein_length" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .select(col("source"), col("n_chars").cast("long").as("v"))
      val csv = docs.groupBy(col("source"), col("v"))
        .agg(count(lit(1)).as("cs"))
      val cv = docs.groupBy(col("v")).agg(count(lit(1)).as("cpool"))
      val ns = docs.groupBy(col("source")).agg(count(lit(1)).as("nsrc"))
      val tot = docs.agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("source")).orderBy(col("v"))
      val grid = cv.crossJoin(broadcast(ns))
        .join(csv, Seq("source", "v"), "left")
        .crossJoin(broadcast(tot))
        .select(col("source"), col("v"), col("nsrc"), col("n"),
          sum(coalesce(col("cs"), lit(0L))).over(w).as("cums"),
          sum(col("cpool")).over(w).as("cum"),
          (lead(col("v"), 1).over(w) - col("v")).as("gap"))
        .where(col("gap").isNotNull)
      grid.groupBy(col("source"))
        .agg(max(col("nsrc")).as("n_docs"), max(col("n")).as("n_total"),
          sum(abs(col("cums").cast("decimal(19,0)") * col("n") -
            col("cum").cast("decimal(19,0)") * col("nsrc")) * col("gap"))
            .cast("decimal(38,0)").as("w1_num"))
        .select(col("source"), col("n_docs"),
          round(col("w1_num").cast("double") /
            (col("n_docs").cast("decimal(19,0)") * col("n_total"))
              .cast("double"), 6).as("w1_chars"))
    }),

    // deterministic training-order shuffle: every epoch needs a
    // different, REPLAYABLE global permutation of the corpus (resume a
    // crashed run at batch N, or audit which docs a checkpoint saw).
    // Position(doc, epoch) = rank of md5('epk:'||doc_id) — computed as
    // the cumulative count over the hash-value domain via the
    // machine-bounded cumulativeByValueAuto prefix sum, NOT a global
    // row_number sort, so the permutation materializes with no
    // single-partition pass at any corpus size. Emits both epochs'
    // positions; batch = position div 64.
    "q549_epoch_shuffle" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      def positions(epoch: Int, posAs: String, batchAs: String) = {
        val h = docs.select(col("doc_id"), TextAnalysis.hash60(
          concat(lit(s"ep$epoch:"), col("doc_id").cast("string"))).as("v"))
        val counts = h.groupBy(col("v")).agg(count(lit(1)).as("c"))
        val cum = graft.operators.DataQuality
          .cumulativeByValueAuto(counts, Seq("c"))
        // exclusive prefix (cum − c) + the doc_id rank WITHIN the tied
        // hash value, so an md5 collision still yields a true
        // permutation (distinct consecutive positions, deterministic)
        val wv = org.apache.spark.sql.expressions.Window
          .partitionBy(col("v")).orderBy(col("doc_id"))
        h.join(cum, Seq("v")).join(counts, Seq("v"))
          .select(col("doc_id"),
            (col("cum_c") - col("c") + row_number().over(wv) - 1).as(posAs))
          .withColumn(batchAs, expr(s"$posAs div 64"))
      }
      positions(1, "pos_ep1", "batch_ep1")
        .join(positions(2, "pos_ep2", "batch_ep2"), Seq("doc_id"))
    }),

    // per-source "data card": the one-row-per-source release summary a
    // dataset publisher ships — volume (docs, chars, exact mean),
    // dominant language (mode, ties to the lexicographically smaller
    // tag via a total min_by ordering), and the within-source exact-dup
    // doc count. Three hash aggs + one broadcast join; every number is
    // an exact integer or ONE IEEE division.
    "q551_data_card" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val base = docs.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("total_chars"))
      val topLang = docs.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("source"))
        .agg(min_by(col("lang"),
          struct((-col("cnt")).as("nc"), col("lang"))).as("top_lang"))
      val dups = docs.select(col("source"), md5(col("text")).as("dg"))
        .groupBy(col("source"), col("dg")).agg(count(lit(1)).as("c"))
        .where(col("c") > 1)
        .groupBy(col("source")).agg(sum(col("c")).as("dup_docs"))
      base.join(broadcast(topLang), Seq("source"))
        .join(dups, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("total_chars"),
          round(col("total_chars").cast("double") /
            col("n_docs").cast("double"), 6).as("mean_chars"),
          col("top_lang"), coalesce(col("dup_docs"), lit(0L)).as("dup_docs"))
    }),

    // instruction-pair hygiene audit: treat each doc as (prompt = first
    // 16 tokens, response = rest) and score the two degeneracy signals
    // an SFT-data pipeline filters on — response/prompt lexical overlap
    // (a parroting response adds no training signal) and length ratio
    // (a truncated response under half the prompt). Pure row-local
    // array ops at scan speed; exact integer counts, ONE IEEE division
    // each, flags compare the raw ratios in both engines.
    "q555_sft_pair_audit" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
        .where(size(col("tk")) > 16)
      val p = array_distinct(slice(col("tk"), 1, 16))
      val r = array_distinct(slice(col("tk"), lit(17), size(col("tk")) - 16))
      val overlap = size(array_intersect(r, p)).cast("double") /
        size(r).cast("double")
      val lenRatio = (size(col("tk")) - 16).cast("double") / 16.0
      t.select(col("doc_id"), size(col("tk")).as("n_tokens"),
        round(overlap, 6).as("overlap_ratio"),
        round(lenRatio, 6).as("len_ratio"),
        (overlap >= 0.8 || lenRatio < 0.5).as("degenerate"))
    }),

    // cleaning-funnel attribution: which Gopher rule (in pipeline
    // order: word count → mean word length → stopwords → alpha ratio)
    // is the FIRST to reject each doc — the per-rule drop counts that
    // tell a curation owner which threshold actually does the cutting
    // (q115 emits the signals; this is the funnel over them)
    "q556_filter_attribution" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      val sig = Curation.gopherQualityOf(col("__toks"),
        minWords = 25, maxWords = 80, minMeanLen = 4.0, maxMeanLen = 10.0,
        minStopWords = 1, minAlphaRatio = 0.8).toMap
      docs.select(
          when(!sig("n_words").between(25, 80), lit("n_words"))
            .when(!sig("mean_word_len").between(4.0, 10.0),
              lit("mean_word_len"))
            .when(sig("n_stop") < 1, lit("n_stop"))
            .when(sig("alpha_ratio") < 0.8, lit("alpha_ratio"))
            .otherwise(lit("pass")).as("first_fail"))
        .groupBy(col("first_fail")).agg(count(lit(1)).as("n_docs"))
    }),

    // RAG index hygiene: exact chunk-level dedup BEFORE indexing —
    // identical 32-token chunks (overlap-8 chunking, q175's grid)
    // collapse to their (min doc, min idx) keeper; per doc, how many of
    // its chunks survive and the drop rate. One digest groupBy + one
    // keyed join back — scales like exact dedup, applied at the chunk
    // grain where RAG duplication actually bites.
    "q559_chunk_dedup" -> ((s, d) => {
      val chunks = Curation.chunkByTokens(Tables.documents(s, d),
          col("doc_id"), col("text"), chunkSize = 32, overlap = 8)
        .select(col("doc"), col("chunk_idx"), md5(col("chunk_text")).as("dg"))
      val keep = chunks.groupBy(col("dg"))
        .agg(min(struct(col("doc"), col("chunk_idx"))).as("k"))
      chunks.join(keep, Seq("dg"))
        .groupBy(col("doc"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("k.doc") === col("doc") &&
            col("k.chunk_idx") === col("chunk_idx"), 1L).otherwise(0L))
            .as("n_kept"))
        .select(col("doc").as("doc_id"), col("n_chunks"), col("n_kept"),
          (col("n_chunks") - col("n_kept")).as("n_dropped"),
          round((col("n_chunks") - col("n_kept")).cast("double") /
            col("n_chunks").cast("double"), 6).as("drop_rate"))
    }),

    // Gopher-style repetition filter signal: fraction of word 3-gram
    // positions whose shingle already occurred in the document
    "q101_curation_repetition" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
        .select(col("doc_id"),
          round(Curation.duplicateShingleRatioOf(col("__toks"), 3), 6).as("rep3"))
    }),

    // PII scrubbing: the corpus has no natural PII, so each doc gets a
    // deterministic doc_id-derived email/phone/IP suffix (replayed
    // exactly by the oracle) and the detection + redaction regexes run
    // over the result — counts plus the redacted text are both gated
    // Luhn mod-10 plausibility audit of the digit payloads a PII
    // scrubber would consider: per nation the valid-checksum rate over
    // md5-derived 12-digit account-number-like strings (the synthetic
    // corpus carries no phone column; the md5 payload is deterministic
    // in both engines) — the triage signal separating real card/account
    // identifiers from digit noise before redaction
    "q513_luhn_pii_audit" -> ((s, d) => {
      val payload = substring(TextAnalysis.hash60(
        concat(lit("luhn:"), col("c_custkey").cast("string")))
        .cast("string"), 1, 12)
      Tables.customer(s, d)
        .select(col("c_nationkey"),
          graft.functions.TextFunctions.luhnValid(payload).as("ok"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_luhn_valid"))
        .select(col("c_nationkey"), col("n"), col("n_luhn_valid"),
          round(col("n_luhn_valid").cast("double") / col("n").cast("double"), 6)
            .as("luhn_rate"))
    }),

    "q102_curation_pii_redact" -> ((s, d) => {
      val pii = concat(col("text"),
        lit(" contact u"), col("doc_id").cast("string"),
        lit("@ex"), (col("doc_id") % 7).cast("string"),
        lit(".com via +1-555-234-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), (col("doc_id") % 100).cast("string"),
        when(col("doc_id") % 3 === 0, lit(" backup b@ex.org")).otherwise(lit("")))
      val counted = Curation.piiCounts(pii)
        .foldLeft(Tables.documents(s, d).withColumn("__pii", pii)) {
          case (df, (name, c0)) => df.withColumn(name, c0.cast("int"))
        }
      counted.select(col("doc_id"), col("n_email"), col("n_ip"), col("n_phone"),
        Curation.redactPII(col("__pii")).as("red"))
    }),

    // concat-then-chunk sequence packing: deterministic shuffle order,
    // 8 shards, 2048-token sequences; every (shard, seq, offset)
    // assignment is replayed by the oracle's window sum
    "q103_curation_pack_sequences" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("ntok", TextAnalysis.tokenCount(col("text")).cast("bigint"))
      Curation.packSequences(docs, col("doc_id"), col("ntok"),
        seqLen = 2048L, numShards = 8)
    }),

    // language-balanced carving: heavy languages sampled down, long
    // tail kept whole — per-group thresholds, still a row-local filter
    // deterministic k-fold split audit: per (language, fold) cell
    // counts and deviation from the ideal 1/k share
    "q273_stratified_folds" -> ((s, d) => {
      Curation.stratifiedFoldReport(Tables.documents(s, d),
        col("doc_id"), col("lang"), k = 5)
    }),

    "q107_curation_stratified_sample" -> ((s, d) => {
      Curation.deterministicSamplePerGroup(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        col("doc_id"), col("lang"),
        Map("en" -> 0.2, "zh" -> 0.5), defaultFraction = 1.0, salt = "bal")
    }),

    // corpus-fitted unigram surprisal (KenLM-perplexity stand-in):
    // mean -ln p(token) per doc under the corpus MLE distribution
    "q108_curation_lm_surprisal" -> ((s, d) => {
      Curation.unigramSurprisal(Tables.documents(s, d), col("doc_id"), col("text"))
        .select(col("doc_id"), round(col("surprisal"), 6).as("surprisal"))
    }),

    // bigram transition surprisal: mean -ln p(w_i | w_{i-1}) under the
    // corpus's own MLE bigram model — one order above q108
    "q112_curation_bigram_surprisal" -> ((s, d) => {
      Curation.bigramSurprisal(Tables.documents(s, d), col("doc_id"), col("text"))
        .select(col("doc_id"), round(col("surprisal2"), 6).as("surprisal2"))
    }),

    // interpolated Kneser-Ney bigram surprisal (D = 0.75): the smoothed
    // LM perplexity filter — discount mass reallocated to continuation
    // probability — that q112's raw MLE only approximates
    "q531_kn_bigram_surprisal" -> ((s, d) => {
      Curation.kneserNeySurprisal(Tables.documents(s, d), col("doc_id"),
          col("text"))
        .select(col("doc_id"),
          round(col("surprisal_kn"), 6).as("surprisal_kn"))
    }),

    // pretraining source-mix resampling: src0 upsampled 2.5x, src1
    // downsampled to 0.25x, everything else kept at 1x — fractional
    // parts round deterministically per doc, copies are enumerated
    "q106_curation_source_mix" -> ((s, d) => {
      Curation.resampleByWeight(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        col("doc_id"), col("source"),
        Map("src0" -> 2.5, "src1" -> 0.25))
    }),

    // Gopher quality-rule battery: per-doc signal columns + keep
    // verdict; thresholds chosen to make every rule discriminate on
    // this corpus (word counts span 10..99, mean lengths 3.7..5.3,
    // stop hits 0..8)
    "q115_curation_gopher_quality" -> ((s, d) => {
      val sig = Curation.gopherQualityOf(col("__toks"),
        minWords = 25, maxWords = 80, minMeanLen = 4.0, maxMeanLen = 10.0,
        minStopWords = 1, minAlphaRatio = 0.8)
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
        .select(col("doc_id") +: sig.map { case (n, c) =>
          (if (n == "mean_word_len" || n == "alpha_ratio") round(c, 6) else c).as(n)
        }: _*)
    }),

    // DSIR importance weights: src0 documents are the "target"
    // distribution; every doc scored by its hashed-ngram likelihood
    // ratio against the raw corpus
    "q116_curation_dsir_weights" -> ((s, d) => {
      Curation.dsirWeights(Tables.documents(s, d), col("doc_id"),
          col("text"), col("source") === "src0", dims = 256)
        .select(col("doc_id"), round(col("dsir_weight"), 6).as("dsir_weight"))
    }),

    // model-based quality filter: LR over hashed n-grams, trained with
    // "is src0" as the curated-slice label; rows-only (trained-model
    // probabilities aren't SQL-replayable)
    "q120_curation_quality_classifier" -> ((s, d) => {
      Curation.qualityClassifierScores(Tables.documents(s, d), col("doc_id"),
          col("text"), col("source") === "src0", dims = 256)
        .select(col("doc_id"), round(col("quality_prob"), 6).as("quality_prob"))
    }),

    // the DEPLOYED half of q120, hash-gated: score every document with
    // the frozen coefficient table (FrozenQualityLr — the exact fit
    // q120 trains, quantized to 6dp). The dot product folds exact
    // decimals so partition order never matters; only the final sigmoid
    // is double. The fit stays spec/rows-only; this replays scoring.
    "q523_quality_classifier_score" -> ((s, d) => {
      Curation.frozenLrScores(Tables.documents(s, d), col("doc_id"),
        col("text"), graft.operators.FrozenQualityLr.weights,
        graft.operators.FrozenQualityLr.intercept)
    }),

    // Youden-J optimal decision threshold for the frozen quality
    // classifier (q523): over the quantized score domain, maximize
    // TPR − FPR against the src0 label, comparing via the exact
    // integer cross-product tp·N − fp·P (DECIMAL(19,0) guard) with
    // ties to the smallest threshold. The suffix counts ride the
    // cumulativeByValueAuto prefix sum (machine-bounded fast path /
    // two-level fallback), so the score domain never single-partition
    // sorts unboundedly; the argmax is max + equality-join + min, not
    // a global window.
    "q546_youden_threshold" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val scored = Curation.frozenLrScores(docs, col("doc_id"), col("text"),
          graft.operators.FrozenQualityLr.weights,
          graft.operators.FrozenQualityLr.intercept)
        .join(docs.select(col("doc_id"),
          (col("source") === "src0").as("lab")), Seq("doc_id"))
        .select(round(col("quality_prob") * 1e6).cast("long").as("v"),
          col("lab"))
      val counts = scored.groupBy(col("v")).agg(
        sum(when(col("lab"), 1L).otherwise(0L)).as("p"),
        sum(when(!col("lab"), 1L).otherwise(0L)).as("ng"))
      val cum = graft.operators.DataQuality
        .cumulativeByValueAuto(counts, Seq("p", "ng"))
      val tot = counts.agg(sum(col("p")).as("tp_all"),
        sum(col("ng")).as("fp_all"))
      val j = cum.join(counts, Seq("v"))
        .crossJoin(broadcast(tot))
        .select(col("v"),
          (col("tp_all") - col("cum_p") + col("p")).as("tp"),
          (col("fp_all") - col("cum_ng") + col("ng")).as("fp"),
          col("tp_all"), col("fp_all"))
        .withColumn("jnum",
          col("tp").cast("decimal(19,0)") * col("fp_all") -
            col("fp").cast("decimal(19,0)") * col("tp_all"))
      val mx = j.agg(max(col("jnum")).as("mj"))
      val thr = j.join(broadcast(mx), col("jnum") === col("mj"))
        .agg(min(col("v")).as("v"))
      j.join(broadcast(thr), Seq("v"))
        .select(col("v").as("thr_q6"), col("tp"), col("fp"),
          col("tp_all").as("n_pos"), col("fp_all").as("n_neg"),
          round(col("tp").cast("double") / col("tp_all").cast("double") -
            col("fp").cast("double") / col("fp_all").cast("double"), 6)
            .as("youden_j"))
    }),

    // per-domain cap: no source contributes more than its 10 best docs
    // (quality = n_chars here; ties to the smaller doc_id) — runs on
    // the bounded TopK aggregator, not a window
    "q119_curation_domain_cap" -> ((s, d) => {
      Curation.capPerGroup(Tables.documents(s, d), col("source"),
          col("doc_id"), col("n_chars"), k = 10)
        .select(col("group").as("source"), col("id").as("doc_id"),
          col("quality").cast("long").as("n_chars"), col("rank"))
    }),

    // corpus-wide duplicate-span removal (paragraph dedup over fixed
    // 3-token spans): spans present in more than 8 distinct docs are
    // boilerplate and get cut; cleaned text reassembles in order
    // KMV distinct-count sketch over corpus vocabulary, estimate +
    // exact side by side — the estimate itself hash-matches the oracle
    // because the k-minimum-values set is md5-deterministic
    // per-group KMV: distinct-user sketches per event type in one pass,
    // O(k) state per group
    "q148_kmv_by_group" -> ((s, d) => {
      graft.aggregators.Sketches.kmvDistinctByGroup(Tables.events(s, d),
        col("event_type"), col("user_id"), k = 64)
    }),

    // Count-Min frequency estimates for every user over the event log:
    // the matrix is purely additive, so even the sketch itself is
    // merge-order-deterministic and the oracle replays it cell-for-cell
    "q143_cms_freq" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val m = graft.aggregators.Sketches.cmsSketch(ev, col("user_id"),
        depth = 3, width = 64)
      graft.aggregators.Sketches.cmsEstimate(m, ev, col("user_id"),
        depth = 3, width = 64)
    }),

    // deterministic md5-HLL distinct orders per return flag, HASH-GATED
    // against the exact count: registers from bin()-length ranks, the
    // harmonic fold as a BIGINT power-of-two sum — the auditable
    // companion to the opaque DataSketches states (hllStates)
    "q512_hll_exact_replay" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val est = graft.aggregators.Sketches.hllDeterministic(li,
          Seq(col("l_returnflag")), col("l_orderkey").cast("string"))
        .withColumnRenamed("__g0", "flag")
      val exact = li.groupBy(col("l_returnflag").as("flag"))
        .agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
      est.join(exact, Seq("flag"))
        .select(col("flag"), col("buckets_set"),
          round(col("est_distinct"), 6).as("est_distinct"),
          col("exact_distinct"),
          round((col("est_distinct") - col("exact_distinct").cast("double")) /
            col("exact_distinct").cast("double"), 6).as("rel_err"))
    }),

    // DoReMi-style source reweighting: two unrolled exponentiated-
    // gradient rounds upweight high-surprisal (hard) sources, starting
    // from the per-source mean unigram surprisal (q108's statistic,
    // ROUND(.,6) so both engines fold the same input). Each round's
    // exp() output is quantized ROUND(.,6) -> DECIMAL(18,6) BEFORE the
    // normalization sum — libm outputs never feed an exact fold at
    // finer precision than the 6-decimal contract
    "q519_doremi_reweight" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(col("source"),
        explode(filter(TextAnalysis.tokens(col("text")),
          t => length(t) > 0)).as("tok"))
      val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val total = vocab.agg(sum(col("cnt")).as("tot"))
      val sur = toks.join(vocab, Seq("tok")).crossJoin(broadcast(total))
        .select(col("source"),
          (-log(col("cnt").cast("double") / col("tot").cast("double")))
            .cast("decimal(18,12)").as("sl"))
        .groupBy(col("source"))
        .agg(sum(col("sl")).as("ssum"), count(lit(1)).as("ntok"))
        .select(col("source"),
          round(col("ssum").cast("double") / col("ntok").cast("double"), 6)
            .as("avg_surprisal"))
      val eta = lit(0.5)
      val e1 = sur.select(col("source"), col("avg_surprisal"),
        round(exp(eta * col("avg_surprisal")), 6).cast("decimal(18,6)")
          .as("m1"))
      val z1 = e1.agg(sum(col("m1")).as("z1"))
      val w1 = e1.crossJoin(broadcast(z1))
        .select(col("source"), col("avg_surprisal"),
          (col("m1").cast("double") / col("z1").cast("double")).as("w1d"))
      val e2 = w1.select(col("source"), col("avg_surprisal"), col("w1d"),
        round(col("w1d") * exp(eta * col("avg_surprisal")), 6)
          .cast("decimal(18,6)").as("m2"))
      val z2 = e2.agg(sum(col("m2")).as("z2"))
      e2.crossJoin(broadcast(z2))
        .select(col("source"), col("avg_surprisal"),
          round(col("w1d"), 6).as("w_round1"),
          round(col("m2").cast("double") / col("z2").cast("double"), 6)
            .as("w_round2"))
    }),

    // padding-waste audit across sequence-bucketing schemes: for each
    // batching policy (power-of-two buckets floored at 64, linear 512
    // steps, one fixed 4096 window) the padded-token bill vs the real
    // token count — the analytic that picks a packing strategy before
    // burning accelerator hours. Pow2 ceilings via bin()-length bit
    // tricks (no libm), all integer sums
    "q518_padding_waste" -> ((s, d) => {
      val lens = Tables.documents(s, d).select(
        size(filter(TextAnalysis.tokens(col("text")),
          t => length(t) > 0)).cast("long").as("len"))
        .where(col("len") > 0)
      val pow2 = greatest(lit(64L),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(length(bin(len - 1)) AS INT))"))
      val lin = expr("((len + 511) div 512) * 512")
      val fixed = greatest(col("len"), lit(4096L))
      // ONE scan: all three schemes' sums in one aggregation, exploded
      // into the per-scheme rows afterwards
      def cell(name: String, c: Column) =
        struct(lit(name).as("scheme"), c.as("padded_tokens"))
      lens.agg(count(lit(1)).as("n_docs"),
          sum(col("len")).as("total_tokens"),
          sum(pow2).as("p1"), sum(lin).as("p2"), sum(fixed).as("p3"))
        .select(col("n_docs"), col("total_tokens"),
          explode(array(cell("pow2_min64", col("p1")),
            cell("linear512", col("p2")),
            cell("fixed4096", col("p3")))).as("s"))
        .select(col("s.scheme").as("scheme"), col("n_docs"),
          col("total_tokens"), col("s.padded_tokens").as("padded_tokens"),
          round((col("s.padded_tokens") - col("total_tokens")).cast("double") /
            col("s.padded_tokens").cast("double"), 6).as("waste_pct"))
    }),

    // HLL REGISTER ALGEBRA: union cardinality of two order-key sets
    // (R-flag vs N-flag lineitems) by per-bucket max of their register
    // tables, intersection by inclusion-exclusion — the merge property
    // that makes HLL states the warehouse primitive (per-day sketches
    // combine without re-scanning); every number replays exactly
    "q516_hll_union_algebra" -> ((s, d) => {
      import graft.aggregators.Sketches
      val li = Tables.lineitem(s, d)
      def keys(flag: String) = li.where(col("l_returnflag") === flag)
        .select(col("l_orderkey").cast("string").as("k"))
      def regs(flag: String) = Sketches.hllRegisters(keys(flag), Nil, col("k"))
      def est1(regs: DataFrame, name: String) =
        Sketches.hllEstimate(regs, Nil)
          .select(col("est_distinct").as(name))
      val merged = regs("R").unionByName(regs("N"))
        .groupBy(col("__b")).agg(max(col("__r")).as("__r"))
      val exact = keys("R").select(col("k"), lit(1).as("f"))
        .unionByName(keys("N").select(col("k"), lit(2).as("f")))
        .groupBy(col("k"))
        .agg(max(when(col("f") === 1, 1).otherwise(0)).as("r"),
          max(when(col("f") === 2, 1).otherwise(0)).as("n"))
        .agg(count(lit(1)).as("exact_union"),
          sum(when(col("r") === 1 && col("n") === 1, 1L).otherwise(0L))
            .as("exact_intersect"))
      est1(regs("R"), "est_r").crossJoin(broadcast(est1(regs("N"), "est_n")))
        .crossJoin(broadcast(est1(merged, "est_union")))
        .crossJoin(broadcast(exact))
        .select(round(col("est_r"), 6).as("est_r"),
          round(col("est_n"), 6).as("est_n"),
          round(col("est_union"), 6).as("est_union"),
          round(col("est_r") + col("est_n") - col("est_union"), 6)
            .as("est_intersect"),
          col("exact_union"), col("exact_intersect"))
    }),

    "q130_kmv_distinct" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      graft.aggregators.Sketches.kmvDistinct(toks, col("tok"), k = 256)
        .crossJoin(broadcast(
          toks.agg(countDistinct(col("tok")).as("exact_distinct"))))
        .select(round(col("est_distinct"), 6).as("est_distinct"),
          col("k_used").cast("bigint").as("k_used"), col("exact_distinct"))
    }),

    // deterministic exact-size uniform sample via min-k md5 priorities
    // (the bounded-memory path to column statistics at 100 TB)
    "q131_minks_sample" -> ((s, d) => {
      graft.aggregators.Sketches.minKSample(Tables.documents(s, d),
          col("doc_id"), k = 256)
        .select(col("doc_id"), col("n_chars"), col("sample_rank"))
    }),

    // exact corpus-vocabulary heavy hitters (freq >= 0.2% of tokens):
    // bounded Misra-Gries candidate pass + exact recount of candidates
    // only — no full groupBy-token result ever materializes
    "q128_heavy_hitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      graft.aggregators.Sketches.heavyHittersExact(toks, col("tok"), phi = 0.002)
    }),

    // deterministic weighted sample (Efraimidis-Spirakis keys over md5
    // draws): 100 docs, inclusion probability proportional to length
    "q129_curation_weighted_sample" -> ((s, d) => {
      Curation.weightedSample(Tables.documents(s, d), col("doc_id"),
          col("n_chars"), n = 100)
        // report the key rounded: ln() differs in the last ulp between
        // JVM and libm; the SELECTION is identical (boundary gaps are
        // astronomically wider than an ulp on md5-derived draws)
        .select(col("doc_id"), col("n_chars"),
          round(col("sample_key"), 6).as("sample_key"))
    }),

    // exact duplicated-span coverage over overlapping 5-token windows
    // (Lee et al. ExactSubstr criterion): fraction of each document's
    // token positions under a window shared with another document
    "q127_curation_dup_spans" -> ((s, d) => {
      Curation.duplicatedSpanCoverage(Tables.documents(s, d),
        col("doc_id"), col("text"), k = 5, minDocs = 2)
    }),

    // code-quality battery: the corpus has no newlines, so sentence
    // breaks become line breaks deterministically (oracle replays the
    // same rewrite), then the per-line signals run
    "q174_code_quality" -> ((s, d) => {
      // materialize the line-broken text ONCE (own projection) so the
      // six signals don't each re-run the regex (the wordShingles CSE
      // hazard, same fix)
      val base = Tables.documents(s, d).select(col("doc_id"),
        regexp_replace(col("text"), "\\. ", "\n").as("__t"))
      Curation.codeQualitySignals(col("__t"), longLine = 80)
        .foldLeft(base)((acc, nc) => acc.withColumn(nc._1, nc._2))
        .drop("__t")
    }),

    // contrastive negative sampling: 5 deterministic draws per anchor
    // doc (every 17th), excluding the anchor and its exact duplicates
    "q164_negative_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val keyed = docs.select(col("doc_id"), md5(col("text")).as("h"))
      val pos = keyed.as("a").join(keyed.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("pa"), col("b.doc_id").as("pb"))
      Curation.negativeSample(docs, col("doc_id"),
        docs.where(col("doc_id") % 17 === 0), col("doc_id"),
        pos, col("pa"), col("pb"), k = 5, salt = "neg")
    }),

    // RAG chunking: 32-token chunks advancing by 24 (8-token overlap);
    // chunk identity (doc, chunk_idx) is the key an embedding/ANN index
    // joins back on
    "q157_chunk_overlap" -> ((s, d) => {
      Curation.chunkByTokens(Tables.documents(s, d), col("doc_id"), col("text"),
        chunkSize = 32, overlap = 8)
    }),

    "q104_curation_drop_spans" -> ((s, d) => {
      val out = Curation.dropBoilerplateSpans(Tables.documents(s, d),
        col("doc_id"), col("text"), k = 3, maxDocs = 8L)
      out.select(col("doc_id"), col("clean_text"),
        col("n_dropped").cast("bigint").as("n_dropped"))
    }),

    // multinomial Naive Bayes SOURCE classifier fully inside the hash
    // gate: train per-(class, token) add-one-smoothed counts on the
    // 80% hash split, score every test doc as prior + Σ log p(tok|c)
    // with 1e-9-quantized terms folded in exact decimal (order-
    // invariant), argmax by (score desc, class asc). A trained model
    // whose inference is SQL-replayable end-to-end — counts in, logs
    // out, no iterative fit. Token-less docs produce no score rows
    // (both engines drop them identically).
    "q328_nb_classify" -> ((s, d) => {
      val sp = Curation.hashSplit(Tables.documents(s, d), col("doc_id"),
        Seq("train" -> 0.8, "test" -> 0.2))
      val tok = sp.select(col("doc_id"), col("source"), col("split"),
          explode(TextAnalysis.tokens(col("text"))).as("w"))
        .where(col("w") =!= "")
      val counts = tok.where(col("split") === "train")
        .groupBy(col("source").as("cls"), col("w"))
        .agg(count(lit(1)).as("n_ct"))
        .persist()
      val classTot = counts.groupBy(col("cls")).agg(sum(col("n_ct")).as("t_c"))
      val vocabN = counts.select(col("w")).distinct()
        .agg(count(lit(1)).as("v"))
      val docsTrain = sp.where(col("split") === "train")
        .groupBy(col("source").as("cls")).agg(count(lit(1)).as("d_c"))
      val dTot = docsTrain.agg(sum(col("d_c")).as("d_all"))
      val classes = classTot.join(docsTrain, Seq("cls"))
        .crossJoin(broadcast(vocabN)).crossJoin(broadcast(dTot))
      val testTok = tok.where(col("split") === "test")
        .select(col("doc_id"), col("w"))
      val terms = testTok.crossJoin(broadcast(classes))
        .join(counts, Seq("cls", "w"), "left")
        .select(col("doc_id"), col("cls"),
          round(log((coalesce(col("n_ct"), lit(0L)) + 1).cast("double") /
            (col("t_c") + col("v")).cast("double")), 9)
            .cast("decimal(38,9)").as("term"))
      val scores = terms.groupBy(col("doc_id"), col("cls"))
        .agg(sum(col("term")).as("tsum"))
        .join(broadcast(classes.select(col("cls"),
          log(col("d_c").cast("double") / col("d_all").cast("double"))
            .as("prior"))), Seq("cls"))
        .select(col("doc_id"), col("cls"),
          (col("prior") + col("tsum").cast("double")).as("score"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("cls"))
      scores.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .join(Tables.documents(s, d)
          .select(col("doc_id"), col("source").as("true_source")),
          Seq("doc_id"))
        .select(col("doc_id"), col("cls").as("pred_source"),
          col("true_source"), round(col("score"), 6).as("log_score"),
          when(col("cls") === col("true_source"), 1).otherwise(0)
            .as("correct"))
    }),

    // per-source quality-percentile filter: each source keeps docs at or
    // above its OWN 25th-percentile mean-word-length — the quota-style
    // curation cut that survives heterogeneous sources (a global
    // threshold would gut the weakest source entirely)
    "q316_quality_percentile_filter" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), col("source"),
          when(size(col("__toks")) > 0,
            aggregate(col("__toks"), lit(0L), (a, t) => a + length(t))
              .cast("double") / size(col("__toks")))
            .otherwise(lit(0.0)).as("score"))
      val thr = base.groupBy(col("source"))
        .agg(percentile(col("score"), lit(0.25)).as("p25"))
      base.join(broadcast(thr), Seq("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") >= col("p25"), 1L).otherwise(0L))
            .as("n_kept"),
          round(first(col("p25")), 6).as("p25"))
    }),

    // k-anonymized noisy release: (event_type, week) counts with groups
    // under k=25 SUPPRESSED and deterministic Laplace(b=1) noise added
    // to the survivors (md5-seeded inverse-CDF draw — the privacy-
    // release shape: suppression bounds re-identification, noise bounds
    // differencing; swap the md5 draw for a real DP RNG and nothing
    // else changes). One hash agg; noise is row-local.
    "q310_kanon_release" -> ((s, d) => {
      val g = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("week", col("ts")).cast("date").cast("string").as("week"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= 25)
      val u = (pmod(TextAnalysis.hash60(concat_ws(":", lit("kanon"),
        col("event_type"), col("week"))), lit(1000000L)).cast("double") +
        lit(0.5)) / lit(1000000.0)
      val lap = -signum(u - lit(0.5)) *
        log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
      g.select(col("event_type"), col("week"),
        (col("n") + round(lap, 0).cast("long")).as("n_noisy"))
    }),

    // l-diversity audit (q310's release-safety companion): per
    // quasi-identifier group (nation x segment), how many DISTINCT
    // sensitive values (balance bucket) appear, plus the Shannon
    // entropy of the sensitive distribution (per-term quantized to
    // DECIMAL(18,12) so the fold is engine-exact); groups with l < 3
    // are flagged as re-identification risks
    "q410_l_diversity" -> ((s, d) => {
      val base = Tables.customer(s, d).select(col("c_nationkey").as("nat"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal").cast("decimal(12,2)").cast("double") /
          lit(2000.0)).cast("long").as("b"))
      val cgb = base.groupBy(col("nat"), col("seg"), col("b"))
        .agg(count(lit(1)).as("c"))
      val tot = cgb.groupBy(col("nat"), col("seg"))
        .agg(sum(col("c")).as("n_g"))
      val term = cgb.join(tot, Seq("nat", "seg"))
        .withColumn("p", col("c").cast("double") / col("n_g").cast("double"))
        .withColumn("e", (-(col("p") * log(col("p"))))
          .cast("decimal(18,12)"))
      term.groupBy(col("nat").as("c_nationkey"),
          col("seg").as("c_mktsegment"))
        .agg(max(col("n_g")).as("n"), count(lit(1)).as("l_distinct"),
          round(sum(col("e")).cast("double"), 6).as("entropy"))
        .withColumn("violates_l3",
          when(col("l_distinct") < 3, 1L).otherwise(0L))
    }),

    // t-closeness audit: per quasi-identifier group, the ordered-EMD
    // distance between the group's sensitive-bucket distribution and
    // the global one — |F_g - F| cross-multiplied in exact integers
    // over the zero-filled bucket grid (group-domain x bucket-domain,
    // both bounded), normalized by (m-1); t > 0.2 decided by exact
    // integer comparison, never a float threshold
    "q411_t_closeness" -> ((s, d) => {
      val base = Tables.customer(s, d).select(col("c_nationkey").as("nat"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal").cast("decimal(12,2)").cast("double") /
          lit(2000.0)).cast("long").as("b"))
      val cgb = base.groupBy(col("nat"), col("seg"), col("b"))
        .agg(count(lit(1)).as("c"))
      val groups = base.groupBy(col("nat"), col("seg"))
        .agg(count(lit(1)).as("n_g"))
      val buckets = base.groupBy(col("b")).agg(count(lit(1)).as("cg"))
      val grid = groups.crossJoin(broadcast(buckets))
        .join(cgb, Seq("nat", "seg", "b"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val wg = Window.partitionBy(col("nat"), col("seg")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wp = Window.partitionBy(col("nat"), col("seg"))
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val t = grid
        .withColumn("cum_g", sum(col("c")).over(wg))
        .withColumn("cum", sum(col("cg")).over(wg))
        .withColumn("n_tot", sum(col("cg")).over(wp))
        .withColumn("m", count(lit(1)).over(wp))
        .withColumn("term",
          abs(dec(col("cum_g")) * col("n_tot") - dec(col("cum")) * col("n_g")))
      t.groupBy(col("nat").as("c_nationkey"), col("seg").as("c_mktsegment"))
        .agg(max(col("n_g")).as("n"), max(col("m")).as("m_buckets"),
          max(col("n_tot")).as("nt"), sum(col("term")).as("tsum"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          col("m_buckets"),
          round(col("tsum").cast("double") /
            (col("n").cast("double") * col("nt").cast("double")) /
            (col("m_buckets") - 1).cast("double"), 6).as("t_emd"),
          when(dec(lit(5L)) * col("tsum") >
            dec(col("n")) * col("nt") * (col("m_buckets") - 1), 1L)
            .otherwise(0L).as("violates_t02"))
    }),

    // BLEU-2 between the q438 doc pairs (reference = a, candidate = b):
    // clipped n-gram precision is sum(min(count_cand, count_ref)) via a
    // gram-level groupBy join — never a per-pair array intersect — so
    // the kernel is two hash aggs + one equi-join per order and scales
    // to corpus-size pair lists; brevity penalty exp(1 - r/c) crosses
    // the engines through the q447 DECIMAL(18,12) quantize, and the
    // geometric mean is sqrt (IEEE-exact), not exp/ln
    "q448_bleu_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
          split(lower(trim(col("text"))), "\\s+").as("toks"))
        .where(size(col("toks")) >= 2)
      val prs = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
        .join(docs.select(col("doc_id").as("b")), Seq("b"))
      def grams(n: Int, toks: Column): Column =
        if (n == 1) toks
        else transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))
      def sideCounts(side: String, n: Int): DataFrame =
        prs.join(docs.select(col("doc_id").as(side), col("toks")), Seq(side))
          .select(col("a"), col("b"), explode(grams(n, col("toks"))).as("g"))
          .groupBy(col("a"), col("b"), col("g"))
          .agg(count(lit(1)).as(s"c$side"))
      def clip(n: Int): DataFrame =
        sideCounts("b", n).join(sideCounts("a", n), Seq("a", "b", "g"))
          .groupBy(col("a"), col("b"))
          .agg(sum(least(col("cb"), col("ca"))).as(s"clip$n"))
      val lens = prs
        .join(docs.select(col("doc_id").as("a"),
          size(col("toks")).cast("long").as("la")), Seq("a"))
        .join(docs.select(col("doc_id").as("b"),
          size(col("toks")).cast("long").as("lb")), Seq("b"))
      val j = lens.join(clip(1), Seq("a", "b"), "left")
        .join(clip(2), Seq("a", "b"), "left")
        .na.fill(0L, Seq("clip1", "clip2"))
      val p1 = col("clip1").cast("double") / col("lb").cast("double")
      val p2 = col("clip2").cast("double") / (col("lb") - 1).cast("double")
      val bp = when(col("lb") >= col("la"), lit(1.0))
        .otherwise(exp(lit(1.0) -
          col("la").cast("double") / col("lb").cast("double")))
        .cast("decimal(18,12)").cast("double")
      j.select(col("a").as("doc_a"), col("b").as("doc_b"),
        col("la"), col("lb"), col("clip1"), col("clip2"),
        round(p1, 6).as("p1"), round(p2, 6).as("p2"),
        round(bp, 6).as("bp"),
        round(bp * sqrt(p1 * p2), 6).as("bleu2"))
    }),

    // ROUGE-L between adjacent doc pairs via Hunt-Szymanski: LCS =
    // longest strictly-increasing subsequence of match positions
    // (a-order ascending, b-position descending within an a-token), so
    // the q424 patience fold computes summary-eval F scores with NO
    // quadratic DP table — the distributed ROUGE kernel
    "q438_rouge_l_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
      val prs = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
        .join(docs.select(col("doc_id").as("b")), Seq("b"))
      val aseq = prs.join(docs.select(col("doc_id").as("a"), col("toks")),
          Seq("a"))
        .select(col("a"), col("b"),
          posexplode(col("toks")).as(Seq("ap0", "tok")))
        .select(col("a"), col("b"), (col("ap0") + 1).as("ap"), col("tok"))
      val bseq = prs.join(docs.select(col("doc_id").as("b"), col("toks")),
          Seq("b"))
        .select(col("a"), col("b"),
          posexplode(col("toks")).as(Seq("bp0", "tok")))
        .select(col("a"), col("b"), (col("bp0") + 1).as("bp"), col("tok"))
      val matches = aseq.join(bseq, Seq("a", "b", "tok"))
        .select(col("a"),
          (col("ap") * 10000 + (lit(10000) - col("bp"))).as("ord"),
          col("bp").cast("long").as("v"))
      val lcs = TimeSeries.lisLength(matches, col("a"), col("ord"),
          col("v"))
        .select(col("key").as("a"), col("lis_len").as("lcs"))
      val lens = prs
        .join(docs.select(col("doc_id").as("a"),
          size(col("toks")).cast("long").as("la")), Seq("a"))
        .join(docs.select(col("doc_id").as("b"),
          size(col("toks")).cast("long").as("lb")), Seq("b"))
      lcs.join(lens, Seq("a"))
        .select(col("a").as("doc_a"), col("b").as("doc_b"), col("lcs"),
          round(col("lcs").cast("double") / col("la").cast("double"), 6)
            .as("rouge_p"),
          round(col("lcs").cast("double") / col("lb").cast("double"), 6)
            .as("rouge_r"),
          round(lit(2.0) * (col("lcs").cast("double") /
              col("la").cast("double")) *
            (col("lcs").cast("double") / col("lb").cast("double")) /
            (col("lcs").cast("double") / col("la").cast("double") +
             col("lcs").cast("double") / col("lb").cast("double")), 6)
            .as("rouge_f"))
    }),

    // longest verbatim span between adjacent doc pairs: word-3-gram
    // anchors matched by position, runs detected as gaps-and-islands
    // along the (ap - bp) DIAGONAL — the memorization-scan kernel that
    // finds the longest common substring without any quadratic DP
    "q439_verbatim_span" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
          split(lower(trim(col("text"))), "\\s+").as("toks"))
        .where(size(col("toks")) >= 3)
      val prs = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
        .join(docs.select(col("doc_id").as("b")), Seq("b"))
      def g3(toks: Column): Column = transform(
        sequence(lit(1), greatest(size(toks) - 2, lit(1))),
        i => struct(i.as("p"), concat_ws(" ", element_at(toks, i),
          element_at(toks, i + 1), element_at(toks, i + 2)).as("g")))
      val ag = prs.join(docs.select(col("doc_id").as("a"), col("toks")),
          Seq("a"))
        .select(col("a"), col("b"), explode(g3(col("toks"))).as("sg"))
        .select(col("a"), col("b"), col("sg.p").as("ap"),
          col("sg.g").as("g"))
      val bg = prs.join(docs.select(col("doc_id").as("b"), col("toks")),
          Seq("b"))
        .select(col("a"), col("b"), explode(g3(col("toks"))).as("sg"))
        .select(col("a"), col("b"), col("sg.p").as("bp"),
          col("sg.g").as("g"))
      val mm = ag.join(bg, Seq("a", "b", "g"))
        .select(col("a"), (col("ap") - col("bp")).as("diag"), col("ap"))
      val w = Window.partitionBy(col("a"), col("diag")).orderBy(col("ap"))
      mm.withColumn("grp", col("ap") - row_number().over(w))
        .groupBy(col("a"), col("diag"), col("grp"))
        .agg(count(lit(1)).as("run"))
        .groupBy(col("a"))
        .agg(count(lit(1)).as("n_runs"), max(col("run")).as("max_run"))
        .select(col("a").as("doc_a"), (col("a") + 1).as("doc_b"),
          col("n_runs"), col("max_run"),
          (col("max_run") + 2).as("longest_span_tokens"))
    }),

    // monetary-unit (PPS systematic) audit sampling: every ~T-th cent
    // of cumulative line value selects its line, md5-seeded start
    // offset — the classic financial-audit sampler, selection decided
    // by exact integer threshold crossings over the two-level prefix
    "q428_monetary_unit_sampling" -> ((s, d) => {
      val rows = Tables.lineitem(s, d).select(
          (col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("v"),
          (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
            .as("w"))
        // (orderkey, linenumber) repeats in the synthetic data: reduce
        // to one monetary unit per position so the prefix is unambiguous
        .groupBy(col("v")).agg(sum(col("w")).as("w"))
      val cum = graft.operators.DataQuality.cumulativeByValue(rows, Seq("w"))
      val tot = rows.agg(sum(col("w")).as("total"))
        .select(col("total"),
          (floor(col("total").cast("double") / lit(200.0)).cast("long") + 1)
            .as("t"))
        .select(col("total"), col("t"),
          pmod(TextAnalysis.hash60(lit("mus")), col("t")).as("u"))
      cum.join(rows, Seq("v")).crossJoin(broadcast(tot))
        .where(floor((col("cum_w") - col("u")).cast("double") /
            col("t").cast("double")) >
          floor((col("cum_w") - col("w") - col("u")).cast("double") /
            col("t").cast("double")))
        .select(expr("v div 8").as("l_orderkey"),
          pmod(col("v"), lit(8)).as("l_linenumber"),
          col("w").as("w_cents"), col("cum_w"))
    }),

    // Neyman allocation of a 1000-unit sample across brand strata
    // (proportional to N_h * S_h), integerized by largest remainder —
    // survey-sampling design from exact sufficient stats
    "q429_neyman_allocation" -> ((s, d) => {
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val st = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
            .as("x"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_h"), sum(dec(col("x"))).as("sx"),
          sum(dec(col("x")) * col("x")).as("sxx"))
      val nd = col("n_h").cast("double")
      val sh = sqrt((nd * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")) /
        (nd * (nd - lit(1.0)))) / lit(100.0)
      val terms = st.select(col("p_brand"), col("n_h"),
        (nd * sh).cast("decimal(28,6)").as("nhsh"), sh.as("s_h"))
      val wAll = Window.partitionBy()
      val wRank = Window.orderBy(col("frac").desc, col("p_brand"))
      val alloc = terms
        .withColumn("d", sum(col("nhsh")).over(wAll).cast("double"))
        .withColumn("raw", lit(1000.0) * col("nhsh").cast("double") /
          col("d"))
        .withColumn("fl", floor(col("raw")).cast("long"))
        .withColumn("frac", col("raw") - col("fl").cast("double"))
        .withColumn("sum_fl", sum(col("fl")).over(wAll))
        .withColumn("rk", row_number().over(wRank))
      alloc.select(col("p_brand"), col("n_h"), round(col("s_h"), 6)
          .as("s_h"),
        (col("fl") + when(col("rk") <= lit(1000L) - col("sum_fl"), 1L)
          .otherwise(0L)).as("alloc_n"))
    }),

    // rendezvous (highest-random-weight) sharding audit: deterministic
    // md5 weights assign each order key to one of 8 shards; the argmax
    // per key encodes (weight, shard) into ONE decimal scalar (no
    // struct comparator needed in either engine). Emits the balance
    // chi2 against uniform and the fraction of keys that move when a
    // 9th shard joins — the ~1/9 consistent-hashing guarantee
    "q417_rendezvous_shards" -> ((s, d) => {
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val keys = Tables.orders(s, d).select(col("o_orderkey").as("k"))
      val a = keys.select(col("k"), explode(sequence(lit(0), lit(8))).as("shd"))
        .withColumn("h", TextAnalysis.hash60(
          concat_ws(":", lit("rv"), col("shd"), col("k"))))
      val pk = a.groupBy(col("k")).agg(
          max(when(col("shd") <= 7, dec(col("h")) * 16 + col("shd")))
            .as("m8"),
          max(dec(col("h")) * 16 + col("shd")).as("m9"))
        .select(col("k"), (col("m8") % 16).cast("long").as("s8"),
          (col("m9") % 16).cast("long").as("s9"))
      val counts = pk.groupBy(col("s8")).agg(count(lit(1)).as("c"))
      val stats = counts.agg(sum(col("c")).as("n"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("cc"),
        min(col("c")).as("min_c"), max(col("c")).as("max_c"))
      val moved = pk.agg(
        sum(when(col("s8") =!= col("s9"), 1L).otherwise(0L)).as("n_moved"))
      stats.crossJoin(moved)
        .select(col("n").as("n_keys"), col("min_c").as("min_shard"),
          col("max_c").as("max_shard"),
          round(lit(8.0) * col("cc").cast("double") /
            col("n").cast("double") - col("n").cast("double"), 6)
            .as("chi2_uniform"),
          col("n_moved"),
          round(col("n_moved").cast("double") / col("n").cast("double"), 6)
            .as("moved_frac"))
    }),

    // n-gram novelty audit: per doc, the fraction of its distinct word
    // trigrams that FIRST appear in it (global min doc_id per shingle =
    // one groupBy) — low novelty marks template spam / memorized
    // boilerplate entering the corpus; the corpus-order framing makes
    // it an incremental-ingest metric. Two shuffles total (first-seen
    // agg + per-doc agg); the shingle explode never self-joins.
    "q291_ngram_novelty" -> ((s, d) => {
      val sh = graft.operators.Dedup.shingleFrame(
        Tables.documents(s, d), col("doc_id"), col("text"), 3)
      val ex = sh.select(col("doc"), explode(col("shingles")).as("s"))
      val first = ex.groupBy(col("s")).agg(min(col("doc")).as("fdoc"))
      ex.join(first, Seq("s"))
        .groupBy(col("doc").as("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("fdoc") === col("doc"), 1L).otherwise(0L))
            .as("n_novel"))
        .withColumn("novelty",
          round(col("n_novel").cast("double") / col("n_shingles"), 6))
    })
  )

  private val H60 = (x: String) => s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  /** DuckDB replay of the frozen-coefficient LR scorer (q523), emitting
    * (doc_id, quality_prob) — shared by q523 and the q546 threshold
    * sweep. */
  private lazy val frozenLrSql: String = {
    val values = graft.operators.FrozenQualityLr.weights.zipWithIndex
      .map { case (w, b) => s"($b, CAST($w AS DECIMAL(12,6)))" }
      .mkString(",\n             ")
    val b0 = graft.operators.FrozenQualityLr.intercept
    s"""WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           FROM documents),
         uni AS (SELECT doc_id, unnest(toks) AS f FROM t),
         bi AS (
           SELECT doc_id,
             unnest([toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))]) AS f
           FROM t),
         cnts AS (
           SELECT doc_id,
             CAST(('0x' || substr(md5(f), 1, 15)) AS BIGINT) % 256 AS bucket,
             count(*) AS cnt
           FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
           GROUP BY 1, 2),
         w(bucket, w) AS (
           VALUES $values),
         dot AS (
           SELECT doc_id, sum(w * cnt) AS dot
           FROM cnts JOIN w USING (bucket) GROUP BY 1)
         SELECT d.doc_id,
           ROUND(1.0 / (1.0 + EXP(-(CAST(CAST($b0 AS DECIMAL(12,6))
               + COALESCE(dot, 0) AS DOUBLE)))), 6) AS quality_prob
         FROM documents d LEFT JOIN dot USING (doc_id)"""
  }
  private def bucket(salt: String) =
    s"${H60(s"'$salt:' || CAST(doc_id AS VARCHAR)")} % 1000000"

  val oracles: Map[String, String] = Map(
    "q347_set_cover_greedy" ->
      """WITH ts AS (SELECT DISTINCT source, w FROM (
             SELECT source,
                    unnest(list_distinct([array_to_string(toks[i:i+1], ' ')
                      for i in range(1, greatest(len(toks) - 1, 0) + 1)]))
                      AS w
             FROM (SELECT source,
                          regexp_split_to_array(lower(trim(text)), '\s+')
                            AS toks
                   FROM documents))),
          r1 AS (SELECT source, count(*) AS m FROM ts GROUP BY 1),
          p1 AS (SELECT source, m FROM r1 ORDER BY m DESC, source LIMIT 1),
          c1 AS (SELECT DISTINCT w FROM ts
                 WHERE source IN (SELECT source FROM p1)),
          r2 AS (SELECT source, count(*) AS m FROM ts
                 WHERE source NOT IN (SELECT source FROM p1)
                   AND w NOT IN (SELECT w FROM c1) GROUP BY 1),
          p2 AS (SELECT source, m FROM r2 ORDER BY m DESC, source LIMIT 1),
          c2 AS (SELECT DISTINCT w FROM ts
                 WHERE source IN (SELECT source FROM p1
                                  UNION SELECT source FROM p2)),
          r3 AS (SELECT source, count(*) AS m FROM ts
                 WHERE source NOT IN (SELECT source FROM p1
                                      UNION SELECT source FROM p2)
                   AND w NOT IN (SELECT w FROM c2) GROUP BY 1),
          p3 AS (SELECT source, m FROM r3 ORDER BY m DESC, source LIMIT 1),
          c3 AS (SELECT DISTINCT w FROM ts
                 WHERE source IN (SELECT source FROM p1
                                  UNION SELECT source FROM p2
                                  UNION SELECT source FROM p3)),
          r4 AS (SELECT source, count(*) AS m FROM ts
                 WHERE source NOT IN (SELECT source FROM p1
                                      UNION SELECT source FROM p2
                                      UNION SELECT source FROM p3)
                   AND w NOT IN (SELECT w FROM c3) GROUP BY 1),
          p4 AS (SELECT source, m FROM r4 ORDER BY m DESC, source LIMIT 1),
          c4 AS (SELECT DISTINCT w FROM ts
                 WHERE source IN (SELECT source FROM p1
                                  UNION SELECT source FROM p2
                                  UNION SELECT source FROM p3
                                  UNION SELECT source FROM p4))
         SELECT 1 AS step, source, CAST(m AS BIGINT) AS marginal_new_tokens,
                (SELECT count(*) FROM c1) AS cum_tokens FROM p1
         UNION ALL SELECT 2, source, CAST(m AS BIGINT),
                (SELECT count(*) FROM c2) FROM p2
         UNION ALL SELECT 3, source, CAST(m AS BIGINT),
                (SELECT count(*) FROM c3) FROM p3
         UNION ALL SELECT 4, source, CAST(m AS BIGINT),
                (SELECT count(*) FROM c4) FROM p4""",

    "q348_sps_sample" ->
      """WITH u AS (SELECT source, doc_id, n_chars,
                  CAST(('0x' || substr(md5('sps:' || CAST(doc_id AS VARCHAR)),
                        1, 15)) AS BIGINT) % 536870912 AS u29
           FROM documents WHERE n_chars > 0),
          q AS (SELECT source, doc_id, n_chars, u29,
                       (u29 * 8589934592) // n_chars AS q,
                       row_number() OVER (PARTITION BY source
                         ORDER BY (u29 * 8589934592) // n_chars, doc_id)
                         AS rank
                FROM u)
         SELECT source, doc_id, n_chars, CAST(q AS BIGINT) AS q,
                CAST(rank AS INT) AS rank
         FROM q WHERE rank <= 3""",

    "q328_nb_classify" ->
      s"""WITH sp AS (SELECT doc_id, source, text,
                   CASE WHEN ${H60("'split:' || CAST(doc_id AS VARCHAR)")}
                          % 1000000 < 800000
                        THEN 'train' ELSE 'test' END AS split
                 FROM documents),
          tok AS (SELECT doc_id, source, split, w FROM (
                    SELECT doc_id, source, split,
                      unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                        AS w
                    FROM sp) WHERE w <> ''),
          counts AS (SELECT source AS cls, w, count(*) AS n_ct
                     FROM tok WHERE split = 'train' GROUP BY 1, 2),
          ct AS (SELECT cls, CAST(sum(n_ct) AS BIGINT) AS t_c
                 FROM counts GROUP BY cls),
          vn AS (SELECT count(DISTINCT w) AS v FROM counts),
          dc AS (SELECT source AS cls, count(*) AS d_c
                 FROM sp WHERE split = 'train' GROUP BY 1),
          da AS (SELECT CAST(sum(d_c) AS BIGINT) AS d_all FROM dc),
          cls AS (SELECT ct.cls, t_c, d_c, v, d_all
                  FROM ct JOIN dc USING (cls) CROSS JOIN vn CROSS JOIN da),
          tt AS (SELECT doc_id, w FROM tok WHERE split = 'test'),
          st AS (SELECT doc_id, cls.cls,
                   CAST(round(ln(CAST(coalesce(n_ct, 0) + 1 AS DOUBLE) /
                     CAST(t_c + v AS DOUBLE)), 9) AS DECIMAL(38,9)) AS term
                 FROM tt CROSS JOIN cls
                   LEFT JOIN counts ON counts.cls = cls.cls
                                   AND counts.w = tt.w),
          ds AS (SELECT doc_id, st.cls, sum(term) AS tsum
                 FROM st GROUP BY 1, 2),
          pri AS (SELECT cls, ln(CAST(d_c AS DOUBLE) / CAST(d_all AS DOUBLE))
                    AS prior
                  FROM cls),
          sc AS (SELECT doc_id, ds.cls,
                   prior + CAST(tsum AS DOUBLE) AS score
                 FROM ds JOIN pri ON pri.cls = ds.cls),
          pk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, cls) AS rk
                 FROM sc)
          SELECT pk.doc_id, pk.cls AS pred_source, d.source AS true_source,
                 ROUND(score, 6) AS log_score,
                 CASE WHEN pk.cls = d.source THEN 1 ELSE 0 END AS correct
          FROM pk JOIN documents d ON d.doc_id = pk.doc_id
          WHERE rk = 1""",

    "q316_quality_percentile_filter" ->
      """WITH base AS (
           SELECT doc_id, source,
             CASE WHEN len(toks) > 0
               THEN CAST(list_sum(list_transform(toks, t -> length(t)))
                      AS DOUBLE) / len(toks)
               ELSE 0.0 END AS score
           FROM (SELECT doc_id, source,
                   regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                 FROM documents)),
          thr AS (SELECT source, quantile_cont(score, 0.25) AS p25
                  FROM base GROUP BY source)
         SELECT base.source, count(*) AS n_docs,
           CAST(sum(CASE WHEN score >= p25 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           ROUND(max(p25), 6) AS p25
         FROM base JOIN thr ON base.source = thr.source
         GROUP BY base.source""",

    "q310_kanon_release" ->
      s"""WITH g AS (SELECT event_type,
                       CAST(CAST(date_trunc('week', ts) AS DATE) AS VARCHAR)
                         AS week,
                       count(*) AS n
                     FROM events GROUP BY 1, 2),
          kept AS (SELECT * FROM g WHERE n >= 25),
          u AS (SELECT *,
                  (CAST(${H60("'kanon:' || event_type || ':' || week")}
                     % 1000000 AS DOUBLE) + 0.5) / 1000000.0 AS uu
                FROM kept)
         SELECT event_type, week,
           n + CAST(round(-sign(uu - 0.5) *
             ln(1.0 - 2.0 * abs(uu - 0.5)), 0) AS BIGINT) AS n_noisy
         FROM u""",

    "q410_l_diversity" ->
      """WITH base AS (SELECT c_nationkey AS nat, c_mktsegment AS seg,
                             CAST(floor(CAST(CAST(c_acctbal AS DECIMAL(12,2))
                               AS DOUBLE) / 2000.0) AS BIGINT) AS b
                      FROM customer),
          cgb AS (SELECT nat, seg, b, count(*) AS c
                  FROM base GROUP BY 1, 2, 3),
          tot AS (SELECT nat, seg, CAST(sum(c) AS BIGINT) AS n_g
                  FROM cgb GROUP BY 1, 2),
          term AS (SELECT nat, seg, n_g,
                          CAST(-(CAST(c AS DOUBLE) / CAST(n_g AS DOUBLE) *
                            ln(CAST(c AS DOUBLE) / CAST(n_g AS DOUBLE)))
                            AS DECIMAL(18,12)) AS e
                   FROM cgb JOIN tot USING (nat, seg))
         SELECT nat AS c_nationkey, seg AS c_mktsegment,
                CAST(max(n_g) AS BIGINT) AS n, count(*) AS l_distinct,
                ROUND(CAST(sum(e) AS DOUBLE), 6) AS entropy,
                CAST(CASE WHEN count(*) < 3 THEN 1 ELSE 0 END AS BIGINT)
                  AS violates_l3
         FROM term GROUP BY 1, 2""",

    "q411_t_closeness" ->
      """WITH base AS (SELECT c_nationkey AS nat, c_mktsegment AS seg,
                             CAST(floor(CAST(CAST(c_acctbal AS DECIMAL(12,2))
                               AS DOUBLE) / 2000.0) AS BIGINT) AS b
                      FROM customer),
          cgb AS (SELECT nat, seg, b, count(*) AS c
                  FROM base GROUP BY 1, 2, 3),
          grp AS (SELECT nat, seg, count(*) AS n_g FROM base GROUP BY 1, 2),
          bk AS (SELECT b, count(*) AS cg FROM base GROUP BY 1),
          grid AS (SELECT g.nat, g.seg, g.n_g, bu.b, bu.cg,
                          coalesce(cgb.c, 0) AS c
                   FROM grp g CROSS JOIN bk bu
                   LEFT JOIN cgb ON cgb.nat = g.nat AND cgb.seg = g.seg
                     AND cgb.b = bu.b),
          t AS (SELECT nat, seg, n_g,
                       sum(c) OVER (PARTITION BY nat, seg ORDER BY b
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS cum_g,
                       sum(cg) OVER (PARTITION BY nat, seg ORDER BY b
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS cum,
                       sum(cg) OVER (PARTITION BY nat, seg) AS n_tot,
                       count(*) OVER (PARTITION BY nat, seg) AS m
                FROM grid),
          tt AS (SELECT nat, seg, n_g, m, n_tot,
                        abs(CAST(cum_g AS HUGEINT) * n_tot -
                            CAST(cum AS HUGEINT) * n_g) AS term
                 FROM t)
         SELECT nat AS c_nationkey, seg AS c_mktsegment,
                CAST(max(n_g) AS BIGINT) AS n,
                CAST(max(m) AS BIGINT) AS m_buckets,
                ROUND(CAST(sum(term) AS DOUBLE) /
                      (CAST(max(n_g) AS DOUBLE) * CAST(max(n_tot) AS DOUBLE))
                      / CAST(max(m) - 1 AS DOUBLE), 6) AS t_emd,
                CAST(CASE WHEN CAST(5 AS HUGEINT) * sum(term) >
                      CAST(max(n_g) AS HUGEINT) * max(n_tot) * (max(m) - 1)
                     THEN 1 ELSE 0 END AS BIGINT) AS violates_t02
         FROM tt GROUP BY 1, 2""",

    "q439_verbatim_span" ->
      """WITH docs AS (SELECT doc_id,
                         regexp_split_to_array(lower(trim(text)), '\s+')
                           AS toks
                       FROM documents
                       WHERE len(regexp_split_to_array(lower(trim(text)),
                         '\s+')) >= 3),
          prs AS (SELECT a.doc_id AS a, a.doc_id + 1 AS b
                  FROM docs a JOIN docs b2
                    ON a.doc_id % 7 = 0 AND b2.doc_id = a.doc_id + 1),
          agr AS (SELECT p.a, p.b,
                    unnest([{'p': i,
                             'g': array_to_string(d1.toks[i:i+2], ' ')}
                            for i in range(1,
                              greatest(len(d1.toks) - 2, 1) + 1)]) AS u
                  FROM prs p JOIN docs d1 ON d1.doc_id = p.a),
          ag AS (SELECT a, b, u.p AS ap, u.g AS g FROM agr),
          bgr AS (SELECT p.a, p.b,
                    unnest([{'p': i,
                             'g': array_to_string(d2.toks[i:i+2], ' ')}
                            for i in range(1,
                              greatest(len(d2.toks) - 2, 1) + 1)]) AS u
                  FROM prs p JOIN docs d2 ON d2.doc_id = p.b),
          bg AS (SELECT a, b, u.p AS bp, u.g AS g FROM bgr),
          mm AS (SELECT ag.a, ag.ap - bg.bp AS diag, ag.ap
                 FROM ag JOIN bg ON ag.a = bg.a AND ag.b = bg.b
                   AND ag.g = bg.g),
          isl AS (SELECT a, diag,
                         ap - row_number() OVER (PARTITION BY a, diag
                           ORDER BY ap) AS grp
                  FROM mm),
          runs AS (SELECT a, diag, grp, count(*) AS run
                   FROM isl GROUP BY 1, 2, 3)
         SELECT a AS doc_a, a + 1 AS doc_b, count(*) AS n_runs,
                CAST(max(run) AS BIGINT) AS max_run,
                CAST(max(run) + 2 AS BIGINT) AS longest_span_tokens
         FROM runs GROUP BY a""",

    "q448_bleu_pairs" ->
      """WITH docs AS (SELECT doc_id,
                         regexp_split_to_array(lower(trim(text)), '\s+')
                           AS toks
                       FROM documents
                       WHERE len(regexp_split_to_array(lower(trim(text)),
                         '\s+')) >= 2),
          prs AS (SELECT a.doc_id AS a, a.doc_id + 1 AS b
                  FROM docs a JOIN docs b2
                    ON a.doc_id % 7 = 0 AND b2.doc_id = a.doc_id + 1),
          g1a AS (SELECT p.a, p.b, unnest(d.toks) AS g
                  FROM prs p JOIN docs d ON d.doc_id = p.a),
          c1a AS (SELECT a, b, g, count(*) AS ca FROM g1a GROUP BY 1,2,3),
          g1b AS (SELECT p.a, p.b, unnest(d.toks) AS g
                  FROM prs p JOIN docs d ON d.doc_id = p.b),
          c1b AS (SELECT a, b, g, count(*) AS cb FROM g1b GROUP BY 1,2,3),
          g2a AS (SELECT p.a, p.b,
                    unnest(list_transform(range(1, len(d.toks)), i ->
                      d.toks[CAST(i AS INT)] || ' ' ||
                      d.toks[CAST(i + 1 AS INT)])) AS g
                  FROM prs p JOIN docs d ON d.doc_id = p.a),
          c2a AS (SELECT a, b, g, count(*) AS ca FROM g2a GROUP BY 1,2,3),
          g2b AS (SELECT p.a, p.b,
                    unnest(list_transform(range(1, len(d.toks)), i ->
                      d.toks[CAST(i AS INT)] || ' ' ||
                      d.toks[CAST(i + 1 AS INT)])) AS g
                  FROM prs p JOIN docs d ON d.doc_id = p.b),
          c2b AS (SELECT a, b, g, count(*) AS cb FROM g2b GROUP BY 1,2,3),
          k1 AS (SELECT cb.a, cb.b,
                   CAST(sum(least(cb.cb, ca.ca)) AS BIGINT) AS clip1
                 FROM c1b cb JOIN c1a ca USING (a, b, g) GROUP BY 1, 2),
          k2 AS (SELECT cb.a, cb.b,
                   CAST(sum(least(cb.cb, ca.ca)) AS BIGINT) AS clip2
                 FROM c2b cb JOIN c2a ca USING (a, b, g) GROUP BY 1, 2),
          lens AS (SELECT p.a, p.b, CAST(len(d1.toks) AS BIGINT) AS la,
                          CAST(len(d2.toks) AS BIGINT) AS lb
                   FROM prs p JOIN docs d1 ON d1.doc_id = p.a
                     JOIN docs d2 ON d2.doc_id = p.b),
          fin AS (SELECT l.a, l.b, l.la, l.lb,
                    coalesce(k1.clip1, 0) AS clip1,
                    coalesce(k2.clip2, 0) AS clip2,
                    CAST(coalesce(k1.clip1, 0) AS DOUBLE) /
                      CAST(l.lb AS DOUBLE) AS p1r,
                    CAST(coalesce(k2.clip2, 0) AS DOUBLE) /
                      CAST(l.lb - 1 AS DOUBLE) AS p2r,
                    CAST(CAST(CASE WHEN l.lb >= l.la
                        THEN CAST(1.0 AS DOUBLE)
                        ELSE exp(CAST(1.0 AS DOUBLE) -
                          CAST(l.la AS DOUBLE) / CAST(l.lb AS DOUBLE)) END
                      AS DECIMAL(18,12)) AS DOUBLE) AS bpr
                  FROM lens l LEFT JOIN k1 USING (a, b)
                    LEFT JOIN k2 USING (a, b))
         SELECT a AS doc_a, b AS doc_b, la, lb, clip1, clip2,
                ROUND(p1r, 6) AS p1, ROUND(p2r, 6) AS p2,
                ROUND(bpr, 6) AS bp,
                ROUND(bpr * sqrt(p1r * p2r), 6) AS bleu2
         FROM fin""",

    "q438_rouge_l_pairs" ->
      """WITH docs AS (SELECT doc_id,
                         regexp_split_to_array(lower(trim(text)), '\s+')
                           AS toks
                       FROM documents),
          prs AS (SELECT a.doc_id AS a, a.doc_id + 1 AS b
                  FROM docs a JOIN docs b2
                    ON a.doc_id % 7 = 0 AND b2.doc_id = a.doc_id + 1),
          aseqr AS (SELECT p.a, p.b,
                      unnest(list_transform(d1.toks,
                        (x, i) -> {'tok': x, 'p': i})) AS u
                    FROM prs p JOIN docs d1 ON d1.doc_id = p.a),
          aseq AS (SELECT a, b, u.p AS ap, u.tok AS tok FROM aseqr),
          bseqr AS (SELECT p.a, p.b,
                      unnest(list_transform(d2.toks,
                        (x, i) -> {'tok': x, 'p': i})) AS u
                    FROM prs p JOIN docs d2 ON d2.doc_id = p.b),
          bseq AS (SELECT a, b, u.p AS bp, u.tok AS tok FROM bseqr),
          m AS (SELECT aseq.a,
                       aseq.ap * 10000 + (10000 - bseq.bp) AS ord,
                       CAST(bseq.bp AS BIGINT) AS v
                FROM aseq JOIN bseq ON aseq.a = bseq.a
                  AND aseq.b = bseq.b AND aseq.tok = bseq.tok),
          sq AS (SELECT a, list(v ORDER BY ord) AS vs FROM m GROUP BY a),
          fl AS (SELECT a, list_reduce(list_transform(vs, x -> [x]),
                   (acc, bb) -> CASE WHEN list_position(list_transform(acc,
                       t -> t >= bb[1]), true) > 0
                     THEN list_transform(acc, (t, i) -> CASE WHEN i =
                       list_position(list_transform(acc,
                         t2 -> t2 >= bb[1]), true) THEN bb[1] ELSE t END)
                     ELSE list_append(acc, bb[1]) END) AS tails
                 FROM sq),
          lcs AS (SELECT a, CAST(len(tails) AS BIGINT) AS lcs FROM fl),
          lens AS (SELECT p.a, p.b, CAST(len(d1.toks) AS BIGINT) AS la,
                          CAST(len(d2.toks) AS BIGINT) AS lb
                   FROM prs p JOIN docs d1 ON d1.doc_id = p.a
                     JOIN docs d2 ON d2.doc_id = p.b)
         SELECT l.a AS doc_a, le.b AS doc_b, l.lcs,
                ROUND(CAST(lcs AS DOUBLE) / CAST(la AS DOUBLE), 6)
                  AS rouge_p,
                ROUND(CAST(lcs AS DOUBLE) / CAST(lb AS DOUBLE), 6)
                  AS rouge_r,
                ROUND(2.0 * (CAST(lcs AS DOUBLE) / CAST(la AS DOUBLE)) *
                  (CAST(lcs AS DOUBLE) / CAST(lb AS DOUBLE)) /
                  (CAST(lcs AS DOUBLE) / CAST(la AS DOUBLE) +
                   CAST(lcs AS DOUBLE) / CAST(lb AS DOUBLE)), 6)
                  AS rouge_f
         FROM lcs l JOIN lens le USING (a)""",

    "q428_monetary_unit_sampling" ->
      s"""WITH raw_ AS (SELECT l_orderkey * 8 + l_linenumber AS v,
                          CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                            AS BIGINT) AS w
                        FROM lineitem),
          rows_ AS (SELECT v, CAST(sum(w) AS BIGINT) AS w
                    FROM raw_ GROUP BY v),
          cum AS (SELECT v, w, sum(w) OVER (ORDER BY v ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w
                  FROM rows_),
          tot AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM rows_),
          pt AS (SELECT total, CAST(floor(CAST(total AS DOUBLE) / 200.0)
                   AS BIGINT) + 1 AS t FROM tot),
          pu AS (SELECT total, t, ${H60("'mus'")} % t AS u FROM pt)
         SELECT v // 8 AS l_orderkey, v % 8 AS l_linenumber, w AS w_cents,
                CAST(cum_w AS BIGINT) AS cum_w
         FROM cum, pu
         WHERE floor(CAST(cum_w - u AS DOUBLE) / CAST(t AS DOUBLE)) >
               floor(CAST(cum_w - w - u AS DOUBLE) / CAST(t AS DOUBLE))""",

    "q429_neyman_allocation" ->
      """WITH li AS (SELECT p_brand,
                       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                         AS BIGINT) AS x
                     FROM lineitem JOIN part ON l_partkey = p_partkey),
          st AS (SELECT p_brand, count(*) AS n_h,
                        sum(CAST(x AS HUGEINT)) AS sx,
                        sum(CAST(x AS HUGEINT) * x) AS sxx
                 FROM li GROUP BY 1),
          t1 AS (SELECT p_brand, n_h,
                        sqrt((CAST(n_h AS DOUBLE) * CAST(sxx AS DOUBLE) -
                          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
                          (CAST(n_h AS DOUBLE) *
                           (CAST(n_h AS DOUBLE) - 1.0))) / 100.0 AS s_h
                 FROM st),
          t2 AS (SELECT p_brand, n_h, s_h,
                        CAST(CAST(n_h AS DOUBLE) * s_h AS DECIMAL(28,6))
                          AS nhsh
                 FROM t1),
          t3 AS (SELECT *, CAST(sum(nhsh) OVER () AS DOUBLE) AS d FROM t2),
          t4 AS (SELECT *, 1000.0 * CAST(nhsh AS DOUBLE) / d AS raw
                 FROM t3),
          t5 AS (SELECT *, CAST(floor(raw) AS BIGINT) AS fl,
                        raw - CAST(CAST(floor(raw) AS BIGINT) AS DOUBLE)
                          AS frac
                 FROM t4),
          t6 AS (SELECT *, CAST(sum(fl) OVER () AS BIGINT) AS sum_fl,
                        row_number() OVER (ORDER BY frac DESC, p_brand)
                          AS rk
                 FROM t5)
         SELECT p_brand, n_h, ROUND(s_h, 6) AS s_h,
                CAST(fl + CASE WHEN rk <= 1000 - sum_fl THEN 1 ELSE 0 END
                  AS BIGINT) AS alloc_n
         FROM t6""",

    "q417_rendezvous_shards" ->
      s"""WITH keys AS (SELECT o_orderkey AS k FROM orders),
          sh AS (SELECT unnest(generate_series(0, 8)) AS s),
          a AS (SELECT k, s,
                  ${H60("'rv:' || CAST(s AS VARCHAR) || ':' || CAST(k AS VARCHAR)")}
                    AS h
                FROM keys, sh),
          pk AS (SELECT k,
                   CAST(max(CASE WHEN s <= 7 THEN CAST(h AS HUGEINT) * 16 + s
                     END) % 16 AS BIGINT) AS s8,
                   CAST(max(CAST(h AS HUGEINT) * 16 + s) % 16 AS BIGINT)
                     AS s9
                 FROM a GROUP BY k),
          counts AS (SELECT s8, count(*) AS c FROM pk GROUP BY 1),
          stats AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                           sum(CAST(c AS HUGEINT) * c) AS cc,
                           CAST(min(c) AS BIGINT) AS min_c,
                           CAST(max(c) AS BIGINT) AS max_c
                    FROM counts),
          mv AS (SELECT CAST(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_moved FROM pk)
         SELECT n AS n_keys, min_c AS min_shard, max_c AS max_shard,
                ROUND(8.0 * CAST(cc AS DOUBLE) / CAST(n AS DOUBLE) -
                  CAST(n AS DOUBLE), 6) AS chi2_uniform,
                n_moved,
                ROUND(CAST(n_moved AS DOUBLE) / CAST(n AS DOUBLE), 6)
                  AS moved_frac
         FROM stats, mv""",

    "q291_ngram_novelty" ->
      """WITH sh AS (
           SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, greatest(len(toks) - 2, 0) + 1)])
               AS shingles
           FROM (SELECT doc_id,
                        regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                 FROM documents)),
          shf AS (SELECT * FROM sh WHERE len(shingles) > 0),
          ex AS (SELECT doc_id, unnest(shingles) AS s FROM shf),
          first AS (SELECT s, min(doc_id) AS fdoc FROM ex GROUP BY s)
         SELECT doc_id, count(*) AS n_shingles,
                CAST(sum(CASE WHEN fdoc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_novel,
                ROUND(CAST(sum(CASE WHEN fdoc = doc_id THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*), 6) AS novelty
         FROM ex JOIN first USING (s) GROUP BY doc_id""",

    "q174_code_quality" ->
      """WITH t AS (SELECT doc_id, regexp_replace(text, '\. ', chr(10), 'g') AS tt
                    FROM documents),
          l AS (SELECT doc_id, tt, str_split(tt, chr(10)) AS lines FROM t),
          m AS (SELECT doc_id, tt, lines,
                  list_transform(lines, x -> length(x)) AS lens,
                  list_filter(lines, x -> length(trim(x)) > 0) AS nonblank
                FROM l)
          SELECT doc_id,
            CAST(len(lines) AS BIGINT) AS n_lines,
            ROUND(CAST(list_sum(lens) AS DOUBLE) / greatest(len(lines), 1), 6)
              AS avg_line_len,
            CAST(coalesce(list_max(lens), 0) AS BIGINT) AS max_line_len,
            ROUND(CAST(len(list_filter(lens, x -> x > 80)) AS DOUBLE)
              / greatest(len(lines), 1), 6) AS frac_long_lines,
            ROUND(CAST(length(tt) - length(regexp_replace(tt, '[A-Za-z0-9]', '', 'g')) AS DOUBLE)
              / greatest(length(tt), 1), 6) AS alnum_frac,
            ROUND(CASE WHEN len(nonblank) > 0
                       THEN 1.0 - CAST(len(list_distinct(nonblank)) AS DOUBLE) / len(nonblank)
                       ELSE 0 END, 6) AS dup_line_ratio
          FROM m""",

    "q164_negative_sample" ->
      s"""WITH idx AS (
            SELECT doc_id AS neg_id,
              row_number() OVER (ORDER BY doc_id) AS rank
            FROM documents),
          nn AS (SELECT count(*) AS n FROM documents),
          a AS (SELECT doc_id AS anchor_id FROM documents WHERE doc_id % 17 = 0),
          js AS (SELECT unnest(range(1, 6)) AS j),
          draws AS (
            SELECT anchor_id, j,
              ${H60("'neg:' || CAST(anchor_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)")}
                % n + 1 AS rank
            FROM a CROSS JOIN js CROSS JOIN nn),
          dup AS (
            SELECT a.doc_id AS pa, b.doc_id AS pb
            FROM (SELECT doc_id, md5(text) AS h FROM documents) a
            JOIN (SELECT doc_id, md5(text) AS h FROM documents) b
              ON a.h = b.h AND a.doc_id <> b.doc_id)
          SELECT anchor_id, CAST(j AS INT) AS j, neg_id
          FROM draws JOIN idx USING (rank)
          WHERE neg_id <> anchor_id
            AND NOT EXISTS (SELECT 1 FROM dup
                            WHERE dup.pa = draws.anchor_id AND dup.pb = idx.neg_id)""",

    "q157_chunk_overlap" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         u AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS start_tok FROM t)
         SELECT doc_id AS doc,
           CAST(start_tok // 24 AS INT) AS chunk_idx,
           CAST(start_tok AS INT) AS start_tok,
           CAST(least(32, len(toks) - start_tok) AS INT) AS n_tokens,
           array_to_string(toks[CAST(start_tok + 1 AS INT):CAST(start_tok + 32 AS INT)], ' ') AS chunk_text
         FROM u""",

    "q119_curation_domain_cap" ->
      """WITH r AS (
           SELECT source, doc_id, n_chars,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id) AS INT) AS rank
           FROM documents)
         SELECT source, doc_id, n_chars, rank FROM r WHERE rank <= 10""",

    "q97_curation_sample_split" ->
      s"""SELECT doc_id, ${bucket("split")} AS bucket,
            CASE WHEN ${bucket("split")} < 800000 THEN 'train'
                 WHEN ${bucket("split")} < 900000 THEN 'val'
                 ELSE 'test' END AS split
          FROM documents
          WHERE ${bucket("s1")} < 500000""",

    "q544_pmi_collocations" ->
      """WITH t AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                    FROM documents),
          bi AS (SELECT unnest([toks[i] for i in range(1, len(toks))]) AS w1,
                        unnest([toks[i + 1] for i in range(1, len(toks))]) AS w2
                 FROM t),
          cw AS (SELECT w, count(*) AS cnt FROM (
                   SELECT unnest(toks) AS w FROM t) GROUP BY 1),
          top AS (SELECT w FROM (SELECT w, row_number() OVER (
                    ORDER BY cnt DESC, w) AS rk FROM cw) WHERE rk <= 100),
          nbi AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bi),
          ca AS (SELECT w1, CAST(count(*) AS BIGINT) AS ca
                 FROM bi GROUP BY 1),
          cb AS (SELECT w2, CAST(count(*) AS BIGINT) AS cb
                 FROM bi GROUP BY 1),
          cab AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cab
                  FROM bi
                  WHERE w1 IN (SELECT w FROM top)
                    AND w2 IN (SELECT w FROM top)
                  GROUP BY 1, 2 HAVING count(*) >= 5)
         SELECT w1, w2, cab,
                ROUND(ln(CAST(CAST(cab AS DECIMAL(19,0)) * nb AS DOUBLE) /
                  CAST(CAST(ca AS DECIMAL(19,0)) * cb AS DOUBLE)), 6) AS pmi
         FROM cab JOIN ca USING (w1) JOIN cb USING (w2) CROSS JOIN nbi""",

    "q545_wasserstein_length" ->
      """WITH docs AS (SELECT source, CAST(n_chars AS BIGINT) AS v
                       FROM documents),
          csv AS (SELECT source, v, CAST(count(*) AS BIGINT) AS cs
                  FROM docs GROUP BY 1, 2),
          cv AS (SELECT v, CAST(count(*) AS BIGINT) AS cpool
                 FROM docs GROUP BY 1),
          ns AS (SELECT source, CAST(count(*) AS BIGINT) AS nsrc
                 FROM docs GROUP BY 1),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
          grid AS (SELECT ns.source, cv.v, ns.nsrc, tot.n,
                     sum(coalesce(csv.cs, 0)) OVER wv AS cums,
                     sum(cv.cpool) OVER wv AS cum,
                     lead(cv.v, 1) OVER wv - cv.v AS gap
                   FROM cv CROSS JOIN ns CROSS JOIN tot
                   LEFT JOIN csv ON csv.source = ns.source AND csv.v = cv.v
                   WINDOW wv AS (PARTITION BY ns.source ORDER BY cv.v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT source, max(nsrc) AS n_docs,
                ROUND(CAST(sum(abs(CAST(cums AS DECIMAL(19,0)) * n -
                    CAST(cum AS DECIMAL(19,0)) * nsrc) * gap) AS DOUBLE) /
                  CAST(CAST(max(nsrc) AS DECIMAL(19,0)) * max(n) AS DOUBLE),
                  6) AS w1_chars
         FROM grid WHERE gap IS NOT NULL GROUP BY source""",

    "q559_chunk_dedup" ->
      """WITH t0 AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
            FROM documents),
          u AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS st
                FROM t0),
          ch AS (SELECT doc_id AS doc, CAST(st // 24 AS INT) AS chunk_idx,
                   md5(array_to_string(
                     toks[CAST(st + 1 AS INT):CAST(st + 32 AS INT)], ' '))
                     AS dg
                 FROM u),
          k AS (SELECT dg, doc, chunk_idx, row_number() OVER (
                  PARTITION BY dg ORDER BY doc, chunk_idx) AS rn FROM ch)
         SELECT doc AS doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
                CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_kept,
                CAST(count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dropped,
                ROUND(CAST(count(*) -
                    sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
                  CAST(count(*) AS DOUBLE), 6) AS drop_rate
         FROM k GROUP BY doc""",

    "q555_sft_pair_audit" ->
      """WITH t AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS tk
                    FROM documents),
          f AS (SELECT doc_id, tk,
                  list_distinct(tk[1:16]) AS p,
                  list_distinct(tk[17:len(tk)]) AS r
                FROM t WHERE len(tk) > 16),
          m AS (SELECT doc_id, CAST(len(tk) AS INT) AS n_tokens,
                  CAST(len(list_intersect(r, p)) AS DOUBLE) /
                    CAST(len(r) AS DOUBLE) AS ov,
                  CAST(len(tk) - 16 AS DOUBLE) / 16.0 AS lr
                FROM f)
         SELECT doc_id, n_tokens, ROUND(ov, 6) AS overlap_ratio,
                ROUND(lr, 6) AS len_ratio,
                (ov >= 0.8 OR lr < 0.5) AS degenerate
         FROM m""",

    "q556_filter_attribution" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         m AS (
           SELECT doc_id, len(toks) AS n,
             CASE WHEN len(toks) > 0
               THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
               ELSE 0.0 END AS ml,
             len(list_filter(toks, x -> list_contains(
               ['the','be','to','of','and','that','have','with'], x))) AS ns,
             CASE WHEN len(toks) > 0
               THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(toks)
               ELSE 0.0 END AS ar
           FROM t)
         SELECT CASE
             WHEN NOT (n BETWEEN 25 AND 80) THEN 'n_words'
             WHEN NOT (ml BETWEEN 4.0 AND 10.0) THEN 'mean_word_len'
             WHEN ns < 1 THEN 'n_stop'
             WHEN ar < 0.8 THEN 'alpha_ratio'
             ELSE 'pass' END AS first_fail,
           CAST(count(*) AS BIGINT) AS n_docs
         FROM m GROUP BY 1""",

    "q551_data_card" ->
      """WITH base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(n_chars) AS BIGINT) AS total_chars
                       FROM documents GROUP BY 1),
          lng AS (SELECT source, lang, count(*) AS cnt
                  FROM documents GROUP BY 1, 2),
          tl AS (SELECT source, lang AS top_lang FROM (
                   SELECT source, lang, row_number() OVER (
                     PARTITION BY source ORDER BY cnt DESC, lang) AS rk
                   FROM lng) WHERE rk = 1),
          dup AS (SELECT source, CAST(sum(c) AS BIGINT) AS dup_docs FROM (
                    SELECT source, md5(text) AS dg, count(*) AS c
                    FROM documents GROUP BY 1, 2 HAVING count(*) > 1)
                  GROUP BY 1)
         SELECT b.source, b.n_docs, b.total_chars,
                ROUND(CAST(b.total_chars AS DOUBLE) /
                  CAST(b.n_docs AS DOUBLE), 6) AS mean_chars,
                tl.top_lang, coalesce(dup.dup_docs, 0) AS dup_docs
         FROM base b JOIN tl USING (source)
         LEFT JOIN dup USING (source)""",

    "q549_epoch_shuffle" ->
      s"""WITH docs AS (SELECT doc_id FROM documents),
          h1 AS (SELECT doc_id,
                   ${H60("'ep1:' || CAST(doc_id AS VARCHAR)")} AS v
                 FROM docs),
          c1 AS (SELECT v, count(*) AS c FROM h1 GROUP BY 1),
          m1 AS (SELECT v, c, sum(c) OVER (ORDER BY v ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM c1),
          p1 AS (SELECT doc_id,
                   CAST(cum - c + row_number() OVER (
                     PARTITION BY v ORDER BY doc_id) - 1 AS BIGINT)
                     AS pos_ep1
                 FROM h1 JOIN m1 USING (v)),
          b1 AS (SELECT doc_id, pos_ep1,
                   CAST(pos_ep1 // 64 AS BIGINT) AS batch_ep1 FROM p1),
          h2 AS (SELECT doc_id,
                   ${H60("'ep2:' || CAST(doc_id AS VARCHAR)")} AS v
                 FROM docs),
          c2 AS (SELECT v, count(*) AS c FROM h2 GROUP BY 1),
          m2 AS (SELECT v, c, sum(c) OVER (ORDER BY v ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM c2),
          p2 AS (SELECT doc_id,
                   CAST(cum - c + row_number() OVER (
                     PARTITION BY v ORDER BY doc_id) - 1 AS BIGINT)
                     AS pos_ep2
                 FROM h2 JOIN m2 USING (v)),
          b2 AS (SELECT doc_id, pos_ep2,
                   CAST(pos_ep2 // 64 AS BIGINT) AS batch_ep2 FROM p2)
         SELECT b1.doc_id, pos_ep1, batch_ep1, pos_ep2, batch_ep2
         FROM b1 JOIN b2 USING (doc_id)""",

    "q542_boilerplate_prefix" ->
      s"""WITH pre AS (SELECT doc_id, array_to_string(
                         regexp_split_to_array(lower(trim(text)),
                           '\\s+')[1:12], ' ') AS prefix
                       FROM documents),
          g AS (SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
                       min(doc_id) AS min_doc
                FROM pre GROUP BY 1 HAVING count(*) >= 2)
         SELECT ${H60("prefix")} AS prefix_h60, prefix, n_docs, min_doc
         FROM g""",

    "q539_self_bleu" ->
      s"""WITH dd AS (SELECT source, doc_id,
                        regexp_split_to_array(lower(trim(text)), '\\s+') AS tk,
                        ${H60("'sb:' || CAST(doc_id AS VARCHAR)")} AS pri
                      FROM documents),
          samp AS (SELECT source, doc_id, tk FROM (
                     SELECT *, row_number() OVER (PARTITION BY source
                       ORDER BY pri, doc_id) AS rk FROM dd)
                   WHERE rk <= 6),
          cnt AS (SELECT source, doc_id, w, CAST(count(*) AS BIGINT) AS c
                  FROM (SELECT source, doc_id, unnest(tk) AS w FROM samp)
                  GROUP BY 1, 2, 3),
          lens AS (SELECT source, doc_id, CAST(len(tk) AS BIGINT) AS n_tokens
                   FROM samp),
          rf AS (SELECT a.source, a.doc_id, a.w, a.c,
                        CAST(max(b.c) AS BIGINT) AS rc
                 FROM cnt a JOIN cnt b ON a.source = b.source
                   AND a.w = b.w AND a.doc_id <> b.doc_id
                 GROUP BY 1, 2, 3, 4),
          cl AS (SELECT source, doc_id,
                        CAST(sum(least(c, rc)) AS BIGINT) AS clipped
                 FROM rf GROUP BY 1, 2)
         SELECT l.source, l.doc_id, l.n_tokens,
                coalesce(cl.clipped, 0) AS clipped,
                ROUND(CAST(coalesce(cl.clipped, 0) AS DOUBLE) /
                  CAST(l.n_tokens AS DOUBLE), 6) AS selfbleu1
         FROM lens l LEFT JOIN cl USING (source, doc_id)""",

    "q540_source_vocab_kl" ->
      """WITH tok AS (SELECT source,
                        unnest(regexp_split_to_array(lower(trim(text)),
                          '\s+')) AS w
                      FROM documents),
          cs AS (SELECT source, w, CAST(count(*) AS BIGINT) AS csw
                 FROM tok GROUP BY 1, 2),
          cw AS (SELECT w, CAST(count(*) AS BIGINT) AS cw
                 FROM tok GROUP BY 1),
          ns AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
                 FROM tok GROUP BY 1),
          tt AS (SELECT CAST(count(*) AS BIGINT) AS n,
                        CAST(count(DISTINCT w) AS BIGINT) AS v
                 FROM tok),
          grid AS (SELECT ns.source, cw.w, cw.cw, ns.ns, tt.n, tt.v,
                          cs.csw
                   FROM cw CROSS JOIN ns CROSS JOIN tt
                   LEFT JOIN cs ON cs.source = ns.source AND cs.w = cw.w),
          terms AS (SELECT source, ns, v,
                      CAST(round(
                        (CAST(coalesce(csw, 0) + 1 AS DOUBLE) /
                         CAST(ns + v AS DOUBLE)) *
                        ln((CAST(coalesce(csw, 0) + 1 AS DOUBLE) /
                            CAST(ns + v AS DOUBLE)) /
                           (CAST(cw AS DOUBLE) / CAST(n AS DOUBLE))) *
                        1e12) AS BIGINT) AS t
                    FROM grid)
         SELECT source, max(ns) AS n_tokens, max(v) AS vocab,
                CAST(sum(t) AS BIGINT) AS kl_q12
         FROM terms GROUP BY 1""",

    "q537_watermark_detect" ->
      s"""WITH t AS (
            SELECT doc_id,
              unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
            FROM documents),
          g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                  CAST(sum(CASE WHEN ${H60("w")} % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_green
                FROM t GROUP BY 1)
         SELECT doc_id, n_tokens, n_green,
           ROUND(CAST(2 * n_green - n_tokens AS DOUBLE) /
             sqrt(CAST(n_tokens AS DOUBLE)), 6) AS z_green,
           (CAST(2 * n_green - n_tokens AS DOUBLE) /
             sqrt(CAST(n_tokens AS DOUBLE)) > 4.0) AS watermarked
         FROM g""",

    "q536_data_budget_epochs" ->
      """WITH st AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS u,
                       CAST(sum(least(n_chars, 2000)) AS BIGINT) AS qn,
                       CAST(count(*) AS BIGINT) AS nd
                     FROM documents GROUP BY 1),
          tot AS (SELECT CAST(sum(u) AS BIGINT) AS t FROM st),
          b AS (SELECT CAST((t * 3) // 5 AS BIGINT) AS bud FROM tot),
          cand AS (SELECT source, u,
                     CAST(qn AS DOUBLE) / CAST(nd * 2000 AS DOUBLE) AS q, e
                   FROM st, LATERAL (SELECT unnest(range(1, 9)) AS e)),
          sc AS (SELECT source, u, q, e,
                   q * (0.5 ** CAST(e - 1 AS DOUBLE)) AS m FROM cand),
          g AS (SELECT source, u, q, e, m,
                  sum(u) OVER (ORDER BY m DESC, source, e) AS cum
                FROM sc),
          kept AS (SELECT g.* FROM g, b WHERE cum <= bud)
         SELECT source, any_value(u) AS u_chars,
                CAST(round(any_value(q) * 1e6) AS BIGINT) AS quality_q6,
                CAST(count(*) AS BIGINT) AS epochs,
                CAST(count(*) * any_value(u) AS BIGINT) AS chars_used
         FROM kept GROUP BY source""",

    "q535_contamination_span" ->
      """WITH t AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS tk
                    FROM documents),
          ps AS (SELECT DISTINCT concat_ws(' ',
                   tk[CAST(i AS INT)], tk[CAST(i + 1 AS INT)],
                   tk[CAST(i + 2 AS INT)], tk[CAST(i + 3 AS INT)],
                   tk[CAST(i + 4 AS INT)]) AS sh
                 FROM t, LATERAL (SELECT unnest(range(1, len(tk) - 3)) AS i)
                 WHERE doc_id % 13 = 0 AND len(tk) >= 5),
          cs AS (SELECT doc_id, i AS p, concat_ws(' ',
                   tk[CAST(i AS INT)], tk[CAST(i + 1 AS INT)],
                   tk[CAST(i + 2 AS INT)], tk[CAST(i + 3 AS INT)],
                   tk[CAST(i + 4 AS INT)]) AS sh
                 FROM t, LATERAL (SELECT unnest(range(1, len(tk) - 3)) AS i)
                 WHERE doc_id % 13 <> 0 AND len(tk) >= 5),
          m AS (SELECT doc_id, p FROM cs JOIN ps USING (sh)),
          r AS (SELECT doc_id, p, p - row_number() OVER (
                  PARTITION BY doc_id ORDER BY p) AS grp FROM m),
          runs AS (SELECT doc_id, grp, count(*) AS run
                   FROM r GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(run) AS BIGINT) AS n_matched,
                CAST(max(run) AS BIGINT) AS max_run,
                CAST(max(run) + 4 AS BIGINT) AS span_tokens,
                (max(run) + 4 >= 8) AS contaminated
         FROM runs GROUP BY doc_id""",

    "q100_curation_decontaminate" ->
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, greatest(len(toks) - 2, 0) + 1)]) AS s
           FROM t WHERE greatest(len(toks) - 2, 0) > 0),
         p AS (SELECT * FROM sh WHERE doc_id % 13 = 0),
         c AS (SELECT * FROM sh WHERE doc_id % 13 <> 0)
         SELECT c.doc_id AS corpus_id, p.doc_id AS probe_id,
           ROUND(CAST(len(list_intersect(c.s, p.s)) AS DOUBLE) / len(p.s), 6) AS containment
         FROM c, p
         WHERE CAST(len(list_intersect(c.s, p.s)) AS DOUBLE) / len(p.s) >= 0.2""",

    "q101_curation_repetition" ->
      """WITH t AS (
           SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents)
         SELECT doc_id,
           ROUND(CASE WHEN greatest(len(toks) - 2, 0) > 0
             THEN 1.0 - CAST(len(list_distinct(
                    [array_to_string(toks[i:i+2], ' ')
                     for i in range(1, greatest(len(toks) - 2, 0) + 1)])) AS DOUBLE)
                  / greatest(len(toks) - 2, 0)
             ELSE 0.0 END, 6) + 0 AS rep3
         FROM t""",

    "q98_curation_token_budget" ->
      """WITH t AS (
           SELECT doc_id, source, n_chars,
             len(regexp_split_to_array(lower(trim(text)), '\s+')) AS ntok
           FROM documents),
         c AS (
           SELECT doc_id, source, ntok,
             SUM(ntok) OVER (PARTITION BY source
                             ORDER BY n_chars DESC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum
           FROM t)
         SELECT source, doc_id, CAST(ntok AS INT) AS ntok
         FROM c WHERE cum <= 5000""",

    "q513_luhn_pii_audit" ->
      s"""WITH l AS (
           SELECT c_nationkey,
             reverse(substr(CAST(${H60("'luhn:' || CAST(c_custkey AS VARCHAR)")}
               AS VARCHAR), 1, 12)) AS r
           FROM customer),
         v AS (SELECT c_nationkey,
                 len(r) > 0 AND
                 list_sum([CASE WHEN j % 2 = 0 THEN
                             CASE WHEN CAST(r[j] AS INT) * 2 > 9
                                  THEN CAST(r[j] AS INT) * 2 - 9
                                  ELSE CAST(r[j] AS INT) * 2 END
                           ELSE CAST(r[j] AS INT) END
                           for j in range(1, len(r) + 1)]) % 10 = 0 AS ok
               FROM l)
         SELECT c_nationkey, count(*) AS n,
           CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_luhn_valid,
           ROUND(CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS luhn_rate
         FROM v GROUP BY 1""",

    "q102_curation_pii_redact" ->
      """WITH p AS (
           SELECT doc_id,
             text || ' contact u' || doc_id || '@ex' || (doc_id % 7) ||
             '.com via +1-555-234-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
             ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) ||
             CASE WHEN doc_id % 3 = 0 THEN ' backup b@ex.org' ELSE '' END AS pii
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(pii, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(pii, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS INT) AS n_ip,
           CAST(len(regexp_extract_all(pii, '\+\d{1,2}-\d{3}-\d{3,4}-\d{4}')) AS INT) AS n_phone,
           regexp_replace(
             regexp_replace(
               regexp_replace(pii, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
             '\+\d{1,2}-\d{3}-\d{3,4}-\d{4}', '<PHONE>', 'g') AS red
         FROM p""",

    "q103_curation_pack_sequences" ->
      s"""WITH t AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS ntok,
             ${H60("'pack:' || CAST(doc_id AS VARCHAR)")} AS ord,
             ${H60("'pack:shard:' || CAST(doc_id AS VARCHAR)")} % 8 AS shard
           FROM documents),
         c AS (
           SELECT doc_id, shard, ntok,
             SUM(ntok) OVER (PARTITION BY shard ORDER BY ord ASC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) - ntok AS start
           FROM t)
         SELECT doc_id, shard,
           CAST(start // 2048 AS BIGINT) AS seq,
           CAST(start % 2048 AS BIGINT) AS offset
         FROM c""",

    "q273_stratified_folds" ->
      s"""WITH c AS (
            SELECT lang AS stratum,
              ${H60("'fold:' || CAST(doc_id AS VARCHAR)")} % 5 AS fold,
              count(*) AS n
            FROM documents GROUP BY 1, 2),
          st AS (SELECT stratum, sum(n) AS n_stratum FROM c GROUP BY 1)
          SELECT c.stratum, CAST(fold AS BIGINT) AS fold,
            CAST(n AS BIGINT) AS n,
            ROUND(CAST(n AS DOUBLE) / CAST(n_stratum AS DOUBLE), 6) AS frac,
            ROUND(abs(CAST(n AS DOUBLE) / CAST(n_stratum AS DOUBLE) - 0.2), 6)
              AS abs_dev_from_ideal
          FROM c JOIN st USING (stratum)""",

    "q107_curation_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
          WHERE ${bucket("bal")} <
            CASE lang WHEN 'en' THEN 200000 WHEN 'zh' THEN 500000
                      ELSE 1000000 END""",

    "q108_curation_lm_surprisal" ->
      """WITH t AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
           FROM documents),
         c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
         tot AS (SELECT sum(cnt) AS tot FROM c)
         SELECT doc_id,
           ROUND(avg(-ln(CAST(cnt AS DOUBLE) / tot)), 6) AS surprisal
         FROM t JOIN c USING (tok) CROSS JOIN tot
         GROUP BY doc_id""",

    "q112_curation_bigram_surprisal" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         bi AS (
           SELECT doc_id,
             unnest([toks[i] for i in range(1, len(toks))]) AS w1,
             unnest([toks[i + 1] for i in range(1, len(toks))]) AS w2
           FROM t),
         cab AS (SELECT w1, w2, count(*) AS cab FROM bi GROUP BY 1, 2),
         ca AS (SELECT w1, count(*) AS ca FROM bi GROUP BY 1),
         s AS (
           SELECT doc_id, avg(-ln(CAST(cab AS DOUBLE) / ca)) AS sp
           FROM bi JOIN cab USING (w1, w2) JOIN ca USING (w1)
           GROUP BY doc_id)
         SELECT t.doc_id, ROUND(coalesce(s.sp, 0.0), 6) + 0 AS surprisal2
         FROM t LEFT JOIN s USING (doc_id)""",

    "q531_kn_bigram_surprisal" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         bi AS (
           SELECT doc_id,
             unnest([toks[i] for i in range(1, len(toks))]) AS w1,
             unnest([toks[i + 1] for i in range(1, len(toks))]) AS w2
           FROM t),
         cab AS (SELECT w1, w2, count(*) AS cab FROM bi GROUP BY 1, 2),
         ca AS (SELECT w1, count(*) AS ca FROM bi GROUP BY 1),
         n1f AS (SELECT w1, count(*) AS n1f FROM cab GROUP BY 1),
         n1b AS (SELECT w2, count(*) AS n1b FROM cab GROUP BY 1),
         nbig AS (SELECT count(*) AS nbig FROM cab),
         s AS (
           SELECT doc_id, avg(-ln(
             greatest(CAST(cab AS DOUBLE) - 0.75, 0.0) / CAST(ca AS DOUBLE) +
             0.75 * CAST(n1f AS DOUBLE) / CAST(ca AS DOUBLE) *
               (CAST(n1b AS DOUBLE) / CAST(nbig AS DOUBLE)))) AS sp
           FROM bi JOIN cab USING (w1, w2) JOIN ca USING (w1)
             JOIN n1f USING (w1) JOIN n1b USING (w2) CROSS JOIN nbig
           GROUP BY doc_id)
         SELECT t.doc_id, ROUND(coalesce(s.sp, 0.0), 6) + 0 AS surprisal_kn
         FROM t LEFT JOIN s USING (doc_id)""",

    "q106_curation_source_mix" ->
      s"""WITH t AS (
           SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25
                         ELSE 1.0 END AS w
           FROM documents),
         c AS (
           SELECT doc_id, source,
             CAST(floor(w) AS INT) +
             CASE WHEN ${bucket("mix")} < CAST((w * 1e6) % 1e6 AS BIGINT)
                  THEN 1 ELSE 0 END AS copies
           FROM t)
         SELECT doc_id, source, CAST(unnest(range(1, copies + 1)) AS INT) AS copy
         FROM c WHERE copies > 0""",

    "q115_curation_gopher_quality" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         m AS (
           SELECT doc_id, len(toks) AS n,
             CASE WHEN len(toks) > 0
               THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
               ELSE 0.0 END AS ml,
             len(list_filter(toks, x -> list_contains(
               ['the','be','to','of','and','that','have','with'], x))) AS ns,
             CASE WHEN len(toks) > 0
               THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(toks)
               ELSE 0.0 END AS ar
           FROM t)
         SELECT doc_id, CAST(n AS INT) AS n_words,
           ROUND(ml, 6) + 0 AS mean_word_len,
           CAST(ns AS INT) AS n_stop,
           ROUND(ar, 6) + 0 AS alpha_ratio,
           (n BETWEEN 25 AND 80 AND ml BETWEEN 4.0 AND 10.0
            AND ns >= 1 AND ar >= 0.8) AS keep
         FROM m""",

    "q116_curation_dsir_weights" ->
      """WITH t AS (
           SELECT doc_id, source = 'src0' AS tgt,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         uni AS (SELECT doc_id, tgt, unnest(toks) AS f FROM t),
         bi AS (
           SELECT doc_id, tgt,
             unnest([toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))]) AS f
           FROM t),
         feats AS (
           SELECT doc_id, tgt,
             CAST(('0x' || substr(md5(f), 1, 15)) AS BIGINT) % 256 AS bucket
           FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
         stats AS (
           SELECT bucket, count(*) AS c_raw,
             sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS c_tgt
           FROM feats GROUP BY bucket),
         tots AS (SELECT sum(c_raw) AS tot_raw, sum(c_tgt) AS tot_tgt FROM stats)
         SELECT doc_id,
           ROUND(sum(ln(((c_tgt + 1.0) / (tot_tgt + 256)) /
                        ((c_raw + 1.0) / (tot_raw + 256)))), 6) + 0 AS dsir_weight
         FROM feats JOIN stats USING (bucket) CROSS JOIN tots
         GROUP BY doc_id""",

    // frozen-LR scoring replay: the VALUES table is GENERATED from the
    // same FrozenQualityLr array the Spark side reads — the two sides
    // cannot drift. Exact-decimal dot product, sigmoid at the readout.
    "q523_quality_classifier_score" -> frozenLrSql,

    "q546_youden_threshold" ->
      s"""WITH sc AS (SELECT * FROM ($frozenLrSql)),
          lb AS (SELECT CAST(round(s.quality_prob * 1e6) AS BIGINT) AS v,
                        (d.source = 'src0') AS lab
                 FROM sc s JOIN documents d USING (doc_id)),
          cnt AS (SELECT v,
                    CAST(sum(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS p,
                    CAST(sum(CASE WHEN lab THEN 0 ELSE 1 END) AS BIGINT) AS ng
                  FROM lb GROUP BY 1),
          cum AS (SELECT v, p, ng,
                    CAST(sum(p) OVER wv AS BIGINT) AS cp,
                    CAST(sum(ng) OVER wv AS BIGINT) AS cn
                  FROM cnt
                  WINDOW wv AS (ORDER BY v ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW)),
          tot AS (SELECT CAST(sum(p) AS BIGINT) AS tp_all,
                         CAST(sum(ng) AS BIGINT) AS fp_all FROM cnt),
          j AS (SELECT v, tp_all - cp + p AS tp, fp_all - cn + ng AS fp,
                  tp_all, fp_all,
                  CAST(tp_all - cp + p AS DECIMAL(19,0)) * fp_all -
                    CAST(fp_all - cn + ng AS DECIMAL(19,0)) * tp_all AS jnum
                FROM cum CROSS JOIN tot)
         SELECT v AS thr_q6, CAST(tp AS BIGINT) AS tp,
                CAST(fp AS BIGINT) AS fp, tp_all AS n_pos, fp_all AS n_neg,
                ROUND(CAST(tp AS DOUBLE) / CAST(tp_all AS DOUBLE) -
                  CAST(fp AS DOUBLE) / CAST(fp_all AS DOUBLE), 6) AS youden_j
         FROM j ORDER BY jnum DESC, v LIMIT 1""",

    "q148_kmv_by_group" ->
      s"""WITH h AS (SELECT DISTINCT event_type AS grp,
             ${H60("CAST(user_id AS VARCHAR)")} AS h
           FROM events),
          r AS (SELECT grp, h,
                  row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
                FROM h),
          t AS (SELECT grp, CAST(count(*) AS BIGINT) AS k_used, max(h) AS hk
                FROM r WHERE rn <= 64 GROUP BY 1)
          SELECT grp, k_used,
            ROUND(CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)
                       ELSE 63.0 / (CAST(hk AS DOUBLE) / 1152921504606846976.0)
                  END, 6) AS est_distinct
          FROM t""",

    "q143_cms_freq" ->
      s"""WITH src AS (SELECT CAST(user_id AS VARCHAR) AS item FROM events),
          ex AS (SELECT unnest([0, 1, 2]) AS row, item FROM src),
          cells AS (
            SELECT row,
              CAST(${H60("CAST(row AS VARCHAR) || '|' || item")} % 64 AS INT)
                AS bucket,
              count(*) AS cnt
            FROM ex GROUP BY 1, 2),
          q AS (SELECT DISTINCT item FROM src),
          qb AS (
            SELECT item, row,
              CAST(${H60("CAST(row AS VARCHAR) || '|' || item")} % 64 AS INT)
                AS bucket
            FROM (SELECT item, unnest([0, 1, 2]) AS row FROM q) t)
          SELECT item, min(coalesce(cnt, 0)) AS est
          FROM qb LEFT JOIN cells USING (row, bucket)
          GROUP BY 1""",

    "q519_doremi_reweight" ->
      s"""WITH toks AS (
           SELECT source, unnest(list_filter(regexp_split_to_array(
             lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS tok
           FROM documents),
          vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
          total AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM vocab),
          sur AS (SELECT source,
                    ROUND(CAST(sum(CAST(-ln(CAST(cnt AS DOUBLE)
                        / CAST(tot AS DOUBLE)) AS DECIMAL(18,12)))
                      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                      AS avg_surprisal
                  FROM toks JOIN vocab USING (tok) CROSS JOIN total
                  GROUP BY 1),
          e1 AS (SELECT source, avg_surprisal,
                   CAST(ROUND(exp(0.5 * avg_surprisal), 6)
                     AS DECIMAL(18,6)) AS m1
                 FROM sur),
          z1 AS (SELECT sum(m1) AS z1 FROM e1),
          w1 AS (SELECT source, avg_surprisal,
                   CAST(m1 AS DOUBLE) / CAST(z1 AS DOUBLE) AS w1d
                 FROM e1 CROSS JOIN z1),
          e2 AS (SELECT source, avg_surprisal, w1d,
                   CAST(ROUND(w1d * exp(0.5 * avg_surprisal), 6)
                     AS DECIMAL(18,6)) AS m2
                 FROM w1),
          z2 AS (SELECT sum(m2) AS z2 FROM e2)
          SELECT source, avg_surprisal,
            ROUND(w1d, 6) AS w_round1,
            ROUND(CAST(m2 AS DOUBLE) / CAST(z2 AS DOUBLE), 6) AS w_round2
          FROM e2 CROSS JOIN z2""",

    "q518_padding_waste" ->
      s"""WITH lens AS (
           SELECT CAST(len(list_filter(regexp_split_to_array(
                    lower(trim(text)), '\\s+'), t -> len(t) > 0))
                  AS BIGINT) AS len
           FROM documents),
          l AS (SELECT len FROM lens WHERE len > 0),
          s AS (SELECT 'pow2_min64' AS scheme,
                  greatest(CAST(64 AS BIGINT),
                    CAST(1 AS BIGINT) << length(bin(len - 1))) AS ceil_len,
                  len FROM l
                UNION ALL
                SELECT 'linear512', ((len + 511) // 512) * 512, len FROM l
                UNION ALL
                SELECT 'fixed4096', greatest(len, CAST(4096 AS BIGINT)), len
                FROM l)
          SELECT scheme, count(*) AS n_docs,
            CAST(sum(len) AS BIGINT) AS total_tokens,
            CAST(sum(ceil_len) AS BIGINT) AS padded_tokens,
            ROUND(CAST(sum(ceil_len) - sum(len) AS DOUBLE)
              / CAST(sum(ceil_len) AS DOUBLE), 6) AS waste_pct
          FROM s GROUP BY 1""",

    // HLL register algebra: per-flag register CTEs, union by per-bucket
    // max, the same estimate fold per set, inclusion-exclusion readout
    "q516_hll_union_algebra" -> {
      def regCte(name: String, flag: String) =
        s"""h$name AS (SELECT ${H60("CAST(l_orderkey AS VARCHAR)")} AS hv
              FROM lineitem WHERE l_returnflag = '$flag'),
            r$name AS (SELECT hv % 64 AS b,
                max(CASE WHEN hv // 64 = 0 THEN 55
                    ELSE 55 - length(bin(hv // 64)) END) AS r
              FROM h$name GROUP BY 1)"""
      def estCte(name: String) =
        s"""e$name AS (SELECT count(*) AS bs_$name,
              CAST(sum(CAST(1 AS BIGINT) << (55 - r)) AS BIGINT) AS sp_$name
            FROM r$name)"""
      def est(name: String) =
        s"""(CAST(0.7213 AS DOUBLE)
             / (CAST(1.0 AS DOUBLE)
                + CAST(1.079 AS DOUBLE) / CAST(64.0 AS DOUBLE))
             * CAST(4096.0 AS DOUBLE) * CAST(36028797018963968 AS DOUBLE)
             / CAST(sp_$name + (64 - bs_$name) * 36028797018963968
                    AS DOUBLE))"""
      s"""WITH ${regCte("r", "R")},
          ${regCte("n", "N")},
          rm AS (SELECT b, max(r) AS r FROM (
                   SELECT b, r FROM rr UNION ALL SELECT b, r FROM rn) x
                 GROUP BY 1),
          ${estCte("r")}, ${estCte("n")},
          em AS (SELECT count(*) AS bs_m,
              CAST(sum(CAST(1 AS BIGINT) << (55 - r)) AS BIGINT) AS sp_m
            FROM rm),
          ex AS (SELECT count(*) AS exact_union,
              CAST(sum(CASE WHEN r = 1 AND n = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS exact_intersect
            FROM (SELECT k, max(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS r,
                    max(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS n
                  FROM (SELECT CAST(l_orderkey AS VARCHAR) AS k, 1 AS f
                          FROM lineitem WHERE l_returnflag = 'R'
                        UNION ALL
                        SELECT CAST(l_orderkey AS VARCHAR), 2
                          FROM lineitem WHERE l_returnflag = 'N') u
                  GROUP BY k) v)
          SELECT ROUND(${est("r")}, 6) AS est_r,
            ROUND(${est("n")}, 6) AS est_n,
            ROUND(${est("m")}, 6) AS est_union,
            ROUND(${est("r")} + ${est("n")} - ${est("m")}, 6)
              AS est_intersect,
            exact_union, exact_intersect
          FROM er, en, em, ex"""
    },

    // md5-HLL replay: same registers, same BIGINT power-of-two fold;
    // alpha_m and 2^55 spelled as the same double expressions as Spark
    "q512_hll_exact_replay" ->
      s"""WITH h AS (
           SELECT l_returnflag AS flag,
             ${H60("CAST(l_orderkey AS VARCHAR)")} AS hv
           FROM lineitem),
         r AS (SELECT flag, hv % 64 AS b,
                 CASE WHEN hv // 64 = 0 THEN 55
                      ELSE 55 - length(bin(hv // 64)) END AS rho
               FROM h),
         regs AS (SELECT flag, b, max(rho) AS r FROM r GROUP BY 1, 2),
         agg AS (SELECT flag, count(*) AS buckets_set,
                   CAST(sum(CAST(1 AS BIGINT) << (55 - r)) AS BIGINT) AS sp
                 FROM regs GROUP BY 1),
         est AS (SELECT flag, buckets_set,
                   CAST(0.7213 AS DOUBLE)
                     / (CAST(1.0 AS DOUBLE)
                        + CAST(1.079 AS DOUBLE) / CAST(64.0 AS DOUBLE))
                     * CAST(4096.0 AS DOUBLE)
                     * CAST(36028797018963968 AS DOUBLE)
                     / CAST(sp + (64 - buckets_set) * 36028797018963968
                            AS DOUBLE) AS e
                 FROM agg),
         ex AS (SELECT l_returnflag AS flag,
                  count(DISTINCT l_orderkey) AS exact_distinct
                FROM lineitem GROUP BY 1)
         SELECT flag, buckets_set, ROUND(e, 6) AS est_distinct,
           exact_distinct,
           ROUND((e - CAST(exact_distinct AS DOUBLE))
             / CAST(exact_distinct AS DOUBLE), 6) AS rel_err
         FROM est JOIN ex USING (flag)""",

    "q130_kmv_distinct" ->
      s"""WITH tok AS (
           SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
           FROM documents),
         h AS (SELECT DISTINCT ${H60("tok")} AS h FROM tok),
         mins AS (SELECT h FROM h ORDER BY h LIMIT 256),
         kth AS (SELECT max(h) AS hk, count(*) AS k_used FROM mins),
         ex AS (SELECT count(DISTINCT tok) AS exact_distinct FROM tok)
         SELECT
           CASE WHEN k_used < 256 THEN round(CAST(k_used AS DOUBLE), 6)
                ELSE round(255.0 / (CAST(hk AS DOUBLE) / 1152921504606846976.0), 6)
           END AS est_distinct,
           k_used, exact_distinct
         FROM kth, ex""",

    "q131_minks_sample" ->
      s"""SELECT doc_id, n_chars,
            CAST(row_number() OVER (
              ORDER BY CAST(${H60("'minks:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE),
                doc_id) AS INT) AS sample_rank
          FROM documents
          ORDER BY CAST(${H60("'minks:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE),
            doc_id
          LIMIT 256""",

    "q128_heavy_hitters" ->
      """WITH tok AS (
           SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS item
           FROM documents),
         n AS (SELECT count(*) AS n FROM tok)
         SELECT item, count(*) AS n_occurrences
         FROM tok, n GROUP BY item, n.n
         HAVING count(*) >= 0.002 * n.n""",

    "q129_curation_weighted_sample" ->
      s"""SELECT doc_id, n_chars,
            round(ln((${H60("'wsample:' || CAST(doc_id AS VARCHAR)")} + 1)
               / 1152921504606846976.0) / n_chars, 6) AS sample_key
          FROM documents
          ORDER BY ln((${H60("'wsample:' || CAST(doc_id AS VARCHAR)")} + 1)
               / 1152921504606846976.0) / n_chars DESC, doc_id LIMIT 100""",

    "q127_curation_dup_spans" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         w AS (
           SELECT doc_id,
             unnest(range(0, greatest(len(toks) - 4, 0))) AS start,
             unnest([array_to_string(toks[i+1 : i+5], ' ')
                     for i in range(0, greatest(len(toks) - 4, 0))]) AS span
           FROM t),
         dup AS (
           SELECT span FROM w GROUP BY span
           HAVING count(DISTINCT doc_id) >= 2),
         dw AS (
           SELECT doc_id, start, start + 5 AS e FROM w
           WHERE span IN (SELECT span FROM dup)),
         isl AS (
           SELECT doc_id, start, e,
             CASE WHEN coalesce(start >= max(e) OVER (
                    PARTITION BY doc_id ORDER BY start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), TRUE)
               THEN 1 ELSE 0 END AS ni
           FROM dw),
         isl2 AS (
           SELECT doc_id, start, e,
             sum(ni) OVER (PARTITION BY doc_id ORDER BY start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM isl),
         g AS (
           SELECT doc_id, island, min(start) AS s, max(e) AS ee,
             count(*) AS nw
           FROM isl2 GROUP BY doc_id, island),
         pd AS (
           SELECT doc_id, sum(ee - s) AS covered_tokens,
             sum(nw) AS n_dup_windows
           FROM g GROUP BY doc_id)
         SELECT t.doc_id, len(t.toks) AS n_tokens,
           CAST(coalesce(pd.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           CAST(coalesce(pd.covered_tokens, 0) AS BIGINT) AS covered_tokens,
           CASE WHEN len(t.toks) > 0
             THEN CAST(coalesce(pd.covered_tokens, 0) AS DOUBLE) / len(t.toks)
             ELSE 0.0 END AS dup_coverage
         FROM t LEFT JOIN pd USING (doc_id)""",

    "q104_curation_drop_spans" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
         sp AS (
           SELECT doc_id,
             unnest(range(0, (len(toks) - 1) // 3 + 1)) AS pos,
             unnest([array_to_string(toks[i*3+1 : i*3+3], ' ')
                     for i in range(0, (len(toks) - 1) // 3 + 1)]) AS span
           FROM t),
         hot AS (
           SELECT span FROM sp GROUP BY span
           HAVING count(DISTINCT doc_id) > 8),
         kept AS (
           SELECT doc_id, pos, span FROM sp
           WHERE span NOT IN (SELECT span FROM hot)),
         res AS (
           SELECT doc_id, string_agg(span, ' ' ORDER BY pos) AS kept_text,
             count(*) AS n_kept
           FROM kept GROUP BY doc_id)
         SELECT t.doc_id,
           coalesce(res.kept_text, '') AS clean_text,
           ((len(t.toks) - 1) // 3 + 1) - coalesce(res.n_kept, 0) AS n_dropped
         FROM t LEFT JOIN res USING (doc_id)"""
  )
}
