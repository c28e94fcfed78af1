package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextAnalysis.hash60

/** Oracle-gated pipeline/ETL composition operators added in round 6:
  * FIFO two-stream matching, multi-tier match-waterfall enrichment,
  * and related allocation/audit shapes. Everything folds in exact
  * integers/decimals so the DuckDB replay hash-matches; every join is
  * an equi-join on a well-distributed key (partkey / bucket) or a
  * broadcast of a bounded dimension, so the shapes hold at 100 TB.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  private val H60 = (x: String) => s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  private def qty(c: Column): Column = c.cast("decimal(12,2)")

  val queries: Map[String, Q] = Map(
    // FIFO two-stream matching: per part, demand lineitems (flag <> 'R')
    // consume supply lineitems (returned stock, flag = 'R') in shipdate
    // order — the lot-allocation / payment-application primitive. Each
    // stream becomes a run of half-open quantity intervals via a dual
    // prefix sum ([cum-qty, cum+qty) per row); matched quantity is the
    // interval overlap, so the whole match is ONE equi-join on partkey
    // plus a row-local overlap predicate — never a theta join, and the
    // per-part interval chains keep output linear in input rows. Scale:
    // both windows and the join shuffle on partkey once; AQE handles any
    // hot part.
    "q375_fifo_match" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        qty(col("l_quantity")).as("q"), col("l_shipdate"))
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def stream(df: DataFrame, p: String): DataFrame = df
        .withColumn("hi", sum(col("q")).over(w))
        .select(col("l_partkey"),
          col("l_orderkey").as(s"${p}_orderkey"),
          col("l_linenumber").as(s"${p}_linenumber"),
          (col("hi") - col("q")).as(s"${p}_lo"), col("hi").as(s"${p}_hi"))
      val sup = stream(li.where(col("l_returnflag") === "R"), "s")
      val dem = stream(li.where(col("l_returnflag") =!= "R"), "d")
      sup.join(dem, Seq("l_partkey"))
        .where(col("s_lo") < col("d_hi") && col("d_lo") < col("s_hi"))
        .select(col("l_partkey"), col("s_orderkey"), col("s_linenumber"),
          col("d_orderkey"), col("d_linenumber"),
          (least(col("s_hi"), col("d_hi")) -
           greatest(col("s_lo"), col("d_lo"))).cast("double").as("qty_matched"))
    }),

    // Match-waterfall enrichment: a deterministic md5-selected probe set
    // (20% of parts, half with the name mangled down to its last token)
    // resolves against the part dimension through tiered keys — tier 1
    // exact name, tier 2 last-token (noun) fallback — first match wins,
    // min-partkey tiebreak within a tier. Both tier dimensions are
    // pre-aggregated to one row per key and broadcast, so the waterfall
    // is two broadcast joins + one coalesce, no matter how many probes.
    "q376_waterfall_join" -> ((s, d) => {
      val part = Tables.part(s, d)
      val probes = part
        .where(pmod(hash60(concat(lit("wfprobe:"), col("p_partkey"))), lit(5L)) === 0L)
        .select(col("p_partkey").as("probe_id"),
          when(pmod(hash60(concat(lit("wfmangle:"), col("p_partkey"))), lit(2L)) === 0L,
            col("p_name"))
            .otherwise(element_at(split(col("p_name"), " "), -1))
            .as("probe_name"))
      val byName = part.groupBy(col("p_name").as("k1"))
        .agg(min(col("p_partkey")).as("m1"))
      val byNoun = part.groupBy(element_at(split(col("p_name"), " "), -1).as("k2"))
        .agg(min(col("p_partkey")).as("m2"))
      probes
        .join(broadcast(byName), col("probe_name") === col("k1"), "left")
        .join(broadcast(byNoun),
          element_at(split(col("probe_name"), " "), -1) === col("k2"), "left")
        .select(col("probe_id"), col("probe_name"),
          coalesce(col("m1"), col("m2")).as("matched_partkey"),
          when(col("m1").isNotNull, lit(1))
            .when(col("m2").isNotNull, lit(2)).otherwise(lit(0)).as("tier"))
    }),

    // Weight-of-evidence / information-value feature screen (the credit-
    // scoring staple): three categorical features (order priority,
    // customer segment, order month-of-year) against the label
    // "order is finished" ('F'). WoE_b = ln(good_b*B / (bad_b*G)) — one
    // IEEE division of exact integer counts feeds ln; the IV fold
    // quantizes each (g/G - b/B)*WoE term to 1e-9 integers so the
    // per-feature sum is shuffle-order-invariant. The melt is a
    // zero-shuffle Expand (stack); everything after runs on the bounded
    // (features x buckets) frame.
    "q379_woe_iv" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .selectExpr(
          """stack(3,
               'priority', o_orderpriority,
               'segment',  c_mktsegment,
               'month',    cast(month(o_orderdate) as string)
             ) as (feature, bucket)""",
          "cast(o_orderstatus = 'F' as int) as good")
      val g = base.groupBy(col("feature"), col("bucket"))
        .agg(sum(col("good")).as("n_good"),
          (count(lit(1)) - sum(col("good"))).as("n_bad"))
      val tot = g.groupBy(col("feature").as("tf"))
        .agg(sum(col("n_good")).as("gt"), sum(col("n_bad")).as("bt"))
      val woed = g.join(broadcast(tot), col("feature") === col("tf"))
        .withColumn("woe_raw",
          when(col("n_good") > 0 && col("n_bad") > 0,
            log((col("n_good") * col("bt")).cast("double") /
                (col("n_bad") * col("gt")).cast("double"))))
        .withColumn("termq",
          coalesce(round((col("n_good").cast("double") / col("gt").cast("double") -
                          col("n_bad").cast("double") / col("bt").cast("double")) *
                         col("woe_raw") * lit(1e9)).cast("long"), lit(0L)))
      val iv = woed.groupBy(col("feature").as("ivf"))
        .agg(sum(col("termq")).as("ivq"))
      woed.join(broadcast(iv), col("feature") === col("ivf"))
        .select(col("feature"), col("bucket"), col("n_good"), col("n_bad"),
          round(col("woe_raw"), 6).as("woe"),
          round(col("ivq").cast("double") / lit(1e9), 6).as("iv"))
    }),

    // Capped pro-rata budget allocation (water-filling, two unrolled
    // rounds): each nation's budget (half its customers' spend, whole
    // dollars) splits across customers proportional to spend via
    // largest-remainder apportionment (q335's integer-exact pattern),
    // clipped at a $1.5M per-customer cap; round 2 redistributes the
    // clipped surplus over still-uncapped customers the same way. All
    // arithmetic is int64 (spend in dollars keeps B*s < 2^63 far beyond
    // sf0.1); the only per-nation state is a handful of scalars joined
    // back from 25-row aggregate frames, and the remainder ranks are
    // windows over per-nation customer sets.
    "q380_capped_allocation" -> ((s, d) => {
      val cap = 1500000L
      val spend = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_nationkey"))
        .agg(round(sum(col("o_totalprice").cast("decimal(18,2)")))
          .cast("long").as("s"))
      val nat = spend.groupBy(col("c_nationkey").as("nk"))
        .agg(sum(col("s")).as("st"))
        .select(col("nk"), col("st"), expr("st div 2").as("b"))
      val r1 = spend.join(broadcast(nat), col("c_nationkey") === col("nk"))
        .withColumn("f1", expr("(b * s) div st"))
        .withColumn("rem1", expr("(b * s) % st"))
      val d1 = r1.groupBy(col("c_nationkey").as("dk1"))
        .agg((max(col("b")) - sum(col("f1"))).as("def1"))
      val w1 = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("rem1").desc, col("c_custkey"))
      val a1 = r1.join(broadcast(d1), col("c_nationkey") === col("dk1"))
        .withColumn("al1",
          col("f1") + when(row_number().over(w1) <= col("def1"), 1L).otherwise(0L))
        .withColumn("c1", least(col("al1"), lit(cap)))
      val el = a1.withColumn("elig", col("c1") < cap)
      val n2 = el.groupBy(col("c_nationkey").as("dk2"))
        .agg((max(col("b")) - sum(col("c1"))).as("sur"),
          sum(when(col("elig"), col("s")).otherwise(0L)).as("s2"))
      val r2 = el.join(broadcast(n2), col("c_nationkey") === col("dk2"))
        .withColumn("f2", when(col("elig") && col("s2") > 0,
          expr("(sur * s) div s2")).otherwise(0L))
        .withColumn("rem2", when(col("elig") && col("s2") > 0,
          expr("(sur * s) % s2")).otherwise(-1L))
      val d2 = r2.groupBy(col("c_nationkey").as("dk3"))
        .agg((max(col("sur")) - sum(col("f2"))).as("def2"))
      val w2 = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("rem2").desc, col("c_custkey"))
      r2.join(broadcast(d2), col("c_nationkey") === col("dk3"))
        .withColumn("al2", col("c1") + col("f2") +
          when(col("elig") && row_number().over(w2) <= col("def2"), 1L)
            .otherwise(0L))
        .select(col("c_custkey"), col("c_nationkey"), col("s").as("spend"),
          least(col("al2"), lit(cap)).as("alloc"),
          (least(col("al2"), lit(cap)) === cap).as("is_capped"))
    }),

    // Fixed-period periodogram: spectral power of each event type's
    // daily-spend series at the 7-day and 30-day cycles. The phase uses
    // t mod p so the trig argument stays in [0, 2*pi) (full-precision
    // reduction on both engines); each y*cos / y*sin term quantizes to
    // 1e-6 integers before the fold, absorbing libm 1-ulp skew and
    // making the sum shuffle-order-invariant. power = (C^2 + S^2)/N.
    "q381_periodogram" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("spend"))
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01")).as("t"),
          col("spend").cast("double").as("y"))
      val periods = Seq(7, 30).map(p =>
        daily.withColumn("period", lit(p))
          .withColumn("ang",
            pmod(col("t"), lit(p)).cast("double") * (lit(2.0) * lit(math.Pi)) /
              lit(p.toDouble))
          .withColumn("cq", round(col("y") * cos(col("ang")) * lit(1e6)).cast("long"))
          .withColumn("sq", round(col("y") * sin(col("ang")) * lit(1e6)).cast("long")))
      periods.reduce(_ unionByName _)
        .groupBy(col("event_type"), col("period"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("cq")).as("cqs"), sum(col("sq")).as("sqs"))
        .select(col("event_type"), col("period"), col("n_days"),
          round((col("cqs").cast("double") / lit(1e6) *
                 (col("cqs").cast("double") / lit(1e6)) +
                 col("sqs").cast("double") / lit(1e6) *
                 (col("sqs").cast("double") / lit(1e6))) /
                col("n_days").cast("double"), 6).as("power"))
    }),

    // Zone-map pruning-effectiveness audit: simulate per-file min/max
    // footer stats under two physical layouts — natural orderkey
    // clustering (4096-key zones) vs date clustering (month zones) —
    // and, for every month predicate, count zones a reader could skip
    // (zone max < month or zone min > month). The scan-fraction gap
    // between layouts is the data-layout decision this audit feeds at
    // 100 TB. Zones and months are bounded post-aggregation frames; the
    // zone x month evaluation is a broadcast join on a constant key.
    "q382_zonemap_audit" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
      def zones(df: DataFrame, layout: String, bucket: Column): DataFrame =
        df.groupBy(bucket.as("zone"))
          .agg(min(col("m")).as("zlo"), max(col("m")).as("zhi"))
          .select(lit(layout).as("layout"), col("zone"), col("zlo"), col("zhi"))
      val z = zones(o, "orderkey_4096", expr("o_orderkey div 4096"))
        .unionByName(zones(o, "date_month", col("m")))
        .withColumn("one", lit(1))
      val months = o.select(col("m").as("pm")).distinct()
        .withColumn("one", lit(1))
      z.join(broadcast(months), Seq("one"))
        .groupBy(col("layout"), col("pm"))
        .agg(count(lit(1)).as("n_zones"),
          sum(when(col("zhi") < col("pm") || col("zlo") > col("pm"), 1L)
            .otherwise(0L)).as("n_pruned"))
        .select(col("layout"), col("pm").as("pred_month"), col("n_zones"),
          col("n_pruned"),
          round((col("n_zones") - col("n_pruned")).cast("double") /
                col("n_zones").cast("double"), 6).as("scan_frac"))
    }),

    // Token-bucket rate-limiter simulation: per user, replay events in
    // time order against a bucket of capacity 3 refilling 1 token per 3
    // days — the admission-control / quota primitive. The fold is
    // non-linear (two-sided clamp), so no window prefix-sum expresses
    // it; instead the whole state packs into ONE int64
    // (((minute*8 + tokens) << 16) + accepted_count) and the fold is a
    // row-local aggregate() over each user's sorted minute list — pure
    // integer ops, so DuckDB's scalar list_reduce replays it exactly
    // (its struct-state variant is unreliable, see q249). Per-user
    // sequences are bounded; nothing shuffles except the one groupBy.
    "q383_token_bucket" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        col("ts").cast("long").as("sec"), col("event_id"))
      val seq = ev.groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("sec"), col("event_id").as("o"),
          expr("sec div 60").as("m")))).as("arr"))
      def idiv(a: Column, b: Long): Column =
        ((a - pmod(a, lit(b))) / lit(b.toDouble)).cast("long")
      val folded = aggregate(col("arr"), lit(0L),
        (acc, e) => {
          val prev = shiftright(acc, 19)
          val tok = shiftright(acc, 16).bitwiseAND(lit(7L))
          val cnt = acc.bitwiseAND(lit(65535L))
          val tb = least(lit(3L), tok + idiv(e.getField("m") - prev, 4320L))
          val ok = tb >= 1L
          val tok2 = tb - when(ok, 1L).otherwise(0L)
          val cnt2 = cnt + when(ok, 1L).otherwise(0L)
          shiftleft(e.getField("m") * 8 + tok2, 16) + cnt2
        })
      seq.select(col("user_id"), size(col("arr")).as("n_events"),
          folded.bitwiseAND(lit(65535L)).as("n_accepted"),
          (size(col("arr")) - folded.bitwiseAND(lit(65535L))).as("n_rejected"),
          shiftright(folded, 16).bitwiseAND(lit(7L)).as("tokens_left"))
    }),

    // Interval coverage gaps: per customer, 30-day service windows from
    // each order merge into islands (running max of window end,
    // exclusive prefix), and the COMPLEMENT — the uncovered gaps between
    // islands — is the output, with gap length in days. The islands pass
    // is one window over per-customer order sets; the gap extraction is
    // a lag over the (tiny) per-customer island frame.
    "q384_coverage_gaps" -> ((s, d) => {
      val iv = Tables.orders(s, d).select(col("o_custkey"),
        to_date(col("o_orderdate")).as("lo"), col("o_orderkey"))
        .withColumn("hi", date_add(col("lo"), 30))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("lo"), col("o_orderkey"))
      val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
      val isl = iv
        .withColumn("pmax", max(col("hi")).over(wPrev))
        .withColumn("newi",
          when(col("pmax").isNull || col("lo") > col("pmax"), 1).otherwise(0))
        .withColumn("isl", sum(col("newi")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("o_custkey"), col("isl"))
        .agg(min(col("lo")).as("s"), max(col("hi")).as("e"))
      val wi = Window.partitionBy(col("o_custkey")).orderBy(col("isl"))
      isl.withColumn("gap_start", lag(col("e"), 1).over(wi))
        .where(col("gap_start").isNotNull)
        .select(col("o_custkey"), col("gap_start").cast("string").as("gap_start"),
          col("s").cast("string").as("gap_end"),
          datediff(col("s"), col("gap_start")).as("gap_days"))
    }),

    // Soundex phonetic codes over a pinned fixture (q255's fixture-gate
    // pattern: DuckDB has no soundex, so the oracle pins the expected
    // US-census codes as VALUES literals — including the classic test
    // vectors Robert/Rupert R163, Ashcraft A261, Tymczak T522,
    // Pfister P236). Exercises Spark's codegen'd soundex expression,
    // the phonetic-blocking key used for name matching.
    "q385_soundex_blocking" -> ((s, d) => {
      import s.implicits._
      Seq("robert", "rupert", "ashcraft", "ashcroft", "tymczak", "pfister",
          "honeyman", "jackson", "jaxon", "smith", "smyth", "knight",
          "night", "gear", "ring", "widget")
        .toDF("word")
        .select(col("word"), soundex(col("word")).as("code"))
    }),

    // Diacritic-insensitive matching: accented probe strings fold to
    // ASCII through an explicit translate() mapping (identical literal
    // in both engines — no reliance on engine-specific strip_accents
    // tables) and join the part-noun dictionary. The dictionary is a
    // bounded pre-aggregated broadcast; the probe fixture exercises the
    // fold + match path end to end.
    "q386_diacritic_match" -> ((s, d) => {
      import s.implicits._
      val from = "áàâäéèêëíìîïóòôöúùûüçñý"
      val to = "aaaaeeeeiiiioooouuuucny"
      val probes = Seq("rïng", "gèar", "wídget", "bólt", "gizmò", "cáble")
        .toDF("probe")
        .withColumn("clean", translate(col("probe"), from, to))
      val byNoun = Tables.part(s, d)
        .groupBy(element_at(split(col("p_name"), " "), -1).as("noun"))
        .agg(min(col("p_partkey")).as("matched_partkey"),
          count(lit(1)).as("n_parts"))
      probes.join(broadcast(byNoun), col("clean") === col("noun"), "left")
        .select(col("probe"), col("clean"),
          col("matched_partkey"), coalesce(col("n_parts"), lit(0L)).as("n_parts"))
    }),

    // Functional-dependency REPAIR (the fix pass over q267's FD check):
    // a deterministic 5% of orders carries a corrupted nation under the
    // custkey -> nation dependency; the repair recodes each violating
    // row to its key's majority value (max support, min-value tiebreak
    // encoded as ONE scalar max_by argument — DuckDB has no struct
    // comparator). One groupBy builds the (key, value) support table;
    // the majority election and the violation scan are co-keyed joins.
    "q387_fd_repair" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          when(pmod(hash60(concat(lit("fddirty:"), col("o_orderkey"))),
              lit(20L)) === 0L,
            pmod(col("c_nationkey") + 1, lit(25)))
            .otherwise(col("c_nationkey")).as("observed"))
      val support = base.groupBy(col("o_custkey").as("k"), col("observed").as("v"))
        .agg(count(lit(1)).as("c"))
      val maj = support.groupBy(col("k"))
        .agg(max_by(col("v"), col("c") * 1000000L - col("v")).as("repaired"),
          max_by(col("c"), col("c") * 1000000L - col("v")).as("support"))
      base.join(maj, col("o_custkey") === col("k"))
        .where(col("observed") =!= col("repaired"))
        .select(col("o_orderkey"), col("o_custkey"), col("observed"),
          col("repaired"), col("support"))
    }),

    // Jackknife-by-partition standard error for a ratio metric (revenue
    // cents per event) — the error bar that actually scales: 16 md5
    // buckets play the role of partitions, each leave-one-out estimate
    // is (S - s_g)/(N - n_g) over exact integer sufficient sums, and
    // the two small folds (mean of 16 leave-one-outs, sum of squared
    // deviations) quantize to integers so they are order-invariant.
    // Everything after the one groupBy runs on a 16-row frame.
    "q388_jackknife_se" -> ((s, d) => {
      val g = Tables.events(s, d)
        .groupBy(pmod(hash60(concat(lit("jk:"), col("event_id"))), lit(16L))
          .as("g"))
        .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("sg"), count(lit(1)).as("ng"))
      val tot = g.agg(sum(col("sg")).as("s"), sum(col("ng")).as("n"))
      val loo = g.crossJoin(broadcast(tot))
        .withColumn("loo", (col("s") - col("sg")).cast("double") /
          (col("n") - col("ng")).cast("double"))
        .withColumn("q", round(col("loo") * lit(1e9)).cast("long"))
      val mean = loo.agg(sum(col("q")).as("qb"), count(lit(1)).as("ng2"))
        .select((col("qb").cast("double") / lit(16.0) / lit(1e9)).as("mean_loo"))
      loo.crossJoin(broadcast(mean))
        .withColumn("t", round((col("loo") - col("mean_loo")) *
          (col("loo") - col("mean_loo")) * lit(1e15)).cast("long"))
        .agg(max(col("s")).as("sc"), max(col("n")).as("nc"),
          sum(col("t")).as("ssq"))
        .select(lit(16).as("n_groups"),
          round(col("sc").cast("double") / col("nc").cast("double"), 6)
            .as("theta_cents_per_event"),
          round(sqrt(lit(15.0) / lit(16.0) *
            (col("ssq").cast("double") / lit(1e15))), 6).as("jk_se"))
    }),

    // Mergeable-histogram percentile accuracy audit: the 128-bin
    // equal-width histogram (the sketch any executor can build and any
    // reducer can merge) estimates p50/p90/p99 by in-bin linear
    // interpolation, and the audit joins the EXACT interpolated
    // percentile (q370's value-domain pass) to report the estimation
    // error — the check run before trusting histogram sketches at
    // 100 TB. Windows run over per-group value/bin domains only.
    "q389_hist_percentile_audit" -> ((s, d) => {
      val ps = Seq(0.5, 0.9, 0.99)
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("grp"), col("l_extendedprice").as("v"))
      val mm = li.groupBy(col("grp").as("mg"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
          count(lit(1)).as("n"))
        .withColumn("wdt", (col("mx") - col("mn")) / lit(128.0))
      val hist = li.join(broadcast(mm), col("grp") === col("mg"))
        .withColumn("bin", least(floor((col("v") - col("mn")) / col("wdt"))
          .cast("long"), lit(127L)))
        .groupBy(col("grp"), col("bin"))
        .agg(count(lit(1)).as("c"), max(col("mn")).as("mn"),
          max(col("wdt")).as("wdt"), max(col("n")).as("n"))
      val wb = Window.partitionBy(col("grp")).orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("c")).over(wb))
        .withColumn("cum_prev", col("cum") - col("c"))
      val est = cum
        .withColumn("p", explode(array(ps.map(lit(_)): _*)))
        .withColumn("pos", col("p") * col("n").cast("double"))
        .where(col("cum_prev").cast("double") < col("pos") &&
          col("pos") <= col("cum").cast("double"))
        .select(col("grp"), col("p"),
          (col("mn") + col("bin").cast("double") * col("wdt") +
           (col("pos") - col("cum_prev").cast("double")) /
             col("c").cast("double") * col("wdt")).as("est"))
      val counts = li.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
      val wv = Window.partitionBy(col("grp")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cumv = counts.withColumn("cum", sum(col("c")).over(wv))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
        .withColumn("cum_prev", col("cum") - col("c"))
      val exact = cumv
        .withColumn("p", explode(array(ps.map(lit(_)): _*)))
        .withColumn("h", (col("n") - 1).cast("double") * col("p"))
        .withColumn("lo", floor(col("h")).cast("long"))
        .withColumn("hi", least(col("lo") + 1, col("n") - 1))
        .where((col("cum_prev") <= col("lo") && col("lo") < col("cum")) ||
          (col("cum_prev") <= col("hi") && col("hi") < col("cum")))
        .groupBy(col("grp"), col("p"))
        .agg(max(col("h")).as("h"),
          max(when(col("cum_prev") <= col("lo") && col("lo") < col("cum"),
            col("v"))).as("v_lo"),
          max(when(col("cum_prev") <= col("hi") && col("hi") < col("cum"),
            col("v"))).as("v_hi"))
        .select(col("grp"), col("p"),
          (col("v_lo") + (col("h") - floor(col("h"))) *
            (col("v_hi") - col("v_lo"))).as("exact"))
      est.join(exact, Seq("grp", "p"))
        .select(col("grp"), col("p"), round(col("est"), 6).as("est"),
          round(col("exact"), 6).as("exact"),
          round(abs(col("est") - col("exact")), 6).as("abs_err"))
    }),

    // Event debounce: collapse per-(user, event type) bursts — an event
    // arriving within 300 s of its predecessor is suppressed (burst
    // continuation), only burst heads survive. One lag window keyed on
    // (user, type), aggregated to raw/kept/suppressed counts.
    "q390_debounce" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
        col("ts").cast("long").as("sec"), col("event_id"))
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("sec"), col("event_id"))
      ev.withColumn("prev", lag(col("sec"), 1).over(w))
        .withColumn("kept",
          when(col("prev").isNull || col("sec") - col("prev") > 300L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_raw"), sum(col("kept")).as("n_kept"),
          (count(lit(1)) - sum(col("kept"))).as("n_suppressed"))
    }),

    // Reciprocal (mutual) nearest-neighbor pairs: among the blocked
    // exact cosine candidates (>= 0.35), keep only pairs where each side
    // is the other's single best neighbor — the high-precision pairing
    // rule SemDeDup-style semantic dedup and RNN clustering build on.
    // The per-node argmax encodes (cosine, -neighbor) as ONE scalar
    // max_by key (round(c*1e6)*1e5 - id; DuckDB has no struct
    // comparator) and the mutuality test is a self-join of the bounded
    // best-edge frame on both directions.
    "q391_mutual_nn" -> ((s, d) => {
      val pairs = graft.operators.Similarity
        .cosineNearDupPairs(Tables.embeddings(s, d), 0.35)
      val u = pairs.select(col("id_a").as("src"), col("id_b").as("dst"),
          col("cosine").as("c"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst"),
          col("cosine").as("c")))
      val key = round(col("c") * lit(1e6)).cast("long") * 100000L - col("dst")
      val best = u.groupBy(col("src"))
        .agg(max_by(col("dst"), key).as("best"), max_by(col("c"), key).as("bc"))
      best.as("b1").join(best.as("b2"),
          col("b1.best") === col("b2.src") && col("b2.best") === col("b1.src") &&
          col("b1.src") < col("b1.best"))
        .select(col("b1.src").as("id_a"), col("b1.best").as("id_b"),
          col("b1.bc").as("cosine"))
    }),

    // Inverse-CDF weighted categorical sampler: the word2vec-style
    // negative-sampling table. Vocabulary weights are the
    // unigram^0.75-smoothed frequencies quantized to integers; each of
    // 4096 md5 draws lands on the cumulative-weight axis and resolves
    // to its token through the SAME union+window as-of join plan as
    // q161 (no inequality join, no per-draw scan). The vocab is a
    // bounded corpus statistic (freq >= 5), so its cumulative window is
    // a corpus-scalar fit. pow(freq, 0.75) is the one libm op; its
    // 1-ulp cross-engine risk is absorbed by the coarse *1000
    // quantization (same risk class as the ln-based BM25/Zipf gates).
    "q392_negative_sampler" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(graft.functions.TextAnalysis.tokens(col("text")))
          .as("tok"))
        .where(length(col("tok")) > 0)
      val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        .where(col("freq") >= 5)
        .withColumn("w", round(pow(col("freq"), lit(0.75)) * lit(1000))
          .cast("long"))
      val wc = Window.orderBy(col("tok"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = vocab.withColumn("cum_lo",
        coalesce(sum(col("w")).over(wc), lit(0L)))
      val tot = vocab.agg(sum(col("w")).as("tw"))
      val draws = s.range(4096).toDF("j").crossJoin(broadcast(tot))
        .select(col("j"),
          pmod(hash60(concat(lit("neg:"), col("j"))), col("tw")).as("u"))
      val assigned = graft.operators.TimeSeries.asOfJoin(
        draws, col("j"), lit(1), col("u"),
        cum, lit(1), col("cum_lo"), col("tok"))
      val counts = assigned.groupBy(col("asof").as("tok"))
        .agg(count(lit(1)).as("n"))
      cum.join(counts, Seq("tok"), "left").crossJoin(broadcast(tot))
        .select(col("tok").as("token"), col("freq"),
          coalesce(col("n"), lit(0L)).as("n_drawn"),
          round(col("w").cast("double") / col("tw").cast("double"), 6)
            .as("expected_share"))
    }),

    // Propensity-bucket matched pairs (PSM-lite): odd-custkey "treated"
    // customers pair 1:1 with controls inside exact percent-rank deciles
    // of the pre-treatment covariate (account balance) — the i-th
    // treated of a decile matches its i-th control (rank by balance,
    // key), unmatched tails drop. ATT per decile is an integer-cents
    // mean difference: one division at the end. The decile fit is the
    // exact two-level percent-rank (no global sort); the pairing is a
    // co-keyed (decile, rank) equi-join.
    "q393_psm_att" -> ((s, d) => {
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("y"))
      val units = Tables.customer(s, d)
        .join(spend, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_acctbal"), col("y"),
          (pmod(col("c_custkey"), lit(2L)) === 1L).as("treated"))
      val q = graft.operators.Vectorizers
        .quantileRank(units, col("c_custkey"), col("c_acctbal"))
        .select(col("id").as("c_custkey"),
          least(lit(9L), floor(col("q") * 10).cast("long")).as("decile"))
      val ranked = units.join(q, Seq("c_custkey"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("decile"), col("treated"))
            .orderBy(col("c_acctbal"), col("c_custkey"))))
      val t = ranked.where(col("treated"))
        .select(col("decile"), col("rn"), col("y").as("yt"))
      val c = ranked.where(!col("treated"))
        .select(col("decile"), col("rn"), col("y").as("yc"))
      val arms = ranked.groupBy(col("decile"))
        .agg(sum(when(col("treated"), 1L).otherwise(0L)).as("n_treated"),
          sum(when(col("treated"), 0L).otherwise(1L)).as("n_control"))
      t.join(c, Seq("decile", "rn"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("yt") - col("yc")).as("dsum"))
        .join(arms, Seq("decile"))
        .select(col("decile"), col("n_treated"), col("n_control"),
          col("n_pairs"),
          round(col("dsum").cast("double") / col("n_pairs").cast("double")
            / lit(100.0), 6).as("att_dollars"))
    }),

    // Qini uplift curve by propensity decile: treated (odd custkey) vs
    // control conversion to an urgent order, per exact percent-rank
    // decile of account balance, plus the cumulative Qini statistic
    // walking deciles best-first — the uplift-model evaluation the A/B
    // readouts (q153/q259) don't cover. All counts are exact integers;
    // the cumulative pass runs on the 10-row decile frame.
    "q394_qini_uplift" -> ((s, d) => {
      val conv = Tables.orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
        .withColumn("b", lit(1L))
      val units = Tables.customer(s, d)
        .join(conv, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_acctbal"),
          coalesce(col("b"), lit(0L)).as("b"),
          (pmod(col("c_custkey"), lit(2L)) === 1L).as("treated"))
      val q = graft.operators.Vectorizers
        .quantileRank(units, col("c_custkey"), col("c_acctbal"))
        .select(col("id").as("c_custkey"),
          least(lit(9L), floor(col("q") * 10).cast("long")).as("decile"))
      val dec = units.join(q, Seq("c_custkey"))
        .groupBy(col("decile"))
        .agg(sum(when(col("treated"), 1L).otherwise(0L)).as("n_t"),
          sum(when(!col("treated"), 1L).otherwise(0L)).as("n_c"),
          sum(when(col("treated"), col("b")).otherwise(0L)).as("conv_t"),
          sum(when(!col("treated"), col("b")).otherwise(0L)).as("conv_c"))
      val w = Window.orderBy(col("decile").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dec
        .withColumn("cnt", sum(col("n_t")).over(w))
        .withColumn("cnc", sum(col("n_c")).over(w))
        .withColumn("cct", sum(col("conv_t")).over(w))
        .withColumn("ccc", sum(col("conv_c")).over(w))
        .select(col("decile"), col("n_t"), col("n_c"), col("conv_t"),
          col("conv_c"),
          round(col("conv_t").cast("double") / col("n_t").cast("double") -
                col("conv_c").cast("double") / col("n_c").cast("double"), 6)
            .as("uplift"),
          round(col("cct").cast("double") - col("ccc").cast("double") *
            (col("cnt").cast("double") / col("cnc").cast("double")), 6)
            .as("qini"))
    }),

    // Hierarchical-shrinkage target encoding: each (type, brand) cell's
    // mean retail price shrinks toward its TYPE's mean, which itself
    // shrinks toward the global mean (two-level partial pooling,
    // k = 20 pseudo-observations per level) — the encoding that keeps
    // rare categories sane where q139's single-level smoothing cannot.
    // Sums stay integer cents until the two mirrored divisions; the
    // parent frames are bounded broadcasts.
    "q395_hier_target_encode" -> ((s, d) => {
      val k = 20.0
      val p = Tables.part(s, d).select(col("p_type"), col("p_brand"),
        (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val cell = p.groupBy(col("p_type"), col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      val typ = cell.groupBy(col("p_type").as("t"))
        .agg(sum(col("n")).as("nt"), sum(col("sc")).as("st"))
      val glob = typ.agg(sum(col("nt")).as("ng"), sum(col("st")).as("sg"))
        .select((col("sg").cast("double") / col("ng").cast("double"))
          .as("mg"))
      val typS = typ.crossJoin(broadcast(glob))
        .select(col("t"),
          ((col("st").cast("double") + lit(k) * col("mg")) /
           (col("nt").cast("double") + lit(k))).as("mts"))
      cell.join(broadcast(typS), col("p_type") === col("t"))
        .select(col("p_type"), col("p_brand"), col("n"),
          round((col("sc").cast("double") + lit(k) * col("mts")) /
                (col("n").cast("double") + lit(k)) / lit(100.0), 6)
            .as("encoded_dollars"))
    }),

    // Cross-format sink/source consistency: write the customer
    // dimension through the ORC, JSON, and CSV sinks, read each back
    // under its explicit schema, and compare an order-independent
    // content digest (sum of per-row md5-hash residues — floats ride as
    // DECIMAL strings so no engine float-formatting enters the hash)
    // against the parquet original. The oracle computes the digest once
    // from parquet and expects every format to match — a corrupted
    // roundtrip breaks the hash gate, not just a row count.
    "q397_multi_format_consistency" -> ((s, d) => {
      import graft.sources.FormatReaders
      val base = Tables.customer(s, d)
      def digest(df: DataFrame): DataFrame =
        df.select(pmod(hash60(concat_ws(":", lit("dig"), col("c_custkey"),
            col("c_name"), col("c_nationkey"),
            col("c_acctbal").cast("decimal(12,2)"), col("c_mktsegment"))),
          lit(1000000000000L)).as("h"))
          .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("digest"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_fmt").toString
      FormatReaders.writeOrc(base, s"$tmp/orc")
      FormatReaders.writeJson(base, s"$tmp/json")
      FormatReaders.writeCsv(base, s"$tmp/csv")
      val reread = Seq(
        "parquet" -> base,
        "orc" -> FormatReaders.readOrc(s, s"$tmp/orc"),
        "json" -> FormatReaders.readJson(s, s"$tmp/json", base.schema),
        "csv" -> FormatReaders.readCsv(s, s"$tmp/csv", base.schema))
      val ref = digest(base).select(col("digest").as("ref_digest"))
      reread.map { case (fmt, df) =>
        digest(df).select(lit(fmt).as("format"), col("n_rows"), col("digest"))
      }.reduce(_ unionByName _)
        .crossJoin(broadcast(ref))
        .select(col("format"), col("n_rows"), col("digest"),
          (col("digest") === col("ref_digest")).as("matches_parquet"))
    }),

    // TextRank extractive summarization: per document, 12-token chunks
    // are the "sentences", edges are exact-rational Jaccard overlaps of
    // their distinct-token sets (quantized to 1e9 integers), and five
    // fixed power-iteration rounds of weighted PageRank (damping 0.85,
    // per-round integer re-quantization — q142/q326's determinism
    // pattern) score each chunk; the top-2 per document are the
    // summary. The Jaccard pair graph AND the five PageRank rounds run
    // ROW-LOCALLY per document over the grouped chunk list: per-doc
    // state is O(sum_w f_w²) pair counts — exactly the row count the
    // previous (doc,w)-keyed self-join shuffled into a single doc's
    // hash-agg task anyway (one-task hotspot either way; measured
    // 8.9 s of which 8+ s was the pair-join shuffle), so the fold
    // trades five shuffles + four joins for ONE groupBy(doc).
    // Arithmetic is bit-identical to the unrolled oracle CTEs:
    // HALF_UP rounds (Spark round semantics), long sums (order-free),
    // IEEE double divisions, left-to-right as written.
    "q396_textrank_summary" -> ((s, d) => {
      val chunks = graft.operators.Curation.chunkByTokens(
          Tables.documents(s, d), col("doc_id"), col("text"), 12, 0)
        .select(col("doc"), col("chunk_idx").as("i"), col("chunk_text"))
      val textRank = udf((idx: Seq[Int], texts: Seq[String]) => {
        def halfUp(x: Double): Long =
          BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        // distinct non-empty space-split tokens == the previous plan's
        // explode(array_distinct(split(text,' '))) + length>0 filter
        val toks: Map[Int, Set[String]] = idx.zip(texts).map { case (i, t) =>
          i -> t.split(" ", -1).filter(_.nonEmpty).toSet
        }.toMap
        // intersection counts via an inverted token -> chunk-ids index
        // (same f_w² pair work as the old self-join, zero shuffle)
        val byTok = scala.collection.mutable.HashMap
          .empty[String, scala.collection.mutable.ArrayBuffer[Int]]
        idx.sorted.foreach { i =>
          toks(i).foreach(w =>
            byTok.getOrElseUpdate(w, scala.collection.mutable.ArrayBuffer
              .empty[Int]) += i)
        }
        val nint = scala.collection.mutable.HashMap.empty[(Int, Int), Long]
          .withDefaultValue(0L)
        byTok.valuesIterator.foreach { is =>
          var a = 0
          while (a < is.length - 1) {
            var b = a + 1
            while (b < is.length) { nint((is(a), is(b))) += 1L; b += 1 }
            a += 1
          }
        }
        // undirected Jaccard weight -> two directed edges + out-sums
        val out = scala.collection.mutable.HashMap
          .empty[Int, scala.collection.mutable.ArrayBuffer[(Int, Long)]]
        val wsum = scala.collection.mutable.HashMap.empty[Int, Long]
          .withDefaultValue(0L)
        nint.foreach { case ((i, j), n) =>
          val wq = halfUp(
            n.toDouble / (toks(i).size + toks(j).size - n).toDouble * 1e9)
          if (wq > 0) {
            out.getOrElseUpdate(i, scala.collection.mutable.ArrayBuffer
              .empty[(Int, Long)]) += ((j, wq))
            out.getOrElseUpdate(j, scala.collection.mutable.ArrayBuffer
              .empty[(Int, Long)]) += ((i, wq))
            wsum(i) += wq; wsum(j) += wq
          }
        }
        val nd = idx.size
        var rq: Map[Int, Long] = idx.map(i => i -> halfUp(1e9 / nd.toDouble)).toMap
        for (_ <- 1 to 5) {
          val sc = scala.collection.mutable.HashMap.empty[Int, Long]
            .withDefaultValue(0L)
          out.foreach { case (src, dsts) =>
            val ws = wsum(src)
            dsts.foreach { case (dst, wq) =>
              sc(dst) += halfUp(wq.toDouble / ws.toDouble * rq(src).toDouble)
            }
          }
          rq = idx.map(i =>
            i -> halfUp(1.5e8 / nd.toDouble + 0.85 * sc(i).toDouble)).toMap
        }
        idx.map(i => (i, rq(i))).sortBy { case (i, r) => (-r, i) }
          .take(2).zipWithIndex
          .map { case ((i, r), z) => (i, z + 1, r) }
      })
      // both arrays are projections of the SAME sorted struct array, so
      // indices and texts stay aligned through the aggregation
      val ranked = chunks.groupBy(col("doc"))
        .agg(sort_array(collect_list(struct(col("i"), col("chunk_text"))))
          .as("cs"))
        .select(col("doc"),
          explode(textRank(col("cs.i"), col("cs.chunk_text"))).as("g"))
        .select(col("doc"), col("g._1").as("i"),
          col("g._2").as("rank"), col("g._3").as("rq"))
      ranked.join(chunks, Seq("doc", "i"))
        .select(col("doc").as("doc_id"), col("i").as("chunk_idx"),
          col("rank"), round(col("rq").cast("double") / lit(1e9), 6)
            .as("score"), col("chunk_text"))
    }),

    // Shapley decomposition of R^2 over two regressors: how much of the
    // price variance explained by {quantity, discount} belongs to each —
    // phi_x = (R2(x) + R2(xz) - R2(z)) / 2 — computed entirely from one
    // sufficient-stats aggregate per flag (closed-form correlations; the
    // 2-regressor R2 identity (rxy^2 + rzy^2 - 2 rxy rzy rxz)/(1-rxz^2)).
    // First-order sums fold exact decimal; second-order terms quantize
    // y*y etc. to integers so shuffle order cannot perturb bits.
    // Frisch-Waugh-Lovell controlled regression per flag: the effect of
    // quantity on price CONTROLLING for discount — beta from the 3-var
    // normal equations plus the partial correlation, all from q398's
    // exact sufficient-stats pass (naive beta emitted for contrast)
    "q433_partial_regression" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag").as("grp"),
        col("l_extendedprice").cast("decimal(12,2)").cast("double").as("y"),
        col("l_quantity").cast("decimal(12,2)").cast("double").as("x"),
        col("l_discount").cast("decimal(12,2)").cast("double").as("z"))
      def q2(c: Column): Column = round(c).cast("long")
      val st = li.groupBy(col("grp")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x").cast("decimal(18,2)")).cast("double").as("sx"),
        sum(col("z").cast("decimal(18,2)")).cast("double").as("sz"),
        sum(col("y").cast("decimal(18,2)")).cast("double").as("sy"),
        sum(q2(col("x") * col("x") * lit(1e4))).cast("double").as("sxxq"),
        sum(q2(col("z") * col("z") * lit(1e6))).cast("double").as("szzq"),
        sum(q2(col("y") * col("y"))).cast("double").as("syyq"),
        sum(q2(col("x") * col("y") * lit(1e2))).cast("double").as("sxyq"),
        sum(q2(col("z") * col("y") * lit(1e4))).cast("double").as("szyq"),
        sum(q2(col("x") * col("z") * lit(1e6))).cast("double").as("sxzq"))
      val cxy = col("n") * (col("sxyq") / lit(1e2)) - col("sx") * col("sy")
      val cxz = col("n") * (col("sxzq") / lit(1e6)) - col("sx") * col("sz")
      val czy = col("n") * (col("szyq") / lit(1e4)) - col("sz") * col("sy")
      val cxx = col("n") * (col("sxxq") / lit(1e4)) - col("sx") * col("sx")
      val czz = col("n") * (col("szzq") / lit(1e6)) - col("sz") * col("sz")
      val cyy = col("n") * col("syyq") - col("sy") * col("sy")
      val rxy = cxy / sqrt(cxx * cyy)
      val rxz = cxz / sqrt(cxx * czz)
      val rzy = czy / sqrt(czz * cyy)
      st.select(col("grp"), col("n").cast("long").as("n"),
        round(cxy / cxx, 6).as("beta_naive"),
        round((cxy * czz - cxz * czy) / (cxx * czz - cxz * cxz), 6)
          .as("beta_controlled"),
        round((rxy - rxz * rzy) /
          sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - rzy * rzy)), 6)
          .as("partial_corr"))
    }),

    "q398_shapley_r2" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag").as("grp"),
        col("l_extendedprice").cast("decimal(12,2)").cast("double").as("y"),
        col("l_quantity").cast("decimal(12,2)").cast("double").as("x"),
        col("l_discount").cast("decimal(12,2)").cast("double").as("z"))
      def q2(c: Column): Column = round(c).cast("long")
      val st = li.groupBy(col("grp")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x").cast("decimal(18,2)")).cast("double").as("sx"),
        sum(col("z").cast("decimal(18,2)")).cast("double").as("sz"),
        sum(col("y").cast("decimal(18,2)")).cast("double").as("sy"),
        sum(q2(col("x") * col("x") * lit(1e4))).cast("double").as("sxxq"),
        sum(q2(col("z") * col("z") * lit(1e6))).cast("double").as("szzq"),
        sum(q2(col("y") * col("y"))).cast("double").as("syyq"),
        sum(q2(col("x") * col("y") * lit(1e2))).cast("double").as("sxyq"),
        sum(q2(col("z") * col("y") * lit(1e4))).cast("double").as("szyq"),
        sum(q2(col("x") * col("z") * lit(1e6))).cast("double").as("sxzq"))
      val cor = st.select(col("grp"), col("n"),
        ((col("n") * (col("sxyq") / lit(1e2)) - col("sx") * col("sy")) /
         sqrt((col("n") * (col("sxxq") / lit(1e4)) - col("sx") * col("sx")) *
              (col("n") * col("syyq") - col("sy") * col("sy")))).as("rxy"),
        ((col("n") * (col("szyq") / lit(1e4)) - col("sz") * col("sy")) /
         sqrt((col("n") * (col("szzq") / lit(1e6)) - col("sz") * col("sz")) *
              (col("n") * col("syyq") - col("sy") * col("sy")))).as("rzy"),
        ((col("n") * (col("sxzq") / lit(1e6)) - col("sx") * col("sz")) /
         sqrt((col("n") * (col("sxxq") / lit(1e4)) - col("sx") * col("sx")) *
              (col("n") * (col("szzq") / lit(1e6)) - col("sz") * col("sz"))))
          .as("rxz"))
      cor.select(col("grp"), col("n").cast("long").as("n"),
          (col("rxy") * col("rxy")).as("r2_x"),
          (col("rzy") * col("rzy")).as("r2_z"),
          ((col("rxy") * col("rxy") + col("rzy") * col("rzy") -
            lit(2.0) * col("rxy") * col("rzy") * col("rxz")) /
           (lit(1.0) - col("rxz") * col("rxz"))).as("r2_full"))
        .select(col("grp"), col("n"), round(col("r2_x"), 6).as("r2_x"),
          round(col("r2_z"), 6).as("r2_z"),
          round(col("r2_full"), 6).as("r2_full"),
          round((col("r2_x") + col("r2_full") - col("r2_z")) / lit(2.0), 6)
            .as("shap_x"),
          round((col("r2_z") + col("r2_full") - col("r2_x")) / lit(2.0), 6)
            .as("shap_z"))
    }),

    // Exact 1-D Wasserstein (earth-mover) distance between two customer
    // segments' order-price distributions: W1 = sum over the value
    // domain of |F1 - F2| * gap, kept exact as |cum1*n2 - cum2*n1|
    // integer cross-multiplications; the value-domain prefix runs
    // two-level (4096-wide price buckets -> bounded bucket frame prefix
    // -> within-bucket windows), never a data-sized global sort. The
    // cross-bucket lead(v) patches from the bucket frame's next-bucket
    // minimum.
    "q400_wasserstein" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(col("o_totalprice").as("v"),
          when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("i1"))
      val vc = o.groupBy(col("v"))
        .agg(sum(col("i1")).as("c1"), (count(lit(1)) - sum(col("i1"))).as("c2"))
        .withColumn("b", floor(col("v") / lit(4096.0)).cast("long"))
      val bk = vc.groupBy(col("b")).agg(sum(col("c1")).as("s1"),
        sum(col("c2")).as("s2"), min(col("v")).as("minv"))
      val wb = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)
      val pre = bk
        .withColumn("p1", coalesce(sum(col("s1")).over(wb), lit(0L)))
        .withColumn("p2", coalesce(sum(col("s2")).over(wb), lit(0L)))
      val nxt = bk.select((col("b") - 1).as("b"), col("minv").as("next_minv"))
      val tot = vc.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      val wv = Window.partitionBy(col("b")).orderBy(col("v"))
      val terms = vc
        .join(broadcast(pre.select(col("b"), col("p1"), col("p2"))), Seq("b"))
        .join(broadcast(nxt), Seq("b"), "left")
        .withColumn("cum1", col("p1") + sum(col("c1")).over(
          wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cum2", col("p2") + sum(col("c2")).over(
          wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nv", coalesce(lead(col("v"), 1).over(wv),
          col("next_minv")))
        .crossJoin(broadcast(tot))
        .withColumn("t", when(col("nv").isNotNull,
          round(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))
            .cast("double") * (col("nv") - col("v"))).cast("long"))
          .otherwise(0L))
      terms.agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          sum(col("t")).as("ts"))
        .select(col("n1"), col("n2"),
          round(col("ts").cast("double") /
            (col("n1") * col("n2")).cast("double"), 6).as("w1_distance"))
    }),

    // Empirical-Bayes proportion shrinkage (beta-binomial via method of
    // moments): per-brand lineitem return rates shrink toward the prior
    // fitted from the across-brand rate mean/variance — alpha/beta from
    // closed-form MoM, shrunk = (x + alpha)/(n + alpha + beta). Rates
    // quantize to 1e9/1e12 integers for the two small order-invariant
    // folds; the brand frame is bounded (25 rows).
    "q401_eb_shrinkage" -> ((s, d) => {
      val br = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("x"))
        .withColumn("r", col("x").cast("double") / col("n").cast("double"))
      val mom = br
        .select(col("p_brand"), col("n"), col("x"), col("r"),
          round(col("r") * lit(1e9)).cast("long").as("rq"),
          round(col("r") * col("r") * lit(1e12)).cast("long").as("rrq"))
      val prior = mom.agg(count(lit(1)).as("k"), sum(col("rq")).as("srq"),
          sum(col("rrq")).as("srrq"))
        .select(col("k"),
          (col("srq").cast("double") / col("k").cast("double") / lit(1e9))
            .as("m"),
          (col("srrq").cast("double") / col("k").cast("double") / lit(1e12))
            .as("e2"))
        .select(col("k"), col("m"), (col("e2") - col("m") * col("m")).as("v"))
        .select(col("m"), col("v"),
          (col("m") * (col("m") * (lit(1.0) - col("m")) / col("v") - lit(1.0)))
            .as("alpha"),
          ((lit(1.0) - col("m")) *
           (col("m") * (lit(1.0) - col("m")) / col("v") - lit(1.0)))
            .as("beta"))
      mom.crossJoin(broadcast(prior))
        .select(col("p_brand"), col("n"), col("x"),
          round(col("r"), 6).as("raw_rate"),
          round((col("x").cast("double") + col("alpha")) /
                (col("n").cast("double") + col("alpha") + col("beta")), 6)
            .as("shrunk_rate"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q375_fifo_match" ->
      """WITH li AS (SELECT l_partkey, l_orderkey, l_linenumber, l_returnflag,
                            CAST(l_quantity AS DECIMAL(12,2)) AS q, l_shipdate
                     FROM lineitem),
          sup AS (SELECT l_partkey, l_orderkey AS s_orderkey,
                         l_linenumber AS s_linenumber,
                         sum(q) OVER w - q AS s_lo, sum(q) OVER w AS s_hi
                  FROM li WHERE l_returnflag = 'R'
                  WINDOW w AS (PARTITION BY l_partkey
                               ORDER BY l_shipdate, l_orderkey, l_linenumber
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          dem AS (SELECT l_partkey, l_orderkey AS d_orderkey,
                         l_linenumber AS d_linenumber,
                         sum(q) OVER w - q AS d_lo, sum(q) OVER w AS d_hi
                  FROM li WHERE l_returnflag <> 'R'
                  WINDOW w AS (PARTITION BY l_partkey
                               ORDER BY l_shipdate, l_orderkey, l_linenumber
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT sup.l_partkey, s_orderkey, s_linenumber, d_orderkey, d_linenumber,
                CAST(least(s_hi, d_hi) - greatest(s_lo, d_lo) AS DOUBLE)
                  AS qty_matched
         FROM sup JOIN dem ON sup.l_partkey = dem.l_partkey
         WHERE s_lo < d_hi AND d_lo < s_hi""",

    "q376_waterfall_join" -> {
      val hp = H60("'wfprobe:' || CAST(p_partkey AS VARCHAR)")
      val hm = H60("'wfmangle:' || CAST(p_partkey AS VARCHAR)")
      s"""WITH probes AS (
            SELECT p_partkey AS probe_id,
                   CASE WHEN $hm % 2 = 0 THEN p_name
                        ELSE string_split(p_name, ' ')[-1] END AS probe_name
            FROM part WHERE $hp % 5 = 0),
          by_name AS (SELECT p_name AS k1, min(p_partkey) AS m1
                      FROM part GROUP BY 1),
          by_noun AS (SELECT string_split(p_name, ' ')[-1] AS k2,
                             min(p_partkey) AS m2
                      FROM part GROUP BY 1)
         SELECT probe_id, probe_name,
                coalesce(m1, m2) AS matched_partkey,
                CASE WHEN m1 IS NOT NULL THEN 1
                     WHEN m2 IS NOT NULL THEN 2 ELSE 0 END AS tier
         FROM probes
         LEFT JOIN by_name ON probe_name = k1
         LEFT JOIN by_noun ON string_split(probe_name, ' ')[-1] = k2"""
    },

    "q379_woe_iv" ->
      """WITH j AS (SELECT o_orderpriority, c_mktsegment,
                           month(o_orderdate) AS mo,
                           CAST(o_orderstatus = 'F' AS INT) AS good
                    FROM orders JOIN customer ON o_custkey = c_custkey),
          base AS (
            SELECT 'priority' AS feature, o_orderpriority AS bucket, good FROM j
            UNION ALL SELECT 'segment', c_mktsegment, good FROM j
            UNION ALL SELECT 'month', CAST(mo AS VARCHAR), good FROM j),
          g AS (SELECT feature, bucket, CAST(sum(good) AS BIGINT) AS n_good,
                       CAST(count(*) - sum(good) AS BIGINT) AS n_bad
                FROM base GROUP BY 1, 2),
          tot AS (SELECT feature, CAST(sum(n_good) AS BIGINT) AS gt,
                         CAST(sum(n_bad) AS BIGINT) AS bt
                  FROM g GROUP BY 1),
          w1 AS (SELECT g.feature, bucket, n_good, n_bad, gt, bt,
                        CASE WHEN n_good > 0 AND n_bad > 0 THEN
                          ln(CAST(n_good * bt AS DOUBLE) /
                             CAST(n_bad * gt AS DOUBLE)) END AS woe_raw
                 FROM g JOIN tot USING (feature)),
          w2 AS (SELECT *,
                        coalesce(CAST(round(
                          ((CAST(n_good AS DOUBLE) / CAST(gt AS DOUBLE) -
                            CAST(n_bad AS DOUBLE) / CAST(bt AS DOUBLE))
                           * woe_raw) * 1e9) AS BIGINT), 0) AS termq
                 FROM w1),
          iv AS (SELECT feature, CAST(sum(termq) AS BIGINT) AS ivq
                 FROM w2 GROUP BY 1)
         SELECT w2.feature, bucket, n_good, n_bad,
                ROUND(woe_raw, 6) AS woe,
                ROUND(CAST(ivq AS DOUBLE) / 1e9, 6) AS iv
         FROM w2 JOIN iv USING (feature)""",

    "q380_capped_allocation" ->
      """WITH spend AS (
            SELECT c_custkey, c_nationkey,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))))
                     AS BIGINT) AS s
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2),
          nat AS (SELECT c_nationkey AS nk, CAST(sum(s) AS BIGINT) AS st,
                         CAST(sum(s) AS BIGINT) // 2 AS b
                  FROM spend GROUP BY 1),
          r1 AS (SELECT spend.*, st, b, (b * s) // st AS f1,
                        (b * s) % st AS rem1
                 FROM spend JOIN nat ON c_nationkey = nk),
          d1 AS (SELECT c_nationkey AS dk1,
                        max(b) - CAST(sum(f1) AS BIGINT) AS def1
                 FROM r1 GROUP BY 1),
          a1 AS (SELECT r1.*, def1,
                        f1 + CASE WHEN row_number() OVER
                            (PARTITION BY c_nationkey
                             ORDER BY rem1 DESC, c_custkey) <= def1
                          THEN 1 ELSE 0 END AS al1
                 FROM r1 JOIN d1 ON c_nationkey = dk1),
          e AS (SELECT *, least(al1, 1500000) AS c1,
                       least(al1, 1500000) < 1500000 AS elig
                FROM a1),
          n2 AS (SELECT c_nationkey AS dk2,
                        max(b) - CAST(sum(c1) AS BIGINT) AS sur,
                        CAST(sum(CASE WHEN elig THEN s ELSE 0 END) AS BIGINT)
                          AS s2
                 FROM e GROUP BY 1),
          r2 AS (SELECT e.*, sur, s2,
                        CASE WHEN elig AND s2 > 0 THEN (sur * s) // s2
                             ELSE 0 END AS f2,
                        CASE WHEN elig AND s2 > 0 THEN (sur * s) % s2
                             ELSE -1 END AS rem2
                 FROM e JOIN n2 ON c_nationkey = dk2),
          d2 AS (SELECT c_nationkey AS dk3,
                        max(sur) - CAST(sum(f2) AS BIGINT) AS def2
                 FROM r2 GROUP BY 1),
          fin AS (SELECT r2.*, def2,
                         c1 + f2 + CASE WHEN elig AND row_number() OVER
                             (PARTITION BY c_nationkey
                              ORDER BY rem2 DESC, c_custkey) <= def2
                           THEN 1 ELSE 0 END AS al2
                  FROM r2 JOIN d2 ON c_nationkey = dk3)
         SELECT c_custkey, c_nationkey, s AS spend,
                least(al2, 1500000) AS alloc,
                least(al2, 1500000) = 1500000 AS is_capped
         FROM fin""",

    "q381_periodogram" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                               CAST(sum(CAST(value AS DECIMAL(18,2)))
                                 AS DOUBLE) AS y
                        FROM events GROUP BY 1, 2),
          t AS (SELECT event_type,
                       date_diff('day', DATE '1970-01-01', day) AS t, y
                FROM daily),
          terms AS (
            SELECT event_type, p.period,
                   CAST(round(y * cos((CAST(t % p.period AS DOUBLE)
                       * (2.0 * pi())) / p.period) * 1e6) AS BIGINT) AS cq,
                   CAST(round(y * sin((CAST(t % p.period AS DOUBLE)
                       * (2.0 * pi())) / p.period) * 1e6) AS BIGINT) AS sq
            FROM t, (VALUES (7), (30)) p(period)),
          agg AS (SELECT event_type, period,
                         CAST(count(*) AS BIGINT) AS n_days,
                         CAST(sum(cq) AS BIGINT) AS cqs,
                         CAST(sum(sq) AS BIGINT) AS sqs
                  FROM terms GROUP BY 1, 2)
         SELECT event_type, period, n_days,
                ROUND((CAST(cqs AS DOUBLE) / 1e6 * (CAST(cqs AS DOUBLE) / 1e6)
                     + CAST(sqs AS DOUBLE) / 1e6 * (CAST(sqs AS DOUBLE) / 1e6))
                      / CAST(n_days AS DOUBLE), 6) AS power
         FROM agg""",

    "q382_zonemap_audit" ->
      """WITH o AS (SELECT o_orderkey,
                          year(o_orderdate) * 12 + month(o_orderdate) AS m
                   FROM orders),
          z AS (SELECT 'orderkey_4096' AS layout, o_orderkey // 4096 AS zone,
                       min(m) AS zlo, max(m) AS zhi
                FROM o GROUP BY 2
                UNION ALL
                SELECT 'date_month', m, min(m), max(m) FROM o GROUP BY 2),
          mo AS (SELECT DISTINCT m AS pm FROM o)
         SELECT layout, pm AS pred_month,
                CAST(count(*) AS BIGINT) AS n_zones,
                CAST(sum(CASE WHEN zhi < pm OR zlo > pm THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pruned,
                ROUND(CAST(count(*) -
                        sum(CASE WHEN zhi < pm OR zlo > pm THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS scan_frac
         FROM z, mo GROUP BY 1, 2""",

    "q383_token_bucket" -> {
      val tok = "((acc >> 16) & 7)"
      val tb = s"least(3, $tok + (e - (acc >> 19)) // 4320)"
      val tok2 = s"($tb - CASE WHEN $tb >= 1 THEN 1 ELSE 0 END)"
      val cnt2 = s"((acc & 65535) + CASE WHEN $tb >= 1 THEN 1 ELSE 0 END)"
      s"""WITH seqd AS (
           SELECT user_id,
                  list(CAST(floor(epoch(ts)) AS BIGINT) // 60
                       ORDER BY ts, event_id) AS arr
           FROM events GROUP BY user_id),
          f AS (SELECT user_id, len(arr) AS n,
                       list_reduce(list_prepend(CAST(0 AS BIGINT), arr),
                         (acc, e) -> (((e * 8 + $tok2) << 16) + $cnt2)) AS st
                FROM seqd)
         SELECT user_id, CAST(n AS INT) AS n_events,
                (st & 65535) AS n_accepted,
                n - (st & 65535) AS n_rejected,
                ((st >> 16) & 7) AS tokens_left
         FROM f"""
    },

    "q384_coverage_gaps" ->
      """WITH iv AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS lo,
                            o_orderkey,
                            CAST(o_orderdate AS DATE) + 30 AS hi
                     FROM orders),
          x AS (SELECT o_custkey, lo, hi, o_orderkey,
                       max(hi) OVER (PARTITION BY o_custkey
                                     ORDER BY lo, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS pmax
                FROM iv),
          y AS (SELECT *, CASE WHEN pmax IS NULL OR lo > pmax
                               THEN 1 ELSE 0 END AS newi
                FROM x),
          z AS (SELECT *, sum(newi) OVER (PARTITION BY o_custkey
                                          ORDER BY lo, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS isl
                FROM y),
          isl AS (SELECT o_custkey, isl, min(lo) AS s, max(hi) AS e
                  FROM z GROUP BY 1, 2),
          g AS (SELECT o_custkey, s,
                       lag(e) OVER (PARTITION BY o_custkey ORDER BY isl)
                         AS gap_start
                FROM isl)
         SELECT o_custkey, CAST(gap_start AS VARCHAR) AS gap_start,
                CAST(s AS VARCHAR) AS gap_end,
                CAST(date_diff('day', gap_start, s) AS INT) AS gap_days
         FROM g WHERE gap_start IS NOT NULL""",

    "q385_soundex_blocking" ->
      """SELECT * FROM (VALUES
           ('robert', 'R163'), ('rupert', 'R163'),
           ('ashcraft', 'A261'), ('ashcroft', 'A261'),
           ('tymczak', 'T522'), ('pfister', 'P236'),
           ('honeyman', 'H555'), ('jackson', 'J250'),
           ('jaxon', 'J250'), ('smith', 'S530'), ('smyth', 'S530'),
           ('knight', 'K523'), ('night', 'N230'),
           ('gear', 'G600'), ('ring', 'R520'), ('widget', 'W323')
         ) t(word, code)""",

    "q386_diacritic_match" ->
      """WITH probes AS (SELECT * FROM (VALUES
            ('rïng'), ('gèar'), ('wídget'), ('bólt'), ('gizmò'), ('cáble')
          ) p(probe)),
          c AS (SELECT probe,
                       translate(probe, 'áàâäéèêëíìîïóòôöúùûüçñý',
                                 'aaaaeeeeiiiioooouuuucny') AS clean
                FROM probes),
          bn AS (SELECT string_split(p_name, ' ')[-1] AS noun,
                        min(p_partkey) AS matched_partkey,
                        CAST(count(*) AS BIGINT) AS n_parts
                 FROM part GROUP BY 1)
         SELECT probe, clean, matched_partkey,
                coalesce(n_parts, 0) AS n_parts
         FROM c LEFT JOIN bn ON clean = noun""",

    "q387_fd_repair" -> {
      val h = H60("'fddirty:' || CAST(o_orderkey AS VARCHAR)")
      s"""WITH base AS (
            SELECT o_orderkey, o_custkey,
                   CASE WHEN $h % 20 = 0 THEN (c_nationkey + 1) % 25
                        ELSE c_nationkey END AS observed
            FROM orders JOIN customer ON o_custkey = c_custkey),
          s AS (SELECT o_custkey AS k, observed AS v, count(*) AS c
                FROM base GROUP BY 1, 2),
          m AS (SELECT k, max_by(v, c * 1000000 - v) AS repaired,
                       max_by(c, c * 1000000 - v) AS support
                FROM s GROUP BY 1)
         SELECT o_orderkey, o_custkey, observed, repaired,
                CAST(support AS BIGINT) AS support
         FROM base JOIN m ON o_custkey = k
         WHERE observed <> repaired"""
    },

    "q388_jackknife_se" -> {
      val h = H60("'jk:' || CAST(event_id AS VARCHAR)")
      s"""WITH g AS (
            SELECT $h % 16 AS g,
                   CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS sg,
                   count(*) AS ng
            FROM events GROUP BY 1),
          tot AS (SELECT CAST(sum(sg) AS BIGINT) AS s,
                         CAST(sum(ng) AS BIGINT) AS n FROM g),
          loo AS (SELECT g.*, s, n,
                         CAST(s - sg AS DOUBLE) / CAST(n - ng AS DOUBLE) AS loo
                  FROM g, tot),
          q AS (SELECT *, CAST(round(loo * 1e9) AS BIGINT) AS q FROM loo),
          m AS (SELECT CAST(sum(q) AS BIGINT) AS qb FROM q),
          dev AS (SELECT q.*, CAST(qb AS DOUBLE) / 16.0 / 1e9 AS mean_loo
                  FROM q, m),
          t AS (SELECT *, CAST(round((loo - mean_loo) * (loo - mean_loo)
                  * 1e15) AS BIGINT) AS t
                FROM dev)
         SELECT 16 AS n_groups,
                ROUND(CAST(max(s) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6)
                  AS theta_cents_per_event,
                ROUND(sqrt(15.0 / 16.0 *
                  (CAST(sum(t) AS DOUBLE) / 1e15)), 6) AS jk_se
         FROM t"""
    },

    "q389_hist_percentile_audit" ->
      """WITH li AS (SELECT l_returnflag AS grp, l_extendedprice AS v
                     FROM lineitem),
          mm AS (SELECT grp AS mg, min(v) AS mn, max(v) AS mx,
                        count(*) AS n,
                        (max(v) - min(v)) / 128.0 AS wdt
                 FROM li GROUP BY 1),
          hist AS (SELECT grp, least(CAST(floor((v - mn) / wdt) AS BIGINT),
                            127) AS bin,
                          count(*) AS c, max(mn) AS mn, max(wdt) AS wdt,
                          max(n) AS n
                   FROM li JOIN mm ON grp = mg GROUP BY 1, 2),
          cum AS (SELECT *, sum(c) OVER (PARTITION BY grp ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                  FROM hist),
          cp AS (SELECT *, cum - c AS cum_prev FROM cum),
          est AS (SELECT grp, p,
                         mn + CAST(bin AS DOUBLE) * wdt +
                           (p * CAST(n AS DOUBLE) - CAST(cum_prev AS DOUBLE))
                           / CAST(c AS DOUBLE) * wdt AS est
                  FROM cp, unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                    CAST(0.99 AS DOUBLE)]) t(p)
                  WHERE CAST(cum_prev AS DOUBLE) < p * CAST(n AS DOUBLE)
                    AND p * CAST(n AS DOUBLE) <= CAST(cum AS DOUBLE)),
          counts AS (SELECT grp, v, count(*) AS c FROM li GROUP BY 1, 2),
          cumv AS (SELECT grp, v, c,
                          sum(c) OVER (PARTITION BY grp ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS cum,
                          sum(c) OVER (PARTITION BY grp) AS n
                   FROM counts),
          ps AS (SELECT grp, v, cum - c AS cum_prev, cum, n, p,
                        CAST(n - 1 AS DOUBLE) * p AS h
                 FROM cumv, unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                     CAST(0.99 AS DOUBLE)]) t(p)),
          pos AS (SELECT *, CAST(floor(h) AS BIGINT) AS lo,
                         least(CAST(floor(h) AS BIGINT) + 1, n - 1) AS hi
                  FROM ps),
          exact AS (
            SELECT grp, p,
                   max(CASE WHEN cum_prev <= lo AND lo < cum THEN v END)
                   + (max(h) - floor(max(h))) *
                     (max(CASE WHEN cum_prev <= hi AND hi < cum THEN v END)
                      - max(CASE WHEN cum_prev <= lo AND lo < cum THEN v END))
                     AS exact
            FROM pos
            WHERE (cum_prev <= lo AND lo < cum)
               OR (cum_prev <= hi AND hi < cum)
            GROUP BY grp, p)
         SELECT est.grp, est.p, ROUND(est, 6) AS est, ROUND(exact, 6) AS exact,
                ROUND(abs(est - exact), 6) AS abs_err
         FROM est JOIN exact ON est.grp = exact.grp AND est.p = exact.p""",

    "q390_debounce" ->
      """WITH ev AS (SELECT user_id, event_type,
                            CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
                     FROM events),
          k AS (SELECT user_id, event_type,
                       CASE WHEN lag(sec) OVER (PARTITION BY user_id, event_type
                              ORDER BY sec, event_id) IS NULL
                             OR sec - lag(sec) OVER (PARTITION BY user_id,
                              event_type ORDER BY sec, event_id) > 300
                            THEN 1 ELSE 0 END AS kept
                FROM ev)
         SELECT user_id, event_type, count(*) AS n_raw,
                CAST(sum(kept) AS BIGINT) AS n_kept,
                count(*) - CAST(sum(kept) AS BIGINT) AS n_suppressed
         FROM k GROUP BY 1, 2""",

    "q391_mutual_nn" ->
      """WITH e AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(x AS DOUBLE))
                             AS emb
                    FROM embeddings),
          p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
                       ROUND(list_sum(list_transform(range(1, len(a.emb) + 1),
                           i -> a.emb[CAST(i AS INT)] * b.emb[CAST(i AS INT)]))
                         / (sqrt(list_sum(list_transform(range(1, len(a.emb) + 1),
                             i -> a.emb[CAST(i AS INT)] * a.emb[CAST(i AS INT)])))
                          * sqrt(list_sum(list_transform(range(1, len(b.emb) + 1),
                             i -> b.emb[CAST(i AS INT)] * b.emb[CAST(i AS INT)])))),
                         6) AS c
                FROM e a JOIN e b ON a.vec_id < b.vec_id
                WHERE list_sum(list_transform(range(1, len(a.emb) + 1),
                        i -> a.emb[CAST(i AS INT)] * b.emb[CAST(i AS INT)]))
                      / (sqrt(list_sum(list_transform(range(1, len(a.emb) + 1),
                          i -> a.emb[CAST(i AS INT)] * a.emb[CAST(i AS INT)])))
                       * sqrt(list_sum(list_transform(range(1, len(b.emb) + 1),
                          i -> b.emb[CAST(i AS INT)] * b.emb[CAST(i AS INT)]))))
                      >= 0.35),
          u AS (SELECT ia AS src, ib AS dst, c FROM p
                UNION ALL SELECT ib, ia, c FROM p),
          b AS (SELECT src,
                       max_by(dst, CAST(round(c * 1e6) AS BIGINT) * 100000 - dst)
                         AS best,
                       max_by(c, CAST(round(c * 1e6) AS BIGINT) * 100000 - dst)
                         AS bc
                FROM u GROUP BY 1)
         SELECT b1.src AS id_a, b1.best AS id_b, b1.bc AS cosine
         FROM b b1 JOIN b b2
           ON b1.best = b2.src AND b2.best = b1.src AND b1.src < b1.best""",

    "q392_negative_sampler" -> {
      val h = H60("'neg:' || CAST(j AS VARCHAR)")
      s"""WITH toks AS (SELECT unnest(regexp_split_to_array(lower(trim(text)),
                          '\\s+')) AS tok
                        FROM documents),
          f AS (SELECT tok, count(*) AS freq FROM toks
                WHERE len(tok) > 0 GROUP BY 1 HAVING count(*) >= 5),
          wv AS (SELECT tok, freq,
                        CAST(round(pow(freq, 0.75) * 1000) AS BIGINT) AS w
                 FROM f),
          c AS (SELECT *, coalesce(sum(w) OVER (ORDER BY tok
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cum_lo
                FROM wv),
          t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM wv),
          d AS (SELECT j, $h % tw AS u FROM range(0, 4096) r(j), t),
          a AS (SELECT d.j, c.tok FROM d ASOF JOIN c ON d.u >= c.cum_lo),
          g AS (SELECT tok, count(*) AS n FROM a GROUP BY 1)
         SELECT wv.tok AS token, freq, coalesce(n, 0) AS n_drawn,
                ROUND(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE), 6)
                  AS expected_share
         FROM wv LEFT JOIN g USING (tok), t"""
    },

    "q393_psm_att" ->
      """WITH spend AS (SELECT o_custkey,
                               CAST(sum(CAST(CAST(o_totalprice
                                 AS DECIMAL(18,2)) * 100 AS BIGINT))
                                 AS BIGINT) AS y
                        FROM orders GROUP BY 1),
          units AS (SELECT c_custkey, c_acctbal, y,
                           (c_custkey % 2 = 1) AS treated
                    FROM customer JOIN spend ON c_custkey = o_custkey),
          counts AS (SELECT c_acctbal AS v, count(*) AS c
                     FROM units GROUP BY 1),
          nn AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM counts),
          below AS (SELECT v, sum(c) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
                      AS below
                    FROM counts),
          qd AS (SELECT u.c_custkey,
                        least(9, CAST(floor(ROUND(below / (n - 1), 6) * 10)
                          AS BIGINT)) AS decile
                 FROM units u JOIN below ON u.c_acctbal = below.v, nn),
          ranked AS (SELECT u.*, qd.decile,
                            row_number() OVER (PARTITION BY qd.decile,
                              u.treated
                              ORDER BY u.c_acctbal, u.c_custkey) AS rn
                     FROM units u JOIN qd ON u.c_custkey = qd.c_custkey),
          arms AS (SELECT decile,
                          CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_treated,
                          CAST(sum(CASE WHEN treated THEN 0 ELSE 1 END)
                            AS BIGINT) AS n_control
                   FROM ranked GROUP BY 1),
          p AS (SELECT t.decile, count(*) AS n_pairs,
                       CAST(sum(t.y - c.y) AS BIGINT) AS dsum
                FROM ranked t JOIN ranked c
                  ON t.decile = c.decile AND t.rn = c.rn
                 AND t.treated AND NOT c.treated
                GROUP BY 1)
         SELECT p.decile, n_treated, n_control, n_pairs,
                ROUND(CAST(dsum AS DOUBLE) / CAST(n_pairs AS DOUBLE) / 100.0,
                  6) AS att_dollars
         FROM p JOIN arms USING (decile)""",

    "q394_qini_uplift" ->
      """WITH conv AS (SELECT DISTINCT o_custkey FROM orders
                       WHERE o_orderpriority = '1-URGENT'),
          units AS (SELECT c_custkey, c_acctbal,
                           CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END
                             AS b,
                           (c_custkey % 2 = 1) AS treated
                    FROM customer LEFT JOIN conv ON c_custkey = o_custkey),
          counts AS (SELECT c_acctbal AS v, count(*) AS c
                     FROM units GROUP BY 1),
          nn AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM counts),
          below AS (SELECT v, sum(c) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
                      AS below
                    FROM counts),
          qd AS (SELECT u.c_custkey,
                        least(9, CAST(floor(ROUND(below / (n - 1), 6) * 10)
                          AS BIGINT)) AS decile
                 FROM units u JOIN below ON u.c_acctbal = below.v, nn),
          dec AS (SELECT decile,
                         CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_t,
                         CAST(sum(CASE WHEN NOT treated THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_c,
                         CAST(sum(CASE WHEN treated THEN b ELSE 0 END)
                           AS BIGINT) AS conv_t,
                         CAST(sum(CASE WHEN NOT treated THEN b ELSE 0 END)
                           AS BIGINT) AS conv_c
                  FROM units u JOIN qd ON u.c_custkey = qd.c_custkey
                  GROUP BY 1),
          cum AS (SELECT *,
                         sum(n_t) OVER w AS cnt, sum(n_c) OVER w AS cnc,
                         sum(conv_t) OVER w AS cct,
                         sum(conv_c) OVER w AS ccc
                  FROM dec
                  WINDOW w AS (ORDER BY decile DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT decile, n_t, n_c, conv_t, conv_c,
                ROUND(CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE) -
                      CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6)
                  AS uplift,
                ROUND(CAST(cct AS DOUBLE) - CAST(ccc AS DOUBLE) *
                  (CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE)), 6) AS qini
         FROM cum""",

    "q395_hier_target_encode" ->
      """WITH p AS (SELECT p_type, p_brand,
                           CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) AS cents
                    FROM part),
          cell AS (SELECT p_type, p_brand, count(*) AS n,
                          CAST(sum(cents) AS BIGINT) AS sc
                   FROM p GROUP BY 1, 2),
          typ AS (SELECT p_type AS t, CAST(sum(n) AS BIGINT) AS nt,
                         CAST(sum(sc) AS BIGINT) AS st
                  FROM cell GROUP BY 1),
          gstat AS (SELECT CAST(sum(st) AS DOUBLE) / CAST(sum(nt) AS DOUBLE)
                      AS mg
                    FROM typ),
          typs AS (SELECT t, (CAST(st AS DOUBLE) + 20.0 * mg) /
                             (CAST(nt AS DOUBLE) + 20.0) AS mts
                   FROM typ, gstat)
         SELECT p_type, p_brand, n,
                ROUND((CAST(sc AS DOUBLE) + 20.0 * mts) /
                      (CAST(n AS DOUBLE) + 20.0) / 100.0, 6)
                  AS encoded_dollars
         FROM cell JOIN typs ON p_type = t""",

    "q397_multi_format_consistency" -> {
      val h = H60("'dig:' || CAST(c_custkey AS VARCHAR) || ':' || c_name" +
        " || ':' || CAST(c_nationkey AS VARCHAR) || ':' ||" +
        " CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) || ':' ||" +
        " c_mktsegment")
      s"""WITH dg AS (SELECT count(*) AS n_rows,
                             CAST(sum($h % 1000000000000) AS BIGINT) AS digest
                      FROM customer)
         SELECT f.format, n_rows, digest, true AS matches_parquet
         FROM dg, (VALUES ('parquet'), ('orc'), ('json'), ('csv'))
           f(format)"""
    },

    "q396_textrank_summary" -> {
      val rounds = (1 to 5).map { k =>
        s"""c$k AS (SELECT e.doc, e.dst AS i,
                      CAST(sum(CAST(round(CAST(e.wq AS DOUBLE)
                        / CAST(e.wsum AS DOUBLE) * CAST(p.rq AS DOUBLE))
                        AS BIGINT)) AS BIGINT) AS sc
                    FROM ew e JOIN r${k - 1} p
                      ON e.doc = p.doc AND e.src = p.i
                    GROUP BY 1, 2),
           r$k AS (SELECT r.doc, r.i, r.nd,
                      CAST(round(1.5e8 / CAST(r.nd AS DOUBLE)
                        + CAST(0.85 AS DOUBLE)
                          * CAST(coalesce(c$k.sc, 0) AS DOUBLE))
                        AS BIGINT) AS rq
                   FROM r${k - 1} r LEFT JOIN c$k
                     ON r.doc = c$k.doc AND r.i = c$k.i)"""
      }.mkString(",\n          ")
      s"""WITH chunks AS (
           SELECT doc_id AS doc, CAST(start_tok // 12 AS INT) AS i,
                  array_to_string(toks[CAST(start_tok + 1 AS INT):
                    CAST(start_tok + 12 AS INT)], ' ') AS chunk_text
           FROM (SELECT doc_id, toks,
                        unnest(range(0, len(toks), 12)) AS start_tok
                 FROM (SELECT doc_id,
                              regexp_split_to_array(lower(trim(text)), '\\s+')
                                AS toks
                       FROM documents))),
          tok AS (SELECT doc, i, w
                  FROM (SELECT doc, i,
                               unnest(list_distinct(string_split(chunk_text,
                                 ' '))) AS w
                        FROM chunks)
                  WHERE len(w) > 0),
          sizes AS (SELECT doc, i, count(*) AS sz FROM tok GROUP BY 1, 2),
          inter AS (SELECT a.doc, a.i AS i, b.i AS j, count(*) AS nint
                    FROM tok a JOIN tok b
                      ON a.doc = b.doc AND a.w = b.w AND a.i < b.i
                    GROUP BY 1, 2, 3),
          e0 AS (SELECT inter.doc, inter.i, inter.j,
                        CAST(round(CAST(nint AS DOUBLE)
                          / CAST(si.sz + sj.sz - nint AS DOUBLE) * 1e9)
                          AS BIGINT) AS wq
                 FROM inter
                 JOIN sizes si ON inter.doc = si.doc AND inter.i = si.i
                 JOIN sizes sj ON inter.doc = sj.doc AND inter.j = sj.i),
          e1 AS (SELECT doc, i, j, wq FROM e0 WHERE wq > 0),
          edges AS (SELECT doc, i AS src, j AS dst, wq FROM e1
                    UNION ALL SELECT doc, j, i, wq FROM e1),
          outw AS (SELECT doc, src, CAST(sum(wq) AS BIGINT) AS wsum
                   FROM edges GROUP BY 1, 2),
          ew AS (SELECT e.doc, e.src, e.dst, e.wq, o.wsum
                 FROM edges e JOIN outw o
                   ON e.doc = o.doc AND e.src = o.src),
          nd AS (SELECT doc, count(*) AS nd FROM chunks GROUP BY 1),
          r0 AS (SELECT c.doc, c.i, nd.nd,
                        CAST(round(1e9 / CAST(nd.nd AS DOUBLE)) AS BIGINT)
                          AS rq
                 FROM chunks c JOIN nd ON c.doc = nd.doc),
          $rounds
         SELECT t.doc AS doc_id, t.i AS chunk_idx, CAST(t.rank AS INT) AS rank,
                ROUND(CAST(t.rq AS DOUBLE) / 1e9, 6) AS score, ch.chunk_text
         FROM (SELECT r5.*, row_number() OVER (PARTITION BY doc
                 ORDER BY rq DESC, i) AS rank
               FROM r5) t
         JOIN chunks ch ON t.doc = ch.doc AND t.i = ch.i
         WHERE t.rank <= 2"""
    },

    "q433_partial_regression" ->
      """WITH li AS (SELECT l_returnflag AS grp,
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS y,
                   CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS x,
                   CAST(CAST(l_discount AS DECIMAL(12,2)) AS DOUBLE) AS z
                   FROM lineitem),
          st AS (SELECT grp,
              CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
              CAST(sum(CAST(z AS DECIMAL(18,2))) AS DOUBLE) AS sz,
              CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
              CAST(sum(CAST(round(x * x * 1e4) AS BIGINT)) AS DOUBLE) AS sxxq,
              CAST(sum(CAST(round(z * z * 1e6) AS BIGINT)) AS DOUBLE) AS szzq,
              CAST(sum(CAST(round(y * y) AS BIGINT)) AS DOUBLE) AS syyq,
              CAST(sum(CAST(round(x * y * 1e2) AS BIGINT)) AS DOUBLE) AS sxyq,
              CAST(sum(CAST(round(z * y * 1e4) AS BIGINT)) AS DOUBLE) AS szyq,
              CAST(sum(CAST(round(x * z * 1e6) AS BIGINT)) AS DOUBLE) AS sxzq
                 FROM li GROUP BY 1),
          c AS (SELECT grp, n,
                       n * (sxyq / 1e2) - sx * sy AS cxy,
                       n * (sxzq / 1e6) - sx * sz AS cxz,
                       n * (szyq / 1e4) - sz * sy AS czy,
                       n * (sxxq / 1e4) - sx * sx AS cxx,
                       n * (szzq / 1e6) - sz * sz AS czz,
                       n * syyq - sy * sy AS cyy
                FROM st),
          r AS (SELECT grp, n, cxy, cxz, czy, cxx, czz,
                       cxy / sqrt(cxx * cyy) AS rxy,
                       cxz / sqrt(cxx * czz) AS rxz,
                       czy / sqrt(czz * cyy) AS rzy
                FROM c)
         SELECT grp, CAST(n AS BIGINT) AS n,
                ROUND(cxy / cxx, 6) AS beta_naive,
                ROUND((cxy * czz - cxz * czy) /
                      (cxx * czz - cxz * cxz), 6) AS beta_controlled,
                ROUND((rxy - rxz * rzy) / sqrt((1.0 - rxz * rxz) *
                      (1.0 - rzy * rzy)), 6) AS partial_corr
         FROM r""",

    "q398_shapley_r2" ->
      """WITH li AS (SELECT l_returnflag AS grp,
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS y,
                   CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS x,
                   CAST(CAST(l_discount AS DECIMAL(12,2)) AS DOUBLE) AS z
                   FROM lineitem),
          st AS (SELECT grp,
              CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
              CAST(sum(CAST(z AS DECIMAL(18,2))) AS DOUBLE) AS sz,
              CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
              CAST(sum(CAST(round(x * x * 1e4) AS BIGINT)) AS DOUBLE) AS sxxq,
              CAST(sum(CAST(round(z * z * 1e6) AS BIGINT)) AS DOUBLE) AS szzq,
              CAST(sum(CAST(round(y * y) AS BIGINT)) AS DOUBLE) AS syyq,
              CAST(sum(CAST(round(x * y * 1e2) AS BIGINT)) AS DOUBLE) AS sxyq,
              CAST(sum(CAST(round(z * y * 1e4) AS BIGINT)) AS DOUBLE) AS szyq,
              CAST(sum(CAST(round(x * z * 1e6) AS BIGINT)) AS DOUBLE) AS sxzq
                 FROM li GROUP BY 1),
          cor AS (SELECT grp, n,
              (n * (sxyq / 1e2) - sx * sy) /
                sqrt((n * (sxxq / 1e4) - sx * sx) * (n * syyq - sy * sy))
                AS rxy,
              (n * (szyq / 1e4) - sz * sy) /
                sqrt((n * (szzq / 1e6) - sz * sz) * (n * syyq - sy * sy))
                AS rzy,
              (n * (sxzq / 1e6) - sx * sz) /
                sqrt((n * (sxxq / 1e4) - sx * sx) * (n * (szzq / 1e6)
                  - sz * sz)) AS rxz
                  FROM st),
          r2 AS (SELECT grp, CAST(n AS BIGINT) AS n,
                        rxy * rxy AS r2_x, rzy * rzy AS r2_z,
                        (rxy * rxy + rzy * rzy
                         - 2.0 * rxy * rzy * rxz) / (1.0 - rxz * rxz)
                          AS r2_full
                 FROM cor)
         SELECT grp, n, ROUND(r2_x, 6) AS r2_x, ROUND(r2_z, 6) AS r2_z,
                ROUND(r2_full, 6) AS r2_full,
                ROUND((r2_x + r2_full - r2_z) / 2.0, 6) AS shap_x,
                ROUND((r2_z + r2_full - r2_x) / 2.0, 6) AS shap_z
         FROM r2""",

    "q400_wasserstein" ->
      """WITH o AS (SELECT o_totalprice AS v,
                          CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0
                            END AS i1
                   FROM orders JOIN customer ON o_custkey = c_custkey
                   WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
          vc AS (SELECT v, CAST(sum(i1) AS BIGINT) AS c1,
                        CAST(count(*) - sum(i1) AS BIGINT) AS c2
                 FROM o GROUP BY 1),
          tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                         CAST(sum(c2) AS BIGINT) AS n2 FROM vc),
          c AS (SELECT v, sum(c1) OVER w AS cum1, sum(c2) OVER w AS cum2,
                       lead(v) OVER (ORDER BY v) AS nv
                FROM vc
                WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW)),
          t AS (SELECT n1, n2,
                       CASE WHEN nv IS NOT NULL THEN
                         CAST(round(CAST(abs(cum1 * n2 - cum2 * n1)
                           AS DOUBLE) * (nv - v)) AS BIGINT)
                       ELSE 0 END AS t
                FROM c, tot)
         SELECT n1, n2,
                ROUND(CAST(CAST(sum(t) AS BIGINT) AS DOUBLE) /
                      CAST(n1 * n2 AS DOUBLE), 6) AS w1_distance
         FROM t GROUP BY 1, 2""",

    "q401_eb_shrinkage" ->
      """WITH br AS (SELECT p_brand, count(*) AS n,
                            CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1
                              ELSE 0 END) AS BIGINT) AS x
                     FROM lineitem JOIN part ON l_partkey = p_partkey
                     GROUP BY 1),
          mq AS (SELECT p_brand, n, x,
                        CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS r
                 FROM br),
          mq2 AS (SELECT *, CAST(round(r * 1e9) AS BIGINT) AS rq,
                         CAST(round(r * r * 1e12) AS BIGINT) AS rrq
                  FROM mq),
          pr1 AS (SELECT CAST(count(*) AS BIGINT) AS k,
                         CAST(sum(rq) AS BIGINT) AS srq,
                         CAST(sum(rrq) AS BIGINT) AS srrq
                  FROM mq2),
          pr2 AS (SELECT k, CAST(srq AS DOUBLE) / CAST(k AS DOUBLE) / 1e9
                    AS m,
                         CAST(srrq AS DOUBLE) / CAST(k AS DOUBLE) / 1e12
                    AS e2
                  FROM pr1),
          pr3 AS (SELECT m, e2 - m * m AS v FROM pr2),
          pr AS (SELECT m, v,
                        m * (m * (1.0 - m) / v - 1.0) AS alpha,
                        (1.0 - m) * (m * (1.0 - m) / v - 1.0) AS beta
                 FROM pr3)
         SELECT p_brand, n, x, ROUND(r, 6) AS raw_rate,
                ROUND((CAST(x AS DOUBLE) + alpha) /
                      (CAST(n AS DOUBLE) + alpha + beta), 6) AS shrunk_rate
         FROM mq2, pr"""
  )
}
