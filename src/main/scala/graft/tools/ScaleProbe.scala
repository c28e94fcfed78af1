package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale probe: synthesizes a `factor`× copy of an sf
  * directory (key-shifted unions so PK/FK relationships and join
  * fan-outs are preserved, text/vector payloads made distinct per
  * copy), times each requested query at both scales under one
  * protocol, and prints a JSON line with the per-query scaling
  * exponent log(t_big/t_small)/log(factor).
  *
  * n·log n growth reads as exponent ~1.05-1.1 at factor 10 on these
  * row counts, so the COVERAGE table flags anything above ~1.2 as
  * worse-than-linearithmic (and anything near 2 as quadratic).
  *
  *   sbt "runMain graft.tools.ScaleProbe /root/testdata/sf0.1 \
  *     /root/repo/tmp/sf1synth 10 q321_er_pipeline q347_set_cover_greedy"
  *
  * Timing protocol (same for both scales, so the RATIO is the
  * measurement): one untimed warm-up at the SMALL scale only (warms
  * codegen + JIT, which are scale-independent), then one timed run
  * per scale with the bench's deepClean between. Each timed number is
  * a fresh cold-cache run; JVM/session startup is outside the timed
  * region.
  */
object ScaleProbe {

  /** Bump when synthesize() changes shape, so cached corpora regenerate. */
  private val SynthVersion = 2

  /** Shift an id column into copy i's disjoint key space. */
  private def shifted(c: String, i: Int, stride: Long) =
    (col(c) + lit(i.toLong * stride)).as(c)

  private def synthesize(spark: SparkSession, src: String, out: String,
                         factor: Int): Unit = {
    val fs = java.nio.file.Paths.get(out)
    val marker = fs.resolve("_SYNTH_OK")
    // The marker records the factor AND a generator version; reuse the
    // cached corpus only when both match the current request — a stale
    // corpus (different factor, or synthesized by an older generator)
    // would silently time the wrong data and report a wrong exponent.
    if (java.nio.file.Files.exists(marker)) {
      val stored = new String(java.nio.file.Files.readAllBytes(marker)).trim
      if (stored == s"$factor v$SynthVersion") return
      System.err.println(s"PROBE stale synth marker '$stored' != '$factor v$SynthVersion' — regenerating $out")
    }
    java.nio.file.Files.createDirectories(fs)
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.coalesce(8).write.mode("overwrite").parquet(s"$out/$t.parquet")
    // strides: one disjoint key range per copy
    def strideOf(df: DataFrame, k: String): Long =
      df.agg(max(col(k))).head.getLong(0) + 1L
    val cust = read("customer"); val C = strideOf(cust, "c_custkey")
    val ord = read("orders"); val O = strideOf(ord, "o_orderkey")
    val part = read("part"); val P = strideOf(part, "p_partkey")
    val li = read("lineitem")
    val docs = read("documents"); val D = strideOf(docs, "doc_id")
    val emb = read("embeddings"); val V = strideOf(emb, "vec_id")
    val ev = spark.read.parquet(s"$src/events.parquet")
    val E = ev.agg(max(col("event_id"))).head.getLong(0) + 1L
    val U = ev.agg(max(col("user_id"))).head.getLong(0) + 1L
    def copies(mk: Int => DataFrame): DataFrame =
      (0 until factor).map(mk).reduce(_.unionByName(_))
    write(copies(i => cust.select(shifted("c_custkey", i, C), col("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))), "customer")
    write(copies(i => ord.select(shifted("o_orderkey", i, O),
      shifted("o_custkey", i, C), col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority"))), "orders")
    write(copies(i => li.select(shifted("l_orderkey", i, O),
      shifted("l_partkey", i, P), col("l_suppkey"), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), col("l_returnflag"), col("l_linestatus"),
      col("l_shipdate"))), "lineitem")
    // part: salt p_name tokens per copy (same pattern as documents) —
    // the fixture's vocabulary is ~64 names, so an unsalted 10x corpus
    // pushes EVERY token past the fuzzy-join hot-token cap and candidate
    // generation empties, yielding meaningless negative exponents for
    // q256/q159. Salting grows the vocabulary with the corpus, the shape
    // a real 10x catalog has. Copy 0 keeps the original bytes.
    write(copies { i =>
      val nm = if (i == 0) col("p_name")
        else regexp_replace(col("p_name"), "(\\S+)", s"$$1x$i")
      part.select(shifted("p_partkey", i, P), nm.as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
    }, "part")
    // documents: per-copy word salt makes every shingle distinct across
    // copies — a 10x corpus, not a 10x-duplicated corpus (which would
    // measure a different, pathological workload for the dedup/blocking
    // plans). Copy 0 is the original bytes.
    write(copies { i =>
      val t = if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"$$1x$i")
      docs.select(shifted("doc_id", i, D), t.as("text"), col("lang"),
        col("source"), col("n_chars"))
    }, "documents")
    // embeddings: deterministic per-copy rotation-ish perturbation on
    // one dimension keeps the distribution while making points distinct
    write(copies { i =>
      val e = if (i == 0) col("embedding")
        else transform(col("embedding"), (x, j) =>
          when(j === i % 64, x + lit(i.toFloat / 1000f)).otherwise(x))
      emb.select(shifted("vec_id", i, V), e.as("embedding"), col("label"))
    }, "embeddings")
    write(copies(i => ev.select(shifted("event_id", i, E), col("ts"),
      shifted("user_id", i, U), col("event_type"), col("value"),
      col("props"))), "events")
    Seq("region", "nation", "supplier").foreach { t =>
      write(read(t), t)
    }
    java.nio.file.Files.write(marker,
      java.util.Arrays.asList(s"$factor v$SynthVersion"))
  }

  private def deepClean(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    System.gc(); Thread.sleep(250); System.gc(); Thread.sleep(100)
  }

  /** Usage: ScaleProbe <srcDir> <outBase> <factor[,factor2,...]> <q...>
    *
    * One factor reproduces the original behavior (corpus at <outBase>
    * when it already carries a matching marker, else <outBase>_f<N>).
    * Several ascending factors (e.g. "10,30") additionally report the
    * PIECEWISE exponent between consecutive factors — the second-decade
    * number that exposes a knee a single-decade exponent hides
    * (broadcast thresholds, driver-side bounds, checkpoint pressure all
    * shift with another decade of data). */
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factors = args(2).split(",").map(_.trim.toInt).toSeq.sorted
    val names = args.drop(3).toSeq
    require(names.nonEmpty, "pass query names")
    require(factors.nonEmpty && factors.forall(_ > 1), s"bad factors: $factors")
    val spark = graft.GraftSession.builder(
      Runtime.getRuntime.availableProcessors()).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // reuse <outBase> verbatim when it already holds this factor's
    // corpus (the pre-multi-factor layout); otherwise suffix per factor
    def dirFor(f: Int): String = {
      val marker = java.nio.file.Paths.get(out).resolve("_SYNTH_OK")
      val legacyOk = java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker)).trim == s"$f v$SynthVersion"
      if (legacyOk) out else s"${out}_f$f"
    }
    val dirs = factors.map(f => f -> dirFor(f))
    dirs.foreach { case (f, d) => synthesize(spark, src, d, f) }
    def timeOne(name: String, dir: String): Double = {
      deepClean(spark)
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, dir).count()
      catch { case e: Throwable =>
        System.err.println(s"PROBE FAIL $name@$dir: ${e.getClass.getSimpleName}: ${e.getMessage}")
        return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    def expOf(tA: Double, tB: Double, ratio: Double): Double =
      if (tA > 0 && tB > 0) math.log(tB / tA) / math.log(ratio) else Double.NaN
    def j(d: Double): String = if (d.isNaN) "null" else f"$d%.3f"
    val rows = names.map { n =>
      // scale-independent warm-up (codegen/JIT) at the small scale
      timeOne(n, src)
      val tSmall = timeOne(n, src)
      val tBig = dirs.map { case (f, d) => f -> timeOne(n, d) }
      val overall = tBig.map { case (f, t) => f -> expOf(tSmall, t, f) }
      val piecewise = tBig.sliding(2).collect {
        case Seq((f1, t1), (f2, t2)) =>
          (f1, f2, expOf(t1, t2, f2.toDouble / f1))
      }.toSeq
      val msg = tBig.map { case (f, t) => f"f$f=$t%.2f" }.mkString(" ") + " " +
        overall.map { case (f, e) => f"exp$f=$e%.2f" }.mkString(" ") +
        piecewise.map { case (a, b, e) => f" exp${a}_$b=$e%.2f" }.mkString
      System.err.println(f"PROBE $n small=$tSmall%.2f $msg")
      (n, tSmall, tBig, overall, piecewise)
    }
    val json = rows.map { case (n, s0, ts, ov, pw) =>
      val tsJ = ts.map { case (f, t) => f""""t_f$f":${j(t)}""" }.mkString(",")
      val ovJ = ov.map { case (f, e) => f""""exp_f$f":${j(e)}""" }.mkString(",")
      val pwJ = pw.map { case (a, b, e) => f""""exp_f${a}_f$b":${j(e)}""" }.mkString(",")
      s""""$n":{"t_small":${j(s0)},$tsJ,$ovJ${if (pwJ.nonEmpty) "," + pwJ else ""}}"""
    }.mkString("{\"factors\":[" + factors.mkString(",") + "],\"small\":\"" + src + "\",\"queries\":{", ",", "}}")
    println("SCALE_PROBE " + json)
    spark.stop()
  }
}
