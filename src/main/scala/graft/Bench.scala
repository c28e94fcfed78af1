package graft

import java.io.File
import java.lang.management.ManagementFactory
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import scala.sys.process.{Process, ProcessLogger}

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * SHARDED: a single resident JVM running 500+ queries inflates
  * mid-suite timings 2-3x vs a fresh JVM (measured r6: q159 9.9 s
  * in-suite vs 3.2 s standalone) — whole-stage-codegen cache churn,
  * accumulated streaming state stores, and old-gen residue outlive any
  * amount of in-process cleanup. So the parent process spawns one child
  * JVM per ~32-query shard (same classpath + JVM flags as itself),
  * each child runs the TimeOne protocol (1 warm-up + best-of-2) for
  * its slice, and the parent merges the partial JSONs into the single
  * line the driver reads. JVM/session startup stays OUTSIDE the timed
  * region, so per-query numbers now represent query cost, not suite
  * position.
  *
  * Why warm-up at all: pass 0 warms codegen compilation, parquet footer
  * caches, shuffle machinery, and JIT — on a long-lived cluster the warm
  * path is the representative one, and at 100 TB the one-time codegen
  * cost is noise while at 600k rows it dominates 10:1.
  */
object Bench {
  private val ShardMarker = "GRAFT_SHARD_RESULT "

  def main(args: Array[String]): Unit = {
    if (args.length >= 2 && args(0) == "--shard")
      shardMain(args(1), args(2).split(",").toIndexedSeq)
    else parentMain()
  }

  /** Time a slice of queries in THIS JVM: warm-up pass, then best-of-2
    * steady-state (min is the least-biased proxy under local-mode GC /
    * scheduler noise). Identical to the TimeOne protocol. */
  private def timeQueries(names: Seq[String], sfDir: String): Seq[(String, Double)] = {
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    // Between-query cleanup, OUTSIDE the timed region: clearCache alone
    // is not enough — localCheckpoint blocks, ML broadcasts and
    // streaming state-store maps are reclaimed by the ContextCleaner
    // only when a GC notices the dropped references, and the cleaner
    // then drains its queue ASYNCHRONOUSLY; without the short pause the
    // unpersist RPC storm overlaps the next timed query.
    def deepClean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      Thread.sleep(250)
      System.gc()
      Thread.sleep(100)
    }
    // Warm-up pass OVERLAPPED (guide §2.6): the cold pass is untimed
    // but real wall — Janino codegen compilation + first-touch JIT made
    // it ~half of every shard's wall clock (r11's full suite overran
    // the driver's timeout, BENCH_r11.json rc=124). Spark schedules
    // concurrent jobs FIFO with back-fill, so 4 driver threads keep the
    // cores busy through each query's single-task cold stages. Queries
    // are independent (distinct names, per-query temp/output dirs); the
    // pool fully drains and a deep clean runs BEFORE any timed run, so
    // the timed protocol (sequential best-of-2 pairs) is unchanged.
    // Per-query clearCache is skipped in concurrent mode — it would
    // yank another in-flight query's blocks (incl. truncated-lineage
    // localCheckpoints, which cannot recompute); the post-pool
    // deepClean releases everything at once.
    val warmThreads = sys.env.get("SPARK_GRAFT_WARM_THREADS").map(_.toInt).getOrElse(4)
    if (warmThreads <= 1) {
      names.foreach { n => runOne(n); spark.catalog.clearCache() }
    } else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(warmThreads)
      names.foreach { n =>
        pool.submit(new Runnable { def run(): Unit = { runOne(n); () } }); ()
      }
      pool.shutdown()
      pool.awaitTermination(30, java.util.concurrent.TimeUnit.MINUTES)
      ()
    }
    deepClean()
    // Deep clean BETWEEN pairs but not within one — identical-plan
    // persist() reuse across the two runs is steady-state behavior.
    val results = names.map { n =>
      val a = runOne(n); val b = runOne(n)
      deepClean()
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    spark.stop()
    results
  }

  private def toJson(results: Seq[(String, Double)]): String =
    results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  /** Child entry: time the given names, print a marker-prefixed partial
    * JSON the parent greps out of the child's stdout. */
  private def shardMain(sfDir: String, names: Seq[String]): Unit = {
    val results = timeQueries(names, sfDir)
    println(ShardMarker + toJson(results))
  }

  /** Parent entry: spawn one child per shard with this JVM's own
    * classpath and flags (so -Xmx/-Xss/--add-opens/codegen-cache sizing
    * all carry over), merge partials, print the driver's single line. */
  private def parentMain(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_ONLY=qa,qb: local-iteration filter; driver never sets it
    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq.filter(SparkEntry.queries.contains))
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    // 24 (not 32): with ~565 queries the bin count must stay ahead of
    // the ~20 queries costing >4s, or LPT is forced to co-shard two
    // heavies into one child JVM (measured: q347 5.7s solo -> 11.2s
    // co-sharded). Startup of the extra children is outside the timed
    // region, so smaller shards only cost untimed wall.
    val shardSize = sys.env.get("SPARK_GRAFT_SHARD").map(_.toInt).getOrElse(24)
    val javaBin = new File(new File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val classpath = System.getProperty("java.class.path")
    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala.toVector
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    // value group must admit '-' inside exponents (7.5E-4) or a
    // sub-millisecond timing truncates to "7.5E" and .toDouble throws
    val numberRe = """"([^"]+)":(-?[0-9.]+(?:[eE][+-]?[0-9]+)?)""".r
    val merged = mutable.LinkedHashMap.empty[String, Double]
    val failedShards = mutable.Buffer.empty[Seq[String]]

    // Cost-balanced shard packing (LPT greedy): name-order grouping
    // co-shards the expensive graph/rerank queries (r7: q451 read 1.46x
    // its standalone time next to two graph heavies — shared-JVM codegen
    // cache + old-gen pressure). Seed per-query costs from local bench
    // snapshots in cwd (or SPARK_GRAFT_COSTS), sort heaviest first, and
    // drop each query into the cheapest not-yet-full shard — heavies
    // land one per shard. Unknown queries get the median cost; no
    // snapshot at all degrades to balanced-but-arbitrary packing, which
    // is still never worse than name order. Deterministic: cost ties
    // break on name, bin ties on index.
    //
    // MIN across ALL historical snapshots (plus their recorded solo
    // remeasurements), not the newest one: validating against the
    // newest snapshot lets an inflated row become its own expected cost
    // the next round and ratchet upward unchallenged (r10 shipped q305
    // at 4.65s because the mid-round snapshot had already absorbed a
    // 1.34x-inflated value that sat under the 1.5x threshold). The
    // best-known historical cost is the honest yardstick: a row can
    // only escape solo revalidation by actually being fast.
    val costs: Map[String, Double] = {
      val soloRe = """"(q[^"]+)":\{"in_suite":[0-9.eE+-]+,"solo":([0-9.eE+-]+)\}""".r
      val files: Seq[File] = sys.env.get("SPARK_GRAFT_COSTS")
        .map(p => Seq(new File(p)))
        .getOrElse(Option(new File(".").listFiles()).getOrElse(Array.empty[File])
          .filter(_.getName.matches("BENCH_local_r\\d+\\.json")).toSeq)
      val perFile = files.filter(_.isFile).flatMap { f =>
        try {
          val txt = new String(java.nio.file.Files.readAllBytes(f.toPath))
          val plain = numberRe.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2).toDouble)
            .filter { case (k, v) => k.startsWith("q") && v >= 0 }
          val solos = soloRe.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2).toDouble).filter(_._2 >= 0)
          (plain ++ solos).toSeq
        } catch { case _: Throwable => Seq.empty[(String, Double)] }
      }
      perFile.groupMapReduce(_._1)(_._2)(math.min)
    }
    val knownCosts = names.flatMap(costs.get).sorted
    val defaultCost =
      if (knownCosts.isEmpty) 0.3 else knownCosts(knownCosts.size / 2)
    def costOf(n: String): Double = costs.getOrElse(n, defaultCost)
    val nBins = math.max(1, math.ceil(names.size.toDouble / shardSize).toInt)
    val bins = Array.fill(nBins)(mutable.Buffer.empty[String])
    val binCost = Array.fill(nBins)(0.0)
    names.sortBy(n => (-costOf(n), n)).foreach { n =>
      val open = bins.indices.filter(bins(_).size < shardSize)
      val i = open.minBy(binCost)
      bins(i) += n; binCost(i) += costOf(n)
    }
    val shards = bins.toSeq.filter(_.nonEmpty).map(_.toSeq)

    // Spawn one child JVM for `shard`, return its per-query numbers
    // (None if the child died — caller decides how to recover).
    def runShardChild(shard: Seq[String]): Option[Map[String, Double]] = {
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", classpath, "graft.Bench", "--shard", sfDir, shard.mkString(","))
      var partial: Option[String] = None
      val logger = ProcessLogger(
        out => if (out.startsWith(ShardMarker)) partial = Some(out.stripPrefix(ShardMarker))
               else if (out.nonEmpty) System.err.println(out),
        err => System.err.println(err))
      val rc = try Process(cmd).!(logger) catch { case _: Throwable => -1 }
      partial.filter(_ => rc == 0).map { json =>
        numberRe.findAllMatchIn(json)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }

    shards.zipWithIndex.foreach { case (shard, i) =>
      runShardChild(shard) match {
        case Some(found) =>
          shard.foreach(n => merged(n) = found.getOrElse(n, -1.0))
          System.err.println(s"[bench] shard ${i + 1}/${shards.size}: ${shard.size} queries, " +
            f"${found.values.filter(_ >= 0).sum}%.1f s")
        case None =>
          System.err.println(s"[bench] shard ${i + 1} FAILED, will retry inline")
          failedShards += shard
      }
    }
    // Fallback: any shard whose child died runs inline in this JVM so
    // the driver still gets a number for every query.
    if (failedShards.nonEmpty)
      timeQueries(failedShards.flatten.toSeq, sfDir).foreach { case (n, v) => merged(n) = v }

    // Post-run validation (machine check, replaces hand-picked spot
    // sets): any row that came out >1.5x its LPT-expected cost is
    // suspect — the r9 snapshot shipped a 3.95x co-shard phantom
    // (q256 10.2s vs 2.6s solo) exactly because nothing audited rows
    // after the merge. Each flagged row is re-measured SOLO in a fresh
    // child JVM (a 1-query shard = the TimeOne protocol with zero
    // co-shard interference) and the solo number substitutes the
    // in-suite one. Rows with no prior cost (new queries) validate
    // against the default, so a new heavy gets one confirming solo run
    // rather than a free pass. Sub-0.5s rows are skipped: the child
    // protocol floor is ~0.26-0.30s, so small absolute wobble there is
    // noise, not co-shard inflation.
    val revalidated = mutable.LinkedHashMap.empty[String, (Double, Double)]
    // Bounded: under shared-box load MANY rows can drift past 1.5x at
    // once; re-measure the worst few by absolute inflation rather than
    // letting the validation pass itself dominate the wall clock. If
    // the cap truncates, the snapshot SAYS so (validated:false +
    // validation_truncated count) instead of presenting partially
    // validated numbers as fully validated.
    // Cap 8 (was 24): each solo child is a fresh JVM+session (~15 s) +
    // 3 runs of the query — at 24 the validation pass alone cost up to
    // ~12 min and pushed the r11 full-suite wall past the driver's
    // timeout (BENCH_r11.json rc=124). 8 bounds it to ~3 min while
    // still covering every row whose absolute inflation matters; the
    // truncation count keeps the record honest.
    val valMax = sys.env.get("SPARK_GRAFT_VALIDATE_MAX").map(_.toInt).getOrElse(8)
    val allSuspects = names.filter { n =>
      val v = merged.getOrElse(n, -1.0)
      v > 0.5 && v > 1.5 * costOf(n)
    }.sortBy(n => costOf(n) - merged(n))
    val suspects = allSuspects.take(valMax)
    val truncated = allSuspects.size - suspects.size
    if (suspects.nonEmpty)
      System.err.println(s"[bench] validating ${suspects.size}/${allSuspects.size} rows >1.5x expected: ${suspects.mkString(",")}")
    suspects.foreach { n =>
      runShardChild(Seq(n)).flatMap(_.get(n)).filter(_ >= 0).foreach { solo =>
        val suite = merged(n)
        System.err.println(f"[bench] $n: in-suite $suite%.2f s -> solo $solo%.2f s")
        revalidated(n) = (suite, solo)
        // the solo number substitutes UNCONDITIONALLY: a fresh 1-query
        // child is the stated interference-free protocol, and keeping
        // min(suite, solo) would make flagged rows best-of-two samples
        // while every other row is single-sampled
        merged(n) = solo
      }
    }

    val ordered = names.map(n => n -> merged.getOrElse(n, -1.0))
    val total = ordered.map(_._2).filter(_ >= 0).sum
    val revalJson = revalidated.map { case (n, (suite, solo)) =>
      f""""$n":{"in_suite":$suite%.3f,"solo":$solo%.3f}"""
    }.mkString("{", ",", "}")
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","validated":${truncated == 0},"validation_truncated":$truncated,"revalidated":$revalJson,"queries":${toJson(ordered)},"sf":"$sfDir"}"""
    // Full snapshot -> file (the committed BENCH_local_r*.json record)
    // AND stdout for interactive runs; the driver's stdout capture keeps
    // only a ~2KB tail, which truncated the 570-query line every round
    // ("parsed": null in BENCH_r*.json). So the LAST line printed is a
    // compact summary — totals + the 25 costliest queries — that fits
    // the tail whole and parses.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_local_latest.json"), fullJson + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] snapshot write failed: $e") }
    println(fullJson)
    val top = ordered.filter(_._2 >= 0).sortBy(-_._2).take(25)
    Console.out.flush()
    println(s"""{"metric":"total","value":$total,"unit":"sec","validated":${truncated == 0},"n_queries":${ordered.size},"queries":${toJson(top)},"full_snapshot":"BENCH_local_latest.json","sf":"$sfDir"}""")
    Console.out.flush()
  }
}
