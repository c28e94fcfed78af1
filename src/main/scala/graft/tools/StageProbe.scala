package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** The one parameterized attribution probe (VERDICT r10 item 8 — the
  * five one-off scratch mains FuzzyProbe{,2,3} / HitsProbe /
  * LinkageProbe folded into their reusable core, so the next bench
  * attribution doesn't add a sixth). Runs ONE SparkEntry query at one
  * or more sf dirs under the ScaleProbe timing protocol (deepClean
  * between runs, cold-cache numbers), with two opt-ins:
  *
  *   --repeat N   run each dir N times in the same JVM: run 1 is the
  *                cold number (includes any memoized build the
  *                operator amortizes), runs 2+ time the warm residual
  *                (the LinkageProbe protocol that separated q458's
  *                MSF build from its cut+CC share)
  *   --stages     attach a stage listener for the LAST run of the
  *                LAST dir and dump the top stages by executor run
  *                time with shuffle/spill/GC detail (the FuzzyProbe2
  *                protocol that localized q256's AQE-coalesce stall to
  *                one 17s single-task stage)
  *
  * Usage:
  *   sbt "runMain graft.tools.StageProbe q256_fuzzy_join_topk \
  *     /root/testdata/sf0.1 /root/repo/tmp/sf1synth_f10 --repeat 2 --stages"
  *
  * Operator-specific pipeline cuts (timing candidate-gen vs verify vs
  * top-k separately) stay where they belong: a scratch branch of this
  * file, not five committed mains — the committed evidence for past
  * attributions lives in COVERAGE.md's numbers, not the scratch code.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    var repeat = 1
    var stages = false
    val pos = scala.collection.mutable.Buffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--repeat" => repeat = args(i + 1).toInt; i += 2
        case "--stages" => stages = true; i += 1
        case a => pos += a; i += 1
      }
    }
    val query = pos.head
    val dirs = pos.tail.toSeq
    require(dirs.nonEmpty, "pass at least one sf dir")

    val spark = graft.GraftSession.get(
      Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("WARN")

    @volatile var capture = false
    val captured = scala.collection.mutable.Buffer
      .empty[(Int, Long, Long, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (capture) {
          val si = sc.stageInfo
          val wall = (for { a <- si.submissionTime; b <- si.completionTime }
            yield b - a).getOrElse(-1L)
          val m = si.taskMetrics
          captured += ((si.stageId, wall, m.executorRunTime,
            m.memoryBytesSpilled + m.diskBytesSpilled, m.jvmGCTime,
            s"${si.numTasks}t sr=${m.shuffleReadMetrics.totalBytesRead / 1048576}MB" +
              s" sw=${m.shuffleWriteMetrics.bytesWritten / 1048576}MB" +
              s" srec=${m.shuffleReadMetrics.recordsRead}" +
              s" wrec=${m.shuffleWriteMetrics.recordsWritten}"))
        }
    })

    def deepClean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc(); Thread.sleep(250); System.gc(); Thread.sleep(100)
    }

    for ((dir, di) <- dirs.zipWithIndex; r <- 1 to repeat) {
      // cold number per dir: clean before run 1 only, so runs 2+ time
      // the warm residual on top of whatever the operator memoizes
      if (r == 1) deepClean()
      val last = di == dirs.length - 1 && r == repeat
      capture = stages && last
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(query)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      capture = false
      val label = if (r == 1) "cold" else s"warm$r"
      println(f"SP $query $dir $label $sec%.2f s")
    }
    if (stages) {
      captured.sortBy(-_._3).take(20).foreach {
        case (id, wall, rt, spill, gc, detail) =>
          println(f"SPSTAGE $id%5d wall=${wall / 1000.0}%8.2f " +
            f"runTime=${rt / 1000.0}%9.2f spill=${spill / 1048576}%6dMB " +
            f"gc=${gc / 1000.0}%7.2f  $detail")
      }
    }
    spark.stop()
  }
}
