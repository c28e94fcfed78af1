package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Scratch: replicate the ScaleProbe protocol for q256 (warm-up small,
  * timed small, timed big) with a stage listener, to localize which
  * stage absorbs the 35s -> 103s inflation that only appears after a
  * prior run in the same JVM. */
object FuzzyProbe2 {
  def main(args: Array[String]): Unit = {
    val small = "/root/testdata/sf0.1"
    val big = "/root/repo/tmp/sf1synth"
    val spark = graft.GraftSession.get(32)
    spark.sparkContext.setLogLevel("WARN")
    @volatile var capture = false
    val stages = scala.collection.mutable.Buffer.empty[(Int, String, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (capture) {
          val si = sc.stageInfo
          val ms = for {
            a <- si.submissionTime; b <- si.completionTime
          } yield b - a
          val m = si.taskMetrics
          stages += ((si.stageId, si.numTasks + "t sr=" +
            (m.shuffleReadMetrics.totalBytesRead / 1048576) + "MB sw=" +
            (m.shuffleWriteMetrics.bytesWritten / 1048576) + "MB srec=" +
            m.shuffleReadMetrics.recordsRead + " wrec=" +
            m.shuffleWriteMetrics.recordsWritten,
            ms.getOrElse(-1L), m.executorRunTime,
            m.memoryBytesSpilled + m.diskBytesSpilled,
            m.jvmGCTime))
        }
    })
    def deepClean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc(); Thread.sleep(250); System.gc(); Thread.sleep(100)
    }
    def run(dir: String): Double = {
      deepClean()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q256_fuzzy_join_topk")(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"FP2 warmup_small ${run(small)}%.2f")
    println(f"FP2 timed_small ${run(small)}%.2f")
    capture = true
    println(f"FP2 timed_big ${run(big)}%.2f")
    capture = false
    stages.sortBy(-_._4).foreach { case (id, name, wall, rt, spill, gc) =>
      println(f"FP2STAGE $id%5d wall=${wall / 1000.0}%8.2f runTime=${rt / 1000.0}%9.2f spill=${spill / 1048576}%6dMB gc=${gc / 1000.0}%7.2f  $name")
    }
    spark.stop()
  }
}
