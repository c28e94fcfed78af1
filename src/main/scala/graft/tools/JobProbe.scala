package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import graft.{GraftSession, SparkEntry}

/** Per-query job/stage/task accounting: warm-up pass, then one timed
  * run with a listener counting jobs, stages, tasks, and summed
  * executor run time. The wall-vs-taskTime ratio separates "driver
  * cadence" (wall >> taskTime) from "recompute blowup"
  * (taskTime >> expected) — the attribution tool for iterative
  * operators. Usage: runMain graft.tools.JobProbe <query> <sfDir> */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTime = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) taskTime.addAndGet(t.taskMetrics.executorRunTime)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // EXACTLY the Bench/TimeOne protocol: warm-up, deep clean, then a
    // best-of-2 pair with NO clean inside the pair (identical-plan
    // persist reuse across the pair is the declared steady-state).
    // Metrics are reported for each of the two runs separately so cold
    // (run a) and steady-state (run b) costs are both visible.
    def deepClean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc(); Thread.sleep(250); System.gc(); Thread.sleep(100)
    }
    SparkEntry.queries(name)(spark, sfDir).count() // warm-up
    deepClean()
    def timed(tag: String): Double = {
      // drain the listener bus (unpersist/cleanup jobs from deepClean)
      // BEFORE zeroing, so background work between timed() calls does
      // not leak into this run's attribution
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); taskTime.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      println(f"JOBPROBE $name $tag wall=$wall%.2f s jobs=${jobs.get} " +
        f"stages=${stages.get} tasks=${tasks.get} taskTime=${taskTime.get / 1000.0}%.1f s")
      wall
    }
    val a = timed("runA")
    val b = timed("runB")
    println(f"JOBPROBE $name best=${math.min(a, b)}%.2f s")
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
