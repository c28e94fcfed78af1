package graft

/** Time queries with the exact Bench pair protocol (cold run a, then
  * run b which may re-hit run a's persisted frames), printing both
  * times: `runMain graft.ColdTime <sfDir> <name> [<name>...]`. */
object ColdTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    args.tail.foreach { n =>
      run(n) // warm-up (JIT/codegen)
      spark.catalog.clearCache()
      val a = run(n); val b = run(n)
      spark.catalog.clearCache()
      println(f"COLDTIME $n a=$a%.3f b=$b%.3f min=${math.min(a, b)}%.3f sec")
    }
    spark.stop()
  }
}
