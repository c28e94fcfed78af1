package graft

/** Time a single SparkEntry query: `runMain graft.TimeOne <name> <sfDir>`.
  * Same warm-up + best-of-2 protocol as Bench, for iterating on one
  * operator without paying for the whole suite. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    run()
    println(f"TIMEONE $name ${math.min(run(), run())}%.3f sec")
    spark.stop()
  }
}
