package graft

/** Time a list of SparkEntry queries in one JVM with the Bench protocol
  * (clearCache between, best-of-2): `runMain graft.Profile <sfDir> <name>...`.
  * For iterating on slow queries without paying full-suite cost. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      spark.catalog.clearCache()
      val a = run(n); val b = run(n)
      spark.catalog.clearCache()
      println(f"PROFILE $n%-28s a=$a%7.2f b=$b%7.2f min=${math.min(a, b)}%7.2f")
    }
    spark.stop()
  }
}
