package graft.tools

/** Scratch: separate q458's MSF-build share from its own cut+CC share
  * at two scales — run q458 twice per scale in one JVM: the first run
  * pays the Borůvka build (memo cold), the second reuses the live memo
  * so it times only the k-cut + star-contraction CC. */
object LinkageProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(32)
    spark.sparkContext.setLogLevel("WARN")
    def run(dir: String, label: String): Unit = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q458_single_linkage")(spark, dir).count()
      println(f"LK $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    Seq("/root/testdata/sf0.1" -> "small", "/root/repo/tmp/sf1synth" -> "big")
      .foreach { case (dir, l) =>
        run(dir, s"${l}_cold_incl_build")
        run(dir, s"${l}_warm_cut_cc_only")
        run(dir, s"${l}_warm_cut_cc_only2")
      }
    spark.stop()
  }
}
