package graft
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.drop(1).toSeq match {
      case Nil => Seq("q01_scan_filter_project", "q14_join_multiway", "q33_percentile",
        "q34_string_index", "q64_deindex", "q57_text_tfidf", "q69_set_pivot", "q74_sim_ivf_topk")
      case xs => xs
    }
    names.foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      // red flags
      val flags = Seq(
        ("CartesianProduct", plan.contains("CartesianProduct")),
        ("SinglePartition exchange", plan.contains("Exchange SinglePartition")))
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode).take(4000))
      flags.filter(_._2).foreach(f => println(s"FLAG: ${f._1}"))
    }
    spark.stop()
  }
}
