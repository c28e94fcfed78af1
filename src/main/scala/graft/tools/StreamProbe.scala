package graft.tools

/** Scratch profiler: per-micro-batch durations for a streaming gate
  * query, to find the fixed-overhead floor. Not part of any gate. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q85_stream_interval_join")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.get(32)
    val buf = scala.collection.mutable.Buffer.empty[String]
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        buf += e.progress.json
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    (1 to 2).foreach { pass =>
      buf.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, d).count()
      println(f"PROBE_TOTAL pass=$pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Thread.sleep(500)
      buf.foreach(j => println("PROBE_BATCH " + j))
    }
    spark.stop()
  }
}
