package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: stage-level timing of q325 (HITS) — edge build vs the
  * per-iteration join/norm/checkpoint cadence. */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get(32)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"HP $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val trade = broadcast(graft.sources.Tables.orders(spark, d)
        .select(col("o_orderkey"), col("o_custkey")))
      .join(graft.sources.Tables.lineitem(spark, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + 1000000L).as("dst"))
    // warm-up: full query once
    time("full_warm")(graft.SparkEntry.queries("q325_hits")(spark, d).count())
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    val e = trade.select(col("src"), col("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("edge_build")(println("HP edges=" + e.count()))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    time("nodes")(println("HP nodes=" + nodes.count()))
    val hub = nodes.withColumn("h", lit(1.0))
    val dec9 = (c: org.apache.spark.sql.Column) => round(c, 9).cast("decimal(38,9)")
    val a1 = e.join(hub, col("src") === col("node"))
      .groupBy(col("dst").as("node"))
      .agg(sum(dec9(col("h"))).cast("double").as("a"))
    val an = nodes.join(a1, Seq("node"), "left")
      .select(col("node"), coalesce(col("a"), lit(0.0)).as("a"))
    val na = an.agg(sqrt(sum(dec9(col("a") * col("a"))).cast("double")).as("na"))
    time("one_half_iter")(println("HP auth=" +
      an.crossJoin(broadcast(na))
        .select(col("node"), (col("a") / col("na")).as("a"))
        .localCheckpoint(false).count()))
    time("full_again")(graft.SparkEntry.queries("q325_hits")(spark, d).count())
    spark.stop()
  }
}
