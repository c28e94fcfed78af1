package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis._

/** Scratch: stage-level timings for the q525 pipeline. */
object LangProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get(32)
    import spark.implicits._
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"LP $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val fix = graft.queries.TextQueries.langIdCorpus
      .toDF("sid", "lang_expected", "text").select(col("text"))
    val docs = graft.sources.Tables.documents(spark, d).select(col("text"))
    val src = fix.unionByName(docs)
    (1 to 2).foreach { _ =>
      time("detector-only")(
        src.select(languageIdScored(col("text")).as("r"))
          .select(col("r.lang").as("lang")).count())
      time("groupBy")(
        src.select(languageIdScored(col("text")).as("r"))
          .select(col("r.lang").as("lang"))
          .groupBy(col("lang")).agg(count(lit(1)).as("n")).count())
      time("ckpt")(
        src.select(languageIdScored(col("text")).as("r"))
          .select(col("r.lang").as("lang"))
          .groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .localCheckpoint(false).count())
      time("full-q525")(
        graft.SparkEntry.queries("q525_lang_temperature_mix")(spark, d).count())
    }
    spark.stop()
  }
}
