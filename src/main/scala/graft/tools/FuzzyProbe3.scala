package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch: A/B variants of the q256 tail (distinct + verify + topk)
  * to localize the fused-stage slowdown at the 10x corpus. */
object FuzzyProbe3 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/tmp/sf1synth")
    val spark = graft.GraftSession.get(32)
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextAnalysis.tokens
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"FP3 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def deepClean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc(); Thread.sleep(250)
    }
    val part = graft.sources.Tables.part(spark, d)
    val minJaccard = 0.5
    val maxTokenDocFreq = 10000

    def build(): (DataFrame, DataFrame, DataFrame) = {
      val c = part.where(col("p_partkey") % 2 === 0)
        .select(col("p_partkey").as("canon_id"),
          array_distinct(tokens(col("p_name"))).as("ct"))
        .where(size(col("ct")) > 0)
      val p = part.where(col("p_partkey") % 20 === 1)
        .select(col("p_partkey").as("probe_id"),
          array_distinct(tokens(col("p_name"))).as("pt"))
        .where(size(col("pt")) > 0)
      val dfTab = c.select(explode(col("ct")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("df_t"))
      def prefixTok(side: DataFrame, id: String, arr: String) = {
        val t = minJaccard
        side.select(col(id), explode(col(arr)).as("tok"), size(col(arr)).as("n"))
          .join(dfTab, Seq("tok"), "left")
          .select(col(id), col("n"), col("tok"),
            coalesce(col("df_t"), lit(0L)).as("df_t"))
          .where(col("df_t") <= maxTokenDocFreq)
          .groupBy(col(id), col("n"))
          .agg(array_sort(collect_list(struct(col("df_t"), col("tok")))).as("o"))
          .select(col(id),
            explode(slice(col("o"), lit(1),
              (col("n") - ceil(col("n") * t) + 1).cast("int"))).as("s"))
          .select(col(id), col("s.tok").as("tok"))
      }
      val candsRaw = prefixTok(p, "probe_id", "pt")
        .join(prefixTok(c, "canon_id", "ct"), "tok")
        .select(col("probe_id"), col("canon_id"))
      (candsRaw, p, c)
    }
    def verify(cands: DataFrame, p: DataFrame, c: DataFrame): DataFrame =
      cands.join(p, "probe_id").join(c, "canon_id")
        .select(col("probe_id"), col("canon_id"),
          size(array_intersect(col("pt"), col("ct"))).cast("double").as("n_inter"),
          size(col("pt")).as("n_p"), size(col("ct")).as("n_c"))
        .select(col("probe_id"), col("canon_id"),
          (col("n_inter") / (col("n_p") + col("n_c") - col("n_inter"))).as("jaccard"))
        .where(col("jaccard") >= minJaccard)

    // A: baseline (distinct -> verify -> udaf TopK)
    deepClean()
    time("A_baseline") {
      val (cr, p, c) = build()
      val scored = verify(cr.distinct(), p, c)
      println("FP3 rows=" + graft.aggregators.TopK
        .topKPerKey(scored, "probe_id", "canon_id", "jaccard", 3).count())
    }
    // B: window rank instead of udaf TopK
    deepClean()
    time("B_window") {
      val (cr, p, c) = build()
      val scored = verify(cr.distinct(), p, c)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("probe_id"))
        .orderBy(col("jaccard").desc, col("canon_id"))
      println("FP3 rows=" + scored
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3).count())
    }
    // C: explicit repartition barrier between distinct and verify
    deepClean()
    time("C_repart") {
      val (cr, p, c) = build()
      val scored = verify(
        cr.distinct().repartition(64, col("probe_id")), p, c)
      println("FP3 rows=" + graft.aggregators.TopK
        .topKPerKey(scored, "probe_id", "canon_id", "jaccard", 3).count())
    }
    // D: no distinct (dup pairs; wrong semantics, cost probe only)
    deepClean()
    time("D_nodistinct") {
      val (cr, p, c) = build()
      val scored = verify(cr, p, c)
      println("FP3 rows=" + graft.aggregators.TopK
        .topKPerKey(scored, "probe_id", "canon_id", "jaccard", 3).count())
    }
    // E: distinct -> verify, count only (no topk at all)
    deepClean()
    time("E_noTopk") {
      val (cr, p, c) = build()
      println("FP3 rows=" + verify(cr.distinct(), p, c).count())
    }
    spark.stop()
  }
}
