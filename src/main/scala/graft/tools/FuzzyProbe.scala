package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: stage-level timing of the q256 fuzzyJoinTopK pipeline at a
  * given sf dir — counts candidates and times candidate generation vs
  * verify vs top-k separately, to localize the 10x-probe superlinearity. */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get(32)
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextAnalysis.tokens
    val part = graft.sources.Tables.part(spark, d)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"FP $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // cumulative live-prefix timings: each is a FRESH computation of
    // the operator pipeline cut at that stage (clearCache between), so
    // stage cost = difference of consecutive numbers
    def deepClean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc(); Thread.sleep(250)
    }
    import graft.operators.Dedup
    def canonSide = part.where(col("p_partkey") % 2 === 0)
    def probeSide = part.where(col("p_partkey") % 20 === 1)
    (1 to 2).foreach { pass =>
      deepClean()
      time(s"live_full_pass$pass")(println("FP live_rows=" +
        Dedup.fuzzyJoinTopK(canonSide, col("p_partkey"), col("p_name"),
          probeSide, col("p_partkey"), col("p_name"),
          k = 3, minJaccard = 0.5).count()))
    }

    val minJaccard = 0.5
    val maxTokenDocFreq = 10000
    val c = part.where(col("p_partkey") % 2 === 0)
      .select(col("p_partkey").as("canon_id"),
        array_distinct(tokens(col("p_name"))).as("ct"))
      .where(size(col("ct")) > 0).persist()
    val p = part.where(col("p_partkey") % 20 === 1)
      .select(col("p_partkey").as("probe_id"),
        array_distinct(tokens(col("p_name"))).as("pt"))
      .where(size(col("pt")) > 0).persist()
    println(s"FP canon=${c.count()} probes=${p.count()}")
    val dfTab = c.select(explode(col("ct")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df_t"))
      .persist()
    println(s"FP distinct_tokens=${dfTab.count()} max_df=${dfTab.agg(max(col("df_t"))).head.getLong(0)}")
    def prefixTok(side: org.apache.spark.sql.DataFrame, id: String, arr: String) = {
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
    val cands = prefixTok(p, "probe_id", "pt")
        .join(prefixTok(c, "canon_id", "ct"), "tok")
        .select(col("probe_id"), col("canon_id")).distinct()
        .persist()
    time("cand_gen")(println(s"FP candidates=${cands.count()}"))
    val scored = (
      cands.join(p, "probe_id").join(c, "canon_id")
        .select(col("probe_id"), col("canon_id"),
          size(array_intersect(col("pt"), col("ct"))).cast("double").as("n_inter"),
          size(col("pt")).as("n_p"), size(col("ct")).as("n_c"))
        .select(col("probe_id"), col("canon_id"),
          (col("n_inter") / (col("n_p") + col("n_c") - col("n_inter"))).as("jaccard"))
        .where(col("jaccard") >= minJaccard).persist())
    time("verify")(println(s"FP survivors=${scored.count()}"))
    time("topk")(
      println("FP topk_rows=" + graft.aggregators.TopK
        .topKPerKey(scored, "probe_id", "canon_id", "jaccard", 3).count()))
    // the LIVE operator, unstaged — what ScaleProbe actually times
    c.unpersist(true); p.unpersist(true); dfTab.unpersist(true)
    cands.unpersist(true); scored.unpersist(true)
    spark.catalog.clearCache()
    val live = graft.operators.Dedup.fuzzyJoinTopK(
      part.where(col("p_partkey") % 2 === 0), col("p_partkey"), col("p_name"),
      part.where(col("p_partkey") % 20 === 1), col("p_partkey"), col("p_name"),
      k = 3, minJaccard = 0.5)
    live.explain("formatted")
    time("live_full")(println("FP live_rows=" + live.count()))
    spark.stop()
  }
}
