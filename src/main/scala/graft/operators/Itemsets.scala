package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-itemset mining (market-basket association) via
  * spark.ml's parallel FP-growth.
  *
  * Scale: PFP (Li et al., the algorithm behind `ml.fpm.FPGrowth`)
  * shards the search space by item suffix after one support-counting
  * pass — each partition mines a conditional FP-tree independently, so
  * work distributes by frequent item, not by basket count. The
  * minSupport threshold prunes the lattice before any tree is built;
  * baskets are assembled with one `collect_set` groupBy (bounded by
  * real basket size).
  */
object Itemsets {

  /** Frequent itemsets up to `maxSize` items as sorted "|"-joined
    * strings with their basket counts. `minSupport` is a fraction of
    * all baskets (Spark's own threshold: count >= ceil(minSupport · n),
    * which the SQL oracle replays). */
  def frequentItemsets(baskets: DataFrame, basket: Column, item: Column,
                       minSupport: Double, maxSize: Int): DataFrame = {
    require(minSupport > 0 && minSupport <= 1, s"minSupport in (0,1]: $minSupport")
    require(maxSize >= 1, s"maxSize must be >= 1: $maxSize")
    val b = baskets.groupBy(basket.as("bid"))
      .agg(collect_set(item.cast("string")).as("items"))
    val model = new org.apache.spark.ml.fpm.FPGrowth()
      .setItemsCol("items").setMinSupport(minSupport)
      .setMinConfidence(0.0)
      .fit(b)
    model.freqItemsets
      .where(size(col("items")) <= maxSize)
      .select(array_join(array_sort(col("items")), "|").as("itemset"),
        size(col("items")).as("k"), col("freq").as("n_baskets"))
  }
}
