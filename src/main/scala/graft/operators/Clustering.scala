package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-facing clustering over embedding columns.
  *
  * Delegates to spark.ml KMeans (k-means|| init): each Lloyd iteration
  * broadcasts the k×d centroid matrix and reduces per-partition partial
  * (sum, count) pairs — cost O(rows·k·d) map-side with a k×d-bounded
  * combine, the same contract as the IVF coarse quantizer in
  * [[Similarity]]. Cluster IDs are init-order artifacts, not data
  * semantics, so assignments are canonicalized (relabelled by each
  * cluster's smallest member id) to be stable across equivalent runs;
  * the gate is rows-only plus a blob-recovery spec.
  */
object Clustering {

  /** (id, cluster, dist) rows: canonicalized cluster label (smallest
    * member id in the cluster) and Euclidean distance to the fitted
    * centroid, rounded to `scale`. */
  def kmeansAssign(df: DataFrame, id: Column, vec: Column, k: Int,
                   maxIter: Int = 20, seed: Long = 7L,
                   scale: Int = 6): DataFrame = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    require(k >= 2, s"k must be >= 2: $k")
    val assembled = df.select(id.as("id"),
      array_to_vector(vec.cast("array<double>")).as("features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("__cluster")
      .fit(assembled)
    val centers = model.clusterCenters.map(_.toArray)
    val centerLit = array(centers.map(c => array(c.map(lit): _*)): _*)
    val assigned = model.transform(assembled)
      .select(col("id"), col("__cluster"),
        vector_to_array(col("features")).as("arr"))
      .withColumn("dist",
        round(sqrt(aggregate(
          zip_with(col("arr"), element_at(centerLit, col("__cluster") + 1),
            (x, c) => (x - c) * (x - c)),
          lit(0.0), (acc, v) => acc + v)), scale))
    // canonical labels: each cluster takes its smallest member id
    val relabel = assigned.groupBy(col("__cluster"))
      .agg(min(col("id")).as("cluster"))
    assigned.join(broadcast(relabel), "__cluster")
      .select(col("id"), col("cluster"), col("dist"))
  }
}
