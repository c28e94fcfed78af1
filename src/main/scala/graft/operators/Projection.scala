package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimensionality reduction for embedding columns.
  *
  * Random sign (Achlioptas / Johnson-Lindenstrauss) projection: each
  * output dim j is `sum_i vec[i] * s(i,j) / sqrt(outDim)` with
  * `s(i,j) in {+1,-1}` drawn from a deterministic md5-derived family —
  * the same "plan-time literal hyperplanes" policy as the SRP-LSH
  * operators ([[Similarity]]), so the DuckDB oracle replays the exact
  * projection and the gate hash-matches.
  *
  * Scale: the sign matrix is DATA-INDEPENDENT and tiny (inDim × outDim
  * ints), so it is materialized driver-side and embedded as plan
  * literals — the projection is then a pure per-row map (narrow, no
  * shuffle, whole-stage codegen) over however many executors hold the
  * corpus. The per-dim fold is a sequential left-to-right `aggregate`,
  * keeping double addition order deterministic across engines.
  */
object Projection {

  /** Parity of the 60-bit prefix of md5("rp|i|j"): the shared sign family. */
  private[graft] def sign(i: Int, j: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp|$i|$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  /** Project `vec` (array&lt;float&gt; of length `inDim`) to `outDim`
    * sign-projection coordinates; emits long-format
    * (id, dim, value) rows with `value` rounded to `scale` digits. */
  def signProjection(df: DataFrame, id: Column, vec: Column,
                     inDim: Int, outDim: Int, scale: Int = 6): DataFrame = {
    require(inDim >= 1 && outDim >= 1, "dims must be >= 1")
    val norm = math.sqrt(outDim.toDouble)
    // one literal sign row per output dim; zip_with keeps the fold
    // sequential so the double sum is order-stable
    val coords = (0 until outDim).map { j =>
      val signs = array((0 until inDim).map(i => lit(sign(i, j))): _*)
      round(
        aggregate(zip_with(vec.cast("array<double>"), signs, (x, sgn) => x * sgn),
          lit(0.0), (acc, v) => acc + v) / norm,
        scale)
    }
    df.select(id.as("id"), posexplode(array(coords: _*)).as(Seq("dim", "value")))
  }

  /** PCA projection of an embedding column to its top `k` principal
    * components; emits long-format (id, dim, value) rows.
    *
    * Delegates to spark.ml's PCA, whose fit is ONE `treeAggregate` of
    * the d×d Gram matrix (executor-side partial outer products, log-tree
    * combine) followed by a driver-side SVD of the d×d result — the
    * right split at 100 TB as long as d stays in the thousands (the
    * driver cost is O(d²) memory / O(d³) compute, independent of row
    * count). The transform is a narrow per-row mat-vec. Eigenvector
    * SIGNS are an SVD convention, not data semantics — the gate is a
    * rows-only query plus a spec asserting the variance contract, the
    * same policy as the Lloyd-refined IVF fit.
    */
  def pca(df: DataFrame, id: Column, vec: Column, k: Int): DataFrame = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    require(k >= 1, s"k must be >= 1: $k")
    val assembled = df.select(id.as("id"),
      array_to_vector(vec.cast("array<double>")).as("features"))
    val model = new org.apache.spark.ml.feature.PCA()
      .setInputCol("features").setOutputCol("pc").setK(k)
      .fit(assembled)
    model.transform(assembled)
      .select(col("id"), posexplode(vector_to_array(col("pc"))).as(Seq("dim", "value")))
      .select(col("id"), col("dim"), round(col("value"), 6).as("value"))
  }
}
