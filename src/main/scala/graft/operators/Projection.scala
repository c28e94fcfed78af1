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
  /** Top covariance eigenvector by `iters` power-iteration rounds over
    * the first `dims` embedding coordinates — the hash-gated
    * counterpart to [[pca]] (whose Breeze SVD is rows-only): every
    * intermediate is an order-invariant 1e-12-quantized integer fold
    * or a single IEEE division, so a DuckDB oracle unrolls the same
    * rounds bit-for-bit. v0 is the uniform direction 1/√dims (pick
    * dims a perfect square to keep it exactly representable).
    *
    * Scale: the covariance pass is one shuffle of (dim, dim) cells —
    * d² bounded, never row-scaled — so corpus size only affects that
    * first pass. The d² cov cells are then COLLECTED (require'd ≤64
    * dims → ≤4096 rows, a fit scalar like the IVF centroid tables) and
    * the `iters` matvec+normalize rounds run on the driver with the
    * same quantized arithmetic the oracle unrolls: each round is O(d²)
    * driver flops, vs the previous join-per-round plan that paid ~5
    * Spark jobs of fixed overhead per round for 16-row frames
    * (measured 14.2 s → the cov pass alone at sf0.1).
    * Emits (d, v, eigval, n): the unit eigenvector coordinate per dim,
    * the ‖Cv‖ eigenvalue estimate from the final round, and the row
    * count. */
  def powerIteration(df: DataFrame, id: Column, vec: Column,
                     dims: Int, iters: Int = 5): DataFrame = {
    require(dims >= 2 && dims <= 64 && iters >= 1 && iters <= 8,
      s"bad power-iteration params: dims=$dims iters=$iters")
    val spark = df.sparkSession
    val ex = df.select(id.as("vid"),
        posexplode(vec).as(Seq("d0", "x")))
      .where(col("d0") < dims)
      .select(col("vid"), (col("d0") + 1).as("d"),
        round(col("x").cast("double") * 1e9).cast("long").as("xq"))
    val mu = ex.groupBy(col("d"))
      .agg(sum(col("xq")).as("sq"), count(lit(1)).as("n"))
      .select(col("d"), col("n"),
        (col("sq").cast("double") / col("n").cast("double") / 1e9).as("m"))
    val cx = ex.join(mu, Seq("d"))
      .select(col("vid"), col("d"), col("n"),
        (col("xq").cast("double") / 1e9 - col("m")).as("cx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val covRows = cx.select(col("vid"), col("d").as("i"), col("cx").as("cxi"),
        col("n"))
      .join(cx.select(col("vid"), col("d").as("j"), col("cx").as("cxj")),
        Seq("vid"))
      .groupBy(col("i"), col("j"))
      .agg(max(col("n")).as("n"),
        sum(round(col("cxi") * col("cxj") * 1e12).cast("long")).as("pq"))
      .select(col("i"), col("j"), col("n"),
        (col("pq").cast("double") / col("n").cast("double") / 1e12)
          .as("c"))
      .collect() // ≤ dims² ≤ 4096 rows — a fit scalar, require'd above
    cx.unpersist(blocking = false)
    // Driver-side rounds with the exact arithmetic the SQL oracle
    // unrolls: Spark's round(double) is BigDecimal HALF_UP; long sums
    // are order-free; w/nrm is one IEEE division; the decimal(18,12)
    // re-quantization is a 12-dp HALF_UP.
    def halfUp(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val cMat = Array.ofDim[Double](dims + 1, dims + 1)
    var nRows = 0L
    covRows.foreach { r =>
      cMat(r.getAs[Number](0).intValue)(r.getAs[Number](1).intValue) =
        r.getDouble(3)
      nRows = math.max(nRows, r.getLong(2))
    }
    var vv = Array.fill(dims + 1)(1.0 / math.sqrt(dims.toDouble))
    var nrm = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dims + 1) { i =>
        if (i == 0) 0.0
        else {
          var sw = 0L
          var j = 1
          while (j <= dims) { sw += halfUp(cMat(i)(j) * vv(j) * 1e12); j += 1 }
          sw.toDouble / 1e12
        }
      }
      nrm = math.sqrt(
        (1 to dims).map(i => halfUp(w(i) * w(i) * 1e12)).sum.toDouble / 1e12)
      // Zero-variance input ⇒ w is all zeros and nrm == 0; w(i)/nrm is
      // NaN and BigDecimal(NaN) throws on the driver. Mirror the old
      // SQL plan's behavior (0/0 null → coalesced 0) by emitting 0.0.
      vv = Array.tabulate(dims + 1) { i =>
        if (i == 0) 0.0
        else {
          val q = w(i) / nrm
          if (!java.lang.Double.isFinite(q)) 0.0
          else BigDecimal(q)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
    }
    import spark.implicits._
    (1 to dims).map(i => (i.toLong, vv(i), nrm, nRows))
      .toDF("d", "v_raw", "nrm_raw", "n")
      .select(col("d"), round(col("v_raw"), 6).as("v"),
        round(col("nrm_raw"), 6).as("eigval"), col("n"))
  }

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
