package graft.operators

/** Frozen coefficients for the q560 selected-model scorer: the exact
  * logistic regression q37's ModelSelector picks (winner `lr_reg0`:
  * maxIter=30, regParam=0.0, auROC-best over the LR+RF grid on the
  * seed-42 0.75 train/validation split) refit on the full sf0.01
  * embeddings fixture, quantized to 6 decimals by
  * [[graft.tools.FreezeSelectedModel]] — rerun that main to regenerate
  * if the fixture or the selector defaults change. Freezing makes the
  * SCORING half of the model-selection pipeline hash-gateable while
  * the selection + fit stay rows-only in q37 (L-BFGS over an
  * ml.Vector frame is not SQL-replayable); it is also the production
  * shape: select once, ship constants, score 100 TB row-locally.
  *
  * The oracle's VALUES table is generated from THIS array (see
  * WorkflowQueries), so the Spark and DuckDB sides cannot drift.
  *
  * Selection stability is machine-asserted: SelectorStabilitySpec
  * replays the selector on the fixture and fails loudly if the winner
  * ever flips away from lr_reg0 (or its auROC drifts from the
  * frozen-time 0.446860), so this table can't be silently orphaned.
  */
object FrozenSelectedLr {
  val intercept: BigDecimal = BigDecimal("0.039715")
  val weights: IndexedSeq[BigDecimal] = IndexedSeq(
    "1.014846", "0.596621", "0.859146", "0.940112", "1.611827", "-0.012843",
    "-0.222199", "0.385301", "0.774290", "-0.514856", "-0.646551", "0.521134",
    "0.715919", "-0.115721", "0.301167", "-0.555064", "-1.411085", "-0.152786",
    "1.612647", "-0.014861", "1.770437", "-0.531142", "-0.312073", "-0.777027",
    "-0.734485", "-1.388879", "-0.747964", "0.196141", "-1.189458", "-1.017772",
    "-0.620933", "0.639591", "0.066602", "-1.389194", "0.192889", "2.630757",
    "-0.251083", "-1.593688", "-0.627945", "0.567176", "-1.520238", "0.047329",
    "1.201937", "-0.417681", "0.387160", "-0.896973", "1.590579", "0.081182",
    "-0.945210", "1.047769", "0.758786", "-0.406771", "1.960253", "-0.129361",
    "-0.125774", "1.713612", "-0.614614", "0.173934", "1.078109", "1.108461",
    "0.066937", "-0.976323", "0.878468", "-0.609944"
  ).map(BigDecimal(_))
  require(weights.size == 64)

  /** Weights and intercept as exact integer micros (×1e6) — the units
    * the q560 integer dot product runs in. */
  val weightMicros: IndexedSeq[Long] =
    weights.map(w => (w * 1000000).toLongExact)
  val interceptMicros: Long = (intercept * 1000000).toLongExact
}
