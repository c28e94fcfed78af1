package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.workflow._

/** End-to-end workflow-DAG queries. q36 drives the full plan/fit/score
  * engine (feature graph → layered DAG → fused fit/transform) and is
  * oracle-gated: the fitted pipeline's output is replayed in SQL.
  * q37 exercises spark.ml training inside the DAG (rows-only — a
  * trained model isn't SQL-expressible); q38 hash-gates the binary
  * evaluator itself over a deterministic score column.
  */
object WorkflowQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // impute + scale + one-hot + index + unit-circle, all through the
    // Workflow planner (layer fusion, estimator fit, scoring projection)
    "q36_workflow_pipeline" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val Seq(okey, price, prio, odate) =
        Seq("o_orderkey", "o_totalprice", "o_orderpriority", "o_orderdate").map { n =>
          Feature.raw(n, FeatureKind.fromSpark(orders.schema(n).dataType))
        }
      val priceZ = Stages.standardScale(price, "price_z")
      val prioHot = Stages.oneHotTopK(prio, "prio", k = 3, minSupport = 10)
      val prioIdx = Stages.stringIndexer(prio, "prio_idx")
      val monthCirc = Stages.monthUnitCircle(odate, "omonth")
      val results = priceZ.outputFeatures ++ prioHot.outputFeatures ++
        prioIdx.outputFeatures ++ monthCirc.outputFeatures
      val model = new Workflow(results).fit(orders)
      val out = model.score(orders, keep = Seq("o_orderkey"))
      out.withColumn("price_z", round(col("price_z"), 6))
        .withColumn("omonth_sin", round(col("omonth_sin"), 6))
        .withColumn("omonth_cos", round(col("omonth_cos"), 6))
    }),

    // q36's pipeline, but scored through a ModelIO save + load round
    // trip (reference OpWorkflowModelWriter/Reader): the fitted model is
    // serialized to JSON manifest + stage payloads, reloaded, and the
    // LOADED model produces the output — gated by the same oracle as q36
    "q55_model_saveload" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val Seq(okey, price, prio, odate) =
        Seq("o_orderkey", "o_totalprice", "o_orderpriority", "o_orderdate").map { n =>
          Feature.raw(n, FeatureKind.fromSpark(orders.schema(n).dataType))
        }
      val priceZ = Stages.standardScale(price, "price_z")
      val prioHot = Stages.oneHotTopK(prio, "prio", k = 3, minSupport = 10)
      val prioIdx = Stages.stringIndexer(prio, "prio_idx")
      val monthCirc = Stages.monthUnitCircle(odate, "omonth")
      val results = priceZ.outputFeatures ++ prioHot.outputFeatures ++
        prioIdx.outputFeatures ++ monthCirc.outputFeatures
      val model = new Workflow(results).fit(orders)
      val dir = java.nio.file.Files.createTempDirectory("graft_model").toString
      ModelIO.save(model, dir, s)
      val loaded = ModelIO.load(s, dir)
      val out = loaded.score(orders, keep = Seq("o_orderkey"))
      out.withColumn("price_z", round(col("price_z"), 6))
        .withColumn("omonth_sin", round(col("omonth_sin"), 6))
        .withColumn("omonth_cos", round(col("omonth_cos"), 6))
    }),

    // Transmogrifier auto-dispatch: date + text + real raw features each
    // get their kind-default vectorizer, assembled into ONE vector
    // feature; output = posexploded (key, slot, value) so the oracle
    // replays the full slot layout
    "q59_transmogrify" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val fs = Seq("o_orderdate", "o_orderpriority", "o_totalprice").map { n =>
        Feature.raw(n, FeatureKind.fromSpark(orders.schema(n).dataType))
      }
      val plan = Transmogrifier.transmogrify(fs, "features", topK = 3, minSupport = 1)
      val model = new Workflow(plan.resultFeatures).fit(orders)
      model.score(orders, keep = Seq("o_orderkey"))
        .select(col("o_orderkey"),
          posexplode(transform(col("features"), v => round(v, 6))).as(Seq("slot", "value")))
    }),

    // ModelSelector (LR grid + RF grid, train/validation split) trained
    // on embeddings to predict label<5, best model refit + scored through
    // the DAG; deterministic given the fixed seed but not
    // SQL-expressible → rows-only check
    "q37_ml_train_score" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("emb_d", transform(col("embedding"), x => x.cast("double")))
        .withColumn("y", (col("label") < 5).cast("double"))
      val fVec = Feature.raw("emb_d", FeatureKind.VectorK)
      val fLab = Feature.raw("y", FeatureKind.RealK, isResponse = true)
      val sel = ModelSelector.binary(fVec, fLab, "sel",
        ModelSelector.binaryDefaults(fVec, fLab, "sel"),
        ModelSelector.TrainValidationSplit(0.75))
      val model = new Workflow(sel.outputFeatures).fit(emb)
      model.score(emb, keep = Seq("vec_id", "y"))
        .select(col("vec_id"), col("y"),
          col("sel_prediction"), round(col("sel_prob_1"), 4).as("sel_prob_1"))
    }),

    // the DEPLOYED half of q37, hash-gated: score every embedding with
    // the frozen coefficients of the model q37's selector picks
    // (FrozenSelectedLr — the lr_reg0 winner refit on the full frame,
    // quantized to 6dp by tools/FreezeSelectedModel). The dot product
    // runs in exact integer micros (wq6 · xq6, order-free long sum);
    // prediction is the exact integer sign test logit_q12 > 0; only
    // the final sigmoid is double. Selection + fit stay rows-only in
    // q37; this replays scoring — the q523 pattern applied to the
    // model-selection pipeline, and the production shape (select once,
    // ship constants, score 100 TB row-locally, zero shuffles).
    "q560_selected_model_score" -> ((s, d) => {
      val fz = graft.operators.FrozenSelectedLr
      val wl = array(fz.weightMicros.map(lit): _*)
      val xq = transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long"))
      val dot = aggregate(zip_with(xq, wl, (x, wv) => x * wv),
        lit(0L), (a, v) => a + v)
      Tables.embeddings(s, d)
        .select(col("vec_id"), (col("label") < 5).cast("int").as("y"),
          (lit(fz.interceptMicros) * lit(1000000L) + dot).as("lq12"))
        .select(col("vec_id"), col("y"),
          when(col("lq12") > 0, 1).otherwise(0).as("prediction"),
          round(lit(1.0) / (lit(1.0) +
            exp(-(col("lq12").cast("double") / lit(1e12)))), 6).as("prob_1"))
    }),

    // the binary EVALUATOR fully hash-gated: confusion counts at 0.5,
    // accuracy, F1, and mllib-curve-semantics trapezoid auROC/auPR, all
    // replayed in SQL. The score column is a deterministic transform of
    // vec_id rather than a model's output — model scores aren't
    // SQL-replayable (they stay rows-only in q37); what this gate pins
    // down is the metric machinery itself
    "q38_ml_evaluate" -> ((s, d) => {
      val scored = Tables.embeddings(s, d).select(
        (pmod(col("vec_id"), lit(97)).cast("double") / 96.0).as("score"),
        (col("label") < 5).cast("double").as("y"))
      val m = MLTuning.binaryMetrics(scored, "score", "y")
      val conf = scored.agg(
        sum(when(col("score") > 0.5 && col("y") === 1.0, 1L).otherwise(0L)).as("tp"),
        sum(when(col("score") > 0.5 && col("y") === 0.0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("score") <= 0.5 && col("y") === 1.0, 1L).otherwise(0L)).as("fn")).head
      val spark = s
      import spark.implicits._
      Seq((m.auroc, m.aupr, m.accuracy, m.f1,
          conf.getLong(0), conf.getLong(1), conf.getLong(2)))
        .toDF("auroc", "aupr", "accuracy", "f1", "tp", "fp", "fn")
        .select(round(col("auroc"), 6).as("auroc"), round(col("aupr"), 6).as("aupr"),
          round(col("accuracy"), 6).as("accuracy"), round(col("f1"), 6).as("f1"),
          col("tp"), col("fp"), col("fn"))
    })
  )

  private val pipelineSql =
      """WITH stats AS (
           SELECT AVG(o_totalprice) AS mu, STDDEV_SAMP(o_totalprice) AS sigma FROM orders),
         fitted AS (
           SELECT value, ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC) AS rank
           FROM (SELECT o_orderpriority AS value, count(*) AS cnt FROM orders
                 WHERE o_orderpriority IS NOT NULL GROUP BY 1)
           WHERE cnt >= 10 QUALIFY rank <= 3),
         idx AS (
           SELECT value, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC) - 1 AS INT) AS i
           FROM (SELECT o_orderpriority AS value, count(*) AS cnt FROM orders
                 WHERE o_orderpriority IS NOT NULL GROUP BY 1))
         SELECT o_orderkey,
           ROUND((o_totalprice - mu) / sigma, 6) AS price_z,
           CASE WHEN rank = 1 THEN 1 ELSE 0 END AS prio_1,
           CASE WHEN rank = 2 THEN 1 ELSE 0 END AS prio_2,
           CASE WHEN rank = 3 THEN 1 ELSE 0 END AS prio_3,
           CASE WHEN o_orderpriority IS NOT NULL AND rank IS NULL THEN 1 ELSE 0 END AS prio_other,
           CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END AS prio_null,
           i AS prio_idx,
           ROUND(SIN((MONTH(o_orderdate) - 1) * 2 * PI() / 12), 6) + 0 AS omonth_sin,
           ROUND(COS((MONTH(o_orderdate) - 1) * 2 * PI() / 12), 6) + 0 AS omonth_cos
         FROM orders CROSS JOIN stats
           LEFT JOIN fitted ON o_orderpriority = fitted.value
           LEFT JOIN idx ON o_orderpriority = idx.value"""

  val oracles: Map[String, String] = Map(
    // mllib BinaryClassificationMetrics curve semantics, replayed:
    // confusions grouped per DISTINCT score ordered descending; ROC =
    // (0,0) prepended to cumulative (fpr, tpr), trapezoid; PR = (0,
    // precision-of-top-group) prepended to (recall, precision). Ties in
    // the trapezoid sort follow cumulative order ((x asc, y asc) for
    // ROC; (recall asc, precision DESC) for PR).
    "q38_ml_evaluate" ->
      """WITH scored AS (
           SELECT CAST(vec_id % 97 AS DOUBLE) / 96.0 AS s,
                  CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
           FROM embeddings),
         conf AS (
           SELECT SUM(CASE WHEN s > 0.5 AND y = 1.0 THEN 1 ELSE 0 END) AS tp,
                  SUM(CASE WHEN s > 0.5 AND y = 0.0 THEN 1 ELSE 0 END) AS fp,
                  SUM(CASE WHEN s <= 0.5 AND y = 1.0 THEN 1 ELSE 0 END) AS fn,
                  SUM(CASE WHEN (s > 0.5) = (y = 1.0) THEN 1 ELSE 0 END) AS correct,
                  COUNT(*) AS n_all
           FROM scored),
         g AS (SELECT s, SUM(y) AS pos, COUNT(*) - SUM(y) AS neg FROM scored GROUP BY s),
         c AS (SELECT s, SUM(pos) OVER (ORDER BY s DESC) AS ctp,
                      SUM(neg) OVER (ORDER BY s DESC) AS cfp FROM g),
         t AS (SELECT SUM(pos) AS p, SUM(neg) AS nn FROM g),
         rocp AS (SELECT cfp / nn AS x, ctp / p AS yy FROM c CROSS JOIN t
                  UNION ALL SELECT 0.0, 0.0),
         auroc_t AS (
           SELECT SUM((x - px) * (yy + py) / 2) AS auroc FROM (
             SELECT x, yy,
               LAG(x) OVER (ORDER BY x ASC, yy ASC) AS px,
               LAG(yy) OVER (ORDER BY x ASC, yy ASC) AS py
             FROM rocp) WHERE px IS NOT NULL),
         prp AS (SELECT ctp / p AS r, ctp / (ctp + cfp) AS prec FROM c CROSS JOIN t
                 UNION ALL
                 SELECT 0.0, (SELECT ctp / (ctp + cfp) FROM c ORDER BY s DESC LIMIT 1)),
         aupr_t AS (
           SELECT SUM((r - pr2) * (prec + pp2) / 2) AS aupr FROM (
             SELECT r, prec,
               LAG(r) OVER (ORDER BY r ASC, prec DESC) AS pr2,
               LAG(prec) OVER (ORDER BY r ASC, prec DESC) AS pp2
             FROM prp) WHERE pr2 IS NOT NULL)
         SELECT ROUND(auroc, 6) AS auroc, ROUND(aupr, 6) AS aupr,
           ROUND(CAST(correct AS DOUBLE) / n_all, 6) AS accuracy,
           ROUND(CASE WHEN 2*tp + fp + fn = 0 THEN 0.0
                      ELSE 2.0*tp / (2*tp + fp + fn) END, 6) AS f1,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn
         FROM conf CROSS JOIN auroc_t CROSS JOIN aupr_t""",

    "q59_transmogrify" ->
      """WITH fitted AS (
           SELECT value, ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC) AS rank
           FROM (SELECT o_orderpriority AS value, count(*) AS cnt FROM orders
                 WHERE o_orderpriority IS NOT NULL GROUP BY 1)
           QUALIFY rank <= 3),
         wide AS (
           SELECT o_orderkey, [
             ROUND(SIN((MONTH(o_orderdate) - 1) * 2 * PI() / 12), 6) + 0,
             ROUND(COS((MONTH(o_orderdate) - 1) * 2 * PI() / 12), 6) + 0,
             CASE WHEN rank = 1 THEN 1 ELSE 0 END,
             CASE WHEN rank = 2 THEN 1 ELSE 0 END,
             CASE WHEN rank = 3 THEN 1 ELSE 0 END,
             CASE WHEN o_orderpriority IS NOT NULL AND rank IS NULL THEN 1 ELSE 0 END,
             CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END,
             ROUND(o_totalprice, 6),
             0] AS l
           FROM orders LEFT JOIN fitted ON o_orderpriority = fitted.value)
         SELECT o_orderkey, CAST(x.i AS INT) AS slot, l[CAST(x.i + 1 AS INT)] AS value
         FROM wide CROSS JOIN (SELECT unnest(range(0, 9)) AS i) x""",
    // DuckDB replay of the frozen selected-model scorer: the VALUES
    // table is generated from FrozenSelectedLr.weightMicros, so the
    // Spark and SQL sides cannot drift.
    "q560_selected_model_score" -> {
      val fz = graft.operators.FrozenSelectedLr
      val values = fz.weightMicros.zipWithIndex
        .map { case (w, i) => s"(${i + 1}, CAST($w AS BIGINT))" }
        .mkString(",\n             ")
      s"""WITH w(dim, wq) AS (
           VALUES $values),
         q AS (SELECT vec_id, label,
                 list_transform(embedding, x ->
                   CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xq
               FROM embeddings),
         ex AS (SELECT vec_id, u.i AS dim, u.x AS xq
                FROM q, LATERAL (SELECT unnest(list_transform(q.xq,
                  (x, i) -> {'i': i, 'x': x})) AS u)),
         dot AS (SELECT vec_id, sum(xq * wq) AS dq
                 FROM ex JOIN w USING (dim) GROUP BY 1),
         sc AS (SELECT q.vec_id,
                  CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
                  CAST(${fz.interceptMicros} AS BIGINT) * 1000000 + dq AS lq12
                FROM q JOIN dot USING (vec_id))
         SELECT vec_id, y,
           CASE WHEN lq12 > 0 THEN 1 ELSE 0 END AS prediction,
           ROUND(1.0 / (1.0 + EXP(-(CAST(lq12 AS DOUBLE) / 1e12))), 6)
             AS prob_1
         FROM sc"""
    },
    "q36_workflow_pipeline" -> pipelineSql,
    // identical pipeline semantics — the save/load round trip must be
    // invisible to the oracle
    "q55_model_saveload" -> pipelineSql
  )
}
