package graft.workflow

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.workflow.FeatureKind._

/** Standard estimator/transformer stages for the workflow DAG — the
  * fit halves run tiny aggregations and fold the fitted statistics into
  * literal Column expressions (broadcast-safe, codegen-fused transform).
  * References: RealVectorizer (impute+indicator), OpScalarStandardScaler,
  * OpOneHotVectorizer (top-K by (-count, value)), OpStringIndexer,
  * NumericBucketizer, DateToUnitCircleTransformer.
  */
object Stages {

  /** Mean-impute + null indicator (RealVectorizer trackNulls). */
  def imputeMean(in: Feature, out: String): ColumnEstimator =
    new ColumnEstimator("imputeMean", Seq(in)) {
      def outputNames = Seq(out, s"${out}_isnull")
      def fitExpressions(df: DataFrame): Seq[(String, Column)] = {
        val mean = df.agg(avg(col(in.name))).head.getDouble(0)
        Seq(
          out -> coalesce(col(in.name), lit(mean)),
          s"${out}_isnull" -> when(col(in.name).isNull, 1).otherwise(0))
      }
      override def outputKindOf(n: String): FeatureKind =
        if (n.endsWith("_isnull")) IntegralK else RealK
    }

  /** Mode-impute + null indicator for integral features (reference
    * IntegralVectorizer.scala:77 fits the MODE for integral/date kinds,
    * mean is the Real-kind convention; ties break to the smallest value,
    * all-null → 0, per SequenceAggregators.ModeSeqNullInt:122-127). */
  def imputeMode(in: Feature, out: String): ColumnEstimator =
    new ColumnEstimator("imputeMode", Seq(in)) {
      def outputNames = Seq(out, s"${out}_isnull")
      def fitExpressions(df: DataFrame): Seq[(String, Column)] = {
        val top = df.where(col(in.name).isNotNull)
          .groupBy(col(in.name).cast("long").as("v")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("v").asc).limit(1)
          .collect()
        val fill = if (top.isEmpty) 0L else top(0).getLong(0)
        Seq(
          out -> coalesce(col(in.name).cast("long"), lit(fill)),
          s"${out}_isnull" -> when(col(in.name).isNull, 1).otherwise(0))
      }
      override def outputKindOf(n: String): FeatureKind = IntegralK
    }

  /** Z-normalization (OpScalarStandardScaler). */
  def standardScale(in: Feature, out: String): ColumnEstimator =
    new ColumnEstimator("standardScale", Seq(in)) {
      def outputNames = Seq(out)
      def fitExpressions(df: DataFrame): Seq[(String, Column)] = {
        val row = df.agg(avg(col(in.name)), stddev_samp(col(in.name))).head
        Seq(out -> ((col(in.name) - lit(row.getDouble(0))) / lit(row.getDouble(1))))
      }
    }

  /** One-hot top-K pivot with Other + Null slots; fit order is
    * (count desc, value asc) like the reference. */
  def oneHotTopK(in: Feature, outPrefix: String, k: Int, minSupport: Long = 1): ColumnEstimator =
    new ColumnEstimator("oneHotTopK", Seq(in)) {
      def outputNames = (1 to k).map(i => s"${outPrefix}_$i") ++
        Seq(s"${outPrefix}_other", s"${outPrefix}_null")
      def fitExpressions(df: DataFrame): Seq[(String, Column)] = {
        val top = df.where(col(in.name).isNotNull)
          .groupBy(col(in.name).as("v")).agg(count(lit(1)).as("c"))
          .where(col("c") >= minSupport)
          .orderBy(col("c").desc, col("v").asc)
          .limit(k).select("v").collect().map(_.get(0))
        val c = col(in.name)
        val slots = (1 to k).map { i =>
          val name = s"${outPrefix}_$i"
          if (i <= top.length) name -> when(c === lit(top(i - 1)), 1).otherwise(0)
          else name -> lit(0)
        }
        slots ++ Seq(
          s"${outPrefix}_other" ->
            when(c.isNotNull && !c.isin(top.toIndexedSeq: _*), 1).otherwise(0),
          s"${outPrefix}_null" -> when(c.isNull, 1).otherwise(0))
      }
      override def outputKindOf(n: String): FeatureKind = IntegralK
    }

  /** String index by (count desc, value asc), 0-based; unseen/null → null.
    * Fit yields a small (value, idx) frame that the fitted transformer
    * broadcast-joins in — never collected to the driver, no
    * O(cardinality) expression chain, so high-cardinality columns index
    * without driver OOM or a Catalyst tree thousands deep. The window
    * runs over the distinct-value count table, not the data. */
  def stringIndexer(in: Feature, out: String): EstimatorStage =
    new EstimatorStage { self =>
      val name = "stringIndexer"
      val inputs = Seq(in)
      lazy val outputFeatures = Seq(
        new Feature(out, IntegralK, in.isResponse, Some(this), inputs))
      def fit(df: DataFrame): TransformerStage = {
        val counts = df.where(col(in.name).isNotNull)
          .groupBy(col(in.name).as("__si_v")).agg(count(lit(1)).as("__si_c"))
        val fitted = graft.operators.Vectorizers
          .withRowNumber(counts, Seq(col("__si_c").desc, col("__si_v").asc), "__si_rn")
          .select(col("__si_v"), (col("__si_rn") - 1).cast("int").as(out))
        new FittedStringIndexer(fitted, in.name, out, Seq(in), Some(self.outputFeatures))
      }
    }

  /** Fixed-split bucketizer (no fit needed). */
  def bucketize(in: Feature, out: String, splits: Seq[Double]): ColumnStage =
    ColumnStage("bucketize", Seq(in), out, IntegralK) { cols =>
      graft.operators.Vectorizers.bucketize(cols.head, splits)
    }

  /** Supervised bucketizer as a workflow stage (reference
    * DecisionTreeNumericBucketizer + dsl autoBucketize): fit a
    * single-feature decision tree against the LABEL, bucket by its
    * split thresholds. Label-dependent — under [[Workflow.fitWithCvCut]]
    * it refits per validation split so the buckets never see a fold's
    * validation labels. */
  def decisionTreeBucketize(in: Feature, label: Feature, out: String,
                            maxDepth: Int = 2): ColumnEstimator =
    new ColumnEstimator("decisionTreeBucketize", Seq(in, label)) {
      def outputNames = Seq(out)
      def fitExpressions(df: DataFrame): Seq[(String, Column)] = {
        val th = MLStages.decisionTreeBuckets(df, col(in.name), col(label.name), maxDepth)
        Seq(out -> MLStages.bucketizeByThresholds(col(in.name), th))
      }
      override def outputKindOf(n: String): FeatureKind = IntegralK
    }

  /** Per-key supervised map bucketizer (reference
    * DecisionTreeNumericMapBucketizer.scala): one decision-tree split
    * fit per discovered map key, output assembled as ONE array<double>
    * vector — per key (sorted): a one-hot over that key's fitted
    * buckets (only when the tree found informative splits, the
    * reference's `shouldSplit`) followed by a key-absent indicator
    * (trackNulls). Label-dependent: under [[Workflow.fitWithCvCut]] it
    * refits per validation split exactly like the scalar
    * [[decisionTreeBucketize]]. */
  def decisionTreeMapBucketize(in: Feature, label: Feature, out: String,
                               maxDepth: Int = 2): ColumnEstimator =
    new ColumnEstimator("decisionTreeMapBucketize", Seq(in, label)) {
      def outputNames = Seq(out)
      def fitExpressions(df: DataFrame): Seq[(String, Column)] = {
        val fitted = MLStages.decisionTreeMapBuckets(
          df, col(in.name), col(label.name), maxDepth)
        val slots: Seq[Column] = fitted.flatMap { case (k, th) =>
          val cell = element_at(col(in.name), k)
          val bucket = MLStages.bucketizeByThresholds(cell, th)
          val hot =
            if (th.nonEmpty)
              (0 to th.length).map(i => when(bucket === i, 1.0).otherwise(0.0))
            else Nil
          hot :+ when(cell.isNull, 1.0).otherwise(0.0)
        }
        Seq(out -> array(slots: _*))
      }
      override def outputKindOf(n: String): FeatureKind = VectorK
    }

  /** Month-of-year unit-circle encoding (DateToUnitCircleTransformer). */
  def monthUnitCircle(in: Feature, outPrefix: String): ColumnStage =
    new ColumnStage("monthUnitCircle", Seq(in)) {
      def expressions: Seq[(String, Column)] = {
        val angle = (month(col(in.name)) - 1).cast("double") * lit(2.0 * math.Pi / 12)
        Seq(s"${outPrefix}_sin" -> sin(angle), s"${outPrefix}_cos" -> cos(angle))
      }
    }

  /** Assemble features into an array<double> vector column (the engine's
    * OPVector analog; VectorsCombiner). The slot→parent-feature mapping
    * is recorded in the column's Metadata under "slots" (reference
    * OpVectorMetadata / OpVectorColumnMetadata — the lineage LOCO and
    * slot-dropping read back via [[Stages.slotNames]]). */
  def assemble(ins: Seq[Feature], out: String): ColumnStage =
    new ColumnStage("assemble", ins) {
      def expressions: Seq[(String, Column)] = {
        val meta = new org.apache.spark.sql.types.MetadataBuilder()
          .putStringArray("slots", ins.map(_.name).toArray).build()
        Seq(out -> array(ins.map(i => col(i.name).cast("double")): _*).as(out, meta))
      }
      override protected def outputKind(n: String): FeatureKind = VectorK
    }

  /** Slot names of an assembled vector column, from its Metadata. */
  def slotNames(df: DataFrame, vectorCol: String): Seq[String] =
    df.schema(vectorCol).metadata.getStringArray("slots").toSeq

  /** Drop vector slots whose NAME matches the predicate (reference
    * DropIndicesByTransformer + VectorSlicer): rebuilds the array with
    * the surviving slots and rewrites the slot metadata. Row-local. */
  def dropSlotsByName(df: DataFrame, vectorCol: String)(drop: String => Boolean): DataFrame = {
    val names = slotNames(df, vectorCol)
    val keep = names.zipWithIndex.filterNot { case (n, _) => drop(n) }
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putStringArray("slots", keep.map(_._1).toArray).build()
    df.withColumn(vectorCol,
      array(keep.map { case (_, i) => element_at(col(vectorCol), i + 1) }: _*)
        .as(vectorCol, meta))
  }

  /** MultiLabelJoiner (reference MultiLabelJoiner.scala): combine the
    * label with prediction columns into one struct column. */
  def joinLabels(df: DataFrame, out: String, labelCol: String, predCols: String*): DataFrame =
    df.withColumn(out, struct((labelCol +: predCols).map(col): _*))

  /** Linear scaler with metadata-recorded parameters (reference
    * ScalerTransformer.scala:167): out = slope * in + intercept, with
    * (slope, intercept) stored in the column Metadata so a downstream
    * [[descale]] can invert predictions made in scaled space. */
  def scale(df: DataFrame, in: String, out: String,
            slope: Double, intercept: Double): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putDouble("slope", slope).putDouble("intercept", intercept).build()
    df.withColumn(out, (col(in) * slope + intercept).as(out, meta))
  }

  /** DescalerTransformer: invert a [[scale]] using the scaling metadata
    * recorded on `scaledCol` — applied to any column in scaled space
    * (typically a prediction). */
  def descale(df: DataFrame, valueCol: String, scaledCol: String, out: String): DataFrame = {
    val m = df.schema(scaledCol).metadata
    val (slope, intercept) = (m.getDouble("slope"), m.getDouble("intercept"))
    df.withColumn(out, (col(valueCol) - intercept) / slope)
  }
}

/** Fitted string indexer: broadcast-joins the small (value, idx) frame.
  * A named class (not an anonymous stage) so [[ModelIO]] can persist the
  * fitted frame and rebuild the stage on load. */
class FittedStringIndexer(
    val fitted: DataFrame, val inName: String, val out: String,
    ins: Seq[Feature], sharedOutputs: Option[Seq[Feature]] = None)
  extends DataFrameStage("stringIndexer.fitted", ins) {
  def outputs = Seq(out -> IntegralK)
  override lazy val outputFeatures: Seq[Feature] =
    sharedOutputs.getOrElse(outputs.map { case (n, k) =>
      new Feature(n, k, inputs.exists(_.isResponse), Some(this), inputs)
    })
  def transform(d: DataFrame): DataFrame =
    d.join(broadcast(fitted), d.col(inName) === fitted.col("__si_v"), "left")
      .drop("__si_v")
}
