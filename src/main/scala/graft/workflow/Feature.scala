package graft.workflow

import java.util.concurrent.atomic.AtomicLong

/** Feature kind ADT — the engine's type lattice (reference: the 45-type
  * FeatureType hierarchy, features/.../types/FeatureType.scala:44). We
  * collapse the hierarchy to the Spark-visible kinds and keep
  * nullability as a flag: the reference's value classes are Option
  * wrappers whose only operational role is uniform null handling, which
  * Spark nullable columns already give us. Subtype tags (Email vs Text,
  * Currency vs Real) become `semantic` annotations that dispatchers
  * (Transmogrifier-style) can branch on without a parallel class tree.
  */
sealed trait FeatureKind
object FeatureKind {
  case object BinaryK extends FeatureKind // BooleanType
  case object IntegralK extends FeatureKind // LongType (incl Date/DateTime millis)
  case object RealK extends FeatureKind // DoubleType
  case object TextK extends FeatureKind // StringType
  case object DateK extends FeatureKind // TimestampType / DateType view
  case object TextListK extends FeatureKind // ArrayType(StringType)
  case object RealListK extends FeatureKind // ArrayType(DoubleType) (incl Geolocation)
  case object TextMapK extends FeatureKind // MapType(String, String)
  case object RealMapK extends FeatureKind // MapType(String, Double) (incl Prediction)
  case object VectorK extends FeatureKind // ml VectorUDT or ArrayType(DoubleType)

  def fromSpark(dt: org.apache.spark.sql.types.DataType): FeatureKind = {
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType => BinaryK
      case LongType | IntegerType | ShortType | ByteType => IntegralK
      case DoubleType | FloatType => RealK
      case StringType => TextK
      case DateType | TimestampType | TimestampNTZType => DateK
      case ArrayType(StringType, _) => TextListK
      case ArrayType(DoubleType | FloatType, _) => RealListK
      case MapType(StringType, StringType, _) => TextMapK
      case MapType(StringType, DoubleType, _) => RealMapK
      case _ => VectorK
    }
  }
}

/** A type-safe pointer to a column plus full lineage (reference
  * Feature/FeatureLike, features/.../Feature.scala:55): name, kind,
  * response flag, origin stage and parent features. Equality is by uid
  * (FeatureLike.scala:149). Raw features have no origin.
  */
final class Feature(
    val name: String,
    val kind: FeatureKind,
    val isResponse: Boolean = false,
    val originStage: Option[Stage] = None,
    val parents: Seq[Feature] = Nil,
    val semantic: Option[String] = None) {

  val uid: String = Feature.nextUid(name)
  def isRaw: Boolean = parents.isEmpty

  /** All transitive ancestor stages with max distance from this feature
    * (reference FeatureLike.parentStages:370). Cycle-safe by uid. */
  def parentStages(): Map[Stage, Int] = {
    val acc = scala.collection.mutable.Map.empty[String, (Stage, Int)]
    def visit(f: Feature, depth: Int, seen: Set[String]): Unit = {
      if (seen.contains(f.uid)) throw new IllegalStateException(s"feature cycle at ${f.name}")
      f.originStage.foreach { s =>
        val d = acc.get(s.uid).map(_._2 max depth).getOrElse(depth)
        acc(s.uid) = (s, d)
        s.inputs.foreach(visit(_, depth + 1, seen + f.uid))
      }
    }
    visit(this, 0, Set.empty)
    acc.values.toMap
  }

  override def equals(o: Any): Boolean = o match {
    case f: Feature => f.uid == uid
    case _ => false
  }
  override def hashCode: Int = uid.hashCode
  override def toString = s"Feature($name:$kind${if (isRaw) ",raw" else ""})"
}

object Feature {
  private val counter = new AtomicLong(0)
  private def nextUid(name: String) = s"${name}_${counter.incrementAndGet()}"

  def raw(name: String, kind: FeatureKind, isResponse: Boolean = false): Feature =
    new Feature(name, kind, isResponse)

  /** Raw feature with a semantic subtype tag — the collapsed form of the
    * reference's 45-class hierarchy (Email vs Text, ID vs Text, ...);
    * dispatchers branch on the tag (Transmogrifier). */
  def rawTagged(name: String, kind: FeatureKind, semantic: String,
                isResponse: Boolean = false): Feature =
    new Feature(name, kind, isResponse, None, Nil, Some(semantic))

  /** One raw feature per DataFrame column (reference
    * FeatureBuilder.fromDataFrame, FeatureBuilder.scala:193). */
  def fromSchema(schema: org.apache.spark.sql.types.StructType,
                 response: Option[String] = None): Seq[Feature] =
    schema.fields.toSeq.map(f =>
      raw(f.name, FeatureKind.fromSpark(f.dataType), response.contains(f.name)))
}
