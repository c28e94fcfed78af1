package graft.workflow

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.types._

/** One declared raw feature over a record type `T`: name, kind, typed
  * extract function, response flag and optional semantic tag — the
  * engine's form of the reference's
  * `FeatureBuilder.Text[Passenger].extract(_.name.toText).asPredictor`
  * (features/.../FeatureBuilder.scala:48-115). */
final case class ExtractSpec[T](
    name: String,
    kind: FeatureKind,
    extract: T => Any,
    isResponse: Boolean = false,
    semantic: Option[String] = None)

/** Typed record→row assembly (reference DataReader.generateDataFrame /
  * generateRow, readers/.../DataReader.scala:174-205, and the keyed
  * CustomReader[T] abstraction, CustomReaders.scala:44): declare
  * per-feature extract functions over any record type and build the
  * keyed raw-feature DataFrame in one distributed pass.
  *
  * Scale note: extraction is a narrow map over the source partitions —
  * no shuffle; the row-level closure is the one place the engine
  * legitimately drops to RDDs (arbitrary user code per record, exactly
  * the reference's extract-fn contract).
  */
object FeatureBuilder {

  private[workflow] def sparkType(kind: FeatureKind): DataType = kind match {
    case FeatureKind.BinaryK => BooleanType
    case FeatureKind.IntegralK => LongType
    case FeatureKind.RealK => DoubleType
    case FeatureKind.TextK => StringType
    case FeatureKind.DateK => TimestampType
    case FeatureKind.TextListK => ArrayType(StringType)
    case FeatureKind.RealListK => ArrayType(DoubleType)
    case FeatureKind.TextMapK => MapType(StringType, StringType)
    case FeatureKind.RealMapK => MapType(StringType, DoubleType)
    case FeatureKind.VectorK => ArrayType(DoubleType)
  }

  /** Option values unwrap to null — the reference's uniform
    * Option-wrapped null convention (FeatureType.scala:44). */
  private def unwrap(a: Any): Any = a match {
    case Some(x) => unwrap(x)
    case None => null
    case other => other
  }

  /** Build (keyed DataFrame, raw features) from typed records: a `key`
    * column plus one column per extract, one row per record. The
    * returned features are raw inputs for a [[Workflow]] DAG. */
  def fromRecords[T](ds: Dataset[T], key: T => String,
                     extracts: Seq[ExtractSpec[T]]): (DataFrame, Seq[Feature]) = {
    val schema = StructType(
      StructField("key", StringType, nullable = false) +:
        extracts.map(e => StructField(e.name, sparkType(e.kind), nullable = true)))
    val rows = ds.rdd.map { r =>
      Row.fromSeq(key(r) +: extracts.map(e => unwrap(e.extract(r))))
    }
    val df = ds.sparkSession.createDataFrame(rows, schema)
    val features = extracts.map { e =>
      e.semantic match {
        case Some(tag) => Feature.rawTagged(e.name, e.kind, tag, e.isResponse)
        case None => Feature.raw(e.name, e.kind, e.isResponse)
      }
    }
    (df, features)
  }
}
