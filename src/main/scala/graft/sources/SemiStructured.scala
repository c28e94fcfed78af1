package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured (JSON string) column support — the props/payload
  * columns every event pipeline carries. Two tiers:
  *
  *  - `jsonField`/`withJsonFields`: path extraction via
  *    `get_json_object` — row-local, codegen'd, no fit step; the right
  *    tool when the consumed paths are known (and the only scale cost
  *    is parsing bytes you were already scanning).
  *  - `inferJsonSchema` + `parseJson`: a BOUNDED schema-inference fit
  *    (Spark's JSON inference over a deterministic sample, never the
  *    full 100 TB column) feeding `from_json`, which exposes the whole
  *    object as a typed struct for downstream relational pruning.
  *
  * Schema drift note: `from_json` yields null for rows that do not
  * match the inferred schema — count them ([[parseFailures]]) rather
  * than discovering the drift in a downstream null cascade.
  */
object SemiStructured {

  /** One JSON path as a string column (cast at the call site). */
  def jsonField(json: Column, path: String): Column =
    get_json_object(json, path)

  /** Project named JSON paths to typed columns:
    * (outName, path, castTo). */
  def withJsonFields(df: DataFrame, json: Column,
                     fields: Seq[(String, String, String)]): DataFrame =
    fields.foldLeft(df) { case (acc, (name, path, tpe)) =>
      acc.withColumn(name, get_json_object(json, path).cast(tpe))
    }

  /** Infer the JSON column's schema from a deterministic md5 sample of
    * at most ~`sampleRows` rows (exact fraction math over a bounded
    * count) — the fit cost is fixed no matter the corpus size. */
  def inferJsonSchema(df: DataFrame, json: Column,
                      sampleRows: Int = 10000): StructType = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val sampled =
      if (n <= sampleRows) df.select(json.as("j"))
      else df.select(json.as("j"))
        .where(graft.operators.Curation.sampleBucket(col("j"), "jschema")
          < (sampleRows.toDouble / n * 1e6).toLong + 1)
    spark.read.json(sampled.as[String]).schema
  }

  /** Parse the JSON column with an explicit (e.g. inferred) schema into
    * a struct column `parsed`; malformed rows parse to null struct. */
  def parseJson(df: DataFrame, json: Column, schema: StructType): DataFrame =
    df.withColumn("parsed", from_json(json, schema))

  /** Drift gate: rows whose JSON fails to parse under `schema`. Spark's
    * PERMISSIVE mode yields a struct of nulls (not a null struct) on
    * malformed input, so the reliable detector is the corrupt-record
    * column: extend the schema with `_corrupt_record` and count rows
    * where it lit up. One aggregation. */
  def parseFailures(df: DataFrame, json: Column, schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val p = from_json(json, withCorrupt,
      Map("columnNameOfCorruptRecord" -> "_corrupt_record"))
    df.select(p.getField("_corrupt_record").as("corrupt"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("corrupt").isNotNull, 1L).otherwise(0L))
          .as("n_parse_failures"))
  }
}
