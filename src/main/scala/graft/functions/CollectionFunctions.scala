package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Collection-level row transforms (reference OPCollectionTransformer.scala
  * — lift any scalar stage over a list/set/map — and
  * TextListNullTransformer). Pure higher-order Column functions:
  * codegen'd, row-local, no UDFs. */
object CollectionFunctions {

  /** Lift a scalar Column function over every element of a list/set
    * (OPCollectionTransformer list/set path). */
  def liftList(c: Column)(f: Column => Column): Column = transform(c, f)

  /** Lift a scalar Column function over every value of a map
    * (OPCollectionTransformer map path). */
  def liftMap(c: Column)(f: Column => Column): Column =
    transform_values(c, (_, v) => f(v))

  /** TextListNullTransformer: null list → empty list (keeps downstream
    * size()/transform() total), plus an indicator for the null case. */
  def nullToEmptyList(c: Column): Column =
    coalesce(c, array().cast("array<string>"))
  def listIsNull(c: Column): Column = when(c.isNull, 1).otherwise(0)
}
