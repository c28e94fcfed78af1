package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs (one JVM-wide session; Spark reuses it
  * across suites through getOrCreate). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.get(4)
  implicit def sqlContextForImplicits: org.apache.spark.sql.SQLContext = spark.sqlContext
}
