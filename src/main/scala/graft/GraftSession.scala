package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every entry point (tests, bench,
  * verify) shares. Tuned for local[N] smoke runs but with the knobs a
  * real cluster deployment would override (shuffle partitions, AQE).
  */
object GraftSession {
  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // align null-on-error arithmetic with the DuckDB oracle (x/0 -> NULL)
      .config("spark.sql.ansi.enabled", "false")
      // driver testdata events.parquet uses TIMESTAMP(NANOS); Spark 4 only
      // reads it as Long under this flag (converted in Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
