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
      // expose graft's native/composed expressions to plain SQL
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // align null-on-error arithmetic with the DuckDB oracle (x/0 -> NULL)
      .config("spark.sql.ansi.enabled", "false")
      // driver testdata events.parquet has carried TIMESTAMP(NANOS); Spark 4
      // only reads that as Long under this flag (converted in Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ... and currently carries TIMESTAMP(MICROS, isAdjustedToUTC=false),
      // which Spark 4 would infer as TIMESTAMP_NTZ. Read it as a plain
      // session-tz timestamp instead: the session tz is UTC, so the wall
      // values equal DuckDB's naive reading of the same file, and window
      // arithmetic / unix-epoch casts behave like a normal TIMESTAMP.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // InferFiltersFromGenerate re-derives `size(arr) > 0` under every
      // explode; predicate pushdown then re-inlines the array-producing
      // expression into the scan filter, and for lambda-built arrays
      // (shingles) that filter is O(n²) PER ROW and interpreted —
      // measured 5x on shingle-explode pipelines. Our generate inputs
      // pre-filter emptiness explicitly, and explode(outer=false) drops
      // empty arrays anyway, so the rule only costs here.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      // the SQL status store tracks every execution even with the UI off;
      // a 150-query suite at 3 runs each (iterative queries emit ~15
      // executions per run) drives the in-memory store permanently past
      // its retention cap, and then EVERY job completion pays an O(live)
      // prune on the driver — the tail queries of a long resident session
      // bill for the whole history. Keep only a small working set.
      .config("spark.sql.ui.retainedExecutions", "32")
      .config("spark.ui.retainedJobs", "200")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")
      // the generated-class cache holds 100 entries by default; a
      // ~250-query resident suite compiles ~3 codegen units per query,
      // so by the time a query re-runs its classes are long evicted and
      // Janino recompiles from scratch — the measured mid-suite 1.5-2.7x
      // tail inflation. Size the cache to the suite (entries are
      // class references; the code they point at lives in the JVM code
      // cache we already reserve 2 GiB for).
      .config("spark.sql.codegen.cache.maxEntries", "4096")

  def get(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
