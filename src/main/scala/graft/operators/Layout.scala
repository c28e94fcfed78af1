package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators (beyond the reference): Z-order (Morton-curve)
  * clustering for multi-dimensional scan pruning.
  *
  * Why it matters at 100 TB: parquet scan pruning works off per-file /
  * per-row-group min-max statistics. A table range-partitioned on ONE
  * key prunes on that key only — a filter on a second dimension reads
  * everything. Interleaving the bits of two (or more) dimensions into
  * one Morton key and range-partitioning + sorting on it gives every
  * file a tight bounding BOX in (x, y) space, so min-max pruning works
  * on BOTH dimensions at once — the standard layout trick for
  * fact tables queried by (customer, day), (region, time), etc.
  *
  * The interleave is a pure Column expression — a fixed sum of
  * `((x >> i) & 1) * 4^i` terms, non-overlapping bits, so it stays in
  * WholeStageCodegen and replays verbatim in the DuckDB oracle (q124).
  */
object Layout {

  /** Morton z-value of two non-negative dimensions, `bits` bits each
    * (result uses 2*bits low bits of a long; bits <= 31). Inputs are
    * range-checked with a loud failure rather than silently aliasing:
    * a value >= 2^bits would interleave into a key that sorts WRONG,
    * which corrupts the layout invisibly. Scale the dims down first
    * (quantile-bucket them) rather than raising bits past what the
    * query's literal replay can carry. */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val bound = 1L << bits
    val xc = x.cast("long"); val yc = y.cast("long")
    val guarded = when(xc >= 0 && xc < bound && yc >= 0 && yc < bound, lit(true))
      .otherwise(raise_error(concat(
        lit(s"zValue: dimension out of [0, $bound): x="), xc, lit(" y="), yc)))
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftright(xc, i).bitwiseAND(1) * lit(1L << (2 * i)),
          shiftright(yc, i).bitwiseAND(1) * lit(1L << (2 * i + 1)))
    }
    when(guarded, terms.reduce(_ + _))
  }

  /** Reference (driver-side) interleave for specs. */
  def zValueLocal(x: Long, y: Long, bits: Int = 21): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** The DuckDB-replayable SQL text of [[zValue]] — the oracle must
    * apply the identical arithmetic. */
  def zValueSql(x: String, y: String, bits: Int = 21): String =
    (0 until bits).flatMap { i =>
      Seq(s"((CAST($x AS BIGINT) >> $i) & 1) * ${1L << (2 * i)}",
          s"((CAST($y AS BIGINT) >> $i) & 1) * ${1L << (2 * i + 1)}")
    }.mkString("(", " + ", ")")

  /** Re-layout a frame along the z-curve of two dimensions: range
    * partition on the z-value (one shuffle, sampled range bounds), sort
    * within partitions, drop the helper column. Writing the result
    * gives files whose (x, y) bounding boxes are tight — min-max
    * pruning then works for filters on either or both dims. */
  def zOrderLayout(df: DataFrame, x: Column, y: Column,
                   numPartitions: Int, bits: Int = 21): DataFrame = {
    val z = zValue(x, y, bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Hive-partitioned parquet write with per-partition file sizing: the
    * frame is shuffled on the partition columns (plus a bounded salt
    * when one partition value needs more than one file) so each output
    * directory receives exactly its rows from `filesPerPartition`
    * writer tasks — never the one-file-per-input-task explosion that
    * turns a 1000-task write into #tasks × #partitions small files, the
    * classic small-files failure at warehouse scale. Readers filtering
    * on the partition columns prune directories at PLANNING time
    * (PartitionFilters in the scan, verified by spec). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       filesPerPartition: Int = 1): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(filesPerPartition >= 1, s"filesPerPartition must be >= 1")
    val keys = partitionCols.map(col)
    val salted =
      if (filesPerPartition == 1) df.repartition(keys: _*)
      else df.repartition(
        (keys :+ pmod(spark_partition_id(), lit(filesPerPartition)).cast("int")): _*)
    salted.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Global 1-based row numbers in (sortCols) order WITHOUT the
    * single-partition window — the classic distributed id-assignment
    * primitive. Range-repartition on the sort key, sort within
    * partitions, then `zipWithIndex` (whose internal count pass is the
    * only extra job, O(#partitions) driver state) — every partition
    * numbers independently off its offset, so the plan scales with
    * partition count where `row_number() OVER (ORDER BY ...)` funnels
    * 100 TB through one task. Output is deterministic whenever the
    * sort key is a total order (make it unique — append the row's id
    * column); range boundaries may vary, numbers cannot. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      rnCol: String = "rn"): DataFrame = {
    require(sortCols.nonEmpty, "globalRowNumber needs sort columns")
    val spark = df.sparkSession
    val parted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      parted.schema.fields :+
        org.apache.spark.sql.types.StructField(rnCol,
          org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = parted.rdd.zipWithIndex.map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Small-file compaction: rewrite a parquet location into
    * ceil(rows / targetRowsPerFile) files. The repartition count comes
    * from a bounded count action; content is unchanged (spec-gated).
    * Run this on the landing zone a streaming sink dribbles 1000-row
    * files into — scan planning cost is per-file, and a 100 TB table of
    * kilobyte files spends longer listing than reading. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
                     inPath: String, outPath: String,
                     targetRowsPerFile: Long): Unit = {
    require(targetRowsPerFile >= 1, "targetRowsPerFile must be >= 1")
    val df = spark.read.parquet(inPath)
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartition(files).write.mode("overwrite").parquet(outPath)
  }

  /** First-fit-decreasing bin packing per group — the compaction
    * planner's kernel (pack small files into capacity-C output files,
    * task-size items into executor slots, …). Items sort (size DESC,
    * id) and fold through a bin-load ARRAY state: each item lands in
    * the FIRST bin with room, else opens a new bin — sequential per
    * group by design (greedy order matters), parallel across groups,
    * pure integer arithmetic so the DuckDB oracle replays the exact
    * packing. Oversized items (> capacity) open their own over-full
    * bin and are counted loudly rather than dropped. */
  /** Max-weight non-overlapping interval selection per resource
    * (weighted interval scheduling): the optimal-substructure DP folded
    * over (end, start, weight) in end order with an [end, bestPrefix]
    * array state — bestBefore(start) is a filtered array max over the
    * already-processed prefix, so the fold is O(n^2) per key on pure
    * integers, sequential per key, parallel across keys. Bound the
    * per-key interval count (filter the time range) before calling;
    * the state array is exactly the per-key item count. */
  def weightedIntervalBest(df: DataFrame, key: Column, start: Column,
                           end: Column, weight: Column): DataFrame = {
    val base = df.select(key.as("k"), start.cast("long").as("s"),
        end.cast("long").as("e"), weight.cast("long").as("w"))
      .where(col("e") >= col("s"))
    val seq = base.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("w")).as("total_w"),
        array_sort(collect_list(struct(col("e"), col("s"), col("w"))))
          .as("arr"))
    val emptyState =
      expr("CAST(array() AS array<struct<e:bigint,best:bigint>>)")
    val folded = aggregate(col("arr"), emptyState,
      (acc, it) => {
        val bestBefore = coalesce(array_max(transform(
          filter(acc, p => p.getField("e") <= it.getField("s")),
          p => p.getField("best"))), lit(0L))
        val lastBest = coalesce(element_at(acc, -1).getField("best"),
          lit(0L))
        concat(acc, array(struct(it.getField("e").as("e"),
          greatest(lastBest, bestBefore + it.getField("w")).as("best"))))
      })
    seq.select(col("k").as("key"), col("n"), col("total_w"),
      coalesce(element_at(folded, -1).getField("best"), lit(0L))
        .as("best_w"),
      round(coalesce(element_at(folded, -1).getField("best"), lit(0L))
        .cast("double") / col("total_w").cast("double"), 6).as("kept_frac"))
  }

  def ffdBinPack(df: DataFrame, group: Column, item: Column,
                 itemSize: Column, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val seq = df.select(group.as("g"), item.as("it"),
        itemSize.cast("long").as("sz"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_items"), sum(col("sz")).as("total"),
        sum(when(col("sz") > capacity, 1L).otherwise(0L)).as("n_oversize"),
        array_sort(collect_list(struct((-col("sz")).as("ns"),
          col("it").as("it"), col("sz").as("sz")))).as("arr"))
    val bins = aggregate(
      expr("slice(arr, 2, size(arr) - 1)"),
      array(element_at(col("arr"), 1).getField("sz")),
      (acc, e) => {
        val x = e.getField("sz")
        val pos = array_position(
          transform(acc, b => b + x <= lit(capacity)), true)
        when(pos > 0,
          transform(acc, (b, i) =>
            when(i.cast("long") === pos - 1, b + x).otherwise(b)))
          .otherwise(concat(acc, array(x)))
      })
    seq.select(col("g").as("key"), col("n_items"), col("total"),
      col("n_oversize"), size(bins).cast("long").as("n_bins"),
      array_max(bins).as("max_bin"),
      round(col("total").cast("double") /
        (size(bins).cast("double") * lit(capacity.toDouble)), 6)
        .as("utilization"))
  }
}
