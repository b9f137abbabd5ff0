package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink-side layout control for 100 TB outputs (SURVEY.md §2.2 sinks
  * row, scale dimension): partitioned directory layout for partition
  * pruning on read, and bucketing for shuffle-free co-located joins.
  */
object Sinks {

  /** Hive-style partitioned parquet: readers of `WHERE pcol = x` scan
    * one directory. The `maxRecordsPerFile` knob bounds file sizes so
    * downstream splits stay balanced.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      overwrite: Boolean = true,
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Sorted data-skipping layout — the third leg of 100 TB scan
    * avoidance next to partition pruning (directory level) and
    * bucketing (shuffle level): rows are clustered on `sortCols`
    * INSIDE each file, so every parquet row group's min/max footer
    * stats cover a narrow sort-key range and a selective predicate
    * skips whole row groups at the reader (Spark's vectorized parquet
    * reader evaluates PushedFilters against group stats before
    * decoding anything). With `partitionCols` the clustering runs
    * within each Hive partition (one task per partition value →
    * per-directory sorted files); without, the frame is RANGE
    * partitioned on the sort key first, so files cover disjoint key
    * ranges and skipping works at both file and group granularity.
    * `targetRowGroupBytes` sizes the skip quantum (default parquet
    * 128 MiB groups are the right grain for TB-scale tables; specs
    * shrink it to get many groups from fixture data).
    */
  def writeSorted(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      targetRowGroupBytes: Long = 128L << 20,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    import org.apache.spark.sql.functions.col
    val clustered =
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
          .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else
        df.repartitionByRange(sortCols.map(c => col(c).asc): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
    clustered.write
      .mode(SaveMode.Overwrite)
      .option("parquet.block.size", targetRowGroupBytes)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Bucketed + sorted table: both sides of a recurring equi join
    * bucketed by the join key join WITHOUT a shuffle (and without a
    * sort when also sorted). Requires the table catalog
    * (`saveAsTable`), which is how persistent warehouse tables are
    * written on a cluster.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int,
      sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }
}
