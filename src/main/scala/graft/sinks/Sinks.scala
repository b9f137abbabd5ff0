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
