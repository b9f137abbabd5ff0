package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.spark_partition_id

/** Partition-layout control (100 TB operability): explicit
  * key-partitioning before wide stages, small-file compaction, and a
  * cheap partition-balance probe — the knobs a pipeline turns when
  * AQE's defaults aren't enough.
  */
object Partitioning {

  /** Hash-partition by key so a following per-key stage (window,
    * mapPartitions decode, bucketed write) sees co-located rows.
    */
  def byKey(df: DataFrame, n: Int, keys: Column*): DataFrame =
    df.repartition(n, keys: _*)

  /** Compact to ~`targetPartitions` output files WITHOUT a shuffle —
    * the small-files fix before a write. (`coalesce`, not
    * `repartition`: narrowing only.)
    */
  def compact(df: DataFrame, targetPartitions: Int): DataFrame =
    df.coalesce(targetPartitions)

  /** Rows per partition — the skew probe: a balanced layout has
    * max/mean near 1. Cheap (one count per partition, no data
    * movement).
    */
  def partitionHistogram(df: DataFrame): DataFrame =
    df.groupBy(spark_partition_id().as("partition"))
      .count()
      .orderBy("partition")
}
