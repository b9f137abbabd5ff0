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

  /** Morton (Z-order) interleave of two non-negative integer columns,
    * 16 bits each — the multi-dimensional clustering key behind
    * `writeZOrdered`. Bit-spreading uses the classic mask-and-shift
    * ladder (public-domain bit trick, cf. "Bit Twiddling Hacks"), five
    * codegen-friendly bitwise ops per operand — no UDF. Inputs are
    * masked to their low 16 bits: the key is a LAYOUT key only (rows
    * are clustered, never transformed), so truncation on >65535
    * domains degrades locality, not correctness; callers with wider
    * domains pre-scale (e.g. `col / width`) to 16 bits.
    */
  def zOrderKey(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft}
    def spread(x0: org.apache.spark.sql.Column) = {
      val x = x0.cast("long").bitwiseAND(lit(0xFFFFL))
      val s1 = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Z-ordered data-skipping layout — `writeSorted`'s answer when TWO
    * columns carry selective predicates: a single-column sort gives
    * one dimension perfect row-group locality and the other none,
    * while clustering on the Morton interleave bounds BOTH columns'
    * min/max ranges per row group, so either predicate alone skips
    * groups at the reader (the OPTIMIZE ZORDER pattern from the lake
    * engines, expressed as a plain range-partition + in-file sort —
    * no custom writer). Files cover disjoint Z-ranges via the range
    * exchange; groups inside each file are Z-contiguous.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      targetRowGroupBytes: Long = 128L << 20,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    import org.apache.spark.sql.functions.col
    val z = zOrderKey(col(colA), col(colB))
    df.repartitionByRange(z.asc)
      .sortWithinPartitions(z.asc)
      .write
      .mode(SaveMode.Overwrite)
      .option("parquet.block.size", targetRowGroupBytes)
      .option("maxRecordsPerFile", maxRecordsPerFile)
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
