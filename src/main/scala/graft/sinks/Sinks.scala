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

  /** Three-dimensional Morton interleave, 10 bits per operand — the
    * 3-column clustering key (e.g. tenant × day-bucket × id-bucket).
    * Same contract as [[zOrderKey]]: a LAYOUT key only, inputs masked
    * to 10 bits (wider domains pre-scale; truncation degrades locality,
    * never correctness). The mask ladder is the classic 3D
    * bit-spreading sequence (public-domain bit trick), five bitwise
    * ops per operand, codegen-friendly — no UDF.
    */
  def zOrderKey3(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft}
    def spread3(x0: org.apache.spark.sql.Column) = {
      val x = x0.cast("long").bitwiseAND(lit(0x3FFL))
      val s1 = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x30000FFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 8)).bitwiseAND(lit(0x300F00FL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 4)).bitwiseAND(lit(0x30C30C3L))
      s3.bitwiseOR(shiftleft(s3, 2)).bitwiseAND(lit(0x9249249L))
    }
    spread3(a).bitwiseOR(shiftleft(spread3(b), 1))
      .bitwiseOR(shiftleft(spread3(c), 2))
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

  final case class CompactStats(
      filesBefore: Int, filesAfter: Int, totalBytes: Long)

  /** Session-scratch dirs queued for recursive deletion at JVM exit
    * (one hook total, registered lazily; adding a dir twice is a
    * no-op) — for operators that materialize an index/table under
    * java.io.tmpdir and read it lazily, so the dir must outlive the
    * call but not the JVM.
    */
  private val tmpCleanupDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val tmpCleanupHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => tmpCleanupDirs.forEach { d =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(d))
    }))
  private[graft] def registerTmpCleanup(dir: String): Unit = {
    tmpCleanupHook
    tmpCleanupDirs.add(dir): Unit
  }

  /** Session-unique scratch location for operators that materialize an
    * index/state table (d13's LSH band index, p17/p18's manifest
    * tables). Base dir comes from `spark.graft.scratchDir` — on a real
    * cluster set it to SHARED storage (the default java.io.tmpdir is
    * driver-local and only correct on local[*]); default-located
    * scratch is reclaimed at JVM exit, configured locations follow the
    * deployment's own retention (they may be on object stores where a
    * JVM hook is the wrong lifecycle).
    */
  private[graft] def sessionScratchPath(
      spark: org.apache.spark.sql.SparkSession, name: String): String = {
    val tmp = sys.props("java.io.tmpdir")
    val base = spark.conf.get("spark.graft.scratchDir", tmp)
    val dir = new org.apache.hadoop.fs.Path(base,
      s"graft_${name}_${spark.sparkContext.applicationId}").toString
    if (base == tmp) registerTmpCleanup(dir)
    dir
  }

  /** Small-file compaction — the lake-maintenance op every 100 TB
    * pipeline schedules: streaming ingests and per-batch writes leave
    * thousands of KB-sized files whose open/footer overhead dominates
    * scans, so periodically bin-pack them toward `targetFileBytes`
    * while PRESERVING the layout invariants readers rely on:
    *
    *  - `partitionCols` nonempty → each Hive partition's files merge
    *    within that partition (directory pruning untouched);
    *  - `sortCols` nonempty → rows are re-clustered exactly as
    *    [[writeSorted]] wrote them (range-partitioned across files,
    *    sorted within), so row-group min/max skipping KEEPS working
    *    on the compacted layout;
    *  - results are byte-identical rows — compaction is a file-count
    *    knob only (proven in CompactionSpec).
    *
    * File sizing uses rows as the byte proxy: one metadata-cheap
    * count + the listed byte total give bytes/row, and
    * `maxRecordsPerFile` bounds each output file near the byte
    * target. The rewrite stages into a sibling temp directory and
    * swaps by renaming the OLD directory aside first (path → _old,
    * tmp → path, delete _old): `path` is absent only between two
    * metadata renames, and a crash at any step leaves a complete
    * copy of the data on disk (worst case under `_compact_old`,
    * recoverable by hand). This is still only the filesystem
    * approximation of a table-format transaction-log commit — a
    * reader that lists in the rename gap can see a missing
    * directory; object stores and concurrent readers want the
    * log-based variant. Note also that the rewrite round-trips
    * through `spark.read.parquet`, which re-infers Hive partition
    * column TYPES from the directory values — a numeric-looking
    * string partition value would come back typed numeric; keep
    * partition values type-stable or pass an explicit schema.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      partitionCols: Seq[String] = Seq.empty,
      sortCols: Seq[String] = Seq.empty,
      targetFileBytes: Long = 512L << 20,
      targetRowGroupBytes: Long = 128L << 20): CompactStats = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.col
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Seq[org.apache.hadoop.fs.FileStatus] = {
      // listStatus walk, not fs.listFiles(recursive): the recursive
      // iterator's LocatedFileStatus wrapping forces a per-file
      // permission load — a process fork each on local FS without
      // libhadoop (see ManifestTable.listDataFiles)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.FileStatus]
      def walk(d: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(d).foreach { f =>
          if (f.isDirectory) walk(f.getPath)
          else {
            val n = f.getPath.getName
            if (!n.startsWith("_") && !n.startsWith(".")) buf += f
          }
        }
      walk(p)
      buf.toSeq
    }
    val before = dataFiles()
    if (before.isEmpty) return CompactStats(0, 0, 0L)
    val totalBytes = before.map(_.getLen).sum
    val df = spark.read.parquet(path)
    val totalRows = math.max(df.count(), 1L)
    val bytesPerRow = math.max(totalBytes / totalRows, 1L)
    val rowsPerFile = math.max(targetFileBytes / bytesPerRow, 1L)
    val nFiles = math.max(
      math.ceil(totalBytes.toDouble / targetFileBytes).toLong, 1L).toInt

    val clustered =
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
          .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(c => col(c).asc): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nFiles)

    val tmp = new Path(p.getParent, p.getName + "_compact_tmp")
    val w = clustered.write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", targetRowGroupBytes)
      .option("maxRecordsPerFile", rowsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    // swap only after the rewrite committed: old aside, tmp in, old
    // gone — `path` is never deleted before its replacement exists
    val old = new Path(p.getParent, p.getName + "_compact_old")
    fs.delete(old, true)
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compact: rename $p -> $old failed")
    if (!fs.rename(tmp, p)) {
      // best-effort restore; data was never deleted — but if the
      // restore ALSO fails the operator must know the only live copy
      // now sits under _compact_old
      val restored = fs.rename(old, p)
      throw new java.io.IOException(
        if (restored) s"compact: rename $tmp -> $p failed (original restored)"
        else s"compact: rename $tmp -> $p failed AND restore failed — " +
          s"the only live copy of the data is at $old")
    }
    fs.delete(old, true)
    CompactStats(before.size, dataFiles().size, totalBytes)
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
