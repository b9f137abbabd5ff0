package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sinks.ManifestTable
import java.nio.file.Files

/** Manifest-committed table: snapshot isolation, append, compaction,
  * vacuum, and the commit CAS.
  */
class ManifestTableSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshTable(): String =
    Files.createTempDirectory("graft_manifest").resolve("t").toString

  private def df(n: Int, tag: String) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, tag, i % 3)).toDF("id", "tag", "bucket")
  }

  test("write/read round-trip; overwrite bumps version; old snapshot readable") {
    val t = freshTable()
    val v1 = ManifestTable.write(spark, df(100, "a"), t)
    assert(v1 == 1L)
    assert(ManifestTable.read(spark, t).count() == 100)
    val v2 = ManifestTable.write(spark, df(40, "b"), t)
    assert(v2 == 2L)
    // current = new snapshot; the superseded snapshot is STILL fully
    // readable by version — its files were never touched by the commit
    assert(ManifestTable.read(spark, t).count() == 40)
    assert(ManifestTable.read(spark, t, version = 1).count() == 100)
    assert(ManifestTable.read(spark, t)
      .select("tag").distinct().collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("append commits old-files + new-files") {
    val t = freshTable()
    ManifestTable.write(spark, df(30, "a"), t)
    val v = ManifestTable.append(spark, df(12, "b"), t)
    assert(v == 2L)
    val got = ManifestTable.read(spark, t).groupBy("tag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 30L, "b" -> 12L))
  }

  test("partitioned layout survives: partition column readable, pruning path intact") {
    val t = freshTable()
    ManifestTable.write(spark, df(90, "a"), t, partitionCols = Seq("bucket"))
    val r = ManifestTable.read(spark, t)
    assert(r.columns.toSet == Set("id", "tag", "bucket"))
    val filtered = r.filter(col("bucket") === 1)
    assert(filtered.count() == 30)
    // the bucket predicate must reach the scan as a PARTITION filter
    // and the pruned file index must expose exactly one bucket dir —
    // the manifest's explicit file list does not defeat pruning
    val scans = filtered.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.exists(s => s.contains("PartitionFilters: [") &&
        s.contains("bucket#")),
      s"bucket predicate did not reach PartitionFilters:\n${scans.mkString("\n")}")
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scanExecs = filtered.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scanExecs.nonEmpty, "expected a FileSourceScanExec")
    assert(scanExecs.head.relation.location.listFiles(
        scanExecs.head.partitionFilters, scanExecs.head.dataFilters).size == 1,
      "expected exactly one surviving bucket partition after pruning")
  }

  test("compact reduces file count, preserves rows byte-identically") {
    val t = freshTable()
    // many small files: one per id via repartition
    ManifestTable.write(spark, df(60, "a").repartition(20), t)
    val filesBefore = ManifestTable.currentFiles(spark, t).size
    assert(filesBefore >= 20)
    val stats = ManifestTable.compact(spark, t)
    assert(stats.filesBefore == filesBefore)
    assert(stats.filesAfter < filesBefore)
    val got = ManifestTable.read(spark, t).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == (0 until 60).map(i => (i.toLong, "a", i % 3)))
  }

  test("vacuum removes superseded files; current snapshot intact") {
    val t = freshTable()
    ManifestTable.write(spark, df(50, "a"), t)
    ManifestTable.write(spark, df(20, "b"), t)
    val removed = ManifestTable.vacuum(spark, t)
    assert(removed > 0)
    assert(ManifestTable.read(spark, t).count() == 20)
    // the superseded manifest is gone too
    assertThrows[Exception](ManifestTable.read(spark, t, version = 1))
  }

  test("readChanges returns exactly the rows appended in the version range") {
    val t = freshTable()
    ManifestTable.write(spark, df(10, "a"), t)  // v1
    ManifestTable.append(spark, df(4, "b"), t)  // v2
    ManifestTable.append(spark, df(2, "c"), t)  // v3
    // (v1, v3]: both appended slices, never the base snapshot
    val d13 = ManifestTable.readChanges(spark, t, fromVersion = 1)
    assert(d13.groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("b" -> 4L, "c" -> 2L))
    // (v2, v3]: only the last slice
    val d23 = ManifestTable.readChanges(spark, t, fromVersion = 2, toVersion = 3)
    assert(d23.select("tag").distinct().collect().map(_.getString(0)).toSeq == Seq("c"))
    // (v3, v3]: empty, schema intact
    val d33 = ManifestTable.readChanges(spark, t, fromVersion = 3)
    assert(d33.count() == 0 && d33.columns.toSet == Set("id", "tag", "bucket"))
    // from 0 = everything
    assert(ManifestTable.readChanges(spark, t, fromVersion = 0).count() == 16)
  }

  test("vacuum keepVersions retains a time-travel window") {
    val t = freshTable()
    ManifestTable.write(spark, df(50, "a"), t) // v1
    ManifestTable.write(spark, df(20, "b"), t) // v2
    ManifestTable.write(spark, df(9, "c"), t)  // v3
    val removed = ManifestTable.vacuum(spark, t, keepVersions = 2)
    assert(removed > 0) // v1's files reclaimed
    // both retained versions still read in full
    assert(ManifestTable.read(spark, t, version = 2).count() == 20)
    assert(ManifestTable.read(spark, t).count() == 9)
    assertThrows[Exception](ManifestTable.read(spark, t, version = 1))
  }

  test("add-column schema evolution: old snapshots surface the new column as null") {
    val t = freshTable()
    ManifestTable.write(spark, df(10, "a"), t)
    ManifestTable.append(spark,
      df(5, "b").withColumn("score", col("id") * 2.0), t)
    val r = ManifestTable.read(spark, t)
    assert(r.columns.contains("score"))
    assert(r.filter(col("score").isNull).count() == 10)
    assert(r.filter(col("score").isNotNull).count() == 5)
  }

  test("exactly-once streaming append: replayed micro-batches fold in once") {
    import java.nio.file.StandardCopyOption
    import scala.jdk.CollectionConverters._
    import graft.streaming.StreamingOps
    val base = Files.createTempDirectory("graft_mt_stream")
    val watched = Files.createDirectory(base.resolve("watch"))
    val table = base.resolve("table").toString
    // two event files -> two micro-batches (maxFilesPerTrigger=1)
    def writeFile(ids: Range, name: String, mtimeMs: Long): Unit = {
      val staging = Files.createTempDirectory("graft_mt_stage")
      val d = spark.createDataFrame(
        ids.map(i => org.apache.spark.sql.Row(
          i.toLong, i.toLong * 1000000000L, i.toLong, "view", 1.0, "{}")).asJava,
        StreamingOps.eventsSchema)
      d.coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(fail("no part file"))
      val target = watched.resolve(name)
      Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
      assert(target.toFile.setLastModified(mtimeMs))
    }
    writeFile(0 until 20, "b1.parquet", 1000000L)
    writeFile(20 until 30, "b2.parquet", 2000000L)
    val q = ManifestTable.streamInto(
      StreamingOps.eventsStream(spark, watched.toString,
        maxFilesPerTrigger = Some(1)),
      table, base.resolve("ckpt").toString, txnAppId = "q1")
    try q.processAllAvailable()
    finally q.stop()
    assert(ManifestTable.read(spark, table).count() == 30)
    assert(ManifestTable.lastStreamBatchId(spark, table, "q1").contains(1L))
    // replay of an already-committed batch id is a no-op (the crash-
    // between-write-and-checkpoint case)
    val vBefore = ManifestTable.currentVersion(spark, table)
    import spark.implicits._
    val replay = (0 until 20).map(_.toLong).toDF("event_id")
    assert(ManifestTable.appendStreamBatch(
      spark, replay, table, batchId = 1L, txnAppId = "q1") == vBefore)
    assert(ManifestTable.read(spark, table).count() == 30)
    // the NEXT batch id still commits
    val v = ManifestTable.appendStreamBatch(
      spark, df(3, "x"), table, batchId = 2L, txnAppId = "q1")
    assert(v == vBefore + 1)
    assert(ManifestTable.lastStreamBatchId(spark, table, "q1").contains(2L))
    // a DIFFERENT query's batch 0 is NOT swallowed by q1's watermark
    val v2 = ManifestTable.appendStreamBatch(
      spark, df(5, "y"), table, batchId = 0L, txnAppId = "q2")
    assert(v2 == v + 1)
    assert(ManifestTable.lastStreamBatchId(spark, table, "q2").contains(0L))
    assert(ManifestTable.lastStreamBatchId(spark, table, "q1").contains(2L))
  }

  test("partition values with commas and quotes survive the manifest round-trip") {
    import spark.implicits._
    val t = freshTable()
    val d = Seq((1L, "en,US"), (2L, "de\"x"), (3L, "plain"))
      .toDF("id", "lang")
    ManifestTable.write(spark, d, t, partitionCols = Seq("lang"))
    ManifestTable.append(spark, Seq((4L, "en,US")).toDF("id", "lang"), t)
    val got = ManifestTable.read(spark, t).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("en,US" -> 2L, "de\"x" -> 1L, "plain" -> 1L), got)
    // vacuum must not misparse the list into garbage paths and delete
    // live data
    ManifestTable.vacuum(spark, t)
    assert(ManifestTable.read(spark, t).count() == 4)
  }

  test("URI-shaped txn app ids (colons) round-trip; legacy streamBatchId manifests still honored") {
    val t = freshTable()
    // colons in the app id — streamInto's default is a checkpoint URI
    val app = "file:/tmp/ckpt:q1"
    ManifestTable.appendStreamBatch(spark, df(6, "a"), t, batchId = 0L,
      txnAppId = app)
    ManifestTable.appendStreamBatch(spark, df(3, "b"), t, batchId = 1L,
      txnAppId = app)
    assert(ManifestTable.lastStreamBatchId(spark, t, app).contains(1L))
    val v = ManifestTable.currentVersion(spark, t)
    assert(ManifestTable.appendStreamBatch(spark, df(3, "b"), t,
      batchId = 1L, txnAppId = app) == v) // replay no-op
    assert(ManifestTable.read(spark, t).count() == 9)

    // a pre-txn-map manifest (single streamBatchId) maps to the
    // default app, so an upgrade does not drop the watermark
    val t2 = freshTable()
    ManifestTable.write(spark, df(5, "a"), t2)
    val p2 = new org.apache.hadoop.fs.Path(t2)
    val fs = p2.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = ManifestTable.currentFiles(spark, t2)
      .map("\"" + _ + "\"").mkString(",")
    val legacy = new org.apache.hadoop.fs.Path(t2, "_manifests/v000000000002.json")
    val out = fs.create(legacy, false)
    out.write(s"""{"version":2,"files":[$files],"streamBatchId":7}"""
      .getBytes("UTF-8")); out.close()
    assert(ManifestTable.lastStreamBatchId(spark, t2).contains(7L))
    val v2 = ManifestTable.currentVersion(spark, t2)
    assert(ManifestTable.appendStreamBatch(spark, df(2, "x"), t2,
      batchId = 7L) == v2) // already folded in per the legacy watermark
    assert(ManifestTable.read(spark, t2).count() == 5)
  }

  test("stream watermark survives batch commits: replay after compact is a no-op") {
    val t = freshTable()
    ManifestTable.appendStreamBatch(spark, df(8, "a"), t, batchId = 0L)
    ManifestTable.appendStreamBatch(spark, df(4, "b"), t, batchId = 1L)
    assert(ManifestTable.lastStreamBatchId(spark, t).contains(1L))
    ManifestTable.compact(spark, t)
    assert(ManifestTable.lastStreamBatchId(spark, t).contains(1L),
      "compact dropped the streaming idempotence watermark")
    val v = ManifestTable.currentVersion(spark, t)
    assert(ManifestTable.appendStreamBatch(spark, df(4, "b"), t, batchId = 1L) == v)
    assert(ManifestTable.read(spark, t).count() == 12)
  }

  test("commit CAS: a second writer racing the same version loses cleanly") {
    val t = freshTable()
    val v1files = {
      ManifestTable.write(spark, df(10, "a"), t)
      ManifestTable.currentFiles(spark, t)
    }
    val p = new org.apache.hadoop.fs.Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // two writers race the SAME next version: exactly one commit wins,
    // the loser's rename fails and its staged file is cleaned up
    assert(ManifestTable.commitManifest(fs, p, 2L, v1files))
    assert(!ManifestTable.commitManifest(fs, p, 2L, Seq.empty))
    assert(ManifestTable.currentFiles(spark, t, version = 2) == v1files)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(p, "_manifests"))
      .forall(!_.getPath.getName.contains(".tmp-")), "staged file leaked")
    // a loser's orphaned snapshot dir is reclaimed by vacuum after the
    // next successful commit
    ManifestTable.write(spark, df(7, "c"), t)
    assert(ManifestTable.vacuum(spark, t) > 0)
    assert(ManifestTable.read(spark, t).count() == 7)
  }
}
