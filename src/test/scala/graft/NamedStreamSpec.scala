package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.ManifestTable
import java.nio.file.Files

/** Name-based streaming (VERDICT r14 #3): `readStream.table` through
  * the injected GraftNamedStreamRule and `writeStream.toTable` through
  * the V2 StreamingWrite — version-offset exactness, exactly-once sink
  * identity across restarts, partitioned staging, rate-limit option
  * passthrough, CDC reads, and the append-only refusal.
  */
class NamedStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val s = GraftColumnBridge.sessionWithExtensions(
      new GraftExtensions().apply(_))
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  private val n = new java.util.concurrent.atomic.AtomicInteger(0)
  private def freshCatalog(): (String, String) = {
    val cat = s"nstream${n.incrementAndGet()}"
    val wh = Files.createTempDirectory("graft_nstream").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    (cat, wh)
  }

  private def drainToTable(src: DataFrame, dst: String, ckpt: String)
      : Unit = {
    val q = src.writeStream.option("checkpointLocation", ckpt).toTable(dst)
    try q.processAllAvailable()
    finally q.stop()
  }

  test("named graft->graft pipeline: snapshot + incremental, exactly-once") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.db.src (id BIGINT, tag STRING)")
    spark.sql(s"CREATE TABLE $cat.db.dst (id BIGINT, tag STRING)")
    spark.sql(s"INSERT INTO $cat.db.src VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.db.src VALUES (3, 'c')")
    val ckpt = Files.createTempDirectory("graft_nsckpt").toString
    val q = spark.readStream.table(s"$cat.db.src")
      .writeStream.option("checkpointLocation", ckpt)
      .toTable(s"$cat.db.dst")
    try {
      q.processAllAvailable() // initial snapshot: both commits
      spark.sql(s"INSERT INTO $cat.db.src VALUES (4, 'd')")
      q.processAllAvailable() // incremental
    } finally q.stop()
    assert(spark.sql(s"SELECT id FROM $cat.db.dst ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // the sink published through the manifest commit protocol
    val ops = spark.sql(
      s"SELECT operation FROM $cat.db.`dst$$history` ORDER BY version")
      .collect().map(_.getString(0)).toSeq
    assert(ops == Seq("create", "streaming-append", "streaming-append"))
    // restart from the same checkpoint with nothing new: no batch, no
    // duplicate rows (version offsets + per-query watermark)
    drainToTable(spark.readStream.table(s"$cat.db.src"),
      s"$cat.db.dst", ckpt)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.dst").head().getLong(0)
      == 4L, "restart with no new commits must deliver nothing")
    // restart after one more commit: exactly the new rows
    spark.sql(s"INSERT INTO $cat.db.src VALUES (5, 'e')")
    drainToTable(spark.readStream.table(s"$cat.db.src"),
      s"$cat.db.dst", ckpt)
    assert(spark.sql(s"SELECT id FROM $cat.db.dst ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("toTable into a partitioned table: fragments + pruning work") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.db.psrc (id BIGINT, bkt BIGINT)")
    spark.sql(s"CREATE TABLE $cat.db.pdst (id BIGINT, bkt BIGINT) " +
      "PARTITIONED BY (bkt)")
    spark.sql(s"INSERT INTO $cat.db.psrc " +
      "SELECT id, id % 3 FROM range(0, 30)")
    val ckpt = Files.createTempDirectory("graft_nsckpt").toString
    drainToTable(spark.readStream.table(s"$cat.db.psrc"),
      s"$cat.db.pdst", ckpt)
    // rows landed under Hive fragments the manifest understands
    val files = ManifestTable.currentFiles(spark, s"$wh/db/pdst")
    assert(files.nonEmpty && files.forall(_.contains("bkt=")),
      s"expected Hive-partitioned staging, got $files")
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.db.pdst WHERE bkt = 1").head().getLong(0)
      == 10L)
    assert(spark.sql(s"SELECT sum(id) FROM $cat.db.pdst").head().getLong(0)
      == (0L until 30L).sum)
  }

  test("a replayed epoch publishes nothing (watermark identity)") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.db.rsrc (id BIGINT)")
    spark.sql(s"CREATE TABLE $cat.db.rdst (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.rsrc SELECT id FROM range(0, 10)")
    val ckpt = Files.createTempDirectory("graft_nsckpt").toString
    drainToTable(spark.readStream.table(s"$cat.db.rsrc"),
      s"$cat.db.rdst", ckpt)
    val v = ManifestTable.currentVersion(spark, s"$wh/db/rdst")
    // drive the SAME epoch id under the SAME app id by hand — the
    // exact shape of a crash between sink publish and checkpoint
    // commit, replayed on restart
    val app = ManifestTable.history(spark, s"$wh/db/rdst")
      .filter(col("operation") === "streaming-append")
      .select(get_json_object(col("op_params"), "$.txnAppId"))
      .head().getString(0)
    val replay = ManifestTable.appendStreamBatch(spark,
      spark.range(100, 110).toDF("id"), s"$wh/db/rdst",
      batchId = 0L, txnAppId = app)
    assert(replay == v, "epoch 0 is behind the watermark: no commit")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.rdst")
      .head().getLong(0) == 10L)
  }

  test("complete/update output modes refuse; append-only contract") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.db.csrc (id BIGINT)")
    spark.sql(s"CREATE TABLE $cat.db.cdst (id BIGINT, cnt BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.csrc SELECT id FROM range(0, 5)")
    val ckpt = Files.createTempDirectory("graft_nsckpt").toString
    val agg = spark.readStream.table(s"$cat.db.csrc")
      .groupBy(col("id")).agg(count(lit(1)).as("cnt"))
    val e = intercept[Exception] {
      val q = agg.writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .toTable(s"$cat.db.cdst")
      try q.processAllAvailable() finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("append-only")),
      s"expected the append-only refusal, got $e")
  }

  test("readStream.table passes options through: rate limit + CDC") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.db.osrc (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.osrc SELECT id FROM range(0, 4)")
    spark.sql(s"INSERT INTO $cat.db.osrc SELECT id FROM range(4, 8)")
    spark.sql(s"INSERT INTO $cat.db.osrc SELECT id FROM range(8, 12)")
    // tail post-snapshot commits one version per trigger
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "1")
      .option("startingVersion", "2")
      .table(s"$cat.db.osrc")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft_nsckpt").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches.synchronized { batches += b.count() }: Unit
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    assert(batches.toSeq == Seq(4L, 4L),
      s"startingVersion=2 + maxVersionsPerTrigger=1 => two 4-row " +
        s"batches, got $batches")
    // CDC read by name: schema gains the change columns; the feed
    // delivers the snapshot as inserts
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val cq = spark.readStream
      .option("readChangeFeed", "true")
      .table(s"$cat.db.osrc")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft_nsckpt").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        rows.synchronized {
          rows ++= b.groupBy(col("_change_type")).count().collect()
            .map(r => (r.getString(0), r.getLong(1)))
        }: Unit
      }
      .start()
    try cq.processAllAvailable()
    finally cq.stop()
    assert(rows.toSeq == Seq(("insert", 12L)))
  }
}
