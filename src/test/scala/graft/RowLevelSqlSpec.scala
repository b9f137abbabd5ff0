package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.ManifestTable
import java.nio.file.Files

/** SQL UPDATE and MERGE INTO on graft catalog tables — the injected
  * GraftRowLevelRule rewriting the resolved V2 commands onto
  * ManifestTable.update/merge. Needs an extensions-enabled session
  * (built via the bridge because the test JVM's shared session may
  * predate this suite).
  */
class RowLevelSqlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // ensure a context exists, then build a FRESH session with the
    // extension applied (extensions bind at session build only)
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
    val cat = s"rlsql${n.incrementAndGet()}"
    val wh = Files.createTempDirectory("graft_rlsql").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    (cat, wh)
  }

  test("UPDATE ... SET ... WHERE runs the copy-on-write update") {
    import spark.implicits._
    val (cat, wh) = freshCatalog()
    (0L until 100L).map(i => (i, s"tag${i % 3}", i))
      .toDF("id", "tag", "score").createOrReplaceTempView("rl_src")
    spark.sql(s"CREATE TABLE $cat.db.u AS " +
      "SELECT /*+ REPARTITION_BY_RANGE(5, id) */ id, tag, score FROM rl_src")
    val before = ManifestTable.currentFiles(spark, s"$wh/db/u")
    spark.sql(
      s"UPDATE $cat.db.u SET tag = 'HOT', score = score + 100 WHERE id >= 90")
    // narrowness survives the SQL path: only the [80,100) file rewrote
    val after = ManifestTable.currentFiles(spark, s"$wh/db/u")
    assert(after.toSet.intersect(before.toSet).size == 4,
      "SQL UPDATE must rewrite only the overlapping file")
    val hot = spark.sql(
      s"SELECT id, score FROM $cat.db.u WHERE tag = 'HOT' ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hot == (90L until 100L).map(i => (i, i + 100)))
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.db.u").head().getLong(0) == 100)
    // unconditional UPDATE touches every row
    spark.sql(s"UPDATE $cat.db.u SET score = 0")
    assert(spark.sql(s"SELECT sum(score) AS s FROM $cat.db.u").head().getLong(0) == 0)
  }

  test("MERGE INTO ... UPDATE SET * / INSERT * runs the keyed upsert") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    (0L until 10L).map(i => (i, s"old$i")).toDF("id", "tag")
      .createOrReplaceTempView("rl_target")
    spark.sql(s"CREATE TABLE $cat.db.m AS SELECT id, tag FROM rl_target")
    (5L until 15L).map(i => (i, s"new$i")).toDF("id", "tag")
      .createOrReplaceTempView("rl_updates")
    spark.sql(
      s"""MERGE INTO $cat.db.m t USING rl_updates s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = spark.sql(s"SELECT id, tag FROM $cat.db.m ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == (0L until 5L).map(i => (i, s"old$i")) ++
      (5L until 15L).map(i => (i, s"new$i")),
      s"matched rows replaced, new keys inserted, rest untouched: $rows")
  }

  test("unsupported shapes refuse loudly, table untouched") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .createOrReplaceTempView("rl_t3")
    spark.sql(s"CREATE TABLE $cat.db.r AS SELECT id, tag FROM rl_t3")
    def messageOf(body: => Unit): String = {
      val e = intercept[Exception](body)
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .flatMap(t => Option(t.getMessage)).mkString("; ")
    }
    // MERGE with a non-star matched action
    assert(messageOf(spark.sql(
      s"""MERGE INTO $cat.db.r t USING rl_t3 s ON t.id = s.id
         |WHEN MATCHED THEN DELETE""".stripMargin))
      .contains("ManifestTable.merge"))
    // UPDATE with a subquery condition
    assert(messageOf(spark.sql(
      s"UPDATE $cat.db.r SET tag = 'x' " +
        s"WHERE id IN (SELECT id FROM rl_t3)"))
      .contains("ManifestTable.update"))
    assert(spark.sql(s"SELECT * FROM $cat.db.r WHERE tag IN ('a','b')")
      .count() == 2, "refused commands must leave the table untouched")
  }
}
