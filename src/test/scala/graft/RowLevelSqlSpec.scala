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

  test("CDC MERGE: conditional update/delete, column-list insert, not-matched-by-source") {
    import spark.implicits._
    val (cat, wh) = freshCatalog()
    (0L until 20L).map(i => (i, s"tag${i % 3}", i * 10))
      .toDF("id", "tag", "qty").createOrReplaceTempView("cdc_tgt")
    spark.sql(s"CREATE TABLE $cat.db.c AS " +
      "SELECT /*+ REPARTITION_BY_RANGE(4, id) */ id, tag, qty FROM cdc_tgt")
    val before = ManifestTable.currentFiles(spark, s"$wh/db/c")
    Seq((2L, "U", 999L), (4L, "D", 0L), (6L, "X", 7L), (100L, "I", 5L))
      .toDF("id", "op", "qty").createOrReplaceTempView("cdc_src")
    // the full CDC statement: conditional clauses, first-match order,
    // a SET mixing both sides, a column-list INSERT, and BOTH
    // by-source actions
    spark.sql(
      s"""MERGE INTO $cat.db.c t USING cdc_src s ON t.id = s.id
         |WHEN MATCHED AND s.op = 'D' THEN DELETE
         |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET qty = t.qty + s.qty
         |WHEN NOT MATCHED AND s.op = 'I' THEN INSERT (id, qty) VALUES (s.id, s.qty)
         |WHEN NOT MATCHED BY SOURCE AND t.id = 0 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND t.id >= 18 THEN UPDATE SET qty = -1
         |""".stripMargin)
    val rows = spark.sql(
      s"SELECT id, tag, qty FROM $cat.db.c ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getLong(2))).toSeq
    val expect =
      (1L until 20L).filter(_ != 4L).map { i =>
        val qty =
          if (i == 2L) 20L + 999L // matched U: t.qty + s.qty
          else if (i >= 18L) -1L // by-source update
          else i * 10 // untouched (incl. id 6: op X matches no clause)
        (i, s"tag${i % 3}", qty)
      } :+ ((100L, null, 5L)) // inserted with tag unassigned → null
    assert(rows == expect, s"CDC merge result:\n$rows\nvs\n$expect")
    // narrowness survives: ids live in 4 range files (0-4, 5-9, 10-14,
    // 15-19); only the files with actual changes (first and last)
    // rewrote — the op-X match and untouched ranges kept their files
    val after = ManifestTable.currentFiles(spark, s"$wh/db/c")
    assert(after.toSet.intersect(before.toSet).size == 2,
      s"only the changed files may rewrite: kept ${
        after.toSet.intersect(before.toSet).size} of ${before.size}")
    // duplicate source keys refuse (SQL MERGE cardinality contract)
    Seq((2L, "U", 1L), (2L, "D", 2L)).toDF("id", "op", "qty")
      .createOrReplaceTempView("cdc_dup")
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO $cat.db.c t USING cdc_dup s ON t.id = s.id
         |WHEN MATCHED THEN DELETE""".stripMargin))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString("; ")
      .contains("duplicate"), s"got: $e")
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
    // MERGE with a non-equi ON condition (no key equality to join on)
    assert(messageOf(spark.sql(
      s"""MERGE INTO $cat.db.r t USING rl_t3 s ON t.id > s.id
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
