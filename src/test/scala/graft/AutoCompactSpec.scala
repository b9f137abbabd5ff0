package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sinks.ManifestTable
import java.nio.file.Files

/** Post-commit AUTO-COMPACT (VERDICT r17 #5): with the table property
  * set, append-shaped commits bin-pack accumulated small files inline
  * (dataChange = false), so streaming/micro-append workloads keep a
  * bounded live-file count without an OPTIMIZE operator in the loop.
  */
class AutoCompactSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fresh(): String =
    Files.createTempDirectory("graft_autoc").resolve("t").toString

  test("micro-appends keep a bounded file count; rows and history stay exact") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val t = fresh()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    ManifestTable.create(spark, t, schema, props = Map(
      ManifestTable.AutoCompactProp -> "true",
      ManifestTable.AutoCompactMinFilesProp -> "6"))
    // 20 tiny appends of 2 files each: without auto-compact the table
    // would end at 40 live files
    (0 until 20).foreach { k =>
      ManifestTable.append(spark,
        (0L until 10L).map(i => (k * 10L + i, s"v$k-$i"))
          .toDF("id", "v").repartition(2), t): Unit
    }
    val files = ManifestTable.currentFiles(spark, t)
    assert(files.size < 10,
      s"auto-compact must bound the live file count, got ${files.size}")
    val r = ManifestTable.read(spark, t)
    assert(r.count() == 200)
    assert(r.agg(sum("id")).head().getLong(0) == (0L until 200L).sum)
    // the compactions are dataChange = false commits named in history
    val hist = ManifestTable.history(spark, t)
    assert(hist.filter(col("operation") === "auto-compact").count() >= 1)
    // CONTROL: same workload without the property accretes files
    val t2 = fresh()
    ManifestTable.create(spark, t2, schema)
    (0 until 20).foreach { k =>
      ManifestTable.append(spark,
        (0L until 10L).map(i => (k * 10L + i, s"v$k-$i"))
          .toDF("id", "v").repartition(2), t2): Unit
    }
    assert(ManifestTable.currentFiles(spark, t2).size == 40)
  }

  test("change consumers skip the auto-compact commit; partitions survive") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val t = fresh()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("k", StringType)))
    ManifestTable.create(spark, t, schema, partitionCols = Seq("k"),
      props = Map(
        ManifestTable.AutoCompactProp -> "true",
        ManifestTable.AutoCompactMinFilesProp -> "4",
        ManifestTable.ChangeFeedProp -> "true"))
    (0 until 8).foreach { n =>
      ManifestTable.append(spark,
        Seq((n.toLong, s"p${n % 2}")).toDF("id", "k"), t): Unit
    }
    // row-level CDF across the whole history must deliver each row
    // exactly once — the dataChange=false compactions contribute no
    // change rows
    val changes = ManifestTable.rowChanges(spark, t, 1L,
      ManifestTable.currentVersion(spark, t))
    assert(changes.filter(col(ManifestTable.ChangeTypeCol) === "insert")
      .count() == 8)
    // the partition layout survives the rewrite (Hive dirs, pruning)
    val r = ManifestTable.read(spark, t)
    assert(r.filter(col("k") === "p0").count() == 4)
    assert(ManifestTable.currentFiles(spark, t)
      .filter(_.contains("k=")).nonEmpty)
  }
}
