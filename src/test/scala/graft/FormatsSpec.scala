package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ingest.Ingest
import graft.ops.Tables

/** File-format coverage (SURVEY.md §2.2 formats row): CSV with header
  * + schema inference (the reference's Excel-ingest stand-in) and JSON
  * lines, round-tripped against the parquet source of truth.
  */
class FormatsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("CSV round-trip with header + inferSchema preserves values and types") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/nation"
    val src = Tables.nation(spark, sf)
    src.write.option("header", "true").csv(dir)
    val back = Ingest.readCsv(spark, dir)
    assert(back.schema("n_nationkey").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val a = src.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    val b = back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("JSON-lines round-trip preserves values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString + "/customer"
    val src = Tables.customer(spark, sf)
    src.write.json(dir)
    val back = spark.read.json(dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey").cast("int"),
        col("c_acctbal"), col("c_mktsegment"))
    val a = src.orderBy("c_custkey").collect().map(_.toSeq).toSeq
    val b = back.orderBy("c_custkey").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("ORC round-trip preserves values/types and pushes filters to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/orders"
    val src = Tables.orders(spark, sf)
    src.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == src.schema)
    val a = src.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val b = back.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(a == b)
    // the columnar ORC reader must receive both the predicate and the
    // 2-column projection — same pushdown contract as the parquet scans
    val q = back.filter(col("o_totalprice") > 100000.0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_totalprice), " +
      "GreaterThan(o_totalprice,100000.0)]"), scan)
    assert(scan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      scan)
  }

  test("dirty CSV headers sanitize through the ingest pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dirty").toString + "/r"
    import spark.implicits._
    Seq(("ann", 5)).toDF("Автор Отзыва?", "N-(Stars)")
      .write.option("header", "true").csv(dir)
    val ingested = Ingest.sanitizeColumns(Ingest.readCsv(spark, dir))
    assert(ingested.columns.toSeq == Seq("автор_отзыва", "n_stars"))
  }
}
