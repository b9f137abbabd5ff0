package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.Ingest
import graft.transfer.Transfer

/** Tier-P parity pipelines exposed through the oracle gate: the
  * reference's ingest (sanitize → rename) and transfer (rename → cast)
  * surfaces, driven over the fixtures so DuckDB can replay them as
  * plain SELECT/alias/cast SQL.
  */
object Pipelines {

  /** O2+O3: ingest-side sanitize-then-rename. Dirty column names are
    * introduced by projection (the parquet fixtures are clean), then
    * the reference pipeline is applied: sanitize every column, sanitize
    * the mapping keys, rename. `Doc ID?`→`doc_id`→(mapping)→`id`.
    */
  def p01IngestRename(spark: SparkSession, sfDir: String): DataFrame = {
    val dirty = Tables.documents(spark, sfDir).select(
      col("doc_id").as("Doc ID?"),
      col("lang").as("Lang (ISO)"),
      col("source").as("Source-$Name"),
      col("n_chars").as("N/Chars %"))
    Ingest.renameSanitized(dirty, Map("Doc ID?" -> "id", "Lang (ISO)" -> "language"))
      .orderBy(col("id").asc_nulls_last)
  }

  val p01Sql: String =
    """SELECT doc_id AS id, lang AS language, source AS source_name, n_chars AS n_chars_
      |FROM documents ORDER BY id ASC NULLS LAST""".stripMargin

  /** O8/O15: the transfer plan (raw rename + ClickHouse sink casts —
    * here a boolean derived column becoming Int8/tinyint) as a lazy
    * DataFrame the oracle can replay with CAST.
    */
  def p02TransferCast(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      col("o_orderstatus"),
      (col("o_totalprice") > 200000.0).as("big"))
    Transfer.plan(src, Map("o_orderstatus" -> "status"), Transfer.RawRename, sinkCast = true)
      .orderBy(col("o_orderkey").asc_nulls_last)
  }

  val p02Sql: String =
    """SELECT o_orderkey, o_orderstatus AS status,
      |  CAST(o_totalprice > 200000.0 AS TINYINT) AS big
      |FROM orders ORDER BY o_orderkey ASC NULLS LAST""".stripMargin
}
