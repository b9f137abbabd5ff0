package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2's
  * inventory; [[oracleSql]] carries its DuckDB-runnable ANSI twin
  * (omitted only for non-SQL-expressible ops, which get unit tests and
  * a rows-only check instead).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_pricing_summary" -> (Relational.q01PricingSummary _),
    "p01_ingest_rename" -> (Pipelines.p01IngestRename _),
    "p02_transfer_cast" -> (Pipelines.p02TransferCast _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing_summary" -> Relational.q01Sql,
    "p01_ingest_rename" -> Pipelines.p01Sql,
    "p02_transfer_cast" -> Pipelines.p02Sql
  )
}
