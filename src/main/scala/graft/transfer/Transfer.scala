package graft.transfer

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.ingest.Ingest
import graft.types.TypeMap

/** Direction-agnostic table transfer: read → (rename) → cast → write.
  *
  * Re-expresses the reference's three pipelines (SURVEY.md E1-E3,
  * O6/O8/O15) as one lazy Spark plan. Where the reference materializes
  * the whole table in driver memory (`fetchall`, md.md:163's own
  * "known cliff"), this streams through executors: a JDBC source is
  * read with `partitionColumn/numPartitions` so a 100 TB table becomes
  * N parallel range scans, and the write is Spark's batched JDBC /
  * parquet writer — no single-process bottleneck.
  *
  * Offline harness note: the environment has no network, so JDBC
  * paths are exercised via parquet stand-ins (SURVEY.md §5.5); the
  * JDBC option plumbing is kept in [[JdbcSpec]] as pure config.
  */
object Transfer {

  /** How a transfer direction treats the rename mapping — the reference
    * sanitizes on the →PG direction but not on →CH (SURVEY.md §3 E2/E3
    * asymmetry, preserved deliberately).
    */
  sealed trait RenameMode
  case object SanitizeKeys extends RenameMode // CH→PG, Excel→PG (O3)
  case object RawRename extends RenameMode    // PG→CH (O15)

  /** Pure JDBC source/sink config — what we'd pass on a cluster. */
  final case class JdbcSpec(
      url: String,
      table: String,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 32,
      batchSize: Int = 10000,
      currentSchema: Option[String] = None) {
    def readOptions: Map[String, String] =
      Map("url" -> url, "dbtable" -> table,
        "numPartitions" -> numPartitions.toString) ++
        partitionColumn.map("partitionColumn" -> _) ++
        currentSchema.map(s => "options" -> s"-c search_path=$s")
    def writeOptions: Map[String, String] =
      Map("url" -> url, "dbtable" -> table, "batchsize" -> batchSize.toString)
  }

  /** The transfer plan: rename per direction, apply sink-side casts
    * (e.g. bool→UInt8 for ClickHouse), keep everything lazy.
    */
  def plan(
      src: DataFrame,
      mapping: Map[String, String],
      mode: RenameMode,
      sinkCast: Boolean = false): DataFrame = {
    val renamed = mode match {
      case SanitizeKeys => Ingest.renameSanitized(src, mapping)
      case RawRename    => Ingest.renameRaw(src, mapping)
    }
    if (!sinkCast) renamed
    else {
      val casts = renamed.schema.fields
        .map(f => f.name -> TypeMap.clickHouseWriteCast(f.dataType))
        .filter { case (n, t) => renamed.schema(n).dataType != t }
        .toMap
      Ingest.castColumns(renamed, casts)
    }
  }

  /** Execute a transfer into a parquet sink (offline stand-in for the
    * JDBC bulk load; `overwrite` preserves the reference's destructive
    * DROP+CREATE semantics on the PG path, `append` the CH
    * CREATE IF NOT EXISTS + insert semantics).
    */
  def runToParquet(
      src: DataFrame,
      mapping: Map[String, String],
      mode: RenameMode,
      outPath: String,
      overwrite: Boolean = true,
      sinkCast: Boolean = false): Unit =
    plan(src, mapping, mode, sinkCast).write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
      .parquet(outPath)

  /** Execute a transfer into a REAL JDBC sink — the wire path the
    * reference drives with psycopg2 COPY / clickhouse insert_df.
    * Spark's batched JDBC writer replaces both: `overwrite` drops and
    * recreates the table (the reference's destructive PG semantics),
    * `append` inserts (the CH semantics). Exercised end-to-end in
    * TransferSpec against embedded Derby (the one JDBC engine on this
    * classpath); on a cluster the same call takes the PG/CH URL.
    */
  def runToJdbc(
      src: DataFrame,
      mapping: Map[String, String],
      mode: RenameMode,
      spec: JdbcSpec,
      overwrite: Boolean = true,
      sinkCast: Boolean = false): Unit =
    plan(src, mapping, mode, sinkCast).write
      .format("jdbc")
      .options(spec.writeOptions)
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
      .save()

  /** Read a JDBC table (partitioned range scan when the spec carries a
    * partitionColumn + bounds).
    */
  def readJdbc(spark: SparkSession, spec: JdbcSpec): DataFrame =
    spark.read.format("jdbc").options(spec.readOptions).load()
}
