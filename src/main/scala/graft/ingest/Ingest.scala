package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Ingest surface: readers with schema inference, identifier
  * sanitization, and mapping-based renames.
  *
  * Reproduces the reference's sanitize/rename semantics exactly
  * (SURVEY.md O2/O3):
  *  - [[cleanName]] mirrors PostgresDatabase.py:106-118 — lowercase,
  *    then `space - / \` → `_` and `? % ( ) $` → removed.
  *  - [[renameSanitized]] mirrors PostgresDatabase.py:120-125 — ALL
  *    columns are sanitized first, and the mapping's KEYS are sanitized
  *    too before the rename is applied.
  *  - [[renameRaw]] mirrors the asymmetric PG→CH direction
  *    (ClickHouseDatabase.py:122-124), which renames WITHOUT
  *    sanitizing.
  *
  * All transforms are pure projections (`toDF` / `withColumnsRenamed`) —
  * zero shuffle, fused into the scan by Catalyst.
  */
object Ingest {

  /** Sanitize one identifier. Order matters only for idempotence tests;
    * each rule is independent character-wise.
    */
  def cleanName(name: String): String =
    name.toLowerCase
      .replace(" ", "_")
      .replace("?", "")
      .replace("-", "_")
      .replace("/", "_")
      .replace("\\", "_")
      .replace("%", "")
      .replace(")", "")
      .replace("(", "")
      .replace("$", "")

  /** Sanitize every column name (reference: applied before any rename). */
  def sanitizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(cleanName).toIndexedSeq: _*)

  /** Sanitize-then-rename: columns sanitized, mapping keys sanitized,
    * then mapping applied. Mapping values are used verbatim.
    */
  def renameSanitized(df: DataFrame, mapping: Map[String, String]): DataFrame = {
    val cleanedMapping = mapping.map { case (k, v) => cleanName(k) -> v }
    renameRaw(sanitizeColumns(df), cleanedMapping)
  }

  /** Plain rename without sanitization (PG→CH direction parity). */
  def renameRaw(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.toDF(df.columns.map(c => mapping.getOrElse(c, c)).toIndexedSeq: _*)

  /** CSV reader with inferred schema — the original offline stand-in
    * for the reference's Excel ingest; [[readExcel]] now covers the
    * real format too.
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Excel ingest (O1 parity, `pd.read_excel` at
    * PostgresDatabase.py:130) via the dependency-free [[Xlsx]] reader:
    * header row + inferred column types, same contract the reference
    * gets from pandas/openpyxl.
    */
  def readExcel(spark: SparkSession, path: String): DataFrame =
    Xlsx.readXlsx(spark, path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Table name defaulting rule from the reference ingest pipeline
    * (PostgresDatabase.py:133-134): sanitized source-file basename.
    */
  def defaultTableName(sourcePath: String): String = {
    val base = new java.io.File(sourcePath).getName
    val noExt = base.lastIndexOf('.') match {
      case -1 => base
      case i  => base.substring(0, i)
    }
    cleanName(noExt)
  }

  /** Cast columns to target types by name; untouched columns pass through. */
  def castColumns(df: DataFrame, casts: Map[String, org.apache.spark.sql.types.DataType]): DataFrame = {
    val cols: Seq[Column] = df.columns.toIndexedSeq.map { c =>
      casts.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))
    }
    df.select(cols: _*)
  }
}
