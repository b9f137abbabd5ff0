package graft.ddl

import org.apache.spark.sql.types.StructType
import graft.types.TypeMap

/** DDL-string synthesis for the two sink dialects, mirroring the
  * reference's behavior (SURVEY.md O4/O12) as pure values so the
  * offline harness can assert them without a live database.
  */
object Ddl {

  /** PostgreSQL: destructive overwrite — DROP then CREATE
    * (PostgresDatabase.py:72-73). Returns both statements in order.
    */
  def postgresCreate(table: String, schema: StructType): Seq[String] = {
    val cols = schema.fields
      .map(f => s"${f.name} ${TypeMap.toPostgres(f.dataType)}")
      .mkString(", ")
    Seq(s"DROP TABLE IF EXISTS $table", s"CREATE TABLE $table ($cols)")
  }

  /** ClickHouse: idempotent create with engine clause
    * (ClickHouseDatabase.py:86-100). `engineParams` are used ONLY when
    * engine == "ReplicatedMergeTree" — the reference silently drops
    * them otherwise (ClickHouseDatabase.py:90), a rule we preserve as
    * part of the capability surface.
    */
  def clickHouseCreate(
      table: String,
      schema: StructType,
      engine: String = "MergeTree",
      engineParams: Seq[String] = Nil): String = {
    val cols = schema.fields
      .map(f => s"${f.name} ${TypeMap.toClickHouse(f.dataType)}")
      .mkString(", ")
    val engineClause =
      if (engine == "ReplicatedMergeTree" && engineParams.nonEmpty)
        s"ReplicatedMergeTree(${engineParams.mkString(", ")})"
      else engine
    s"CREATE TABLE IF NOT EXISTS $table ($cols) ENGINE = $engineClause ORDER BY tuple()"
  }

  /** Schema auto-create probe (ClickHouseDatabase.py:43-50 behavior). */
  def clickHouseCreateDatabase(db: String): String =
    s"CREATE DATABASE IF NOT EXISTS $db"

  /** Post-load grant (PostgresDatabase.py:95): the reference issues
    * `GRANT SELECT ... TO PUBLIC` inside the same transaction as every
    * COPY load, so read visibility is part of the load contract, not a
    * one-time setup step.
    */
  def postgresGrantAfterLoad(table: String): String =
    s"GRANT SELECT ON TABLE $table TO PUBLIC"

  /** The full PG load-path statement sequence: destructive recreate,
    * then (after the bulk COPY the caller performs) the public read
    * grant — the order the reference executes.
    */
  def postgresLoadSequence(table: String, schema: StructType): Seq[String] =
    postgresCreate(table, schema) :+ postgresGrantAfterLoad(table)
}
