package graft.types

import org.apache.spark.sql.types._

/** Canonical mapping between Spark Catalyst types and the PostgreSQL /
  * ClickHouse DDL types the reference engine synthesizes.
  *
  * Semantics preserved from the reference (see SURVEY.md §1.2):
  *  - ClickHouse columns are ALL wrapped `Nullable(...)` — the reference
  *    does this deliberately on every transferred column
  *    (ClickHouseDatabase.py:63-84).
  *  - Unknown / interval-like types degrade to string types on both
  *    sinks (PostgresDatabase.py:63,66; ClickHouseDatabase.py:81,84).
  *  - Booleans become UInt8 on the ClickHouse side
  *    (ClickHouseDatabase.py:78).
  *
  * Deliberate divergences (documented, SURVEY.md §1.2):
  *  - The reference's two PG maps disagree on float64 (`decimal` in
  *    PostgresDatabase.py:56 vs `DOUBLE PRECISION` in
  *    ClickHouseDatabase.py:166); we canonicalize on
  *    `double precision` — `decimal` without precision silently changes
  *    arithmetic semantics.
  *  - int64 → `bigint` (the reference's `int` in PostgresDatabase.py:58
  *    would overflow; its second map agrees with us,
  *    ClickHouseDatabase.py:169).
  */
object TypeMap {

  /** Spark type → PostgreSQL DDL type. Total: unknown → varchar. */
  def toPostgres(dt: DataType): String = dt match {
    case DoubleType             => "double precision"
    case FloatType              => "real"
    case LongType               => "bigint"
    case IntegerType            => "int"
    case ShortType              => "smallint"
    case ByteType               => "smallint"
    case BooleanType            => "boolean"
    case StringType             => "varchar"
    case _: TimestampType       => "timestamp"
    case TimestampNTZType       => "timestamp"
    case DateType               => "date"
    case d: DecimalType         => s"numeric(${d.precision},${d.scale})"
    case BinaryType             => "bytea"
    case _: DayTimeIntervalType => "varchar" // interval → string, reference parity
    case _                      => "varchar" // lossy fallback, reference parity
  }

  /** Spark type → ClickHouse DDL type, always Nullable(...). */
  def toClickHouse(dt: DataType): String = {
    val inner = dt match {
      case DoubleType             => "Float64"
      case FloatType              => "Float32"
      case LongType               => "Int64"
      case IntegerType            => "Int32"
      case ShortType              => "Int16"
      case ByteType               => "Int8"
      case BooleanType            => "UInt8" // reference parity: bool→UInt8
      case StringType             => "String"
      case _: TimestampType       => "DateTime"
      case TimestampNTZType       => "DateTime"
      case DateType               => "Date"
      case d: DecimalType         => s"Decimal(${d.precision},${d.scale})"
      case _                      => "String" // lossy fallback, reference parity
    }
    s"Nullable($inner)"
  }

  /** Casts applied before writing to a ClickHouse sink: Spark types the
    * CH DDL cannot hold natively (bool→UInt8 lives as Byte in Spark).
    */
  def clickHouseWriteCast(dt: DataType): DataType = dt match {
    case BooleanType            => ByteType
    case _: DayTimeIntervalType => StringType
    case _                      => dt
  }

  /** Nullable-everything rule for transferred schemas (CH side). */
  def nullableAll(schema: StructType): StructType =
    StructType(schema.fields.map(_.copy(nullable = true)))
}
