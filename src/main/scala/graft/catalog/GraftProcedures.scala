package graft.catalog

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.ManifestTable

/** The SQL MAINTENANCE front door (VERDICT r13 next-round #1): the
  * lake operations a user types, served through Spark 4's DSv2 stored
  * procedures so `CALL` reaches the manifest protocol by name —
  *
  * {{{
  * CALL lake.system.compact(table => 'ns.t', target_file_mb => 256)
  * CALL lake.system.vacuum(table => 'ns.t', grace_ms => 0)
  * CALL lake.system.analyze(table => 'ns.t', columns => 'id,category')
  * CALL lake.system.restore(table => 'ns.t', version => 4)
  * }}}
  *
  * Each procedure binds its arguments through Spark's own
  * analysis/coercion (named or positional, defaults honored), runs the
  * SAME programmatic operation ([[ManifestTable.compact]]/`vacuum`/
  * `analyze`/`restore`) and returns its outcome as result rows — the
  * Iceberg `CALL catalog.system.*` surface shape. The reference drives
  * all maintenance by table NAME (`ETLManager.py:56-57`); this keeps
  * that contract on the SQL plane.
  *
  * `table` is a name IN THIS CATALOG (`ns.t` or just `t` for the
  * top-level namespace), never a path — the catalog derives the path
  * exactly as `loadTable` does, so the procedures observe the same
  * warehouse layout and path-traversal guards.
  */
private[catalog] object GraftProcedures {

  /** A bound procedure returning one row; binding is trivial because
    * every parameter is scalar (Spark already coerced the input row to
    * the declared parameter types).
    */
  private final class OneRow(
      procName: String,
      params: Array[ProcedureParameter],
      resultSchema: StructType,
      run: InternalRow => InternalRow)
    extends BoundProcedure with UnboundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft maintenance: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    // every maintenance call mutates or reads live table state
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): JIterator[Scan] = {
      val row = run(input)
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = Array(row)
        override def readSchema(): StructType = resultSchema
      }).iterator()
    }
  }

  /** Like [[OneRow]] but the body returns a LISTING (zero or more
    * rows of `resultSchema`) — the `vacuum_report` dry-run shape.
    */
  private final class Rows(
      procName: String,
      params: Array[ProcedureParameter],
      resultSchema: StructType,
      run: InternalRow => Array[InternalRow])
    extends BoundProcedure with UnboundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft maintenance: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): JIterator[Scan] = {
      val out = run(input)
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = resultSchema
      }).iterator()
    }
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType,
      defaultSql: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(defaultSql).build()

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** All procedures live in the `system` namespace, keyed by name.
    * `pathOf` maps a table-name argument to its warehouse path (the
    * catalog's own resolution, traversal-guarded).
    */
  def load(ident: Identifier, pathOf: String => String): UnboundProcedure = {
    if (!(ident.namespace().sameElements(Array("system"))))
      throw new NoSuchElementException(
        s"graft procedures live in the 'system' namespace, got " +
          s"${ident.namespace().mkString(".")}.${ident.name()}")
    def spark: SparkSession = SparkSession.active
    def tableArg(input: InternalRow): String = {
      require(!input.isNullAt(0), "table must not be null")
      pathOf(input.getUTF8String(0).toString)
    }
    ident.name() match {
      case "compact" => new OneRow("compact",
        Array(in("table", StringType),
          inDefault("target_file_mb", LongType, "512"),
          inDefault("cluster_by", StringType, "''"),
          inDefault("where", StringType, "''")),
        StructType(Seq(
          StructField("files_before", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false),
          StructField("bytes", LongType, nullable = false))),
        { input =>
          // cluster_by = 'a' re-clusters on one key; 'a,b' Z-ORDERS
          // the rewrite across both (the OPTIMIZE ZORDER BY surface)
          val clusterCols =
            if (input.isNullAt(2)) Seq.empty
            else input.getUTF8String(2).toString.split(",").toSeq
              .map(_.trim).filter(_.nonEmpty)
          import org.apache.spark.sql.functions.col
          val clusterBy = clusterCols match {
            case Seq() => Seq.empty
            case Seq(a) => Seq(col(a))
            case Seq(a, b) => Seq(graft.sinks.Sinks.zOrderKey(col(a), col(b)))
            case Seq(a, b, c) =>
              Seq(graft.sinks.Sinks.zOrderKey3(col(a), col(b), col(c)))
            case more => throw new IllegalArgumentException(
              s"cluster_by supports up to 3 columns, got ${more.size} " +
                s"(${more.mkString(", ")})")
          }
          // where = 'lang = ''en''' scopes the rewrite to the files
          // that may hold matching rows (OPTIMIZE ... WHERE)
          val whereCond =
            if (input.isNullAt(3)) None
            else Option(input.getUTF8String(3).toString.trim)
              .filter(_.nonEmpty)
              .map(org.apache.spark.sql.functions.expr)
          val st = ManifestTable.compact(spark, tableArg(input),
            targetFileBytes = input.getLong(1) << 20,
            clusterBy = clusterBy, where = whereCond)
          InternalRow(st.filesBefore, st.filesAfter, st.totalBytes)
        })
      case "vacuum" => new OneRow("vacuum",
        Array(in("table", StringType),
          inDefault("keep_versions", IntegerType, "1"),
          inDefault("grace_ms", LongType,
            ManifestTable.DefaultVacuumGraceMs.toString),
          // force = true overrides the orphaned-consumer refusal
          // (VERDICT r14 #8) — the consumer then fails with re-sync
          // guidance on its next poll
          inDefault("force", org.apache.spark.sql.types.BooleanType,
            "false")),
        StructType(Seq(
          StructField("deleted_objects", IntegerType, nullable = false))),
        { input =>
          InternalRow(ManifestTable.vacuum(spark, tableArg(input),
            keepVersions = input.getInt(1), graceMs = input.getLong(2),
            force = !input.isNullAt(3) && input.getBoolean(3)))
        })
      case "describe_detail" => new Rows("describe_detail",
        Array(in("table", StringType)),
        StructType(Seq(
          StructField("format", StringType, nullable = false),
          StructField("location", StringType, nullable = false),
          StructField("version", LongType, nullable = false),
          StructField("last_modified_millis", LongType, nullable = false),
          StructField("partition_columns", StringType, nullable = false),
          StructField("num_files", LongType, nullable = false),
          StructField("size_bytes", LongType, nullable = true),
          StructField("num_rows", LongType, nullable = true),
          StructField("num_deletion_vectors", LongType, nullable = false),
          StructField("properties", StringType, nullable = false))),
        { input =>
          // the DESCRIBE DETAIL summary (also the t$detail metadata
          // table); partition columns render comma-joined here because
          // procedure results are scalar rows
          ManifestTable.detailReport(spark, tableArg(input)).collect()
            .map { r =>
              InternalRow(utf8(r.getString(0)), utf8(r.getString(1)),
                r.getLong(2), r.getLong(3),
                utf8(r.getSeq[String](4).mkString(",")), r.getLong(5),
                if (r.isNullAt(6)) null else r.getLong(6),
                if (r.isNullAt(7)) null else r.getLong(7),
                r.getLong(8), utf8(r.getString(9))): InternalRow
            }
        })
      case "vacuum_report" => new Rows("vacuum_report",
        Array(in("table", StringType),
          inDefault("keep_versions", IntegerType, "1"),
          inDefault("grace_ms", LongType,
            ManifestTable.DefaultVacuumGraceMs.toString)),
        StructType(Seq(
          StructField("kind", StringType, nullable = false),
          StructField("path", StringType, nullable = false))),
        { input =>
          // DRY RUN: everything a real vacuum with these parameters
          // would delete, plus orphaned-consumer rows — nothing is
          // touched
          ManifestTable.vacuumReport(spark, tableArg(input),
            keepVersions = input.getInt(1), graceMs = input.getLong(2))
            .collect()
            .map(r => InternalRow(utf8(r.getString(0)),
              utf8(r.getString(1))): InternalRow)
        })
      case "analyze" => new OneRow("analyze",
        Array(in("table", StringType),
          inDefault("columns", StringType, "''")),
        StructType(Seq(
          StructField("version", LongType, nullable = false))),
        { input =>
          val cols =
            if (input.isNullAt(1)) Seq.empty
            else input.getUTF8String(1).toString.split(",").toSeq
              .map(_.trim).filter(_.nonEmpty)
          InternalRow(ManifestTable.analyze(spark, tableArg(input), cols))
        })
      case "restore" => new OneRow("restore",
        Array(in("table", StringType), in("version", LongType)),
        StructType(Seq(
          StructField("restored_to_version", LongType, nullable = false),
          StructField("committed_version", LongType, nullable = false))),
        { input =>
          val v = input.getLong(1)
          InternalRow(v, ManifestTable.restore(spark, tableArg(input), v))
        })
      case other => throw new NoSuchElementException(
        s"unknown procedure system.$other (know: ${names.mkString(", ")})")
    }
  }

  val names: Seq[String] = Seq("analyze", "compact", "describe_detail",
    "restore", "vacuum", "vacuum_report")
}
