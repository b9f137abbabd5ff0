package org.apache.spark.sql

import java.util.Locale

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sinks.ManifestTable

/** The lake MAINTENANCE DIALECT as first-class SQL statements — the
  * spellings Delta users type, served by a DELEGATING parser
  * (`injectParser`; unrecognized text falls through to Spark's parser
  * untouched, so the extension can never break standard SQL):
  *
  * {{{
  * VACUUM lake.ns.t [RETAIN n VERSIONS] [RETAIN n HOURS] [DRY RUN] [FORCE]
  * OPTIMIZE lake.ns.t [WHERE <cond>] [ZORDER BY (c1[, c2[, c3]])]
  * DESCRIBE HISTORY lake.ns.t
  * DESCRIBE DETAIL lake.ns.t
  * RESTORE [TABLE] lake.ns.t TO VERSION AS OF n
  * RESTORE [TABLE] lake.ns.t TO TIMESTAMP AS OF '...'
  * CONVERT TO GRAFT lake.ns.t | '/path/to/parquet'
  * CREATE TABLE lake.ns.t2 SHALLOW CLONE lake.ns.t [VERSION AS OF n | TIMESTAMP AS OF '...']
  * ALTER TABLE lake.ns.t SYNC IDENTITY
  * COPY INTO lake.ns.t FROM '/dir' [FILEFORMAT = F] [FORMAT_OPTIONS (...)] [FORCE = true]
  * ALTER TABLE lake.ns.t ADD CONSTRAINT name CHECK (expr)
  * ALTER TABLE lake.ns.t DROP CONSTRAINT [IF EXISTS] name
  * GENERATE symlink_format_manifest FOR TABLE lake.ns.t
  * }}}
  *
  * Each statement is the SAME operation the `CALL cat.system.*`
  * procedures and the programmatic API run — one more front door, not
  * a second implementation. `RETAIN n VERSIONS` maps to the
  * time-travel retention window (`keepVersions`); `RETAIN n HOURS`
  * maps to the in-flight-writer grace (`graceMs` — Delta's retention
  * horizon is an age bound, and so is ours). The table argument is a
  * `cat.ns.t` name whose catalog is a [[graft.catalog.GraftCatalog]],
  * or a quoted filesystem path (`VACUUM '/wh/db/t'`). Tables resolve
  * at EXECUTION time (the commands are `LeafRunnableCommand`s), so
  * EXPLAIN never touches the table.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlDialect.parse(sqlText, delegate)
      .getOrElse(GraftViewSupport.rewriteDdl(delegate.parsePlan(sqlText)))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlDialect {

  /** `cat.ns.t` / `t$...`-free table reference or quoted path → the
    * warehouse path, resolved through the owning catalog exactly as
    * the `table_changes` TVF does. Runs at COMMAND EXECUTION time.
    */
  private def pathOf(spark: SparkSession, ref: String,
      requireExists: Boolean = true): String = {
    val r = ref.trim
    if (r.startsWith("'") || r.startsWith("\"")) r.substring(1, r.length - 1)
    else if (r.contains("/")) r
    else {
      val segs = r.split("\\.")
      require(segs.length >= 2,
        s"maintenance statements take 'cat.ns.t' (a graft catalog " +
          s"table) or a quoted path, got '$r'")
      GraftColumnBridge.catalogPlugin(spark, segs.head) match {
        case g: graft.catalog.GraftCatalog =>
          val rest = segs.tail.mkString(".")
          if (requireExists) g.procTablePath(rest) else g.rawTablePath(rest)
        case other => throw new IllegalArgumentException(
          s"catalog '${segs.head}' is not a graft catalog " +
            s"(got ${other.getClass.getName})")
      }
    }
  }

  private def attrs(schema: StructType): Seq[Attribute] =
    DataTypeUtils.toAttributes(schema)

  // A table reference: quoted path or dotted identifier (no spaces)
  private val T = """('[^']+'|"[^"]+"|[\w.\$]+)"""
  private val Vacuum =
    (s"""(?is)\\s*VACUUM\\s+$T""" +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?""" +
      """(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?""" +
      """(\s+DRY\s+RUN)?(\s+FORCE)?\s*;?\s*""").r
  private val Optimize =
    s"""(?is)\\s*OPTIMIZE\\s+$T([\\s\\S]*?)\\s*;?\\s*""".r
  private val ZOrderBy = """(?is)\s*BY\s*\((.+)\)\s*""".r
  private val WhereTail = """(?is)\s*WHERE\b([\s\S]+)""".r
  private val DescHistory =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$T\\s*;?\\s*""".r
  private val DescDetail =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$T\\s*;?\\s*""".r
  private val RestoreV =
    (s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$T""" +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  private val RestoreT =
    (s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$T""" +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+('[^']+')\s*;?\s*""").r
  private val Convert =
    s"""(?is)\\s*CONVERT\\s+TO\\s+GRAFT\\s+$T\\s*;?\\s*""".r
  private val ShallowClone =
    (s"""(?is)\\s*CREATE\\s+TABLE\\s+$T\\s+SHALLOW\\s+CLONE\\s+$T""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+)|""" +
      """\s+TIMESTAMP\s+AS\s+OF\s+('[^']+'))?\s*;?\s*""").r
  private val CopyInto =
    (s"""(?is)\\s*COPY\\s+INTO\\s+$T\\s+FROM\\s+('[^']+')""" +
      """(?:\s+FILEFORMAT\s*=\s*(\w+))?""" +
      // quote-aware group: a ')' INSIDE a quoted option value must not
      // terminate the list (ADVICE r18 — `'pattern'=')'` truncated)
      """(?:\s+FORMAT_OPTIONS\s*\(((?:'[^']*'|[^)'])*)\))?""" +
      """(?:\s+FORCE\s*=\s*(true|false))?\s*;?\s*""").r
  private val OptPair = """'([^']*)'\s*=\s*'([^']*)'""".r
  private val Generate =
    (s"""(?is)\\s*GENERATE\\s+symlink_format_manifest\\s+FOR\\s+""" +
      s"""TABLE\\s+$T\\s*;?\\s*""").r
  private val AddConstraint =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T""" +
      """\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private val DropConstraint =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T""" +
      """\s+DROP\s+CONSTRAINT\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*""").r
  private val SyncIdentity =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+SYNC\\s+IDENTITY\\s*;?\\s*""".r

  /** Index of the first occurrence of keyword `w` OUTSIDE quoted runs
    * (`'…'`, `"…"`, `` `…` ``) at a word boundary, case-insensitive;
    * -1 if absent. The quote-aware split the OPTIMIZE tail needs: a
    * WHERE predicate whose string literal contains "ZORDER BY (" must
    * stay part of the predicate, never become clustering columns
    * (ADVICE r15 low — regex-only statement splitting has no literal
    * awareness).
    */
  private def topLevelKeywordIndex(s: String, w: String): Int = {
    val up = s.toUpperCase(Locale.ROOT)
    val wu = w.toUpperCase(Locale.ROOT)
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    // track the ACTIVE literal-escaping mode (ADVICE r17 low): under
    // spark.sql.parser.escapedStringLiterals=true Spark treats
    // backslash as an ordinary character inside '…'/"…" (Hive-style
    // raw literals), so `'C:\'` is a CLOSED literal there — skipping
    // `\'` as an escape would swallow the rest of the statement into
    // the string and misparse a following ZORDER BY.
    val backslashEscapes =
      !SparkSession.active.sessionState.conf.escapedStringLiterals
    var i = 0
    var q: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // inside '…'/"…" a backslash escapes the next char (Spark's
      // default literal escaping): `'it\'s'` must not close at \' and
      // leak the rest of the literal to top level (ADVICE r16).
      // Backticked identifiers escape by doubling only — backslash is
      // an ordinary char there. Doubled quotes keep working via the
      // close-then-reopen toggle.
      if (q != 0) {
        if (backslashEscapes && c == '\\' && q != '`' && i + 1 < s.length)
          i += 2
        else { if (c == q) q = 0; i += 1 }
      }
      else if (c == '\'' || c == '"' || c == '`') { q = c; i += 1 }
      else if (up.startsWith(wu, i) &&
        (i == 0 || !isWordChar(s.charAt(i - 1))) &&
        (i + wu.length == s.length || !isWordChar(s.charAt(i + wu.length))))
        return i
      else i += 1
    }
    -1
  }

  /** `OPTIMIZE <t> <tail>` → command, with the tail split on the
    * top-level ZORDER keyword (quote-aware) into an optional WHERE
    * predicate and optional clustering columns. Malformed tails fall
    * through to Spark (None) for its parse error.
    */
  private def parseOptimizeTail(t: String,
      tail0: String): Option[LogicalPlan] = {
    val tail = tail0.trim
    val zi = topLevelKeywordIndex(tail, "ZORDER")
    val (preRaw, zcols) =
      if (zi < 0) (tail, Seq.empty[String])
      else tail.substring(zi + "ZORDER".length) match {
        case ZOrderBy(cols) => (tail.substring(0, zi),
          cols.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        case _ => return None
      }
    preRaw.trim match {
      case "" => Some(GraftOptimizeCommand(t, None, zcols))
      case WhereTail(cond) =>
        Some(GraftOptimizeCommand(t, Some(cond.trim), zcols))
      case _ => None
    }
  }

  /** Does `ref` denote a graft-ADDRESSABLE table — a quoted/slashed
    * path, or a multi-part name whose leading segment resolves to a
    * [[graft.catalog.GraftCatalog]]? STANDARD SQL spellings (ALTER
    * TABLE ...) are claimed only for these; everything else falls
    * through to Spark's own parser and DDL, so the dialect can never
    * hijack a session-catalog or foreign-catalog statement (ADVICE
    * r15 medium). Graft-ONLY spellings (VACUUM, OPTIMIZE, RESTORE, …)
    * keep resolving at execution and erroring loudly — they have no
    * Spark meaning to preserve.
    */
  private def isGraftRef(ref: String): Boolean = {
    val r = ref.trim
    if (r.startsWith("'") || r.startsWith("\"") || r.contains("/")) true
    else {
      val segs = r.split("\\.")
      segs.length >= 2 && SparkSession.getActiveSession.exists(sp =>
        try GraftColumnBridge.catalogPlugin(sp, segs.head)
          .isInstanceOf[graft.catalog.GraftCatalog]
        catch { case scala.util.control.NonFatal(_) => false })
    }
  }

  /** Try the dialect; None falls through to Spark's parser. Only
    * statements whose FIRST keyword matches are attempted, so the
    * regex cost on ordinary SQL is one cheap prefix check.
    */
  def parse(sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] = {
    val head = sqlText.trim.takeWhile(!_.isWhitespace)
      .toUpperCase(Locale.ROOT)
    head match {
      case "VACUUM" => sqlText match {
        case Vacuum(t, keep, hours, dry, force) =>
          Some(GraftVacuumCommand(t,
            Option(keep).map(_.toInt).getOrElse(1),
            Option(hours).map(h => (h.toDouble * 3600 * 1000).toLong),
            dryRun = dry != null, force = force != null))
        case _ => None
      }
      case "OPTIMIZE" => sqlText match {
        case Optimize(t, tail) => parseOptimizeTail(t, tail)
        case _ => None
      }
      case "DESC" | "DESCRIBE" => sqlText match {
        case DescHistory(t) => Some(GraftDescribeCommand(t, "history"))
        case DescDetail(t) => Some(GraftDescribeCommand(t, "detail"))
        case _ => None // plain DESCRIBE TABLE etc. → Spark
      }
      case "RESTORE" => sqlText match {
        case RestoreV(t, v) => Some(GraftRestoreCommand(t, Left(v.toLong)))
        case RestoreT(t, ts) =>
          Some(GraftRestoreCommand(t,
            Right(ts.substring(1, ts.length - 1))))
        case _ =>
          // RESTORE is OURS — a malformed body should say how to spell
          // it, not fall into Spark's "unknown statement"
          throw new IllegalArgumentException(
            "RESTORE takes: RESTORE [TABLE] <table> TO VERSION AS OF " +
              s"<n> | TO TIMESTAMP AS OF '<ts>' — got: $sqlText")
      }
      case "CONVERT" => sqlText match {
        case Convert(t) => Some(GraftConvertCommand(t))
        case _ => None
      }
      case "COPY" => sqlText match {
        case CopyInto(t, from, fmt, opts, force) =>
          val pairs = Option(opts).toSeq.flatMap { o =>
            // the whole group must be consumed by 'k'='v' pairs and
            // separators — a malformed pair silently dropped would be
            // an option silently ignored (ADVICE r18)
            val residue = OptPair.replaceAllIn(o, "")
              .replaceAll("[\\s,]+", "")
            if (residue.nonEmpty) throw new IllegalArgumentException(
              "COPY INTO FORMAT_OPTIONS must be 'k'='v' pairs " +
                s"separated by commas — unparsed text: $residue")
            OptPair.findAllMatchIn(o).map(m =>
              m.group(1) -> m.group(2)).toSeq
          }
          Some(GraftCopyIntoCommand(t,
            from.substring(1, from.length - 1),
            Option(fmt).map(_.toLowerCase(Locale.ROOT))
              .getOrElse("parquet"),
            pairs.toMap, force = force != null && force.toBoolean))
        case _ => throw new IllegalArgumentException(
          "COPY INTO takes: COPY INTO <table> FROM '<dir>' " +
            "[FILEFORMAT = PARQUET|CSV|JSON|ORC] [FORMAT_OPTIONS " +
            s"('k'='v', ...)] [FORCE = true] — got: $sqlText")
      }
      // SHALLOW CLONE is a graft-only spelling Spark cannot parse,
      // but its CREATE TABLE prefix is standard SQL: claim the
      // statement only when a side is graft-addressable, so a
      // foreign catalog with its own CLONE keeps it (ADVICE r16)
      case "CREATE" => sqlText match {
        case ShallowClone(tgt, src, ver, ts)
            if isGraftRef(tgt) || isGraftRef(src) =>
          Some(GraftCloneCommand(tgt, src,
            Option(ver).map(_.toLong).getOrElse(-1L),
            Option(ts).map(t => t.substring(1, t.length - 1))))
        case _ => None
      }
      case "GENERATE" => sqlText match {
        case Generate(t) => Some(GraftGenerateCommand(t))
        case _ => None
      }
      case "ALTER" => sqlText match {
        // the Delta ADD/DROP CONSTRAINT spellings, sugar over the
        // graft.constraints.* property channel (declaration still
        // validates the expression AND the existing rows); every
        // other ALTER form is Spark's — and so is THIS form on any
        // table that is not graft-addressable (Spark 4.1 ships its
        // own DSv2 constraint DDL; see isGraftRef)
        case AddConstraint(t, cname, expr) if isGraftRef(t) =>
          Some(GraftConstraintCommand(t, cname, Some(expr.trim),
            ifExists = false))
        case DropConstraint(t, ifEx, cname) if isGraftRef(t) =>
          Some(GraftConstraintCommand(t, cname, None,
            ifExists = ifEx != null))
        // the Delta SYNC IDENTITY verb — recompute identity
        // watermarks from the current data (same graft-ref guard)
        case SyncIdentity(t) if isGraftRef(t) =>
          Some(GraftSyncIdentityCommand(t))
        case _ => None
      }
      case _ => None
    }
  }

  final case class GraftGenerateCommand(ref: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      attrs(StructType.fromDDL("manifest_files INT"))
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(ManifestTable.generateSymlinkManifest(spark,
        GraftSqlDialect.pathOf(spark, ref))))
  }

  final case class GraftConstraintCommand(ref: String, cname: String,
      check: Option[String], ifExists: Boolean)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq.empty
    override def run(spark: SparkSession): Seq[Row] = {
      val p = GraftSqlDialect.pathOf(spark, ref)
      val key = ManifestTable.ConstraintPropPrefix + cname
      check match {
        case Some(expr) =>
          ManifestTable.updateProperties(spark, p, Map(key -> expr)): Unit
        case None =>
          if (!ManifestTable.tableProperties(spark, p).contains(key) &&
            !ifExists) throw new IllegalArgumentException(
            s"no constraint '$cname' on $ref — " +
              "use DROP CONSTRAINT IF EXISTS to ignore")
          ManifestTable.updateProperties(spark, p, Map.empty,
            unset = Seq(key)): Unit
      }
      Seq.empty
    }
  }

  final case class GraftConvertCommand(ref: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      attrs(StructType.fromDDL("converted_version BIGINT"))
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(ManifestTable.convertToGraft(spark,
        GraftSqlDialect.pathOf(spark, ref, requireExists = false))))
  }

  /** `CREATE TABLE t2 SHALLOW CLONE t1 [VERSION AS OF n]` — the
    * zero-copy snapshot ([[ManifestTable.cloneTable]]): t2's v1
    * references t1's live files where they already live.
    */
  final case class GraftCloneCommand(target: String, source: String,
      version: Long, timestamp: Option[String] = None)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      attrs(StructType.fromDDL("cloned_version BIGINT"))
    override def run(spark: SparkSession): Seq[Row] = {
      val srcPath = GraftSqlDialect.pathOf(spark, source)
      val v = timestamp.fold(version)(ts =>
        ManifestTable.versionAtTimestamp(spark, srcPath,
          ManifestTable.parseTimestampMillis(spark, ts)))
      Seq(Row(ManifestTable.cloneTable(spark, srcPath,
        GraftSqlDialect.pathOf(spark, target, requireExists = false),
        v)))
    }
  }

  /** `COPY INTO t FROM '<dir>' ...` — incremental exactly-once
    * landing-zone ingestion ([[ManifestTable.copyInto]]).
    */
  final case class GraftCopyIntoCommand(ref: String, sourceDir: String,
      format: String, options: Map[String, String], force: Boolean)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      attrs(StructType.fromDDL("version BIGINT, files_loaded INT"))
    override def run(spark: SparkSession): Seq[Row] = {
      val (v, n) = ManifestTable.copyInto(spark,
        GraftSqlDialect.pathOf(spark, ref), sourceDir, format, options,
        force)
      Seq(Row(v, n))
    }
  }

  final case class GraftVacuumCommand(ref: String, keepVersions: Int,
      graceMs: Option[Long], dryRun: Boolean, force: Boolean)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      if (dryRun) attrs(StructType.fromDDL("kind STRING, path STRING"))
      else attrs(StructType.fromDDL("deleted_objects INT"))
    override def run(spark: SparkSession): Seq[Row] = {
      val p = GraftSqlDialect.pathOf(spark, ref)
      val grace = graceMs.getOrElse(ManifestTable.DefaultVacuumGraceMs)
      if (dryRun)
        ManifestTable.vacuumReport(spark, p, keepVersions, grace)
          .collect().toSeq
      else Seq(Row(ManifestTable.vacuum(spark, p, keepVersions, grace,
        force)))
    }
  }

  final case class GraftOptimizeCommand(ref: String,
      where: Option[String], zorder: Seq[String])
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs(StructType.fromDDL(
      "files_before INT, files_after INT, bytes BIGINT"))
    override def run(spark: SparkSession): Seq[Row] = {
      val p = GraftSqlDialect.pathOf(spark, ref)
      val clusterBy = zorder.map(functions.col) match {
        case Seq() => Seq.empty
        case Seq(a) => Seq(a)
        case Seq(a, b) => Seq(graft.sinks.Sinks.zOrderKey(a, b))
        case Seq(a, b, c) => Seq(graft.sinks.Sinks.zOrderKey3(a, b, c))
        case more => throw new IllegalArgumentException(
          s"ZORDER BY supports up to 3 columns, got ${more.size}")
      }
      val st = ManifestTable.compact(spark, p,
        clusterBy = clusterBy, where = where.map(functions.expr))
      Seq(Row(st.filesBefore, st.filesAfter, st.totalBytes))
    }
  }

  final case class GraftDescribeCommand(ref: String, kind: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs(
      if (kind == "history") StructType.fromDDL(
        "version BIGINT, kind STRING, files_added INT, " +
          "files_removed INT, rows_added BIGINT, txns STRING, " +
          "quality STRING, ts_millis BIGINT, operation STRING, " +
          "op_params STRING")
      else StructType.fromDDL(
        "format STRING, location STRING, version BIGINT, " +
          "last_modified_millis BIGINT, " +
          "partition_columns ARRAY<STRING>, num_files BIGINT, " +
          "size_bytes BIGINT, num_rows BIGINT, " +
          "num_deletion_vectors BIGINT, properties STRING"))
    override def run(spark: SparkSession): Seq[Row] = {
      val p = GraftSqlDialect.pathOf(spark, ref)
      val df = if (kind == "history") ManifestTable.history(spark, p)
        else ManifestTable.detailReport(spark, p)
      df.collect().toSeq
    }
  }

  /** `ALTER TABLE t SYNC IDENTITY` ([[ManifestTable.syncIdentity]]). */
  final case class GraftSyncIdentityCommand(ref: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      attrs(StructType.fromDDL("synced_version BIGINT"))
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(ManifestTable.syncIdentity(spark,
        GraftSqlDialect.pathOf(spark, ref))))
  }

  final case class GraftRestoreCommand(ref: String,
      to: Either[Long, String]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs(StructType.fromDDL(
      "restored_to_version BIGINT, committed_version BIGINT"))
    override def run(spark: SparkSession): Seq[Row] = {
      val p = GraftSqlDialect.pathOf(spark, ref)
      val v = to match {
        case Left(n) => n
        case Right(ts) => ManifestTable.versionAtTimestamp(spark, p,
          ManifestTable.parseTimestampMillis(spark, ts))
      }
      Seq(Row(v, ManifestTable.restore(spark, p, v)))
    }
  }
}
