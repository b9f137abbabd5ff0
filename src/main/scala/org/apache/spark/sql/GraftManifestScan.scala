package org.apache.spark.sql

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.DataSkipping
import graft.sinks.DataSkipping.FileStats

/** CATALYST-NATIVE manifest-table scan — the TahoeFileIndex
  * architecture from the open lake formats, reduced to its core: a
  * custom [[FileIndex]] whose `listFiles` consults the manifest's
  * per-file statistics, wrapped in a standard parquet
  * [[HadoopFsRelation]]. The payoff over the API-level
  * `ManifestTable.readWhere` is composability: the result is ONE
  * ordinary parquet relation, so a plain `.filter(...)` — or a filter
  * Catalyst pushes down from a join, a view, or SQL — arrives at
  * `listFiles` as resolved split conjuncts and prunes FILES before any
  * task is planned, with partition pruning and parquet row-group
  * pushdown still applying inside the survivors. `.explain` shows a
  * single FileScan with PushedFilters, and the whole plan stays inside
  * whole-stage codegen.
  *
  * The index is pinned to ONE resolved snapshot (files are immutable;
  * `refresh()` is a no-op) — the reader-side half of snapshot
  * isolation. Partition values come from the manifest file paths
  * (typed by inference: int → long → string), so Hive layouts work
  * without a catalog. The data schema is the parallel footer merge
  * across the snapshot's files — add-column evolution surfaces older
  * files' missing columns as nulls, same as `ManifestTable.read`.
  *
  * Lives in the `org.apache.spark.sql` package for the same reason the
  * lake formats' equivalents do: [[HadoopFsRelation]]/[[FileIndex]]
  * are `private[sql]` extension points.
  */
object GraftManifestScan {

  /** One manifest data file: table-relative path, its on-disk status,
    * its manifest statistics (None = legacy/unknown → never pruned),
    * and its partition values in `partCols` order (None = null).
    */
  final case class ManifestFile(rel: String, status: FileStatus,
      stats: Option[FileStats], partValues: Seq[Option[String]])

  /** Infer a partition column's type from its distinct string values —
    * Spark's own ladder truncated to the cases partition dirs actually
    * produce here: all-int → IntegerType, all-long → LongType, else
    * StringType.
    */
  private def inferType(values: Seq[String]): DataType = {
    def all(p: String => Boolean) = values.nonEmpty && values.forall(p)
    if (all(v => v.toIntOption.isDefined)) IntegerType
    else if (all(v => v.toLongOption.isDefined)) LongType
    else StringType
  }

  private def toCatalyst(v: Option[String], dt: DataType): Any = v match {
    case None => null
    case Some(s) => dt match {
      case ByteType => java.lang.Byte.valueOf(s.toByte)
      case ShortType => java.lang.Short.valueOf(s.toShort)
      case IntegerType => java.lang.Integer.valueOf(s.toInt)
      case LongType => java.lang.Long.valueOf(s.toLong)
      case FloatType => java.lang.Float.valueOf(s.toFloat)
      case DoubleType => java.lang.Double.valueOf(s.toDouble)
      case BooleanType => java.lang.Boolean.valueOf(s.toBoolean)
      // Catalyst internal for DateType is days-since-epoch Int — a
      // date-partitioned layout gets TYPED partition pruning instead
      // of scanning the column as strings (ADVICE r11)
      case DateType =>
        java.lang.Integer.valueOf(java.time.LocalDate.parse(s).toEpochDay.toInt)
      case _ => UTF8String.fromString(s)
    }
  }

  /** The stats-pruning [[FileIndex]]: `listFiles` keeps a file only if
    * every pushed conjunct MAY match its manifest ranges
    * ([[DataSkipping.mayMatch]] — partition values are part of the
    * stats, so partition and data predicates prune through one walk).
    */
  final class ManifestFileIndex(
      tableRoot: Path,
      files: Seq[ManifestFile],
      val partitionSchema: StructType,
      recordedSchema: Option[StructType] = None) extends FileIndex {

    override def rootPaths: Seq[Path] = Seq(tableRoot)

    private val partTypes = partitionSchema.fields.map(_.dataType).toSeq

    private[sql] def partRow(f: ManifestFile): Seq[Any] =
      f.partValues.zip(partTypes).map { case (v, dt) => toCatalyst(v, dt) }

    // one-entry memo: the planner asks the same pinned-snapshot index
    // the same question more than once per query (FileSourceStrategy,
    // estimateStatistics) — and the bloom tier does real sidecar I/O,
    // which should run once. Keyed on the filters' rendering; sound
    // because the snapshot is immutable and pruning is deterministic.
    @volatile private var lastCall
      : Option[(String, Seq[PartitionDirectory])] = None

    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val memoKey = (partitionFilters ++ dataFilters).map(_.toString)
        .mkString(";")
      lastCall match {
        case Some((k, res)) if k == memoKey => return res
        case _ => ()
      }
      // partitionFilters are a CORRECTNESS contract, not an
      // optimization: FileSourceStrategy REMOVES partition-only
      // predicates from the post-scan Filter, trusting the index to
      // apply them exactly — best-effort stats pruning here would
      // return unfiltered rows for any shape DataSkipping cannot
      // prove (modulus, UDF, stats-less file). Evaluate them the way
      // PartitioningAwareFileIndex does: bind to the partition row
      // and eval per file. (Dynamic pruning filters are stripped by
      // FileSourceScanExec before this call.)
      import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference => CAttr, BoundReference, Predicate => CPredicate}
      val exactPart: Option[org.apache.spark.sql.catalyst.expressions.BasePredicate] =
        partitionFilters.reduceOption(CAnd).map { pred =>
          CPredicate.createInterpreted(pred.transform {
            case a: CAttr =>
              val i = partitionSchema.fieldIndex(a.name)
              BoundReference(i, partitionSchema(i).dataType, nullable = true)
          })
        }
      // dataFilters stay in the post-scan Filter too, so manifest
      // statistics may prune them best-effort (fail-open is safe).
      // Generated-column derivation rides here: a data filter on the
      // SOURCE column of a generated PARTITION column implies bounds
      // on the partition value (`WHERE ts >= X` prunes `dt =
      // to_date(ts)` dirs) — prune-only conjuncts, the row filter
      // stays the original
      val normConjuncts = dataFilters.map(DataSkipping.normalize)
      val statConjuncts = normConjuncts ++ normConjuncts.flatMap(c =>
        graft.sinks.GeneratedPruning.derive(SparkSession.active,
          recordedSchema, partitionSchema.fieldNames.toSeq, c))
      val rangeKept = files.filter { f =>
        lazy val row = InternalRow.fromSeq(partRow(f))
        exactPart.forall(_.eval(row)) &&
          statConjuncts.forall(c => DataSkipping.mayMatch(f.stats, c))
      }
      // BLOOM tier (same fail-open contract): when surviving files
      // carry filters for an equality/IN conjunct's column, the
      // point-lookup pruning the native readWhere does also serves
      // SQL text through this index — planning-time sidecar reads,
      // exactly the Delta/Iceberg index-lookup shape
      val kept =
        if (statConjuncts.isEmpty ||
          !rangeKept.exists(_.stats.exists(_.bloom.nonEmpty))) rangeKept
        else {
          val pred = statConjuncts.reduce(
            org.apache.spark.sql.catalyst.expressions.And(_, _))
          val statsMap = rangeKept.flatMap(f => f.stats.map(f.rel -> _)).toMap
          val keptRels = graft.sinks.ManifestTable.bloomPrune(
            SparkSession.active, tableRoot, rangeKept.map(_.rel),
            statsMap, pred).toSet
          rangeKept.filter(f => keptRels.contains(f.rel))
        }
      val res = kept.groupBy(partRow).toSeq
        .sortBy(_._2.head.rel)
        .map { case (values, fs) =>
          PartitionDirectory(InternalRow.fromSeq(values),
            fs.map(f => FileStatusWithMetadata(f.status)))
        }
      lastCall = Some((memoKey, res))
      res
    }

    override def inputFiles: Array[String] =
      files.map(_.status.getPath.toString).toArray

    override def refresh(): Unit = () // pinned snapshot; files immutable

    override def sizeInBytes: Long = files.map(_.status.getLen).sum
  }

  /** Build the scan DataFrame over a resolved snapshot. `partCols` is
    * the manifest's recorded partition layout; files carry their
    * pre-parsed partition values. `recordedSchema` is the manifest's
    * schema-on-commit record: when present it IS the scan schema —
    * O(1) instead of the O(files) distributed footer merge, and
    * authoritative under evolution (the merge stays as the fallback
    * for tables written before schema recording).
    */
  /** The (data, partition) schemas of a resolved snapshot — shared by
    * the relation builder and the DSv2 catalog table. Partition types
    * come from the recorded schema when the dir-string codec covers
    * them, else from value inference; the data schema is the recorded
    * schema minus partition columns (falling back to the parallel
    * footer merge for pre-schema-on-commit tables), relaxed to
    * nullable for add-column evolution.
    */
  private[sql] def schemasOf(cs: classic.SparkSession,
      files: Seq[ManifestFile], partCols: Seq[String],
      recordedSchema: Option[StructType]): (StructType, StructType) = {
    val partitionSchema = StructType(partCols.zipWithIndex.map {
      case (c, i) =>
        // the recorded schema knows the TRUE partition type; fall back
        // to value inference for types the dir-string codec lacks
        val dt = recordedSchema.flatMap(_.fields.find(_.name == c))
          .map(_.dataType) match {
          case Some(t @ (ByteType | ShortType | IntegerType | LongType |
              FloatType | DoubleType | BooleanType | DateType |
              StringType)) => t
          // no dir-string codec (timestamp zone semantics, decimal
          // scale): fall back to inference so both read paths at least
          // agree on the inferable cases
          case _ => inferType(files.flatMap(_.partValues(i)))
        }
        StructField(c, dt)
    })
    val statuses = files.map(_.status)
    // asNullable: a column added by evolution is ABSENT from older
    // files — the scan can only fill nulls if the read schema allows
    // them (the same relaxation Spark's file-source resolution applies)
    val dataSchema = (recordedSchema match {
      case Some(s) =>
        StructType(s.fields.filterNot(f => partCols.contains(f.name)))
      case None => ParquetFileFormat
        .mergeSchemasInParallel(Map.empty[String, String], statuses, cs)
        .getOrElse(StructType(Nil))
    }).asNullable
    (dataSchema, partitionSchema)
  }

  def relation(spark: SparkSession, tableRoot: Path,
      files: Seq[ManifestFile], partCols: Seq[String],
      recordedSchema: Option[StructType] = None,
      isStreaming: Boolean = false): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val (dataSchema, partitionSchema) =
      schemasOf(cs, files, partCols, recordedSchema)
    val index = new ManifestFileIndex(tableRoot, files, partitionSchema,
      recordedSchema)
    val rel = HadoopFsRelation(index, partitionSchema, dataSchema,
      None, new ParquetFileFormat, Map.empty[String, String])(cs)
    classic.Dataset.ofRows(cs, LogicalRelation(rel, isStreaming = isStreaming))
  }
}
