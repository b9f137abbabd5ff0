package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types._

/** READ-ONLY resolution of an Apache Iceberg table's metadata into an
  * adoptable snapshot — the second half of the open-format interop
  * gap (VERDICT r19 #1 named "Delta-log or Iceberg snapshot
  * adopter"). The format is public knowledge (iceberg.apache.org
  * spec): a Hadoop-layout table keeps `metadata/vN.metadata.json`
  * (pointed at by `version-hint.text`), whose current snapshot names
  * a MANIFEST LIST (Avro); its rows name MANIFEST files (Avro) whose
  * entries carry per-data-file records (status, path, row count).
  * All three layers are metadata-sized — resolution is a driver walk
  * with the plain Avro library (no connector needed), exactly like a
  * manifest-log read.
  *
  * The adopter resolves: live data files = manifest entries with
  * `status != DELETED` and data content, the CURRENT schema
  * (Iceberg's own schema JSON converted to Spark types), and the
  * default partition spec. It REFUSES what an in-place name-based
  * parquet read cannot honor, loudly and by name:
  *
  *  - row-level DELETE FILES (v2 position/equality deletes — the
  *    moral equivalent of unapplied deletion vectors);
  *  - non-IDENTITY partition transforms (bucket/truncate/day/...):
  *    graft derives partition values from `k=v` path segments, which
  *    only identity transforms produce;
  *  - non-parquet data files;
  *  - a column-name mismatch between the current schema and the
  *    physical parquet columns (Iceberg reads by FIELD ID, so a
  *    renamed column leaves old files under old physical names — a
  *    name-based adoption would silently null it; checked against
  *    every live file's footer).
  */
object IcebergAdopter {

  final case class Resolved(snapshotId: Long, files: Seq[String],
      parts: Seq[String], schema: StructType)

  private val MetaName = """v(\d+)\.metadata\.json""".r

  def isIcebergTable(fs: FileSystem, table: Path): Boolean = {
    val meta = new Path(table, "metadata")
    try fs.exists(meta) && fs.listStatus(meta).exists(st =>
      st.getPath.getName.endsWith(".metadata.json"))
    catch { case _: java.io.IOException => false }
  }

  private def readBytes(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** One Avro object-container file as GenericRecords (metadata-sized
    * by the Iceberg spec — manifest lists and manifests, never data).
    */
  private def avroRecords(fs: FileSystem, p: Path)
      : Seq[org.apache.avro.generic.GenericRecord] = {
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(readBytes(fs, p)),
      new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[GenericRecord]
      while (reader.hasNext) out += reader.next()
      out.result()
    } finally reader.close()
  }

  /** An Iceberg metadata path as a filesystem Path: absolute URIs
    * pass through, bare relative spellings resolve under the root.
    */
  private def resolvePath(table: Path, raw: String): Path = {
    val u = new java.net.URI(raw)
    require(u.getScheme == null || u.getScheme == "file",
      s"cannot adopt: external object reference $raw")
    if (u.getPath.startsWith("/")) new Path(u.getPath)
    else new Path(table, u.getPath)
  }

  def resolve(spark: org.apache.spark.sql.SparkSession, fs: FileSystem,
      table: Path): Resolved = {
    val mapper = ManifestTable.jsonMapper
    val metaDir = new Path(table, "metadata")
    require(fs.exists(metaDir), s"$table has no metadata directory")
    // current metadata: version-hint.text when present, else the
    // highest vN.metadata.json (the Hadoop-tables resolution rule)
    val hint = new Path(metaDir, "version-hint.text")
    val metaPath: Path =
      if (fs.exists(hint)) {
        val v = new String(readBytes(fs, hint), "UTF-8").trim
        new Path(metaDir, s"v$v.metadata.json")
      } else {
        val vs = fs.listStatus(metaDir).map(_.getPath.getName).collect {
          case MetaName(v) => v.toLong
        }
        require(vs.nonEmpty,
          s"$table/metadata holds no vN.metadata.json (non-Hadoop " +
            "Iceberg layouts need an explicit metadata file)")
        new Path(metaDir, s"v${vs.max}.metadata.json")
      }
    val root = mapper.readTree(readBytes(fs, metaPath))

    // current schema: v2 `schemas` + `current-schema-id`, v1 `schema`
    val schemaNode = Option(root.get("current-schema-id")).flatMap { id =>
      Option(root.get("schemas")).flatMap { arr =>
        (0 until arr.size).map(arr.get)
          .find(s => s.get("schema-id").asInt() == id.asInt())
      }
    }.orElse(Option(root.get("schema")))
      .getOrElse(throw new IllegalArgumentException(
        s"cannot adopt $table: metadata carries no schema"))
    val schema = icebergStruct(schemaNode)

    // default partition spec: identity transforms only
    val specFields: Seq[(String, String)] =
      Option(root.get("default-spec-id")).flatMap { id =>
        Option(root.get("partition-specs")).flatMap { arr =>
          (0 until arr.size).map(arr.get)
            .find(s => s.get("spec-id").asInt() == id.asInt())
            .map(s => s.get("fields"))
        }
      }.orElse(Option(root.get("partition-spec")))
        .map(arr => (0 until arr.size).map(arr.get).map(f =>
          f.get("name").asText() -> f.get("transform").asText()))
        .getOrElse(Seq.empty)
    specFields.filterNot(_._2 == "identity").foreach { case (n, tr) =>
      throw new IllegalArgumentException(
        s"cannot adopt $table: partition field '$n' uses the " +
          s"'$tr' transform — graft derives partition values from " +
          "Hive k=v paths, which only identity transforms produce")
    }
    val parts = specFields.map(_._1)

    // current snapshot → manifest list → manifests → live data files
    val curId = Option(root.get("current-snapshot-id")).map(_.asLong())
      .filter(_ != -1L)
      .getOrElse(throw new IllegalArgumentException(
        s"cannot adopt $table: no current snapshot"))
    val snapshots = Option(root.get("snapshots")).toSeq
      .flatMap(arr => (0 until arr.size).map(arr.get))
    val snap = snapshots.find(_.get("snapshot-id").asLong() == curId)
      .getOrElse(throw new IllegalArgumentException(
        s"cannot adopt $table: snapshot $curId not in the metadata"))
    val manifestPaths: Seq[Path] =
      Option(snap.get("manifest-list")).map { ml =>
        avroRecords(fs, resolvePath(table, ml.asText())).map { r =>
          // v2 manifest-list rows carry `content` (0 data / 1 deletes)
          val content = Option(r.get("content"))
            .map(_.asInstanceOf[Int]).getOrElse(0)
          require(content == 0,
            s"cannot adopt $table: snapshot $curId references DELETE " +
              "manifests (Iceberg v2 row-level deletes) an in-place " +
              "parquet adoption cannot apply")
          resolvePath(table, r.get("manifest_path").toString)
        }
      }.orElse(Option(snap.get("manifests")).map(arr =>
        (0 until arr.size).map(i =>
          resolvePath(table, arr.get(i).asText()))))
        .getOrElse(throw new IllegalArgumentException(
          s"cannot adopt $table: snapshot $curId names no manifests"))

    val files = manifestPaths.flatMap { mp =>
      avroRecords(fs, mp).flatMap { entry =>
        val status = entry.get("status").asInstanceOf[Int]
        if (status == 2) None // DELETED
        else {
          val df = entry.get("data_file")
            .asInstanceOf[org.apache.avro.generic.GenericRecord]
          val content = Option(df.get("content"))
            .map(_.asInstanceOf[Int]).getOrElse(0)
          require(content == 0,
            s"cannot adopt $table: ${df.get("file_path")} is a " +
              "row-level DELETE file (Iceberg v2) an in-place parquet " +
              "adoption cannot apply")
          val fmt = String.valueOf(df.get("file_format"))
          require(fmt.equalsIgnoreCase("parquet"),
            s"cannot adopt $table: data file format $fmt (parquet only)")
          Some(df.get("file_path").toString)
        }
      }
    }.distinct
    require(files.nonEmpty,
      s"$table's current Iceberg snapshot holds no live data files")

    // relativize under the root (absolute manifest spellings)
    val rootStr = table.toUri.getPath.stripSuffix("/")
    val rels = files.map { raw =>
      val p = new java.net.URI(raw).getPath
      if (p.startsWith(rootStr + "/")) p.stripPrefix(rootStr + "/") else p
    }

    // name-based read guard: Iceberg resolves columns by FIELD ID —
    // after a rename, old files keep old physical names and a
    // name-based scan would silently null the column. A PARTIALLY
    // renamed table (new files under the new physical name, old files
    // under the old one) passes any single-sample check, so EVERY
    // live file's footer is validated — footers are metadata-sized,
    // adoption is one-shot maintenance, and a bounded pool keeps the
    // walk parallel. Unreadable footers refuse loudly too: adopting a
    // file the engine cannot read only defers the failure to a scan.
    val required = schema.fieldNames.filterNot(parts.contains)
    val conf = spark.sparkContext.hadoopConfiguration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, math.max(1, rels.size)))
    try {
      val checks = rels.map { rel =>
        pool.submit(new java.util.concurrent.Callable[Option[String]] {
          override def call(): Option[String] = {
            val fp = if (rel.startsWith("/")) new Path(rel)
              else new Path(table, rel)
            val footer = try org.apache.parquet.hadoop.ParquetFileReader
              .readFooter(conf, fp)
            catch {
              case scala.util.control.NonFatal(e) =>
                throw new IllegalArgumentException(
                  s"cannot adopt $table: data file $rel is not a " +
                    s"readable parquet file (${e.getMessage})", e)
            }
            val physical = footer.getFileMetaData.getSchema.getFields
              .toArray.map(_.asInstanceOf[org.apache.parquet.schema.Type]
                .getName).toSet
            val missing = required.filterNot(physical)
            if (missing.isEmpty) None
            else Some(s"cannot adopt $table: schema column(s) " +
              s"${missing.mkString(", ")} missing from $rel's " +
              "physical columns — the table was likely renamed through " +
              "Iceberg field-id mapping, which a name-based in-place " +
              "adoption cannot honor")
          }
        })
      }
      checks.foreach { f =>
        try f.get().foreach(msg => throw new IllegalArgumentException(msg))
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally pool.shutdown()
    Resolved(curId, rels, parts, schema)
  }

  /** Iceberg schema JSON → Spark StructType (spec "Schemas" section:
    * primitives by name, decimal/fixed with parameters, nested
    * struct/list/map).
    */
  private[sinks] def icebergStruct(
      node: com.fasterxml.jackson.databind.JsonNode): StructType = {
    val fields = node.get("fields")
    StructType((0 until fields.size).map { i =>
      val f = fields.get(i)
      StructField(f.get("name").asText(),
        icebergType(f.get("type")),
        nullable = !Option(f.get("required")).exists(_.asBoolean()))
    })
  }

  private val DecimalPat = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedPat = """fixed\[(\d+)\]""".r

  private def icebergType(
      t: com.fasterxml.jackson.databind.JsonNode): DataType =
    if (t.isTextual) t.asText() match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case "string" => StringType
      case "uuid" => StringType
      case "binary" => BinaryType
      case DecimalPat(p, s) => DecimalType(p.toInt, s.toInt)
      case FixedPat(_) => BinaryType
      case other => throw new IllegalArgumentException(
        s"cannot adopt: unsupported Iceberg type '$other'")
    } else t.get("type").asText() match {
      case "struct" => icebergStruct(t)
      case "list" => ArrayType(icebergType(t.get("element")),
        containsNull = !Option(t.get("element-required"))
          .exists(_.asBoolean()))
      case "map" => MapType(icebergType(t.get("key")),
        icebergType(t.get("value")),
        valueContainsNull = !Option(t.get("value-required"))
          .exists(_.asBoolean()))
      case other => throw new IllegalArgumentException(
        s"cannot adopt: unsupported Iceberg nested type '$other'")
    }
}
