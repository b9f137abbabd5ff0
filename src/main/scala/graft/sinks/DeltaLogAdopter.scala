package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** READ-ONLY resolution of a Delta Lake `_delta_log` into an adoptable
  * snapshot (VERDICT r19 #1 — the highest-leverage interop gap: real
  * estates are Delta, and in-place adoption lets this engine query
  * them without copying a byte). The format is public knowledge
  * (delta.io PROTOCOL.md): a commit is a `%020d.json` file of
  * newline-delimited action objects (`protocol`, `metaData`, `add`,
  * `remove`, `txn`, `commitInfo`), optionally compacted into a
  * `%020d.checkpoint.parquet` base referenced by `_last_checkpoint`.
  * Resolution is exactly the Delta reader recipe:
  *
  *  1. `_last_checkpoint` (if present) names the checkpoint version;
  *     its parquet rows carry one action per row — the non-null `add`
  *     rows are the live file set at that version (single-part and
  *     classic multi-part checkpoints supported);
  *  2. every `.json` commit AFTER the checkpoint replays in version
  *     order: `add` inserts, `remove` deletes, the LATEST `metaData`
  *     wins, `protocol` gates readability.
  *
  * The adopter REFUSES (loudly, with the feature named) anything the
  * in-place read could silently corrupt: reader features beyond plain
  * parquet scanning (deletion vectors, column mapping, v2 checkpoints),
  * a live `add` carrying a deletion vector, or a non-Hive file layout
  * under a partitioned table (graft derives partition values from
  * `k=v` path segments — the overwhelmingly common Delta layout, but
  * not a Delta requirement, so it is CHECKED, not assumed).
  *
  * Statistics deliberately come from the engine's own parquet-footer
  * pass afterwards ([[ManifestTable.collectStats]]), not from the
  * log's inline `stats` JSON: footer bounds are exact and canonical
  * for this engine's skipping model, while Delta string stats may be
  * truncated prefixes whose soundness rules differ — re-deriving
  * costs the same O(live files) metadata pass CONVERT already pays.
  */
object DeltaLogAdopter {

  /** The resolved live state of a Delta log. `files` are table-relative
    * (URL-decoded) paths; `parts` the partition columns; `schemaJson`
    * the Spark StructType JSON from the latest `metaData`.
    */
  final case class Resolved(version: Long, files: Seq[String],
      parts: Seq[String], schemaJson: String)

  private val CommitName = """(\d{20})\.json""".r
  /** Classic single- and multi-part checkpoint names. */
  private val CheckpointName =
    """(\d{20})\.checkpoint(\.\d+\.\d+)?\.parquet""".r

  /** Reader features the plain-parquet in-place scan can honor. */
  private val TolerableReaderFeatures =
    Set("timestampNtz", "typeWidening", "typeWidening-preview")

  def isDeltaTable(fs: FileSystem, table: Path): Boolean = {
    val log = new Path(table, "_delta_log")
    try fs.exists(log) && fs.listStatus(log).exists(st =>
      CommitName.pattern.matcher(st.getPath.getName).matches() ||
        CheckpointName.pattern.matcher(st.getPath.getName).matches())
    catch { case _: java.io.IOException => false }
  }

  def resolve(spark: SparkSession, fs: FileSystem, table: Path)
      : Resolved = {
    val log = new Path(table, "_delta_log")
    require(fs.exists(log), s"$table has no _delta_log directory")
    val entries = fs.listStatus(log).map(_.getPath.getName).toSeq

    // checkpoint base: honor _last_checkpoint when readable, else the
    // highest complete checkpoint found by listing (the Delta fallback)
    val lastCkpt: Option[Long] =
      try {
        val lc = new Path(log, "_last_checkpoint")
        if (!fs.exists(lc)) None
        else {
          val in = fs.open(lc)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8")
            .mkString finally in.close()
          Some(ManifestTable.jsonMapper.readTree(txt).get("version").asLong())
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    val commits = entries.collect { case CommitName(v) => v.toLong }.sorted
    /** COMPLETE checkpoint versions only: a multi-part name encodes
      * its part count (`N.checkpoint.<part>.<parts>.parquet`) — a
      * version missing parts must not resolve (it would silently drop
      * live files); single-part names are complete by existence.
      */
    def complete(v: Long): Boolean = {
      val parts = entries.collect {
        case CheckpointName(cv, suffix) if cv.toLong == v =>
          Option(suffix).map(_.split("\\.").last.toLong)
      }
      parts.nonEmpty && (parts.contains(None) ||
        parts.flatten.headOption.exists(n =>
          parts.flatten.toSet == Set(n) && parts.size.toLong == n))
    }
    // _last_checkpoint is a HINT (written non-atomically by Delta):
    // an incomplete or missing hinted checkpoint falls back to the
    // best complete one by listing, and to pure JSON replay when the
    // full commit chain is present — never a hard refusal of an
    // adoptable table
    val listed = entries.collect { case CheckpointName(v, _) => v.toLong }
      .distinct.filter(complete)
    val ckptVersion: Option[Long] = lastCkpt.filter(complete)
      .orElse(listed.sorted.lastOption)
    require(ckptVersion.nonEmpty ||
      (commits.nonEmpty && commits.min == 0L),
      s"$table/_delta_log holds no complete checkpoint and no JSON " +
        "commit chain from version 0 — the live file set cannot be " +
        "resolved")

    // live-state accumulator (insertion-ordered for deterministic
    // manifests); paths are the RAW log spellings until decode below
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    var schemaJson: Option[String] = None
    var parts: Option[Seq[String]] = None
    var config: Map[String, String] = Map.empty

    def takeMeta(schema: String, partCols: Seq[String],
        conf: Map[String, String]): Unit = {
      schemaJson = Some(schema); parts = Some(partCols); config = conf
    }

    def checkProtocol(minReader: Int, features: Seq[String]): Unit = {
      val unsupported = features.filterNot(TolerableReaderFeatures)
      require(unsupported.isEmpty,
        s"cannot adopt $table: Delta reader feature(s) " +
          s"${unsupported.mkString(", ")} require log-aware semantics " +
          "an in-place parquet adoption cannot honor")
      require(minReader <= 3,
        s"cannot adopt $table: Delta minReaderVersion $minReader is " +
          "newer than this adopter understands")
      // minReaderVersion 2 without an explicit feature list means
      // column mapping MAY be active — the metaData configuration
      // check below is the authoritative gate either way
    }

    ckptVersion.foreach { v =>
      val partFiles = entries.collect {
        case n @ CheckpointName(cv, _) if cv.toLong == v => n
      }.sorted
      require(partFiles.nonEmpty,
        s"$table/_delta_log/_last_checkpoint names version $v but no " +
          s"checkpoint parquet for it exists")
      val df = spark.read.parquet(
        partFiles.map(n => new Path(log, n).toString): _*)
      val cols = df.schema.fieldNames.toSet
      def nested(top: String, field: String): Boolean =
        df.schema.fields.find(_.name == top).exists(_.dataType match {
          case s: org.apache.spark.sql.types.StructType =>
            s.fieldNames.contains(field)
          case _ => false
        })
      // one driver collect, O(actions in checkpoint) — the same
      // metadata-sized class as every manifest resolution
      if (cols.contains("protocol")) {
        val feats =
          if (nested("protocol", "readerFeatures"))
            "protocol.readerFeatures" else null
        df.filter("protocol IS NOT NULL")
          .selectExpr("protocol.minReaderVersion",
            if (feats != null) feats else "array()")
          .collect().foreach { r =>
            checkProtocol(r.getInt(0),
              Option(r.getSeq[String](1)).getOrElse(Seq.empty))
          }
      }
      if (cols.contains("metaData")) {
        df.filter("metaData.id IS NOT NULL")
          .selectExpr("metaData.schemaString",
            "metaData.partitionColumns", "metaData.configuration")
          .collect().lastOption.foreach { r =>
            takeMeta(r.getString(0), r.getSeq[String](1),
              Option(r.getMap[String, String](2)).map(_.toMap)
                .getOrElse(Map.empty))
          }
      }
      if (cols.contains("add")) {
        val dvExpr =
          if (nested("add", "deletionVector"))
            "add.deletionVector.storageType" else "CAST(NULL AS STRING)"
        df.filter("add.path IS NOT NULL")
          .selectExpr("add.path", dvExpr)
          .collect().foreach { r =>
            require(r.isNullAt(1),
              s"cannot adopt $table: live file ${r.getString(0)} " +
                "carries a deletion vector")
            live += r.getString(0)
          }
      }
    }

    // JSON replay after the checkpoint (or from the log start) — the
    // chain must be GAP-FREE: a missing commit would silently skip
    // its adds/removes
    val replay = commits.filter(v => ckptVersion.forall(v > _))
    replay.headOption.foreach { h =>
      val expectedHead = ckptVersion.map(_ + 1).getOrElse(0L)
      require(h == expectedHead && replay == (h to replay.max),
        s"$table/_delta_log JSON chain has gaps after version " +
          s"${ckptVersion.getOrElse(-1L)} (${replay.mkString(", ")}) — " +
          "the live file set cannot be resolved")
    }
    replay.foreach { v =>
      val p = new Path(log, f"$v%020d.json")
      val in = fs.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toVector finally in.close()
      lines.filter(_.trim.nonEmpty).foreach { line =>
        val node = ManifestTable.jsonMapper.readTree(line)
        if (node.has("protocol")) {
          val pr = node.get("protocol")
          val feats = Option(pr.get("readerFeatures")).toSeq
            .flatMap(a => (0 until a.size).map(a.get(_).asText()))
          checkProtocol(pr.get("minReaderVersion").asInt(), feats)
        }
        if (node.has("metaData")) {
          val md = node.get("metaData")
          val pc = Option(md.get("partitionColumns")).toSeq
            .flatMap(a => (0 until a.size).map(a.get(_).asText()))
          val cfg = Option(md.get("configuration")).map { c =>
            val b = Map.newBuilder[String, String]
            val it = c.fields()
            while (it.hasNext) {
              val e = it.next(); b += e.getKey -> e.getValue.asText()
            }
            b.result()
          }.getOrElse(Map.empty[String, String])
          takeMeta(md.get("schemaString").asText(), pc, cfg)
        }
        if (node.has("add")) {
          val add = node.get("add")
          require(!add.has("deletionVector") ||
            add.get("deletionVector").isNull,
            s"cannot adopt $table: live file ${add.get("path").asText()} " +
              "carries a deletion vector")
          live += add.get("path").asText(): Unit
        }
        if (node.has("remove")) {
          live -= node.get("remove").get("path").asText(): Unit
        }
      }
    }

    require(schemaJson.nonEmpty,
      s"$table/_delta_log carries no metaData action (schema unknown)")
    config.get("delta.columnMapping.mode")
      .filterNot(_.equalsIgnoreCase("none")).foreach { mode =>
        throw new IllegalArgumentException(
          s"cannot adopt $table: delta.columnMapping.mode=$mode renames " +
            "physical columns through log metadata an in-place parquet " +
            "adoption cannot honor")
      }
    require(live.nonEmpty,
      s"$table's Delta log resolves to zero live files")

    // paths are percent-encoded relative URIs in the log
    val decoded = live.toSeq.map { raw =>
      val u = new java.net.URI(raw)
      require(u.getScheme == null || u.getScheme == "file",
        s"cannot adopt $table: external file reference $raw")
      u.getPath
    }
    val version = (commits ++ ckptVersion).max
    Resolved(version, decoded, parts.getOrElse(Seq.empty),
      schemaJson.get)
  }
}
