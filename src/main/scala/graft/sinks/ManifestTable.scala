package graft.sinks

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Manifest-committed table — the object-store-safe commit protocol
  * [[Sinks.compact]]'s directory-rename swap approximates (VERDICT r9
  * "What's missing" #3). The idea is the transaction-log core of every
  * lake table format (Delta/Iceberg/Hudi), reduced to its minimum:
  *
  *  - data files live under `<table>/data/s<version>-<uuid>/`, written
  *    once and NEVER renamed or mutated;
  *  - the table's visible state is a single JSON manifest
  *    `<table>/_manifests/v<version>.json` listing the data files of
  *    that snapshot;
  *  - commit = atomically creating the NEXT manifest file (staged
  *    write + rename-without-replace). Readers resolve the highest
  *    version and read exactly its file list — there is no moment
  *    where a reader can list a half-renamed directory, because
  *    nothing is ever renamed over: a reader sees v(N) in full or
  *    v(N+1) in full;
  *  - superseded snapshots' files stay on disk until [[vacuum]], so a
  *    reader that resolved v(N) keeps working while v(N+1) commits —
  *    snapshot isolation by immutability, and a crash anywhere leaves
  *    either the old table state (no new manifest) or the new one
  *    (manifest committed), never a torn state;
  *  - concurrent writers race on creating the same v(N+1) name; the
  *    loser's rename fails (create-exclusive CAS) and its orphaned
  *    snapshot dir is reclaimed by the next vacuum. Single-winner
  *    commits without any lock service — the same optimistic
  *    concurrency the real formats use. (Same-JVM writers additionally
  *    serialize through a process-local monitor, because the local
  *    filesystem's POSIX rename overwrites and would otherwise let two
  *    in-process threads both report success; cross-process atomicity
  *    is the filesystem contract's — HDFS rename and object-store
  *    put-if-absent both refuse to replace.)
  *
  * Object-store note: rename here moves ONE small manifest file, not
  * the data. On stores whose rename is copy+delete this is a metadata
  * put of a few KB (vs [[Sinks.compact]] renaming the whole data
  * tree), and on stores with conditional-put the staged rename maps
  * directly onto put-if-absent.
  *
  * Hive-partitioned layouts are preserved: data files keep their
  * `col=value/` subpaths inside the snapshot dir and [[read]] scans
  * each snapshot dir under its own `basePath`, so partition columns
  * and partition pruning work unchanged on a manifest table.
  *
  * Streaming: [[appendStreamBatch]]/[[streamInto]] record the folded
  * micro-batch id PER TRANSACTION APP ID in the manifest (the Delta
  * txn appId/version recipe), making the log an exactly-once
  * foreachBatch sink: replays collapse on the watermark check, and two
  * independent queries (or a query restarted with a fresh checkpoint
  * under a new app id) cannot swallow each other's batches.
  */
object ManifestTable {

  private val ManifestDir = "_manifests"

  /** Serializes same-JVM commits PER TABLE; see the class doc's CAS
    * note. Keyed on the table path so two tables never contend.
    */
  private val commitMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def commitMonitor(table: Path): Object =
    commitMonitors.computeIfAbsent(table.toString, _ => new Object)

  private def fsOf(spark: SparkSession, table: String): (FileSystem, Path) = {
    val p = new Path(table)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(table: Path, version: Long): Path =
    new Path(new Path(table, ManifestDir), f"v$version%012d.json")

  /** Highest committed version, or 0 if the table does not exist yet. */
  def currentVersion(spark: SparkSession, table: String): Long = {
    val (fs, p) = fsOf(spark, table)
    val dir = new Path(p, ManifestDir)
    if (!fs.exists(dir)) return 0L
    fs.listStatus(dir).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .foldLeft(0L)(math.max)
  }

  private def listDataFiles(fs: FileSystem, dir: Path): Seq[FileStatus] = {
    val it = fs.listFiles(dir, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (f.isFile && !n.startsWith("_") && !n.startsWith(".")) buf += f
    }
    buf.toSeq
  }

  /** Manifest JSON, hand-rolled like Bench's artifact. Strings are
    * percent-escaped for exactly the characters that would break the
    * regex parse (`%`, `"`, `,`, `{`, `}`) — Spark's partition-path
    * escaping leaves e.g. commas intact, so `lang=en,US` is a legal
    * relative path and must survive the round-trip.
    */
  private def esc(s: String): String = s
    .replace("%", "%25").replace("\"", "%22").replace(",", "%2C")
    .replace("{", "%7B").replace("}", "%7D").replace(":", "%3A")

  private def unesc(s: String): String = s
    .replace("%3A", ":").replace("%7D", "}").replace("%7B", "{")
    .replace("%2C", ",").replace("%22", "\"").replace("%25", "%")

  /** `txns` maps a transaction app id to the highest streaming
    * micro-batch folded in under that id — the per-query idempotence
    * watermark [[appendStreamBatch]] checks on replay.
    */
  private def render(version: Long, files: Seq[String],
      txns: Map[String, Long]): String = {
    val t =
      if (txns.isEmpty) ""
      else txns.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + esc(k) + "\":" + v }
        .mkString(""","txns":{""", ",", "}")
    files.map("\"" + esc(_) + "\"")
      .mkString(s"""{"version":$version,"files":[""", ",", s"]$t}")
  }

  private def parseTxns(json: String): Map[String, Long] =
    """"txns":\{([^}]*)\}""".r.findFirstMatchIn(json) match {
      case None =>
        // manifests written before the per-app txn map carried a single
        // "streamBatchId" — fold it into the default app so an upgrade
        // does not drop the idempotence watermark
        """"streamBatchId":(-?\d+)""".r.findFirstMatchIn(json)
          .map(m => Map("default" -> m.group(1).toLong)).getOrElse(Map.empty)
      case Some(m) => m.group(1).split(",").iterator.filter(_.nonEmpty)
        .map { kv =>
          // keys are esc()'d (':' included), so the first ':' separates
          val Array(k, v) = kv.split(":", 2)
          unesc(k.trim.stripPrefix("\"").stripSuffix("\"")) -> v.trim.toLong
        }.toMap
    }

  private def parseFiles(json: String): Seq[String] = {
    val m = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(json)
      .getOrElse(throw new java.io.IOException(s"bad manifest: $json"))
    m.group(1).split(",").iterator
      .map(s => unesc(s.trim.stripPrefix("\"").stripSuffix("\"")))
      .filter(_.nonEmpty).toSeq
  }

  /** Stage + CAS-create the manifest for `version`. Returns false if a
    * concurrent writer won the race for this version number. The
    * staged file is deleted on every non-winning path, including
    * exceptions (vacuum also sweeps stale staged files as a backstop
    * for hard crashes).
    */
  private[graft] def commitManifest(fs: FileSystem, table: Path, version: Long,
      relFiles: Seq[String], txns: Map[String, Long] = Map.empty): Boolean =
    commitMonitor(table).synchronized {
      val target = manifestPath(table, version)
      fs.mkdirs(target.getParent)
      val staged = new Path(target.getParent,
        s".${target.getName}.tmp-${java.util.UUID.randomUUID()}")
      var committed = false
      try {
        val out = fs.create(staged, false)
        try out.write(render(version, relFiles, txns).getBytes("UTF-8"))
        finally out.close()
        // rename-without-replace is the CAS: Hadoop FS contracts fail
        // the rename when the destination exists (the monitor plus this
        // pre-check cover the local RawLocalFileSystem, whose POSIX
        // renameTo would overwrite)
        if (fs.exists(target)) return false
        committed = fs.rename(staged, target)
        committed
      } finally if (!committed) fs.delete(staged, false): Unit
    }

  /** Write `df` into a fresh snapshot dir for `version` and return the
    * table-relative paths of its data files — the shared first half of
    * every commit kind.
    */
  private def writeSnapshot(fs: FileSystem, p: Path, df: DataFrame,
      version: Long, partitionCols: Seq[String],
      maxRecordsPerFile: Long): Seq[String] = {
    val snapDir = new Path(new Path(p, "data"),
      s"s$version-${java.util.UUID.randomUUID()}")
    var w = df.write.mode(SaveMode.ErrorIfExists)
    if (maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(snapDir.toString)
    listDataFiles(fs, snapDir).map(f => relativize(p, f.getPath)).sorted
  }

  private def commitOrThrow(fs: FileSystem, p: Path, table: String,
      version: Long, files: Seq[String], txns: Map[String, Long]): Long = {
    if (!commitManifest(fs, p, version, files, txns))
      throw new java.io.IOException(
        s"manifest commit lost the race for v$version of $table; " +
          "snapshot dir left for vacuum — re-read and retry")
    version
  }

  /** Write `df` as the next snapshot of `table` and commit it. The
    * snapshot REPLACES the table contents (overwrite semantics — the
    * compaction/rewrite commit unit); appends are a commit of
    * old-files + new-files, see [[append]]. Returns the committed
    * version. Throws if a concurrent writer claimed the version first
    * (retry by re-reading, the standard optimistic loop). Streaming
    * txn watermarks survive batch commits — dropping them would let a
    * replayed micro-batch re-append after an interleaved
    * write/compact.
    */
  def write(spark: SparkSession, df: DataFrame, table: String,
      partitionCols: Seq[String] = Seq.empty,
      maxRecordsPerFile: Long = 0L): Long = {
    val (fs, p) = fsOf(spark, table)
    val base = currentVersion(spark, table)
    val txns = streamTxns(spark, table)
    val files = writeSnapshot(fs, p, df, base + 1, partitionCols,
      maxRecordsPerFile)
    commitOrThrow(fs, p, table, base + 1, files, txns)
  }

  /** Append `df`: new snapshot dir holds only the new files; the
    * committed manifest is current-files + new-files.
    */
  def append(spark: SparkSession, df: DataFrame, table: String,
      partitionCols: Seq[String] = Seq.empty): Long = {
    val (fs, p) = fsOf(spark, table)
    val base = currentVersion(spark, table)
    val txns = streamTxns(spark, table)
    val existing =
      if (base == 0) Seq.empty else currentFiles(spark, table, base)
    val fresh = writeSnapshot(fs, p, df, base + 1, partitionCols, 0L)
    commitOrThrow(fs, p, table, base + 1, (existing ++ fresh).sorted, txns)
  }

  /** Exactly-once streaming append: fold micro-batch `batchId` of the
    * query identified by `txnAppId` into the table UNLESS this app's
    * watermark already covers it — the transactional-sink recipe
    * (Delta's txn appId/version) on the manifest log. Structured
    * Streaming's checkpoint guarantees at-least-once foreachBatch
    * delivery with MONOTONE batch ids per query; the per-app watermark
    * collapses replays, so a batch's rows land exactly once even when
    * it reruns after a crash between the data write and the checkpoint
    * commit — while a DIFFERENT query (or the same pipeline restarted
    * under a fresh checkpoint AND a fresh app id) starts from its own
    * watermark instead of silently dropping batches. (A replayed batch
    * that already committed leaves only an orphaned snapshot dir for
    * vacuum.) Returns the committed version, or the current one when
    * the batch was already folded in.
    */
  def appendStreamBatch(spark: SparkSession, df: DataFrame, table: String,
      batchId: Long, txnAppId: String = "default",
      partitionCols: Seq[String] = Seq.empty): Long = {
    val (fs, p) = fsOf(spark, table)
    var fresh: Seq[String] = null // snapshot written once, reused on retry
    var attempts = 0
    while (true) {
      // version FIRST, then files+txns from THAT version's manifest —
      // one consistent snapshot of table state. Any commit landing
      // after this read changes the current version, so our CAS at
      // base+1 fails and we retry with fresh state; reading txns from
      // a different version than base could silently regress another
      // query's watermark into the committed manifest.
      val base = currentVersion(spark, table)
      val json = if (base == 0) None else Some(manifestJson(fs, p, base))
      val txns = json.map(parseTxns).getOrElse(Map.empty)
      if (txns.get(txnAppId).exists(_ >= batchId))
        return base // replay; an already-written snapshot is vacuum's
      val existing = json.map(parseFiles).getOrElse(Seq.empty)
      if (fresh == null)
        fresh = writeSnapshot(fs, p, df, base + 1, partitionCols, 0L)
      if (commitManifest(fs, p, base + 1, (existing ++ fresh).sorted,
          txns + (txnAppId -> batchId)))
        return base + 1
      // lost the version race to a concurrent writer: the standard
      // optimistic loop, re-reading state but REUSING the data files —
      // a streaming query cannot hand "retry" to a caller
      attempts += 1
      if (attempts >= 50)
        throw new java.io.IOException(
          s"appendStreamBatch: lost the commit race $attempts times on " +
            s"$table — livelock or misconfigured concurrent writers")
    }
    -1L // unreachable
  }

  /** Drive an append-mode stream into a manifest table: foreachBatch +
    * [[appendStreamBatch]] — the composition that makes the manifest
    * log a Structured Streaming exactly-once sink. The transaction app
    * id defaults to the checkpoint location: stable across restarts of
    * the same query, distinct across queries — pass an explicit
    * `txnAppId` to survive a checkpoint relocation.
    */
  def streamInto(stream: DataFrame, table: String,
      checkpointDir: String,
      partitionCols: Seq[String] = Seq.empty,
      txnAppId: String = ""): org.apache.spark.sql.streaming.StreamingQuery = {
    val app = if (txnAppId.nonEmpty) txnAppId else checkpointDir
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        appendStreamBatch(b.sparkSession, b, table, id, app,
          partitionCols): Unit
      }
      .start()
  }

  private def relativize(table: Path, file: Path): String = {
    val t = table.toUri.getPath.stripSuffix("/")
    val f = file.toUri.getPath
    require(f.startsWith(t + "/"), s"$file outside $table")
    f.stripPrefix(t + "/")
  }

  private def manifestJson(fs: FileSystem, table: Path, version: Long): String = {
    val in = fs.open(manifestPath(table, version))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** The file list of `version` (default: current). */
  def currentFiles(spark: SparkSession, table: String,
      version: Long = -1L): Seq[String] = {
    val (fs, p) = fsOf(spark, table)
    val v = if (version > 0) version else currentVersion(spark, table)
    require(v > 0, s"no committed version in $table")
    parseFiles(manifestJson(fs, p, v))
  }

  /** The streaming idempotence watermarks of the current snapshot:
    * per-txn-app highest micro-batch id folded in (empty for a
    * batch-only table).
    */
  def streamTxns(spark: SparkSession, table: String): Map[String, Long] = {
    val (fs, p) = fsOf(spark, table)
    val v = currentVersion(spark, table)
    if (v == 0) Map.empty else parseTxns(manifestJson(fs, p, v))
  }

  /** Convenience: the watermark of one txn app (default app). */
  def lastStreamBatchId(spark: SparkSession, table: String,
      txnAppId: String = "default"): Option[Long] =
    streamTxns(spark, table).get(txnAppId)

  /** Union `relFiles` grouped per snapshot dir, each under its own
    * `basePath`: Spark's partition-structure parser walks each file's
    * ancestors only until the first non-`key=value` segment, so a
    * manifest spanning several snapshot dirs (one write + appends)
    * discovers several bases that a single table-root basePath cannot
    * bridge. Per-snapshot reads keep Hive partition columns resolvable
    * AND partition-prunable in every branch of the union
    * (`allowMissingColumns` = add-column schema evolution: older
    * snapshots surface newer columns as null). An empty file list
    * (e.g. a committed empty partitioned write) reads as an empty
    * zero-column frame rather than crashing.
    */
  private def unionSnapshots(spark: SparkSession, table: String,
      relFiles: Seq[String]): DataFrame =
    if (relFiles.isEmpty) spark.emptyDataFrame
    else relFiles.groupBy(_.split("/").take(2).mkString("/")).toSeq
      .sortBy(_._1)
      .map { case (snap, fs) =>
        spark.read
          .option("basePath", s"$table/$snap")
          .parquet(fs.map(f => s"$table/$f"): _*)
      }
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** Read a snapshot (default: current) — exactly the manifest's file
    * list; see [[unionSnapshots]] for the partition/evolution
    * mechanics. Live snapshot-dir count is small by construction
    * (compaction collapses it to one).
    */
  def read(spark: SparkSession, table: String,
      version: Long = -1L): DataFrame =
    unionSnapshots(spark, table, currentFiles(spark, table, version))

  /** Change-data-feed read (file-level): the rows in files ADDED
    * between `fromVersion` (exclusive) and `toVersion` (inclusive,
    * default current). For append-committed versions
    * ([[append]]/[[appendStreamBatch]]) this is exactly the appended
    * rows — the incremental-consumer contract (downstream jobs pull
    * only the delta instead of re-reading the table). Rewrite commits
    * ([[write]]/[[compact]]) re-add their whole content as "new"
    * files; a consumer that must distinguish logical from physical
    * change gates on the version kind it commits (e.g. only ever
    * appends between CDF reads), the same discipline file-level CDF
    * has in the real formats' cheapest mode.
    */
  def readChanges(spark: SparkSession, table: String, fromVersion: Long,
      toVersion: Long = -1L): DataFrame = {
    val to = if (toVersion > 0) toVersion else currentVersion(spark, table)
    require(fromVersion >= 0 && fromVersion <= to,
      s"bad CDF range ($fromVersion, $to]")
    val before =
      if (fromVersion == 0) Set.empty[String]
      else currentFiles(spark, table, fromVersion).toSet
    val added = currentFiles(spark, table, to).filterNot(before)
    if (added.isEmpty) read(spark, table, to).limit(0)
    else unionSnapshots(spark, table, added)
  }

  /** Compact the current snapshot: bin-pack its files toward
    * `targetFileBytes` into a NEW snapshot and commit — the
    * object-store-safe twin of [[Sinks.compact]]. Readers of the old
    * version are untouched (its files remain until vacuum), and the
    * commit is one manifest create, not a directory rename window.
    */
  def compact(spark: SparkSession, table: String,
      partitionCols: Seq[String] = Seq.empty,
      targetFileBytes: Long = 512L << 20): Sinks.CompactStats = {
    val (fs, p) = fsOf(spark, table)
    val before = currentFiles(spark, table)
    val totalBytes = before
      .map(f => fs.getFileStatus(new Path(p, f)).getLen).sum
    val df = read(spark, table)
    val totalRows = math.max(df.count(), 1L)
    val bytesPerRow = math.max(totalBytes / totalRows, 1L)
    val v = write(spark, df, table, partitionCols,
      maxRecordsPerFile = math.max(targetFileBytes / bytesPerRow, 1L))
    Sinks.CompactStats(before.size, currentFiles(spark, table, v).size,
      totalBytes)
  }

  /** Delete data files not referenced by the RETAINED manifests (the
    * `keepVersions` most recent — default 1, current only) plus all
    * older manifests and stale staged commit files. Lost-race orphan
    * snapshot dirs are reclaimed the same way. `keepVersions > 1` is
    * the time-travel retention window: readers pinned to any retained
    * version keep working. `graceMs` protects IN-FLIGHT writers: a
    * file younger than the grace is never deleted even if unreferenced
    * (an append writes its snapshot BEFORE committing the manifest —
    * without the grace, a vacuum racing that window would delete the
    * files its commit is about to reference). Set it above the longest
    * plausible write-to-commit latency; the reader-side grace contract
    * stays the caller's: vacuum only when no reader can still hold a
    * manifest older than the retained set.
    */
  def vacuum(spark: SparkSession, table: String,
      keepVersions: Int = 1, graceMs: Long = 0L): Int = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    val (fs, p) = fsOf(spark, table)
    val v = currentVersion(spark, table)
    require(v > 0, s"no committed version in $table")
    val cutoff = System.currentTimeMillis() - graceMs
    val retained = (math.max(1L, v - keepVersions + 1) to v)
      .filter(ver => fs.exists(manifestPath(p, ver)))
    val live = retained
      .flatMap(ver => currentFiles(spark, table, ver)).toSet
    val dataDir = new Path(p, "data")
    var removed = 0
    // snapshot dirs whose files THIS pass deletes: removable once empty
    // even though the deletions bump their mtime past the cutoff
    val emptiedHere = scala.collection.mutable.Set.empty[String]
    if (fs.exists(dataDir)) {
      listDataFiles(fs, dataDir).foreach { f =>
        if (!live.contains(relativize(p, f.getPath)) &&
          f.getModificationTime < cutoff) {
          fs.delete(f.getPath, false); removed += 1
          // the snapshot root is the direct child of data/
          var d = f.getPath.getParent
          while (d.getParent != null && d.getParent.getName != "data")
            d = d.getParent
          emptiedHere += d.toString: Unit
        }
      }
      // drop snapshot dirs emptied of data files entirely
      fs.listStatus(dataDir).foreach { d =>
        if (d.isDirectory && listDataFiles(fs, d.getPath).isEmpty &&
          (d.getModificationTime < cutoff ||
            emptiedHere.contains(d.getPath.toString)))
          fs.delete(d.getPath, true): Unit
      }
    }
    val mdir = new Path(p, ManifestDir)
    // serialize with same-JVM commits so the staged-file backstop can
    // never race a commit currently between create and rename
    commitMonitor(p).synchronized {
      fs.listStatus(mdir).foreach { m =>
        val n = m.getPath.getName
        val staleManifest = n.startsWith("v") && n.endsWith(".json") &&
          n.stripPrefix("v").stripSuffix(".json").toLong < retained.min
        // staged files orphaned by a hard crash between create and
        // rename (commitManifest cleans its own failures up; this is
        // the backstop) — swept only with a REAL age bound, so a
        // cross-process in-flight commit's staged file survives a
        // default-grace vacuum
        val staleStaged = n.startsWith(".") && n.contains(".tmp-") &&
          m.getModificationTime <
            System.currentTimeMillis() - math.max(graceMs, 600000L)
        if (staleManifest || staleStaged) fs.delete(m.getPath, false): Unit
      }
    }
    removed
  }
}
