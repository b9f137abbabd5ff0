package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sinks.ManifestTable

/** `spark.readStream.format("graft")` — a Structured Streaming SOURCE
  * that tails a manifest table's delta log (VERDICT r11 next-round
  * #2), replacing the poll loop around `consumeChanges` with the
  * engine's own trigger/checkpoint machinery:
  *
  *  - OFFSETS ARE LOG VERSIONS. A micro-batch covers the version
  *    range `(start, end]`; its rows are exactly the files appended by
  *    the commits in that range (`fromVersion == 0` = the initial full
  *    snapshot — the Delta-source admission model). Versions are
  *    durable and totally ordered, so restart-from-checkpoint resumes
  *    mid-log exactly once with no source-side state at all;
  *  - each batch plans as ONE Catalyst-native parquet relation over
  *    immutable files — replayable any number of times (the
  *    exactly-once-per-batch half the engine's checkpoint needs);
  *  - compaction commits are SKIPPED (`dataChange = false` — same
  *    rows, new files); delete/merge/overwrite commits fail the
  *    stream loudly (a file-additions stream cannot express removals;
  *    restart from a fresh checkpoint to re-snapshot);
  *  - `maxVersionsPerTrigger` bounds admission per micro-batch (the
  *    rate-limit knob); `maxFilesPerTrigger` / `maxBytesPerTrigger`
  *    bound it at FILE/BYTE granularity, splitting WITHIN a version
  *    (the initial snapshot included) with restart-exact mid-version
  *    offsets — one huge backfill commit no longer admits unbounded
  *    data per trigger; an idle trigger admits nothing and emits
  *    nothing.
  *
  * At 100 TB the tailing job does O(appended-files) work per trigger —
  * the table's size never enters the read path. Options:
  * `path` (table root, required), `maxVersionsPerTrigger`,
  * `maxFilesPerTrigger`, `maxBytesPerTrigger` (all default unlimited).
  *
  * Batch reads work too: `spark.read.format("graft").load(path)` is
  * the statistics-pruning native scan ([[ManifestTable.scan]]).
  */
class GraftManifestSourceProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "format(\"graft\") needs .option(\"path\", <manifest table root>) " +
        "or .load(<path>)"))

  private def isChangeFeed(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  /** The source schema is the native scan's (recorded schema, data
    * columns then partition columns) — pinned at stream start; schema
    * evolution mid-stream needs a restart, like the file sources.
    * With `readChangeFeed = true` the row-CDF columns
    * (`_change_type`, `_commit_version`) are appended.
    */
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(),
      schema.getOrElse {
        val base =
          ManifestTable.scan(sqlContext.sparkSession, tablePath(parameters))
            .schema
        if (!isChangeFeed(parameters)) base
        else StructType(base.fields ++ Seq(
          org.apache.spark.sql.types.StructField(
            ManifestTable.ChangeTypeCol,
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField(
            ManifestTable.CommitVersionCol,
            org.apache.spark.sql.types.LongType, nullable = false)))
      })

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    // `startingTimestamp` is sugar over `startingVersion`: deliver
    // every commit stamped AT OR AFTER the timestamp, i.e. tail
    // exclusively after the latest commit strictly BEFORE it (the
    // Delta startingTimestamp contract — a commit stamped exactly at
    // the timestamp is INCLUDED; a timestamp before the earliest
    // retained commit clamps to the full initial snapshot; a future
    // timestamp tails new commits only — ADVICE r14). The string
    // parses like SQL CAST (date-only and ISO 'T' forms accepted) in
    // the SESSION zone. Mutually exclusive with startingVersion.
    val fromTs = parameters.get("startingTimestamp").map { ts =>
      require(!parameters.contains("startingVersion"),
        "pass startingVersion OR startingTimestamp, not both")
      ManifestTable.versionStrictlyBefore(sqlContext.sparkSession,
        tablePath(parameters),
        ManifestTable.parseTimestampMillis(sqlContext.sparkSession, ts))
    }
    // file/byte-granular admission (VERDICT r14 #7): split WITHIN a
    // version (snapshot included) while keeping offset exactness.
    // maxBytesPerTrigger accepts size strings ("64m") like the file
    // sources; both must be positive.
    val maxFiles = parameters.get("maxFilesPerTrigger").map(_.toLong)
    val maxBytes = parameters.get("maxBytesPerTrigger")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
    require(maxFiles.forall(_ > 0), "maxFilesPerTrigger must be positive")
    require(maxBytes.forall(_ > 0), "maxBytesPerTrigger must be positive")
    new GraftManifestSource(sqlContext.sparkSession,
      tablePath(parameters),
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      parameters.get("maxVersionsPerTrigger").map(_.toInt),
      fromTs.orElse(parameters.get("startingVersion").map(_.toLong))
        .getOrElse(0L),
      changeFeed = isChangeFeed(parameters),
      maxFilesPerTrigger = maxFiles,
      maxBytesPerTrigger = maxBytes)
  }

  /** `df.writeStream.format("graft")` — the sink half of the
    * symmetry: each micro-batch folds in through
    * [[ManifestTable.appendStreamBatch]] (the per-app batch-id
    * watermark in the manifest log makes replays no-ops — the same
    * exactly-once contract [[ManifestTable.streamInto]] wires by
    * hand). Options: `path` (required), `txnAppId` (defaults to the
    * STREAMING QUERY ID — persisted in the query's checkpoint, so it
    * is stable across restarts of the same query, distinct across
    * queries, and REGENERATED when a checkpoint is wiped and rebuilt
    * at the same path, which is exactly when old batch ids must NOT
    * be treated as replays; pass an explicit id to survive an
    * intentional checkpoint relocation that should keep its
    * watermark), `partitionBy` is the writer's `partitionBy(...)`
    * clause.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft streaming sink is append-only (got $outputMode) — " +
        "aggregations stream through foreachBatch + merge/update")
    val table = tablePath(parameters)
    val explicitApp = parameters.get("txnAppId")
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long,
          data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): Unit = {
        // the watermark identity must be PER QUERY, not per table: two
        // queries (each with batchIds from 0) sharing one app id would
        // swallow each other's batches. The engine sets the query id
        // as a local property on the batch thread (the Delta-sink
        // identity recipe).
        val app = explicitApp.getOrElse {
          val qid = data.sparkSession.sparkContext
            .getLocalProperty("sql.streaming.queryId")
          require(qid != null,
            "graft streaming sink could not resolve the streaming " +
              "query id — pass an explicit txnAppId option")
          qid
        }
        ManifestTable.appendStreamBatch(data.sparkSession,
          // the addBatch frame is pinned to the stream's incremental
          // execution; re-wrap its rows as a batch frame to write
          org.apache.spark.sql.GraftColumnBridge.batchDataFrame(data),
          table, batchId, app, partitionColumns): Unit
      }
      override def toString: String = s"GraftManifestSink[$table]"
    }
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val spark = sqlContext.sparkSession
    val table = tablePath(parameters)
    // TIME TRAVEL on the path-based reader (the Delta option parity):
    // `versionAsOf` pins a manifest version, `timestampAsOf` resolves
    // a wall-clock through the same session-zone parser every other
    // timestamp surface uses
    require(!(parameters.contains("versionAsOf") &&
      parameters.contains("timestampAsOf")),
      "pass versionAsOf OR timestampAsOf, not both")
    val v = parameters.get("versionAsOf").map(_.toLong)
      .orElse(parameters.get("timestampAsOf").map(ts =>
        ManifestTable.versionAtTimestamp(spark, table,
          ManifestTable.parseTimestampMillis(spark, ts))))
      .getOrElse(-1L)
    ManifestTable.scan(spark, table, v).queryExecution.logical match {
      case LogicalRelation(rel, _, _, _, _) => rel
      // a DV-bearing or column-mapped snapshot plans as more than a
      // bare relation (anti-join / renaming projection), which a
      // BaseRelation cannot express — the readerFeatures refusal
      case _ => throw new UnsupportedOperationException(
        s"table $table carries deletion vectors or column mapping " +
          "spark.read.format(\"graft\") cannot apply — read via " +
          "ManifestTable.read/scan or the SQL catalog (GraftExtensions " +
          "applies them there), or run ManifestTable.compact(...) / " +
          "rewrite to materialize")
    }
  }
}

/** One position in the streamed file sequence. The WHOLE-VERSION
  * boundary form (`index < 0`) serializes as the plain version number
  * — byte-identical to every pre-r15 checkpoint, so existing streams
  * restart unchanged. File/byte-granular admission (VERDICT r14 #7)
  * adds MID-VERSION positions: `(version, index, snap)` = "the first
  * `index` files of `version`'s unit are delivered", where the unit
  * is the pinned initial snapshot's sorted file list (`snap = true`)
  * or the version's manifest add list (`snap = false`) — both
  * persisted/deterministic orders, so a checkpointed mid-version
  * offset resolves to the same files on any restart.
  */
final case class GraftVersionOffset(version: Long, index: Long = -1L,
    snap: Boolean = false) extends Offset {
  override def json: String =
    if (index < 0) version.toString
    else s"""{"v":$version,"i":$index,"s":${if (snap) 1 else 0}}"""
  /** Total delivery order: a boundary sorts after any mid-version
    * position of the same version.
    */
  def key: (Long, Long) = (version, if (index < 0) Long.MaxValue else index)
}

object GraftVersionOffset {
  private val MidForm = """\{"v":(\d+),"i":(\d+),"s":([01])\}""".r
  def parse(json: String): GraftVersionOffset = json.trim match {
    case MidForm(v, i, s) => GraftVersionOffset(v.toLong, i.toLong, s == "1")
    case plain => GraftVersionOffset(plain.toLong)
  }
  val ordering: Ordering[GraftVersionOffset] = Ordering.by(_.key)
}

/** The V1 streaming source (the Delta-source architecture: `getBatch`
  * returns a replayable relation over immutable files; all progress
  * state lives in the engine's checkpoint as serialized offsets).
  */
final class GraftManifestSource(spark: SparkSession, table: String,
    override val schema: StructType,
    maxVersionsPerTrigger: Option[Int],
    startingVersion: Long = 0L,
    changeFeed: Boolean = false,
    maxFilesPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends Source with SupportsTriggerAvailableNow {

  /** File/byte-granular admission (VERDICT r14 #7) splits WITHIN a
    * version — including the initial snapshot, so one huge backfill
    * commit no longer admits unbounded data per trigger (the
    * Delta/file-source rate-limit contract). Offsets stay exact
    * across restarts: mid-version positions index persisted,
    * deterministic file orders ([[GraftVersionOffset]]).
    */
  private val fileGranular =
    maxFilesPerTrigger.nonEmpty || maxBytesPerTrigger.nonEmpty
  require(!(fileGranular && changeFeed),
    "maxFilesPerTrigger/maxBytesPerTrigger cannot combine with " +
      "readChangeFeed — a CDC version is one atomic change set; rate " +
      "limit the feed with maxVersionsPerTrigger")

  /** Highest position this source instance has offered, delivered or
    * seen COMMITTED — ratchets admission forward under the rate
    * limits. NOT durable state: on restart the engine restores it
    * through `getBatch` (a pending uncommitted batch) or [[commit]]
    * (recovery of committed batches) before new offsets matter —
    * without the commit hook, a rate-limited restart whose last batch
    * committed would offer an offset BELOW the checkpoint and
    * redeliver already-committed data. Starts at `startingVersion`:
    * `0` (the default) delivers the current snapshot first; `N > 0`
    * tails ONLY commits after version N — the "new appends only"
    * production tail that skips the historical backfill (the Delta
    * `startingVersion` knob); versions ≤ N are never admitted, even
    * when the table has not reached N yet at stream start.
    */
  private var floor = GraftVersionOffset(math.max(0L, startingVersion))

  private def ratchet(o: GraftVersionOffset): Unit =
    if (GraftVersionOffset.ordering.gt(o, floor)) floor = o

  /** The pinned snapshot file list mid-snapshot offsets index into —
    * memoized per version (re-resolved identically on restart; the
    * sort makes the order instance-independent).
    */
  private var snapMemo: (Long, IndexedSeq[(String, Long)]) = (-1L, null)
  private def snapshotList(v: Long): IndexedSeq[(String, Long)] = {
    if (snapMemo._1 != v)
      snapMemo = v -> ManifestTable.snapshotFilesWithSizes(spark, table, v)
        .toIndexedSeq
    snapMemo._2
  }

  private def limitReached(files: Long, bytes: Long): Boolean =
    maxFilesPerTrigger.exists(files >= _) ||
      maxBytesPerTrigger.exists(bytes >= _)

  override def getOffset: Option[Offset] = synchronized { nextOffset() }

  /** `Trigger.AvailableNow` latch (the Delta-source recipe —
    * [[SupportsTriggerAvailableNow]]): the head position frozen at
    * query start. Offers clamp at it, so the query drains to exactly
    * this point in rate-limited batches and then STOPS — commits that
    * land after the latch belong to the next run.
    */
  @volatile private var availableNowCap: Option[GraftVersionOffset] = None

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    availableNowCap = Some(GraftVersionOffset(
      ManifestTable.currentVersion(spark, table)))
  }

  /** Admission is baked into the offset walk itself (versions/files/
    * bytes options), so the engine-side limit is pass-through. */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** The admission-control face of [[getOffset]] — the engine calls
    * this form when the source declares admission control. `start` is
    * ignored: the floor tracks delivery exactly as the V1 contract
    * restores it (getBatch for pending batches, commit for recovery).
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 =
    synchronized { nextOffset().orNull }

  /** The shared admission walk: the bounded next offset, clamped at
    * the AvailableNow latch, floor ratcheted on what is offered.
    */
  private def nextOffset(): Option[Offset] = {
    val current = ManifestTable.currentVersion(spark, table)
    // nothing yet: table absent, or the tail starts beyond the head
    if (current == 0 || current <= startingVersion) return None
    val candidate: Option[GraftVersionOffset] =
      if (!fileGranular) {
        val offered = maxVersionsPerTrigger match {
          // the INITIAL SNAPSHOT is always delivered whole at the CURRENT
          // version (Delta's initial-snapshot semantics): floor == 0 means
          // this fresh stream's first batch resolves the snapshot, and
          // rate-limiting it to floor+n would instead replay the log
          // commit-by-commit from v1 — any historical rewrite commit would
          // permanently wedge the stream, and a restart from a fresh
          // checkpoint replays into the same rewrite (ADVICE r12). The
          // limit applies to post-snapshot increments only. (On restart
          // the engine restores `floor` through getBatch/commit before
          // getOffset runs, so floor == 0 here really is a fresh stream;
          // startingVersion > 0 tails increments from the start and rate
          // limits from its very first batch.)
          case Some(_) if floor.version == 0L => current
          case Some(n) => math.min(current, floor.version + math.max(1, n))
          case None => current
        }
        Some(GraftVersionOffset(offered))
          .filter(_.version > startingVersion)
      } else nextFileGranular(current)
    val clamped = availableNowCap match {
      case None => candidate
      case Some(cap) => candidate
        .map(o => if (GraftVersionOffset.ordering.gt(o, cap)) cap else o)
        .filter(o => GraftVersionOffset.ordering.gt(o, floor))
    }
    clamped.foreach(ratchet)
    clamped
  }

  /** The file/byte-limited walk: continue the pinned snapshot if one
    * is mid-delivery (or start it on a fresh stream), else admit
    * whole-version adds until a limit trips mid-version. Always
    * admits at least one file per trigger; versions with no adds
    * (compactions, metadata) advance the boundary for free; a rewrite
    * commit first drains everything before it, then gets offered as a
    * bare boundary so delivery fails with the loud
    * [[ManifestTable.streamRewriteError]] contract.
    */
  private def nextFileGranular(current: Long): Option[GraftVersionOffset] = {
    // snapshot phase: fresh stream (nothing delivered, no tail start)
    // or a checkpointed mid-snapshot position
    if (floor.snap ||
        (floor.version == 0L && floor.index < 0 && startingVersion == 0L)) {
      // pin the fresh-stream snapshot at the AvailableNow latch, not at
      // `current` re-read here: a commit landing between
      // prepareForTriggerAvailableNow and the first offer would
      // otherwise push every mid-snapshot offset ABOVE the cap, where
      // nextOffset clamps them to the bare boundary and the whole
      // snapshot ships in one batch, silently dropping the
      // maxFilesPerTrigger/maxBytesPerTrigger contract (ADVICE r16)
      val snapV =
        if (floor.snap) floor.version
        else availableNowCap.fold(current)(c => math.min(current, c.version))
      val list = snapshotList(snapV)
      val i0 = if (floor.snap) floor.index else 0L
      if (i0 < list.size) {
        var i = i0
        var nf = 0L
        var nb = 0L
        while (i < list.size && !limitReached(nf, nb)) {
          nb += list(i.toInt)._2; nf += 1; i += 1
        }
        return Some(
          if (i >= list.size) GraftVersionOffset(snapV) // snapshot done
          else GraftVersionOffset(snapV, i, snap = true))
      }
      // list exhausted exactly at floor: emit the boundary and tail on
      if (floor.snap) return Some(GraftVersionOffset(floor.version))
    }
    // incremental phase: start within floor.version when mid-adds
    val midAdds = !floor.snap && floor.index >= 0
    val walkFrom = if (midAdds) floor.version - 1 else floor.version
    // the walk ceiling honors the AvailableNow latch too, so
    // file-granular positions stay at or below the cap instead of
    // being clamped to its bare boundary after the fact
    val head = availableNowCap.fold(current)(c => math.min(current, c.version))
    val capped = maxVersionsPerTrigger
      .map(n => math.min(head, floor.version + math.max(1, n)))
      .getOrElse(head)
    if (capped <= walkFrom) return None
    val per = ManifestTable.addsWithSizes(spark, table, walkFrom,
      capped) match {
      case Right(s) => s
      case Left(rw) =>
        ManifestTable.addsWithSizes(spark, table, walkFrom, rw - 1) match {
          case Right(s) if s.nonEmpty => s
          // nothing deliverable before the rewrite: offer it as a
          // boundary — getBatch throws the documented failure
          case _ => return Some(GraftVersionOffset(rw))
        }
    }
    var nf = 0L
    var nb = 0L
    var pos = floor
    var vi = 0
    while (vi < per.size) {
      val (v, fs0) = per(vi)
      val skip = if (midAdds && v == floor.version) floor.index else 0L
      // a limit met at a version BOUNDARY stops there (never emit a
      // zero-progress mid position of the next version)
      if (limitReached(nf, nb) && fs0.size > skip)
        return Some(pos).filter(GraftVersionOffset.ordering.gt(_, floor))
      var i = skip
      while (i < fs0.size) {
        if (limitReached(nf, nb))
          return Some(GraftVersionOffset(v, i, snap = false))
        nb += fs0(i.toInt)._2; nf += 1; i += 1
      }
      pos = GraftVersionOffset(v) // version fully admitted
      vi += 1
    }
    Some(pos).filter(GraftVersionOffset.ordering.gt(_, floor))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame =
    synchronized {
      val endO = GraftVersionOffset.parse(end.json)
      val rawStart = start.map(o => GraftVersionOffset.parse(o.json))
        .getOrElse(GraftVersionOffset(0L))
      val from =
        if (rawStart.version < startingVersion)
          GraftVersionOffset(startingVersion)
        else rawStart
      ratchet(endO) // restart: resume admission past `end`
      // CDC mode: row-level change batches (appends as inserts,
      // rewrites from their recorded change files) instead of the
      // plain additions feed — always whole-version (see require)
      if (changeFeed)
        return ManifestTable.streamChangeBatch(spark, table,
          from.version, endO.version)
      if (from.index < 0 && !from.snap && endO.index < 0 && !endO.snap)
        // boundary-to-boundary: the whole-version path, byte-identical
        // to pre-r15 behavior (fresh checkpoints included)
        return ManifestTable.streamBatch(spark, table,
          from.version, endO.version)
      if (endO.snap || from.snap) {
        // snapshot-subset delivery: positions index the pinned list
        val snapV = endO.version
        val list = snapshotList(snapV)
        val i0 = if (from.snap) from.index else 0L
        val i1 = if (endO.snap) endO.index else list.size.toLong
        return ManifestTable.streamFilesBatch(spark, table,
          list.slice(i0.toInt, i1.toInt).map(_._1), snapV, snapshot = true)
      }
      // incremental slice: rest of a mid-adds start version, whole
      // versions between, head of a mid-adds end version
      val walkFrom = if (from.index >= 0) from.version - 1 else from.version
      val per = ManifestTable.addsWithSizes(spark, table, walkFrom,
        endO.version) match {
        case Right(s) => s
        case Left(rw) => throw ManifestTable.streamRewriteError(
          table, walkFrom, endO.version, rw)
      }
      val files = per.flatMap { case (v, fs) =>
        val afterStart =
          if (from.index >= 0 && v == from.version) fs.drop(from.index.toInt)
          else fs
        if (endO.index >= 0 && v == endO.version) {
          val already = if (from.index >= 0 && v == from.version)
            from.index else 0L
          afterStart.take((endO.index - already).toInt)
        } else afterStart
      }.map(_._1)
      ManifestTable.streamFilesBatch(spark, table, files, endO.version,
        snapshot = false)
    }

  override def commit(end: Offset): Unit = synchronized {
    // called for completed batches, INCLUDING during restart recovery:
    // the admission floor must never regress below a committed offset
    ratchet(GraftVersionOffset.parse(end.json))
  }

  override def stop(): Unit = ()
}
