package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
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
  *    rate-limit knob); an idle trigger admits nothing and emits
  *    nothing.
  *
  * At 100 TB the tailing job does O(appended-files) work per trigger —
  * the table's size never enters the read path. Options:
  * `path` (table root, required), `maxVersionsPerTrigger`
  * (default unlimited).
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
    new GraftManifestSource(sqlContext.sparkSession,
      tablePath(parameters),
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      parameters.get("maxVersionsPerTrigger").map(_.toInt),
      fromTs.orElse(parameters.get("startingVersion").map(_.toLong))
        .getOrElse(0L),
      changeFeed = isChangeFeed(parameters))
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
    val table = tablePath(parameters)
    // a DV-bearing snapshot plans as relation + anti-join, which a
    // BaseRelation cannot express — refuse with the readerFeatures
    // error instead of failing the pattern match below (ADVICE r12)
    if (ManifestTable.hasDeletionVectors(sqlContext.sparkSession, table))
      throw new UnsupportedOperationException(
      s"table $table carries deletion vectors spark.read.format(\"graft\") " +
        "cannot apply — read via ManifestTable.read/scan or the SQL " +
        "catalog (GraftExtensions applies the DV anti-join there), or " +
        "run ManifestTable.compact(...) to materialize them")
    ManifestTable.scan(sqlContext.sparkSession, table)
      .queryExecution.logical match {
      case LogicalRelation(rel, _, _, _, _) => rel
      case other => throw new IllegalStateException(
        s"native scan planned unexpectedly: $other")
    }
  }
}

/** One version-offset of the manifest log. */
final case class GraftVersionOffset(version: Long) extends Offset {
  override def json: String = version.toString
}

/** The V1 streaming source (the Delta-source architecture: `getBatch`
  * returns a replayable relation over immutable files; all progress
  * state lives in the engine's checkpoint as serialized offsets).
  */
final class GraftManifestSource(spark: SparkSession, table: String,
    override val schema: StructType,
    maxVersionsPerTrigger: Option[Int],
    startingVersion: Long = 0L,
    changeFeed: Boolean = false) extends Source {

  /** Highest version this source instance has offered, delivered or
    * seen COMMITTED — ratchets admission forward under
    * `maxVersionsPerTrigger`. NOT durable state: on restart the
    * engine restores it through `getBatch` (a pending uncommitted
    * batch) or [[commit]] (recovery of committed batches) before new
    * offsets matter — without the commit hook, a rate-limited restart
    * whose last batch committed would offer an offset BELOW the
    * checkpoint and redeliver already-committed versions. Starts at
    * `startingVersion`: `0` (the default) delivers the full current
    * snapshot as the first batch; `N > 0` tails ONLY commits after
    * version N — the "new appends only" production tail that skips
    * the historical backfill (the Delta `startingVersion` knob);
    * versions ≤ N are never admitted, even when the table has not
    * reached N yet at stream start.
    */
  private var floor = math.max(0L, startingVersion)

  private def versionOf(o: Offset): Long = o.json.toLong

  override def getOffset: Option[Offset] = synchronized {
    val current = ManifestTable.currentVersion(spark, table)
    // nothing yet: table absent, or the tail starts beyond the head
    if (current == 0 || current <= startingVersion) return None
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
      case Some(_) if floor == 0L => current
      case Some(n) => math.min(current, floor + math.max(1, n))
      case None => current
    }
    floor = math.max(floor, offered)
    if (offered <= startingVersion) None
    else Some(GraftVersionOffset(offered))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame =
    synchronized {
      val from = math.max(start.map(versionOf).getOrElse(0L), startingVersion)
      val to = versionOf(end)
      floor = math.max(floor, to) // restart: resume admission past `to`
      // CDC mode: row-level change batches (appends as inserts,
      // rewrites from their recorded change files) instead of the
      // plain additions feed
      if (changeFeed) ManifestTable.streamChangeBatch(spark, table, from, to)
      else ManifestTable.streamBatch(spark, table, from, to)
    }

  override def commit(end: Offset): Unit = synchronized {
    // called for completed batches, INCLUDING during restart recovery:
    // the admission floor must never regress below a committed offset
    floor = math.max(floor, versionOf(end))
  }

  override def stop(): Unit = ()
}
