package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.connector.catalog.Identifier
import java.nio.file.Files

/** SQL views over the graft catalog ([[graft.catalog.GraftCatalog]]
  * implements the DSv2 ViewCatalog; [[org.apache.spark.sql.GraftViewRule]]
  * provides the analyzer wiring Spark itself lacks — VERDICT r15
  * missing #6): CREATE [OR REPLACE] VIEW, SELECT through it, SHOW
  * VIEWS, ALTER VIEW SET/UNSET TBLPROPERTIES, DROP VIEW. Views
  * persist as JSON under the namespace's `_views/` dir — stateless
  * like tables, no metastore.
  */
class GraftViewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val s = GraftColumnBridge.sessionWithExtensions(
      new GraftExtensions().apply(_))
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  private val n = new java.util.concurrent.atomic.AtomicInteger(0)
  private def freshCatalog(): (String, String) = {
    val cat = s"viewc${n.incrementAndGet()}"
    val wh = Files.createTempDirectory("graft_view_wh").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, tag STRING)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1,'a'), (2,'b'), (3,'a')")
    (cat, wh)
  }

  private def graftCat(cat: String): graft.catalog.GraftCatalog =
    GraftColumnBridge.catalogPlugin(spark, cat)
      .asInstanceOf[graft.catalog.GraftCatalog]

  test("CREATE VIEW / SELECT / SHOW VIEWS / DROP VIEW round-trip") {
    val (cat, wh) = freshCatalog()
    spark.sql(
      s"CREATE VIEW $cat.db.v AS SELECT id FROM $cat.db.t WHERE tag = 'a'")
    assert(spark.sql(s"SELECT * FROM $cat.db.v ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // the view tracks the TABLE: new rows appear without touching it
    spark.sql(s"INSERT INTO $cat.db.t VALUES (4,'a')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.v").head().getLong(0)
      == 3L)
    assert(spark.sql(s"SHOW VIEWS IN $cat.db").collect()
      .map(_.getString(1)).toSeq == Seq("v"))
    // persisted under _views, never mistakable for a table
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(wh, "db", "_views", "v.json")))
    assert(spark.sql(s"SHOW TABLES IN $cat.db").collect()
      .map(_.getString(1)).toSeq == Seq("t"))
    // duplicate create refuses; IF NOT EXISTS tolerates and keeps the
    // original definition
    intercept[Exception] {
      spark.sql(s"CREATE VIEW $cat.db.v AS SELECT 1 AS one")
    }
    spark.sql(s"CREATE VIEW IF NOT EXISTS $cat.db.v AS SELECT 1 AS one")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.v").head().getLong(0)
      == 3L)
    spark.sql(s"DROP VIEW $cat.db.v")
    assert(spark.sql(s"SHOW VIEWS IN $cat.db").collect().isEmpty)
    intercept[Exception] { spark.sql(s"SELECT * FROM $cat.db.v").collect() }
    // DROP of a missing view refuses unless IF EXISTS
    intercept[Exception] { spark.sql(s"DROP VIEW $cat.db.v") }
    spark.sql(s"DROP VIEW IF EXISTS $cat.db.v")
  }

  test("CREATE OR REPLACE swaps the definition; ALTER VIEW properties; aliases") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE VIEW $cat.db.w AS SELECT id FROM $cat.db.t")
    spark.sql(s"CREATE OR REPLACE VIEW $cat.db.w AS " +
      s"SELECT tag, count(*) AS n FROM $cat.db.t GROUP BY tag")
    val rows = spark.sql(s"SELECT tag, n FROM $cat.db.w ORDER BY tag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("a", 2L), ("b", 1L)))
    val ident = Identifier.of(Array("db"), "w")
    spark.sql(s"ALTER VIEW $cat.db.w SET TBLPROPERTIES ('team' = 'ml')")
    assert(graftCat(cat).loadView(ident).properties().get("team") == "ml")
    spark.sql(s"ALTER VIEW $cat.db.w UNSET TBLPROPERTIES ('team')")
    assert(!graftCat(cat).loadView(ident).properties().containsKey("team"))
    intercept[Exception] {
      spark.sql(s"ALTER VIEW $cat.db.w UNSET TBLPROPERTIES ('absent')")
    }
    spark.sql(
      s"ALTER VIEW $cat.db.w UNSET TBLPROPERTIES IF EXISTS ('absent')")
    // user-specified column aliases rename the served output
    spark.sql(s"CREATE VIEW $cat.db.a (ident, label) AS " +
      s"SELECT id, tag FROM $cat.db.t")
    assert(spark.sql(s"SELECT * FROM $cat.db.a").columns.toSeq ==
      Seq("ident", "label"))
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.db.a WHERE label = 'a'")
      .head().getLong(0) == 2L)
  }

  test("capture-time context: unqualified names resolve where the view was defined") {
    val (cat, _) = freshCatalog()
    // define the view FROM the graft catalog's namespace with an
    // unqualified table name; read it from a different context
    spark.sql(s"USE $cat.db")
    try {
      spark.sql(s"CREATE VIEW ctxv AS SELECT id FROM t WHERE id >= 2")
      spark.sql(s"INSERT INTO t VALUES (9, 'z')")
      // bare SHOW VIEWS inside the graft namespace lists it
      assert(spark.sql("SHOW VIEWS").collect()
        .map(_.getString(1)).toSeq == Seq("ctxv"))
      // TEMP views stay Spark's even while a graft catalog is current
      // (the shadowing guard): create, read, and drop by bare name
      spark.sql("CREATE TEMPORARY VIEW tmpv AS SELECT 42 AS x")
      assert(spark.sql("SELECT x FROM tmpv").head().getInt(0) == 42)
      spark.sql("DROP VIEW tmpv")
      intercept[Exception] { spark.sql("SELECT x FROM tmpv").collect() }
    } finally spark.sql("USE spark_catalog.default")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.ctxv")
      .head().getLong(0) == 3L) // 2, 3 and the post-create 9
    // views over views resolve through repeated expansion
    spark.sql(s"CREATE VIEW $cat.db.v2 AS " +
      s"SELECT count(*) AS c FROM $cat.db.ctxv")
    assert(spark.sql(s"SELECT c FROM $cat.db.v2").head().getLong(0) == 3L)
    // CTE names inside a view body stay CTE-local (never qualified)
    spark.sql(s"CREATE VIEW $cat.db.cte AS " +
      s"WITH x AS (SELECT id FROM $cat.db.t WHERE id <= 2) " +
      "SELECT count(*) AS c FROM x")
    assert(spark.sql(s"SELECT c FROM $cat.db.cte").head().getLong(0) == 2L)
  }

  test("ALTER VIEW RENAME TO; view composes with deletion vectors") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE VIEW $cat.db.r AS SELECT id FROM $cat.db.t")
    spark.sql(s"ALTER VIEW $cat.db.r RENAME TO r2")
    assert(spark.sql(s"SHOW VIEWS IN $cat.db").collect()
      .map(_.getString(1)).toSeq == Seq("r2"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.r2")
      .head().getLong(0) == 3L)
    intercept[Exception] { spark.sql(s"SELECT * FROM $cat.db.r").collect() }
    // a view over a DV-bearing table serves the anti-joined rows (the
    // extension's DV read rule fires on the expansion's relation)
    graft.sinks.ManifestTable.deleteVectors(spark, s"$wh/db/t",
      org.apache.spark.sql.functions.col("id") === 2L)
    assert(spark.sql(s"SELECT id FROM $cat.db.r2 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("foreign-catalog view DDL is never claimed under USE <graftcat>") {
    val (cat, _) = freshCatalog()
    // fully-qualified session-catalog view statements must reach
    // Spark's own catalog even while the graft catalog is current —
    // a resolvable NON-graft head catalog ends the claim (ADVICE r16)
    spark.sql(s"USE $cat.db")
    try {
      spark.sql(
        "CREATE VIEW spark_catalog.default.sess_v AS SELECT 1 AS one")
      assert(spark.sql("SELECT one FROM spark_catalog.default.sess_v")
        .head().getInt(0) == 1)
      // it lives in the session catalog — never materialized under the
      // graft namespace that happens to be current
      assert(spark.sql(s"SHOW VIEWS IN $cat.db").collect().isEmpty)
      assert(!graftCat(cat).viewExists(
        Identifier.of(Array("spark_catalog", "default"), "sess_v")))
      spark.sql("ALTER VIEW spark_catalog.default.sess_v " +
        "SET TBLPROPERTIES ('k' = 'v')")
      spark.sql("DROP VIEW spark_catalog.default.sess_v")
      assert(spark.sql("SHOW VIEWS IN spark_catalog.default").collect()
        .forall(_.getString(1) != "sess_v"))
    } finally spark.sql("USE spark_catalog.default")
  }

  test("view/table collisions refuse with the ViewCatalog exception kinds") {
    val (cat, _) = freshCatalog()
    // CREATE VIEW over the TABLE's identifier: TableAlreadyExists —
    // the contract distinguishes which kind of object is in the way
    val e1 = intercept[Exception] {
      spark.sql(s"CREATE VIEW $cat.db.t AS SELECT 1 AS one")
    }
    assert(e1.isInstanceOf[
      org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException],
      s"table collision must be TableAlreadyExists, got ${e1.getClass}")
    // CREATE TABLE (plain, CTAS, OR REPLACE) over a VIEW's identifier
    // refuses instead of minting a duplicate identity where reads
    // resolve the table while SHOW VIEWS still lists the view.
    // Plain CREATE/CTAS collide as TableAlreadyExists (the
    // TABLE_OR_VIEW error class — ADVICE r17: the subclass is what
    // lets IF NOT EXISTS no-op below); OR REPLACE keeps the loud
    // ViewAlreadyExists (never suppressed).
    spark.sql(s"CREATE VIEW $cat.db.w AS SELECT id FROM $cat.db.t")
    def refusesAs(sql: String, klass: Class[_]): Unit = {
      val e = intercept[Exception] { spark.sql(sql) }
      assert(klass.isInstance(e),
        s"[$sql] must refuse as ${klass.getSimpleName}, got ${e.getClass}: $e")
    }
    val tableKind = classOf[
      org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException]
    val viewKind = classOf[
      org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException]
    refusesAs(s"CREATE TABLE $cat.db.w (id BIGINT)", tableKind)
    refusesAs(s"CREATE TABLE $cat.db.w AS SELECT 1 AS one", tableKind)
    refusesAs(s"CREATE OR REPLACE TABLE $cat.db.w AS SELECT 1 AS one",
      viewKind)
    // IF NOT EXISTS over the occupied identifier: silent no-op
    // (session-catalog semantics — any occupant satisfies the clause)
    spark.sql(s"CREATE TABLE IF NOT EXISTS $cat.db.w (id BIGINT)")
    // single identity intact: still exactly one view, reads resolve it
    assert(spark.sql(s"SHOW VIEWS IN $cat.db").collect()
      .map(_.getString(1)).toSeq == Seq("w"))
    assert(spark.sql(s"SHOW TABLES IN $cat.db").collect()
      .map(_.getString(1)).toSeq == Seq("t"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.w").head().getLong(0)
      == 3L)
  }

  test("views survive a fresh catalog instance (persisted, stateless)") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE VIEW $cat.db.s AS " +
      s"SELECT id * 2 AS twice, tag FROM $cat.db.t")
    val cat2 = s"${cat}x"
    spark.conf.set(s"spark.sql.catalog.$cat2", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat2.warehouse", wh)
    val got = spark.sql(s"SELECT twice FROM $cat2.db.s ORDER BY twice")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 4L, 6L))
  }
}
