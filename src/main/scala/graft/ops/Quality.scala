package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality and integration-maintenance operators — the checks an
  * ETL engine (the reference's domain) runs on every load, plus
  * upsert/merge semantics for incremental feeds.
  *
  * All checks return VIOLATION ROWS (empty result = clean), so they
  * compose as gating steps in a pipeline and scale as ordinary
  * joins/aggregates.
  */
object Quality {

  /** Generic FK check: rows of `child` whose `fkCol` has no match in
    * `parent.pkCol` — a left-anti join, i.e. one shuffle (or none when
    * the parent side broadcasts).
    */
  def fkViolations(child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String): DataFrame =
    child.join(parent, child(fkCol) === parent(pkCol), "left_anti")

  /** q43: referential integrity over the star schema — lineitem rows
    * whose order or part key dangles. The fixture is clean on orders
    * but the check must PROVE that, so the query reports per-FK
    * violation counts (zeros included).
    */
  def q43FkIntegrity(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val badOrders = fkViolations(li, "l_orderkey", Tables.orders(spark, sfDir), "o_orderkey")
      .agg(count(lit(1)).as("n")).withColumn("fk", lit("l_orderkey->o_orderkey"))
    val badParts = fkViolations(li, "l_partkey", Tables.part(spark, sfDir), "p_partkey")
      .agg(count(lit(1)).as("n")).withColumn("fk", lit("l_partkey->p_partkey"))
    val badCusts = fkViolations(Tables.orders(spark, sfDir), "o_custkey",
      Tables.customer(spark, sfDir), "c_custkey")
      .agg(count(lit(1)).as("n")).withColumn("fk", lit("o_custkey->c_custkey"))
    badOrders.unionByName(badParts).unionByName(badCusts)
      .select(col("fk"), col("n"))
      .orderBy(col("fk").asc_nulls_last)
  }

  val q43Sql: String =
    """SELECT fk, n FROM (
      |  SELECT 'l_orderkey->o_orderkey' AS fk, count(*) AS n FROM lineitem
      |    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |  UNION ALL
      |  SELECT 'l_partkey->p_partkey', count(*) FROM lineitem
      |    WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
      |  UNION ALL
      |  SELECT 'o_custkey->c_custkey', count(*) FROM orders
      |    WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
      |ORDER BY fk ASC NULLS LAST""".stripMargin

  /** q44: uniqueness / primary-key check — key groups appearing more
    * than once, with multiplicities. Run on the composite lineitem key
    * (clean) and on a deliberately non-unique column to show actual
    * violations.
    */
  def q44Uniqueness(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val pkDups = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("multiplicity"))
      .filter(col("multiplicity") > 1)
      .agg(coalesce(sum(col("multiplicity")), lit(0L)).as("n"),
        count(lit(1)).as("n_keys"))
      .withColumn("check", lit("pk(l_orderkey,l_linenumber)"))
    val orderDups = li.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("multiplicity"))
      .filter(col("multiplicity") > 1)
      .agg(coalesce(sum(col("multiplicity")), lit(0L)).as("n"),
        count(lit(1)).as("n_keys"))
      .withColumn("check", lit("nonunique(l_orderkey)"))
    pkDups.unionByName(orderDups)
      .select(col("check"), col("n"), col("n_keys"))
      .orderBy(col("check").asc_nulls_last)
  }

  val q44Sql: String =
    """SELECT "check", n, n_keys FROM (
      |  SELECT 'pk(l_orderkey,l_linenumber)' AS "check",
      |    CAST(coalesce(sum(multiplicity), 0) AS BIGINT) AS n, count(*) AS n_keys
      |  FROM (SELECT l_orderkey, l_linenumber, count(*) AS multiplicity
      |        FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1)
      |  UNION ALL
      |  SELECT 'nonunique(l_orderkey)', CAST(coalesce(sum(multiplicity), 0) AS BIGINT), count(*)
      |  FROM (SELECT l_orderkey, count(*) AS multiplicity
      |        FROM lineitem GROUP BY 1 HAVING count(*) > 1))
      |ORDER BY "check" ASC NULLS LAST""".stripMargin

  /** Merge/upsert by key, latest-wins: the incremental-load primitive.
    * A batch of updates (here: re-delivered orders with bumped prices)
    * is unioned with the base table and deduplicated per key by
    * recency — one window pass, the distributed MERGE pattern.
    */
  def upsertLatest(base: DataFrame, updates: DataFrame,
      key: Seq[String], versionCol: Column): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(versionCol.desc, col("__src").desc)
    base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
  }

  /** q45: upsert-latest over orders — a simulated redelivery batch
    * (every 10th order, price +1) merged latest-wins; aggregate proves
    * exactly those rows were replaced.
    */
  def q45UpsertLatest(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val updates = o.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    upsertLatest(o, updates, Seq("o_orderkey"), col("o_orderdate"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_last)
  }

  val q45Sql: String =
    """WITH updates AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1.0 AS o_totalprice,
      |    o_orderdate, o_orderpriority, 1 AS __src
      |  FROM orders WHERE o_orderkey % 10 = 0),
      |unioned AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
      |    o_orderpriority, 0 AS __src FROM orders
      |  UNION ALL SELECT * FROM updates),
      |merged AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |      ORDER BY o_orderdate DESC, __src DESC) AS __rn
      |    FROM unioned)
      |  WHERE __rn = 1)
      |SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM merged GROUP BY o_orderstatus
      |ORDER BY o_orderstatus ASC NULLS LAST""".stripMargin

  /** q61: column profile — the per-column (null count, exact distinct
    * count, null fraction) summary every ingest run records before a
    * table goes live. ONE scan: all six null-counts and all six
    * distinct-counts compute in a single multi-distinct aggregate
    * (Catalyst plans the Expand + two-phase partial/final aggregation
    * that makes N-way count-distinct a constant number of shuffles
    * regardless of table size), then a `stack` unpivots the 1-row
    * result into the long profile format — driver never sees data,
    * only the 6-row profile. Min/max are deliberately NOT stringified:
    * double→string formatting is engine-specific, so a portable
    * profile keeps typed stats out of the text column.
    */
  def q61ColumnProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.orders(spark, sfDir)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val aggs =
      cols.map(c => count(when(col(c).isNull, 1)).as(s"nn_$c")) ++
      cols.map(c => countDistinct(col(c)).as(s"nd_$c"))
    val stackArgs = cols
      .map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    src.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS (column_name, n_nulls, n_distinct)")
      .select(col("column_name"), col("n_nulls"), col("n_distinct"),
        (col("n_nulls").cast("double") / col("n_rows").cast("double"))
          .as("null_frac"))
      .orderBy(col("column_name").asc_nulls_last)
  }

  val q61Sql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    cols.map(c =>
      s"""SELECT '$c' AS column_name,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(count(*) - count($c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS null_frac
         |FROM orders""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name ASC NULLS LAST")
  }

  /** q82: SCD Type-2 history build — the warehouse pattern that turns
    * an entity change log into versioned dimension rows with validity
    * intervals. Here the events stream is the change log (each event
    * sets the user's current segment = event_type): consecutive
    * duplicates collapse to change points, each change opens a version
    * valid [its ts, next change's ts), and the last version per user is
    * open-ended (`is_current`).
    *
    * Scale shape: both windows partition by user_id — a key whose
    * cardinality grows with the corpus — and the second window runs
    * over the already-collapsed change points. No join at all: the
    * whole build is one shuffle on the natural key. The (ts, event_id)
    * order makes every version boundary deterministic under ties.
    */
  def q82Scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"),
        col("event_type").as("segment"),
        col("ts").as("valid_from"), col("valid_to"),
        when(col("valid_to").isNull, lit(1)).otherwise(lit(0)).as("is_current"))
      .orderBy(col("user_id").asc_nulls_last, col("version").asc_nulls_last)
  }

  val q82Sql: String =
    """WITH chg AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST) AS prev_type
      |  FROM events),
      |pts AS (
      |  SELECT user_id, ts, event_id, event_type FROM chg
      |  WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id,
      |  row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST) AS version,
      |  event_type AS segment, ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id
      |    ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST) AS valid_to,
      |  CASE WHEN lead(ts) OVER (PARTITION BY user_id
      |    ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST) IS NULL
      |    THEN 1 ELSE 0 END AS is_current
      |FROM pts
      |ORDER BY user_id ASC NULLS LAST, version ASC NULLS LAST""".stripMargin

  /** q83: CDC apply (I/U/D) — collapse a change-data-capture log to
    * its per-key latest operation and apply it to a base snapshot in
    * one pass: inserts for keys the snapshot lacks, updates override
    * in place, deletes drop the row, untouched rows survive. q45's
    * latest-wins upsert plus the two semantics MERGE adds (DELETE and
    * the insert-vs-update distinction, audited in `action`).
    *
    * The change log is derived deterministically from orders (latest
    * order per customer: status 'P' ⇒ DELETE, else UPSERT of the
    * order's total as the new balance) against a snapshot missing
    * every 4th customer, so all three paths are exercised. Scale
    * shape: the log collapses FIRST via max(struct(date, key, …)) — a
    * two-phase hash aggregate, no window over the fact — then one
    * |keys|-sized full-outer join applies it; balances pass through
    * untouched doubles, so no arithmetic portability surface at all.
    */
  def q83CdcApply(spark: SparkSession, sfDir: String): DataFrame = {
    val latest = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))).as("last"))
      .select(col("o_custkey"),
        when(col("last.o_orderstatus") === "P", lit("D")).otherwise(lit("U"))
          .as("op"),
        col("last.o_totalprice").as("new_bal"))
    val snap = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 4 =!= 0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    snap.join(latest, col("c_custkey") === col("o_custkey"), "full")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("c_name"), lit("cdc-insert")).as("name"),
        when(col("op") === "U", col("new_bal")).otherwise(col("c_acctbal"))
          .as("acctbal"),
        when(col("op").isNull, lit("keep"))
          .when(col("c_custkey").isNull, lit("insert"))
          .otherwise(lit("update")).as("action"))
      .orderBy(col("custkey").asc_nulls_last)
  }

  val q83Sql: String =
    """WITH ranked AS (
      |  SELECT o_custkey, o_orderstatus, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders),
      |latest AS (
      |  SELECT o_custkey,
      |    CASE WHEN o_orderstatus = 'P' THEN 'D' ELSE 'U' END AS op,
      |    o_totalprice AS new_bal
      |  FROM ranked WHERE rn = 1),
      |snap AS (
      |  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 4 <> 0)
      |SELECT coalesce(c_custkey, o_custkey) AS custkey,
      |  coalesce(c_name, 'cdc-insert') AS name,
      |  CASE WHEN op = 'U' THEN new_bal ELSE c_acctbal END AS acctbal,
      |  CASE WHEN op IS NULL THEN 'keep'
      |       WHEN c_custkey IS NULL THEN 'insert'
      |       ELSE 'update' END AS action
      |FROM snap FULL OUTER JOIN latest ON c_custkey = o_custkey
      |WHERE op IS NULL OR op <> 'D'
      |ORDER BY custkey ASC NULLS LAST""".stripMargin
}
