package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operators (SURVEY.md §2.2): union / union all, intersect,
  * except, plus unionByName. Inputs are key projections so the
  * comparisons are well-defined; results are deduped per ANSI
  * semantics where the operator requires it.
  */
object SetOps {

  private def custNations(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select(col("c_nationkey").as("nationkey"))

  private def suppNations(spark: SparkSession, sfDir: String): DataFrame =
    Tables.supplier(spark, sfDir).select(col("s_nationkey").as("nationkey"))

  /** UNION (distinct): nations having a customer or a supplier. */
  def q26Union(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).union(suppNations(spark, sfDir))
      .distinct().orderBy(col("nationkey").asc_nulls_last)

  val q26Sql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION SELECT s_nationkey FROM supplier
      |ORDER BY nationkey ASC NULLS LAST""".stripMargin

  /** UNION ALL with provenance tag + count (bag semantics preserved). */
  def q27UnionAll(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).withColumn("side", lit("cust"))
      .unionByName(suppNations(spark, sfDir).withColumn("side", lit("supp")))
      .groupBy(col("nationkey"), col("side")).agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey").asc_nulls_last, col("side").asc_nulls_last)

  val q27Sql: String =
    """SELECT nationkey, side, count(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey, 'cust' AS side FROM customer
      |  UNION ALL SELECT s_nationkey, 'supp' FROM supplier)
      |GROUP BY nationkey, side
      |ORDER BY nationkey ASC NULLS LAST, side ASC NULLS LAST""".stripMargin

  /** INTERSECT: nations with both customers and suppliers. */
  def q28Intersect(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).intersect(suppNations(spark, sfDir))
      .orderBy(col("nationkey").asc_nulls_last)

  val q28Sql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT SELECT s_nationkey FROM supplier
      |ORDER BY nationkey ASC NULLS LAST""".stripMargin

  /** EXCEPT: nations with customers but none holding a high balance. */
  def q29Except(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir)
      .except(Tables.customer(spark, sfDir)
        .filter(col("c_acctbal") > 9900.0)
        .select(col("c_nationkey").as("nationkey")))
      .orderBy(col("nationkey").asc_nulls_last)

  val q29Sql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT SELECT c_nationkey FROM customer WHERE c_acctbal > 9900.0
      |ORDER BY nationkey ASC NULLS LAST""".stripMargin
}
