package graft.scratch

import org.apache.spark.sql.SparkSession

object ReplaceScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.scr", "graft.catalog.GraftCatalog")
      .config("spark.sql.catalog.scr.warehouse", "/tmp/scratch_rep_wh")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import scala.util.{Failure, Success, Try}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scr.db")
    spark.sql("DROP TABLE IF EXISTS scr.db.t")
    spark.sql("CREATE TABLE scr.db.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO scr.db.t VALUES (1, 'a')")
    def tryIt(label: String, sql: String): Unit =
      Try(spark.sql(sql).collect()) match {
        case Success(_) => println(s"$label OK")
        case Failure(e) =>
          println(s"$label FAIL: ${e.getClass.getName}: " +
            e.getMessage.linesIterator.take(2).mkString(" "))
      }
    tryIt("RTAS", "REPLACE TABLE scr.db.t AS SELECT 5L AS id, 'z' AS v")
    tryIt("CORTAS",
      "CREATE OR REPLACE TABLE scr.db.t AS SELECT 6L AS id, 'y' AS v")
    tryIt("CORT", "CREATE OR REPLACE TABLE scr.db.t (id BIGINT, w STRING)")
    tryIt("READ", "SELECT * FROM scr.db.t")
    spark.stop()
  }
}
