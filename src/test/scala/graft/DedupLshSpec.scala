package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Tables}

/** d10 (LSH-blocked near-dup) recall gate: labels are fixture
  * luxuries, so the label-free banded-LSH blocking must find at least
  * as much of the brute-force ground truth as the label-blocked d05
  * does — otherwise it wouldn't be a production replacement.
  */
class DedupLshSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("banded-LSH blocking recall >= label blocking recall vs brute-force truth") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    val a = e.select(col("vec_id").as("id1"), col("v").as("v1"), col("nrm").as("n1"))
    val b = e.select(col("vec_id").as("id2"), col("v").as("v2"), col("nrm").as("n2"))
    // brute-force ground truth: every pair, no blocking
    val truth = a.join(b, col("id1") < col("id2"))
      .withColumn("cosine", expr("graft_dot(v1, v2)") / (col("n1") * col("n2")))
      .filter(col("cosine") >= 0.30)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture has no near-dup pairs at 0.30 — test is vacuous")

    val byLabel = Dedup.d05EmbeddingNearDup(spark, sfDir)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
    val byLsh = Dedup.d10NearDupLsh(spark, sfDir)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet

    // both blockings only ever SUBSET the truth (they prune candidates,
    // never fabricate them — the cosine filter is identical)
    assert(byLabel.subsetOf(truth), s"label pairs outside truth: ${(byLabel -- truth).take(3)}")
    assert(byLsh.subsetOf(truth), s"lsh pairs outside truth: ${(byLsh -- truth).take(3)}")

    val recallLabel = byLabel.size.toDouble / truth.size
    val recallLsh = byLsh.size.toDouble / truth.size
    info(f"truth=${truth.size} label-recall=$recallLabel%.3f lsh-recall=$recallLsh%.3f")
    assert(recallLsh >= recallLabel,
      f"LSH blocking recall $recallLsh%.3f < label blocking recall $recallLabel%.3f")
  }
}
