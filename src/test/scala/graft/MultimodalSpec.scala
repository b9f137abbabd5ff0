package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** The m04 chunker's ASCII precondition: byte-sized chunk decode is
  * only meaningful when payload bytes == characters; non-ASCII
  * payloads must fail fast, not emit replacement characters.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def media(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"))
  }

  test("ascii payload chunks cleanly with exact sizes") {
    val out = Multimodal.payloadChunks(media("a" * 700), chunk = 256).collect()
    assert(out.map(_.getInt(2)).toSeq == Seq(256, 256, 188))
    assert(out.map(_.getString(3).length).toSeq == Seq(256, 256, 188))
  }

  test("non-ascii payload fails fast instead of emitting replacement chars") {
    val ex = intercept[Exception] {
      Multimodal.payloadChunks(media("héllo wörld " * 30), chunk = 16).collect()
    }
    assert(ex.getMessage.contains("non-ASCII payload"),
      s"unexpected error: ${ex.getMessage}")
  }
}
