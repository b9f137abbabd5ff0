package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Scale

/** Randomized (deterministically seeded) equivalence property for the
  * grid-salted pair generator: for ANY block structure and ANY cell
  * cap — including cap=1, forced maximal splitting — the emitted pair
  * set equals the plain blocked self-join's. This is the invariant the
  * d04/d05 oracles rely on.
  */
class GridPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("grid pair set == plain pair set over random block structures") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    (1 to 5).foreach { trial =>
      val nBlocks = 1 + rnd.nextInt(4)
      val rows = (0 until nBlocks).flatMap { b =>
        val size = rnd.nextInt(60) // empty blocks allowed
        (0 until size).map(_ => (rnd.nextLong().abs % 100000L, s"b$b"))
      }.distinct
      val df = rows.toDF("id", "blk")
      val a = df.select(col("id").as("id1"), col("blk"))
      val b = df.select(col("id").as("id2"), col("blk"))
      val plain = a.join(b, Seq("blk")).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
      val cap = Seq(1, 3, 10)(rnd.nextInt(3))
      val grid = Scale.gridSelfJoinPairs(a, b, Seq("blk"), "id1", "id2",
          rowsPerCell = cap)
        .select(least(col("id1"), col("id2")), greatest(col("id1"), col("id2")))
        .as[(Long, Long)].collect().toSet
      assert(grid == plain,
        s"trial $trial (blocks=$nBlocks, cap=$cap): grid != plain; " +
          s"missing=${(plain -- grid).take(3)} extra=${(grid -- plain).take(3)}")
    }
  }
}
