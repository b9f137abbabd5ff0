package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sinks.ManifestTable
import java.nio.file.Files

/** Concurrent ROW-LEVEL writers racing the same files (VERDICT r13
  * next-round #3): the optimistic commit protocol re-resolves and
  * re-runs narrowing after a lost CAS — these specs pin that the
  * recomputation is SERIALIZABLE on overlapping files, not merely
  * retried: no lost update, no resurrected row, and a persistent
  * conflicter surfaces the explicit race error with the table left
  * consistent. Interleavings are DETERMINISTIC via the test-only
  * pre-commit hook ([[ManifestTable.preCommitHook]]): a complete
  * competing commit runs inside the victim writer's compute→publish
  * window — the exact window a wall-clock race would hit, with no
  * sleeps or luck.
  */
class WriterRaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshTable(): String =
    Files.createTempDirectory("graft_race").resolve("t").toString

  /** 100 rows [0,100) in 5 range-localized files of 20 ids each. */
  private def rangedTable(): String = {
    import spark.implicits._
    val t = freshTable()
    val df = (0 until 100).map(i => (i.toLong, "base", i % 3))
      .toDF("id", "tag", "bucket")
    ManifestTable.write(spark, df.repartitionByRange(5, col("id")), t)
    t
  }

  private def withHook(hook: (String, String) => Unit)(body: => Unit): Unit = {
    ManifestTable.preCommitHook = hook
    try body finally ManifestTable.preCommitHook = (_, _) => ()
  }

  test("delete ∥ merge overlapping the same file: serializable recomputation") {
    import spark.implicits._
    val t = rangedTable() // v1
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    withHook { (table, target) =>
      // fire exactly once, inside the DELETE's compute→publish window
      // for THIS table's v2 manifest: a merge fully commits first,
      // updating id=5 (the same [0,20) file the delete will rewrite)
      // and inserting id=200
      if (table.endsWith(t) && target.startsWith("v") &&
        armed.getAndSet(false)) {
        ManifestTable.merge(spark,
          Seq((5L, "MERGED", 9), (200L, "NEW", 9))
            .toDF("id", "tag", "bucket"), t, Seq("id")): Unit
      }
    } {
      ManifestTable.delete(spark, t, col("id") < 20L): Unit
    }
    // serial outcome merge-then-delete: merge landed v2, the delete's
    // lost CAS re-resolved v2 (merge's REWRITTEN file) and committed v3
    assert(ManifestTable.currentVersion(spark, t) == 3L)
    val r = ManifestTable.read(spark, t)
    assert(r.count() == 81L, "100 + 1 merge-insert - 20 deleted")
    assert(r.filter(col("id") < 20L).count() == 0,
      "no row of the deleted band survives — including the one the " +
        "concurrent merge rewrote into a NEW file")
    assert(r.filter(col("id") === 200L && col("tag") === "NEW").count() == 1,
      "the merge's insert is not lost")
    assert(r.filter(col("tag") === "MERGED").count() == 0,
      "the merged row inside the deleted band dies with the band")
    // both commits carry their audit identity
    val ops = ManifestTable.history(spark, t).orderBy("version")
      .collect().map(_.getAs[String]("operation")).toSeq
    assert(ops == Seq("write", "merge", "delete"))
  }

  test("copy-on-write delete ∥ deletion-vector delete on the same file: no resurrection") {
    val t = rangedTable() // v1
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    withHook { (table, target) =>
      // inside the CoW delete's window: a merge-on-read delete commits
      // a DV on the SAME [0,20) file (id=7)
      if (table.endsWith(t) && target.startsWith("v") &&
        armed.getAndSet(false)) {
        ManifestTable.deleteVectors(spark, t, col("id") === 7L): Unit
      }
    } {
      ManifestTable.delete(spark, t,
        col("id") >= 10L && col("id") < 20L): Unit
    }
    assert(ManifestTable.currentVersion(spark, t) == 3L)
    val r = ManifestTable.read(spark, t)
    assert(r.count() == 89L, "100 - 1 DV-deleted - 10 CoW-deleted")
    assert(r.filter(col("id") === 7L).count() == 0,
      "the CoW rewrite of the DV-bearing file must NOT resurrect the " +
        "DV-deleted row (retry re-resolves the DVs too)")
    assert(r.filter(col("id") >= 10L && col("id") < 20L).count() == 0)
    assert(r.filter(col("id") < 7L).count() == 7,
      "untouched rows of the contested file all survive exactly once")
    // the rewrite materialized/superseded the file's DVs; rowCount
    // stays metadata-exact either way
    assert(ManifestTable.rowCount(spark, t).contains(89L))
  }

  test("a persistent conflicter exhausts retries: explicit race error, table consistent") {
    import spark.implicits._
    val t = rangedTable() // v1
    val fired = new java.util.concurrent.atomic.AtomicLong(0)
    val e = intercept[java.io.IOException] {
      withHook { (table, target) =>
        // steal EVERY version the delete tries to publish (appends are
        // guarded against recursion by the hook thread re-entering with
        // a v-target it itself is publishing — match only the victim's)
        if (table.endsWith(t) && target.startsWith("v") &&
          fired.incrementAndGet() % 2 == 1) {
          ManifestTable.append(spark,
            Seq((1000L + fired.get(), "squatter", 0))
              .toDF("id", "tag", "bucket"), t): Unit
        }
      } {
        ManifestTable.delete(spark, t, col("id") < 20L): Unit
      }
    }
    assert(e.getMessage.contains("lost the race"),
      s"retry exhaustion must surface the explicit conflict error: $e")
    // atomicity: the failed delete left NOTHING — only the squatting
    // appends landed, and every original row is still present
    val r = ManifestTable.read(spark, t)
    assert(r.filter(col("id") < 20L).count() == 20,
      "a delete that lost every race must not half-apply")
    assert(r.filter(col("tag") === "squatter").count() == 5,
      "one interleaved append per lost attempt (maxAttempts = 5)")
  }
}
