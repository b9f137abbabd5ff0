package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** t15 BPE merge-rule training — spec-gated (the data-dependent argmax
  * loop is SQL-inexpressible, the kmeansCodebook class), so the
  * correctness contract lives here:
  *   1. the exact merge sequence on a controlled corpus, hand-computed
  *      (covers greedy leftmost application, the lexicographic
  *      tie-break, and exhaustion before nMerges);
  *   2. monotone non-increasing best-pair counts on real fixture text
  *      (merging only destroys/caps pair mass, never creates more than
  *      it consumed — the property a broken pair recount would break);
  *   3. run-to-run determinism on the fixture;
  *   4. train → apply consumption of t05's pre-tokens: applying the
  *      learned table compresses the corpus and leaves NO residual
  *      adjacency for any learned pair (merges only destroy
  *      adjacencies — replacing two neighbors with their concatenation
  *      never makes two OLD symbols newly adjacent).
  */
class BpeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hand-computed merge sequence: tie-break, greedy apply, exhaustion") {
    import spark.implicits._
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L),
        ("bun", 4L), ("hugs", 5L))
      .toDF("w", "freq")
      .select(expr("split(w, '')").as("syms"), col("freq"))
    // asked for 8 merges; the corpus only yields 7 before no pair is
    // left. Round 5 is the tie: (hug,s)=5 vs (p,ug)=5 → "hug" < "p".
    val got = TextOps.bpeTrainOn(words, 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val expected = Seq(
      (1, "u", "g", "ug", 20L),
      (2, "u", "n", "un", 16L),
      (3, "h", "ug", "hug", 15L),
      (4, "p", "un", "pun", 12L),
      (5, "hug", "s", "hugs", 5L),
      (6, "p", "ug", "pug", 5L),
      (7, "b", "un", "bun", 4L))
    assert(got == expected)
  }

  private lazy val fixtureMerges =
    TextOps.t15BpeTrain(spark, sf, 10).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq

  test("fixture training: monotone best-pair counts, deterministic replay") {
    val counts = fixtureMerges.map(_._3)
    assert(counts.nonEmpty && counts == counts.sorted.reverse,
      s"best-pair counts not non-increasing: $counts")
    val again = TextOps.t15BpeTrain(spark, sf, 10).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(again == fixtureMerges, "training is not deterministic")
  }

  test("train->apply: corpus compresses, no learned pair survives") {
    import spark.implicits._
    val pat = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
    val words = graft.ops.Tables.documents(spark, sf)
      .select(explode(expr(s"regexp_extract_all(text, '$pat', 0)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(expr("split(w, '')").as("syms"), col("freq"))
      .cache()
    val applied = words
      .select(TextOps.applyMerges(col("syms"),
        fixtureMerges.map(m => (m._1, m._2))).as("syms"), col("freq"))
      .cache()
    def corpusTokens(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(size(col("syms")) * col("freq"))).collect()(0).getLong(0)
    val before = corpusTokens(words)
    val after = corpusTokens(applied)
    assert(after < before,
      s"10 merges did not compress the corpus ($before -> $after)")
    // residual adjacency scan: every adjacent pair of the re-segmented
    // corpus, joined against the learned table — must be empty
    val residual = applied.filter(size(col("syms")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(syms) - 1),
          |  i -> struct(element_at(syms, i) AS l,
          |              element_at(syms, i + 1) AS r))""".stripMargin)).as("pr"))
      .select(col("pr.l").as("l"), col("pr.r").as("r"))
      .join(fixtureMerges.map(m => (m._1, m._2)).toDF("l", "r"), Seq("l", "r"),
        "left_semi")
      .count()
    assert(residual == 0L, s"$residual adjacencies of learned pairs survive")
    words.unpersist(); applied.unpersist()
  }

  /** VERDICT r7 #6: t18 consumes the TRAINED artifact — the frozen
    * merge table t18 applies (and its oracle replays) must be exactly
    * what t15 learns on the sf0.001 corpus at 20 rounds. A trainer
    * change that shifts any rule breaks this pin instead of silently
    * desynchronizing the shipped tokenizer from its training run.
    */
  test("t18's frozen merge table is t15's sf0.001 training output") {
    val trained = TextOps.t15BpeTrain(spark, sf, 20).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(trained == TextOps.FrozenMerges,
      s"frozen table drifted from the trainer:\n  trained=$trained\n  frozen =${TextOps.FrozenMerges}")
    // and the applied economy is real: every document compresses
    val seg = TextOps.t18SubwordSegment(spark, sf)
    val bad = seg.filter(col("n_subwords") >= col("n_chars")).count()
    val n = seg.count()
    assert(n > 0 && bad < n / 10,
      s"$bad of $n docs failed to compress under the frozen vocabulary")
  }
}
