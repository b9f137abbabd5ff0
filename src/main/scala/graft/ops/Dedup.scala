package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash._

/** Deduplication suite over `documents` (north-star extension): exact
  * hash dedup, MinHash+LSH banding, SimHash, n-gram Jaccard with
  * candidate blocking, embedding-cosine near-dup.
  *
  * Scale design: every variant is blocking-based — candidate pairs
  * come from an equi-join on a bucket key (content hash, LSH band,
  * simhash band, length×lang block, label), NEVER from an O(n²) cross
  * join. At 100 TB the bucket join shuffles on the bucket key and each
  * bucket's pair expansion is local; skewed buckets are the one risk
  * and are capped by the banding parameters.
  */
object Dedup {

  private def toks: Column = split(col("text"), " ")

  /** Exact dedup over a simulated double-crawl (the fixture has no
    * byte-identical dups, so crawl A ∪ crawl B models re-crawled
    * content): group by content hash, keep the lexicographically first
    * (crawl, doc_id) copy. One hash-shuffle, no comparisons.
    */
  def d01ExactDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val crawls = docs.withColumn("crawl", lit("a"))
      .unionByName(docs.withColumn("crawl", lit("b")))
    crawls
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(struct(col("crawl"), col("doc_id"))).as("keep"))
      .select(col("content_hash"), col("n_copies"),
        col("keep.crawl").as("keep_crawl"), col("keep.doc_id").as("keep_doc_id"))
      .orderBy(col("content_hash").asc_nulls_last)
  }

  val d01Sql: String =
    """WITH crawls AS (
      |  SELECT 'a' AS crawl, doc_id, text FROM documents
      |  UNION ALL SELECT 'b', doc_id, text FROM documents)
      |SELECT md5(text) AS content_hash, count(*) AS n_copies,
      |  min(crawl) AS keep_crawl, min(doc_id) AS keep_doc_id
      |FROM crawls GROUP BY md5(text)
      |ORDER BY content_hash ASC NULLS LAST""".stripMargin

  /** d07: incremental (cross-run) dedup — the daily-crawl primitive:
    * a new batch lands, and only content NOT already in the corpus
    * survives. Batch = simulated re-crawl (every 3rd doc, new ids,
    * identical text → must be dropped) ∪ genuinely revised docs
    * (every 10th ≡ 7, text changed → must survive). One anti-join on
    * the content hash: shuffles hashes, not documents — at 100 TB the
    * corpus side is a pre-computed hash index you keep partitioned by
    * hash, so each incremental run shuffles only the new batch.
    */
  def d07IncrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val corpusHashes = docs.select(md5(col("text")).as("h")).distinct()
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" revised v2")).as("text")))
    batch.join(corpusHashes, md5(batch("text")) === corpusHashes("h"), "left_anti")
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  val d07Sql: String =
    """WITH batch AS (
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, text || ' revised v2' FROM documents WHERE doc_id % 10 = 7)
      |SELECT doc_id, md5(text) AS content_hash FROM batch b
      |WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE md5(d.text) = md5(b.text))
      |ORDER BY doc_id ASC NULLS LAST""".stripMargin

  /** The minhash signature + LSH band rows of an arbitrary
    * (doc_id, text) frame: (doc_id, sig, band, band_key), one row per
    * band with the signature carried alongside. The carried signature
    * is what makes a PERSISTED band index self-contained — a probe
    * join on (band, band_key) yields both the candidate ids and the
    * corpus signatures for scoring in one scan, no second lookup
    * table. Shared by d13 (index build + batch probe) and its recall
    * spec; same hashing/banding constants as d02's self-join path.
    */
  private[graft] def sigBands(spark: SparkSession, docs: DataFrame,
      nBands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    docs
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("th", transform(split(col("text"), " "),
        t => tokenHash32(t) % lit(P)))
      .withColumn("sh", expr(
        s"transform(sequence(1, size(th) - 2), " +
          s"i -> ((th[i-1] * 8191 + th[i]) % $P * 8191 + th[i+1]) % $P)"))
      .select(col("doc_id"), expr("graft_minhash(sh)").as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(expr(
          s"transform(sequence(0, ${nBands - 1}), b -> " +
            s"aggregate(slice(sig, b * $rowsPerBand + 1, $rowsPerBand), 0L, " +
            s"(acc, x) -> (acc * 31 + x) % ${P}))"))
          .as(Seq("band", "band_key")))
  }

  /** d13: incremental NEAR-dup dedup — the weekly re-crawl op and
    * d07's LSH counterpart. d07 only catches byte-identical re-crawls;
    * the recurring production shape is a NEW batch screened against a
    * PERSISTED corpus band index without recomputing corpus×corpus.
    *
    * Index phase (amortized once per corpus version): d02's band rows
    * are written to parquet partitioned by band (Sinks.writePartitioned
    * layout) with the signature carried per row — done inside this
    * query so the probe below reads the index back from disk exactly
    * as the weekly job would.
    *
    * Probe phase (per batch): the new batch — doc_id%3 re-crawled
    * verbatim, doc_id%10=7 re-crawled with an appended edit, d07's
    * shapes — is shingled/signed/banded (batch-sized work only) and
    * BROADCAST against the stored index on (band, band_key). The
    * corpus side is therefore a parquet scan + map-side hash join:
    * no corpus row is re-shingled, re-hashed or even shuffled at probe
    * time (pinned in PlanAuditSpec — the plan carries exactly one
    * graft_minhash, on the batch branch). Candidate pairs are scored
    * by signature agreement like d02; the narrow (ids, est) rows are
    * all that reaches the distinct shuffle.
    */
  def d13IncrementalNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // Per-session unique component: two concurrent sessions on the
    // same fixture (scalatest suite + driver run) must not share a
    // directory — one side's Overwrite would delete parquet files out
    // from under the other side's probe scan.
    // The returned frame scans the index lazily, so the dir must
    // outlive this call; default-located scratch is reclaimed at JVM
    // exit (spark.graft.scratchDir relocates it to shared storage on
    // a real cluster).
    val indexDir = graft.sinks.Sinks.sessionScratchPath(spark,
      "d13_index_" + sfDir.replaceAll("[^a-zA-Z0-9]", "_"))
    graft.sinks.Sinks.writePartitioned(
      sigBands(spark, docs), indexDir, Seq("band"))
    val index = spark.read.parquet(indexDir)

    val batch = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" revised v2")).as("text")))
    val probe = sigBands(spark, batch)
      .select(col("doc_id").as("batch_id"), col("sig").as("bsig"),
        col("band"), col("band_key"))

    probe.hint("broadcast")
      .join(index.select(col("doc_id").as("corpus_id"), col("sig").as("csig"),
          col("band"), col("band_key")),
        Seq("band", "band_key"))
      .select(col("batch_id"), col("corpus_id"),
        (aggregate(zip_with(col("bsig"), col("csig"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (a, x) => a + x)
          .cast("double") / lit(MinhashK.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.25)
      .distinct()
      .orderBy(col("batch_id").asc_nulls_last, col("corpus_id").asc_nulls_last)
  }

  /** The d02 minhash CTE chain over an arbitrary source relation,
    * CTE names prefixed — the oracle-side twin of `sigBands`. Band
    * rows carry the signature, matching the stored-index schema.
    */
  private def minhashChainSql(src: String, pre: String): String =
    s"""${pre}th AS (
       |  SELECT doc_id,
       |    list_transform(string_split(text, ' '),
       |      t -> ${tokenHash32Sql("t")} % ${P}) AS th
       |  FROM $src
       |  WHERE len(string_split(text, ' ')) >= 3),
       |${pre}sh AS (
       |  SELECT doc_id,
       |    list_transform(range(1, len(th) - 1),
       |      i -> ((th[i] * 8191 + th[i+1]) % ${P} * 8191 + th[i+2]) % ${P}) AS hashes
       |  FROM ${pre}th),
       |${pre}sigs AS (
       |  SELECT doc_id,
       |    list_transform(range(1, ${MinhashK + 1}),
       |      i -> list_min(list_transform(hashes, h -> (${aSqlList}[i] * h + ${bSqlList}[i]) % ${P}))) AS sig
       |  FROM ${pre}sh),
       |${pre}bands AS (
       |  SELECT doc_id, sig, b AS band,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*4+1 : b*4+4]),
       |      (acc, x) -> (acc * 31 + x) % ${P}) AS band_key
       |  FROM ${pre}sigs CROSS JOIN (VALUES (0), (1), (2), (3)) AS bs(b))""".stripMargin

  val d13Sql: String =
    s"""WITH batch AS (
       |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
       |  UNION ALL
       |  SELECT doc_id + 200000, text || ' revised v2' FROM documents WHERE doc_id % 10 = 7),
       |${minhashChainSql("documents", "c")},
       |${minhashChainSql("batch", "b")},
       |est AS (
       |  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id,
       |    CAST(list_reduce(list_prepend(0,
       |      list_transform(range(1, ${MinhashK + 1}),
       |        i -> CASE WHEN b.sig[i] = c.sig[i] THEN 1 ELSE 0 END)), (a, x) -> a + x) AS DOUBLE)
       |      / ${MinhashK}.0 AS est_jaccard
       |  FROM bbands b JOIN cbands c
       |    ON b.band = c.band AND b.band_key = c.band_key)
       |SELECT batch_id, corpus_id, est_jaccard FROM est
       |WHERE est_jaccard >= 0.25
       |ORDER BY batch_id ASC NULLS LAST, corpus_id ASC NULLS LAST""".stripMargin

  /** The 5-token shingle set of a document's token array (shared by
    * d08/d09 and p12's decontamination). slice(tk,1,0) = typed empty
    * array; bare array() is array<null>.
    */
  private[ops] val shingles5 = expr(
    "CASE WHEN size(tk) >= 5 THEN transform(sequence(1, size(tk) - 4), " +
      "i -> array_join(slice(tk, i, 5), ' ')) ELSE slice(tk, 1, 0) END")

  /** d08: cross-document repeated-span (boilerplate) detection — the
    * sub-document complement of whole-doc dedup: 5-token shingles that
    * appear in ≥ 3 DISTINCT documents are boilerplate candidates
    * (headers, disclaimers, templated sentences) a training-data
    * pipeline strips before tokenization.
    *
    * Production shuffle shape: the count aggregation shuffles the
    * 8-byte `xxhash64` of each shingle, never the string — at 100 TB
    * the shingle universe is far wider than the document set and raw
    * strings would dominate shuffle bytes. Survivor strings are joined
    * back afterwards: the ≥3-df survivor set is small, so it
    * broadcasts against a second (map-side) explode pass and only
    * survivor strings ever hit a shuffle (the final distinct). A
    * 64-bit hash merge is the standard corpus-dedup trade: collision
    * odds are ~n²/2⁶⁵, negligible against crawl noise.
    */
  def d08Boilerplate(spark: SparkSession, sfDir: String): DataFrame = {
    val exploded = Tables.documents(spark, sfDir)
      .withColumn("tk", toks)
      .select(col("doc_id"), explode(shingles5).as("shingle"))
    val survivors = exploded
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
      .groupBy(col("sh"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("n_occ"))
      .filter(col("df") >= 3)
    exploded
      .join(broadcast(survivors), xxhash64(col("shingle")) === col("sh"))
      .select(col("shingle"), col("df"), col("n_occ"))
      .distinct()
      .orderBy(col("df").desc_nulls_last, col("shingle").asc_nulls_last)
  }

  val d08Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    unnest(CASE WHEN len(tk) >= 5
      |      THEN list_transform(range(1, len(tk) - 3),
      |        i -> list_aggregate(tk[i:i+4], 'string_agg', ' '))
      |      ELSE [] END) AS shingle
      |  FROM t)
      |SELECT shingle, count(DISTINCT doc_id) AS df, count(*) AS n_occ
      |FROM s GROUP BY shingle HAVING count(DISTINCT doc_id) >= 3
      |ORDER BY df DESC NULLS LAST, shingle ASC NULLS LAST""".stripMargin

  /** d09: train/test contamination — the eval-hygiene pass: training
    * documents sharing ≥ 2 distinct 5-token shingles with any test-
    * split document leak evaluation data and must be dropped. Composes
    * the p05 hash-bucket split with d08's shingling: distinct
    * (doc, shingle) pairs per side, an equi-join on the shingle (the
    * shuffle key — never a doc×doc comparison), and a per-train-doc
    * distinct count. At 100 TB the test side is small and broadcastable.
    *
    * Production shuffle shape: the output never needs a shingle
    * string, so the string is hashed to its 8-byte `xxhash64` at the
    * explode — the distinct, the join, and the count-distinct all
    * shuffle longs only (same collision trade as d08).
    */
  def d09Contamination(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val bucket = graft.functions.PortableHash
      .tokenHash32(col("doc_id").cast("string")) % 100
    val shingled = Tables.documents(spark, sfDir)
      .withColumn("tk", toks)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .select(col("doc_id"), col("split"),
        explode(shingles5).as("shingle"))
      .select(col("doc_id"), col("split"), xxhash64(col("shingle")).as("sh"))
      .distinct()
    val train = shingled.filter(col("split") === "train")
      .select(col("doc_id").as("train_doc"), col("sh"))
    val test = shingled.filter(col("split") === "test")
      .select(col("sh")).distinct()
    train.join(test, "sh")
      .groupBy(col("train_doc"))
      .agg(countDistinct(col("sh")).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .orderBy(col("train_doc").asc_nulls_last)
  }

  val d09Sql: String = {
    val h = graft.functions.PortableHash.tokenHash32Sql("CAST(doc_id AS VARCHAR)")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CASE WHEN $h % 100 < 80 THEN 'train'
       |         WHEN $h % 100 < 90 THEN 'val' ELSE 'test' END AS split,
       |    string_split(text, ' ') AS tk
       |  FROM documents),
       |s AS (
       |  SELECT DISTINCT doc_id, split,
       |    unnest(CASE WHEN len(tk) >= 5
       |      THEN list_transform(range(1, len(tk) - 3),
       |        i -> list_aggregate(tk[i:i+4], 'string_agg', ' '))
       |      ELSE [] END) AS shingle
       |  FROM t),
       |test_sh AS (SELECT DISTINCT shingle FROM s WHERE split = 'test')
       |SELECT s.doc_id AS train_doc, count(DISTINCT s.shingle) AS n_shared
       |FROM s JOIN test_sh USING (shingle)
       |WHERE s.split = 'train'
       |GROUP BY s.doc_id HAVING count(DISTINCT s.shingle) >= 2
       |ORDER BY train_doc ASC NULLS LAST""".stripMargin
  }

  /** d12: exact repeated-substring dedup, the suffix-run formulation —
    * the training-data-dedup standard (cf. Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", 2022): any substring
    * of ≥ 5 tokens that occurs MORE THAN ONCE corpus-wide is duplicated
    * text, and per document the union of its duplicated 5-token
    * shingles forms maximal token runs (a repeated 50-token paragraph
    * is ONE span, not 46 overlapping shingles — the distinction from
    * d08, which reports the shingle multiset).
    *
    * Scale shape: occurrences shuffle as (doc_id, pos, xxhash64)
    * triples — shingle strings never travel; multiplicity is one
    * hashed-key count shuffle; the run merge is a gaps-and-islands
    * window partitioned by doc_id (key count grows with the corpus);
    * span text rejoins only for surviving spans. No doc×doc
    * comparisons anywhere — cost is corpus-token-linear, the property
    * that makes substring-level dedup feasible at 100 TB where a
    * suffix array is not.
    *
    * Collision tolerance (explicit, round 7): multiplicity counts key
    * on xxhash64(shingle), so two DISTINCT shingles colliding in 64
    * bits would fabricate a duplicate span (never lose one — errors
    * are one-sided marks). By the birthday bound the first expected
    * collision needs ~2³² distinct 5-gram shingles (terabytes of
    * text), and the failure mode is an extra masked span, not
    * corruption — the same deliberate trade d08/d09 make for keeping
    * shingle strings out of the shuffle. A deployment needing
    * exactness past that scale widens the key to 128 bits (two seeded
    * xxhash64 columns), not to strings.
    */
  def d12SubstringRuns(spark: SparkSession, sfDir: String,
      minOcc: Int = 2): DataFrame = {
    val docs = Tables.documents(spark, sfDir).withColumn("tk", toks)
    val occ = docs
      .select(col("doc_id"), posexplode(shingles5).as(Seq("p0", "shingle")))
      .select(col("doc_id"), (col("p0") + 1).as("s"),
        xxhash64(col("shingle")).as("sh"))
    val dup = occ.groupBy(col("sh")).agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= minOcc)
      .select(col("sh"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("s").asc_nulls_last)
    val prevMax = max(col("e"))
      .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    val spans = occ.join(dup, "sh")
      .select(col("doc_id"), col("s"), (col("s") + 4).as("e"))
      .withColumn("new_run",
        when(prevMax.isNull || col("s") > prevMax + 1, 1).otherwise(0))
      .withColumn("run", sum(col("new_run")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("run"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
    spans.join(docs.select(col("doc_id"), col("tk")), Seq("doc_id"))
      .select(col("doc_id"),
        col("span_start").cast("int").as("span_start"),
        col("span_end").cast("int").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("int").as("span_ntok"),
        array_join(expr("slice(tk, span_start, span_end - span_start + 1)"), " ")
          .as("span_text"))
      // double-execute defense: a survivor-span-sized shuffle between
      // the rejoin kernel and the presentation sort bounds the range
      // sampler's re-execution via shuffle reuse — chosen over a
      // localCheckpoint here because a checkpoint truncates the logical
      // plan and would blind the xxhash64/window plan-audit rules
      .repartition(col("doc_id"))
      .orderBy(col("doc_id").asc_nulls_last, col("span_start").asc_nulls_last)
  }

  val d12Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    unnest(CASE WHEN len(tk) >= 5
      |      THEN list_transform(range(1, len(tk) - 3),
      |        i -> {'p': i, 'sh': list_aggregate(tk[i:i+4], 'string_agg', ' ')})
      |      ELSE [] END) AS u
      |  FROM t),
      |occ AS (SELECT doc_id, CAST(u.p AS BIGINT) AS st, u.sh AS shingle FROM s),
      |dup AS (SELECT shingle FROM occ GROUP BY shingle HAVING count(*) >= 2),
      |hits AS (
      |  SELECT o.doc_id, o.st, o.st + 4 AS e
      |  FROM occ o JOIN dup d USING (shingle)),
      |marked AS (
      |  SELECT doc_id, st, e,
      |    CASE WHEN max(e) OVER wp IS NULL OR st > max(e) OVER wp + 1
      |      THEN 1 ELSE 0 END AS new_run
      |  FROM hits
      |  WINDOW wp AS (PARTITION BY doc_id ORDER BY st
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |runs AS (
      |  SELECT doc_id, st, e,
      |    sum(new_run) OVER (PARTITION BY doc_id ORDER BY st
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM marked),
      |spans AS (
      |  SELECT doc_id, run, min(st) AS span_start, max(e) AS span_end
      |  FROM runs GROUP BY doc_id, run)
      |SELECT sp.doc_id,
      |  CAST(span_start AS INT) AS span_start,
      |  CAST(span_end AS INT) AS span_end,
      |  CAST(span_end - span_start + 1 AS INT) AS span_ntok,
      |  array_to_string(tk[CAST(span_start AS INT):CAST(span_end AS INT)], ' ') AS span_text
      |FROM spans sp JOIN t USING (doc_id)
      |ORDER BY doc_id ASC NULLS LAST, span_start ASC NULLS LAST""".stripMargin

  /** MinHash signatures + LSH banding: word-3-gram shingles → 16
    * portable minhashes → 4 bands of 4 → band-bucket self-join →
    * signature-agreement estimate per candidate pair.
    *
    * The band join is the scale path: docs only meet if they collide
    * on a whole band, so the shuffle key is (band index, band hash)
    * and no full-signature comparison happens until after blocking.
    */
  def d02MinhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, est) = d02Scored(spark, sfDir)
    // lazy checkpoint: the narrow pair estimates are materialized once
    // at first action (keeping the sig-attach joins out of the
    // presentation sort's range-sampling re-execution) and
    // construction stays plan-only for audit tooling; the signature
    // cache behind it is freed by the next dedup run (see
    // minhashBandPairs)
    est.localCheckpoint(false)
      .orderBy(col("id1").asc_nulls_last, col("id2").asc_nulls_last)
  }

  /** d02's scored candidate pairs BEFORE the presentation sort, plus
    * the live docsigs cache handle.
    */
  private def d02Scored(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val (docsigs, pairs) = minhashBandPairs(spark, sfDir)
    val est = pairs
      .join(docsigs.select(col("doc_id").as("id1"), col("sig").as("sig1")), Seq("id1"))
      .join(docsigs.select(col("doc_id").as("id2"), col("sig").as("sig2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        (aggregate(zip_with(col("sig1"), col("sig2"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (a, x) => a + x)
          .cast("double") / lit(MinhashK.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.25)
    (docsigs, est)
  }

  /** The MinHash signature table and the distinct band-collision pair
    * set (id1 < id2) — d02's blocking stage, factored out because it is
    * ALSO the production candidate generator for exact-verify dedup
    * (d04b): LSH proposes, an exact measure disposes. The returned
    * signature frame is persisted (two or three downstream lookups);
    * pairs are ids only — wide signature arrays never travel through
    * the distinct shuffle.
    */
  /** Word-3-gram shingle hashes (mod P) per document — the shared
    * similarity domain of d02/d04/d04b. One md5 per TOKEN (not per
    * shingle string); shingles combine the three token hashes
    * arithmetically — same signal, ~3× less hashing. Documents under
    * 3 tokens have no shingles and are excluded.
    */
  private def shingled(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("th", transform(split(col("text"), " "),
        t => tokenHash32(t) % lit(P)))
      .withColumn("sh", expr(
        s"transform(sequence(1, size(th) - 2), " +
          s"i -> ((th[i-1] * 8191 + th[i]) % $P * 8191 + th[i+1]) % $P)"))
  }

  /** The previous run's signature cache, freed at the NEXT dedup-query
    * entry instead of eagerly: query construction stays lazy (plan
    * tooling builds frames without executing them) while executor
    * storage holds at most one signature cache at a time — the
    * bounded form of the round-4 leak fix. Unpersisting a cache is
    * always safe; a late reader just recomputes from lineage.
    */
  private val prevSigCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  private def minhashBandPairs(
      spark: SparkSession, sfDir: String,
      nBands: Int = 4, rowsPerBand: Int = 4,
      withTokenSets: Boolean = false): (DataFrame, DataFrame) = {
    val old = prevSigCache.getAndSet(null)
    if (old != null) old.unpersist(false)
    // the 16-permutation signature is one fused codegen pass
    // (graft_minhash) instead of 16 interpreted array walks; the
    // banding split of the same signature is the caller's
    // recall/candidate-count knob (d02 audits at 4×4, d04b proposes
    // at 8×2). withTokenSets additionally caches the sorted distinct
    // shingle sets so d04b's verify side reuses THIS hashing pass
    // instead of re-running it over the corpus.
    val base = shingled(spark, sfDir)
    val projected =
      if (withTokenSets)
        base.select(col("doc_id"), expr("graft_minhash(sh)").as("sig"),
          array_sort(array_distinct(col("sh"))).as("ts"))
      else base.select(col("doc_id"), expr("graft_minhash(sh)").as("sig"))
    // referenced three times below (bands + two signature lookups);
    // persist so the hash pipeline runs once per action, not thrice
    val docsigs = projected
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prevSigCache.set(docsigs)

    val bands = docsigs.select(
      col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${nBands - 1}), b -> " +
          s"aggregate(slice(sig, b * $rowsPerBand + 1, $rowsPerBand), 0L, " +
          s"(acc, x) -> (acc * 31 + x) % ${P}))"))
        .as(Seq("band", "band_key")))

    // narrow pair dedup first (ids only), then attach signatures —
    // the wide sig arrays never travel through the distinct shuffle
    val pairs = bands.select(col("doc_id").as("id1"), col("band"), col("band_key"))
      .join(bands.select(col("doc_id").as("id2"), col("band"), col("band_key")),
        Seq("band", "band_key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
    (docsigs, pairs)
  }

  /** The d02 CTE chain (no WITH prefix) — shared by d02Sql and the
    * clustering oracle, which extends it with recursive CTEs.
    */
  val d02Ctes: String =
    s"""th AS (
       |  SELECT doc_id,
       |    list_transform(string_split(text, ' '),
       |      t -> ${tokenHash32Sql("t")} % ${P}) AS th
       |  FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (
       |  SELECT doc_id,
       |    list_transform(range(1, len(th) - 1),
       |      i -> ((th[i] * 8191 + th[i+1]) % ${P} * 8191 + th[i+2]) % ${P}) AS hashes
       |  FROM th),
       |sigs AS (
       |  SELECT doc_id,
       |    list_transform(range(1, ${MinhashK + 1}),
       |      i -> list_min(list_transform(hashes, h -> (${aSqlList}[i] * h + ${bSqlList}[i]) % ${P}))) AS sig
       |  FROM sh),
       |bands AS (
       |  SELECT doc_id, b AS band,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*4+1 : b*4+4]),
       |      (acc, x) -> (acc * 31 + x) % ${P}) AS band_key
       |  FROM sigs CROSS JOIN (VALUES (0), (1), (2), (3)) AS bs(b)),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
       |  FROM bands l JOIN bands r
       |    ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id),
       |est AS (
       |  SELECT id1, id2,
       |    CAST(list_reduce(list_prepend(0,
       |      list_transform(range(1, ${MinhashK + 1}),
       |        i -> CASE WHEN s1.sig[i] = s2.sig[i] THEN 1 ELSE 0 END)), (a, x) -> a + x) AS DOUBLE)
       |      / ${MinhashK}.0 AS est_jaccard
       |  FROM pairs JOIN sigs s1 ON s1.doc_id = id1 JOIN sigs s2 ON s2.doc_id = id2)""".stripMargin

  val d02Sql: String =
    s"""WITH $d02Ctes
       |SELECT id1, id2, est_jaccard FROM est
       |WHERE est_jaccard >= 0.25
       |ORDER BY id1 ASC NULLS LAST, id2 ASC NULLS LAST""".stripMargin

  /** Dedup clustering: connected components over the MinHash candidate
    * pairs — the step that turns pairwise similarity into dedup GROUPS
    * (keep one doc per cluster). Spark side: iterative min-label
    * propagation (the GraphX-style formulation — each round, every
    * vertex takes the min label among itself and its neighbors; the
    * driver loop is control flow only, data stays distributed, and
    * lineage is truncated per round). Converges in diameter rounds.
    * Oracle: recursive-CTE transitive closure (the edge set is small
    * by construction — band collisions only).
    */
  def d06DedupClusters(spark: SparkSession, sfDir: String): DataFrame =
    dedupLabels(spark, sfDir)
      .orderBy(col("doc_id").asc_nulls_last)

  /** The unsorted cluster assignment (doc_id, cluster_id, cluster_n)
    * shared by d06 (census) and d11 (keep-best selection), memoized per
    * (SparkContext, corpus dir): the two queries are ~80% the same
    * computation (signatures → bands → pairs → propagation), and the
    * result is an eagerly-materialized checkpoint of doc-count rows —
    * tiny, safe to keep for the session, and identical on reuse (the
    * whole pipeline is deterministic), so d11 after d06 pays only its
    * own argmax. Keyed by SparkContext so a restarted session can't
    * serve frames whose backing RDDs died with the old context.
    */
  private val labelsMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), DataFrame]()
  private def dedupLabels(spark: SparkSession, sfDir: String): DataFrame = {
    // entries keyed by a stopped context can neither be served nor
    // freed by anything else — drop them here so restarted sessions
    // don't accumulate dead plans for the JVM lifetime
    labelsMemo.keySet.removeIf(_._1.isStopped)
    labelsMemo.computeIfAbsent((spark.sparkContext, sfDir),
      _ => computeDedupLabels(spark, sfDir))
  }

  private def computeDedupLabels(spark: SparkSession, sfDir: String): DataFrame = {
    val (docsigs, est) = d02Scored(spark, sfDir)
    val pairs = est.select(col("id1"), col("id2"))
    // edges is read every propagation round: eager-checkpoint it once
    // (narrow id pairs), then the minhash/signature machinery behind
    // it — including the docsigs cache — is dead and freed NOW, not
    // whenever GC finds it
    val edges = pairs
      .unionByName(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .localCheckpoint(true)
    docsigs.unpersist(true)
    var labels = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint(true)
    // `labelsCk` is the checkpointed frame whose blocks get freed;
    // `labels` may be a projection over it
    var labelsCk = labels
    var converged = false
    var iter = 0
    while (!converged && iter < 20) {
      iter += 1
      val msgs = edges
        .join(labels, edges("id1") === labels("doc_id"))
        .select(col("id2").as("doc_id"), col("cluster_id"))
      // the previous label rides along as `__old` through the min
      // aggregate (msgs rows carry null; max ignores them), so the
      // convergence check is a filter over THIS round's checkpoint —
      // no per-round labels⋈next join
      val nextCk = labels
        .select(col("doc_id"), col("cluster_id"), col("cluster_id").as("__old"))
        .unionByName(msgs.withColumn("__old", lit(null).cast("long")))
        .groupBy(col("doc_id"))
        .agg(min(col("cluster_id")).as("cluster_id"), max(col("__old")).as("__old"))
        .localCheckpoint(true)
      converged = nextCk.filter(col("cluster_id") =!= col("__old")).isEmpty
      // `nextCk` is eagerly materialized and references nothing from
      // the previous round — free the old snapshot's blocks now.
      // Without this, every round's (and every rerun's) label snapshot
      // stays resident until GC finds it, which is executor-storage
      // creep on a long-running cluster (observed as growing repeat-run
      // times in the bench).
      freeLocalCheckpoint(labelsCk)
      labelsCk = nextCk
      labels = nextCk.drop("__old")
    }
    freeLocalCheckpoint(edges) // immediate, not ContextCleaner-async
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_n"))
    // materialize the (3-column, doc-count) result eagerly so the
    // FINAL labels snapshot can be freed too — the last piece of the
    // rep-over-rep storage creep; the result checkpoint is the only
    // block set a finished run leaves behind
    val result = labels.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_n"))
      .localCheckpoint(true)
    freeLocalCheckpoint(labelsCk)
    result
  }

  /** Drop a localCheckpoint'd DataFrame's materialized blocks. A
    * checkpointed frame plans to a `LogicalRDD` over the materialized
    * RDD; unpersisting that RDD frees its storage immediately instead
    * of waiting for the ContextCleaner to notice the reference died.
    * Only call once the frame can never be read again — the lineage
    * behind a local checkpoint is gone by design.
    */
  private def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** Log-rounds connected components: alternating large-star /
    * small-star contraction (the Two-Phase algorithm of Kiveris et
    * al., "Connected Components in MapReduce and Beyond", 2014).
    *
    * The production labeler ([[computeDedupLabels]]) uses min-label
    * propagation, which converges in graph-DIAMETER rounds — the right
    * trade for near-dup graphs, whose clusters are dense and shallow
    * (LSH bands connect all members of a dup group to each other
    * within a hop or two). This variant converges in O(log² n) rounds
    * REGARDLESS of diameter: each large-star hangs every
    * larger-than-center neighbor directly off its neighborhood
    * minimum, each small-star contracts the remaining chains, so even
    * an adversarial path graph collapses exponentially fast. It is the
    * safe choice when cluster shape is unknown (e.g. chained
    * plagiarism graphs); property-tested equivalent to a local
    * union-find ground truth in `CcPropertySpec`.
    *
    * Both phases are hash-shuffles keyed on node ids (a groupBy min +
    * an equi-join back) — no collect, no adjacency lists in driver
    * memory; per-round state is an eagerly-checkpointed canonical edge
    * list whose previous snapshot is freed immediately, mirroring the
    * storage hygiene of the min-label loop.
    *
    * @param nodes one row per node, column `doc_id`
    * @param edges undirected edges, columns `id1`, `id2`
    * @return (doc_id, cluster_id) with cluster_id = component minimum
    */
  def ccTwoPhase(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 40): DataFrame = {
    var e = edges
      .select(least(col("id1"), col("id2")).as("a"),
        greatest(col("id1"), col("id2")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var converged = e.isEmpty
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      // large-star: for every node u, m = min(N(u) ∪ {u}); every
      // STRICTLY LARGER neighbor v re-attaches as (m, v)
      val adj = e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      val mins = adj.groupBy(col("u"))
        .agg(min(col("v")).as("mnv"))
        .select(col("u"), least(col("u"), col("mnv")).as("m"))
      val large = adj.join(mins, Seq("u"))
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("m").as("a"), col("v").as("b"))
        .distinct()
        .localCheckpoint(true)
      // small-star: for every node u over its SMALLER neighbors,
      // m = min(N_small(u)); u and each small neighbor re-attach to m
      val adjS = large.select(col("b").as("u"), col("a").as("v"))
      val minsS = adjS.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = adjS.join(minsS, Seq("u"))
        .select(col("v").as("x"), col("m"))
        .unionByName(minsS.select(col("u").as("x"), col("m")))
        .filter(col("x") =!= col("m"))
        .select(least(col("x"), col("m")).as("a"),
          greatest(col("x"), col("m")).as("b"))
        .distinct()
        .localCheckpoint(true)
      freeLocalCheckpoint(large)
      // converged when the canonical edge set is a fixpoint (counts
      // equal and no new-side remainder — both sides are distinct sets)
      converged = small.count() == e.count() &&
        small.exceptAll(e).isEmpty
      freeLocalCheckpoint(e)
      e = small
    }
    if (!converged)
      throw new IllegalStateException(
        s"ccTwoPhase: no fixpoint after $maxRounds rounds")
    // fixpoint = disjoint stars centered at component minima: every
    // non-center node carries exactly its (center, node) edge
    val centers = e.select(col("b").as("doc_id"), col("a").as("cl"))
      .groupBy(col("doc_id")).agg(min(col("cl")).as("cl"))
    // materialize the labels BEFORE freeing the edge snapshot they read
    val labels = nodes.select(col("doc_id"))
      .join(centers, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cl"), col("doc_id")).as("cluster_id"))
      .localCheckpoint(true)
    freeLocalCheckpoint(e)
    labels
  }

  // `edges AS MATERIALIZED`: without it DuckDB inlines the whole
  // minhash CTE chain into the recursive step and re-evaluates it per
  // closure iteration (observed: timeout at sf0.1 vs 72 s with it).
  // Shared by d06 (census) and d11 (keep-best).
  private def labelCtes: String =
    s"""RECURSIVE $d02Ctes,
       |edges AS MATERIALIZED (
       |  SELECT id1, id2 FROM est WHERE est_jaccard >= 0.25
       |  UNION ALL SELECT id2, id1 FROM est WHERE est_jaccard >= 0.25),
       |reach AS (
       |  SELECT id1 AS src, id2 AS dst FROM edges
       |  UNION
       |  SELECT r.src, e.id2 FROM reach r JOIN edges e ON r.dst = e.id1),
       |labels AS (
       |  SELECT d.doc_id,
       |    least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS cluster_id
       |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
       |  GROUP BY d.doc_id),
       |sizes AS (SELECT cluster_id, count(*) AS cluster_n FROM labels GROUP BY cluster_id)""".stripMargin

  val d06Sql: String =
    s"""WITH $labelCtes
       |SELECT l.doc_id, l.cluster_id, s.cluster_n
       |FROM labels l JOIN sizes s ON l.cluster_id = s.cluster_id
       |ORDER BY l.doc_id ASC NULLS LAST""".stripMargin

  /** d11: semantic-dedup keep-best — the step that turns cluster
    * assignments into a deduplicated corpus: per near-dup cluster keep
    * exactly one representative, the HIGHEST-quality member (t02's
    * bit-exact score; doc_id breaks ties), instead of an arbitrary
    * first copy. Composes d06's distributed components with a per-
    * cluster argmax window — one extra shuffle on cluster_id over the
    * label table (doc-count rows, not pair rows).
    */
  def d11SemanticKeepBest(spark: SparkSession, sfDir: String): DataFrame = {
    val quality = Tables.documents(spark, sfDir)
      .withColumn("toks", toks)
      .select(col("doc_id"), (
        lit(0.4) * (size(array_distinct(col("toks"))).cast("double")
          / size(col("toks")).cast("double")) +
        lit(0.4) * least(length(col("text")).cast("double") / lit(500.0), lit(1.0)) +
        lit(0.2) * (size(filter(col("toks"),
          t => t.isInCollection(Seq("the", "a", "and", "of", "to")))).cast("double")
          / size(col("toks")).cast("double"))).as("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc_nulls_last, col("doc_id").asc_nulls_last)
    dedupLabels(spark, sfDir)
      .join(quality, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("keep_doc_id"),
        col("cluster_n"), col("quality"))
      .orderBy(col("cluster_id").asc_nulls_last)
  }

  val d11Sql: String =
    s"""WITH $labelCtes,
       |t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
       |q AS (
       |  SELECT doc_id,
       |    0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
       |    + 0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
       |    + 0.2 * (CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
       |        / CAST(len(toks) AS DOUBLE)) AS quality
       |  FROM t),
       |r AS (
       |  SELECT l.cluster_id, l.doc_id, s.cluster_n, q.quality,
       |    row_number() OVER (PARTITION BY l.cluster_id
       |      ORDER BY q.quality DESC NULLS LAST, l.doc_id ASC NULLS LAST) AS rn
       |  FROM labels l JOIN sizes s ON l.cluster_id = s.cluster_id
       |  JOIN q ON q.doc_id = l.doc_id)
       |SELECT cluster_id, doc_id AS keep_doc_id, cluster_n, quality
       |FROM r WHERE rn = 1
       |ORDER BY cluster_id ASC NULLS LAST""".stripMargin

  /** SimHash: 32-bit locality-sensitive signature. Tokens exploded once
    * (hash computed once per token), then 32 conditional sums per doc —
    * a single two-phase aggregate; the signature is the sign bit of
    * each dimension.
    */
  def d03Simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val perTok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(toks).as("tok"))
      .withColumn("th", tokenHash32(col("tok")))
    val bitSums: Seq[Column] = (0 until 32).map { j =>
      sum(when(expr(s"(th div ${1L << j}) % 2") === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val simhash = (0 until 32)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    perTok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simhash.as("simhash"))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  val d03Sql: String = {
    val bitSums = (0 until 32)
      .map(j => s"sum(CASE WHEN (th // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(",\n      |    ")
    val sh = (0 until 32)
      .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""WITH pt AS (
       |  SELECT doc_id, ${tokenHash32Sql("t.tok")} AS th
       |  FROM documents, unnest(string_split(text, ' ')) AS t(tok)),
       |bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM pt GROUP BY doc_id)
       |SELECT doc_id, CAST($sh AS BIGINT) AS simhash
       |FROM bits ORDER BY doc_id ASC NULLS LAST""".stripMargin
  }

  /** N-gram (3-gram shingle-set) Jaccard with candidate blocking —
    * Broder's resemblance, the standard document near-dup measure:
    * only pairs in the same (lang, length-bucket) block are compared;
    * Jaccard is computed over distinct word-3-gram shingle-hash sets
    * (round 5: previously distinct single tokens, a bag-of-words
    * similarity so loose on template-generated corpora that most pairs
    * qualified — ordered shingles discriminate, and put d04's verify
    * metric in the SAME space d04b's MinHash proposer searches). Pair
    * generation goes through the grid-salted self-join
    * (`Scale.gridSelfJoinPairs`), so a hot block is split across
    * cells² tasks instead of landing on one — same result set, bounded
    * per-task pair count. `rowsPerCell` is exposed for the spec that
    * forces splitting on small fixtures.
    */
  def d04NgramJaccard(spark: SparkSession, sfDir: String,
      rowsPerCell: Int = 2000): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // sort+dedup ONCE per row; pair scoring is then a codegen'd linear
    // merge (graft_intersect_size, bigint form) instead of a per-pair
    // hash set
    val d = shingled(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 100).cast("long").as("len_bucket"),
        array_sort(array_distinct(col("sh"))).as("ts"))
    val a = d.select(col("doc_id").as("id1"), col("lang"), col("len_bucket"), col("ts").as("ts1"))
    val b = d.select(col("doc_id").as("id2"), col("lang"), col("len_bucket"), col("ts").as("ts2"))
    Scale.gridSelfJoinPairs(a, b, Seq("lang", "len_bucket"), "id1", "id2",
        rowsPerCell = rowsPerCell)
      .withColumn("n_common", expr("graft_intersect_size(ts1, ts2)"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (size(col("ts1")) + size(col("ts2")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= 0.5)
      // least/greatest: cross-salt cells keep the salt-ordered
      // orientation, not the id-ordered one (jaccard is symmetric)
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"),
        col("lang"), col("jaccard"))
      // materialize the (scalar-only) pair list before the global
      // sort: range partitioning SAMPLES its input to pick boundaries,
      // which would execute the whole pair kernel twice (measured 2x
      // wall at sf0.1); the checkpoint is lazy and holds only the
      // 4-column output, never the token arrays
      .localCheckpoint(false)
      .orderBy(col("id1").asc_nulls_last, col("id2").asc_nulls_last)
  }

  /** The shingle-set CTE shared by d04's and d04b's oracles: distinct
    * word-3-gram shingle hashes per document (same arithmetic as the
    * engine's `shingled`).
    */
  private def shingleSetCte: String =
    s"""th0 AS (
       |  SELECT doc_id, lang, n_chars,
       |    list_transform(string_split(text, ' '),
       |      t -> ${tokenHash32Sql("t")} % ${P}) AS th
       |  FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |dsets AS (
       |  SELECT doc_id, lang, n_chars,
       |    list_distinct(list_transform(range(1, len(th) - 1),
       |      i -> ((th[i] * 8191 + th[i+1]) % ${P} * 8191 + th[i+2]) % ${P})) AS ts
       |  FROM th0)""".stripMargin

  val d04Sql: String =
    s"""WITH $shingleSetCte,
      |d AS (
      |  SELECT doc_id, lang, n_chars // 100 AS len_bucket, ts FROM dsets),
      |pairs AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.lang,
      |    len(list_intersect(a.ts, b.ts)) AS n_common,
      |    len(a.ts) AS n1, len(b.ts) AS n2
      |  FROM d a JOIN d b ON a.lang = b.lang AND a.len_bucket = b.len_bucket
      |    AND a.doc_id < b.doc_id)
      |SELECT id1, id2, lang,
      |  CAST(n_common AS DOUBLE) / CAST(n1 + n2 - n_common AS DOUBLE) AS jaccard
      |FROM pairs
      |WHERE CAST(n_common AS DOUBLE) / CAST(n1 + n2 - n_common AS DOUBLE) >= 0.5
      |ORDER BY id1 ASC NULLS LAST, id2 ASC NULLS LAST""".stripMargin

  /** d04b: exact-Jaccard near-dup with MINHASH-BAND candidates — the
    * production shape of d04. d04 verifies every pair inside a
    * (lang, length) block, paying the Σb² pair expansion; here LSH
    * proposes and the exact token-set Jaccard disposes. The verify
    * stage joins candidate ids back to sorted distinct-token arrays
    * and runs the codegen'd linear merge per CANDIDATE, so total work
    * is O(docs + candidates), not O(Σblock²). At 100 TB this is the
    * variant you run: banding parameters — not corpus shape — bound
    * the candidate count.
    *
    * The proposer works in the SAME metric space the verifier decides
    * in — both sides are distinct word-3-gram shingle sets (round 5:
    * the verify previously used single-token sets, so the proposer's
    * collision probability said nothing about the verify threshold
    * and recall was asserted nowhere). The 16-permutation signature is
    * shared with d02, re-banded 8 bands × 2 rows, which puts the
    * collision probability at the 0.5 verify threshold at
    * 1-(1-0.5²)⁸ ≈ 0.90, rising steeply above it; `DedupLshSpec` pins
    * the realized recall against exhaustive-d04 truth on the fixture.
    * The oracle replays the identical propose+verify pipeline, so the
    * driver gate stays exact.
    */
  def d04bJaccardVerified(spark: SparkSession, sfDir: String): DataFrame = {
    val (docsigs, cands) =
      minhashBandPairs(spark, sfDir, nBands = 8, rowsPerBand = 2,
        withTokenSets = true)
    // the verify arrays come from the SAME cached hashing pass that
    // built the signatures (withTokenSets) — not a second corpus-wide
    // shingle computation
    val d = docsigs.select(col("doc_id"), col("ts"))
    cands
      .join(d.select(col("doc_id").as("id1"), col("ts").as("ts1")), Seq("id1"))
      .join(d.select(col("doc_id").as("id2"), col("ts").as("ts2")), Seq("id2"))
      .withColumn("n_common", expr("graft_intersect_size(ts1, ts2)"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (size(col("ts1")) + size(col("ts2")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select(col("id1"), col("id2"), col("jaccard"))
      // lazy checkpoint, like d04: keeps the token arrays out of the
      // presentation sort's range-sampling re-execution while leaving
      // construction plan-only; the signature cache is freed by the
      // next dedup run (see minhashBandPairs)
      .localCheckpoint(false)
      .orderBy(col("id1").asc_nulls_last, col("id2").asc_nulls_last)
  }

  val d04bSql: String =
    s"""WITH th AS (
       |  SELECT doc_id,
       |    list_transform(string_split(text, ' '),
       |      t -> ${tokenHash32Sql("t")} % ${P}) AS th
       |  FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (
       |  SELECT doc_id,
       |    list_transform(range(1, len(th) - 1),
       |      i -> ((th[i] * 8191 + th[i+1]) % ${P} * 8191 + th[i+2]) % ${P}) AS hashes
       |  FROM th),
       |sigs AS (
       |  SELECT doc_id,
       |    list_transform(range(1, ${MinhashK + 1}),
       |      i -> list_min(list_transform(hashes, h -> (${aSqlList}[i] * h + ${bSqlList}[i]) % ${P}))) AS sig
       |  FROM sh),
       |bands AS (
       |  SELECT doc_id, b AS band,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*2+1 : b*2+2]),
       |      (acc, x) -> (acc * 31 + x) % ${P}) AS band_key
       |  FROM sigs CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6), (7)) AS bs(b)),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
       |  FROM bands l JOIN bands r
       |    ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id),
       |d AS (
       |  SELECT doc_id, list_distinct(hashes) AS ts FROM sh),
       |verified AS (
       |  SELECT id1, id2,
       |    len(list_intersect(a.ts, b.ts)) AS n_common,
       |    len(a.ts) AS n1, len(b.ts) AS n2
       |  FROM pairs JOIN d a ON a.doc_id = id1 JOIN d b ON b.doc_id = id2)
       |SELECT id1, id2,
       |  CAST(n_common AS DOUBLE) / CAST(n1 + n2 - n_common AS DOUBLE) AS jaccard
       |FROM verified
       |WHERE CAST(n_common AS DOUBLE) / CAST(n1 + n2 - n_common AS DOUBLE) >= 0.5
       |ORDER BY id1 ASC NULLS LAST, id2 ASC NULLS LAST""".stripMargin

  /** Embedding-cosine near-dup: label-blocked pairs, exact double
    * left-fold dot product (identical accumulation order on both
    * engines ⇒ bit-identical cosines). The 0.30 threshold is tuned to
    * the fixture (max same-label cosine ≈ 0.47; real dup corpora use
    * 0.95+ with the same plan).
    */
  def d05EmbeddingNearDup(spark: SparkSession, sfDir: String,
      rowsPerCell: Int = 2000): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    val a = e.select(col("vec_id").as("id1"), col("label"),
      col("v").as("v1"), col("nrm").as("n1"))
    val b = e.select(col("vec_id").as("id2"), col("label"),
      col("v").as("v2"), col("nrm").as("n2"))
    // grid-salted pairs: one dominant label can't pin a whole
    // quadratic expansion on a single task (cosine is symmetric, so
    // the least/greatest canonicalization is value-preserving)
    Scale.gridSelfJoinPairs(a, b, Seq("label"), "id1", "id2",
        rowsPerCell = rowsPerCell)
      .withColumn("cosine", expr("graft_dot(v1, v2)") / (col("n1") * col("n2")))
      .filter(col("cosine") >= 0.30)
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"),
        col("label"), col("cosine"))
      // see d04: don't let the sort's range sampling re-run the dot-
      // product join; checkpoint the scalar pair output first
      .localCheckpoint(false)
      .orderBy(col("id1").asc_nulls_last, col("id2").asc_nulls_last)
  }

  /** Per-band LSH bucket: the sign pattern of `ppb` consecutive
    * hyperplane projections (s02's plane family, Similarity.Planes),
    * packed into an int.
    */
  private def bandBucket(v: Column, band: Int, ppb: Int): Column =
    (0 until ppb).map { i =>
      val planeLit = array(Similarity.Planes(band * ppb + i).map(lit): _*)
      val dot = aggregate(zip_with(v, planeLit, (x, w) => x * w),
        lit(0.0), (a, x) => a + x)
      when(dot > 0.0, lit(1 << i)).otherwise(0)
    }.reduce(_ + _)

  /** d10: embedding near-dup for LABEL-FREE corpora — real crawls
    * don't ship d05's label column, so the block key here is a banded
    * hyperplane-LSH bucket: `nBands` bands of `planesPerBand` sign
    * bits each; a pair becomes a candidate when it agrees on ALL bits
    * of at least one band (band-OR × bit-AND, the MinHash-LSH recall
    * trade — more bands with fewer bits raise recall). Candidates flow
    * through the same grid governor as d05, so a hot bucket splits
    * across tasks like any hot label, and the band replication factor
    * is a constant `nBands`. DedupLshSpec pins recall vs brute-force
    * ground truth >= the label-blocked variant's on the fixture.
    */
  def d10NearDupLsh(spark: SparkSession, sfDir: String,
      threshold: Double = 0.30, planesPerBand: Int = 2, nBands: Int = 4,
      rowsPerCell: Int = 2000): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    val bands = array((0 until nBands).map(bd =>
      struct(lit(bd).as("band"),
        bandBucket(col("v"), bd, planesPerBand).as("bucket"))): _*)
    val banded = e.withColumn("bb", explode(bands))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = banded.select(col("vec_id").as("id1"), col("band"), col("bucket"),
      col("v").as("v1"), col("nrm").as("n1"))
    val b = banded.select(col("vec_id").as("id2"), col("band"), col("bucket"),
      col("v").as("v2"), col("nrm").as("n2"))
    Scale.gridSelfJoinPairs(a, b, Seq("band", "bucket"), "id1", "id2",
        rowsPerCell = rowsPerCell)
      .withColumn("cosine", expr("graft_dot(v1, v2)") / (col("n1") * col("n2")))
      .filter(col("cosine") >= threshold)
      // a pair found in several bands is one near-dup: canonicalize
      // and dedup (cosine is identical across bands — same fold)
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"), col("cosine"))
      .distinct()
      // see d04: don't let the sort's range sampling re-run the dot-
      // product join; checkpoint the scalar pair output first
      .localCheckpoint(false)
      .orderBy(col("id1").asc_nulls_last, col("id2").asc_nulls_last)
  }

  /** DuckDB twin of the banded bucketing: per band, the same sign
    * pattern over inlined plane literals (identical left-fold dots ⇒
    * identical signs ⇒ identical candidates).
    */
  val d10Sql: String = {
    val ppb = 2
    def bandTerm(band: Int): String =
      (0 until ppb).map { i =>
        val planeLit = Similarity.Planes(band * ppb + i).mkString("[", ", ", "]")
        s"""(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list_transform(range(1, 65), i -> v[i] * ${planeLit}[i])),
           |      (a, x) -> a + x) > 0.0 THEN ${1 << i} ELSE 0 END)""".stripMargin
      }.mkString(" + ")
    val bandRows = (0 until 4).map(bd =>
      s"SELECT vec_id, v, nrm, $bd AS band, ${bandTerm(bd)} AS bucket FROM n")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
       |  FROM e),
       |banded AS (
       |  $bandRows),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])),
       |      (acc, x) -> acc + x) / (a.nrm * b.nrm) AS cosine
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT id1, id2, cosine FROM pairs
       |WHERE cosine >= 0.30
       |ORDER BY id1 ASC NULLS LAST, id2 ASC NULLS LAST""".stripMargin
  }

  val d05Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, label, v,
      |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
      |  FROM e),
      |pairs AS (
      |  SELECT a.vec_id AS id1, b.vec_id AS id2, a.label,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])),
      |      (acc, x) -> acc + x) / (a.nrm * b.nrm) AS cosine
      |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
      |SELECT id1, id2, label, cosine FROM pairs
      |WHERE cosine >= 0.30
      |ORDER BY id1 ASC NULLS LAST, id2 ASC NULLS LAST""".stripMargin
}
