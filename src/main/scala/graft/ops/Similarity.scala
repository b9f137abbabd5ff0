package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` fixture (north-star
  * extension): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Scale design: the query set is broadcast (bounded), the corpus side
  * streams — brute force is a broadcast nested loop over each corpus
  * partition (embarrassingly parallel, no corpus shuffle). The LSH
  * variant prunes candidates to one bucket per query: at 100 TB the
  * bucket key becomes the shuffle/partition key and per-bucket work is
  * local; more probes = union of adjacent buckets, same plan.
  */
object Similarity {

  private val K = 5
  private val NQueries = 10

  /** Double-cast vector + exact left-fold norm (portable arithmetic —
    * both engines accumulate in the same order).
    */
  private def prepared(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
  }

  private def cosine(v1: String, v2: String, n1: Column, n2: Column): Column =
    expr(s"graft_dot($v1, $v2)") / (n1 * n2)

  /** Brute-force exact top-k: every query vector scored against the
    * whole corpus, ranked per query. Ties broken by neighbor id.
    */
  def s01KnnBrute(spark: SparkSession, sfDir: String): DataFrame = {
    val e = prepared(spark, sfDir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc_nulls_last, col("neighbor_id").asc_nulls_last)
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine("qv", "cv", col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id").asc_nulls_last, col("rank").asc_nulls_last)
  }

  val s01Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
       |  FROM e),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])),
       |      (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cosine
       |  FROM n q JOIN n c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, cosine FROM ranked
       |WHERE rank <= $K
       |ORDER BY query_id ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin

  /** One broadcast codebook pass: every vector scored against every
    * centroid (the codebook is bounded, so the cross join is a
    * broadcast nested loop — the correct IVF assignment shape), ranked
    * per vector. `crn == 1` is the owning cell; `crn <= nprobe` is the
    * query-side probe set.
    */
  private def assignCells(e: DataFrame, cents: DataFrame): DataFrame = {
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc_nulls_last, col("cent_id").asc_nulls_last)
    e.crossJoin(broadcast(cents))
      .withColumn("cscore", expr("graft_dot(v, cv)") / (col("nrm") * col("cn")))
      .withColumn("crn", row_number().over(wAssign))
  }

  /** The owning cell per vector — exactly [[assignCells]]'s `crn == 1`
    * row — as an argmax AGGREGATE instead of a window rank:
    * `max(struct(cscore, -cent_id, ...))` picks the highest score with
    * ties to the SMALLEST cent_id, which is the window's
    * (cscore DESC, cent_id ASC) first row, including NaN placement
    * (Spark's total order puts NaN greatest in max() and in DESC sorts
    * alike). Why it matters (guide §2.3/§2.4): the window form
    * shuffles and sorts the ENTIRE corpus × codebook expansion with
    * every row's full vector payload; the aggregate form partially
    * combines map-side, so at most one row per (vector, partition)
    * ever crosses the exchange and nothing is sorted. Carried columns
    * ride inside the struct (after the two decision fields, so they
    * never influence the comparison). The query-side probe set
    * (`crn <= nprobe`) stays on the window — ranking is per-vector, so
    * it runs on the handful of filtered query rows only.
    */
  private def ownCells(e: DataFrame, cents: DataFrame,
      carry: Seq[String]): DataFrame = {
    val fields = Seq(col("cscore"), (-col("cent_id")).as("negid"),
      col("cent_id").as("cell")) ++ carry.map(col)
    e.crossJoin(broadcast(cents))
      .withColumn("cscore", expr("graft_dot(v, cv)") / (col("nrm") * col("cn")))
      .groupBy(col("vec_id"))
      .agg(max(struct(fields: _*)).as("b"))
      .select(col("vec_id") +: col("b.cell").as("cell") +:
        carry.map(c => col(s"b.$c").as(c)): _*)
  }

  /** Spherical k-means codebook over the corpus (Lloyd's iterations,
    * cosine assignment): initial centroids are the k lowest vec_ids
    * (deterministic), each round reassigns (one broadcast pass) and
    * recomputes per-cell means elementwise via posexplode — the
    * distributed form of the M-step; means are renormalized to unit
    * length so cosine argmax stays consistent. The driver loop is
    * control flow only; `localCheckpoint` cuts lineage per round (the
    * d06 connected-components pattern). A cell that captures no
    * vectors in a round drops out (k can shrink on degenerate
    * inits) — standard Lloyd's behavior; callers needing exactly k
    * re-seed.
    */
  def kmeansCodebook(spark: SparkSession, sfDir: String,
      k: Int = 8, iters: Int = 3): DataFrame = {
    val e = prepared(spark, sfDir)
    var cents = e.orderBy(col("vec_id").asc_nulls_last).limit(k)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    for (_ <- 1 to iters) {
      val assigned = ownCells(e, cents, Seq("v")) // argmax agg, not a window
        .select(col("cell"), col("v"))
      cents = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mv"))
        .withColumn("mn", sqrt(expr("graft_dot(mv, mv)")))
        .select(col("cell").as("cent_id"),
          transform(col("mv"), x => x / col("mn")).as("cv"),
          lit(1.0).as("cn"))
        .localCheckpoint()
    }
    cents
  }

  /** Mean best-centroid cosine over the corpus — the (spherical)
    * k-means objective; evaluation/spec metric, not a data operator.
    */
  def codebookObjective(spark: SparkSession, sfDir: String,
      cents: DataFrame): Double =
    assignCells(prepared(spark, sfDir), cents)
      .filter(col("crn") === 1)
      .agg(avg(col("cscore"))).head().getDouble(0)

  /** IVF (inverted-file) ANN: vectors are assigned to their nearest
    * centroid's cell; queries probe their `nprobe` nearest cells. The
    * default codebook is a deterministic sample of the corpus (every
    * 100th id) so the oracle can replay it; pass
    * `kmeansCodebook(...)` for the trained variant (spec-gated — the
    * iteration count makes it SQL-inexpressible). The partition/probe
    * plumbing is the scale path either way: at 100 TB the cell id is
    * the partition key, the codebook is broadcast, and assignment is
    * one broadcast pass over the corpus. Corpus cells are disjoint, so
    * nprobe > 1 unions candidate sets without duplicate neighbors —
    * same plan, bigger candidate list.
    */
  /** s03's default probe width — one constant in BOTH the Scala plan
    * and the oracle SQL (round 5: 2, up from 1 — the second-closest
    * cell lifts fixture recall 0.44 → the IvfSpec-pinned value for a
    * bounded 2× candidate cost, the standard IVF quality knob).
    */
  private val S03Nprobe = 2

  def s03KnnIvf(spark: SparkSession, sfDir: String,
      nprobe: Int = S03Nprobe, codebook: Option[DataFrame] = None): DataFrame = {
    val e = prepared(spark, sfDir)
    val cents = codebook.getOrElse(
      e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn")))
    // assignment via the partial-aggregating argmax (see [[ownCells]]);
    // probes rank only the filtered query rows — the corpus-wide
    // window over the cross-join expansion is gone from the plan
    val assigned = ownCells(e, cents, Seq("v", "nrm"))
    val q = assignCells(e.filter(col("vec_id") < NQueries), cents)
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id").as("cell"),
        col("v").as("qv"), col("nrm").as("qn"))
    val c = assigned.select(col("vec_id").as("neighbor_id"), col("cell"),
      col("v").as("cv2"), col("nrm").as("cn2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc_nulls_last, col("neighbor_id").asc_nulls_last)
    broadcast(q).join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", expr("graft_dot(qv, cv2)") / (col("qn") * col("cn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine"), col("cell"))
      .orderBy(col("query_id").asc_nulls_last, col("rank").asc_nulls_last)
  }

  val s03Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
       |  FROM e),
       |cents AS (
       |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 100 = 0),
       |scored_cells AS (
       |  SELECT n.vec_id, cents.cent_id, n.v, n.nrm,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(n.v) + 1), i -> n.v[i] * cents.cv[i])),
       |      (acc, x) -> acc + x) / (n.nrm * cents.cn) AS cscore
       |  FROM n CROSS JOIN cents),
       |cells AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cscore DESC NULLS LAST, cent_id ASC NULLS LAST) AS crn
       |  FROM scored_cells),
       |assigned AS (
       |  SELECT vec_id, cent_id AS cell, v, nrm FROM cells WHERE crn = 1),
       |probed AS (
       |  SELECT vec_id, cent_id AS cell, v, nrm FROM cells
       |  WHERE crn <= $S03Nprobe AND vec_id < $NQueries),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.cell,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])),
       |      (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cosine
       |  FROM probed q JOIN assigned c ON q.cell = c.cell
       |    AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine, cell,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, cosine, cell FROM ranked
       |WHERE rank <= $K
       |ORDER BY query_id ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin

  /** Deterministic pseudo-random hyperplanes (40 planes × 64 dims in
    * [-1, 1]) — literal constants, identical in the Scala plan and the
    * SQL oracle by construction. The family is indexed, not shared
    * state: s02/d10 draw planes 0–7 (fixed banding over a bounded
    * query set, where bucket² never grows), while s06's
    * growth-adaptive banding strides 20 planes per band so
    * planes-per-band can scale with corpus size without re-deriving
    * any other operator's buckets.
    */
  private val NPlanes = 40
  private val Dim = 64
  private[ops] val Planes: IndexedSeq[IndexedSeq[Double]] =
    (0 until NPlanes).map { p =>
      (0 until Dim).map { d =>
        ((((p * Dim + d) * 2654435761L + 12345L) % 2001L) - 1000L) / 1000.0
      }
    }

  /** Per-band bucket terms for the oracle (one CASE per plane in the
    * band, plane vector inlined as a literal list). `base` is the
    * first plane index of the band — callers with adaptive
    * planes-per-band stride bands wider than ppb.
    */
  private def bandSqlTerms(base: Int, ppb: Int): String =
    (0 until ppb).map { i =>
      val planeLit = Planes(base + i).mkString("[", ", ", "]")
      s"""(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, ${Dim + 1}), i -> v[i] * ${planeLit}[i])),
         |      (a, x) -> a + x) > 0.0 THEN ${1L << i} ELSE 0 END)""".stripMargin
    }.mkString(" + ")

  /** s02's banding split of the 8-plane family — shared constants in
    * BOTH the Scala plan and the oracle SQL (a caller-tunable split
    * would silently diverge from the fixed oracle, and nBands ×
    * planesPerBand must not exceed the 8 planes).
    */
  private val S02Bands = 4
  private val S02PlanesPerBand = 2

  /** LSH-banded approximate top-k: a candidate is any vector agreeing
    * with the query on ALL plane signs of at least one band.
    */
  def s02KnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val (planesPerBand, nBands) = (S02PlanesPerBand, S02Bands)
    // round 5: banded multi-probe. The previous single bucket ANDed
    // all 8 plane signs, whose collision probability at this fixture's
    // neighbor cosines left ~0.04 recall vs brute truth; 4 bands × 2
    // planes candidate on ANY band agreement (the band-OR × bit-AND
    // recall trade d10 uses), lifting recall to the IvfSpec-pinned
    // floor. Candidate ids dedupe across bands BEFORE the embedding
    // arrays attach — wide vectors never ride the distinct shuffle
    // (the minhash-band-pairs shape).
    val e = prepared(spark, sfDir)
    val bandsArr = array((0 until nBands).map(bd =>
      struct(lit(bd).as("band"),
        bandBucketExpr(col("v"), bd * planesPerBand, planesPerBand).as("bkt"))): _*)
    val banded = e.withColumn("bb", explode(bandsArr))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bkt").as("bkt"))
    val candIds = broadcast(banded.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("band"), col("bkt")))
      .join(banded.select(col("vec_id").as("neighbor_id"), col("band"), col("bkt")),
        Seq("band", "bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val qv = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cv = e.select(col("vec_id").as("neighbor_id"),
      col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc_nulls_last, col("neighbor_id").asc_nulls_last)
    candIds
      .join(broadcast(qv), Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .withColumn("cosine", cosine("qv", "cv", col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id").asc_nulls_last, col("rank").asc_nulls_last)
  }

  /** Per-band bucket: the sign pattern of `ppb` consecutive
    * hyperplane projections starting at plane index `base`.
    */
  private def bandBucketExpr(v: Column, base: Int, ppb: Int): Column =
    (0 until ppb).map { i =>
      val planeLit = array(Planes(base + i).map(lit): _*)
      val dot = aggregate(
        zip_with(v, planeLit, (x, w) => x * w),
        lit(0.0), (a, x) => a + x)
      when(dot > 0.0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  val s02Sql: String = {
    val bandSelects = (0 until S02Bands).map(bd =>
      s"""SELECT vec_id, $bd AS band, CAST(${bandSqlTerms(bd * S02PlanesPerBand, S02PlanesPerBand)} AS BIGINT) AS bkt
         |  FROM n""".stripMargin).mkString("\n  UNION ALL ")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
       |  FROM e),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM bands q JOIN bands c ON q.band = c.band AND q.bkt = c.bkt
       |  WHERE q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])),
       |      (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cosine
       |  FROM cand
       |  JOIN n q ON q.vec_id = cand.query_id
       |  JOIN n c ON c.vec_id = cand.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, cosine FROM ranked
       |WHERE rank <= $K
       |ORDER BY query_id ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin
  }

  /** s05 PQ geometry: 8 subspaces × 8 dims over the 64-dim vectors,
    * ADC shortlist of 50 per query before exact re-rank. Sub-codebooks
    * sample every 10th corpus id capped at 256 entries — genuinely
    * 8-bit codes, and a resolution independent of the coarse cell
    * count (the real-PQ property; the first cut reused the ≤5 coarse
    * centroids per subspace and its ADC was too coarse to shortlist the
    * true neighbors — recall 0.14). Constants are shared by the Scala
    * plan and the oracle SQL.
    */
  private val S05M = 8
  private val S05SubDim = 8
  private val S05Rerank = 50
  private val S05CbStride = 10
  private val S05CbMaxId = 10 * 256

  /** Per-subspace slices (m, S05SubDim-dim subvector) of a vector column. */
  private def subSlices(c: Column): Column =
    array((0 until S05M).map(m =>
      struct(lit(m).as("m"),
        slice(c, m * S05SubDim + 1, S05SubDim).as("sv"))): _*)

  /** s05: IVF-PQ with exact re-rank — the standard memory ladder past
    * plain IVF at 100 TB: corpus vectors are product-quantized to
    * `S05M` sub-codebook ids (4 bytes/vector here vs 512 for the raw
    * doubles), queries probe their `nprobe` nearest cells and score
    * candidates from CODES ONLY (asymmetric distance: the query
    * subvector dotted with each candidate's sub-centroid), and only the
    * ADC shortlist of `S05Rerank` rejoins full-precision vectors for
    * the exact final ranking. At scale the candidate scan therefore
    * touches a few bytes per vector instead of the embedding itself.
    *
    * Everything is deterministic so DuckDB can replay it: the coarse
    * codebook is s03's every-100th-id sample, each subspace's
    * sub-codebook is the coarse centroids' own subvectors, PQ
    * assignment is exact-L2 argmin with id tie-breaks, and the two
    * double folds that cross engines (ADC sum over subspaces, shortlist
    * norm) run in sorted-subspace order on both sides (the repo's
    * deterministic-fold discipline). Recall vs brute-force truth is
    * pinned in IvfSpec next to s02/s03.
    */
  def s05KnnIvfPq(spark: SparkSession, sfDir: String,
      nprobe: Int = S03Nprobe): DataFrame = {
    val e = prepared(spark, sfDir)
    val cents = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    // argmax aggregate, not a corpus-wide window — see [[ownCells]]
    val assigned = ownCells(e, cents, Seq("v"))
    // sub-codebooks: (subspace, code, sub-centroid, its squared norm)
    val subcb = e
      .filter(col("vec_id") % S05CbStride === 0 && col("vec_id") < S05CbMaxId)
      .select(col("vec_id").as("code"), explode(subSlices(col("v"))).as("s"))
      .select(col("s.m").as("m"), col("code"), col("s.sv").as("sc"))
      .withColumn("scn2", expr("graft_dot(sc, sc)"))
    // PQ encode: per (vector, subspace) the exact-L2-nearest sub-
    // centroid; ties to the smaller code. The argmin is a
    // min(struct(d2, code)) aggregate — lexicographic struct ordering
    // gives exactly the smallest-distance-then-smallest-code
    // semantics, with a map-side partial combine instead of sorting
    // corpus × subspaces × codebook rows through a window; and since
    // the cell-assignment aggregate already hash-partitioned the
    // corpus by vec_id, the groupBy needs no exchange at all.
    // d2 expands to |vm|² + |sc|² − 2·⟨vm, sc⟩ so the only per-pair
    // work is one codegen'd native dot product (an interpreted
    // zip_with/aggregate fold here measured ~4 s at sf0.1 — higher-
    // order functions don't enter whole-stage codegen); the squared
    // norms are per-subvector and per-code, computed once each
    val codes = assigned
      .select(col("vec_id"), col("cell"), explode(subSlices(col("v"))).as("s"))
      .select(col("vec_id"), col("cell"), col("s.m").as("m"), col("s.sv").as("vm"))
      .withColumn("vmn2", expr("graft_dot(vm, vm)"))
      .join(broadcast(subcb.select(col("m"), col("code"), col("sc"), col("scn2"))),
        Seq("m"))
      .withColumn("d2",
        col("vmn2") + col("scn2") - lit(2.0) * expr("graft_dot(vm, sc)"))
      .groupBy(col("vec_id"), col("cell"), col("m"))
      .agg(min(struct(col("d2"), col("code"))).as("best"))
      .select(col("vec_id"), col("cell"), col("m"), col("best.code").as("code"))
    // query side: probe cells (s03 shape) + per-subspace query slices
    val qv = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val probes = assignCells(e.filter(col("vec_id") < NQueries), cents)
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id").as("cell"))
    val qSub = qv.select(col("query_id"), explode(subSlices(col("qv"))).as("s"))
      .select(col("query_id"), col("s.m").as("m"), col("s.sv").as("qvm"))
    // ADC: score candidates from codes only; the per-candidate sums
    // fold in sorted-subspace order so the doubles are bit-identical
    // across engines and partitionings
    val adParts = broadcast(probes)
      .join(codes, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("m"), col("code"))
      .join(broadcast(subcb), Seq("m", "code"))
      .join(broadcast(qSub), Seq("query_id", "m"))
      .withColumn("ad", expr("graft_dot(qvm, sc)"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc_nulls_last, col("neighbor_id").asc_nulls_last)
    val shortlist = adParts
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sort_array(collect_list(struct(col("m"), col("ad")))).as("ads"),
        sort_array(collect_list(struct(col("m"), col("scn2")))).as("sns"))
      .withColumn("approx_dot",
        expr("aggregate(ads, CAST(0.0 AS DOUBLE), (a, s) -> a + s.ad)"))
      .withColumn("anorm2",
        expr("aggregate(sns, CAST(0.0 AS DOUBLE), (a, s) -> a + s.scn2)"))
      .join(broadcast(qv.select(col("query_id"), col("qn"))), Seq("query_id"))
      .withColumn("ascore", col("approx_dot") / (col("qn") * sqrt(col("anorm2"))))
      .withColumn("arn", row_number().over(wA))
      .filter(col("arn") <= S05Rerank)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank: only the shortlist rejoins full-precision vectors
    val cFull = e.select(col("vec_id").as("neighbor_id"),
      col("v").as("cv2"), col("nrm").as("cn2"))
    val wR = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc_nulls_last, col("neighbor_id").asc_nulls_last)
    shortlist
      .join(broadcast(qv), Seq("query_id"))
      .join(cFull, Seq("neighbor_id"))
      .withColumn("cosine", expr("graft_dot(qv, cv2)") / (col("qn") * col("cn2")))
      .withColumn("rank", row_number().over(wR))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id").asc_nulls_last, col("rank").asc_nulls_last)
  }

  val s05Sql: String = {
    val ms = s"SELECT unnest(range(0, $S05M)) AS m"
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
       |  FROM e),
       |cents AS (
       |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 100 = 0),
       |scored_cells AS (
       |  SELECT n.vec_id, cents.cent_id, n.v, n.nrm,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(n.v) + 1), i -> n.v[i] * cents.cv[i])),
       |      (acc, x) -> acc + x) / (n.nrm * cents.cn) AS cscore
       |  FROM n CROSS JOIN cents),
       |cells AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cscore DESC NULLS LAST, cent_id ASC NULLS LAST) AS crn
       |  FROM scored_cells),
       |assigned AS (
       |  SELECT vec_id, cent_id AS cell, v FROM cells WHERE crn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, cent_id AS cell FROM cells
       |  WHERE crn <= $S03Nprobe AND vec_id < $NQueries),
       |qn AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
       |  WHERE vec_id < $NQueries),
       |subcb AS (
       |  SELECT mm.m, vec_id AS code,
       |    v[$S05SubDim*mm.m+1 : $S05SubDim*(mm.m+1)] AS sc,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v[$S05SubDim*mm.m+1 : $S05SubDim*(mm.m+1)],
       |        x -> x * x)), (a, x) -> a + x) AS scn2
       |  FROM n CROSS JOIN ($ms) mm
       |  WHERE vec_id % $S05CbStride = 0 AND vec_id < $S05CbMaxId),
       |vsub AS (
       |  SELECT a.vec_id, a.cell, mm.m,
       |    a.v[$S05SubDim*mm.m+1 : $S05SubDim*(mm.m+1)] AS vm,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(a.v[$S05SubDim*mm.m+1 : $S05SubDim*(mm.m+1)],
       |        x -> x * x)), (a, x) -> a + x) AS vmn2
       |  FROM assigned a CROSS JOIN ($ms) mm),
       |dist AS (
       |  SELECT vs.vec_id, vs.cell, vs.m, s.code,
       |    vs.vmn2 + s.scn2 - 2.0 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, ${S05SubDim + 1}),
       |        i -> vs.vm[i] * s.sc[i])), (a, x) -> a + x) AS d2
       |  FROM vsub vs JOIN subcb s ON vs.m = s.m),
       |codes AS (
       |  SELECT vec_id, cell, m, code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |      ORDER BY d2 ASC NULLS LAST, code ASC NULLS LAST) AS rn
       |    FROM dist) WHERE rn = 1),
       |qsub AS (
       |  SELECT q.query_id, mm.m,
       |    q.qv[$S05SubDim*mm.m+1 : $S05SubDim*(mm.m+1)] AS qvm
       |  FROM qn q CROSS JOIN ($ms) mm),
       |adp AS (
       |  SELECT p.query_id, c.vec_id AS neighbor_id, c.m,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, ${S05SubDim + 1}),
       |        i -> qs.qvm[i] * s.sc[i])), (a, x) -> a + x) AS ad,
       |    s.scn2
       |  FROM probes p
       |  JOIN codes c ON c.cell = p.cell AND c.vec_id <> p.query_id
       |  JOIN subcb s ON s.m = c.m AND s.code = c.code
       |  JOIN qsub qs ON qs.query_id = p.query_id AND qs.m = c.m),
       |short AS (
       |  SELECT query_id, neighbor_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list_sort(list({'m': m, 'ad': ad})),
       |        s -> s.ad)), (a, x) -> a + x) AS approx_dot,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list_sort(list({'m': m, 'scn2': scn2})),
       |        s -> s.scn2)), (a, x) -> a + x) AS anorm2
       |  FROM adp GROUP BY query_id, neighbor_id),
       |shortlist AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT sh.query_id, sh.neighbor_id,
       |      row_number() OVER (PARTITION BY sh.query_id
       |        ORDER BY sh.approx_dot / (q.qn * sqrt(sh.anorm2)) DESC NULLS LAST,
       |          sh.neighbor_id ASC NULLS LAST) AS arn
       |    FROM short sh JOIN qn q ON q.query_id = sh.query_id)
       |  WHERE arn <= $S05Rerank),
       |reranked AS (
       |  SELECT sl.query_id, sl.neighbor_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.v[i])),
       |      (acc, x) -> acc + x) / (q.qn * c.nrm) AS cosine
       |  FROM shortlist sl
       |  JOIN qn q ON q.query_id = sl.query_id
       |  JOIN n c ON c.vec_id = sl.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rank
       |  FROM reranked)
       |SELECT query_id, rank, neighbor_id, cosine FROM ranked
       |WHERE rank <= $K
       |ORDER BY query_id ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin
  }

  /** s06 banding: 2 bands with GROWTH-ADAPTIVE planes-per-band. Both
    * join sides are the whole corpus, so Σ bucket² drives the pair
    * count — a fixed bucket space is a quadratic cliff (100× corpus →
    * 100× per bucket → 10,000× pairs). ppb therefore scales with
    * log₂(n): the smallest p with targetRows·2^p ≥ n, clamped to
    * [4, 20], keeping the EXPECTED bucket near targetRows at any
    * corpus size. The formula is integer-only (shift-and-compare, no
    * floating log) so the SQL oracle replays it bit-exactly from the
    * same count. Bands stride `S06MaxPpb` planes apart so each band's
    * plane family is disjoint and stable as ppb grows. Beyond the
    * clamp (n > 32·2^20 ≈ 33M per this constant set) residual bucket
    * growth is handled by the second defense: the candidate self-join
    * runs through `Scale.gridSelfJoinPairs`, which splits any hot
    * bucket across cells² tasks. k = 3 neighbors per vector.
    */
  private val S06Bands = 2
  private val S06MinPpb = 4
  private val S06MaxPpb = 20
  private val S06TargetBucketRows = 32L
  private val S06RowsPerCell = 2000
  private val S06K = 3

  /** Smallest p in [S06MinPpb, S06MaxPpb] with targetRows·2^p ≥ n —
    * pure integer arithmetic, mirrored in s06Sql's range-scan CTE.
    */
  private[graft] def s06Ppb(n: Long): Int = {
    val p = (0 to S06MaxPpb)
      .find(p => (S06TargetBucketRows << p) >= n).getOrElse(S06MaxPpb)
    math.min(S06MaxPpb, math.max(S06MinPpb, p))
  }

  /** s06: all-corpus kNN JOIN — the batch neighbor-graph build behind
    * corpus-level near-dup sweeps and kNN-graph clustering: every
    * vector gets its top-3 cosine neighbors, not just a bounded query
    * set. The s01/s02 broadcast-the-queries shape cannot do this (the
    * "query" side IS the corpus), so candidates come from a banded
    * LSH self-join — the shuffle key is (band, bucket), the bucket
    * space grows with the corpus (see S06 banding above), and the
    * join itself is grid-governed (`Scale.gridSelfJoinPairs`) so a
    * hot bucket splits across tasks instead of landing on one. The
    * per-vector selection runs on the native TopKPerKey operator:
    * map-side bounded heaps ship ≤ k rows per (vector, partition)
    * instead of sorting the full candidate set through a window.
    * Recall is the banding trade (deterministic pipeline — the oracle
    * replays it exactly, so correctness is hash-exact regardless).
    */
  def s06KnnJoin(spark: SparkSession, sfDir: String): DataFrame =
    s06KnnJoin(spark, sfDir, S06RowsPerCell)

  /** `rowsPerCell` exposed for the spec that forces grid splitting on
    * small fixtures (result must be invariant under it).
    */
  def s06KnnJoin(spark: SparkSession, sfDir: String,
      rowsPerCell: Int): DataFrame = {
    val e = prepared(spark, sfDir)
    // stats-then-choose, as the grid census does: one column-pruned
    // count job picks the bucket granularity before the plan builds
    val ppb = s06Ppb(Tables.embeddings(spark, sfDir).count())
    val bandsArr = array((0 until S06Bands).map(bd =>
      struct(lit(bd).as("band"),
        bandBucketExpr(col("v"), bd * S06MaxPpb, ppb).as("bkt"))): _*)
    val banded = e.withColumn("bb", explode(bandsArr))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bkt").as("bkt"))
    // candidate ids dedupe across bands BEFORE vectors attach (the
    // minhash-band-pairs shape: wide arrays never ride the distinct).
    // The grid emits each unordered pair once (orientation arbitrary
    // under cross-cell salting), so normalize, dedupe across bands,
    // then mirror — the kNN graph is directed, every vector is a
    // source.
    val und = Scale.gridSelfJoinPairs(
        banded.select(col("vec_id").as("src_id"), col("band"), col("bkt")),
        banded.select(col("vec_id").as("neighbor_id"), col("band"), col("bkt")),
        Seq("band", "bkt"), "src_id", "neighbor_id",
        rowsPerCell = rowsPerCell)
      .select(least(col("src_id"), col("neighbor_id")).as("lo"),
        greatest(col("src_id"), col("neighbor_id")).as("hi"))
      .distinct()
    val cand = und.select(col("lo").as("src_id"), col("hi").as("neighbor_id"))
      .union(und.select(col("hi").as("src_id"), col("lo").as("neighbor_id")))
    val sv = e.select(col("vec_id").as("src_id"), col("v").as("sv"), col("nrm").as("sn"))
    val cv = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv2"),
      col("nrm").as("cn2"))
    val scoredPairs = cand
      .join(sv, Seq("src_id"))
      .join(cv, Seq("neighbor_id"))
      .withColumn("cosine", expr("graft_dot(sv, cv2)") / (col("sn") * col("cn2")))
      .select(col("src_id"), col("neighbor_id"), col("cosine"))
    val top = graft.plans.TopKPerKey.topKPerKey(scoredPairs,
      keyCols = Seq(col("src_id")),
      orderCols = Seq(col("cosine").desc_nulls_last,
        col("neighbor_id").asc_nulls_last),
      k = S06K)
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("cosine").desc_nulls_last, col("neighbor_id").asc_nulls_last)
    top.withColumn("rank", row_number().over(w))
      .select(col("src_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("src_id").asc_nulls_last, col("rank").asc_nulls_last)
  }

  val s06Sql: String = {
    // adaptive ppb replayed in SQL: the full S06MaxPpb-plane bucket
    // masked to its low ppb bits (plane i contributes exactly 2^i, so
    // `% 2^ppb` drops planes ≥ ppb — bit-identical to the Scala plan
    // building only the first ppb terms), with ppb derived from
    // count(*) by the same integer shift-and-compare as s06Ppb
    val bandSelects = (0 until S06Bands).map(bd =>
      s"""SELECT vec_id, $bd AS band,
         |    CAST((${bandSqlTerms(bd * S06MaxPpb, S06MaxPpb)})
         |      % (CAST(1 AS BIGINT) << (SELECT ppb FROM pp)) AS BIGINT) AS bkt
         |  FROM n""".stripMargin).mkString("\n  UNION ALL ")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
       |  FROM e),
       |pp AS (
       |  SELECT LEAST(GREATEST(COALESCE(
       |    (SELECT MIN(p) FROM range(0, ${S06MaxPpb + 1}) t(p)
       |     WHERE ($S06TargetBucketRows * (CAST(1 AS BIGINT) << p))
       |       >= (SELECT count(*) FROM embeddings)),
       |    $S06MaxPpb), $S06MinPpb), $S06MaxPpb) AS ppb),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS src_id, c.vec_id AS neighbor_id
       |  FROM bands q JOIN bands c ON q.band = c.band AND q.bkt = c.bkt
       |  WHERE q.vec_id <> c.vec_id),
       |scored AS (
       |  SELECT cand.src_id, cand.neighbor_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])),
       |      (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cosine
       |  FROM cand
       |  JOIN n q ON q.vec_id = cand.src_id
       |  JOIN n c ON c.vec_id = cand.neighbor_id),
       |ranked AS (
       |  SELECT src_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY src_id
       |      ORDER BY cosine DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rank
       |  FROM scored)
       |SELECT src_id, rank, neighbor_id, cosine FROM ranked
       |WHERE rank <= $S06K
       |ORDER BY src_id ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin
  }

  private val RangeTau = 0.25

  /** s04: cosine RANGE search — "every neighbor at least τ similar",
    * the radius-query complement of top-k (dedup sweeps and
    * retrieval-recall audits want a threshold, not a count). Same
    * broadcast-queries / streaming-corpus shape as s01 — bounded query
    * set replicated to every corpus partition, no corpus shuffle, no
    * per-query ranking pass at all (the threshold is a row filter, so
    * unlike top-k there is no window/ordering state) — making range
    * search the cheapest exact similarity scan at 100 TB. The same
    * exact left-fold dot product keeps the τ comparison bit-identical
    * on both engines.
    */
  def s04RangeSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val e = prepared(spark, sfDir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine("qv", "cv", col("qn"), col("cn")))
      .filter(col("cosine") >= RangeTau)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      // scalar output only; the broadcast-join kernel must not be
      // re-run by the presentation sort's range sampling
      .localCheckpoint(false)
      .orderBy(col("query_id").asc_nulls_last, col("neighbor_id").asc_nulls_last)
  }

  val s04Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
       |  FROM e),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])),
       |      (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cosine
       |  FROM n q JOIN n c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id)
       |SELECT query_id, neighbor_id, cosine FROM scored
       |WHERE cosine >= $RangeTau
       |ORDER BY query_id ASC NULLS LAST, neighbor_id ASC NULLS LAST""".stripMargin

  /** Fixed-point scale for s07's cross-row component sums: 2^30. */
  private val FxScale = 1073741824L

  /** s07: label-centroid similarity — the cluster-quality matrix
    * (pairwise cosine between per-label mean vectors) that tells a
    * curator which classes are confusable. Cross-row float sums are
    * partition-order-NONdeterministic in IEEE, so the centroid is
    * defined in FIXED POINT: each component is floored to 2^-30
    * resolution and summed as int64 (exact, order-independent,
    * overflow-free below ~2^33 rows per label), then converted back to
    * double with a fixed-shape division chain. Aggregation is
    * per-(label, dim) — bounded keys, but a two-phase AGGREGATE
    * (map-side partial collapse), not a window, so the shuffle carries
    * |labels|·|dims| rows per partition regardless of corpus size.
    * The 10-row centroid table self-joins under a broadcast for the
    * 45 pairwise cosines; `graft_dot`'s index-order fold and DuckDB's
    * list_reduce walk the same sequence, so the doubles match bitwise.
    */
  def s07CentroidSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val fixed = Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("label"), col("dim"),
        floor(col("v").cast("double") * lit(FxScale.toDouble)).cast("long").as("fx"))
    val centroids = fixed
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("fx")).as("sfx"), count(lit(1)).as("n"))
      .select(col("label"), col("dim"),
        ((col("sfx").cast("double") / lit(FxScale.toDouble)) /
          col("n").cast("double")).as("cv"))
      .groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("dim"), col("cv")))).as("pairs"))
      .select(col("label"), expr("transform(pairs, x -> x.cv)").as("cvec"))
      .withColumn("nrm", sqrt(expr("graft_dot(cvec, cvec)")))
    val a = centroids.select(col("label").as("label_a"),
      col("cvec").as("va"), col("nrm").as("na"))
    val b = centroids.select(col("label").as("label_b"),
      col("cvec").as("vb"), col("nrm").as("nb"))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        (expr("graft_dot(va, vb)") / (col("na") * col("nb"))).as("cosine"))
      .orderBy(col("label_a").asc_nulls_last, col("label_b").asc_nulls_last)
  }

  val s07Sql: String =
    s"""WITH e AS (
       |  SELECT label, generate_subscripts(embedding, 1) AS dim,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $FxScale) AS BIGINT) AS fx
       |  FROM embeddings),
       |s AS (
       |  SELECT label, dim, CAST(sum(fx) AS BIGINT) AS sfx, count(*) AS n
       |  FROM e GROUP BY 1, 2),
       |c AS (
       |  SELECT label, dim,
       |    (CAST(sfx AS DOUBLE) / $FxScale) / CAST(n AS DOUBLE) AS cv
       |  FROM s),
       |vecs AS (
       |  SELECT label, list(cv ORDER BY dim ASC) AS cvec FROM c GROUP BY label),
       |n AS (
       |  SELECT label, cvec,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(cvec, x -> x * x)), (a, x) -> a + x)) AS nrm
       |  FROM vecs)
       |SELECT a.label AS label_a, b.label AS label_b,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(range(1, len(a.cvec) + 1), i -> a.cvec[i] * b.cvec[i])),
       |    (acc, x) -> acc + x) / (a.nrm * b.nrm) AS cosine
       |FROM n a JOIN n b ON a.label < b.label
       |ORDER BY label_a ASC NULLS LAST, label_b ASC NULLS LAST""".stripMargin

  /** s08: FILTERED exact kNN — retrieval under a metadata predicate
    * ("nearest neighbors with the same label as the query"), the
    * production RAG/search shape where a filter accompanies every
    * query. The filter is not a post-hoc row filter on a top-k result
    * (which under-fills k whenever the filter is selective — the
    * classic filtered-ANN correctness bug): it becomes the JOIN KEY.
    * Queries hash-join the corpus on `label`, so candidate generation
    * only ever touches rows that pass the predicate — the equi-join
    * form of pushing the filter into the index. Per-query selection
    * then runs on the native [[graft.plans.TopKPerKey]] operator
    * (bounded per-partition heaps, ≤ k rows per query per partition
    * shuffled) rather than a full window sort. At 100 TB the label is
    * the partition key of the filtered blocks; a selective filter
    * SHRINKS the work instead of starving the result, and k stays
    * exactly filled whenever the block has ≥ k members.
    */
  def s08FilteredKnn(spark: SparkSession, sfDir: String): DataFrame = {
    val e = prepared(spark, sfDir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("label"),
        col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("label"),
      col("v").as("cv"), col("nrm").as("cn"))
    val scored = broadcast(q).join(c, Seq("label"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine("qv", "cv", col("qn"), col("cn")))
      .select(col("query_id"), col("label"), col("neighbor_id"), col("cosine"))
    val top = graft.plans.TopKPerKey.topKPerKey(scored,
      keyCols = Seq(col("query_id")),
      orderCols = Seq(col("cosine").desc_nulls_last,
        col("neighbor_id").asc_nulls_last),
      k = K)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc_nulls_last, col("neighbor_id").asc_nulls_last)
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("label"), col("rank"), col("neighbor_id"),
        col("cosine"))
      .orderBy(col("query_id").asc_nulls_last, col("rank").asc_nulls_last)
  }

  val s08Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, label, v,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
       |  FROM e),
       |scored AS (
       |  SELECT q.vec_id AS query_id, q.label AS label, c.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])),
       |      (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cosine
       |  FROM n q JOIN n c ON q.label = c.label
       |  WHERE q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT query_id, label, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rank
       |  FROM scored)
       |SELECT query_id, label, rank, neighbor_id, cosine FROM ranked
       |WHERE rank <= $K
       |ORDER BY query_id ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin

  /** s09: ANN recall audit — retrieval quality as a QUERY, not just a
    * spec: per query vector, how many of the exact brute-force top-k
    * (s01, the truth) the banded-LSH index (s02) actually returned.
    * This is the recurring production audit any ANN deployment runs
    * after reindexing; both pipelines are deterministic, so the whole
    * audit is oracle-replayable end to end (the oracle embeds the s01
    * and s02 SQL as CTEs). Scale: both sides are query-set-sized
    * (bounded) after their own pipelines; the audit join is
    * (query, neighbor)-keyed over ≤ NQueries·k rows.
    */
  def s09AnnRecallAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val brute = s01KnnBrute(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
    val lsh = s02KnnLsh(spark, sfDir)
      .select(col("query_id").as("q2"), col("neighbor_id").as("n2"))
    brute.join(lsh,
        col("query_id") === col("q2") && col("neighbor_id") === col("n2"),
        "left")
      .groupBy(col("query_id"))
      .agg(sum(when(col("n2").isNotNull, 1).otherwise(0)).cast("long")
        .as("hits"))
      .select(col("query_id"), col("hits"),
        (col("hits").cast("double") / lit(K.toDouble)).as("recall_at_k"))
      .orderBy(col("query_id").asc_nulls_last)
  }

  val s09Sql: String =
    s"""WITH brute AS ($s01Sql),
       |lsh AS ($s02Sql)
       |SELECT b.query_id,
       |  CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS hits,
       |  CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS DOUBLE) / $K.0 AS recall_at_k
       |FROM brute b LEFT JOIN lsh l
       |  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
       |GROUP BY b.query_id
       |ORDER BY b.query_id ASC NULLS LAST""".stripMargin

  /** s10: bucket-diversified kNN — retrieval that returns at most ONE
    * neighbor per semantic cell (the 8-plane sign signature), then the
    * best K surviving cells per query. Plain top-k hands back
    * near-duplicates of the same best match; the per-cell cap is the
    * cheap declarative form of result diversification (the bucketed
    * complement of greedy MMR, whose sequential argmax is not a join).
    *
    * Scale shape: both selection levels run on the native TopKPerKey
    * operator — map-side bounded heaps, ≤ k rows per key per partition
    * ever shuffled — first keyed (query, cell) at k=1 (the dedup),
    * then (query) at k=K. Cells come from the same broadcast plane
    * family the ANN index uses; ties break on neighbor_id at both
    * levels, so the cascade is deterministic and oracle-replayable.
    */
  def s10DiversifiedKnn(spark: SparkSession, sfDir: String): DataFrame = {
    val e = prepared(spark, sfDir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.withColumn("cell", bandBucketExpr(col("v"), 0, 8))
      .select(col("vec_id").as("neighbor_id"), col("cell"),
        col("v").as("cv"), col("nrm").as("cn"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine("qv", "cv", col("qn"), col("cn")))
      .select(col("query_id"), col("cell"), col("neighbor_id"), col("cosine"))
    val cellBest = graft.plans.TopKPerKey.topKPerKey(scored,
      keyCols = Seq(col("query_id"), col("cell")),
      orderCols = Seq(col("cosine").desc_nulls_last,
        col("neighbor_id").asc_nulls_last),
      k = 1)
    val top = graft.plans.TopKPerKey.topKPerKey(cellBest,
      keyCols = Seq(col("query_id")),
      orderCols = Seq(col("cosine").desc_nulls_last,
        col("neighbor_id").asc_nulls_last),
      k = K)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc_nulls_last, col("neighbor_id").asc_nulls_last)
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("rank"), col("cell"), col("neighbor_id"),
        col("cosine"))
      .orderBy(col("query_id").asc_nulls_last, col("rank").asc_nulls_last)
  }

  val s10Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
       |  FROM e),
       |cells AS (
       |  SELECT vec_id, CAST(${bandSqlTerms(0, 8)} AS BIGINT) AS cell
       |  FROM n),
       |scored AS (
       |  SELECT q.vec_id AS query_id, cl.cell AS cell, c.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])),
       |      (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cosine
       |  FROM n q JOIN n c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id
       |  JOIN cells cl ON cl.vec_id = c.vec_id),
       |cellbest AS (
       |  SELECT query_id, cell, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id, cell
       |      ORDER BY cosine DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rn
       |  FROM scored),
       |ranked AS (
       |  SELECT query_id, cell, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rank
       |  FROM cellbest WHERE rn = 1)
       |SELECT query_id, rank, cell, neighbor_id, cosine FROM ranked
       |WHERE rank <= $K
       |ORDER BY query_id ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin

  private val s11Invocation = new java.util.concurrent.atomic.AtomicLong(0)

  /** s11: PERSISTED ANN serving — the production split the per-run
    * index builds of s02-s06 skip (VERDICT r10 next-round #5, marrying
    * the manifest log with the ANN path). The s03 IVF assignment
    * (vec_id, cell, v, nrm) is committed ONCE as a
    * [[graft.sinks.ManifestTable]] partitioned by cell, then
    * maintained INCREMENTALLY: a re-crawl batch (vec_id%10 == 3,
    * re-ingested under +100000 ids) is assigned against the same
    * broadcast codebook — batch-sized work — and `append`ed as an
    * O(batch) delta commit; no corpus row is re-read, re-assigned or
    * re-shuffled. Serving then reads the index back THROUGH the
    * manifest: the corpus side of the probe join is a pure parquet
    * scan of the committed cell files (PlanAuditSpec pins exactly one
    * embeddings.parquet scan in the serve plan — the query side), hash
    * cell-partitioned so each probe touches only its nprobe cells; the
    * bounded query set is broadcast. At 100 TB the index table is the
    * durable artifact a weekly pipeline owns (snapshot-isolated
    * commits, time-travel rollback, vacuum retention), and query
    * serving is scan + broadcast-hash-join work proportional to the
    * probed cells only.
    */
  def s11PersistedIvf(spark: SparkSession, sfDir: String,
      nprobe: Int = 2): DataFrame = {
    val table = graft.sinks.Sinks.sessionScratchPath(spark,
      "s11_ivf_" + sfDir.replaceAll("[^a-zA-Z0-9]", "_") +
        "_" + s11Invocation.incrementAndGet())
    val e = prepared(spark, sfDir)
    val cents = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    def assignedOf(src: DataFrame): DataFrame =
      ownCells(src, cents, Seq("v", "nrm")) // argmax agg, not a window
    // index build: one full-corpus commit...
    graft.sinks.ManifestTable.write(spark, assignedOf(e), table, Seq("cell"))
    // ...then the weekly re-crawl lands as an O(batch) delta append
    val fresh = e.filter(col("vec_id") % 10 === 3)
      .select((col("vec_id") + 100000L).as("vec_id"), col("v"), col("nrm"))
    graft.sinks.ManifestTable.append(spark, assignedOf(fresh), table,
      Seq("cell"))
    serveFromIndex(spark, sfDir, table, nprobe)
  }

  /** Serve top-k queries against a persisted IVF index table: query
    * vectors assign to their `nprobe` nearest cells (broadcast
    * codebook, query-sized work), then broadcast-join the index scan
    * on the cell key. Split out so the spec can pin the serve plan in
    * isolation — it must contain NO corpus-side assignment.
    */
  def serveFromIndex(spark: SparkSession, sfDir: String, table: String,
      nprobe: Int = 2): DataFrame = {
    val e = prepared(spark, sfDir)
    val cents = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    // cell arrives as a partition-dir value (int-inferred) — restore
    // the codebook's key type before joining
    val index = graft.sinks.ManifestTable.read(spark, table)
      .select(col("vec_id").as("neighbor_id"),
        col("cell").cast("long").as("cell"),
        col("v").as("cv2"), col("nrm").as("cn2"))
    val q = assignCells(e.filter(col("vec_id") < NQueries), cents)
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id").as("cell"),
        col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc_nulls_last, col("neighbor_id").asc_nulls_last)
    broadcast(q).join(index, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", expr("graft_dot(qv, cv2)") / (col("qn") * col("cn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine"), col("cell"))
      .orderBy(col("query_id").asc_nulls_last, col("rank").asc_nulls_last)
  }

  val s11Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
       |  FROM e),
       |cents AS (
       |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 100 = 0),
       |corpus AS (
       |  SELECT vec_id, v, nrm FROM n
       |  UNION ALL
       |  SELECT vec_id + 100000, v, nrm FROM n WHERE vec_id % 10 = 3),
       |scored_cells AS (
       |  SELECT c.vec_id, cents.cent_id, c.v, c.nrm,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(c.v) + 1), i -> c.v[i] * cents.cv[i])),
       |      (acc, x) -> acc + x) / (c.nrm * cents.cn) AS cscore
       |  FROM corpus c CROSS JOIN cents),
       |cells AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cscore DESC NULLS LAST, cent_id ASC NULLS LAST) AS crn
       |  FROM scored_cells),
       |assigned AS (
       |  SELECT vec_id, cent_id AS cell, v, nrm FROM cells WHERE crn = 1),
       |probed AS (
       |  SELECT vec_id, cent_id AS cell, v, nrm FROM cells
       |  WHERE crn <= 2 AND vec_id < $NQueries),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.cell,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])),
       |      (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cosine
       |  FROM probed q JOIN assigned c ON q.cell = c.cell
       |    AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine, cell,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, cosine, cell FROM ranked
       |WHERE rank <= $K
       |ORDER BY query_id ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin

  private val s12Invocation = new java.util.concurrent.atomic.AtomicLong(0)

  /** The (modulus-selector, id-offset) of the three incremental
    * re-crawl batches s12 drifts the index with.
    */
  private val DriftBatches = Seq((3, 100000L), (4, 200000L), (5, 300000L))

  /** s12: RECALL AUDIT OF A DRIFTED PERSISTED INDEX (VERDICT r11
    * next-round #7) — the production question s11 leaves open: after K
    * incremental appends assigned against the ORIGINAL codebook, is
    * the index still good, or has drift degraded retrieval? The index
    * is built once and grown by THREE O(batch) delta appends (the
    * corpus is never re-assigned); serving reads the 3-append-old
    * index through the manifest ([[serveFromIndex]] — same plan shape
    * PlanAuditSpec pins for s11); the TRUTH is the exhaustive
    * brute-force top-k over the SAME grown corpus (broadcast query
    * side + native TopKPerKey — map-side bounded heaps, never an
    * all-pairs shuffle). Per query: hits and recall@k, the number an
    * index-maintenance job alerts on (IvfSpec pins the fixture's
    * recall floor; the documented re-cluster trigger is recall
    * dropping below it — rebuild the codebook via [[kmeansCodebook]]
    * and recommit). Fully deterministic, so the whole audit is
    * oracle-replayable: the DuckDB twin rebuilds index, serve and
    * truth as CTEs and must hash-match.
    */
  def s12DriftedIndexRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val table = graft.sinks.Sinks.sessionScratchPath(spark,
      "s12_ivf_" + sfDir.replaceAll("[^a-zA-Z0-9]", "_") +
        "_" + s12Invocation.incrementAndGet())
    val e = prepared(spark, sfDir)
    val cents = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    def assignedOf(src: DataFrame): DataFrame =
      ownCells(src, cents, Seq("v", "nrm")) // argmax agg, not a window
    def batchOf(m: Int, off: Long): DataFrame =
      e.filter(col("vec_id") % 10 === m)
        .select((col("vec_id") + off).as("vec_id"), col("v"), col("nrm"))
    graft.sinks.ManifestTable.write(spark, assignedOf(e), table, Seq("cell"))
    DriftBatches.foreach { case (m, off) =>
      graft.sinks.ManifestTable.append(spark, assignedOf(batchOf(m, off)),
        table, Seq("cell")): Unit
    }
    val served = serveFromIndex(spark, sfDir, table, nprobe = 2)
      .select(col("query_id").as("q2"), col("neighbor_id").as("n2"))
    // exhaustive truth over the SAME grown corpus
    val grown = DriftBatches
      .map { case (m, off) => batchOf(m, off) }
      .foldLeft(e.select(col("vec_id"), col("v"), col("nrm")))(
        _.unionByName(_))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = broadcast(q)
      .join(grown, col("query_id") =!= col("vec_id"))
      .withColumn("cosine", expr("graft_dot(qv, v)") / (col("qn") * col("nrm")))
    val truth = graft.plans.TopKPerKey.topKPerKey(scored,
      keyCols = Seq(col("query_id")),
      orderCols = Seq(col("cosine").desc_nulls_last,
        col("vec_id").asc_nulls_last),
      k = K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    truth.join(served,
        col("query_id") === col("q2") && col("neighbor_id") === col("n2"),
        "left")
      .groupBy(col("query_id"))
      .agg(sum(when(col("n2").isNotNull, 1).otherwise(0)).cast("long")
        .as("hits"))
      .select(col("query_id"), col("hits"),
        (col("hits").cast("double") / lit(K.toDouble)).as("recall_at_k"))
      .orderBy(col("query_id").asc_nulls_last)
  }

  val s12Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
       |  FROM e),
       |cents AS (
       |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 100 = 0),
       |corpus AS (
       |  SELECT vec_id, v, nrm FROM n
       |  UNION ALL
       |  SELECT vec_id + 100000, v, nrm FROM n WHERE vec_id % 10 = 3
       |  UNION ALL
       |  SELECT vec_id + 200000, v, nrm FROM n WHERE vec_id % 10 = 4
       |  UNION ALL
       |  SELECT vec_id + 300000, v, nrm FROM n WHERE vec_id % 10 = 5),
       |scored_cells AS (
       |  SELECT c.vec_id, cents.cent_id, c.v, c.nrm,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(c.v) + 1), i -> c.v[i] * cents.cv[i])),
       |      (acc, x) -> acc + x) / (c.nrm * cents.cn) AS cscore
       |  FROM corpus c CROSS JOIN cents),
       |cells AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cscore DESC NULLS LAST, cent_id ASC NULLS LAST) AS crn
       |  FROM scored_cells),
       |assigned AS (
       |  SELECT vec_id, cent_id AS cell, v, nrm FROM cells WHERE crn = 1),
       |probed AS (
       |  SELECT vec_id, cent_id AS cell, v, nrm FROM cells
       |  WHERE crn <= 2 AND vec_id < $NQueries),
       |served_scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])),
       |      (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cosine
       |  FROM probed q JOIN assigned c ON q.cell = c.cell
       |    AND q.vec_id <> c.vec_id),
       |served AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rank
       |    FROM served_scored) WHERE rank <= $K),
       |truth_scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])),
       |      (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cosine
       |  FROM n q JOIN corpus c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
       |truth AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rank
       |    FROM truth_scored) WHERE rank <= $K)
       |SELECT t.query_id,
       |  CAST(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS hits,
       |  CAST(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS DOUBLE) / $K.0 AS recall_at_k
       |FROM truth t LEFT JOIN served s
       |  ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id
       |GROUP BY t.query_id
       |ORDER BY t.query_id ASC NULLS LAST""".stripMargin
}
