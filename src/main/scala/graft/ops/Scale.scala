package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-handling techniques (SURVEY.md north-star "design every
  * operator for 100 TB"): salting for hot keys, plus the AQE knobs the
  * engine relies on at runtime.
  *
  * Salting splits each hot key into `nSalts` sub-keys so one executor
  * never owns a whole hot key's rows. For algebraic aggregates the
  * two-phase form (salted partial → final merge) is exactly
  * result-equivalent to the direct groupBy — which is what the oracle
  * asserts.
  */
object Scale {

  /** Two-phase salted aggregation: groupBy((key, salt)) partial sums,
    * then merge per key. The salt column is derived from a stable row
    * attribute (not rand()) so the plan stays deterministic.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      value: Column,
      saltSrc: Column,
      nSalts: Int): DataFrame = {
    val salted = df
      .withColumn("__salt", pmod(saltSrc, lit(nSalts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(value.cast(DecimalType(18, 4))).as("partial_sum"),
        count(lit(1)).as("partial_n"))
    salted.groupBy(col("k"))
      .agg(sum(col("partial_sum")).cast("double").as("total"),
        sum(col("partial_n")).as("n"))
  }

  /** q39: salted aggregation over the (skew-prone) returnflag key —
    * oracle is the plain GROUP BY, proving result-equivalence of the
    * two-phase salted plan.
    */
  def q39SaltedAgg(spark: SparkSession, sfDir: String): DataFrame =
    saltedAgg(Tables.lineitem(spark, sfDir), col("l_returnflag"),
      col("l_extendedprice"), saltSrc = col("l_orderkey"), nSalts = 16)
      .withColumnRenamed("k", "l_returnflag")
      .orderBy(col("l_returnflag").asc_nulls_last)

  val q39Sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin

  /** Salted join for a skewed fact key: the fact side gets a
    * deterministic salt, the (small) build side is replicated across
    * all salt values, and the join key becomes (key, salt). Result-
    * equivalent to the plain join; spreads one hot key over nSalts
    * tasks.
    */
  def saltedJoin(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      saltSrc: Column, nSalts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(saltSrc, lit(nSalts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(replicatedDim,
      saltedFact(factKey) === replicatedDim(dimKey) &&
        saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }

  /** q40: salted join lineitem ⋈ orders on the order key — oracle is
    * the plain equi join.
    */
  def q40SaltedJoin(spark: SparkSession, sfDir: String): DataFrame =
    saltedJoin(
      Tables.lineitem(spark, sfDir), "l_orderkey",
      Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderpriority")),
      "o_orderkey",
      saltSrc = col("l_linenumber"), nSalts = 4)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("qty"))
      .orderBy(col("o_orderpriority").asc_nulls_last)

  val q40Sql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin

  /** Grid-salted all-pairs self-join within blocks — the skew governor
    * for blocked pairwise operators (d04/d05). A plain
    * `a.join(b, blockCols).filter(id1 < id2)` sends one whole block to
    * ONE task, so a hot block at 100 TB means one executor owning a
    * quadratic pair expansion. Here each block is split into
    * `cells = clamp(ceil(blockRows / rowsPerCell), 1, maxCells)`
    * sub-blocks by a deterministic id hash, and the pair space becomes
    * a triangular grid of (ci, cj) cells, ci <= cj: the left side
    * replicates a row with salt s into cells (s, s..cells-1), the
    * right side into (0..s, s). Every unordered pair {u, v} lands in
    * exactly one cell — (min(su,sv), max(su,sv)); equal-salt cells see
    * both orderings, which the `ci < cj OR idL < idR` filter dedups —
    * so the RESULT SET is identical to the unsalted join while the max
    * per-task pair count drops by cells². Replication cost is
    * ~(cells+1)/2 per row, paid only by blocks over `rowsPerCell`.
    *
    * The per-block cell counts are a one-row-per-block aggregate,
    * broadcast to both sides (blocks are orders of magnitude fewer
    * than rows; this is the same shape as an AQE skew-stats exchange).
    *
    * Callers must canonicalize the emitted pair with least/greatest:
    * in a cross-salt cell the surviving orientation is salt-ordered,
    * not id-ordered.
    *
    * Contract: this is a SELF-join helper — `a` and `b` must be the
    * same row set under different column names (the block census is
    * computed from `a` and applied to both sides).
    */
  def gridSelfJoinPairs(
      a: DataFrame, b: DataFrame, blockCols: Seq[String],
      idLeft: String, idRight: String,
      rowsPerCell: Int, maxCells: Int = 16,
      maxCensusBlocks: Int = 1 << 20): DataFrame = {
    val sizesDf = a.groupBy(blockCols.map(col): _*).agg(count(lit(1)).as("__bn"))
    // stats-then-choose, the AQE pattern at the operator level: the
    // block census is a column-pruned scan + tiny agg, collected ONCE
    // at construction (one row per block — it has to fit the driver
    // anyway, since the grid path broadcasts it) and reused for both
    // the engage decision and the cell map, so the census scan never
    // runs twice. When no block exceeds the cap the plain join plan
    // (no Generate, no extra broadcast) is strictly better — measured
    // 2x on this corpus — so the grid engages only under real skew.
    //
    // The census itself is cardinality-guarded: collecting through
    // limit(cap + 1) bounds driver memory BY CONSTRUCTION (a
    // near-unique block key can't flood the driver — at most cap + 1
    // rows ever arrive), and when the limit is not hit the limited
    // collect IS the complete census, so the guard costs zero extra
    // jobs. Past the cap we fall back to the plain join: blocks
    // outnumbering cap mean block keys are fine-grained relative to
    // the corpus, which is the no-skew regime the plain branch is for
    // (and a census that big could not be broadcast anyway).
    val census = sizesDf.limit(maxCensusBlocks + 1).collect()
    val bnIdx = sizesDf.schema.fieldIndex("__bn")
    val censusOverflow = census.length > maxCensusBlocks
    val maxBlock =
      if (census.isEmpty) 0L
      else if (censusOverflow)
        // the census is too big to broadcast, but skew detection only
        // needs ONE scalar: max block size via a partial-aggregated
        // max — bounded driver memory no matter how many blocks exist
        sizesDf.agg(max(col("__bn"))).collect()(0).getLong(0)
      else census.iterator.map(_.getLong(bnIdx)).max
    if (censusOverflow || maxBlock <= rowsPerCell) {
      if (censusOverflow && maxBlock > rowsPerCell)
        // >maxCensusBlocks blocks AND a hot one among them: the grid
        // cannot engage (its cell map would not broadcast), so the
        // plain join runs with a known-skewed O(maxBlock²) pair blowup
        // on one key — surface it instead of failing silently; AQE
        // skew-join split is the remaining line of defense here
        org.slf4j.LoggerFactory.getLogger("graft.ops.Scale").warn(
          s"gridSelfJoinPairs: census overflowed ($maxCensusBlocks blocks) " +
            s"but a hot block of $maxBlock rows (> $rowsPerCell) exists — " +
            "falling back to the plain join UNDER SKEW; consider a finer " +
            "block key")
      a.join(b, blockCols).filter(col(idLeft) < col(idRight))
    } else {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
      def cellsFor(bn: Long): Int =
        math.min(math.max(math.ceil(bn.toDouble / rowsPerCell).toLong, 1L),
          maxCells.toLong).toInt
      val cellsSchema = StructType(
        sizesDf.schema.fields.patch(bnIdx, Nil, 1) :+
          StructField("__cells", IntegerType, nullable = false))
      val cellsRows = census.map { r =>
        Row.fromSeq(r.toSeq.patch(bnIdx, Nil, 1) :+ cellsFor(r.getLong(bnIdx)))
      }
      val cells = a.sparkSession.createDataFrame(
        java.util.Arrays.asList(cellsRows: _*), cellsSchema)
      val ac = a.join(broadcast(cells), blockCols)
        .withColumn("__ci", pmod(hash(col(idLeft)), col("__cells")))
        .withColumn("__cj", explode(sequence(col("__ci"), col("__cells") - 1)))
        .drop("__cells")
      val bc = b.join(broadcast(cells), blockCols)
        .withColumn("__cj", pmod(hash(col(idRight)), col("__cells")))
        .withColumn("__ci", explode(sequence(lit(0), col("__cj"))))
        .drop("__cells")
      ac.join(bc, blockCols ++ Seq("__ci", "__cj"))
        .filter(col("__ci") < col("__cj") || col(idLeft) < col(idRight))
        .drop("__ci", "__cj")
    }
  }
}
