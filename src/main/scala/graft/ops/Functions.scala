package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar-function surface (SURVEY.md §2.2: string, date/time, math,
  * conditional, array, map, JSON). Every function used here is a
  * built-in Catalyst expression — whole-stage-codegen'd, no UDFs —
  * and each has a DuckDB twin with identical semantics (functions
  * whose results are implementation-defined across engines, e.g.
  * ln/exp last-ulp or locale collation, are deliberately excluded
  * from the oracle surface).
  */
object Functions {

  /** String functions over part names. */
  def q30StringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir).select(
      col("p_partkey"),
      lower(col("p_name")).as("lo"),
      upper(col("p_brand")).as("up"),
      length(col("p_name")).as("len"),
      substring(col("p_name"), 1, 5).as("sub"),
      trim(col("p_name")).as("trimmed"),
      regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
      concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
      lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
      reverse(col("p_brand")).as("rev"),
      instr(col("p_name"), "a").as("first_a"),
      split(col("p_name"), " ").getItem(0).as("first_word"),
      translate(col("p_brand"), "#", "-").as("trans"),
      col("p_name").startsWith("a").as("starts_a"),
      col("p_name").contains("steel").as("has_steel"))
    .orderBy(col("p_partkey").asc_nulls_last)

  val q30Sql: String =
    """SELECT p_partkey,
      |  lower(p_name) AS lo, upper(p_brand) AS up, length(p_name) AS len,
      |  substr(p_name, 1, 5) AS sub, trim(p_name) AS trimmed,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  concat_ws('|', p_brand, p_type) AS joined,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
      |  reverse(p_brand) AS rev,
      |  strpos(p_name, 'a') AS first_a,
      |  string_split(p_name, ' ')[1] AS first_word,
      |  replace(p_brand, '#', '-') AS trans,
      |  starts_with(p_name, 'a') AS starts_a,
      |  contains(p_name, 'steel') AS has_steel
      |FROM part ORDER BY p_partkey ASC NULLS LAST""".stripMargin

  /** Date/time functions over order dates. */
  def q31DateFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      dayofmonth(col("o_orderdate")).as("dom"),
      quarter(col("o_orderdate")).as("qtr"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      last_day(col("o_orderdate")).as("month_end"),
      datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"),
      date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"),
      date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
    .orderBy(col("o_orderkey").asc_nulls_last)

  val q31Sql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
      |  CAST(day(o_orderdate) AS INT) AS dom, CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
      |  datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
      |  CAST(o_orderdate AS DATE) + 30 AS plus30,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
      |  strftime(o_orderdate, '%Y-%m') AS ym
      |FROM orders ORDER BY o_orderkey ASC NULLS LAST""".stripMargin

  /** Math functions over prices — restricted to exactly-rounded ops
    * (abs/round/floor/ceil/sqrt/sign/mod/greatest/least) so results are
    * bit-identical across engines; transcendentals (ln/exp/pow) are
    * implementation-defined in the last ulp and excluded by design.
    */
  def q32MathFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_extendedprice") - lit(50000.0)).as("absdev"),
      round(col("l_extendedprice"), -2).as("rounded100"),
      floor(col("l_quantity") / 7.0).cast("long").as("floored"),
      ceil(col("l_quantity") / 7.0).cast("long").as("ceiled"),
      sqrt(col("l_extendedprice")).as("rt"),
      signum(col("l_discount") - 0.05).as("sgn"),
      pmod(col("l_orderkey"), lit(97L)).as("m97"),
      greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
      least(col("l_tax"), col("l_discount")).as("ls"))
    .orderBy(col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last)

  val q32Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_extendedprice - 50000.0) AS absdev,
      |  round(l_extendedprice, -2) AS rounded100,
      |  CAST(floor(l_quantity / 7.0) AS BIGINT) AS floored,
      |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceiled,
      |  sqrt(l_extendedprice) AS rt,
      |  CAST(CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS sgn,
      |  l_orderkey % 97 AS m97,
      |  greatest(l_quantity, l_discount * 100) AS gr,
      |  least(l_tax, l_discount) AS ls
      |FROM lineitem ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST""".stripMargin

  /** Conditional logic: CASE WHEN buckets + conditional aggregation. */
  def q33CaseWhen(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .withColumn("bucket",
        when(col("o_totalprice") < 100000.0, "small")
          .when(col("o_totalprice") < 250000.0, "medium")
          .otherwise("large"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L)).as("n_urgent"))
      .orderBy(col("bucket").asc_nulls_last)

  val q33Sql: String =
    """SELECT CASE WHEN o_totalprice < 100000.0 THEN 'small'
      |            WHEN o_totalprice < 250000.0 THEN 'medium'
      |            ELSE 'large' END AS bucket,
      |  count(*) AS n,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(sum(CASE WHEN starts_with(o_orderpriority, '1') THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
      |FROM orders GROUP BY 1 ORDER BY bucket ASC NULLS LAST""".stripMargin

  /** Array functions over the embedding vectors: size, element access,
    * slicing, min/max, and an exact float sum via higher-order
    * `aggregate` (elements cast to double before the left fold so both
    * engines accumulate identically). The slice is projected back to
    * scalar float columns at the comparison surface — the driver's
    * checker cannot sort list-typed columns — so `slice` stays
    * exercised while the output is scalar-only.
    */
  def q34ArrayFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .withColumn("head4", slice(col("embedding"), 1, 4))
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first"),
        element_at(col("embedding"), -1).as("last"),
        array_max(col("embedding")).as("mx"),
        array_min(col("embedding")).as("mn"),
        aggregate(transform(col("embedding"), x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("vsum"),
        element_at(col("head4"), 1).as("h1"),
        element_at(col("head4"), 2).as("h2"),
        element_at(col("head4"), 3).as("h3"),
        element_at(col("head4"), 4).as("h4"))
      .orderBy(col("vec_id").asc_nulls_last)

  val q34Sql: String =
    """SELECT vec_id,
      |  len(embedding) AS dim,
      |  embedding[1] AS first,
      |  embedding[-1] AS last,
      |  list_max(embedding) AS mx,
      |  list_min(embedding) AS mn,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding, x -> CAST(x AS DOUBLE))), (acc, x) -> acc + x) AS vsum,
      |  embedding[1:4][1] AS h1, embedding[1:4][2] AS h2,
      |  embedding[1:4][3] AS h3, embedding[1:4][4] AS h4
      |FROM embeddings ORDER BY vec_id ASC NULLS LAST""".stripMargin

  /** Array functions, second batch: construction, membership,
    * position, flatten, reverse, concat — over token arrays derived
    * from document text. Array-typed results are `array_join`-
    * serialized in the final projection (driver's checker can't sort
    * list columns); the array ops themselves still run.
    */
  def q46ArrayFuncs2(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        array_contains(col("toks"), "the").as("has_the"),
        array_position(col("toks"), "data").cast("long").as("pos_data"),
        size(array_remove(col("toks"), "a")).as("n_no_a"),
        array_join(reverse(slice(col("toks"), 1, 3)), "|").as("head3_rev"),
        array_join(flatten(array(slice(col("toks"), 1, 2), slice(col("toks"), 3, 2))), "|").as("head4"),
        array_join(concat(slice(col("toks"), 1, 1), array(lit("END"))), "|").as("first_plus"))
      .orderBy(col("doc_id").asc_nulls_last)

  val q46Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  list_contains(toks, 'the') AS has_the,
      |  CAST(coalesce(list_position(toks, 'data'), 0) AS BIGINT) AS pos_data,
      |  len(list_filter(toks, x -> x <> 'a')) AS n_no_a,
      |  list_aggregate(list_reverse(toks[1:3]), 'string_agg', '|') AS head3_rev,
      |  list_aggregate(flatten([toks[1:2], toks[3:4]]), 'string_agg', '|') AS head4,
      |  list_aggregate(list_concat(toks[1:1], ['END']), 'string_agg', '|') AS first_plus
      |FROM t ORDER BY doc_id ASC NULLS LAST""".stripMargin

  /** Map functions: construct a map from arrays, then key lookups and
    * key/value extraction.
    */
  def q35MapFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .withColumn("m", map_from_arrays(
        array(lit("qty"), lit("price")),
        array(col("l_quantity"), col("l_extendedprice"))))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        element_at(col("m"), "qty").as("qty"),
        element_at(col("m"), "price").as("price"),
        array_join(map_keys(col("m")), "|").as("ks"),
        size(col("m")).as("m_size"))
      .orderBy(col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last)

  val q35Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_quantity AS qty, l_extendedprice AS price,
      |  'qty|price' AS ks, 2 AS m_size
      |FROM lineitem ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST""".stripMargin

  /** Null-handling surface: nullif/coalesce/nvl2, null-aware
    * aggregation, and na.fill/na.drop equivalents. The fixtures carry
    * no nulls, so nulls are INTRODUCED deterministically
    * (`nullif(l_discount, 0.0)`) and then handled — which also pins
    * Spark's null-skipping aggregate semantics against DuckDB's.
    */
  def q42NullHandling(spark: SparkSession, sfDir: String): DataFrame = {
    val withNulls = Tables.lineitem(spark, sfDir)
      .withColumn("disc_n", nullif(col("l_discount"), lit(0.0)))
    withNulls
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("disc_n")).as("n_nonnull"),
        sum(when(col("disc_n").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(coalesce(col("disc_n"), lit(0.0)).cast(DecimalType(18, 4)))
          .cast("double").as("sum_filled"),
        sum(col("disc_n").cast(DecimalType(18, 4))).cast("double").as("sum_skipnull"),
        max(nvl2(col("disc_n"), lit("has"), lit("none"))).as("nvl2_max"))
      .orderBy(col("l_returnflag").asc_nulls_last)
  }

  val q42Sql: String =
    """SELECT l_returnflag,
      |  count(*) AS n_rows,
      |  count(nullif(l_discount, 0.0)) AS n_nonnull,
      |  CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  CAST(sum(CAST(coalesce(nullif(l_discount, 0.0), 0.0) AS DECIMAL(18,4))) AS DOUBLE) AS sum_filled,
      |  CAST(sum(CAST(nullif(l_discount, 0.0) AS DECIMAL(18,4))) AS DOUBLE) AS sum_skipnull,
      |  max(CASE WHEN nullif(l_discount, 0.0) IS NOT NULL THEN 'has' ELSE 'none' END) AS nvl2_max
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin

  /** Generator (UDTF-class) operators: posexplode over a derived
    * array and stack for columns→rows unpivot — Spark's lateral-view
    * surface. The oracle replays them with UNNEST-with-index and
    * UNION ALL (identical row sets).
    */
  def q41Generators(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        posexplode(split(col("p_type"), " ")).as(Seq("pos", "word")))
      .unionByName(
        Tables.part(spark, sfDir).select(col("p_partkey"),
          expr("stack(2, -1, p_brand, -2, p_name)").as(Seq("pos", "word"))))
      .orderBy(col("p_partkey").asc_nulls_last, col("pos").asc_nulls_last,
        col("word").asc_nulls_last)

  val q41Sql: String =
    """SELECT p_partkey, pos, word FROM (
      |  SELECT p_partkey, CAST(s.i - 1 AS INT) AS pos, s.w AS word FROM (
      |    SELECT p_partkey,
      |      unnest(list_transform(string_split(p_type, ' '), (w, i) -> {'w': w, 'i': i})) AS s
      |    FROM part)
      |  UNION ALL SELECT p_partkey, -1, p_brand FROM part
      |  UNION ALL SELECT p_partkey, -2, p_name FROM part)
      |ORDER BY p_partkey ASC NULLS LAST, pos ASC NULLS LAST, word ASC NULLS LAST""".stripMargin

  /** JSON extraction from the events `props` column. */
  def q36JsonFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k_val"),
      schema_of_json(lit("""{"k": 1}""")).as("schema_sample"))
    .withColumn("k_bucket", (col("k_val") % 10).cast("long"))
    .orderBy(col("event_id").asc_nulls_last)

  val q36Sql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
      |  'STRUCT<k: BIGINT>' AS schema_sample,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
      |FROM events ORDER BY event_id ASC NULLS LAST""".stripMargin
}
