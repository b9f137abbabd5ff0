package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.ingest.Ingest
import graft.ddl.Ddl
import graft.types.TypeMap
import graft.retry.Retry

/** Pure (no SparkSession) Tier-P semantics: sanitize/rename rules,
  * type maps, DDL strings, retry — SURVEY.md §5.2-5.3.
  */
class TierPSpec extends AnyFunSuite {

  /** Deterministic property harness (scalatestplus-scalacheck is not in
    * the offline cache; plain seeded randomness is equivalent here).
    */
  private def forAllStrings(n: Int = 500)(check: String => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    val alphabet = "aZ ?-/\\%()$._09абв"
    (0 until n).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(20))(alphabet(rnd.nextInt(alphabet.length))).mkString
      check(s)
    }
  }

  // --- cleanName: each replacement char of PostgresDatabase.py:109-118 ---
  test("cleanName lowercases") { assert(Ingest.cleanName("AbC") == "abc") }
  test("cleanName space→_") { assert(Ingest.cleanName("a b") == "a_b") }
  test("cleanName ?→removed") { assert(Ingest.cleanName("a?b") == "ab") }
  test("cleanName -→_") { assert(Ingest.cleanName("a-b") == "a_b") }
  test("cleanName /→_") { assert(Ingest.cleanName("a/b") == "a_b") }
  test("cleanName \\→_") { assert(Ingest.cleanName("a\\b") == "a_b") }
  test("cleanName %→removed") { assert(Ingest.cleanName("a%b") == "ab") }
  test("cleanName parens→removed") { assert(Ingest.cleanName("a(b)c") == "abc") }
  test("cleanName $→removed") { assert(Ingest.cleanName("a$b") == "ab") }
  test("cleanName full example") {
    assert(Ingest.cleanName("Doc ID? (new)/Old-%$") == "doc_id_new_old_")
  }

  test("cleanName is idempotent") {
    forAllStrings() { s =>
      val once = Ingest.cleanName(s)
      assert(Ingest.cleanName(once) == once)
    }
  }

  test("cleanName output contains no forbidden characters") {
    forAllStrings() { s =>
      val out = Ingest.cleanName(s)
      assert(!out.exists(c => " ?-/\\%()$".contains(c) || c.isUpper))
    }
  }

  test("defaultTableName = sanitized basename without extension") {
    assert(Ingest.defaultTableName("/tmp/Wild Reviews-2024.xlsx") == "wild_reviews_2024")
  }

  // --- TypeMap ---
  test("TypeMap canonical PG entries") {
    assert(TypeMap.toPostgres(DoubleType) == "double precision")
    assert(TypeMap.toPostgres(LongType) == "bigint")
    assert(TypeMap.toPostgres(StringType) == "varchar")
    assert(TypeMap.toPostgres(BooleanType) == "boolean")
    assert(TypeMap.toPostgres(TimestampType) == "timestamp")
    assert(TypeMap.toPostgres(ArrayType(FloatType)) == "varchar") // lossy fallback
  }

  test("TypeMap CH entries are all Nullable, bool→UInt8") {
    assert(TypeMap.toClickHouse(DoubleType) == "Nullable(Float64)")
    assert(TypeMap.toClickHouse(BooleanType) == "Nullable(UInt8)")
    assert(TypeMap.toClickHouse(MapType(StringType, LongType)) == "Nullable(String)")
  }

  test("TypeMap totality over atomic and nested types") {
    val all: Seq[DataType] = Seq(
      DoubleType, FloatType, LongType, IntegerType, ShortType, ByteType,
      BooleanType, StringType, TimestampType, DateType, BinaryType,
      DecimalType(10, 2), ArrayType(StringType), MapType(StringType, StringType),
      NullType, CalendarIntervalType, DayTimeIntervalType())
    all.foreach { dt =>
      assert(TypeMap.toPostgres(dt).nonEmpty)
      assert(TypeMap.toClickHouse(dt).startsWith("Nullable("))
    }
  }

  // --- DDL synthesis ---
  private val schema = StructType(Seq(
    StructField("author", StringType),
    StructField("n", LongType),
    StructField("ok", BooleanType)))

  test("PG DDL: destructive DROP then CREATE") {
    val Seq(drop, create) = Ddl.postgresCreate("test_t_re", schema)
    assert(drop == "DROP TABLE IF EXISTS test_t_re")
    assert(create == "CREATE TABLE test_t_re (author varchar, n bigint, ok boolean)")
  }

  test("PG load sequence ends with GRANT SELECT TO PUBLIC (PostgresDatabase.py:95)") {
    val stmts = Ddl.postgresLoadSequence("sch.test_t", schema)
    assert(stmts.size == 3)
    assert(stmts.head.startsWith("DROP TABLE IF EXISTS sch.test_t"))
    assert(stmts(1).startsWith("CREATE TABLE sch.test_t"))
    assert(stmts.last == "GRANT SELECT ON TABLE sch.test_t TO PUBLIC")
  }

  test("CH DDL: IF NOT EXISTS, MergeTree, ORDER BY tuple()") {
    val ddl = Ddl.clickHouseCreate("test_schema.t", schema)
    assert(ddl == "CREATE TABLE IF NOT EXISTS test_schema.t " +
      "(author Nullable(String), n Nullable(Int64), ok Nullable(UInt8)) " +
      "ENGINE = MergeTree ORDER BY tuple()")
  }

  test("CH DDL: engineParams used only for ReplicatedMergeTree") {
    val rep = Ddl.clickHouseCreate("t", schema, "ReplicatedMergeTree", Seq("'/ch/t'", "'r1'"))
    assert(rep.contains("ENGINE = ReplicatedMergeTree('/ch/t', 'r1')"))
    // reference drops params silently for other engines (ClickHouseDatabase.py:90)
    val plain = Ddl.clickHouseCreate("t", schema, "MergeTree", Seq("'/ch/t'", "'r1'"))
    assert(plain.contains("ENGINE = MergeTree ORDER BY"))
  }

  // --- Retry ---
  test("retry: succeeds without retrying") {
    var calls = 0
    val r = Retry.withRetry(3, 0L) { calls += 1; 42 }
    assert(r == 42 && calls == 1)
  }

  test("retry: retries then succeeds") {
    var calls = 0
    val r = Retry.withRetry(3, 0L) { calls += 1; if (calls < 3) sys.error("boom"); "ok" }
    assert(r == "ok" && calls == 3)
  }

  test("retry: logs one line per failed attempt") {
    val logged = scala.collection.mutable.Buffer[String]()
    intercept[RuntimeException] {
      Retry.withRetry(3, 0L, logged.append(_)) { sys.error("x") }
    }
    assert(logged.size == 3)
    assert(logged.head.startsWith("attempt 1/3"))
  }

  test("nullableAll forces every field nullable") {
    val s = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true)))
    assert(TypeMap.nullableAll(s).fields.forall(_.nullable))
  }

  test("clickHouseWriteCast: bool→byte, interval→string, else identity") {
    assert(TypeMap.clickHouseWriteCast(BooleanType) == ByteType)
    assert(TypeMap.clickHouseWriteCast(DayTimeIntervalType()) == StringType)
    assert(TypeMap.clickHouseWriteCast(DoubleType) == DoubleType)
  }

  test("retry: re-raises the last failure after exhaustion") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withRetry(3, 0L) { calls += 1; sys.error(s"fail$calls") }
    }
    assert(calls == 3 && e.getMessage == "fail3")
  }
}
