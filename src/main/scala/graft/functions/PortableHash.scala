package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashing primitives that produce IDENTICAL values in Spark and
  * DuckDB, so hash-dependent operators (minhash, simhash,
  * fingerprints, LSH) can be verified by the SQL oracle.
  *
  * Base primitive: the first 8 hex chars of md5 parsed as a long in
  * [0, 2^32) — md5 is bit-identical everywhere; the arithmetic on top
  * (multiply-add mod a 31-bit prime) stays far below 2^63 so both
  * engines' int64 semantics agree (DuckDB errors on overflow rather
  * than wrapping, so headroom is part of the contract).
  */
object PortableHash {

  /** 31-bit prime modulus for all derived hash arithmetic. */
  val P: Long = 2147483647L // 2^31 - 1

  /** Rolling-hash base (fingerprints). */
  val B: Long = 131L

  /** 32-bit token hash: md5 → first 4 digest bytes → long. Native
    * codegen'd expression; value-identical to
    * `conv(substring(md5(c), 1, 8), 16, 10)`.
    */
  def tokenHash32(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Md5Hash32(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** DuckDB twin of [[tokenHash32]] over SQL expression `e`. */
  def tokenHash32Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 8)) AS BIGINT)"

  /** MinHash permutation parameters: a_i odd, < 2^30; b_i < P.
    * Deterministic (fixed multipliers, no RNG) so Scala and the SQL
    * literal arrays below are the same numbers by construction.
    */
  val MinhashK: Int = 16
  val A: IndexedSeq[Long] =
    (0 until MinhashK).map(i => ((2L * i + 1) * 1103515245L % 1073741789L) | 1L)
  val Bs: IndexedSeq[Long] =
    (0 until MinhashK).map(i => (i * 12345L + 6789L) * 2654435761L % P)

  /** SQL literal arrays for A and Bs (1-indexed access in DuckDB). */
  def aSqlList: String = A.mkString("[", ", ", "]")
  def bSqlList: String = Bs.mkString("[", ", ", "]")

  /** One minhash permutation applied to a 32-bit hash value column:
    * (a*h + b) mod P. a < 2^30, h < 2^32 ⇒ product < 2^62: safe.
    */
  def perm(i: Int)(h: Column): Column =
    (h * lit(A(i)) + lit(Bs(i))) % lit(P)
}
