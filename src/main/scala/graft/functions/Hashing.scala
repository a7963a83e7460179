package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing.
  *
  * Spark's native hash functions (murmur3/xxhash64) have no DuckDB
  * counterpart, so every operator that must be oracle-checkable derives
  * integers from md5 hex — identical bytes → identical hex → identical
  * 60-bit value in both engines. On a pure-Spark deployment these could be
  * swapped for xxhash64 with no semantic change.
  */
object Hashing {
  /** Large prime modulus for permutation hashing. */
  val P: Long = 1000000007L

  /** First 15 md5 hex chars as a non-negative 60-bit long.
    * DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** h60 reduced mod P — safe to multiply by coefficients < P in 64 bits. */
  def h60p(c: Column): Column = h60(c) % P

  /** SQL fragment for the oracle side of [[h60p]]. */
  def h60pSql(expr: String): String =
    s"(('0x'||substr(md5($expr),1,15))::BIGINT % $P)"

  /** i-th MinHash permutation of a pre-reduced hash value:
    * (a_i * h + b_i) mod P with deterministic odd coefficients. */
  def perm(i: Int, h: Column): Column =
    (lit(permA(i)) * h + lit(permB(i))) % P

  def permA(i: Int): Long = 2L * i + 3L
  def permB(i: Int): Long = 1000003L * (i + 1)

  def permSql(i: Int, hExpr: String): String =
    s"((${permA(i)} * $hExpr + ${permB(i)}) % $P)"
}
