package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable hashing primitives. Built on md5 rather than engine-native hash
  * functions so results are reproducible across engines and Spark versions —
  * the dedup family's bucket assignments must be stable across reruns of a
  * 100 TB pipeline (native `hash()` is version/implementation-defined).
  * All functions are codegen-friendly built-ins underneath.
  */
object Hashing {

  /** 60-bit non-negative hash: first 15 hex chars of md5 parsed base-16. */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** [[hash64]] as a Spark-SQL fragment, for use inside HOF lambda strings
    * where Column composition can't reach (e.g. Text.spanHashes). Keep in
    * lockstep with [[hash64]]; the DuckDB twin is `Q.hash64Sql`. */
  def hash64Expr(e: String): String =
    s"CAST(conv(substring(md5($e), 1, 15), 16, 10) AS BIGINT)"

  def hash64Seeded(seed: Int, c: Column): Column =
    hash64(concat(lit(s"$seed:"), c))

  /** Driver-side twin of [[hash64]] — same value for the same string, used
    * to precompute constants (e.g. LSH hyperplanes) embedded as literals. */
  def hash64Local(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Order-dependent polynomial rolling hash over a string-array column
    * (document fingerprinting that IS word-order sensitive, complementing
    * the order-insensitive sorted-set md5). Folds (acc*31 + h(t)) mod p with
    * operands kept small enough to never overflow a long. */
  def rollingHash(tokens: Column): Column = {
    val p = 2147483647L // 2^31 - 1
    aggregate(tokens, lit(0L),
      (acc, t) => (acc * 31L % p + pmod(hash64(t), lit(p))) % p)
  }
}
