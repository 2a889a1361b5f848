package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Cross-engine deterministic hashing built on md5 hex prefixes.
  *
  * The DuckDB oracle has no xxhash64, so every hash that participates
  * in an oracle-checked result is derived from md5 (identical in both
  * engines): take the first 8 (or 4) hex chars, parse as an integer.
  * 32-bit values are plenty for minhash/simhash demo fidelity; the
  * non-oracled scale path can switch to xxhash64 (codegen'd, no string
  * materialization) without changing semantics.
  */
object DeterministicHash {
  /** 32-bit hash of `seed:value` — Spark side of DuckDB's
    * ('0x' || substr(md5(seed || ':' || v), 1, 8))::BIGINT.
    */
  def h32(seed: Int, c: Column): Column =
    conv(substring(md5(concat(lit(s"$seed:"), c)), 1, 8), 16, 10).cast(LongType)

  /** SQL fragment for the same value in DuckDB. */
  def sqlH32(seed: Int, e: String): String =
    s"('0x' || substr(md5('$seed:' || $e), 1, 8))::BIGINT"

  /** 16-bit token hash (simhash bit source). */
  def h16expr(tok: String): String =
    s"cast(conv(substring(md5($tok), 1, 4), 16, 10) as bigint)"

  def sqlH16(tok: String): String =
    s"('0x' || substr(md5($tok), 1, 4))::BIGINT"

  /** Driver-side copy of h32 for generating deterministic constants
    * (e.g. LSH hyperplanes) without any RNG: same md5-prefix formula.
    */
  def h32Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }
}
