package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing, expressed with codegen'd built-ins.
  *
  * Spark's `hash()`/`xxhash64()` are Spark-specific; everything here is
  * defined over standard md5 hex so DuckDB oracles can reproduce results
  * bit-for-bit: md5num(x) = first 15 hex digits of md5 as int64 (60 bits),
  * DuckDB equivalent `('0x' || substring(md5(x),1,15))::BIGINT`.
  */
object Portable {

  /** 60-bit integer hash from md5 — collision-safe for dedup keys. */
  def md5num(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Scala-side md5num — bit-identical to the Column form (and to the
    * DuckDB oracle expression), for row-logic closures that need the same
    * hash (e.g. cluster assignment inside mapPartitions).
    */
  def md5numScala(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** 30-bit hash: md5num mod a prime, small enough that a*h+b stays in int64
    * for the MinHash permutation family.
    */
  def h30(c: Column): Column = md5num(c) % lit(1000000007L)

  /** MinHash permutation i of a 30-bit hash: (a_i*h + b_i) mod p with a
    * fixed deterministic coefficient family (a_i < 2^20 ⇒ product < 2^50).
    */
  def permute(h: Column, i: Column): Column =
    (h * (lit(37L) + i * lit(101L)) + (lit(17L) + i * lit(257L))) % lit(1000000007L)
}
