package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing built on md5 — the one hash both
  * Spark and DuckDB expose with identical bytes. Hash-based operators
  * (MinHash, SimHash, sign-LSH, stub media decode, seeded shuffle)
  * derive all pseudo-randomness from these primitives so the driver's
  * DuckDB oracle can replay them exactly:
  *
  *  - Spark:  `conv(substring(md5(x), 1, 7), 16, 10)`
  *  - DuckDB: `CAST('0x' || substr(md5(x), 1, 7) AS BIGINT)`
  *  - Scala (driver-side constants): [[md5Hex]] + `Long.parseLong(_, 16)`
  *
  * Widths are chosen so downstream arithmetic never overflows a signed
  * 64-bit long (the only integer type shared by all three systems):
  * 28-bit values survive multiplication by 31-bit constants; 60-bit
  * values survive bit tests and shifts.
  */
object HashParity {

  /** 28-bit column hash: first 7 hex chars of md5. */
  def h28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** 60-bit column hash: first 15 hex chars of md5. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Driver-side md5 hex, byte-identical to Spark/DuckDB `md5`. */
  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  def md5Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map(x => f"$x%02x").mkString

  /** Driver-side 28-bit string hash (= [[h28]] of a literal). */
  def h28(s: String): Long = java.lang.Long.parseLong(md5Hex(s).take(7), 16)

  /** MinHash modulus: 2^31 - 1 (Mersenne prime). With 28-bit shingle
    * hashes and 31-bit affine params, a*h + b < 2^60. */
  val MinhashP: Long = 2147483647L

  /** Affine permutation params for MinHash slot `i`, rebuildable in SQL
    * as `1 + CAST('0x' || substr(md5('a' || i), 1, 7) AS BIGINT)` etc. */
  def minhashA(i: Int): Long = 1L + h28(s"a$i")
  def minhashB(i: Int): Long = h28(s"b$i")
}
