package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.HashParity

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the
  * MOSS algorithm): hash every k-gram, slide a window of `w`
  * consecutive k-gram hashes over each document, and select each
  * window's MINIMUM hash (rightmost occurrence on ties) as a
  * fingerprint. The guarantee the paper proves: any shared substring
  * of at least k + w - 1 tokens yields at least one shared
  * fingerprint, while only ~2/(w+1) of all k-grams are kept — a
  * position-aware third family beside MinHash (set-resemblance) and
  * SimHash (vector distance), the standard scheme for code/plagiarism
  * near-dup detection.
  *
  * Determinism and oracle parity: the k-gram hash is
  * [[HashParity.h28]] (first 7 md5 hex digits — the one hash both
  * engines share); the per-window argmin with the rightmost tie rule
  * is ONE integer `min` over a packed key
  * `h * 2^21 + (POS_MASK - pos)` — minimal h wins, ties resolve to
  * the larger pos — so the whole selection replays in DuckDB with the
  * same window frame and integer arithmetic, no struct ordering
  * required. Positions are capped at 2^20 grams per document
  * ([[PosCapGrams]]); h < 2^28 keeps the key under 2^49.
  *
  * Scale shape: token explode + two window passes per doc (the gram
  * count and the sliding min — both partition by doc id, no
  * cross-doc shuffle beyond the id hash), then candidate pairing is
  * an equi-join on fingerprint hash — bounded key domain, banded-
  * family multiplicity, never all-pairs.
  */
object Winnow {

  /** Position cap: documents beyond 2^20 k-grams would overflow the
    * packed key's position field; the fingerprint tail past the cap
    * contributes nothing (a 1M-gram prefix already fingerprints the
    * document densely). */
  val PosCapGrams: Long = 1L << 20
  private val PosMask: Long = PosCapGrams - 1L // 2^20 - 1
  private val Shift: Long = 1L << 21

  /** DISTINCT selected fingerprints per document: (id, fp) with
    * `fp` the winning 28-bit k-gram hash of at least one window.
    * Documents shorter than k tokens produce no rows. When a doc has
    * fewer than `w` grams, its single all-grams window still selects
    * one fingerprint (the paper's short-document convention). */
  def fingerprints(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val grams = graft.core.Par.widen(df)
      .select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("wd"))
      .filter(size(col("wd")) >= k)
      .select(col("id"), posexplode(expr(
        s"transform(sequence(0, size(wd) - $k), " +
          s"i -> array_join(slice(wd, i + 1, $k), ' '))")).as(Seq("p", "g")))
      .filter(col("p") < PosCapGrams)
      .select(col("id"), col("p"),
        (HashParity.h28(col("g")) * Shift + (lit(PosMask) - col("p")))
          .as("key"))
    val byPos = Window.partitionBy(col("id")).orderBy(col("p"))
    val wnd = byPos.rowsBetween(Window.currentRow, w - 1L)
    grams
      .withColumn("mk", min(col("key")).over(wnd))
      .withColumn("n_g", count(lit(1)).over(Window.partitionBy(col("id"))))
      // window STARTS only: every full window once, plus the single
      // short window of a doc with fewer than w grams
      .filter(col("p") <= greatest(col("n_g") - w, lit(0L)))
      .select(col("id"), expr(s"mk DIV $Shift").as("fp"))
      .distinct()
  }

  /** Candidate near-duplicate pairs: documents sharing at least
    * `minShared` selected fingerprints, with the shared count and an
    * integer-ppm overlap ratio `shared / min(|fp_a|, |fp_b|)`. */
  def pairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, w: Int = 4, minShared: Long = 2L): DataFrame = {
    val fp = graft.core.CacheScope.cache(
      fingerprints(df, textCol, idCol, k, w))
    val counts = fp.groupBy(col("id")).agg(count(lit(1)).as("nfp"))
    val shared = fp.join(
        fp.select(col("id").as("id_b"), col("fp")), Seq("fp"))
      .filter(col("id") < col("id_b"))
      .groupBy(col("id").as("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fp"))
      .filter(col("shared_fp") >= minShared)
    shared
      .join(counts.select(col("id").as("id_a"), col("nfp").as("nfp_a")), Seq("id_a"))
      .join(counts.select(col("id").as("id_b"), col("nfp").as("nfp_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("shared_fp"),
        col("nfp_a"), col("nfp_b"),
        expr("shared_fp * 1000000 DIV least(nfp_a, nfp_b)").as("overlap_ppm"))
  }
}
