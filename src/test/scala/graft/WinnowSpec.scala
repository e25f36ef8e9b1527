package graft

import graft.ops.Winnow
import graft.functions.HashParity

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side twin of the packed-key window selection — the
    * hand-auditable oracle for tiny docs. */
  private def brute(text: String, k: Int, w: Int): Set[Long] = {
    val wd = text.split(" ", -1)
    if (wd.length < k) return Set.empty
    val hs = (0 to wd.length - k)
      .map(i => HashParity.h28(wd.slice(i, i + k).mkString(" ")))
    val keys = hs.zipWithIndex.map { case (h, p) =>
      h * 2097152L + (1048575L - p) }
    val starts = 0 to math.max(keys.length - w, 0)
    starts.map(s => keys.slice(s, math.min(s + w, keys.length)).min / 2097152L)
      .toSet
  }

  test("selected fingerprints equal the brute-force window-min set") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y z"),             // exactly k grams? 3 tokens -> 1 gram
      (3L, "p q r s"),           // 2 grams < w: one short window
      (4L, ""),                  // empty: no rows
      (5L, "m n"))               // < k tokens: no rows
      .toDF("doc_id", "text")
    val got = Winnow.fingerprints(docs, "text", "doc_id")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    val want = Seq(
      1L -> brute("a b c d e f g h i j", 3, 4),
      2L -> brute("x y z", 3, 4),
      3L -> brute("p q r s", 3, 4))
      .filter(_._2.nonEmpty).toMap
    assert(got === want)
    assert(!got.contains(4L) && !got.contains(5L))
  }

  test("the winnowing guarantee: a shared run of k+w-1 tokens yields a shared fingerprint") {
    // two otherwise-unrelated docs share exactly a 6-token run
    // (k + w - 1 = 3 + 4 - 1 = 6): the paper guarantees at least one
    // common fingerprint, whatever the surrounding hashes do
    val run = "common tokens that both docs carry"
    val docs = Seq(
      (1L, s"alpha beta gamma $run delta epsilon"),
      (2L, s"one two three four $run five six seven"))
      .toDF("doc_id", "text")
    val fp = Winnow.fingerprints(docs, "text", "doc_id")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    assert((fp(1L) intersect fp(2L)).nonEmpty)
  }

  test("pairs: near-identical docs pair with high overlap; unrelated docs do not") {
    graft.core.CacheScope.withScope {
      val base = (1 to 30).map(i => s"tok$i").mkString(" ")
      val nearDup = base.replace("tok15", "changed")
      val docs = Seq(
        (1L, base), (2L, nearDup),
        (3L, (100 to 130).map(i => s"other$i").mkString(" ")))
        .toDF("doc_id", "text")
      val got = Winnow.pairs(docs, "text", "doc_id")
        .collect().map(r => (r.getLong(r.fieldIndex("id_a")),
          r.getLong(r.fieldIndex("id_b")),
          r.getLong(r.fieldIndex("overlap_ppm"))))
      assert(got.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)))
      assert(got.head._3 > 500000L) // well over half the fingerprints shared
    }
  }

  test("selection density is ~2/(w+1), never the full gram set") {
    val text = (1 to 400).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val n = Winnow.fingerprints(docs, "text", "doc_id", k = 3, w = 8).count()
    val grams = 400 - 3 + 1
    // expectation ~2/(w+1) = ~88 of 398; allow generous slack both ways
    assert(n > grams / 8 && n < grams / 2, s"selected $n of $grams")
  }
}
