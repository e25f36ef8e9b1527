package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocab-faithful subword tokenization: greedy longest-match
  * segmentation of text against a small vocabulary table — the
  * WordPiece/BPE-inference scheme every pretraining pipeline uses to
  * budget documents by REAL tokens instead of whitespace words
  * (whitespace counts drift 20-40% vs a trained vocabulary on
  * punctuation- or number-heavy prose).
  *
  * The tokenizer compiles the vocabulary into a single alternation
  * regex ordered longest-piece-first plus a one-char fallback. Both
  * Java regex and RE2 take the FIRST matching alternative at each
  * position, so ordering alternatives by descending length IS greedy
  * longest-match — and the same pattern string replays in the DuckDB
  * oracle (the [[TextAnalysis.BpeishPattern]] parity argument). The
  * scan is a pure codegen'd expression: no UDF, no shuffle,
  * embarrassingly parallel at any corpus size. The vocabulary is
  * bounded-small by construction (hundreds of pieces), so baking it
  * into the compiled pattern is the broadcast — every task holds the
  * whole table, exactly like a broadcast join of the merge table but
  * without the join. (At vocabularies of 50k+ pieces a trie-walking
  * custom Expression would beat the alternation scan; the pattern
  * compiles either way, the constant factor just grows.)
  *
  * Vocabulary learning is the offline, bounded half: candidates are
  * every prefix (length >= 2) of every pre-token — a prefix-closed
  * vocab is what greedy longest-match wants, since falling off a long
  * piece always lands on a shorter one — scored by merge savings
  * `count * (len - 1)` (characters saved over single-char tokens),
  * top-k by (score desc, piece). One explode + one aggregate + a
  * bounded top-k: the same shuffle budget as a word count.
  */
object Bpe {

  /** Letter pre-tokens with an optional leading space — the vocab
    * alphabet. Restricting learned pieces to this shape keeps the
    * compiled alternation free of regex metacharacters, so no
    * escaping scheme has to agree between Java regex and RE2. */
  val PreTokenPattern: String = " ?[A-Za-z]+"

  /** Learned vocabulary: (piece, n, score), top `k` prefix candidates
    * by merge savings, ties broken by piece. */
  def learnVocab(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val pre = df.select(
      explode(regexp_extract_all(col(textCol), lit(PreTokenPattern), lit(0)))
        .as("w"))
    val cand = pre
      .filter(length(col("w")) >= 2)
      .select(explode(transform(
        sequence(lit(2), length(col("w"))),
        i => col("w").substr(lit(1), i))).as("piece"))
    cand.groupBy(col("piece"))
      .agg(count(lit(1)).as("n"))
      .withColumn("score", (col("n") * (length(col("piece")) - 1)).cast("long"))
      .orderBy(col("score").desc, col("piece"))
      .limit(k)
  }

  /** Compile a vocabulary into the greedy longest-match pattern:
    * alternatives sorted by (length desc, piece), then a single-char
    * fallback — so segmentation always covers the whole string (the
    * byte-fallback of a real BPE vocab). Same-length alternatives
    * can't both match at one position, so the order is total. */
  def tokenPattern(pieces: Seq[String]): String = {
    require(pieces.nonEmpty, "empty vocabulary")
    require(pieces.forall(_.matches(PreTokenPattern)),
      s"vocab pieces must match $PreTokenPattern — metacharacter-free")
    pieces.sortBy(p => (-p.length, p)).mkString("|") + "|[\\s\\S]"
  }

  /** Token array under the vocab (greedy longest-match). */
  def tokens(c: Column, pieces: Seq[String]): Column =
    regexp_extract_all(c, lit(tokenPattern(pieces)), lit(0))

  /** Token count under the vocab — the Pack-budget / text-stats
    * currency. */
  def tokenCount(c: Column, pieces: Seq[String]): Column =
    regexp_count(c, lit(tokenPattern(pieces))).cast("long")

  /** Same count through the trie-walking native expression
    * ([[graft.functions.BpeExprs]]): O(matched length) per position
    * instead of O(alternatives tried) — the path to take once the
    * vocabulary outgrows a few hundred pieces. Result-identical to
    * [[tokenCount]] (property-pinned in BpeSpec), so the regex
    * oracle gates both. */
  def tokenCountFast(c: Column, pieces: Seq[String]): Column =
    graft.functions.BpeExprs.tokenCountFast(c, pieces)

  /** Checked-in vocabulary fixture: `learnVocab` over the sf0.01
    * documents corpus, k=160 (BpeSpec asserts the file matches the
    * operator's output bit-for-bit). A production pipeline would
    * swap in its tokenizer's real vocab table here. */
  lazy val fixtureVocab: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/bpe_vocab.txt")
    require(in != null, "bpe_vocab.txt missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toVector
    finally in.close()
  }

  lazy val fixturePattern: String = tokenPattern(fixtureVocab)
}
