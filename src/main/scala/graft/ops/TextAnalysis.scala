package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.CacheScope.Scoped

/** Text-analysis operators for a training-data pipeline: token
  * counting, quality scoring, stopword-vote language ID, document
  * fingerprinting. All pure built-in expressions — codegen'd, no UDFs,
  * embarrassingly parallel at any scale.
  */
object TextAnalysis {

  /** Whitespace tokenizer (single-space delimiter, matching the
    * corpus format; swap the pattern for `\\s+` corpora). */
  def tokens(c: Column): Column = split(c, " ")

  /** BPE-ish pre-tokenizer segments: letter runs, digit runs, and
    * punctuation runs, each with an optional leading space, plus
    * stray space runs — the RE2-compatible core of the GPT-2
    * pre-tokenization pattern (contraction splits and the
    * trailing-space lookahead dropped so the same pattern replays in
    * the DuckDB oracle; Java regex and RE2 both take the FIRST
    * matching alternative, so the segmentation agrees). Counting
    * these segments approximates BPE token counts far better than
    * whitespace words on punctuation- or number-heavy text. */
  val BpeishPattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  def bpeishTokenCount(c: Column): Column =
    regexp_count(c, lit(BpeishPattern)).cast("long")

  /** Gopher-style repetition metrics, per doc: duplicate-word ratio
    * and the most frequent word bigram's share of all bigrams — the
    * standard filters for degenerate/boilerplate text. Defined over
    * docs with ≥ 2 tokens (a single token has no bigram).
    *
    * Scale shape: doc-level counts are per-row expressions; the
    * bigram mode needs one explode + one map-side-combined aggregate
    * on (doc, bigram) + a top-1 window on the slim count frame —
    * the same shuffle budget as the shingle index. All ratios are
    * single long/long IEEE divisions (oracle-exact). */
  def repetitionReport(
      df: org.apache.spark.sql.DataFrame,
      textCol: String, idCol: String,
      flagAt: Double = 0.1): org.apache.spark.sql.DataFrame = {
    val w = tokens(col(textCol))
    val base = graft.core.Par.widen(df)
      .select(col(idCol).as("id"), w.as("w"))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("w"))).cast("long"))
      .filter(col("n_tokens") >= 2)
    val bigrams = base.select(
      col("id"), col("n_tokens"), col("n_distinct"),
      explode(transform(sequence(lit(1), size(col("w")) - 1),
        i => concat_ws(" ",
          element_at(col("w"), i), element_at(col("w"), i + 1)))).as("g"))
    val counts = bigrams
      .groupBy(col("id"), col("n_tokens"), col("n_distinct"), col("g"))
      .agg(count(lit(1)).as("n"))
    // top bigram as an argmin AGGREGATE — min(struct(-n, g)) is the
    // old window's (n DESC, g ASC) order — so it partial-combines
    // map-side (each task ships one candidate bigram per doc) instead
    // of exchanging and sorting every (doc, bigram) count row under a
    // row_number window
    counts
      .groupBy(col("id"), col("n_tokens"), col("n_distinct"))
      .agg(min(struct((-col("n")).as("nn"), col("g"))).as("b"))
      .select(
        col("id"),
        col("n_tokens"),
        ((col("n_tokens") - col("n_distinct")) / col("n_tokens"))
          .as("dup_word_ratio"),
        col("b.g").as("top_bigram"),
        (-col("b.nn")).as("top_bigram_n"),
        (-col("b.nn") / (col("n_tokens") - 1)).as("top_bigram_frac"),
        (-col("b.nn") / (col("n_tokens") - 1) >= flagAt).cast("long")
          .as("repetitive"))
  }

  /** Tiny per-language stopword lists for the n-gram/stopword-vote
    * language-ID heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  /** Count of tokens (with multiplicity) present in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column = {
    val dict = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(dict, t))).cast("long")
  }

  /** Stopword-vote language ID: argmax of per-language hit counts,
    * ties broken by list order (en > de > es > fr). Input columns must
    * be the hit counts in [[langStopwords]] order. */
  def langIdFromScores(scores: Seq[Column]): Column = {
    require(scores.length == langStopwords.length)
    val names = langStopwords.map(_._1)
    names.indices.init.foldRight(lit(names.last): Column) { (i, rest) =>
      val winsAll = scores.drop(i + 1)
        .map(s => scores(i) >= s).reduce(_ && _)
      when(winsAll, names(i)).otherwise(rest)
    }
  }

  /** Quality metrics, all integer-derived with one final division:
    * token count, distinct-token ratio, mean token length, stopword
    * ratio (en). */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val nChars = length(text).cast("long")
    val tokChars = length(regexp_replace(text, " ", "")).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    val hits = stopwordHits(toks, langStopwords.head._2)
    Seq(
      "n_tokens" -> nTok,
      "n_chars_m" -> nChars,
      "n_distinct_tokens" -> nDistinct,
      "mean_token_len" -> (tokChars / nTok),
      "distinct_ratio" -> (nDistinct / nTok),
      "stopword_ratio" -> (hits / nTok))
  }

  /** Document fingerprints: content hash of the raw and normalized
    * text (md5 here for oracle parity; xxhash64 internally where
    * cross-engine comparison is not needed). */
  def fingerprintColumns(text: Column): Seq[(String, Column)] = Seq(
    "fp" -> md5(text),
    "fp_norm" -> md5(lower(text)))

  /** Top-k characteristic terms per document by tf-idf, with the
    * ratio idf variant `idf = N/df` (same per-document ranking as
    * `ln(N/df)` since ln is monotone and N is corpus-constant, but a
    * single IEEE division instead of a transcendental — `ln`
    * implementations differ in the last ulp across engines, which
    * would break the cross-engine hash check).
    *
    * Plan: explode -> tf aggregate; df derived FROM the tf frame (one
    * extra aggregate on (term) — no second pass over the corpus);
    * corpus size joined in as a broadcast one-row aggregate, not a
    * driver-side action; per-doc top-k via window. Three shuffles
    * total (tf, df, final rank), all on slim columns.
    */
  def tfidfTopTerms(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      k: Int = 5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = graft.core.Par.widen(df)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
    // the tf frame feeds two consumers (df aggregate + scoring join)
    val tf = tok.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf")).scopedCache()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count_distinct(col(idCol)).as("n_docs"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * (col("n_docs").cast("double") / col("df")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id").as("doc_id"), col("rank"), col("term"),
        col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }
}
