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

  /** Token ARRAY through the trie — result-identical to [[tokens]]
    * (property-pinned in BpeSpec) but vocabulary-size-independent,
    * for subword-level statistics at the production vocab scale. */
  def tokensFast(c: Column, pieces: Seq[String]): Column =
    graft.functions.BpeExprs.tokenizeFast(c, pieces)

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

  // ---- merge-ranked (true) BPE -------------------------------------------

  /** Learn an ordered merge list — the Sennrich et al. (ACL 2016)
    * byte-pair-encoding construction: start from single characters,
    * repeatedly merge the most frequent adjacent symbol pair (count
    * weighted by word frequency, overlapping occurrences counted as
    * written in the reference implementation), stop after `nMerges`
    * rules or when no pair occurs twice. Ties break deterministically
    * by (pair count desc, first symbol asc, second symbol asc).
    *
    * Scale shape: the distributed work is ONE aggregate — the
    * (pre-token, count) table, the classical sufficient statistic for
    * BPE training (every published trainer runs its merge loop over
    * exactly this table in memory). The loop itself is driver-side
    * over that bounded table; `maxWords` is a LOUD bound — exceeding
    * it throws rather than silently truncating the statistic. */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 1 << 20): Seq[(String, String)] = {
    // no orderBy: the bound is a LOUD limit (we throw when exceeded,
    // never truncate), pair counting sums over all rows, and the
    // winner is picked by a deterministic minBy — so collecting the
    // table unordered skips a full global sort of the word table
    val rows = df.select(
        explode(regexp_extract_all(col(textCol), lit(PreTokenPattern), lit(0)))
          .as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .limit(maxWords + 1)
      .collect()
    require(rows.length <= maxWords,
      s"distinct pre-tokens exceed maxWords=$maxWords; raise the bound " +
        "(the merge loop is driver-side over the distinct-word table)")
    mergeLoop(
      rows.map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1))),
      nMerges)
  }

  /** The Sennrich merge loop over an in-memory (symbols, count) word
    * table — shared by the letter-level and byte-level learners (the
    * two differ only in pre-tokenization and base alphabet). */
  private def mergeLoop(words0: Array[(Array[String], Long)],
      nMerges: Int): Seq[(String, String)] = {
    var words = words0
    val out = Vector.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      val best = counts.filter(_._2 >= 2)
      if (best.isEmpty) exhausted = true
      else {
        val (pair, _) = best.minBy { case ((a, b), n) => (-n, a, b) }
        out += pair
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val nb = Array.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 &&
                  syms(j) == pair._1 && syms(j + 1) == pair._2) {
                nb += pair._1 + pair._2
                j += 2
              } else {
                nb += syms(j)
                j += 1
              }
            }
            (nb.result(), n)
          }
        }
        k += 1
      }
    }
    out.result()
  }

  // ---- distributed merge learning ----------------------------------------

  /** [[learnMerges]] WITHOUT the driver-side word table: removes the
    * `maxWords` ceiling for corpora whose distinct-pre-token count
    * exceeds driver memory. Each round runs ONE distributed aggregate:
    * the distinct-word table (cached once, the only corpus pass) is
    * re-segmented under the merges learned so far THROUGH THE CODEGEN'D
    * INFERENCE EXPRESSION — so every round's plan is the same
    * constant-depth scan→explode→agg over the cached table (no
    * iterative lineage growth, nothing to checkpoint), adjacent-pair
    * counts combine map-side, and only the top-1 (count DESC, pair ASC)
    * row ever reaches the driver. Re-segmentation is sound because
    * min-rank inference under rules 0..k-1 reproduces the training
    * state after k rounds (a valid merge list creates a symbol before
    * any later rule consumes it — the same fixpoint argument the
    * oracle replay rests on, and BpeDistributedSpec pins exact parity
    * with the driver loop).
    *
    * Cost shape: `nMerges` sequential small jobs — the price of exact
    * Sennrich order at unbounded scale. The per-executor word memo in
    * the inference expression makes round k's re-segmentation touch
    * only cached arrays plus one new merge's worth of work. */
  def learnMergesDistributed(df: DataFrame, textCol: String,
      nMerges: Int): Seq[(String, String)] =
    learnDistributedCore(
      df.select(
          explode(regexp_extract_all(col(textCol), lit(PreTokenPattern),
            lit(0))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n")),
      merges => (c: Column) =>
        graft.functions.MergeExprs.mergeTokenize(c, merges),
      nMerges)

  /** [[learnMergesByteLevel]] without the driver bound — the
    * byte-level twin of [[learnMergesDistributed]] (GPT-2 pre-tokens,
    * byte symbols via the inference expression's own encoder). */
  def learnMergesByteLevelDistributed(df: DataFrame, textCol: String,
      nMerges: Int): Seq[(String, String)] =
    learnDistributedCore(
      df.select(
          explode(regexp_extract_all(col(textCol), lit(ByteLevel.Gpt2Pattern),
            lit(0))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n")),
      merges => (c: Column) =>
        graft.functions.ByteBpeExprs.byteTokenize(c, merges),
      nMerges)

  /** Shared distributed round loop over a `(w, n)` word table. The
    * `segmenter` must satisfy the pre-token closure property (a
    * pre-token re-pre-tokenizes to itself), which both inference
    * expressions do by construction of their regexes. */
  private def learnDistributedCore(
      wordTable: DataFrame,
      segmenter: Seq[(String, String)] => Column => Column,
      nMerges: Int): Seq[(String, String)] = {
    val words = wordTable.cache()
    try {
      val out = Vector.newBuilder[(String, String)]
      var current = Vector.empty[(String, String)]
      var k = 0
      var exhausted = false
      while (k < nMerges && !exhausted) {
        val toks = segmenter(current)(col("w"))
        val best = words
          .select(toks.as("toks"), col("n"))
          .filter(size(col("toks")) >= 2)
          .select(explode(transform(
            sequence(lit(1), size(col("toks")) - 1),
            i => struct(
              element_at(col("toks"), i).as("a"),
              element_at(col("toks"), i + 1).as("b")))).as("p"), col("n"))
          .groupBy(col("p.a"), col("p.b"))
          .agg(sum(col("n")).as("cnt"))
          .filter(col("cnt") >= 2L)
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1)
          .collect()
        if (best.isEmpty) exhausted = true
        else {
          val pair = (best(0).getString(0), best(0).getString(1))
          out += pair
          current = current :+ pair
          k += 1
        }
      }
      out.result()
    } finally { words.unpersist(); () }
  }

  // ---- byte-level (full GPT-2 construction) ------------------------------

  /** Learn an ordered BYTE-LEVEL merge list: [[ByteLevel.Gpt2Pattern]]
    * pre-tokenization (the real GPT-2 split — contractions, space-led
    * number and punctuation runs, donated spaces), byte symbols via
    * [[ByteLevel.encode]], then the same Sennrich loop as
    * [[learnMerges]]. The rules this produces are in the SAME symbol
    * space as a published merges file, so learned and loaded rules are
    * interchangeable inputs to [[byteTokenCount]].
    *
    * Same scale shape and LOUD `maxWords` bound as [[learnMerges]] —
    * [[learnMergesByteLevelDistributed]] is the unbounded route. */
  def learnMergesByteLevel(df: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 1 << 20): Seq[(String, String)] = {
    val rows = df.select(
        explode(regexp_extract_all(col(textCol), lit(ByteLevel.Gpt2Pattern),
          lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .limit(maxWords + 1)
      .collect()
    require(rows.length <= maxWords,
      s"distinct pre-tokens exceed maxWords=$maxWords; raise the bound " +
        "or use learnMergesByteLevelDistributed")
    mergeLoop(
      rows.map(r =>
        (ByteLevel.encode(r.getString(0)).map(_.toString).toArray,
          r.getLong(1))),
      nMerges)
  }

  /** Token count under a byte-level merge list — the full published
    * construction; with a real tokenizer's merges file this IS its
    * token count ([[graft.functions.ByteBpeExprs]]). */
  def byteTokenCount(c: Column, merges: Seq[(String, String)]): Column =
    graft.functions.ByteBpeExprs.byteTokenCount(c, merges)

  /** Byte-level segmentation — pieces in byte-symbol space ("Ġthe"),
    * the spelling published tokenizers display. */
  def byteTokens(c: Column, merges: Seq[(String, String)]): Column =
    graft.functions.ByteBpeExprs.byteTokenize(c, merges)

  /** Token IDS under the merge-DERIVED vocabulary (256 byte symbols,
    * then one piece per rule in rank order — the published id
    * construction): the array a packed training batch actually
    * stores. */
  def byteTokenIds(c: Column, merges: Seq[(String, String)]): Column =
    graft.functions.ByteBpeExprs.byteTokenIds(c, merges)

  /** Detokenize: the id array back to document text (ids -> pieces ->
    * byte symbols -> UTF-8) — the loader-faithfulness inverse of
    * [[byteTokenIds]]. */
  def byteDecodeIds(c: Column, merges: Seq[(String, String)]): Column =
    graft.functions.ByteBpeExprs.byteDecodeIds(c, merges)

  /** The first SPECIAL-token id under the published numbering:
    * special tokens append AFTER the merge products, so the
    * end-of-text id is 256 + |merges| — for GPT-2's 50,000-rule file
    * that is exactly its published `<|endoftext|>` id, 50256. Packing
    * appends this between documents ([[graft.queries.CurationQueries.qPackIdsEos]])
    * so a training loader can find doc boundaries inside a packed
    * sequence. */
  def eosId(merges: Seq[(String, String)]): Int = 256 + merges.size

  /** Parse a GPT-2-format merges file VERBATIM — one "a b" rule per
    * line, symbols already in byte-symbol space (no translation; this
    * is the loader for [[byteTokenCount]], where `Ġ` IS the space
    * symbol). ONLY the `#version` header line and blanks skip: '#' is
    * an ordinary byte symbol, and a real published file contains
    * rules like "# #" (the merges behind '##'/'###' pieces) — a
    * comment-style filter would silently drop them and break the
    * verbatim contract on markdown/code text. */
  def parseMergesVerbatim(lines: Seq[String]): Seq[(String, String)] =
    lines.filter(l => l.nonEmpty && !l.startsWith("#version")).map { l =>
      val parts = l.split(" ", 2)
      require(parts.length == 2 && parts(1).nonEmpty,
        s"malformed merge line: '$l'")
      (parts(0), parts(1))
    }

  /** Render rules in the GPT-2 merges-file format (inverse of
    * [[parseMergesVerbatim]]). */
  def renderMergesGpt2(merges: Seq[(String, String)]): String =
    ("#version: 0.2" +: merges.map { case (a, b) => s"$a $b" })
      .mkString("", "\n", "\n")

  // ---- vocab.json (the merges file's artifact pair) ----------------------

  /** The merge-DERIVED vocabulary as an ordered (piece, id) list —
    * the published numbering itself: 256 byte symbols in ascending
    * mapped-code-point order (ids 0-255), then one piece per merge
    * rule in rank order (id = 256 + rank), first-wins when a
    * redundant rule re-creates an existing spelling (the earlier id
    * is the one inference emits, and a published vocab.json cannot
    * hold two ids for one piece). */
  def mergeDerivedVocab(merges: Seq[(String, String)]): Seq[(String, Int)] = {
    val seen = new java.util.HashSet[String](256 + merges.size * 2)
    val out = Vector.newBuilder[(String, Int)]
    ByteLevel.symbolsByIdOrder.zipWithIndex.foreach { case (c, id) =>
      seen.add(c.toString); out += (c.toString -> id)
    }
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      if (seen.add(a + b)) out += ((a + b) -> (256 + i))
    }
    out.result()
  }

  /** Parse a GPT-2-format `vocab.json` ({"piece": id, ...}) — the
    * second file of the published tokenizer artifact pair. Strict:
    * the document must be one flat string→integer object. */
  def parseVocabJson(text: String): Map[String, Int] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.enable(com.fasterxml.jackson.core.JsonParser
      .Feature.STRICT_DUPLICATE_DETECTION)
    val root =
      try mapper.readTree(text)
      catch {
        case e: com.fasterxml.jackson.core.JsonProcessingException =>
          throw new IllegalArgumentException(
            s"vocab.json failed to parse: ${e.getMessage}")
      }
    require(root != null && root.isObject,
      "vocab.json must be a single JSON object of piece -> id")
    val out = Map.newBuilder[String, Int]
    root.fields().forEachRemaining { e =>
      require(e.getValue.isIntegralNumber,
        s"vocab.json id for piece '${e.getKey}' is not an integer: " +
          s"${e.getValue}")
      out += e.getKey -> e.getValue.asInt()
    }
    out.result()
  }

  /** Render a vocabulary in the vocab.json format (inverse of
    * [[parseVocabJson]]), entries in id order. */
  def renderVocabJson(vocab: Seq[(String, Int)]): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    vocab.sortBy(_._2).map { case (p, id) => s""""${esc(p)}": $id""" }
      .mkString("{", ", ", "}")
  }

  /** Cross-check a published vocab.json against the merge-derived
    * numbering — the loader-integrity gate for the artifact pair: a
    * merges.txt and vocab.json from DIFFERENT tokenizer versions
    * would silently mis-number every packed batch. Checks both
    * directions: every derived (piece, id) must appear verbatim, and
    * every published entry below 256 + |merges| must be
    * merge-derivable; entries at or above that line are appended
    * special tokens (GPT-2's <|endoftext|> = 50256) and pass
    * through. Fails LOUDLY at the first divergence, lowest id first,
    * naming the piece and both ids. Returns the number of appended
    * special tokens accepted. */
  def crossCheckVocab(
      published: Map[String, Int],
      merges: Seq[(String, String)]): Int = {
    val derived = mergeDerivedVocab(merges)
    val limit = 256 + merges.size
    derived.foreach { case (piece, id) =>
      published.get(piece) match {
        case Some(`id`) => ()
        case Some(other) => throw new IllegalArgumentException(
          s"vocab.json cross-check FAILED at id $id: piece '$piece' " +
            s"is numbered $other in vocab.json but $id by the merge " +
            "derivation — merges.txt and vocab.json are not from the " +
            "same tokenizer build")
        case None => throw new IllegalArgumentException(
          s"vocab.json cross-check FAILED at id $id: merge-derived " +
            s"piece '$piece' is absent from vocab.json (vocab holds " +
            s"${published.size} entries) — merges.txt and vocab.json " +
            "are not from the same tokenizer build")
      }
    }
    val derivedMap = derived.toMap
    published.toSeq.sortBy(_._2).foreach { case (piece, id) =>
      if (id < limit && !derivedMap.get(piece).contains(id))
        throw new IllegalArgumentException(
          s"vocab.json cross-check FAILED: vocab entry '$piece' -> $id " +
            s"sits inside the merge-derived range (< $limit) but the " +
            "derivation produces no such pair — merges.txt and " +
            "vocab.json are not from the same tokenizer build")
    }
    published.count(_._2 >= limit)
  }

  /** [[parseVocabJson]] + [[crossCheckVocab]] from disk — load the
    * artifact pair the way a production pipeline points at its
    * tokenizer directory. */
  def loadCheckedVocabJson(
      path: String, merges: Seq[(String, String)]): Map[String, Int] = {
    val vocab = parseVocabJson(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
    crossCheckVocab(vocab, merges)
    vocab
  }

  /** Checked-in BYTE-LEVEL merge fixture: [[learnMergesByteLevel]]
    * over the sf0.01 corpus, stored in the GPT-2 merges-file format
    * itself (ByteBpeSpec pins the file bit-for-bit against the
    * learner's output — and loads it through the same verbatim parser
    * a published merges.txt would use). */
  lazy val fixtureMergesByteLevel: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges_bytelevel.txt")
    require(in != null, "bpe_merges_bytelevel.txt missing from classpath")
    try parseMergesVerbatim(
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector)
    finally in.close()
  }

  /** Token count under an ordered merge list — a real tokenizer's
    * merges file applied verbatim
    * ([[graft.functions.MergeExprs.mergeTokenCount]]). */
  def mergeTokenCount(c: Column, merges: Seq[(String, String)]): Column =
    graft.functions.MergeExprs.mergeTokenCount(c, merges)

  /** Token ARRAY under an ordered merge list — the segmentation
    * itself, for subword statistics under a real tokenizer's rules. */
  def mergeTokens(c: Column, merges: Seq[(String, String)]): Column =
    graft.functions.MergeExprs.mergeTokenize(c, merges)

  /** Parse GPT-2-convention merge lines ("Ġt he", one rule per line,
    * `Ġ` marking a leading space, symbols never containing a raw
    * space) into this module's literal-space symbols — the adapter
    * that loads a published merges.txt verbatim. Comment lines
    * (`#...`) and blanks are skipped. */
  def parseGpt2Merges(lines: Seq[String]): Seq[(String, String)] =
    lines.filter(l => l.nonEmpty && !l.startsWith("#")).map { l =>
      val parts = l.split(" ", 2)
      require(parts.length == 2, s"malformed merge line: '$l'")
      (parts(0).replace("Ġ", " "), parts(1).replace("Ġ", " "))
    }

  /** Checked-in merge fixture: `learnMerges` over the sf0.01 corpus
    * (127 rules — the corpus exhausts all pairs occurring twice),
    * stored tab-separated (symbols contain literal
    * spaces). BpeSpec pins the file bit-for-bit against the
    * operator's output; a production pipeline loads its tokenizer's
    * merges file here instead ([[parseGpt2Merges]]). */
  lazy val fixtureMerges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.tsv")
    require(in != null, "bpe_merges.tsv missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).map { l =>
        val t = l.split("\t", 2)
        require(t.length == 2, s"malformed merge fixture line: '$l'")
        (t(0), t(1))
      }.toVector
    finally in.close()
  }

  // ---- production-scale (50k-piece) vocabulary ---------------------------

  /** Lexicographic cut for the 4-letter tier of [[prodVocab]]: the
    * 13,445th 4-letter string, chosen so the vocab totals exactly
    * 50,000 pieces. Shared with the closed-form oracle
    * ([[prodTokensSqlExpr]]). */
  val ProdVocab4Cut: String = "atxc"

  /** Deterministic 50,000-piece vocabulary — the production-scale
    * trie evidence. Construction (all lowercase):
    *
    *  - every 1-3 letter run, with and without a leading space:
    *    2 * (26 + 26^2 + 26^3) = 36,556 pieces;
    *  - every space-led 4-letter piece lexicographically below
    *    [[ProdVocab4Cut]]: 13,444 pieces.
    *
    * Total 50,000 — the advertised scale at which the alternation
    * regex dies and the trie takes over ([[tokenCountFast]]). The
    * shape mirrors a real tokenizer vocab (dense short pieces, a
    * longer tail, leading-space variants) while staying CHARACTERIZABLE:
    * greedy longest-match under this vocab has a closed form — a
    * space-led word's first token takes 4 letters iff its 4-prefix is
    * under the cut, else 3; every further run chunks 3 at a time;
    * anything else is a single-code-point fallback — which is exactly
    * what [[prodTokensSqlExpr]] replays in DuckDB, so the 50k path is
    * oracle-gated WITHOUT a 300 KB regex. A production pipeline swaps
    * in its tokenizer's real piece table; the trie is size-agnostic. */
  lazy val prodVocab: Seq[String] = {
    val letters = ('a' to 'z').map(_.toString)
    val r1 = letters
    val r2 = for (a <- r1; b <- letters) yield a + b
    val r3 = for (a <- r2; b <- letters) yield a + b
    val r4 = for (a <- r3; b <- letters) yield a + b
    val short = (r1 ++ r2 ++ r3).flatMap(r => Seq(r, " " + r))
    val tail4 = r4.filter(_ < ProdVocab4Cut).map(" " + _)
    val v = short ++ tail4
    require(v.size == 50000, s"prodVocab size drifted: ${v.size}")
    v
  }

  /** Token count under [[prodVocab]] — always the trie walk; the
    * compiled-alternation pattern at 50k pieces is the measured
    * anti-path (PLANS.md). */
  def prodTokenCount(c: Column): Column = tokenCountFast(c, prodVocab)

  /** DuckDB closed form of greedy longest-match under [[prodVocab]],
    * over a text expression `t` — an INDEPENDENT derivation (run
    * structure + the 4-cut), not a replay of the matcher, so the
    * oracle cross-checks the trie rather than re-running it:
    * segment into (space+run | run | any-char), then
    * space-led run of r letters = 1 + ceil((r - first)/3) tokens with
    * first = 4 iff r >= 4 and 4-prefix < cut else min(r, 3);
    * bare run = ceil(r/3); anything else 1 per code point. */
  def prodTokensSqlExpr(t: String): String =
    s"""COALESCE(CAST(list_sum(list_transform(
       |    regexp_extract_all($t, ' [a-z]+|[a-z]+|[\\s\\S]'),
       |    m -> CASE
       |      WHEN substr(m, 1, 1) = ' ' AND length(m) >= 2 THEN
       |        1 + CAST(ceil((length(m) - 1 - (CASE
       |              WHEN length(m) - 1 >= 4 AND substr(m, 2, 4) < '$ProdVocab4Cut'
       |              THEN 4 ELSE least(length(m) - 1, 3) END)) / 3.0) AS BIGINT)
       |      WHEN regexp_matches(m, '^[a-z]+$$') THEN
       |        CAST(ceil(length(m) / 3.0) AS BIGINT)
       |      ELSE 1 END)) AS BIGINT), 0)""".stripMargin
}
