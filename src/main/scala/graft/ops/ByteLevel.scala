package graft.ops

/** GPT-2-style BYTE-LEVEL pre-tokenization and alphabet — the
  * published construction (Radford et al. 2019; the reference
  * implementation's `encoder.py` is public) that lets a byte-pair
  * tokenizer cover ARBITRARY text with a 256-symbol base alphabet:
  *
  *  1. split text into pre-tokens with the GPT-2 regex (contractions,
  *     optionally-space-led letter/number/punctuation runs, whitespace
  *     runs that donate their last space to a following run);
  *  2. encode each pre-token's UTF-8 BYTES through a fixed bijection
  *     into 256 printable unicode code points (space becomes 'Ġ',
  *     newline 'Ċ', multi-byte UTF-8 splits into one symbol per byte);
  *  3. run the merge loop over those byte symbols.
  *
  * Step 2 is what the round-7 letter-only merge path lacked: pieces
  * containing digits, punctuation, or non-ASCII bytes can now
  * participate in merges, so a published merges file reproduces its
  * segmentation verbatim on arbitrary text ([[graft.functions.ByteBpeExprs]]).
  *
  * Everything here is driver/executor-side Scala over published
  * constants — no Spark dependency; the distributed half lives in the
  * codegen'd expressions and the oracle SQL builders below.
  */
object ByteLevel {

  /** The GPT-2 pre-tokenization regex, verbatim: contractions first,
    * then ` ?letters`, ` ?numbers`, ` ?punctuation`, then whitespace —
    * `\s+(?!\S)` makes an interior whitespace run donate its LAST
    * space to the following run (" the" pre-tokens are the norm) while
    * trailing whitespace stays whole. `(?U)` lifts Java's `\s`/`\w`
    * to unicode semantics, matching the Python `regex` module the
    * construction was published with. */
  val Gpt2Pattern: String =
    """(?U)'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  @transient private lazy val compiled =
    java.util.regex.Pattern.compile(Gpt2Pattern)

  /** Pre-tokens of `s` under [[Gpt2Pattern]] — the regex is a
    * partition of the input (every char lands in exactly one match). */
  def preTokenize(s: String): Vector[String] = {
    val m = compiled.matcher(s)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** The published byte→unicode bijection: the 188 bytes that are
    * printable-and-not-space in latin-1 (`!`..`~`, `¡`..`¬`, `®`..`ÿ`)
    * map to themselves; the other 68 map, in byte order, to code
    * points 256, 257, … — all printable, so a byte-level piece is
    * always a sane string ('Ġ' = space is the famous one). */
  val byteToChar: Array[Char] = {
    val out = new Array[Char](256)
    val printable = (33 to 126) ++ (161 to 172) ++ (174 to 255)
    val isP = printable.toSet
    var next = 256
    (0 until 256).foreach { b =>
      if (isP(b)) out(b) = b.toChar
      else { out(b) = next.toChar; next += 1 }
    }
    out
  }

  private val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Byte symbols in PUBLISHED id order — ascending mapped code
    * point, which is how the GPT-2 vocab numbers its 256 base
    * tokens: '!' is id 0, 'Ċ' (newline) 198, 'Ġ' (space) 220. (The
    * printable bytes sort first because they map to themselves below
    * U+0100; the 68 remapped bytes follow in byte order at
    * U+0100+.) */
  val symbolsByIdOrder: IndexedSeq[Char] = byteToChar.toIndexedSeq.sorted

  /** The 256-entry symbol list in PUBLISHED id order as a DuckDB
    * list literal (1-based index = token id + 1) — the oracle's
    * spelling of the base-vocab numbering. */
  lazy val sortedByteTableSql: String =
    symbolsByIdOrder.map(c => s"chr(${c.toInt})").mkString("[", ",", "]")

  /** UTF-8 bytes of `s`, each mapped through [[byteToChar]] — the
    * symbol string the merge loop runs over. One char out per byte
    * in, so multi-byte code points split ("é" → "Ã©"). */
  def encode(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(byteToChar(bytes(i) & 0xff))
      i += 1
    }
    sb.toString
  }

  /** Inverse of [[encode]] (exact: the mapping is a bijection and
    * every encoded string decodes through UTF-8). */
  def decode(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      bytes(i) = charToByte.getOrElse(s.charAt(i),
        throw new IllegalArgumentException(
          s"'${s.charAt(i)}' is not a byte-level symbol")).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  // ---- DuckDB oracle builders -------------------------------------------

  /** The 256-entry byte→symbol table as a DuckDB list literal (1-based
    * index = byte value + 1), built from `chr()` calls so no escaping
    * scheme is needed for quotes or backslashes. */
  lazy val byteTableSql: String =
    byteToChar.map(c => s"chr(${c.toInt})").mkString("[", ",", "]")

  /** RE2-compatible pre-tokenization for the oracle: [[Gpt2Pattern]]
    * minus the `\s+(?!\S)` alternative — RE2 (DuckDB) has no
    * lookahead. EXACT on text without multi-whitespace runs (an
    * interior run of k >= 2 whitespace chars is the only place the
    * lookahead changes the partition); the corpus tables are
    * single-spaced, and the lookahead semantics are pinned
    * Spark-side by ByteLevelSpec's published vectors. */
  val OraclePreTokenPattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""

}
