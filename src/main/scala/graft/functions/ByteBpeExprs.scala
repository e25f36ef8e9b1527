package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.ops.ByteLevel

/** BYTE-LEVEL merge-ranked BPE — the full published GPT-2
  * construction: [[ByteLevel.Gpt2Pattern]] pre-tokenization, the
  * 256-symbol byte alphabet ([[ByteLevel.encode]]), then the ordered
  * merge loop of [[MergeRanker]]. Unlike the letter-only merge path
  * (`MergeExprs`), pieces containing digits, punctuation, and
  * non-ASCII bytes participate in merges — so a published tokenizer's
  * merges file, loaded verbatim ([[graft.ops.Bpe.parseMergesVerbatim]]),
  * reproduces its segmentation on ARBITRARY text. With an empty merge
  * list the token count is exactly the UTF-8 byte count (every byte
  * its own symbol) — the published base case.
  *
  * Scale design matches the letter path: the serialized form is the
  * merge-pair list (a production tokenizer ships ~50k rules, a few
  * hundred KB — every task holds it, like a broadcast without the
  * join); the rank map builds lazily per JVM; per-pre-token results
  * memoize per executor (bounded), so a natural-language corpus pays
  * the merge loop once per distinct pre-token per executor, not once
  * per occurrence. Both expressions are codegen'd — token accounting
  * stays inside WholeStageCodegen, never leaving the scan stage.
  */
final class ByteBpeRanker(merges: Seq[(String, String)]) extends Serializable {

  // rank key a+" "+b is unambiguous BY CONSTRUCTION: byte-level
  // symbols never contain a raw space (byte 0x20 encodes to 'Ġ')
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      require(!a.contains(' ') && !b.contains(' '),
        s"byte-level merge symbols must not contain raw spaces: '$a $b'")
      m.putIfAbsent(a + " " + b, Integer.valueOf(i))
    }
    m
  }

  // per-JVM pre-token cache, keyed by the RAW pre-token; bounded in
  // BOTH entry count and entry size — pre-tokens are unbounded (one
  // letter/punct run each), so an entry-count cap alone would let an
  // adversarial corpus of huge distinct runs retain gigabytes. Beyond
  // either bound every pre-token still computes correctly, just
  // uncached.
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val MemoCap = 1 << 16
  private val MemoMaxLen = 1 << 12

  /** Byte-level segmentation of ONE pre-token: encode to byte
    * symbols, then merge every occurrence of the lowest-ranked
    * adjacent pair until no listed pair remains (same fixpoint as the
    * one-at-a-time replay the oracle runs — see [[MergeRanker]]'s
    * equivalence note). */
  def segmentPreToken(w: String): Array[String] = {
    val cached = memo.get(w)
    if (cached != null) return cached
    var syms: Array[String] = ByteLevel.encode(w).map(_.toString).toArray
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (pa, pb) = merges(bestRank)
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == pa && syms(j + 1) == pb) {
            out += pa + pb
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.result()
      }
    }
    if (w.length <= MemoMaxLen && memo.size < MemoCap) memo.put(w, syms)
    syms
  }

  /** The merge-derived VOCABULARY, by the published construction: the
    * 256 byte symbols first in ascending mapped-code-point order
    * (id of '!' is 0, 'Ċ' 198, 'Ġ' 220 — NOT raw byte value; the
    * GPT-2 vocab sorts its base alphabet), then one piece per merge
    * rule in rank order (id = 256 + rank). With a published merges
    * file these ids ARE (up to appended special tokens) its published
    * token ids. First-wins on the rare duplicate piece (a redundant
    * rule can re-create an existing spelling — the earlier id is the
    * one inference produces). */
  @transient private lazy val pieceId: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](256 + merges.size * 2)
    ByteLevel.symbolsByIdOrder.zipWithIndex.foreach { case (c, id) =>
      m.put(c.toString, Integer.valueOf(id))
    }
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + b, Integer.valueOf(256 + i))
    }
    m
  }

  /** Token IDS of a document — the training-batch currency itself
    * (what a packed sequence actually contains). Total by
    * construction: every piece is either a byte symbol or a merge
    * product, so lookup cannot miss. */
  def tokenIds(s: UTF8String): GenericArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](16)
    ByteLevel.preTokenize(s.toString).foreach { w =>
      val syms = segmentPreToken(w)
      var i = 0
      while (i < syms.length) {
        val id = pieceId.get(syms(i))
        assert(id != null, s"piece '${syms(i)}' missing from merge-derived vocab")
        out += id.intValue()
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Inverse vocabulary, id -> piece, in the same published numbering
    * as `pieceId` (256 base symbols by sorted code point, then one
    * piece per rule). A redundant rule's product decodes to the same
    * spelling as the earlier id, so first-wins on the encode side
    * never breaks the round trip. */
  @transient private lazy val idPiece: Array[String] = {
    val arr = new Array[String](256 + merges.size)
    ByteLevel.symbolsByIdOrder.zipWithIndex.foreach { case (c, id) =>
      arr(id) = c.toString
    }
    merges.zipWithIndex.foreach { case ((a, b), i) => arr(256 + i) = a + b }
    arr
  }

  /** Detokenize: ids -> pieces -> byte symbols -> UTF-8 text. The
    * loader-faithfulness direction — proves the id stream alone
    * reconstructs the document. Loud on ids outside the vocabulary. */
  def decodeIds(ids: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    val n = ids.numElements()
    while (i < n) {
      require(!ids.isNullAt(i),
        s"null token id at position $i — the id stream must be total")
      val id = ids.getInt(i)
      require(id >= 0 && id < idPiece.length,
        s"token id $id outside the merge-derived vocab (size ${idPiece.length})")
      sb.append(idPiece(id))
      i += 1
    }
    UTF8String.fromString(ByteLevel.decode(sb.toString))
  }

  /** Token count of a document: every char is in exactly one
    * [[ByteLevel.Gpt2Pattern]] pre-token; no fallback path exists —
    * the byte alphabet covers everything. */
  def countTokens(s: UTF8String): Long = {
    var n = 0L
    ByteLevel.preTokenize(s.toString)
      .foreach(w => n += segmentPreToken(w).length)
    n
  }

  /** Full-document segmentation: the pieces, in byte-symbol space
    * (the spelling published tokenizers display — "Ġthe"). */
  def tokenize(s: UTF8String): GenericArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](16)
    ByteLevel.preTokenize(s.toString).foreach { w =>
      segmentPreToken(w).foreach(p => out += UTF8String.fromString(p))
    }
    new GenericArrayData(out.toArray)
  }
}

/** Byte-level BPE token count as a codegen'd native expression. */
case class ByteBpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "byte_bpe_token_count"

  @transient private lazy val ranker = new ByteBpeRanker(merges)

  override def nullSafeEval(input: Any): Any =
    ranker.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeRanker", ranker,
      classOf[ByteBpeRanker].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countTokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Byte-level BPE segmentation as a native expression: the token
  * ARRAY, pieces in byte-symbol space. */
case class ByteBpeTokenize(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "byte_bpe_tokenize"

  @transient private lazy val ranker = new ByteBpeRanker(merges)

  override def nullSafeEval(input: Any): Any =
    ranker.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeRanker", ranker,
      classOf[ByteBpeRanker].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.tokenize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Token IDS under the merge-derived vocabulary, as a native
  * expression — `array<int>`, the dtype a packed training batch
  * stores. */
case class ByteBpeTokenIds(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "byte_bpe_token_ids"

  @transient private lazy val ranker = new ByteBpeRanker(merges)

  override def nullSafeEval(input: Any): Any =
    ranker.tokenIds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeRanker", ranker,
      classOf[ByteBpeRanker].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.tokenIds($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Detokenization as a native expression: `array<int>` token ids back
  * to the document text — the inverse of [[ByteBpeTokenIds]] and the
  * proof that the id stream is a loader-faithful artifact. */
case class ByteBpeDecode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "byte_bpe_decode"

  @transient private lazy val ranker = new ByteBpeRanker(merges)

  override def nullSafeEval(input: Any): Any =
    ranker.decodeIds(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeRanker", ranker,
      classOf[ByteBpeRanker].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.decodeIds($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteBpeExprs {
  def byteTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(ByteBpeTokenCount(Bridge.expression(text), merges))

  def byteTokenize(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(ByteBpeTokenize(Bridge.expression(text), merges))

  def byteTokenIds(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(ByteBpeTokenIds(Bridge.expression(text), merges))

  def byteDecodeIds(ids: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(ByteBpeDecode(Bridge.expression(ids), merges))
}
