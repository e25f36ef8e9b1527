package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level trie for greedy longest-match tokenization — the
  * scale path for [[graft.ops.Bpe]] when the vocabulary outgrows the
  * compiled-alternation regex: the regex scan costs O(pieces tried)
  * per position, the trie walk O(matched length), independent of
  * vocabulary size (a 50k-piece production vocab is ~300x more
  * alternatives for the regex but the same walk for the trie).
  *
  * Vocab pieces are ASCII (` ?[A-Za-z]+`, enforced by
  * [[graft.ops.Bpe.tokenPattern]]'s contract), so the trie indexes
  * raw UTF-8 bytes; unmatched positions consume one UTF-8 code point
  * (the regex path's `[\s\S]` consumes one UTF-16 code unit — the
  * two agree everywhere except astral-plane characters, where the
  * code-point count matches RE2/DuckDB and the Java regex counts
  * surrogate halves; the property spec pins equality on BMP text).
  *
  * Flat-array layout (`next[node * 128 + byte]`), serializable, one
  * instance shared per plan via the codegen references array. */
final class ByteTrie(pieces: Seq[String]) extends Serializable {
  private val (next: Array[Int], terminalLen: Array[Int]) = {
    require(pieces.forall(_.forall(c => c < 128)), "ASCII vocab only")
    val maxNodes = pieces.map(_.length).sum + 1
    val nx = Array.fill(maxNodes * 128)(-1)
    val tl = Array.fill(maxNodes)(0)
    var nNodes = 1
    pieces.foreach { p =>
      var node = 0
      p.foreach { c =>
        val slot = node * 128 + c
        if (nx(slot) == -1) { nx(slot) = nNodes; nNodes += 1 }
        node = nx(slot)
      }
      tl(node) = p.length
    }
    (nx.take(nNodes * 128), tl.take(nNodes))
  }

  /** Longest vocab piece matching at `start`, 0 if none. */
  private def longestMatch(b: Array[Byte], start: Int): Int = {
    var node = 0
    var i = start
    var best = 0
    while (i < b.length && b(i) >= 0) { // ASCII bytes only can advance
      val child = next(node * 128 + b(i))
      if (child == -1) return best
      node = child
      i += 1
      if (terminalLen(node) > best) best = terminalLen(node)
    }
    best
  }

  /** Greedy longest-match token count (called from generated code). */
  def countTokens(s: UTF8String): Long = {
    val b = s.getBytes
    var i = 0
    var n = 0L
    while (i < b.length) {
      val m = longestMatch(b, i)
      if (m > 0) i += m
      else {
        // fallback: one UTF-8 code point (lead byte gives the width)
        val lead = b(i) & 0xff
        i += (if (lead < 0x80) 1 else if (lead < 0xe0) 2
              else if (lead < 0xf0) 3 else 4)
      }
      n += 1
    }
    n
  }
}

/** Greedy longest-match BPE token count as a native expression: one
  * trie walk per row, codegen'd into the enclosing WholeStageCodegen
  * stage. Result-identical to [[graft.ops.Bpe.tokenCount]]'s
  * compiled-alternation regex (property-pinned in BpeSpec), so the
  * DuckDB oracle for the regex path gates this one too. */
case class BpeTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  @transient private lazy val trie = new ByteTrie(vocab)

  override def nullSafeEval(input: Any): Any =
    trie.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("bpeTrie", trie,
      classOf[ByteTrie].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $trieRef.countTokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeExprs {
  def tokenCountFast(text: Column, vocab: Seq[String]): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(text), vocab))
}
