package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Bpe, ByteLevel}

/** The vocab.json side of the GPT-2 tokenizer artifact pair:
  * merge-derived numbering, strict parse, and the cross-check that
  * refuses a merges.txt/vocab.json pair from different builds. */
class VocabJsonSpec extends AnyFunSuite {

  private val merges = Bpe.fixtureMergesByteLevel
  private val derived = Bpe.mergeDerivedVocab(merges)
  private val eos = "<|endoftext|>" -> Bpe.eosId(merges)

  test("merge-derived vocab follows the published numbering") {
    val m = derived.toMap
    // base alphabet: ascending mapped code point, '!' is id 0,
    // 'Ġ' (the space symbol) 220 — GPT-2's published base ids
    assert(m("!") === 0)
    assert(m("Ġ") === 220)
    assert(derived.take(256).map(_._2) === (0 until 256))
    // one piece per rule in rank order after the alphabet
    merges.zipWithIndex.take(20).foreach { case ((a, b), i) =>
      assert(m(a + b) === 256 + i, s"rule $i '${a + b}'")
    }
    assert(derived.map(_._1).distinct.size === derived.size)
  }

  test("render -> parse round trip + cross-check accept appended specials") {
    val json = Bpe.renderVocabJson(derived :+ eos)
    val parsed = Bpe.parseVocabJson(json)
    assert(parsed.size === derived.size + 1)
    assert(parsed(eos._1) === eos._2)
    // one appended special accepted, everything else id-exact
    assert(Bpe.crossCheckVocab(parsed, merges) === 1)
    // the escaping survives hostile pieces
    val hostile = Seq("a\"b" -> 0, "c\\d" -> 1, "e\u0001f" -> 2)
    assert(Bpe.parseVocabJson(Bpe.renderVocabJson(hostile)) ===
      hostile.toMap)
  }

  test("cross-check fails loudly at the FIRST divergent id, naming the piece") {
    val m = derived.toMap
    // renumber one merge product: first divergence is at its id
    val victim = derived(300)
    val swapped = m - victim._1 + (victim._1 -> 999999)
    val e1 = intercept[IllegalArgumentException](
      Bpe.crossCheckVocab(swapped, merges))
    assert(e1.getMessage.contains(s"at id ${victim._2}"))
    assert(e1.getMessage.contains(s"'${victim._1}'"))
    assert(e1.getMessage.contains("999999"))

    // a missing piece names itself as absent
    val e2 = intercept[IllegalArgumentException](
      Bpe.crossCheckVocab(m - victim._1, merges))
    assert(e2.getMessage.contains("absent"))
    assert(e2.getMessage.contains(s"'${victim._1}'"))

    // a foreign entry INSIDE the derived range is refused even when
    // every derived pair matches (a vocab from a bigger build)
    val e3 = intercept[IllegalArgumentException](
      Bpe.crossCheckVocab(m + ("zzneverapiece" -> 300), merges))
    assert(e3.getMessage.contains("zzneverapiece"))
  }

  test("loadCheckedVocabJson reads the artifact pair from disk") {
    val f = java.nio.file.Files.createTempFile("vocab", ".json")
    try {
      java.nio.file.Files.writeString(f,
        Bpe.renderVocabJson(derived :+ eos))
      val v = Bpe.loadCheckedVocabJson(f.toString, merges)
      assert(v.size === derived.size + 1)
      assert(v("!") === 0)
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("strict parse refuses non-object and non-integer ids") {
    intercept[IllegalArgumentException](Bpe.parseVocabJson("[1,2]"))
    intercept[IllegalArgumentException](
      Bpe.parseVocabJson("""{"a": "x"}"""))
  }

  test("redundant rules keep the earlier id (first-wins) and never re-number") {
    // a tiny hand-rolled merge list whose 3rd rule re-creates rule 1's
    // spelling via a different split: "ab"+"c" vs "a"+"bc"
    val ms = Seq(("a", "b"), ("b", "c"), ("ab", "c"), ("a", "bc"))
    val v = Bpe.mergeDerivedVocab(ms).toMap
    assert(v("ab") === 256 && v("bc") === 257 && v("abc") === 258)
    // rule 3's product "abc" already exists -> no 259 entry for it
    assert(!Bpe.mergeDerivedVocab(ms).exists(_._2 === 259))
  }

  test("duplicate keys in a vocab.json are refused") {
    // jackson's readTree keeps the last duplicate silently — the size
    // guard catches the collapse
    assert(ByteLevel.symbolsByIdOrder.size === 256)
    intercept[IllegalArgumentException](
      Bpe.parseVocabJson("""{"a": 1, "a": 2}"""))
  }
}
