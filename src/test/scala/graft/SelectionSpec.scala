package graft

import org.apache.spark.sql.functions._
import graft.ops.{Budget, GopherQuality}

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def gopher(rows: Seq[(Long, String)]) =
    GopherQuality.report(rows.toDF("doc_id", "text"), "text", "doc_id",
        minWords = 3, minStopwords = 1)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap

  test("gopher rules fire individually") {
    val good = "the quick brown fox jumps over the lazy dog today"
    val rep = gopher(Seq(
      1L -> good,
      2L -> "to be", // too few words
      3L -> "xx yy zz aa bb", // no stopword
      4L -> "the ## ## ## word ## ## ## ## ##", // symbol-heavy
      5L -> "the 99 88 77 66 55 44 33 22 11", // non-alpha words
      6L -> "the a b c d e f g h i", // mean word len < 3
      7L -> ("the start\n- one\n- two\n- three\n- four\n- five\n" +
        "- six\n- seven\n- eight\n- nine\n- ten"), // bullet lines
      8L -> "the line goes on...\nand on...\nplain\nplain")) // ellipsis ends
    assert(rep(1L).getAs[Long]("keep") == 1L)
    assert(rep(2L).getAs[Long]("rule_words") == 0L)
    assert(rep(3L).getAs[Long]("rule_stopwords") == 0L)
    assert(rep(4L).getAs[Long]("rule_symbol") == 0L)
    assert(rep(5L).getAs[Long]("rule_alpha") == 0L)
    assert(rep(6L).getAs[Long]("rule_mean_len") == 0L)
    assert(rep(7L).getAs[Long]("rule_bullet") == 0L)
    assert(rep(8L).getAs[Long]("rule_ellipsis") == 0L)
    assert(Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L)
      .forall(id => rep(id).getAs[Long]("keep") == 0L))
  }

  test("gopher ellipsis symbols count non-overlapping occurrences") {
    val rep = gopher(Seq(1L -> "the ...... word here now"))
    // "......" = two ellipses over 5 words -> ratio 0.4 > 0.1
    assert(rep(1L).getAs[Long]("rule_symbol") == 0L)
  }

  test("gopher symbol rule thresholds hash and ellipsis separately") {
    // Rae 2021 A1.1: each symbol's ratio is tested on its own. Here
    // hash 1/10 and ellipsis 1/10 both sit AT the threshold — kept,
    // even though the pooled ratio 0.2 would fail a combined gate.
    val rep = gopher(Seq(
      1L -> "the quick # fox runs on... and keeps going still",
      2L -> "the # # word goes on smoothly enough right here", // hash 0.22
      3L -> "the trail runs on... and on... quite far today")) // ell 0.22
    assert(rep(1L).getAs[Long]("rule_symbol") == 1L)
    assert(rep(1L).getAs[Long]("keep") == 1L)
    assert(rep(2L).getAs[Long]("rule_symbol") == 0L)
    assert(rep(3L).getAs[Long]("rule_symbol") == 0L)
  }

  /** Brute-force twin: global (score DESC, id) order, keep while the
    * running pre-sum stays under budget. */
  private def bruteSelect(
      docs: Seq[(Long, Long, Long)], budget: Long): Map[Long, Long] = {
    var cum = 0L
    docs.sortBy { case (id, score, _) => (-score, id) }.map {
      case (id, _, n) =>
        val keep = if (cum < budget) 1L else 0L
        cum += n
        id -> keep
    }.toMap
  }

  test("budget select == global-window brute force, cutoff mid-stratum") {
    // scores with a big tied stratum so the cutoff lands inside it
    val docs = (1L to 40L).map { id =>
      (id, (id % 4) * 10L, 5L + (id % 7)) // 4 strata, varied sizes
    }
    for (budget <- Seq(0L, 1L, 37L, 120L, 200L, 10000L)) {
      val got = Budget.select(
        docs.toDF("id", "score", "n_tokens"), "id", "score", "n_tokens",
        budget).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("keep")).toMap
      assert(got == bruteSelect(docs, budget), s"budget=$budget")
    }
  }

  test("budget select is partitioning-invariant") {
    val docs = (1L to 30L).map(id => (id, id % 3 * 7L, 4L + id % 5))
    val df = docs.toDF("id", "score", "n_tokens")
    val a = Budget.select(df, "id", "score", "n_tokens", 60L)
      .orderBy("id").collect().toSeq
    val b = Budget.select(df.repartition(7), "id", "score", "n_tokens", 60L)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("c4 line and page rules fire individually") {
    val ok = (1 to 6).map(i => s"this is a good sentence number $i.")
      .mkString("\n")
    val rep = graft.ops.C4Filter.report(
      Seq(
        1L -> ok,
        2L -> (ok + "\nshort one.\njust four words here.\n" +
          "no terminal punct on this line\n" +
          "  a padded javascript line stays out.  "),
        3L -> (ok.split("\n").take(2).mkString("\n")), // < 3 kept lines
        4L -> (ok + "\nsome Lorem Ipsum filler"),
        5L -> (ok + "\nfunction f() { return 1; }"),
        6L -> (ok + "\nplainly nsfw content here"),
        // Raffel 2020 §2.2: a page with exactly 3 retained
        // sentences is KEPT (threshold is "fewer than 3")
        7L -> (ok.split("\n").take(3).mkString("\n")))
        .toDF("doc_id", "text"),
      "text", "doc_id", blocklist = Seq("nsfw")).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(rep(1L).getAs[Long]("keep") == 1L)
    assert(rep(1L).getAs[String]("clean_text") == ok)
    // doc2: the four junk lines are cut (2-word / 4-word — the
    // paper's line threshold is "at least 5 words" / no punct /
    // javascript), the six good ones survive -> page keeps
    assert(rep(2L).getAs[Long]("n_kept_lines") == 6L)
    assert(rep(2L).getAs[String]("clean_text") == ok)
    assert(rep(2L).getAs[Long]("keep") == 1L)
    assert(rep(3L).getAs[Long]("n_kept_lines") == 2L)
    assert(rep(3L).getAs[Long]("keep") == 0L)
    assert(rep(7L).getAs[Long]("n_kept_lines") == 3L)
    assert(rep(7L).getAs[Long]("keep") == 1L)
    assert(rep(4L).getAs[Long]("has_lorem") == 1L &&
      rep(4L).getAs[Long]("keep") == 0L)
    assert(rep(5L).getAs[Long]("has_brace") == 1L &&
      rep(5L).getAs[Long]("keep") == 0L)
    assert(rep(6L).getAs[Long]("has_badword") == 1L &&
      rep(6L).getAs[Long]("keep") == 0L)
  }

  test("c4 handles CRLF line endings (\\r trimmed before the $ anchor)") {
    val crlf = (1 to 5).map(i => s"a good crlf sentence number $i.")
      .mkString("\r\n")
    val r = graft.ops.C4Filter.report(
      Seq(1L -> crlf).toDF("doc_id", "text"), "text", "doc_id")
      .collect().head
    assert(r.getAs[Long]("n_kept_lines") == 5L)
    assert(r.getAs[Long]("keep") == 1L)
    assert(!r.getAs[String]("clean_text").contains("\r"))
  }

  test("corpus diff classifies added/removed/changed/unchanged and follows source moves") {
    val prev = Seq(
      (1L, "a b c", "web"), (2L, "d e f", "web"),
      (3L, "g h i", "books"), (4L, "j k l", "web"))
      .toDF("doc_id", "text", "source")
    val cur = Seq(
      (1L, "a b c", "web"), // unchanged
      (2L, "d e f changed", "web"), // changed (+1 token)
      (3L, "g h i", "web"), // unchanged text, MOVED books -> web
      (5L, "m n", "books")) // added; 4 removed
      .toDF("doc_id", "text", "source")
    val rows = graft.ops.CorpusDiff.report(prev, cur, "text", "doc_id",
        "source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("status")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("token_delta"))).toMap
    assert(rows(("web", "unchanged")) == (2L, 0L)) // doc 3 reported at cur source
    assert(rows(("web", "changed")) == (1L, 1L))
    assert(rows(("web", "removed")) == (1L, -3L))
    assert(rows(("books", "added")) == (1L, 2L))
    assert(rows.size == 4)
  }

  test("corpus diff treats null text as present-with-zero-tokens, not added") {
    val prev = Seq((1L, Option.empty[String], "web"),
      (2L, Some("a b"), "web")).toDF("doc_id", "text", "source")
    val cur = Seq((1L, Option.empty[String], "web"),
      (2L, Option.empty[String], "web")).toDF("doc_id", "text", "source")
    val rows = graft.ops.CorpusDiff.report(prev, cur, "text", "doc_id",
        "source").collect()
      .map(r => r.getAs[String]("status") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_prev"),
          r.getAs[Long]("tokens_cur"))).toMap
    assert(rows("unchanged") == (1L, 0L, 0L)) // null == null, 0 tokens
    assert(rows("changed") == (1L, 2L, 0L)) // text -> null is a change
    assert(rows.size == 2)
  }

  test("filter funnel stages are monotone and consistent at sf0.001") {
    val rows = queries.SelectionQueries.qFilterFunnel(spark, sf).collect()
    assert(rows.length == 5)
    val byIdx = rows.map(r =>
      r.getAs[Long]("stage_idx") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    (1L to 4L).foreach { i =>
      assert(byIdx(i)._1 <= byIdx(i - 1)._1, s"stage $i docs grew")
      assert(byIdx(i)._2 <= byIdx(i - 1)._2, s"stage $i tokens grew")
    }
    assert(byIdx(0L)._1 > 0 && byIdx(1L)._1 > 0)
  }
}
