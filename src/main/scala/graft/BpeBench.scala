package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** One-off evidence run for the trie-vs-regex tokenizer crossover
  * (PLANS.md records the numbers): times `Bpe.tokenCount` (compiled
  * longest-first alternation regex) against `Bpe.tokenCountFast`
  * (byte-trie native expression) at increasing vocabulary sizes, on
  * the sf0.01 documents corpus. Greedy longest-match is
  * vocabulary-size-INDEPENDENT for the trie (O(matched length) per
  * position) and linear in |vocab| for the alternation scan, so the
  * regex column is expected to degrade ~linearly while the trie
  * column stays flat. The regex pass caps its doc count per size
  * (it is the documented anti-path at scale) and reports per-doc
  * time so rows stay comparable.
  *
  * Usage: `sbt "runMain graft.BpeBench"` (env SPARK_GRAFT_SF_DIR
  * overrides the corpus; default sf0.01).
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).cache()
    val nDocs = docs.count()

    // piece-count tiers: prefixes of the 50k prodVocab (greedy
    // longest-match needs no closure property for regex==trie parity)
    val tiers = Seq(160, 2000, 10000, 50000)
    // regex doc caps per tier — the alternation scan at 50k pieces is
    // minutes/corpus; per-doc ms is the honest comparable
    val regexCap = Map(160 -> nDocs, 2000 -> nDocs, 10000 -> 100L, 50000 -> 20L)

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf3(f: => Long): Double = (0 until 3).map(_ => time(f)).min

    println(f"${"pieces"}%8s ${"path"}%6s ${"docs"}%6s ${"sec"}%10s ${"ms/doc"}%10s")
    val rows = tiers.flatMap { k =>
      val vocab = Bpe.prodVocab.take(k)
      val trieSec = minOf3(
        docs.select(sum(Bpe.tokenCountFast(col("text"), vocab))).collect()(0).getLong(0))
      val cap = regexCap(k)
      val capped = docs.limit(cap.toInt).cache()
      capped.count()
      val regexSec = minOf3(
        capped.select(sum(Bpe.tokenCount(col("text"), vocab))).collect()(0).getLong(0))
      capped.unpersist()
      val out = Seq(
        (k, "trie", nDocs, trieSec, trieSec * 1000 / nDocs),
        (k, "regex", cap, regexSec, regexSec * 1000 / cap))
      out.foreach { case (p, path, d, s, md) =>
        println(f"$p%8d $path%6s $d%6d $s%10.3f $md%10.3f")
      }
      out
    }
    // merge-ranked path at fixture (127 rules) and production
    // (~50k rules) scale: a valid ordered merge list synthesized from
    // prodVocab's prefix structure — each multi-char piece is built
    // by merging its (already-created) prefix with its last char,
    // parents ranked before children, so every rule's inputs exist
    // when it fires. Shows the merge loop + per-executor word memo
    // hold at real merges-file size.
    val prodMerges: Seq[(String, String)] = Bpe.prodVocab
      .filter(p => p.length > 1 && p != " ")
      .sortBy(p => (p.length, p))
      .map(p => (p.substring(0, p.length - 1), p.substring(p.length - 1)))
    val mergeTiers = Seq(
      "fixture" -> Bpe.fixtureMerges,
      s"synthetic-${prodMerges.size}" -> prodMerges)
    val mergeRows = mergeTiers.map { case (label, merges) =>
      val sec = minOf3(
        docs.select(sum(Bpe.mergeTokenCount(col("text"), merges)))
          .collect()(0).getLong(0))
      println(f"${merges.size}%8d ${"merge"}%6s $nDocs%6d $sec%10.3f ${sec * 1000 / nDocs}%10.3f")
      (label, merges.size, sec, sec * 1000 / nDocs)
    }
    // byte-level merge path at the same two scales: the fixture's 127
    // rules and the synthetic ~50k list mapped into byte-symbol space
    // (space -> Ġ via the published encoder — symbols of letter rules
    // are their own byte symbols, so the list stays valid and firing)
    val byteTiers = Seq(
      "fixture" -> Bpe.fixtureMergesByteLevel,
      s"synthetic-${prodMerges.size}" -> prodMerges.map { case (a, b) =>
        (graft.ops.ByteLevel.encode(a), graft.ops.ByteLevel.encode(b))
      })
    val byteRows = byteTiers.map { case (label, merges) =>
      val sec = minOf3(
        docs.select(sum(Bpe.byteTokenCount(col("text"), merges)))
          .collect()(0).getLong(0))
      println(f"${merges.size}%8d ${"byte"}%6s $nDocs%6d $sec%10.3f ${sec * 1000 / nDocs}%10.3f")
      (label, merges.size, sec, sec * 1000 / nDocs)
    }
    val json = (rows.map { case (p, path, d, s, md) =>
      s"""{"pieces":$p,"path":"$path","docs":$d,"sec":$s,"ms_per_doc":$md}"""
    } ++ (mergeRows.map { case (l, n, s, md) =>
      s"""{"merges":$n,"path":"merge-$l","docs":$nDocs,"sec":$s,"ms_per_doc":$md}"""
    } ++ byteRows.map { case (l, n, s, md) =>
      s"""{"merges":$n,"path":"byte-$l","docs":$nDocs,"sec":$s,"ms_per_doc":$md}"""
    })).mkString("[", ",", "]")
    println(json)
    spark.stop()
  }
}
