package graft

import org.scalacheck.{Gen, Prop}
import org.apache.spark.sql.functions._
import graft.ops.SnapTable

/** Model-based property test for the snapshot-table protocol: a
  * random program of commits (append/overwrite, tagged/untagged,
  * replayed tags), vacuums, and torn-staging injections runs against
  * both the real [[SnapTable]] and a trivial in-memory model; after
  * EVERY step the table must agree with the model on the version
  * list, every promised version's full content, and tag idempotence.
  * The hand-written SnapTableSpec pins one scenario per invariant;
  * this pins the invariants over the protocol's whole state space —
  * including compositions the specs never wrote down (vacuum after
  * torn staging after replayed append, …).
  */
object SnapTableProps extends SparkProperties("snaptable") {
  import spark.implicits._

  private sealed trait Op
  private case class Commit(rows: Seq[(Long, Long)], append: Boolean,
      tag: Option[String]) extends Op
  private case class Vacuum(keep: Int) extends Op
  private case class Torn(rows: Seq[(Long, Long)]) extends Op
  /** Content-preserving compaction through the rewrite path: plan
    * from the head, carry nothing, stage everything — versions
    * advance, content must not move. */
  private case object Compact extends Op
  /** A write-audit-publish refusal: the audit always throws, so the
    * commit must publish NOTHING — model untouched. */
  private case class Refused(rows: Seq[(Long, Long)]) extends Op
  /** The zombie-writer transition (retry semantics): a first writer
    * commits `tag`; a second writer — the original driver, retrying
    * after a crash or a lost race — issues commitRetry with the SAME
    * tag but different rows. The retry must converge on the zombie's
    * version and append NOTHING (the model records only the first
    * commit). */
  private case class ZombieTag(rows: Seq[(Long, Long)],
      other: Seq[(Long, Long)], tag: String, append: Boolean) extends Op

  private val genRows: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(1, 4)
    ks <- Gen.listOfN(n, Gen.choose(0L, 50L))
  } yield ks.zipWithIndex.map { case (k, i) => (k * 10 + i, k) }

  private val genOp: Gen[Op] = Gen.frequency(
    6 -> (for {
      rows <- genRows
      append <- Gen.oneOf(true, false)
      tag <- Gen.option(Gen.choose(0, 3).map(i => s"t$i"))
    } yield Commit(rows, append, tag)),
    2 -> Gen.choose(1, 3).map(Vacuum(_)),
    2 -> genRows.map(Torn(_)),
    1 -> Gen.const(Compact),
    1 -> genRows.map(Refused(_)),
    2 -> (for {
      rows <- genRows
      other <- genRows
      tag <- Gen.choose(4, 6).map(i => s"z$i")
      append <- Gen.oneOf(true, false)
    } yield ZombieTag(rows, other, tag, append)))

  property("random op programs agree with the model after every step") =
    Prop.forAll(Gen.choose(0, 1), Gen.listOfN(7, genOp)) { (salt, ops) =>
      val tbl = java.nio.file.Files
        .createTempDirectory(s"graft_props_$salt").toString + "/t"
      // model: per committed version, the multiset of rows; plus the
      // tag->version map commitIfAbsent must respect
      var model = Vector.empty[(Int, Seq[(Long, Long)])] // (version, rows)
      var live = Set.empty[Int]
      var tags = Map.empty[String, Int]
      var staged = 0
      ops.foreach {
        case Commit(rows, append, tag) =>
          val prev = model.lastOption.filter(_ => append)
            .map(_._2).getOrElse(Seq.empty)
          val expectedContent = prev ++ rows
          val df = rows.toDF("k", "v")
          tag match {
            case Some(t) if tags.contains(t) =>
              // a replayed tag must return the original version and
              // change nothing — model untouched
              val got = SnapTable.commitIfAbsent(spark, df, tbl, mode(append), t)
              assert(got == tags(t), s"tag $t re-minted version $got")
            case Some(t) =>
              val got = SnapTable.commitIfAbsent(spark, df, tbl, mode(append), t)
              tags += t -> got
              model :+= (got -> expectedContent); live += got
            case None =>
              val got = SnapTable.commit(spark, df, tbl, mode(append))
              model :+= (got -> expectedContent); live += got
          }
        case Vacuum(keep) if model.nonEmpty =>
          SnapTable.vacuum(spark, tbl, keep)
          live = live.toSeq.sorted.takeRight(keep).toSet
          // retention bounds replay: a tag whose manifest was retired
          // is no longer idempotent (the vacuum-horizon contract) —
          // the model forgets it exactly as taggedVersion() does
          tags = tags.filter { case (_, v) => live(v) }
          staged = 0 // vacuum reclaims torn staging too
        case Vacuum(_) => () // nothing committed yet: vacuum requires
        case Torn(rows) =>
          staged += 1
          rows.toDF("k", "v").write.mode("overwrite")
            .parquet(s"$tbl/data/torn$staged")
        case Compact if model.nonEmpty =>
          val v = SnapTable.rewriteWithRetry(spark, tbl, h => {
            val fs = SnapTable.files(spark, tbl, h)
            (spark.read.parquet(fs.map(rel => s"$tbl/$rel"): _*)
              .coalesce(1), Seq.empty)
          })
          // a compaction is a new version with the LAST content
          model :+= (v -> model.last._2); live += v
        case Compact => () // nothing committed yet: nothing to compact
        case Refused(rows) =>
          val before = SnapTable.versions(spark, tbl)
          val thrown = scala.util.Try(SnapTable.commit(
            spark, rows.toDF("k", "v"), tbl, "overwrite",
            audit = Some(_ => sys.error("audit always refuses"))))
          assert(thrown.isFailure, "refusing audit admitted a batch")
          assert(SnapTable.versions(spark, tbl) == before,
            "a refused commit minted a version")
        case ZombieTag(rows, other, tag, append) =>
          val prev = model.lastOption.filter(_ => append)
            .map(_._2).getOrElse(Seq.empty)
          val zv = SnapTable.commitIfAbsent(
            spark, rows.toDF("k", "v"), tbl, mode(append), tag)
          if (!tags.contains(tag)) {
            tags += tag -> zv
            model :+= (zv -> (prev ++ rows)); live += zv
          } else assert(zv == tags(tag), s"tag $tag re-minted $zv")
          // the retrying original writer, same tag, different rows:
          // must converge on the committed version, append nothing
          val rv = SnapTable.commitRetry(
            spark, other.toDF("k", "v"), tbl, mode(append), Some(tag))
          assert(rv == tags(tag),
            s"commitRetry under a zombie tag minted $rv != ${tags(tag)}")
      }
      // final agreement: version list and every live version's content
      val vs = SnapTable.versions(spark, tbl)
      assert(vs == live.toSeq.sorted, s"versions $vs != model $live")
      model.filter(m => live(m._1)).foreach { case (v, rows) =>
        val got = SnapTable.read(spark, tbl, Some(v))
          .select("k", "v").as[(Long, Long)].collect().sorted.toSeq
        assert(got == rows.sorted,
          s"version $v content drifted: $got != ${rows.sorted}")
      }
      Prop.passed
    }

  private def mode(append: Boolean) = if (append) "append" else "overwrite"

  // --- manifest line format: parse ∘ format = identity over the whole
  // entry space (path, long bounds, byte size, truncated string
  // bounds) — the format grew three fields across rounds and every
  // reader of every old manifest must keep parsing every new line
  private val genB64: Gen[String] = Gen.chooseNum(0, 20)
    .flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 255)))
    .map(bs => java.util.Base64.getEncoder
      .encodeToString(bs.map(_.toByte).toArray))
  private val genEntry: Gen[SnapTable.FileEntry] = for {
    depth <- Gen.chooseNum(1, 3)
    segs <- Gen.listOfN(depth, Gen.identifier.map(_.take(12)))
    part <- Gen.option(Gen.identifier.map(_.take(6)))
    pval <- Gen.identifier.map(_.take(6))
    nStats <- Gen.chooseNum(0, 3)
    stats <- Gen.mapOfN(nStats, for {
      c <- Gen.identifier.map(_.take(8))
      a <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
      b <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
    } yield c -> (math.min(a, b), math.max(a, b)))
    nStr <- Gen.chooseNum(0, 2)
    strs <- Gen.mapOfN(nStr, for {
      c <- Gen.identifier.map(_.take(8)).suchThat(!stats.contains(_))
      mn <- genB64; mx <- genB64
    } yield c -> (mn, mx))
    size <- Gen.option(Gen.chooseNum(0L, Long.MaxValue))
  } yield SnapTable.FileEntry(
    (segs ++ part.map(p => s"$p=$pval").toSeq).mkString("data/", "/", "/f.parquet"),
    stats, size, strs)

  property("entryLine ∘ parseEntry = identity over the full entry space") =
    Prop.forAll(genEntry) { e =>
      val back = SnapTable.parseEntry(SnapTable.entryLine(e))
      back == e
    }

  property("bare-path lines (old manifests) parse to stat-less entries") =
    Prop.forAll(Gen.listOfN(3, Gen.identifier.map(_.take(10)))) { segs =>
      val p = segs.mkString("data/", "/", "/f.parquet")
      SnapTable.parseEntry(p) == SnapTable.FileEntry(p, Map.empty)
    }
}
