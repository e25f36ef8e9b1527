package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._
import graft.etl.SalesTransform
import graft.report.{Overlap, RunRecords}
import graft.streaming.EventStream

/** ScalaCheck property tests for the quirky semantics flagged in
  * SURVEY §5/§7.4. Each sample spins Spark jobs, so successful-test
  * counts are kept small.
  */
abstract class SparkProperties(name: String) extends Properties(name) {
  lazy val spark = TestSpark.spark
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)
}

object OverlapProps extends SparkProperties("overlap") {
  import spark.implicits._

  private val genEvents: Gen[List[(Long, Long, String, Double)]] =
    Gen.choose(2, 25).flatMap { n =>
      Gen.listOfN(n, for {
        ts <- Gen.choose(0L, 3000000000L) // 0..50min in us
        key <- Gen.oneOf("a", "b")
        durSec <- Gen.choose(1, 600)
      } yield (ts, key, durSec.toDouble))
    }.map(_.zipWithIndex.map { case ((ts, k, d), i) => (i.toLong, ts, k, d) })

  property("binned plan == naive plan") = Prop.forAll(genEvents) { evs =>
    val df = evs.toDF("event_id", "ts_us", "event_type", "value")
    val a = Overlap.naive(df).collect().map(_.toSeq).toSeq
    val b = Overlap.binned(df, binUs = 60000000L).collect().map(_.toSeq).toSeq
    a == b
  }

  property("bounds: 0 <= ratio <= n_key - 1 (test/README.md:20)") =
    Prop.forAll(genEvents) { evs =>
      val df = evs.toDF("event_id", "ts_us", "event_type", "value")
      val nPerKey = evs.groupBy(_._3).view.mapValues(_.size).toMap
      val keyOf = evs.map(e => e._1 -> e._3).toMap
      Overlap.naive(df).collect().forall { r =>
        val ratio = r.getDouble(2)
        ratio >= 0.0 && ratio <= (nPerKey(keyOf(r.getLong(0))) - 1).toDouble + 1e-9
      }
    }
}

object DedupProps extends SparkProperties("dedup") {
  import spark.implicits._

  private val genRows: Gen[List[(Long, Long, Long)]] =
    Gen.choose(1, 40).flatMap { n =>
      Gen.listOfN(n, for {
        key <- Gen.choose(0L, 5L)
        ord <- Gen.choose(0L, 10L)
        v <- Gen.choose(0L, 100L)
      } yield (key, ord, v))
    }

  property("first-wins keeps exactly the minimum-ordered row per key") =
    Prop.forAll(genRows) { rows =>
      val df = rows.toDF("k", "ord", "v")
      val got = SalesTransform.dedupFirstWins(df, "k", Seq("ord", "v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows.groupBy(_._1).values.map(_.minBy(t => (t._2, t._3))).toSet
      got == want
    }
}

object RunRecordProps extends SparkProperties("runrecords") {
  import spark.implicits._

  property("union-fill: schema is key union, absent cells get the sentinel") =
    Prop.forAll(Gen.choose(1, 10), Gen.choose(1, 10)) { (n1, n2) =>
      val a = (1 to n1).map(i => (i.toLong, i * 10L)).toDF("id", "x")
      val b = (1 to n2).map(i => (i + 100L, i * 20L)).toDF("id", "y")
      val u = RunRecords.unionFill(Seq(a, b))
      val rows = u.collect()
      u.columns.toSet == Set("id", "x", "y") &&
        rows.count(_.getLong(u.columns.indexOf("x")) == RunRecords.Sentinel) == n2 &&
        rows.count(_.getLong(u.columns.indexOf("y")) == RunRecords.Sentinel) == n1
    }
}

object SessionProps extends SparkProperties("sessionize") {
  import spark.implicits._

  private val genTs: Gen[List[Long]] =
    Gen.choose(2, 30).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 10000L)))

  property("session index increments exactly on gaps > gapUs") =
    Prop.forAll(genTs) { tss =>
      val gap = 100L
      val evs = tss.distinct.sorted.zipWithIndex
        .map { case (ts, i) => (1L, i.toLong, ts) }
      val df = evs.toDF("user_id", "event_id", "ts_us")
      val got = EventStream.sessionizeBatch(df, gap)
        .orderBy("ts_us").select("ts_us", "session_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = got.map(_._1).scanLeft((0L, -1L, true)) {
        case ((idx, prev, first), ts) =>
          if (first) (0L, ts, false)
          else if (ts - prev > gap) (idx + 1, ts, false)
          else (idx, ts, false)
      }.drop(1).map(_._1)
      got.map(_._2).toSeq == want.toSeq
    }
}
