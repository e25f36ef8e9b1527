package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, VectorExprs}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

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
