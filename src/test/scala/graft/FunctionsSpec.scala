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
}
