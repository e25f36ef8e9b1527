package graft

import graft.etl.SalesTransform
import graft.report.Groups

class NumericProbeSpec extends SparkSpec {
  import spark.implicits._

  test("probe mode aggregates string-numerics, drops non-parsing values") {
    val df = Seq(
      ("g", "1.5", "x"), ("g", "2.5", "y"), ("g", "oops", "z"))
      .toDF("cat", "metric_str", "label")
    // schema-driven: no numeric columns at all
    val schemaDriven = Groups.section(df, Groups.GroupConfig("cat"))
    assert(schemaDriven.columns.toSeq === Seq("cat", "uses"))
    // probe: first row "1.5" parses -> metric_str aggregated; "oops"
    // drops out (avg of 1.5, 2.5); "x" fails the probe -> excluded
    val probed = Groups.section(df,
      Groups.GroupConfig("cat", probeNumerics = true))
    assert(probed.columns.toSeq === Seq("cat", "uses", "avg_metric_str"))
    assert(probed.collect()(0).getDouble(2) === 2.0)
  }
}

class SalesEquivalenceSpec extends SparkSpec {
  test("plan-optimized transform == composable transform over sales()") {
    val cols = Seq("order_id", "region", "country", "order_priority",
      "gross_margin", "processing_days", "processing_time", "revenue_c")
    val optimized = SalesTransform.transformed(spark, sf)
      .select(cols.head, cols.tail: _*).orderBy("order_id")
      .collect().map(_.toSeq)
    val composed = SalesTransform.transform(SalesTransform.sales(spark, sf))
      .select(cols.head, cols.tail: _*).orderBy("order_id")
      .collect().map(_.toSeq)
    assert(optimized.length === composed.length)
    optimized.zip(composed).foreach { case (a, b) => assert(a === b) }
  }
}
