package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}

/** The TLQ sales Transform stage, Spark-first.
  *
  * Reference semantics (see SURVEY §2.2 / §3.3; reference
  * Transform.java:227-343): CSV sales rows -> recode Order Priority
  * (Transform.java:272-287), first-wins dedup on Order ID
  * (Transform.java:259,292-294), derive Gross Margin
  * (Transform.java:295-298) and Order Processing Time with an
  * "INVALID DATE" fallback (Transform.java:300-310), then sink.
  *
  * Here the sales table is synthesized from the TPC-H-ish star schema
  * (orders x lineitem + broadcast dims), and the whole transform is a
  * single declarative plan: Catalyst fuses recode+derive+dedup into
  * one whole-stage-codegen pass — the hand-fused loop of the
  * reference's `performTransform`, for free. At 100 TB the only
  * shuffle is the dedup window keyed on order_id; dims are broadcast.
  */
object SalesTransform {

  /** P3 value recode. The reference maps single-letter codes to
    * Low/Medium/High/Critical and unknown codes to the literal string
    * "NULL" (Transform.java:63-82); same shape over the TPC-H domain,
    * with 4-NOT SPECIFIED deliberately left to the unknown path. */
  def recodePriority(c: Column): Column =
    when(c === "1-URGENT", "Critical")
      .when(c === "2-HIGH", "High")
      .when(c === "3-MEDIUM", "Medium")
      .when(c === "5-LOW", "Low")
      .otherwise("NULL")

  val recodePrioritySql: String =
    """CASE o_orderpriority
      |  WHEN '1-URGENT' THEN 'Critical'
      |  WHEN '2-HIGH' THEN 'High'
      |  WHEN '3-MEDIUM' THEN 'Medium'
      |  WHEN '5-LOW' THEN 'Low'
      |  ELSE 'NULL' END""".stripMargin

  /** Sales-shaped input: one row per lineitem with order + geography.
    * Dims (customer/nation/region) are broadcast — no shuffle for the
    * dimension joins even at cluster scale; only orders x lineitem
    * shuffles, on the join key both sides already share. */
  def sales(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cust = broadcast(Tables.customer(s, dir))
    val nat = broadcast(Tables.nation(s, dir))
    val reg = broadcast(Tables.region(s, dir))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(nat, $"c_nationkey" === $"n_nationkey")
      .join(reg, $"n_regionkey" === $"r_regionkey")
      .select(
        $"l_orderkey".as("order_id"),
        $"l_linenumber".as("line_number"),
        $"r_name".as("region"),
        $"n_name".as("country"),
        $"o_orderpriority".as("order_priority"),
        $"o_orderdate".as("order_date"),
        $"l_shipdate".as("ship_date"),
        Num.cents($"l_extendedprice").as("revenue_c"),
        Num.cents($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("cost_c"),
        Num.cents($"l_quantity").as("units_c"))
  }

  /** P5/W2 first-wins dedup: the reference keeps the first row per
    * Order ID in file order (HashSet at Transform.java:259). File
    * order here is the deterministic line_number; at scale this is a
    * single hash-partitioned window on the dedup key. */
  def dedupFirstWins(df: DataFrame, key: String, order: Seq[String]): DataFrame = {
    // argmin AGGREGATE, not a window: min(struct(order..., rest...))
    // picks the same first row (the order columns form a total order
    // per the caller contract below, so the trailing fields never
    // decide) and partial-combines map-side — one candidate row per
    // key leaves each task instead of the full partition sorting
    // under row_number.
    val rest = df.columns.filterNot(c => c == key || order.contains(c))
    val packed = (order ++ rest).map(col)
    df.groupBy(col(key))
      .agg(min(struct(packed: _*)).as("__b"))
      .select(df.columns.toIndexedSeq.map(c =>
        if (c == key) col(key) else col(s"__b.$c").as(c)): _*)
  }

  /** line_number is NOT unique per order in the synthetic data; a
    * total order over every row-varying column keeps the pick
    * deterministic (and oracle-reproducible) under ties. */
  val dedupOrder: Seq[String] =
    Seq("line_number", "ship_date", "revenue_c", "cost_c", "units_c")

  /** P1 + P2 + F3 derived columns. Gross margin is computed on exact
    * integer cents with one final IEEE division (oracle-stable);
    * processing time falls back to the literal "INVALID DATE" exactly
    * like Transform.java:306-309. */
  def derive(df: DataFrame): DataFrame =
    df.withColumn("gross_margin",
        (col("revenue_c") - col("cost_c")) / col("revenue_c"))
      .withColumn("processing_days",
        datediff(col("ship_date"), col("order_date")).cast("long"))
      .withColumn("processing_time",
        coalesce(col("processing_days").cast("string"), lit("INVALID DATE")))

  /** The full Transform: recode -> dedup -> derive (one codegen'd plan). */
  def transform(df: DataFrame): DataFrame =
    derive(
      dedupFirstWins(df, "order_id", dedupOrder)
        .withColumn("order_priority", recodePriority(col("order_priority"))))

  /** Plan-optimized Transform: the first-wins dedup runs on the slim
    * lineitem projection BEFORE any join — the window shuffle then
    * moves only the five fact columns it needs, and the joins see one
    * row per order instead of every line. Semantically identical to
    * [[transform]] over [[sales]] (all joined attributes are constant
    * per order). */
  def transformed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select(
      $"l_orderkey".as("order_id"),
      $"l_linenumber".as("line_number"),
      $"l_shipdate".as("ship_date"),
      Num.cents($"l_extendedprice").as("revenue_c"),
      Num.cents($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("cost_c"),
      Num.cents($"l_quantity").as("units_c"))
    val deduped = dedupFirstWins(li, "order_id", dedupOrder)
    val ord = Tables.orders(s, dir).select(
      $"o_orderkey".as("order_id"),
      $"o_custkey",
      recodePriority($"o_orderpriority").as("order_priority"),
      $"o_orderdate".as("order_date"))
    val geo = broadcast(
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, dir)),
          $"n_regionkey" === $"r_regionkey")
        .select($"c_custkey", $"r_name".as("region"), $"n_name".as("country")))
    derive(
      deduped
        .join(ord, Seq("order_id"))
        .join(geo, $"o_custkey" === $"c_custkey")
        .drop("o_custkey", "c_custkey"))
  }
}
