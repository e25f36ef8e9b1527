package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}

/** Join-shape queries (SURVEY §2.3). The reference's only joins are
  * nested loops over in-memory lists; here each gets the right Spark
  * physical shape: broadcast for dims, semi/anti for existence
  * (the invalidator filter P12 is semantically an anti-join).
  */
object JoinQueries extends graft.QueryModule {

  /** Star join: revenue per nation. Dims broadcast — the fact table
    * shuffles only for the lineitem x orders equi-join. */
  def qJoinStar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(Num.cents($"l_extendedprice" * (lit(1.0) - $"l_discount")))
          .as("revenue_c"))
      .orderBy($"n_name")
  }

  val qJoinStarSql: String =
    s"""SELECT n_name, count(*) AS n_lines,
       |  ${Num.sumSql(Num.centsSql("l_extendedprice*(1.0-l_discount)"))}
       |    AS revenue_c
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Semi + anti join: per market segment, customers with and without
    * orders. */
  def qJoinSemiAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
    val active = cust.join(ord, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_active"))
    val inactive = cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_inactive"))
    active.join(inactive, Seq("c_mktsegment"), "full_outer")
      .na.fill(0L, Seq("n_active", "n_inactive"))
      .orderBy($"c_mktsegment")
  }

  val qJoinSemiAntiSql: String =
    """SELECT c_mktsegment,
      |  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_active,
      |  CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_inactive
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Product-side star: revenue by part brand × supplier nation —
    * the lineitem fact against BOTH its product dimensions (part,
    * supplier→nation), all broadcast, with the aggregate partial
    * map-side. Covers the two fixture tables no other entry touches;
    * at cluster scale the fact never shuffles before the group-by
    * exchange, whose volume is O(brands × nations). */
  def qPartsSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_suppkey",
        Num.cents($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev_c"))
      .join(broadcast(Tables.part(s, dir).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(s, dir).select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"p_brand", $"n_name".as("supp_nation"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum($"rev_c").as("revenue_c"))
      .orderBy($"p_brand", $"supp_nation")
  }

  val qPartsSupplierSql: String =
    s"""SELECT p_brand, n_name AS supp_nation, count(*) AS n_lines,
       |  ${Num.sumSql(Num.centsSql("l_extendedprice*(1.0-l_discount)"))}
       |    AS revenue_c
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY p_brand, n_name ORDER BY p_brand, supp_nation""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_star" -> (qJoinStar _),
    "q_join_semi_anti" -> (qJoinSemiAnti _),
    "q_parts_supplier" -> (qPartsSupplier _))

  def oracleSql: Map[String, String] = Map(
    "q_join_star" -> qJoinStarSql,
    "q_join_semi_anti" -> qJoinSemiAntiSql,
    "q_parts_supplier" -> qPartsSupplierSql)
}
