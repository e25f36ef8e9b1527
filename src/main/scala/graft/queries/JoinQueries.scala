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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_star" -> (qJoinStar _),
    "q_join_semi_anti" -> (qJoinSemiAnti _))

  def oracleSql: Map[String, String] = Map(
    "q_join_star" -> qJoinStarSql,
    "q_join_semi_anti" -> qJoinSemiAntiSql)
}
