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

  /** CO-LOCATED bucketed join — the other shuffle-elimination class a
    * 100 TB star lives by (runtime partition pruning being
    * `q_partition_prune`): both fact tables land `bucketBy(8, key)` +
    * `sortBy(key)` once, and every subsequent equi-join on that key
    * consumes the bucketed layout with ZERO exchange on either side —
    * the one-time write cost is amortized across every downstream
    * join, exactly how a nightly-joined fact pair should be stored.
    * The entry REQUIRES the shuffle-free shape in its own physical
    * plan (an equi-join present, no ShuffleExchange anywhere beneath
    * it), so a co-location regression fails the correctness gate.
    * Tables register in the session's in-memory catalog with an
    * explicit external path under the scratch root — no warehouse
    * directory is touched, repeated runs drop and re-create. */
  def qBucketedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = StreamQueries.scratch(s, "bkt")
    s.sql("DROP TABLE IF EXISTS graft_bkt_orders")
    s.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    Tables.orders(s, dir).select($"o_orderkey", $"o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$tmp/orders").saveAsTable("graft_bkt_orders")
    Tables.lineitem(s, dir).select($"l_orderkey",
        Num.cents($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev_c"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$tmp/lineitem").saveAsTable("graft_bkt_lineitem")
    // MERGE hint: at fixture scale Catalyst would broadcast instead
    // (hiding the layout question entirely); production fact-fact
    // joins are exactly the ones too big to broadcast, and the hint
    // pins that shape so the bucket co-location is what's under test
    val out = s.table("graft_bkt_orders").hint("merge")
      .join(s.table("graft_bkt_lineitem"), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), sum($"rev_c").as("revenue_c"))
      .orderBy($"o_orderpriority")
    val joins = out.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    require(joins.nonEmpty, "expected a shuffle-class equi-join in the plan")
    val shuffled = joins.exists(_.collectFirst {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.isDefined)
    require(!shuffled,
      "bucketed join still shuffles an input — co-location regressed")
    out
  }

  val qBucketedJoinSql: String =
    s"""SELECT o_orderpriority, count(*) AS n_lines,
       |  ${Num.sumSql(Num.centsSql("l_extendedprice*(1.0-l_discount)"))}
       |    AS revenue_c
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** RUNTIME BLOOM-FILTER join pruning (the third shuffle-reduction
    * class beside DPP and bucketing): a selective dimension filter
    * (urgent orders, 1/5th of the table) makes Catalyst build a bloom
    * filter over the surviving join keys and inject a
    * `might_contain` probe into the FACT side BELOW its shuffle — at
    * 100 TB that's ~80% of the fact rows dropped before they are
    * hashed, serialized and shuffled, paid for with one xxhash probe
    * per row inside the scan stage's codegen span. The entry REQUIRES
    * the injected filter in its own physical plan (a regression fails
    * the correctness gate) and materializes INSIDE the conf window so
    * the gated result is produced by the asserted plan; broadcast is
    * pinned off because fact-fact joins are exactly the ones too big
    * to broadcast (the `q_bucketed_join` argument).
    *
    * Oracle: the plain filtered join — the bloom filter is a pure
    * pass-through optimization (false positives only ever ADMIT rows
    * the join then drops), so the result must be bit-identical. */
  def qRuntimeFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = StreamQueries.scratch(s, "rbf")
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val li = Tables.lineitem(s, dir).select($"l_orderkey",
        Num.cents($"l_quantity").as("qty_c"))
      val ord = Tables.orders(s, dir)
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", $"o_orderstatus")
      val out = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_lines"), sum($"qty_c").as("qty_sum_c"))
      val plan = out.queryExecution.executedPlan.toString
      require(plan.contains("bloom_filter_agg"),
        "runtime bloom filter missing from the join plan")
      // the conf window closes in finally — materialize the gated
      // result now, so what the oracle checks IS the asserted plan's
      // output (a later lazy execution would re-plan without confs)
      out.coalesce(1).write.parquet(s"$tmp/out")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
    s.read.parquet(s"$tmp/out").orderBy($"o_orderstatus")
  }

  val qRuntimeFilterSql: String =
    s"""SELECT o_orderstatus, count(*) AS n_lines,
       |  ${Num.sumSql(Num.centsSql("l_quantity"))} AS qty_sum_c
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '1-URGENT'
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** SALTED JOIN under the oracle ([[graft.ops.Salting.saltedJoin]] —
    * the explicit skew lever for the case AQE cannot re-plan): the
    * fact side's 5-value event_type key is the textbook hot-key shape
    * (every key is a monster key); the salt spreads each over 8
    * reducers while the small side replicates once per salt. The
    * oracle is the PLAIN join — salting is a pure pass-through
    * rewrite, so the result must be bit-identical; the entry also
    * REQUIRES the executed join to really key on the salt (no
    * silent de-salting by the optimizer). */
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = StreamQueries.scratch(s, "salt")
    // broadcast pinned OFF for the whole build-and-materialize window:
    // a broadcast hash join never shuffles the fact side on (key,
    // salt), so the skew-spreading this entry documents would not
    // actually execute — the salt must reach a SHUFFLE join's keys
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val saved = s.conf.getOption(k)
    s.conf.set(k, "-1")
    try {
      val ev = Tables.events(s, dir)
        .select($"event_type", $"event_id", Num.cents($"value").as("value_c"))
      // slim dim derived from the same corpus: per-type weight
      val dim = ev.select($"event_type").distinct()
        .withColumn("weight", length($"event_type").cast("long"))
      val joined = graft.ops.Salting.saltedJoin(
        ev, dim, "event_type", saltFrom = $"event_id", salts = 8)
      val out = joined.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value_c" * $"weight").as("weighted_c"))
        .orderBy($"event_type")
      // sparkPlan, not executedPlan: AQE's adaptive wrapper hides the
      // join from a naive collect until execution
      val joins = out.queryExecution.sparkPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      require(joins.exists(j => j.leftKeys.size >= 2 &&
          !j.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
        "salted join must keep (key, salt) on a SHUFFLE-class join")
      // materialize inside the conf window so the gated result is
      // produced by the asserted (shuffled, salted) plan
      out.coalesce(1).write.parquet(s"$tmp/out")
    } finally saved match {
      case Some(v) => s.conf.set(k, v)
      case None => s.conf.unset(k)
    }
    s.read.parquet(s"$tmp/out").orderBy($"event_type")
  }

  val qSaltedJoinSql: String =
    s"""WITH d AS (SELECT DISTINCT event_type,
       |             CAST(length(event_type) AS BIGINT) AS weight
       |           FROM events),
       |ev AS (SELECT event_type, ${Num.centsSql("value")} AS value_c
       |       FROM events)
       |SELECT ev.event_type, count(*) AS n,
       |  ${Num.sumSql("value_c * weight")} AS weighted_c
       |FROM ev JOIN d ON ev.event_type = d.event_type
       |GROUP BY ev.event_type ORDER BY ev.event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_star" -> (qJoinStar _),
    "q_join_semi_anti" -> (qJoinSemiAnti _),
    "q_parts_supplier" -> (qPartsSupplier _),
    "q_bucketed_join" -> (qBucketedJoin _),
    "q_runtime_filter" -> (qRuntimeFilter _),
    "q_salted_join" -> (qSaltedJoin _))

  def oracleSql: Map[String, String] = Map(
    "q_join_star" -> qJoinStarSql,
    "q_join_semi_anti" -> qJoinSemiAntiSql,
    "q_parts_supplier" -> qPartsSupplierSql,
    "q_bucketed_join" -> qBucketedJoinSql,
    "q_runtime_filter" -> qRuntimeFilterSql,
    "q_salted_join" -> qSaltedJoinSql)
}
