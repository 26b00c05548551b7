package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational / query core (SURVEY.md §2a).
  *
  * These cover the read-transform-aggregate-write surface a user of the
  * reference ETL agent (/root/reference, Tensei-Data/tensei-agent) exercises
  * through mappings + recipes, re-expressed as declarative Spark plans so
  * Catalyst handles pushdown, pruning, join strategy, and AQE handles skew.
  *
  * Oracle-parity rules (see SURVEY.md §6): every floating-point aggregate is
  * cast to an exact DECIMAL per-row *before* summation in BOTH engines, so
  * results do not depend on floating-point addition order; integer-like
  * outputs are BIGINT on both sides; timestamps stay UTC.
  */
object Relational {

  /** Exact per-row money representation: the synthetic data carries 2-decimal
    * doubles, so DECIMAL(18,4) holds them exactly in Spark and DuckDB.
    */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Canonical render of an exact decimal SUM: widen to DECIMAL(38, scale)
    * BEFORE the double cast. The synthetic money columns carry 2 actual
    * decimals, so scale-8 PRODUCT sums (price × discount) hold exact scale-4
    * values with four trailing zeros — rescaling 8→4 is exact, never rounds,
    * and keeps the unscaled value inside double's 2^53 exact range up to
    * ~9e11 in money (a scale-8 render would cross it at ~9e7). Rounding to
    * fewer real decimals is NOT safe cross-engine: Spark rescales decimals
    * HALF_UP, DuckDB HALF_EVEN, so any true tie (x.xx50) would diverge.
    */
  private def decToDouble(c: Column, scale: Int = 4): Column =
    c.cast(DecimalType(38, scale)).cast(DoubleType)

  private def ts(s: String): Column = lit(s).cast(TimestampType)

  // ---------------------------------------------------------------- q1_agg
  private def q1(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // Sum in exact decimal (order-independent), then render the final
        // scalar as DOUBLE so both engines hash the same canonical value.
        decToDouble(sum(dec(col("l_quantity")))).as("sum_qty"),
        decToDouble(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        decToDouble(sum(dec(col("l_extendedprice"))
            * (lit(1) - col("l_discount")).cast(DecimalType(18, 4))))
          .as("revenue"),
        count(lit(1)).as("n_rows")
      )

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_base_price,
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------ q2_filter_project
  // Predicate + projection that must reach the parquet scan (PushedFilters).
  private def q2(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1995-06-01") && col("l_shipdate") < ts("1996-01-01")
        && col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_shipdate"))

  private val q2Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      |  AND l_discount > 0.05""".stripMargin

  // ---------------------------------------------------------- q3_join_agg
  private def q3(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < ts("1998-01-01"))
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > ts("1998-01-01"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      // customer SCALES with the corpus — size-gate the hint (q27 lesson);
      // at bench scales the filtered segment still broadcasts
      .join(graft.operators.Joins.broadcastIfFits(c),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(decToDouble(sum(dec(col("l_extendedprice"))
          * (lit(1) - col("l_discount")).cast(DecimalType(18, 4))))
        .as("revenue"))
  }

  private val q3Sql =
    """SELECT o_orderkey, o_orderdate,
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY o_orderkey, o_orderdate""".stripMargin

  // ----------------------------------------------------- q4_broadcast_join
  // Small-dim joins (nation 25 rows, region 5 rows) must broadcast.
  private def q4(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_cust"),
        decToDouble(sum(dec(col("c_acctbal")))).as("total_acctbal"))

  private val q4Sql =
    """SELECT r_name, COUNT(*) AS n_cust,
      | CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total_acctbal
      |FROM customer, nation, region
      |WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  // -------------------------------------------------------- q5_multi_join
  private def q5(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      // supplier scales with the corpus — size-gated like q3's customer
      .join(graft.operators.Joins.broadcastIfFits(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(decToDouble(sum(dec(col("l_extendedprice"))
          * (lit(1) - col("l_discount")).cast(DecimalType(18, 4))))
        .as("revenue"))
  }

  private val q5Sql =
    """SELECT n_name,
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name""".stripMargin

  // --------------------------------------------------------- q6_cond_agg
  private def q6(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01")
        && col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .agg(decToDouble(sum(dec(col("l_extendedprice"))
          * col("l_discount").cast(DecimalType(18, 4)))).as("revenue"),
        count(lit(1)).as("n_rows"))

  private val q6Sql =
    """SELECT
      | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin

  // ------------------------------------------------------------- q7_topk
  // Deterministic top-k: unique key breaks price ties.
  private def q7(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  private val q7Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin

  // --------------------------------------------------------- q8_distinct
  private def q8(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))

  private val q8Sql =
    """SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust, COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // ----------------------------------------------------------- q9_window
  private def q9(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= 3)
  }

  private val q9Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice, rk FROM (
      | SELECT o_orderkey, o_custkey, o_totalprice,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk
      | FROM orders) t WHERE rk <= 3""".stripMargin

  // -------------------------------------------------------- q10_semi_join
  private def q10(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    Tables.customer(spark, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  private val q10Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin

  // -------------------------------------------------------- q11_anti_join
  // Customers with no urgent order (plain "no orders" is empty at every SF).
  private def q11(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  private val q11Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin

  // ------------------------------------------------------------ q12_union
  private def q12(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("id"), col("c_name").as("name"), lit("customer").as("kind"))
    val s = Tables.supplier(spark, dir).filter(col("s_acctbal") > 9000)
      .select(col("s_suppkey").as("id"), col("s_name").as("name"), lit("supplier").as("kind"))
    c.unionByName(s)
  }

  private val q12Sql =
    """SELECT c_custkey AS id, c_name AS name, 'customer' AS kind FROM customer WHERE c_acctbal > 9000
      |UNION ALL
      |SELECT s_suppkey AS id, s_name AS name, 'supplier' AS kind FROM supplier WHERE s_acctbal > 9000""".stripMargin

  // ----------------------------------------------------------- q13_rollup
  private def q13(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        decToDouble(sum(dec(col("l_quantity")))).as("sum_qty"))

  private val q13Sql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  // ---------------------------------------------------- q14_events_bucket
  // Time-bucketed event aggregation; the batch twin of the streaming
  // windowed agg in graft.streaming (SURVEY.md §2f).
  private def q14(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        decToDouble(sum(col("value").cast(DecimalType(18, 6)))).as("total"))

  private val q14Sql =
    """SELECT date_trunc('hour', ts) AS bucket, event_type, COUNT(*) AS n,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2""".stripMargin

  // ----------------------------------------------------------- q15_having
  private def q15(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        decToDouble(sum(dec(col("o_totalprice")))).as("total"))
      .filter(col("n_orders") >= 15)

  private val q15Sql =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15""".stripMargin

  // ------------------------------------------------------------ q16_pivot
  // Wide-format pivot: customer count per nation × market segment. Spark's
  // pivot with explicit values (no extra distinct pass); the oracle is the
  // equivalent conditional aggregation.
  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  private def q16(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("c_mktsegment", segments)
      .agg(count(lit(1)))
      .na.fill(0L, segments)

  private val q16Sql =
    """SELECT n_name,
      | CAST(COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS BIGINT) AS "AUTOMOBILE",
      | CAST(COUNT(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS BIGINT) AS "BUILDING",
      | CAST(COUNT(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 END) AS BIGINT) AS "FURNITURE",
      | CAST(COUNT(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 END) AS BIGINT) AS "HOUSEHOLD",
      | CAST(COUNT(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS BIGINT) AS "MACHINERY"
      |FROM customer, nation WHERE c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  // ------------------------------------------------------ q17_topk_group
  // Per-group top-k through the custom two-phase TopKPerGroup operator
  // (graft.plans) — map-side bounded heaps before the shuffle, instead of
  // the full window sort the oracle uses.
  private def q17(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopK.perGroup(
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")),
      groupBy = Seq("o_orderpriority"),
      orderBy = Seq(graft.plans.TopK.desc("o_totalprice"), graft.plans.TopK.asc("o_orderkey")),
      k = 3)

  private val q17Sql =
    """SELECT o_orderkey, o_orderpriority, o_totalprice FROM (
      | SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      | FROM orders) t WHERE rn <= 3""".stripMargin

  // ---------------------------------------------------------- q19_set_ops
  // INTERSECT / EXCEPT across branches: nations that have customers but no
  // suppliers, and vice versa, plus the overlap.
  private def q19(spark: SparkSession, dir: String): DataFrame = {
    val custNations = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast(LongType).as("nk"))
    val suppNations = Tables.supplier(spark, dir)
      .select(col("s_nationkey").cast(LongType).as("nk"))
    val both = custNations.intersect(suppNations).withColumn("kind", lit("both"))
    val custOnly = custNations.except(suppNations).withColumn("kind", lit("cust_only"))
    val suppOnly = suppNations.except(custNations).withColumn("kind", lit("supp_only"))
    both.unionByName(custOnly).unionByName(suppOnly)
  }

  private val q19Sql =
    """SELECT nk, 'both' AS kind FROM (
      | SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
      | INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier) t
      |UNION ALL
      |SELECT nk, 'cust_only' AS kind FROM (
      | SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
      | EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier) t
      |UNION ALL
      |SELECT nk, 'supp_only' AS kind FROM (
      | SELECT CAST(s_nationkey AS BIGINT) AS nk FROM supplier
      | EXCEPT SELECT CAST(c_nationkey AS BIGINT) FROM customer) t""".stripMargin

  // ------------------------------------------------------- q20_correlated
  // Orders above their own customer's average price — the correlated-
  // aggregate pattern. Formulated as price × n > sum so the comparison is
  // exact decimal arithmetic on both engines (no divided averages to hash).
  private def q20(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(spark, dir)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("tot", sum(dec(col("o_totalprice"))).over(w))
      .filter(dec(col("o_totalprice")) * col("n") > col("tot"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  private val q20Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM (
      | SELECT o_orderkey, o_custkey, o_totalprice,
      |  COUNT(*) OVER (PARTITION BY o_custkey) AS n,
      |  SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey) AS tot
      | FROM orders) t
      |WHERE CAST(o_totalprice AS DECIMAL(18,4)) * n > tot""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q20_correlated", q20, Some(q20Sql)),
    QueryDef("q1_agg", q1, Some(q1Sql)),
    QueryDef("q2_filter_project", q2, Some(q2Sql)),
    QueryDef("q3_join_agg", q3, Some(q3Sql)),
    QueryDef("q4_broadcast_join", q4, Some(q4Sql)),
    QueryDef("q5_multi_join", q5, Some(q5Sql)),
    QueryDef("q6_cond_agg", q6, Some(q6Sql)),
    QueryDef("q7_topk", q7, Some(q7Sql)),
    QueryDef("q8_distinct", q8, Some(q8Sql)),
    QueryDef("q9_window", q9, Some(q9Sql)),
    QueryDef("q10_semi_join", q10, Some(q10Sql)),
    QueryDef("q11_anti_join", q11, Some(q11Sql)),
    QueryDef("q12_union", q12, Some(q12Sql)),
    QueryDef("q13_rollup", q13, Some(q13Sql)),
    QueryDef("q14_events_bucket", q14, Some(q14Sql)),
    QueryDef("q15_having", q15, Some(q15Sql)),
    QueryDef("q16_pivot", q16, Some(q16Sql)),
    QueryDef("q17_topk_group", q17, Some(q17Sql)),
    QueryDef("q19_set_ops", q19, Some(q19Sql))
  )
}
