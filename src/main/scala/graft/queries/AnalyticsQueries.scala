package graft.queries

import graft.Tables
import graft.operators.{Corpus, FuzzyJoin, Profiling}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Round-5 analytics surfaces: blocked fuzzy record linkage, per-document
  * keyword extraction, and sequential funnel analysis — each with an exact
  * DuckDB oracle.
  */
object AnalyticsQueries {

  // ---------------------------------------------------- q29_fuzzy_link
  // Record linkage under entry noise: the dirty side mutates every customer
  // name deterministically (drop the '#' separator, bump the last digit), and
  // the linkage must recover pairs within 2 edits — which includes the true
  // match for every record (distance exactly 2) AND near-miss neighbors
  // whose keys differ inside the block (realistic false candidates the
  // caller thresholds). Blocking: first 7 of the name's digits, so blocks
  // hold the ~100 key-adjacent records and the join is one keyed shuffle.
  private def digitsPrefix(c: org.apache.spark.sql.Column) =
    substring(regexp_replace(c, "[^0-9]", ""), 1, 7)

  private def q29FuzzyLink(spark: SparkSession, dir: String): DataFrame = {
    val clean = Tables.customer(spark, dir)
      .select(col("c_custkey").as("cid"), col("c_name"))
    val dirty = Tables.customer(spark, dir).select(
      col("c_custkey").as("did"),
      concat(
        regexp_replace(expr("substring(c_name, 1, length(c_name)-1)"), "#", ""),
        ((expr("substring(c_name, length(c_name), 1)").cast("int") + 1) % 10)
          .cast("string")).as("d_name"))
    FuzzyJoin.byEditDistance(clean, "cid", "c_name", dirty, "did", "d_name",
        blockKey = digitsPrefix, maxDist = 2)
      .withColumnRenamed("left_id", "clean_id")
      .withColumnRenamed("right_id", "dirty_id")
  }

  private val q29FuzzyLinkSql =
    """WITH clean AS (
      | SELECT c_custkey AS clean_id, c_name,
      |  substring(regexp_replace(c_name, '[^0-9]', '', 'g'), 1, 7) AS blk
      | FROM customer),
      |dirty0 AS (
      | SELECT c_custkey AS dirty_id,
      |  replace(substring(c_name, 1, length(c_name)-1), '#', '')
      |   || CAST((CAST(substring(c_name, length(c_name), 1) AS INTEGER) + 1) % 10 AS VARCHAR)
      |   AS d_name
      | FROM customer),
      |dirty AS (
      | SELECT dirty_id, d_name,
      |  substring(regexp_replace(d_name, '[^0-9]', '', 'g'), 1, 7) AS blk
      | FROM dirty0)
      |SELECT clean_id, dirty_id, CAST(levenshtein(c_name, d_name) AS BIGINT) AS dist
      |FROM clean JOIN dirty USING (blk)
      |WHERE levenshtein(c_name, d_name) <= 2""".stripMargin

  // --------------------------------------------------------- d_tfidf
  // Distinctive-keyword extraction over the documents corpus: top-3 terms
  // per document by tf/df weight (engine-portable tf·idf family — see
  // Corpus.tfIdfTopK). The oracle replays tokenization, both aggregates and
  // the ranked window in DuckDB; integer tf/df/rk outputs keep the hash
  // compare exact.
  private def dTfidf(spark: SparkSession, dir: String): DataFrame =
    Corpus.tfIdfTopK(Tables.documents(spark, dir), "doc_id", "text", k = 3)

  private val dTfidfSql =
    """WITH tok AS (
      | SELECT doc_id, t AS token FROM (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
      |  FROM documents)
      | WHERE length(t) >= 3),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |docfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |ranked AS (
      | SELECT tf.doc_id, tf.token, tf.tf, docfreq.df,
      |  ROW_NUMBER() OVER (PARTITION BY tf.doc_id
      |   ORDER BY CAST(tf.tf AS DOUBLE) / docfreq.df DESC, tf.token) AS rk
      | FROM tf JOIN docfreq USING (token))
      |SELECT doc_id, token, tf, df, rk FROM ranked WHERE rk <= 3""".stripMargin

  // --------------------------------------------------------- q30_funnel
  // Ordered-sequence funnel on the events stream: users who viewed, then
  // clicked at-or-after their first view, then purchased at-or-after that
  // first qualifying click. Each stage is one keyed aggregate plus an
  // equi-join on user — no windows, no per-user sorts — so the funnel is
  // three shuffles at any scale. Timestamps compare as epoch MICROS on both
  // engines (the parquet is nano-precision; micros is the shared floor).
  private def q30Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val viewed = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("t1"))
    val clicked = ev.filter(col("event_type") === "click")
      .join(viewed, "user_id").where(col("us") >= col("t1"))
      .groupBy("user_id").agg(min(col("us")).as("t2"))
    val purchased = ev.filter(col("event_type") === "purchase")
      .join(clicked, "user_id").where(col("us") >= col("t2"))
      .groupBy("user_id").agg(min(col("us")).as("t3"))
    def stage(df: DataFrame, n: Long, name: String): DataFrame =
      df.agg(count(lit(1)).as("users"))
        .select(lit(n).as("stage"), lit(name).as("event_type"), col("users"))
    stage(viewed, 1L, "view")
      .unionByName(stage(clicked, 2L, "click"))
      .unionByName(stage(purchased, 3L, "purchase"))
  }

  private val q30FunnelSql =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |v AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND us >= t1 GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND us >= t2 GROUP BY 1)
      |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type, COUNT(*) AS users FROM v
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'click', COUNT(*) FROM c
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), 'purchase', COUNT(*) FROM p""".stripMargin

  // ------------------------------------------------- q25_grouping_sets
  // GROUPING SETS with grouping_id — the multi-granularity report shape
  // between q13's rollup and q16's pivot. Decimal-exact sums per the §6
  // discipline; gid disambiguates which set produced each row (Spark's
  // grouping_id() and DuckDB's GROUPING() share the Postgres bit
  // convention: leftmost column = most significant bit).
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  private def decToDouble(c: Column): Column =
    c.cast(DecimalType(38, 4)).cast(DoubleType)

  private def q25GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(decToDouble(sum(dec(col("l_quantity")))).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        grouping_id().cast(LongType).as("gid"))

  private val q25GroupingSetsSql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
      | COUNT(*) AS n_rows,
      | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin

  // ----------------------------------------------------- q33_lead_lag
  // Offset window functions (the one window family q9/q17 left uncovered):
  // per-user event inter-arrival gaps via lag over (time, event_id) — the
  // unique event_id tie-break makes first-row NULLs and every gap
  // deterministic on both engines.
  private def q33LeadLag(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    ev.withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("gap_us", col("us") - col("prev_us"))
  }

  private val q33LeadLagSql =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events)
      |SELECT user_id, event_id, us,
      | LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us,
      | us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
      |FROM e""".stripMargin

  // ---------------------------------------------------------- p_top_values
  // Value-frequency profile of a relational column through the
  // bounded-memory sketch path (Corpus.heavyHitters, generalized from
  // d_heavy_hitters): values holding > 1/8 of customer rows, exact counts
  // — the sketch exchange is `capacity` counters per partition regardless
  // of column cardinality, then the provable candidate superset recounts
  // exactly. All 5 market segments (~20% each) clear the 1/8 threshold.
  private def pTopValues(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Corpus.heavyHitters(
      Tables.customer(spark, dir).select(col("c_mktsegment")),
      "c_mktsegment", denom = 8, capacity = 64)

  private val pTopValuesSql =
    """SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
      |GROUP BY c_mktsegment
      |HAVING COUNT(*) * 8 > (SELECT COUNT(c_mktsegment) FROM customer)""".stripMargin

  // ---------------------------------------------------------- p_mode
  // Column mode with a deterministic tie-break (count desc, value asc) —
  // one partial-combined aggregate + a 1-row TakeOrdered per column.
  private def pMode(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    Profiling.columnMode(orders, "o_orderpriority")
      .unionByName(Profiling.columnMode(orders, "o_orderstatus"))
  }

  private val pModeSql =
    """SELECT * FROM (
      | SELECT 'o_orderpriority' AS col_name, CAST(o_orderpriority AS VARCHAR) AS value, COUNT(*) AS n
      | FROM orders GROUP BY 2 ORDER BY n DESC, value LIMIT 1)
      |UNION ALL
      |SELECT * FROM (
      | SELECT 'o_orderstatus' AS col_name, CAST(o_orderstatus AS VARCHAR) AS value, COUNT(*) AS n
      | FROM orders GROUP BY 2 ORDER BY n DESC, value LIMIT 1)""".stripMargin

  // ----------------------------------------------------- q34_bloom_join
  // Explicit Bloom-pruned fact-dim join: the build side (top ~4% of orders
  // by price) is selective, so the Bloom prefilter drops most lineitem rows
  // MAP-SIDE, before the join exchange. The join removes Bloom false
  // positives, so the oracle is simply the plain join — pinning exact
  // equivalence, like q27 does for salting.
  private def q34BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val build = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 480000.0)
      .select("o_orderkey", "o_totalprice")
    val probe = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    graft.operators.BloomJoin
      .innerPrefiltered(probe, "l_orderkey", build, "o_orderkey",
        expectedKeys = 20000L)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("o_totalprice"))
  }

  private val q34BloomJoinSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_totalprice > 480000.0""".stripMargin

  // ------------------------------------------------------ q35_retention
  // Cohort retention: users grouped by first-active date; day-0/1/7
  // return rates. Three keyed aggregates + one equi-join on user — the
  // standard product-analytics report, no windows anywhere.
  private def q35Retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohort = ev.groupBy("user_id").agg(min(col("d")).as("d0"))
    val activity = ev.distinct()
    activity.join(cohort, "user_id")
      .select(col("d0"), datediff(col("d"), col("d0")).cast(LongType).as("day_n"),
        col("user_id"))
      .filter(col("day_n").isin(0L, 1L, 7L))
      .groupBy("d0", "day_n")
      .agg(count_distinct(col("user_id")).as("users"))
  }

  private val q35RetentionSql =
    """WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |c AS (SELECT user_id, MIN(d) AS d0 FROM e GROUP BY 1)
      |SELECT d0, CAST(date_diff('day', d0, d) AS BIGINT) AS day_n,
      | CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users
      |FROM e JOIN c USING (user_id)
      |WHERE date_diff('day', d0, d) IN (0, 1, 7)
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------ q36_gap_fill
  // Time-series resample: per-user daily totals densified to every day in
  // the user's active span, gaps forward-filled with the last observed
  // total. Daily totals sum in exact decimal (so the forward-filled copies
  // are bit-identical on both engines); the spine generates from a per-key
  // min/max agg, never the driver.
  private def q36GapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
      .groupBy("user_id", "d")
      .agg(decToDouble(sum(dec(col("value")))).as("v"))
    graft.operators.TimeSeries.gapFillDaily(daily, "user_id", "d", "v")
  }

  private val q36GapFillSql =
    """WITH daily AS (
      | SELECT user_id, CAST(ts AS DATE) AS d,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS v
      | FROM events GROUP BY 1, 2),
      |span AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1),
      |spine AS (
      | SELECT user_id, CAST(u.day AS DATE) AS d
      | FROM span, UNNEST(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS u(day)),
      |j AS (SELECT spine.user_id, spine.d, daily.v
      |      FROM spine LEFT JOIN daily ON spine.user_id = daily.user_id AND spine.d = daily.d)
      |SELECT user_id, d,
      | LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY d
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_v,
      | CAST(v IS NULL AS BIGINT) AS is_gap
      |FROM j""".stripMargin

  // ------------------------------------------------------- p_outliers
  // Group-wise sigma-distance outliers (|x − mean| > 1.5σ) with the flag
  // computed ENTIRELY in exact decimals — compare squares, no sqrt or
  // division — so a row's outlier status is engine- and order-independent.
  // DuckDB note: operands must be ≥ DECIMAL(19) where a product exceeds 18
  // digits, or it multiplies in int64 and overflows.
  private def pOutliers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast(DecimalType(12, 2)).as("x"))
    Profiling.outliersBySigma(o, "x", "o_orderpriority", mNum = 3, mDen = 2)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("x").cast(DoubleType).as("o_totalprice"))
  }

  private val pOutliersSql =
    """WITH o AS (SELECT o_orderkey, o_orderpriority,
      |            CAST(o_totalprice AS DECIMAL(12,2)) AS x FROM orders),
      |m AS (SELECT o_orderpriority, CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
      |       CAST(SUM(x) AS DECIMAL(19,2)) AS s,
      |       CAST(SUM(CAST(x*x AS DECIMAL(25,4))) AS DECIMAL(26,4)) AS s2
      |      FROM o GROUP BY 1)
      |SELECT o_orderkey, o_orderpriority, CAST(x AS DOUBLE) AS o_totalprice
      |FROM o JOIN m USING (o_orderpriority)
      |WHERE CAST(n*x - s AS DECIMAL(19,2)) * CAST(n*x - s AS DECIMAL(19,2)) * 4
      |      > CAST(n*s2 - s*s AS DECIMAL(34,4)) * 9""".stripMargin

  // ---------------------------------------------------- p_group_median
  // PER-GROUP exact quartiles (p_percentiles is global): one
  // partial-combined percentile aggregate per group, no windows. Inputs
  // are integral (l_quantity is whole-valued; cast long), where Spark's
  // `percentile` and DuckDB's `quantile_cont` interpolate identically —
  // the proven p_percentiles path, per group.
  private def pGroupMedian(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast(LongType).as("q"))
      .groupBy("l_returnflag")
      .agg(expr("percentile(q, 0.25)").as("p25"),
        expr("percentile(q, 0.5)").as("median"),
        expr("percentile(q, 0.75)").as("p75"),
        count(lit(1)).as("n"))

  private val pGroupMedianSql =
    """SELECT l_returnflag,
      | quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS p25,
      | quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS median,
      | quantile_cont(CAST(l_quantity AS BIGINT), 0.75) AS p75,
      | COUNT(*) AS n
      |FROM lineitem GROUP BY 1""".stripMargin

  // ---------------------------------------------------- q37_moving_sum
  // RANGE-frame rolling aggregate (the VALUE-based window frame q9/q33's
  // row frames leave uncovered): per-customer 30-day rolling order value.
  // RANGE frames are peer-inclusive — two orders on the same day share one
  // frame — so the result is deterministic without a tie-break column.
  // Decimal sums per the §6 discipline (o_totalprice is a double column).
  private def q37MovingSum(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
      datediff(col("o_orderdate").cast(org.apache.spark.sql.types.DateType),
        lit("1970-01-01").cast(org.apache.spark.sql.types.DateType))
        .cast(LongType).as("d"),
      dec(col("o_totalprice")).as("p"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      .rangeBetween(-29, Window.currentRow)
    o.select(col("o_orderkey"), col("o_custkey"), col("d"),
      decToDouble(sum(col("p")).over(w)).as("roll_amt"),
      count(lit(1)).over(w).cast(LongType).as("n_win"))
  }

  private val q37MovingSumSql =
    """WITH o AS (
      | SELECT o_orderkey, o_custkey,
      |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
      |  CAST(o_totalprice AS DECIMAL(18,4)) AS p
      | FROM orders)
      |SELECT o_orderkey, o_custkey, d,
      | CAST(CAST(SUM(p) OVER w AS DECIMAL(38,4)) AS DOUBLE) AS roll_amt,
      | CAST(COUNT(*) OVER w AS BIGINT) AS n_win
      |FROM o WINDOW w AS
      | (PARTITION BY o_custkey ORDER BY d RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)""".stripMargin

  // -------------------------------------------------------- q38_ntile
  // Distribution-rank window family (ntile / percent_rank / cume_dist) —
  // the quantile-bucketing report shape. The (c_acctbal, c_custkey)
  // ordering is unique, so rank == row_number and every fraction is one
  // deterministic IEEE division of small integers on both engines.
  // SCALE NOTE: exact distribution ranks demand a total order per
  // partition key, and mktsegment has only 5 values — Spark runs one task
  // per segment here. For billion-row segments the scale-correct form is
  // the DenseId pattern per segment (repartitionByRange + per-partition
  // offsets, operators/DenseId.scala): same numbering, every stage
  // parallel. The window form is kept as the registered query because it
  // is the reference semantics at reference cardinalities.
  private def q38Ntile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"),
      ntile(4).over(w).cast(LongType).as("tile"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"))
  }

  private val q38NtileSql =
    """SELECT c_custkey, c_mktsegment,
      | CAST(NTILE(4) OVER w AS BIGINT) AS tile,
      | PERCENT_RANK() OVER w AS pr,
      | CUME_DIST() OVER w AS cd
      |FROM customer WINDOW w AS
      | (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin

  // ------------------------------------------------------------ p_mad
  // Robust dispersion profiling: per-group median absolute deviation.
  // Integral inputs put both medians on integers or exact .5 halves,
  // where Spark's percentile and DuckDB's quantile_cont interpolate
  // bit-identically (the p_percentiles / p_group_median precedent). The
  // per-group medians broadcast back; no windows anywhere.
  private def pMad(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast(LongType).as("q"))
    val med = base.groupBy("l_returnflag")
      .agg(expr("percentile(q, 0.5)").as("med"))
    base.join(broadcast(med), "l_returnflag")
      .select(col("l_returnflag"), abs(col("q") - col("med")).as("dev"))
      .groupBy("l_returnflag")
      .agg(expr("percentile(dev, 0.5)").as("mad"), count(lit(1)).as("n"))
  }

  private val pMadSql =
    """WITH m AS (
      | SELECT l_returnflag, quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS med
      | FROM lineitem GROUP BY 1)
      |SELECT l_returnflag,
      | quantile_cont(abs(CAST(l_quantity AS BIGINT) - med), 0.5) AS mad,
      | COUNT(*) AS n
      |FROM lineitem JOIN m USING (l_returnflag) GROUP BY 1""".stripMargin

  // ------------------------------------------------------- q39_growth
  // Daily active-base growth: first-seen date per user → new users per
  // day → running cumulative total. The running window is global BUT its
  // input is the per-day aggregate (≤ #days rows) — exactly the
  // aggregated-input shape the registry-wide window pin admits.
  private def q39Growth(spark: SparkSession, dir: String): DataFrame = {
    val firstSeen = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id").agg(min(col("d")).as("d0"))
    val daily = firstSeen.groupBy("d0").agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("d0"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(col("d0"), col("new_users"),
      sum(col("new_users")).over(w).as("cum_users"))
  }

  private val q39GrowthSql =
    """WITH f AS (
      | SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1),
      |d AS (SELECT d0, COUNT(*) AS new_users FROM f GROUP BY 1)
      |SELECT d0, new_users,
      | CAST(SUM(new_users) OVER (ORDER BY d0
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      |FROM d""".stripMargin

  // ---------------------------------------------- q40_scalar_subquery
  // Uncorrelated scalar subquery (the Catalyst subquery→broadcast plan
  // shape none of the DataFrame-built queries exercise), entered through
  // spark.sql — the SQL-first user's path. Above-average is computed
  // WITHOUT division: bal·n > sum in exact decimals, so no quotient
  // rounding (Spark HALF_UP vs DuckDB HALF_EVEN) can flip a boundary row.
  private def q40ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT c_custkey, c_name
        |FROM customer_v
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM customer_v) >
        |      (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer_v)
        |""".stripMargin)
  }

  private val q40ScalarSubquerySql =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
      |      (SELECT COUNT(*) FROM customer) >
      |      (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q40_scalar_subquery", q40ScalarSubquery, Some(q40ScalarSubquerySql)),
    QueryDef("p_mad", pMad, Some(pMadSql)),
    QueryDef("q39_growth", q39Growth, Some(q39GrowthSql)),
    QueryDef("q37_moving_sum", q37MovingSum, Some(q37MovingSumSql)),
    QueryDef("q38_ntile", q38Ntile, Some(q38NtileSql)),
    QueryDef("q29_fuzzy_link", q29FuzzyLink, Some(q29FuzzyLinkSql)),
    QueryDef("d_tfidf", dTfidf, Some(dTfidfSql)),
    QueryDef("q30_funnel", q30Funnel, Some(q30FunnelSql)),
    QueryDef("q25_grouping_sets", q25GroupingSets, Some(q25GroupingSetsSql)),
    QueryDef("q33_lead_lag", q33LeadLag, Some(q33LeadLagSql)),
    QueryDef("p_mode", pMode, Some(pModeSql)),
    QueryDef("p_top_values", pTopValues, Some(pTopValuesSql)),
    QueryDef("q34_bloom_join", q34BloomJoin, Some(q34BloomJoinSql)),
    QueryDef("q35_retention", q35Retention, Some(q35RetentionSql)),
    QueryDef("q36_gap_fill", q36GapFill, Some(q36GapFillSql)),
    QueryDef("p_outliers", pOutliers, Some(pOutliersSql)),
    QueryDef("p_group_median", pGroupMedian, Some(pGroupMedianSql))
  )
}
