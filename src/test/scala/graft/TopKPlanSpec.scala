package graft

import graft.plans.TopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("TopK.perGroup matches the window-function formulation") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val custom = TopK.perGroup(orders, Seq("o_custkey"),
      Seq(TopK.desc("o_totalprice"), TopK.asc("o_orderkey")), 3)
      .select("o_orderkey").as[Long].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val reference = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("o_orderkey").as[Long].collect().toSet
    assert(custom == reference)
  }

  test("physical plan has partial and final phases around one exchange") {
    val orders = Tables.orders(spark, sf)
    val plan = TopK.perGroup(orders, Seq("o_orderpriority"),
      Seq(TopK.desc("o_totalprice")), 2).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPartial"), plan)
    assert(plan.contains("TopKFinal"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("partial phase bounds rows entering the shuffle") {
    val orders = Tables.orders(spark, sf).repartition(8)
    val out = TopK.perGroup(orders, Seq("o_orderpriority"),
      Seq(TopK.desc("o_totalprice")), 1)
    // 5 priorities × k=1: exactly 5 survivors regardless of input size
    assert(out.count() == 5)
    // and ≤ 8 partitions × 5 groups × k rows could have hit the exchange
    val partialMax = 8 * 5 * 1
    assert(partialMax < orders.count(), "bound must be far below input size")
  }

  test("empty groupBy is an exact global top-k") {
    val out = TopK.perGroup(Tables.orders(spark, sf).repartition(8), Seq.empty,
      Seq(TopK.desc("o_totalprice")), 5)
      .select("o_orderkey").as[Long].collect().toSet
    val reference = Tables.orders(spark, sf)
      .orderBy(col("o_totalprice").desc).limit(5)
      .select("o_orderkey").as[Long].collect().toSet
    assert(out == reference)
  }
}
