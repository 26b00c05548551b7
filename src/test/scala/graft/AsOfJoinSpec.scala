package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward asof picks the latest right row at-or-before each left time") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)
    ).toDF("qkey", "qt", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"), // after 10:00 quote
      (1L, ts("2024-01-01 11:00:00"), "t2"), // exactly at 11:00 → inclusive
      (2L, ts("2024-01-01 10:00:00"), "t3"), // before any quote → no match
      (3L, ts("2024-01-01 12:00:00"), "t4")  // key with no quotes at all
    ).toDF("tkey", "tt", "tag")
    val out = AsOfJoin.backward(trades, quotes, "tkey", "qkey", "tt", "qt",
        Seq("price"))
      .select(col("tag"), col("asof.price"))
      .as[(String, Option[Double])].collect().toMap
    assert(out("t1").contains(100.0))
    assert(out("t2").contains(110.0))
    assert(out("t3").isEmpty)
    assert(out("t4").isEmpty)
  }

  test("forward asof picks the earliest right row at-or-after each left time") {
    val shipments = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)
    ).toDF("qkey", "qt", "price")
    val orders = Seq(
      (1L, ts("2024-01-01 10:30:00"), "o1"), // next shipment 11:00
      (1L, ts("2024-01-01 10:00:00"), "o2"), // exactly at 10:00 → inclusive
      (2L, ts("2024-01-01 11:00:00"), "o3"), // after last shipment → no match
      (3L, ts("2024-01-01 09:00:00"), "o4")  // key with no shipments
    ).toDF("tkey", "tt", "tag")
    val out = AsOfJoin.forward(orders, shipments, "tkey", "qkey", "tt", "qt",
        Seq("price"))
      .select(col("tag"), col("asof.price"))
      .as[(String, Option[Double])].collect().toMap
    assert(out("o1").contains(110.0))
    assert(out("o2").contains(100.0))
    assert(out("o3").isEmpty)
    assert(out("o4").isEmpty)
  }

  test("plan is one exchange + window, no range cross join") {
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 1.0)).toDF("k", "t", "v")
    val trades = Seq((1L, ts("2024-01-01 10:30:00"), "x")).toDF("k2", "t2", "tag")
    val plan = AsOfJoin.backward(trades, quotes, "k2", "k", "t2", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof must not plan a join:\n$plan")
    assert(plan.contains("Window"), plan)
  }
}
