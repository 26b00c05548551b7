package graft

import org.scalatest.funsuite.AnyFunSuite

/** Query-execution accounting listener: captures action name, duration and
  * row metrics after completed actions, without touching the query path.
  */
class MetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("reporter captures rows read and produced for completed actions") {
    val rep = Metrics.attach(spark)
    try {
      val n = Seq(1L, 2L, 3L, 4L).toDF("x").filter($"x" > 1).count()
      assert(n == 3)
      // listener fires on the async listener bus — poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      var got: Seq[Metrics.QueryReport] = Nil
      while (got.isEmpty && System.nanoTime() < deadline) {
        got = rep.reports.filter(r => r.action == "count" && !r.failed)
        if (got.isEmpty) Thread.sleep(50)
      }
      assert(got.nonEmpty, s"no count report arrived: ${rep.reports}")
      val r = got.last
      // Catalyst folds the x > 1 filter into the LocalRelation at
      // optimization time, so the leaf emits the 3 surviving rows
      assert(r.rowsRead == 3L, s"expected 3 rows at the leaves, got $r")
      assert(r.durationMs >= 0L)
    } finally spark.listenerManager.unregister(rep)
  }
}
