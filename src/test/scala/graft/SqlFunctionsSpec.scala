package graft

import graft.functions.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("custom expressions are callable from SQL") {
    GraftFunctions.register(spark)
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b", "c").createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT cosine_sim(a, b) AS same, cosine_sim(a, c) AS orth FROM vecs")
      .as[(Double, Double)].collect()(0)
    assert(math.abs(r._1 - 1.0) < 1e-9)
    assert(math.abs(r._2) < 1e-9)

    Seq((Array(1L, 2L, 3L), Array(2L, 3L, 4L))).toDF("x", "y")
      .createOrReplaceTempView("sets")
    val j = spark.sql("SELECT jaccard_sorted(x, y) AS j FROM sets")
      .as[Double].collect()(0)
    assert(math.abs(j - 0.5) < 1e-9)

    val s = spark.sql(
      "SELECT regexp_replace_some('a0b0c0', '0', '_', 2) AS s")
      .as[String].collect()(0)
    assert(s == "a_b_c0")
  }
}
