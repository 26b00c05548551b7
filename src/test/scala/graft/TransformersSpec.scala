package graft

import graft.functions.Transformers._
import graft.functions.RegexFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TransformersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  test("concatAll mirrors Concat prefix/sep/suffix semantics") {
    val r = Seq(("a", "b")).toDF("x", "y")
      .select(concatAll("-", "<", ">", col("x"), col("y"))).collect()(0).getString(0)
    assert(r == "<a-b>")
  }

  test("replaceSome replaces only the first N matches (custom expression)") {
    val df = Seq("a0b0c0d").toDF("s")
    assert(df.select(replaceSome(col("s"), "0", "_", 2)).collect()(0).getString(0) == "a_b_c0d")
    assert(df.select(replaceFirst(col("s"), "0", "_")).collect()(0).getString(0) == "a_b0c0d")
    assert(df.select(replaceAllOf(col("s"), Seq("0"), "_")).collect()(0).getString(0) == "a_b_c_d")
    // zero matches and null input
    assert(df.select(replaceSome(col("s"), "z", "_", 3)).collect()(0).getString(0) == "a0b0c0d")
    val nulls = Seq[Option[String]](None).toDF("s")
    assert(nulls.select(replaceSome(col("s"), "0", "_", 1)).collect()(0).isNullAt(0))
  }

  test("splitSelect returns empty string for missing positions like Split.scala") {
    val df = Seq("x#y").toDF("s")
    assert(df.select(splitSelect(col("s"), "#", 1)).collect()(0).getString(0) == "y")
    assert(df.select(splitSelect(col("s"), "#", 9)).collect()(0).getString(0) == "")
  }

  test("ifThenElseNumeric parses the reference mini-grammar") {
    val df = Seq(10L, 50L).toDF("v")
    val out = df.select(ifThenElseNumeric(col("v"), "x<25", "x=x*2", "x=x+1").as("r"))
      .as[Long].collect()
    assert(out.toSeq == Seq(20L, 51L))
    // constant branch and reversed operand
    val out2 = df.select(ifThenElseNumeric(col("v"), "25>x", "100", "x=3-x").as("r"))
      .as[Long].collect()
    assert(out2.toSeq == Seq(100L, -47L))
  }

  test("timestampCalibrate add/reduce are inverse for whole seconds") {
    val df = Seq(1700000000123L).toDF("ms")
    val s = df.select(timestampCalibrate(col("ms"), "reduce")).collect()(0).getLong(0)
    assert(s == 1700000000L)
    val back = df.select(timestampCalibrate(timestampCalibrate(col("ms"), "reduce"), "add"))
      .collect()(0).getLong(0)
    assert(back == 1700000000000L)
  }

  test("lowerOrUpper firstupper/firstlower only touch the first char") {
    val df = Seq("hELLO").toDF("s")
    assert(df.select(lowerOrUpper(col("s"), "firstupper")).collect()(0).getString(0) == "HELLO")
    assert(df.select(lowerOrUpper(col("s"), "firstlower")).collect()(0).getString(0) == "hELLO")
  }

  test("overwrite produces typed constants like Overwrite.scala defaults") {
    assert(one(overwrite("", "long")) == 0L)
    assert(one(overwrite("", "date")).toString == "1970-01-01")
    assert(one(overwrite("7", "long")) == 7L)
  }

  test("extractBiggestString picks the longest input") {
    val df = Seq(("abc", "zz")).toDF("a", "b")
    assert(df.select(extractBiggestString(col("a"), col("b"))).collect()(0).getString(0) == "abc")
  }

  test("generated ids are unique and monotonic per partition") {
    val df = Tables.customer(spark, TestSpark.sf)
      .select(monotonically_increasing_id().as("id"))
    assert(df.distinct().count() == df.count())
  }
}
