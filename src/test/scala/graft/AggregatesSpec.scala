package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("HLL approx_count_distinct is within its error bound of exact") {
    val li = Tables.lineitem(spark, sf)
    val (approx, exact) = (
      li.agg(approx_count_distinct(col("l_partkey"), 0.02)).as[Long].collect()(0),
      li.select("l_partkey").distinct().count())
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.06, s"approx=$approx exact=$exact err=$err")
  }

  test("approximate median sits between the exact 40th and 60th percentiles") {
    val li = Tables.lineitem(spark, sf)
    val p50 = li.agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .collect()(0).getDouble(0)
    val Array(p40, p60) = li.stat.approxQuantile("l_extendedprice",
      Array(0.4, 0.6), 0.0)
    assert(p50 >= p40 && p50 <= p60, s"p50=$p50 not in [$p40, $p60]")
  }

  test("network source routes schemes: ftp streams, http stages, others reject") {
    // http(s) goes through stageHttp since r6 (download-then-parse; the
    // working end-to-end test lives in SourcesSpec against a local server);
    // an unknown scheme still fails fast with guidance
    val e = intercept[IllegalArgumentException] {
      Sources.readNetworkCsv(spark, "gopher://example.com/data.csv")
    }
    assert(e.getMessage.contains("stageHttp"))
    // ftp scheme resolves to a Hadoop filesystem implementation
    val fs = new org.apache.hadoop.fs.Path("ftp://example.com/x.csv")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.getClass.getSimpleName.toLowerCase.contains("ftp"))
  }
}
