package graft

import graft.operators.{ForeignKey, Profiling, VanCode}
import graft.sinks.Sinks
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 reference surfaces: fixed-width flat files, network file writer,
  * sampled profiling, foreign-key fetch, vancode thread paths.
  */
class SurfacesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fixed-width files round-trip with padding, truncation and nulls") {
    val fields = Seq(("id", 4), ("name", 8), ("note", 6))
    val df = Seq(
      (1L, "alice", "ok"),
      (22L, "bob-with-long-name", "x"), // name truncated to 8
      (333L, "carol", null)             // null renders as spaces -> null again
    ).toDF("id", "name", "note")
    val tmp = java.nio.file.Files.createTempDirectory("graft_fw_spec").toString
    Sinks.writeFixedWidth(df, tmp, fields)
    val back = Sources.readFixedWidth(spark, tmp, fields)
      .select(col("id").cast("long"), col("name"), col("note"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(back === Array(
      (1L, "alice", "ok"),
      (22L, "bob-with", "x"),
      (333L, "carol", null)))
  }

  test("fixed-width reader preserves interior whitespace offsets") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fw_spec2")
    java.nio.file.Files.writeString(tmp.resolve("data.txt"), "ab  cd\n  efgh\n")
    val rows = Sources.readFixedWidth(spark, tmp.toString, Seq(("a", 4), ("b", 2)))
      .as[(String, String)].collect().toSet
    assert(rows == Set(("ab", "cd"), ("ef", "gh")))
  }

  test("network csv writer accepts file:// and rejects http with staging guidance") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_net").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Sinks.writeNetworkCsv(df, s"file://$tmp/out")
    val back = Sources.readCsv(spark, s"$tmp/out").as[(Long, String)].collect().toSet
    assert(back == Set((1L, "a"), (2L, "b")))
    val err = intercept[IllegalArgumentException] {
      Sinks.writeNetworkCsv(df, "http://example.invalid/out")
    }
    assert(err.getMessage.contains("stage"))
  }

  test("sampled profiling is deterministic and tracks the sample fraction") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    val n = li.count()
    val p1 = Profiling.numericProfile(li, Seq("l_quantity"), samplePercent = 20.0).collect()(0)
    val p2 = Profiling.numericProfile(li, Seq("l_quantity"), samplePercent = 20.0).collect()(0)
    assert(p1 == p2, "fixed-seed sample must be deterministic")
    val cnt = p1.getAs[Long]("l_quantity_count")
    assert(cnt > n / 10 && cnt < n * 3 / 10, s"20% sample returned $cnt of $n")
    val s1 = Profiling.stringProfile(Tables.customer(spark, TestSpark.sf),
      Seq("c_mktsegment"), samplePercent = 50.0).collect()(0)
    assert(s1.getAs[Long]("c_mktsegment_count") > 0)
    intercept[IllegalArgumentException] {
      Profiling.numericProfile(li, Seq("l_quantity"), samplePercent = 0.0)
    }
  }

  test("appendUnique writes each unique key once across batches and replays") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_uniq").toString + "/t"
    val b1 = Seq((1L, "a"), (2L, "b"), (2L, "b2")).toDF("k", "v")
    val n1 = Sinks.appendUnique(b1, tmp, Seq("k"))
    assert(n1 == 2) // within-batch dup on k=2 collapsed
    val b2 = Seq((2L, "replay"), (3L, "c")).toDF("k", "v")
    val n2 = Sinks.appendUnique(b2, tmp, Seq("k"))
    assert(n2 == 1) // k=2 already written -> only k=3 lands
    val keys = spark.read.parquet(tmp).select("k").as[Long].collect().sorted
    assert(keys === Array(1L, 2L, 3L))
  }

  test("foreign-key fetch resolves through the target mapping, null when absent") {
    val facts = Seq((100L, 1L), (101L, 2L), (102L, 9L)).toDF("fact_id", "fk")
    val target = Seq((1L, 501L), (2L, 502L)).toDF("k", "target_id")
    val out = ForeignKey.fetch(facts, "fk", target, "k", "target_id", "resolved")
      .select("fact_id", "resolved").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(100L -> Some(501L), 101L -> Some(502L), 102L -> None))
  }

  test("vancode matches the reference generator's documented examples") {
    // DrupalVanCodeGenerator scaladoc: c1(art1,p0)->01/, c2(art1,p1)->01.00/,
    // c3(art2,p0)->01/; deeper chain + second siblings exercise composition
    val comments = Seq(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 2L, 0L),
      (4L, 1L, 2L), (5L, 1L, 0L), (6L, 1L, 1L)
    ).toDF("cid", "article", "parent")
    val got = VanCode.withVanCodes(comments, "cid", "article", "parent")
      .select("cid", "vancode").as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "01/",       // first top-level of article 1
      2L -> "01.00/",    // first reply to c1 (replies count from 0)
      3L -> "01/",       // first top-level of article 2
      4L -> "00.01.00/", // reply to c2: ancestors nearest-parent-first
      5L -> "02/",       // second top-level of article 1
      6L -> "01.01/"     // second reply to c1
    ))
  }

  test("vancode segment uses the reference length-prefix base-36 render") {
    val segs = Seq(0L, 1L, 35L, 36L, 1295L, 1296L).toDF("n")
      .select(graft.functions.Transformers.vancodeSegment(col("n")))
      .as[String].collect()
    assert(segs === Array("00", "01", "0z", "110", "1zz", "2100"))
  }
}
