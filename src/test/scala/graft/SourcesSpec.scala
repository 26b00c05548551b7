package graft

import graft.sources.Sources
import graft.sinks.Sinks
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val sample = Seq(
    (1L, "alpha", 10.5, "2024-01-01"),
    (2L, "beta", 20.25, "2024-01-02"),
    (3L, "gamma", -3.0, "2024-01-03")
  ).toDF("id", "name", "amount", "day")

  test("csv round-trip with header and schema inference") {
    val dir = tmp("csv") + "/out"
    Sinks.writeCsv(sample, dir)
    val back = Sources.readCsv(spark, dir)
    assert(back.count() == 3)
    assert(back.schema("id").dataType.typeName == "integer" ||
      back.schema("id").dataType.typeName == "long")
    assert(back.filter(col("name") === "beta").count() == 1)
  }

  test("csv honors custom delimiter") {
    val dir = tmp("csvd") + "/out"
    Sinks.writeCsv(sample, dir, delimiter = ";")
    val back = Sources.readCsv(spark, dir, delimiter = ";")
    assert(back.columns.toSeq == Seq("id", "name", "amount", "day"))
    assert(back.count() == 3)
  }

  test("json round-trip preserves values") {
    val dir = tmp("json") + "/out"
    Sinks.writeJson(sample, dir)
    val back = Sources.readJson(spark, dir)
    assert(back.count() == 3)
    assert(back.filter(col("amount") < 0).select("name").as[String].collect().toSeq
      == Seq("gamma"))
  }

  test("xml round-trip via Spark 4 native xml source") {
    val dir = tmp("xml") + "/out"
    Sinks.writeXml(sample, dir, rowTag = "row")
    val back = Sources.readXml(spark, dir, rowTag = "row")
    assert(back.count() == 3)
    assert(back.columns.toSet == Set("id", "name", "amount", "day"))
  }

  test("jdbc round-trip through embedded Derby") {
    val db = tmp("derby") + "/testdb"
    val url = s"jdbc:derby:$db;create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    Sinks.writeJdbc(sample, url, "sample_table", props,
      mode = SaveMode.Overwrite)
    val back = Sources.readJdbc(spark, url, "sample_table", props)
    assert(back.count() == 3)
    assert(back.schema.fieldNames.map(_.toLowerCase).toSet ==
      Set("id", "name", "amount", "day"))
    // partitioned parallel read path
    val part = Sources.readJdbc(spark, url, "sample_table", props,
      partitionColumn = Some("id"), lowerBound = 1, upperBound = 4, numPartitions = 2)
    assert(part.rdd.getNumPartitions == 2)
    assert(part.count() == 3)
  }

  test("orc round-trip") {
    val dir = tmp("orc") + "/out"
    Sinks.writeOrc(sample, dir)
    assert(Sources.readOrc(spark, dir).count() == 3)
  }

  test("partitionBy produces partition-pruned layout") {
    val dir = tmp("part") + "/out"
    Sinks.writeParquet(sample, dir, partitionBy = Seq("day"))
    val back = Sources.readParquet(spark, dir)
    val plan = back.filter(col("day") === "2024-01-01")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("day"), plan)
  }

  test("schema extraction emits DDL like the reference SchemaExtractor") {
    val ddl = Sources.extractSchemaDdl(sample)
    assert(ddl.contains("id BIGINT") && ddl.contains("name STRING"))
    assert(Sources.extractSchemaJson(sample).contains("\"name\":\"amount\""))
  }

  test("excel round-trips through the pure-JDK xlsx source/sink") {
    // full coverage lives in ExcelSpec; this pins the Sources/Sinks surface
    val dir = tmp("xlsx")
    Sinks.writeExcel(sample, dir + "/s.xlsx")
    val back = Sources.readExcel(spark, dir)
    assert(back.columns.toSeq == Seq("id", "name", "amount", "day"))
    assert(back.count() == 3)
    assert(back.filter(col("name") === "beta").count() == 1)
  }
}
