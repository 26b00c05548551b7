package graft

import graft.functions.Transformers._
import graft.pipeline.Pipeline
import graft.sinks.Sinks
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a recipe compiles to a single projection over the source") {
    val recipe = Pipeline.Recipe(Seq(
      Pipeline.oneToOne("id", "c_custkey"),
      Pipeline.allToAll("tag", Seq("c_name", "c_mktsegment"),
        cols => concatAll("|", "[", "]", cols: _*)),
      Pipeline.generated("v", lit(1L))
    ))
    val out = Pipeline.transform(Tables.customer(spark, TestSpark.sf), recipe)
    assert(out.columns.toSeq == Seq("id", "tag", "v"))
    // whole cookbook = one Project over the scan, nothing else
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.startsWith("Project") || plan.contains("Project"), plan)
    assert(!plan.contains("Join") && !plan.contains("Aggregate"), plan)
  }

  test("end-to-end run: csv source -> recipe -> json sink (the agent loop)") {
    val src = Files.createTempDirectory("pl_src") + "/in"
    val dst = Files.createTempDirectory("pl_dst") + "/out"
    Sinks.writeCsv(Seq((1L, "ann"), (2L, "bob")).toDF("id", "name"), src)
    Pipeline.run(spark,
      s => Sources.readCsv(s, src),
      Pipeline.Recipe(Seq(
        Pipeline.oneToOne("user_id", "id"),
        Pipeline.oneToOne("shout", "name", c => lowerOrUpper(c, "upper")))),
      df => Sinks.writeJson(df, dst))
    val back = Sources.readJson(spark, dst)
    assert(back.select("shout").as[String].collect().toSet == Set("ANN", "BOB"))
  }
}
