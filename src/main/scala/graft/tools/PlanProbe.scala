package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of one registry query and
  * time N runs — the `.explain`-and-iterate loop SURVEY §5 prescribes.
  *
  * Usage: runMain graft.tools.PlanProbe <queryName> [sfDir] [runs] [--plan]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val showPlan = args.contains("--plan")
    val spark = graft.GraftSession.get()
    try {
      val fn = graft.SparkEntry.queries(name)
      if (showPlan) fn(spark, sfDir).explain("formatted")
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    } finally spark.stop()
  }
}
