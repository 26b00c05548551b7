package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of one registry query and
  * time N runs — the `.explain`-and-iterate loop SURVEY §5 prescribes.
  *
  * Usage: runMain graft.tools.PlanProbe <queryName> [sfDir] [runs] [--plan]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    // flags are position-independent: "--plan" must not be consumed as a
    // positional (q1 dir --plan previously died in runs.toInt)
    val positional = args.filterNot(_.startsWith("--"))
    val name = positional.headOption.getOrElse("q1_agg")
    val sfDir = positional.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = positional.lift(2).map(_.toInt).getOrElse(3)
    val showPlan = args.contains("--plan")
    val spark = graft.GraftSession.get()
    try {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; valid names: " +
          graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
      if (showPlan) fn(spark, sfDir).explain("formatted")
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    } finally spark.stop()
  }
}
