package graft

import org.apache.spark.sql.SparkSession

/** Builds a SparkSession tuned for this engine.
  *
  * Local-mode defaults mirror what we would set per-executor on a real
  * cluster: AQE on (runtime re-plan, skew-join splitting, partition
  * coalescing), shuffle partitions sized to the parallelism instead of the
  * 200 default, UTC session time so results are oracle-comparable.
  */
object GraftSession {
  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // full engine surface out of the box: SQL-callable custom expressions
    // and the conservative top-k window rewrite
    graft.functions.GraftFunctions.register(s)
    graft.plans.TopKRewriteRule.register(s)
    s
  }
}
