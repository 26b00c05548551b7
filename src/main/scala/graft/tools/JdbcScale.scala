package graft.tools

import org.apache.spark.sql.functions._

/** Throughput harness for the keyed JDBC write family (upsert / delete /
  * CDC) against embedded Derby — the scale evidence for the r9/r10 DB-sync
  * sinks. Orders at the given SF seeds the target (Spark's own jdbc
  * writer), then one measured pass each: a keyed UPDATE+INSERT batch
  * (writeJdbcUpsert), a full CDC batch with tombstones (writeJdbcCdc), and
  * an idempotent re-application. Prints ONE JSON line.
  *
  * Embedded Derby is a single-process floor, not a distributed target —
  * the numbers bound the SINK overhead (binding, batching, transactions,
  * key routing), which is what transfers to a real warehouse endpoint:
  * rows/s scale with the target's ingest capacity, the per-partition
  * transaction shape is already the 1000-executor one.
  *
  * Usage: runMain graft.tools.JdbcScale [sfDir]
  */
object JdbcScale {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    try {
      val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
      val dbDir = java.nio.file.Files.createTempDirectory("jdbcscale").toString
      val url = s"jdbc:derby:$dbDir/db;create=true"
      val base = graft.Tables.orders(spark, src)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          col("o_orderdate"))
      val n = base.count()
      def timed[A](f: => A): (Double, A) = {
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val (tSeed, _) = timed {
        graft.sinks.Sinks.writeJdbc(base, url, "orders_t", props,
          mode = org.apache.spark.sql.SaveMode.Overwrite)
      }
      // upsert batch: every 10th key changed, every 7th key re-keyed high
      val changed = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      val fresh = base.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(10000000000L))
      val upsBatch = changed.unionByName(fresh)
      val nUps = upsBatch.count()
      val (tUps, _) = timed {
        graft.sinks.Sinks.writeJdbcUpsert(upsBatch, url, "orders_t",
          Seq("o_orderkey"), props)
      }
      // CDC batch: updates (every 20th), tombstones (every 13th)
      val cdc = base.filter(col("o_orderkey") % 20 === 0 &&
          col("o_orderkey") % 13 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") + 2.0)
        .withColumn("__op", lit("U"))
        .unionByName(base.filter(col("o_orderkey") % 13 === 0)
          .withColumn("__op", lit("D")))
      val nCdc = cdc.count()
      val (tCdc, _) = timed {
        graft.sinks.Sinks.writeJdbcCdc(cdc, url, "orders_t",
          Seq("o_orderkey"), "__op", "D", props)
      }
      // idempotence: re-apply the same CDC batch (absent keys delete 0)
      val (tRe, _) = timed {
        graft.sinks.Sinks.writeJdbcCdc(cdc, url, "orders_t",
          Seq("o_orderkey"), "__op", "D", props)
      }
      val nFinal = graft.sources.Sources
        .readJdbc(spark, url, "orders_t", props).count()
      def f(d: Double) = f"$d%.3f"
      def rate(rows: Long, s: Double) = (rows / math.max(s, 1e-9)).round
      println(s"""{"metric":"jdbc_scale","n_seed":$n,""" +
        s""""seed_s":${f(tSeed)},"seed_rows_per_s":${rate(n, tSeed)},""" +
        s""""upsert_rows":$nUps,"upsert_s":${f(tUps)},"upsert_rows_per_s":${rate(nUps, tUps)},""" +
        s""""cdc_rows":$nCdc,"cdc_s":${f(tCdc)},"cdc_rows_per_s":${rate(nCdc, tCdc)},""" +
        s""""reapply_s":${f(tRe)},"final_rows":$nFinal}""")
    } finally spark.stop()
  }
}
