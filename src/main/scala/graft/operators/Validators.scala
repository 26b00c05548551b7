package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

import scala.util.{Failure, Success, Try}

/** Pre-flight validation — the Spark form of the reference's validator
  * actors (/root/reference/src/main/scala/com/wegtam/tensei/agent/
  * AccessValidator.scala, SyntaxValidator.scala, ChecksumValidator.scala).
  *
  * The reference validates a source before an agent run (is it reachable,
  * does it parse, does the digest match); these helpers do the same for a
  * Spark job without triggering a full scan where avoidable.
  */
object Validators {

  final case class AccessReport(path: String, accessible: Boolean,
                                detail: String)

  /** AccessValidator.scala equivalent: can the path be listed/read by the
    * Hadoop filesystem layer (covers local, HDFS, object stores)?
    */
  def checkAccess(spark: SparkSession, path: String): AccessReport = {
    val p = new org.apache.hadoop.fs.Path(path)
    Try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val status = fs.globStatus(p)
      status != null && status.nonEmpty || fs.exists(p)
    } match {
      case Success(true)  => AccessReport(path, accessible = true, "ok")
      case Success(false) => AccessReport(path, accessible = false, "not found")
      case Failure(e)     => AccessReport(path, accessible = false, e.getMessage)
    }
  }

  final case class SyntaxReport(path: String, format: String, ok: Boolean,
                                rows: Long, corruptRows: Long, detail: String)

  /** SyntaxValidator.scala equivalent: does the source parse under the
    * given format? For csv/json, PERMISSIVE mode counts corrupt rows
    * instead of failing, so the report says how dirty the source is.
    */
  def checkSyntax(spark: SparkSession, path: String, format: String,
                  schema: Option[StructType] = None): SyntaxReport =
    Try {
      val reader = format match {
        case "csv" =>
          val r = spark.read.option("header", "true").option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
          schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
        case "json" =>
          val r = spark.read.option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
          schema.fold(r)(s => r.schema(s)).json(path)
        case "parquet" => spark.read.parquet(path)
        case "xml" => spark.read.format("xml").option("rowTag", "row").load(path)
        case other => throw new IllegalArgumentException(s"unknown format: $other")
      }
      // Spark refuses to filter a raw file scan by only its corrupt-record
      // column (SPARK-21610); cache first, as its error message prescribes
      val cached = reader.cache()
      try {
        val total = cached.count()
        val corrupt =
          if (cached.columns.contains("_corrupt"))
            cached.filter(col("_corrupt").isNotNull).count()
          else 0L
        SyntaxReport(path, format, ok = corrupt == 0, total, corrupt, "ok")
      } finally cached.unpersist()
    } match {
      case Success(r) => r
      case Failure(e) =>
        SyntaxReport(path, format, ok = false, 0L, 0L, e.getMessage)
    }

  /** ChecksumValidator.scala equivalent over datasets: do two frames hold
    * identical content (order- and partitioning-independent)?
    */
  def contentMatches(a: DataFrame, b: DataFrame, cols: Seq[String]): Boolean = {
    val ca = Profiling.datasetChecksum(a, cols).collect()(0)
    val cb = Profiling.datasetChecksum(b, cols).collect()(0)
    ca == cb
  }

  /** Incremental-sync diff between two snapshots keyed by `keys`: per-key
    * status `added` (only in `b`), `removed` (only in `a`), `changed`
    * (both, but `compareCols` differ — compared by per-row hash, so one
    * full outer join + codegen'd hash is the whole cost) or `same`. This is
    * the change-detection pass a continuous source→target sync runs between
    * agent executions (the reference re-walks both sides; here it is one
    * co-partitioned join at any scale).
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val ha = a.select((keys.map(col) :+
      xxhash64(compareCols.map(col): _*).as("__ha")): _*)
    val hb = b.select((keys.map(col) :+
      xxhash64(compareCols.map(col): _*).as("__hb")): _*)
    ha.join(hb, keys, "full_outer")
      .select((keys.map(col) :+
        when(col("__ha").isNull, lit("added"))
          .when(col("__hb").isNull, lit("removed"))
          .when(col("__ha") =!= col("__hb"), lit("changed"))
          .otherwise(lit("same")).as("status")): _*)
  }
}
