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

  // ------------------------------------------------------- constraints

  /** Declarative data-quality constraints (the deequ-style gate an ETL run
    * puts between load and publish — the batch generalization of the
    * reference's per-field SyntaxValidator checks).
    */
  sealed trait Constraint { def rule: String }
  /** `col` must never be null. */
  final case class NotNull(col: String) extends Constraint {
    def rule = s"not_null:$col"
  }
  /** `cols` must be unique together; violations = excess duplicate rows.
    * SQL UNIQUE-constraint semantics on NULLs: a row with ANY null key
    * column passes (matching `COUNT(DISTINCT col)`'s null handling, deequ,
    * and the DuckDB oracle) — only fully-non-null key tuples are counted
    * and deduplicated.
    */
  final case class Unique(cols: Seq[String]) extends Constraint {
    def rule = s"unique:${cols.mkString("+")}"
  }
  /** Non-null values of `col` must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Constraint {
    def rule = s"in_range:$col"
  }
  /** Non-null values of `col` must match `regex` (RE2-portable subset). */
  final case class MatchesRegex(col: String, regex: String) extends Constraint {
    def rule = s"matches:$col"
  }
  /** Non-null `col` values must exist in `ref`'s `refCol` (FK integrity).
    * `knownKeys`: pass the reference side's key cardinality when the
    * caller already knows it (a dimension table's row count, a catalog
    * stat) to skip the approx-distinct probe job the broadcast gate
    * otherwise runs at plan time.
    */
  final case class RefIntegrity(col: String, ref: DataFrame, refCol: String,
                                knownKeys: Option[Long] = None)
      extends Constraint {
    def rule = s"ref:$col"
  }
  /** Arbitrary SQL predicate every row must satisfy. */
  final case class Satisfies(name: String, predicate: String) extends Constraint {
    def rule = s"satisfies:$name"
  }

  /** Evaluate `constraints` over `df` → one row per rule:
    * (rule string, violations long). ALL row-wise rules (not-null, range,
    * regex, satisfies) AND uniqueness fuse into a SINGLE full scan (one
    * aggregate: conditional sums + count-distinct); each referential rule
    * adds one join-aggregate with a broadcastable distinct key side. The
    * whole report is one lazy DataFrame — nothing driver-side — so it runs
    * at any table size for the cost of ~one scan.
    */
  def checkConstraints(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    import org.apache.spark.sql.Column
    if (constraints.isEmpty) // empty gate: an empty report, not a reduce crash
      return df.limit(0).select(lit("").as("rule"), lit(0L).as("violations"))
    // Every conditional sum is coalesced to 0: over an EMPTY frame SUM is
    // NULL, and a gate must report "0 violations", not NULL, for a rule an
    // empty table vacuously satisfies.
    def violSum(cond: Column): Column =
      coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L))
    val rowWise: Seq[(String, Column)] = constraints.collect {
      case c @ NotNull(n) =>
        c.rule -> violSum(col(n).isNull)
      case c @ Unique(cols) =>
        // see Unique's scaladoc: null-keyed rows pass, so count and
        // dedup only fully-non-null key tuples (the `when` feeds
        // count_distinct NULL for null-keyed rows, which it ignores)
        val allNonNull = cols.map(col(_).isNotNull).reduce(_ && _)
        c.rule -> (violSum(allNonNull) -
          count_distinct(when(allNonNull, struct(cols.map(col): _*))))
      case c @ InRange(n, lo, hi) =>
        c.rule -> violSum(col(n).isNotNull && (col(n) < lo || col(n) > hi))
      case c @ MatchesRegex(n, re) =>
        c.rule -> violSum(col(n).isNotNull && !col(n).rlike(re))
      case c @ Satisfies(_, p) =>
        c.rule -> violSum(!expr(p))
    }
    val scanReport: Option[DataFrame] =
      if (rowWise.isEmpty) None
      else {
        val agg = df.agg(rowWise.head._2.as("v0"),
          rowWise.tail.zipWithIndex.map { case ((_, c), i) => c.as(s"v${i + 1}") }: _*)
        val stacked = rowWise.zipWithIndex
          .map { case ((r, _), i) => s"'${r.replace("'", "''")}', CAST(v$i AS BIGINT)" }
          .mkString(", ")
        Some(agg.select(expr(
          s"stack(${rowWise.size}, $stacked) AS (rule, violations)")))
      }
    val refReports: Seq[DataFrame] = constraints.collect {
      case c @ RefIntegrity(n, ref, refCol, knownKeys) =>
        // the reference key set scales with the referenced table: a forced
        // broadcast of a 100 TB dimension's keys dies on the driver. Gate
        // on KEY CARDINALITY (one column-pruned approx-distinct pass,
        // skipped when the caller supplied `knownKeys`) — not the Catalyst
        // size estimate, which for a Distinct over a big table is
        // child-scaled and would withhold the hint even for a 25-key
        // dimension. An oversized key set falls back to a shuffle join,
        // which the left-join + agg below absorbs.
        val nKeys = knownKeys.getOrElse(
          ref.agg(approx_count_distinct(col(refCol))).head.getLong(0))
        val keyDf = ref.select(col(refCol).as("__refkey")).distinct()
          .withColumn("__hit", lit(1))
        val keys = if (nKeys <= 1000000L) broadcast(keyDf) else keyDf
        df.select(col(n)).join(keys, col(n) === col("__refkey"), "left")
          .agg(coalesce(
            sum(when(col(n).isNotNull && col("__hit").isNull, 1L).otherwise(0L)),
            lit(0L)).cast(LongType).as("violations"))
          .select(lit(c.rule).as("rule"), col("violations"))
    }
    (scanReport.toSeq ++ refReports).reduce(_ unionByName _)
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
      // the corrupt-record column only EXISTS when it is part of the read
      // schema — CSV schema inference never adds it and caller schemas
      // rarely do, in which case PERMISSIVE silently null-pads malformed
      // rows and the report would claim ok=true over a dirty file. Resolve
      // the data schema first (infer if absent), then append _corrupt.
      def withCorrupt(s: StructType): StructType =
        if (s.fieldNames.contains("_corrupt")) s
        else s.add(org.apache.spark.sql.types.StructField("_corrupt",
          org.apache.spark.sql.types.StringType))
      val reader = format match {
        case "csv" =>
          val r = spark.read.option("header", "true").option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
          val dataSchema = schema.getOrElse(
            spark.read.option("header", "true").option("inferSchema", "true")
              .csv(path).schema)
          r.schema(withCorrupt(dataSchema)).csv(path)
        case "json" =>
          val r = spark.read.option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
          val dataSchema = schema.getOrElse(spark.read.json(path).schema)
          r.schema(withCorrupt(dataSchema)).json(path)
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
    // xxhash64 SKIPS null inputs, so a value shifting between adjacent
    // columns around a NULL would hash identically (a deterministic
    // collision class, not a random 64-bit one) and a real change would
    // report 'same'. Hash a per-column (null-flag, rendered value) pair so
    // null position is part of the digest.
    def rowHash(alias: String) = xxhash64(compareCols.flatMap(c => Seq(
      col(c).isNull.cast("int"), coalesce(col(c).cast("string"), lit("")))): _*)
      .as(alias)
    val ha = a.select((keys.map(col) :+ rowHash("__ha")): _*)
    // b's keys renamed: both snapshots typically derive from one source
    // table, and dataset-addressed join columns over shared lineage trip
    // the ambiguous-self-join detector
    val hb = b.select((keys.map(k => col(k).as(s"__b_$k")) :+ rowHash("__hb")): _*)
    // null-SAFE key match: the Seq-keys join form uses plain equality, so
    // a null-keyed row present in both snapshots would surface as a
    // spurious removed+added pair instead of same/changed
    val cond = keys.map(k => col(k) <=> col(s"__b_$k")).reduce(_ && _)
    ha.join(hb, cond, "full_outer")
      .select((keys.map(k => coalesce(col(k), col(s"__b_$k")).as(k)) :+
        when(col("__ha").isNull, lit("added"))
          .when(col("__hb").isNull, lit("removed"))
          .when(col("__ha") =!= col("__hb"), lit("changed"))
          .otherwise(lit("same")).as("status")): _*)
  }
}
