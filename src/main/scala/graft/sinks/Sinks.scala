package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SaveMode}

/** Sink connectors — the Spark form of the reference writer stack
  * (/root/reference/src/main/scala/com/wegtam/tensei/agent/writers/
  * FileWriterActor.scala, JsonFileWriterActor.scala,
  * DatabaseWriterActor.scala).
  *
  * The reference funnels all rows through one writer actor per target; here
  * every format writes one file per partition in parallel, and
  * `partitionBy` lays the output out for partition-pruned downstream scans
  * — the difference between a single-node funnel and a 100 TB sink.
  */
object Sinks {

  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               delimiter: String = ",", mode: SaveMode = SaveMode.Overwrite,
               partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
      .option("header", header.toString).option("sep", delimiter)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).csv(path)
  }

  def writeJson(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
                partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).json(path)
  }

  def writeXml(df: DataFrame, path: String, rowTag: String,
               rootTag: String = "rows", mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("xml")
      .option("rowTag", rowTag).option("rootTag", rootTag).save(path)

  def writeParquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Bucketed managed table: pre-hash the rows into `nBuckets` by `keys` at
    * write time so later equi-joins and aggregations on those keys run with
    * NO exchange — the co-located-join layout for fact tables that are
    * joined repeatedly at 100 TB. (Bucketing requires saveAsTable; plain
    * path writes can't record bucket metadata.)
    */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
                    keys: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Unique-filtered append (writers/BaseWriterFilter.scala: the reference
    * filters each write batch against already-written unique values before
    * the actual write). Spark form: dedup the batch on the unique keys,
    * anti-join what the target already holds, append the remainder — one
    * bounded scan of the target's key columns (column-pruned at the parquet
    * reader), no driver-side state. Returns the number of rows written.
    */
  def appendUnique(df: DataFrame, path: String, keys: Seq[String]): Long = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val fresh = df.dropDuplicates(keys)
    val novel =
      if (new org.apache.hadoop.fs.Path(path)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(new org.apache.hadoop.fs.Path(path))) {
        val existing = spark.read.parquet(path).select(
          keys.map(k => col(k).as(s"__x_$k")): _*)
        // null-SAFE key equality: a plain anti-join never matches null
        // keys (null = null is not true), so a null-keyed row would
        // re-append every batch — while dropDuplicates above treats nulls
        // as equal. <=> keeps the two consistent.
        val cond = keys.map(k => col(k) <=> col(s"__x_$k")).reduce(_ && _)
        fresh.join(existing, cond, "left_anti")
      } else fresh
    val n = novel.cache().count()
    if (n > 0) novel.write.mode(SaveMode.Append).parquet(path)
    novel.unpersist()
    n
  }

  /** Fixed-width flat-file sink (writers/FileWriterActor.scala writing
    * DFASDL elements with fixed byte widths): every column is rendered,
    * right-padded/truncated to its width, and the concatenated record is
    * written as one text line per row. The inverse of
    * Sources.readFixedWidth.
    */
  def writeFixedWidth(df: DataFrame, path: String, fields: Seq[(String, Int)],
                      saveMode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions._
    val rendered = fields.map { case (name, w) =>
      rpad(coalesce(col(name).cast("string"), lit("")), w, " ").substr(1, w)
    }
    df.select(concat(rendered: _*).as("value")).write.mode(saveMode).text(path)
  }

  /** Network file writer (writers/NetworkFileWriterActor.scala:64: the
    * reference pushes finished files to FTP/SFTP targets). Spark writes any
    * Hadoop-FileSystem scheme directly, so ftp:// / sftp:// URIs stream
    * partition files without a staging copy; http(s) has no Hadoop FS —
    * write locally and upload, exactly like the reference's connection-
    * management step.
    */
  def writeNetworkCsv(df: DataFrame, uri: String, header: Boolean = true,
                      delimiter: String = ",",
                      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val scheme = java.net.URI.create(uri).getScheme
    require(scheme == "ftp" || scheme == "sftp" || scheme == "file",
      s"scheme $scheme not writable as a Hadoop filesystem; stage the output " +
        "locally and upload (reference: NetworkFileWriterActor.scala uploads " +
        "after the file is complete)")
    writeCsv(df, uri, header, delimiter, mode)
  }

  /** Compact a parquet dataset's small files into ~`targetFileBytes` files.
    * Long-running ingest (streaming sinks, per-batch appends) accumulates
    * thousands of tiny files whose open/footer costs dominate scans at
    * 100 TB; periodic compaction is standard table maintenance. One
    * distributed read → round-robin repartition → write; returns the target
    * file count. Written to `outPath` (swap or retention is the caller's
    * policy — an in-place rewrite that fails midway would lose data).
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, inPath: String,
                     outPath: String, targetFileBytes: Long = 128L << 20): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inPath).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    nFiles
  }

  /** Dynamic partition overwrite: replace ONLY the hive-style partitions
    * present in `df`, leaving every other partition untouched — the
    * idempotent daily-reprocess shape for a date-partitioned 100 TB table
    * (re-running yesterday's batch must not truncate the other 3,650
    * days, which is exactly what static overwrite mode does). Scoped
    * conf: the session's partitionOverwriteMode is restored afterwards.
    */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Range-partitioned, sorted parquet layout: rows land in `nFiles` files
    * with pairwise-disjoint key ranges (repartitionByRange) and sorted
    * row groups inside each (sortWithinPartitions), so parquet min/max
    * statistics let downstream key filters skip whole files and row
    * groups — the scan-pruning layout for the columns a 100 TB table is
    * filtered by. ScaleSpec asserts the disjoint-range property on disk.
    */
  def writeSorted(df: DataFrame, path: String, keys: Seq[String],
                  nFiles: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(nFiles, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode(mode).parquet(path)
  }

  /** Z-ordered parquet layout for MULTI-dimensional scan pruning (the
    * lakehouse `OPTIMIZE ZORDER BY` shape): [[writeSorted]] makes one
    * column's file ranges disjoint but leaves every other column spanning
    * its full range per file; interleaving the bits of two columns' scaled
    * positions (a Morton curve) makes EACH file cover a compact rectangle
    * in (x, y) space, so parquet min/max statistics prune files for
    * filters on EITHER column — the layout a 100 TB table wants when two
    * independent predicates matter.
    *
    * Cost shape: one tiny min/max aggregate (2 rows to the driver), then
    * the same repartitionByRange + sortWithinPartitions as writeSorted on
    * the computed z-value — no extra shuffle versus single-key layout. The
    * z-value is a pure expression tree (shifts/masks/ors), fully codegen'd.
    * Numeric columns only; 16 bits of resolution per dimension.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    nFiles: Int, saveMode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions._
    val Row(xLo, xHi, yLo, yHi) = df.agg(
      min(col(xCol).cast("double")), max(col(xCol).cast("double")),
      min(col(yCol).cast("double")), max(col(yCol).cast("double")))
      .collect()(0)
    def scaled(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
      least(floor((col(c).cast("double") - lo) / span * 65536.0), lit(65535.0))
        .cast("long")
    }
    val x = scaled(xCol, xLo.asInstanceOf[Double], xHi.asInstanceOf[Double])
    val y = scaled(yCol, yLo.asInstanceOf[Double], yHi.asInstanceOf[Double])
    val zBits = (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1L), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
    // rows with a null coordinate sort FIRST into their own leading files
    // (least() would otherwise plant them at cell 65535 — the max corner —
    // stretching exactly the per-file min/max spans the layout tightens)
    val z = when(col(xCol).isNull || col(yCol).isNull, lit(-1L))
      .otherwise(zBits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(saveMode).parquet(path)
  }

  /** Excel .xlsx sink (the write direction of the reference's Excel
    * surface, helpers/ExcelToCSVConverter.scala). Pure-JDK OOXML writer —
    * see [[graft.sources.Excel.write]] for the streaming/row-cap contract.
    */
  def writeExcel(df: DataFrame, file: String, sheetName: String = "Sheet1"): Unit =
    graft.sources.Excel.write(df, file, sheetName)

  /** Distributed Excel sink: one workbook per partition, written
    * executor-side in parallel (see [[graft.sources.Excel.writeSharded]]).
    */
  def writeExcelSharded(df: DataFrame, dir: String, sheetName: String = "Sheet1"): Unit =
    graft.sources.Excel.writeSharded(df, dir, sheetName)

  /** JDBC writes batch per partition (DatabaseWriterActor.scala's prepared-
    * statement batches, but one concurrent writer per partition).
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: Map[String, String] = Map.empty,
                mode: SaveMode = SaveMode.Append,
                batchSize: Int = 1000): Unit = {
    val w = df.write.format("jdbc").mode(mode)
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize.toString)
    props.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }.save()
  }
}
