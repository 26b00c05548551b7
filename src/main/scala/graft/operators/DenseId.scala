package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale-safe dense sequential ID assignment (SURVEY.md §2b, reference
  * processor/AutoIncrementValueBuffer.scala:40 — the buffer hands out
  * consecutive IDs as rows stream through one actor).
  *
  * A naive Spark translation is `row_number().over(Window.orderBy(key))`,
  * which has an EMPTY partition spec: Spark funnels the entire table
  * through a single task to number it. Correct at test scale, dead at
  * 100 TB.
  *
  * The distributed equivalent keeps every stage parallel:
  *   1. range-repartition + sort-within-partitions on the key — a normal
  *      total-order sort, all partitions in parallel;
  *   2. count rows per partition and prefix-sum the counts — Spark's
  *      `zipWithIndex` does exactly this (one lightweight count job over
  *      the already-sorted RDD; only the numPartitions-length offset
  *      array ever reaches the driver);
  *   3. each task numbers its own rows from its partition offset.
  *
  * The result is identical to the global window: the i-th row in key
  * order gets `startAt + i`.
  */
object DenseId {

  /** Append `idCol` holding `startAt + rank(orderCol)` (rank 0-based in
    * ascending `orderCol` order). `orderCol` must be unique for a
    * deterministic assignment (true for primary-key re-key, the reference
    * use case).
    */
  def withDenseId(df: DataFrame, orderCol: String, idCol: String,
                  startAt: Long = 0L, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (startAt + idx))
    }
    spark.createDataFrame(indexed, schema)
  }
}
