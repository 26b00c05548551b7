package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * The distributed equivalent keeps every stage parallel and entirely
  * inside the DataFrame world (Tungsten rows + whole-stage codegen,
  * no RDD round-trip):
  *   1. range-repartition on the key — one full-data exchange,
  *      materialized once (lazy localCheckpoint) so the counting branch
  *      and the numbering branch read the SAME partitioning. Two separate
  *      physical exchanges would each sample their own range boundaries
  *      (column pruning makes them non-identical for wide inputs, so
  *      exchange reuse cannot be relied on) and counts from one boundary
  *      set applied under another would duplicate or skip ids;
  *   2. count rows per shuffle partition with a tiny aggregation (at most
  *      `numPartitions` groups) and prefix-sum the counts into partition
  *      offsets — the one empty-partition-spec window in the plan runs
  *      over that partition-count-bounded aggregate, never over data rows;
  *   3. sort within partitions and number each row as
  *      `offset(partition) + local row index`. The local index is
  *      `monotonically_increasing_id() - (partition_id << 33)`: Spark's
  *      per-task counter with its partition-id prefix stripped, evaluated
  *      in the same codegen stage as the sort, so no second exchange and
  *      no extra job. The offsets reach the data via a broadcast join.
  *
  * The result is identical to the global window: the i-th row in key
  * order gets `startAt + i`. Construction is lazy (the checkpoint
  * materializes at first use); the full table crosses the wire exactly
  * once and every operator around the materialized scan is
  * codegen-friendly.
  *
  * Limits: assumes < 2^33 rows per shuffle partition (the bit budget of
  * `monotonically_increasing_id`'s per-task counter) — size `numPartitions`
  * accordingly at scale.
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
    val pid = "__graft_pid"
    val cnt = "__graft_cnt"
    val off = "__graft_off"
    val loc = "__graft_local"

    // explicit numPartitions pins the shuffle (REPARTITION_BY_NUM) so AQE
    // cannot coalesce the two consumers differently — and the LAZY
    // localCheckpoint pins the range BOUNDARIES: without it the counting
    // branch column-prunes to a key-only plan, the two physical exchanges
    // are no longer identical (no ReuseExchange), and each runs its OWN
    // RangePartitioner boundary sampling — per-partition counts from one
    // boundary set applied as offsets under another duplicates/skips ids
    // (r8 review). The checkpoint materializes once at first use; both
    // branches then read the same blocks, so pids and counts line up by
    // construction. (Cost: one local materialization of the ranged table —
    // the price of a deterministic two-consumer partitioning.)
    val ranged = df.repartitionByRange(parts, col(orderCol))
      .localCheckpoint(eager = false)

    // ≤ `parts` groups: the prefix-sum window below is bounded by the
    // partition count, not the data size.
    val counts = ranged
      .select(spark_partition_id().as(pid))
      .groupBy(col(pid)).agg(count(lit(1)).as(cnt))
    val w = Window.orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.select(
      col(pid), coalesce(sum(col(cnt)).over(w), lit(0L)).as(off))

    // local 0-based row index in sorted order: monotonically_increasing_id
    // is (partitionId << 33) + rowCounter within the task, so subtracting
    // the prefix leaves the counter. Evaluated above the sort in the same
    // whole-stage-codegen stage.
    val localIdx =
      monotonically_increasing_id() -
        shiftleft(spark_partition_id().cast(LongType), 33)

    ranged
      .sortWithinPartitions(orderCol)
      .withColumn(pid, spark_partition_id())
      .withColumn(loc, localIdx)
      .join(broadcast(offsets), Seq(pid))
      .withColumn(idCol, (lit(startAt) + col(off) + col(loc)).cast(LongType))
      .drop(pid, off, loc)
  }
}
