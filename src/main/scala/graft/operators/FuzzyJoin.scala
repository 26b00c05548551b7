package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — approximate key matching for the
  * integration case where two sources describe the same entities but the
  * join keys carry entry noise (typos, dropped separators, shifted digits).
  * The reference resolves cross-source keys exactly
  * (/root/reference/src/main/scala/com/wegtam/tensei/agent/transformers/
  * FetchForeignKeyValue.scala:41); this is the approximate generalization
  * every dedup/linkage pipeline eventually needs.
  *
  * Semantics: candidate pairs are generated WITHIN blocks — an equi-join on
  * a caller-supplied `blockKey(text)` — then scored with exact Levenshtein
  * distance and kept when `dist <= maxDist`. Blocking is part of the
  * operator contract (pairs straddling blocks are out of scope): the
  * standard record-linkage tradeoff that turns an O(|L|·|R|) cartesian
  * into one keyed shuffle. Pick the block key from domain knowledge so that
  * (a) true matches land in the same block and (b) block cardinality stays
  * bounded — both sides of that tradeoff belong to the caller.
  *
  * 100 TB shape: one hash exchange per side on the block key; within-block
  * pairing is a plain equi-join (SortMergeJoin, or broadcast when one side
  * is small); the Levenshtein filter is Spark's codegen'd built-in running
  * map-side on the joined stream. No cartesian product anywhere in the
  * plan. Skewed blocks are the caller's lever (finer key), same as every
  * blocked dedup operator in this library.
  */
object FuzzyJoin {

  /** Join `left` and `right` on approximate `*Text` equality: pairs that
    * share `blockKey` and differ by at most `maxDist` character edits.
    * Returns (left_id, right_id, dist).
    */
  def byEditDistance(left: DataFrame, leftId: String, leftText: String,
                     right: DataFrame, rightId: String, rightText: String,
                     blockKey: Column => Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    // hash-distribute the probe side by block key: when the other side
    // broadcasts, the join output inherits THIS side's partitioning, and a
    // narrow source (one file / one kafka partition) would funnel every
    // within-block pair-scoring loop into a single task. The exchange
    // carries only (id, text, block). The partition count is EXPLICIT
    // because the expensive work (|block|² scoring) happens after this
    // exchange: AQE sizes coalescing by the exchange's bytes, would see a
    // few hundred KB and merge the scoring back into one task.
    val parallelism = left.sparkSession.sparkContext.defaultParallelism
    val l = left.select(col(leftId).as("left_id"),
      col(leftText).as("__lt"), blockKey(col(leftText)).as("__blk"))
      .repartition(parallelism, col("__blk"))
    val r = right.select(col(rightId).as("right_id"),
      col(rightText).as("__rt"), blockKey(col(rightText)).as("__blk"))
    // thresholded levenshtein: banded DP + early exit, O(maxDist·n) per
    // pair instead of O(n·m) — returns -1 past the threshold, the exact
    // distance otherwise, so kept pairs carry the same dist value
    l.join(r, "__blk")
      .select(col("left_id"), col("right_id"),
        levenshtein(col("__lt"), col("__rt"), maxDist).cast("long").as("dist"))
      .filter(col("dist") >= 0)
  }
}
