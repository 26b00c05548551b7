package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Shared join-shape helpers. */
object Joins {

  /** Default cap for [[broadcastIfFits]]: comfortably above Spark's 10 MB
    * auto-threshold (these are sides the CALLER knows are dimension-shaped,
    * so a forced hint earns more headroom than the planner's default) but
    * far below what a driver/executor can materialize as a hashed relation.
    */
  val DefaultMaxBroadcastBytes: Long = 64L << 20

  /** `broadcast(df)` when the Catalyst size estimate fits `maxBytes`,
    * otherwise `df` unchanged (the planner then picks a shuffle join, the
    * right plan for a side that grew past broadcast size).
    *
    * An UNCONDITIONAL broadcast hint on a side that scales with the corpus
    * is a scale-up killer: it overrides the planner's own size logic, and
    * the job dies on the driver's hashed-relation build exactly when the
    * data outgrows the assumption — found live by the r11 ×100 bench leg
    * ("Not enough memory to build and broadcast" after a 78 s build on a
    * salt-replicated 15M-row dimension). Every forced hint in this library
    * whose side is not structurally bounded (fixed dimension tables,
    * per-partition offset rows, k-row codebooks) routes through this gate.
    *
    * LIMITATION (review-caught): the Catalyst size estimate is only
    * meaningful for scan- or filter-topped plans, where it errs
    * CONSERVATIVE (a filter keeps its child's size with CBO off, so the
    * gate at worst withholds a hint the planner could still apply). An
    * Aggregate/Distinct-topped side's estimate is child-scaled — ≈ the
    * full input scan size regardless of group count — so gating such a
    * side here would withhold the hint exactly when the input is large
    * even for a 5-group aggregate. Sides like that gate on CARDINALITY
    * instead (one column-pruned approx_count_distinct pass — see
    * Profiling.outliersBySigma and Validators' RefIntegrity).
    */
  def broadcastIfFits(df: DataFrame,
                      maxBytes: Long = DefaultMaxBroadcastBytes): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= maxBytes)
      broadcast(df)
    else df
}
