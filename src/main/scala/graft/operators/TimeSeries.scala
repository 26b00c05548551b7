package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Time-series regularization (SURVEY.md §2a companion): turning an
  * irregular event stream into a dense, gap-filled series — the resample
  * step before any windowed model or day-over-day report.
  */
object TimeSeries {

  /** Densify a per-key daily series to EVERY day between each key's first
    * and last observation, forward-filling missing days with the last
    * observed value. Input: one row per (`keyCol`, `dateCol`) — aggregate
    * first if raw events. Output: (`keyCol`, `dateCol`, filled_<valueCol>,
    * is_gap 0/1).
    *
    * 100 TB shape: the day spine generates from a per-key min/max aggregate
    * (`sequence` + `explode` — rows materialize map-side after a keyed agg,
    * no driver involvement), the attach is a co-partitioned left join, and
    * the forward fill is one window PER KEY (`last` ignoreNulls over an
    * unbounded-preceding frame) — keyed, so no global sort; a key's span is
    * its own bound.
    */
  def gapFillDaily(df: DataFrame, keyCol: String, dateCol: String,
                   valueCol: String): DataFrame = {
    val span = df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
    val spine = span.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"),
        expr("interval 1 day"))).as(dateCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(df, Seq(keyCol, dateCol), "left")
      .select(col(keyCol), col(dateCol),
        last(col(valueCol), ignoreNulls = true).over(w).as(s"filled_$valueCol"),
        col(valueCol).isNull.cast(LongType).as("is_gap"))
  }
}
