package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the latest right row with
  * `rightTime <= leftTime` for the same key — the point-in-time lookup
  * (trades: quote-at-trade-time; here: a user's latest order before an
  * event).
  *
  * Spark has no as-of join operator, and the naive inequality join explodes
  * to a range cross product. This composition is the scalable shape: tag and
  * union both inputs, ONE shuffle+sort per key on (time, side), then a
  * running `last(right payload, ignoreNulls)` window carries the most recent
  * right row forward onto each left row. Cost = one exchange + one sort,
  * independent of match fan-out.
  *
  * Right rows must be unique per (key, time) for determinism — pre-aggregate
  * duplicates upstream (see the q18 query for the pattern).
  */
object AsOfJoin {

  /** Shared prep of both directions: tag and union the two inputs on
    * (__key, __t, __is_right, __pay). Right rows with a NULL key or NULL
    * time are dropped UP FRONT — under the window formulation a null-time
    * right row sorts first (nulls-first asc) and would act as
    * time = -infinity, matching left rows that have no true predecessor;
    * and a null KEY would pair null-key left rows with null-key right rows,
    * the opposite of equi-join semantics. Left null-key/time rows stay:
    * null-KEY left rows match nothing (asof = null) in both directions;
    * null-TIME left rows match nothing in [[backward]] (they sort before
    * every right row) but match the key's overall EARLIEST right row in
    * [[forward]] (they sort after every right row in its DESC running
    * frame) — see forward's ordering note.
    */
  private def prepped(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String,
                      rightPayload: Seq[String]): (DataFrame, Seq[String]) = {
    val payload = struct(rightPayload.map(col): _*)
    val r = right.select(
      col(rightKey).as("__key"), col(rightTime).cast("timestamp").as("__t"),
      lit(1).as("__is_right"), payload.as("__pay"))
      .filter(col("__key").isNotNull && col("__t").isNotNull)
    val leftCols = left.columns.toSeq
    val l = left.select(
      (col(leftKey).as("__key") +: col(leftTime).cast("timestamp").as("__t") +:
        lit(0).as("__is_right") +: lit(null).cast(r.schema("__pay").dataType).as("__pay") +:
        leftCols.map(col)): _*)
    val unioned = r
      .withColumns(leftCols.map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
      .unionByName(l)
    (unioned, leftCols)
  }

  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame = {
    val (unioned, leftCols) = prepped(left, right, leftKey, rightKey,
      leftTime, rightTime, rightPayload)
    // right rows sort before left rows at equal time -> inclusive match
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select((leftCols.map(col) :+ col("__match").as("asof")): _*)
  }

  /** Forward as-of join: the EARLIEST right row with `rightTime >= leftTime`
    * per key (next-quote / next-shipment lookup) — the mirror composition:
    * same single shuffle+sort, with the window running backward from the
    * end and right rows sorting after left rows at equal time so the match
    * stays inclusive.
    */
  def forward(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTime: String, rightTime: String,
              rightPayload: Seq[String]): DataFrame = {
    val (unioned, leftCols) = prepped(left, right, leftKey, rightKey,
      leftTime, rightTime, rightPayload)
    // RUNNING frame over time DESCENDING, not first() over
    // [currentRow, unboundedFollowing] (r16): Spark evaluates an
    // unbounded-FOLLOWING frame by re-scanning from each row to the
    // partition end — O(n²) per key partition — while the running
    // unbounded-PRECEDING frame is a single O(n) pass. Scanning the
    // future-to-past order, the last right payload seen is exactly the
    // earliest rightTime >= leftTime; right rows sort before left rows at
    // equal time (__is_right desc) so the match stays inclusive, and
    // null-time left rows sort last and match the same earliest-right row
    // the old formulation gave them. Row-identical output (spec + oracle).
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t").desc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select((leftCols.map(col) :+ col("__match").as("asof")): _*)
  }
}
