package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source foreign-key resolution — the Spark form of the reference's
  * transformers/FetchForeignKeyValue.scala:41: when a migration re-keys a
  * dimension (e.g. auto-increment IDs assigned by the target database), every
  * fact row's FK must be rewritten to the value the TARGET already holds.
  * The reference queries the target DB per row through an actor; here the
  * target key mapping is read once as a DataFrame (e.g. Sources.readJdbc on
  * the target table) and resolved with ONE join.
  *
  * Scale shape: the mapping is usually dimension-sized — Catalyst broadcasts
  * it under the autoBroadcastJoinThreshold and no fact-table shuffle happens
  * at all; above the threshold it degrades gracefully to a shuffled hash
  * join. Unmatched FKs keep a null `outCol` (`left` join), matching the
  * reference's "no value found" path.
  */
object ForeignKey {

  /** Rewrite `df.fkCol` through `mapping` (a snapshot of the target table):
    * append `outCol` = `mapping.valueCol` where `df.fkCol = mapping.keyCol`.
    */
  def fetch(df: DataFrame, fkCol: String,
            mapping: DataFrame, keyCol: String, valueCol: String,
            outCol: String): DataFrame = {
    // one value per key, deterministically (min): a duplicated key in the
    // mapping snapshot (re-run extract) would otherwise MULTIPLY matching
    // fact rows through the join — the reference's per-row lookup returns
    // exactly one value
    val m = mapping
      .groupBy(col(keyCol).as("__fk_key"))
      .agg(min(col(valueCol)).as(outCol))
    df.join(m, df(fkCol) === col("__fk_key"), "left").drop("__fk_key")
  }
}
