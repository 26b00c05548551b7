package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable capability: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same parquet
  * tables. `oracle = None` → the driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
