package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination screening for training corpora (SURVEY.md §2e):
  * find corpus documents sharing ≥ `minShared` word k-shingles with any
  * benchmark document — the standard n-gram-overlap decontamination check.
  *
  * Shape: explode shingles on both sides, ONE equi-join shuffle on the
  * shingle, then a pair-count aggregation. Shingles stay as strings here so
  * the DuckDB oracle can replay the query exactly; a 100 TB run would
  * xxhash64 them first (same plan, 8-byte join keys — see Dedup for the
  * hashed pattern).
  */
object Contamination {

  def sharedShingles(corpus: DataFrame, bench: DataFrame,
                     textCol: String, idCol: String,
                     k: Int = 3, minShared: Int = 3): DataFrame = {
    def exploded(df: DataFrame, side: String) =
      df.select(col(idCol).as(s"${side}_id"), tokens(col(textCol)).as("toks"))
        .repartition(col(s"${side}_id"))
        .select(col(s"${side}_id"),
          explode(array_distinct(shinglesFromTokens(col("toks"), k))).as("shingle"))
    exploded(corpus, "corpus").join(exploded(bench, "bench"), "shingle")
      .filter(col("corpus_id") =!= col("bench_id"))
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(countDistinct(col("shingle")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
