package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination screening for training corpora (SURVEY.md §2e):
  * find corpus documents sharing ≥ `minShared` word k-shingles with any
  * benchmark document — the standard n-gram-overlap decontamination check.
  *
  * Shape: explode shingle HASHES on both sides, ONE equi-join shuffle on
  * 8-byte keys, then a pair-count aggregation. Hashing shrinks the shuffle
  * ~4-8× versus string shingles and cannot move a ≥minShared count (64-bit
  * collisions), so the string-based DuckDB oracle still matches exactly.
  */
object Contamination {

  def sharedShingles(corpus: DataFrame, bench: DataFrame,
                     textCol: String, idCol: String,
                     k: Int = 3, minShared: Int = 3): DataFrame = {
    // shingle hashes map-side in one fused pass (WordShingleHashExpr), so
    // the only exchange in the whole check is the 8-byte-key equi-join —
    // no text or token array ever crosses the wire
    def exploded(df: DataFrame, side: String) =
      df.select(col(idCol).as(s"${side}_id"),
          explode(graft.functions.ShingleHash.wordShingleHashes(col(textCol), k)).as("sh"))
    exploded(corpus, "corpus").join(exploded(bench, "bench"), "sh")
      .filter(col("corpus_id") =!= col("bench_id"))
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(countDistinct(col("sh")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
