package graft.operators

import graft.functions.VectorFunctions._
import graft.functions.VectorExprs.cosineSim
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2e).
  *
  * `bruteForceTopK` is the exact baseline: a broadcast of the (small) query
  * set against the full corpus — one pass, no corpus shuffle, linear in
  * |corpus|×|queries|. `lshTopK` is the scale path: corpus and queries are
  * bucketed by random-hyperplane signs so each query only scores its bucket;
  * recall is tunable via `nBits` (fewer bits → bigger buckets → higher
  * recall, more compute).
  */
object Similarity {

  /** Exact cosine top-k for each query vector. `queries` is expected to be
    * broadcast-sized (the common "probe a corpus" shape); the corpus is
    * never shuffled — scores compute map-side and only (query, k) survivors
    * cross the wire for the final per-query top-k.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), cosineSim(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
  }

  /** LSH-bucketed ANN: both sides hash to `nBits` hyperplane-sign buckets;
    * candidates are bucket-mates; exact cosine ranks within bucket. One
    * shuffle on the bucket id for both sides.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int, nBits: Int = 6): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), nBits).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), nBits).as("bucket"))
    val scored = c.join(q, Seq("bucket")).filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), cosineSim(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
  }
}
