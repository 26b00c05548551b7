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

  /** IVF (inverted-file) ANN: k-means coarse quantizer over the corpus,
    * each vector indexed under its nearest centroid; a query scores only the
    * `nProbe` centroid cells nearest to it. The classic recall/compute knob
    * (more probes → higher recall); centroids are trained once (seeded,
    * deterministic) and shipped as literals, so probing is pure expressions
    * and the only join is corpus-cell ∈ probed-cells.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val train = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("features", array_to_vector(col("cv").cast(ArrayType(DoubleType))))
    // a coarse quantizer only needs a bounded subsample; training on the
    // full corpus would make index build O(corpus × iters) for no recall win
    val model = new KMeans().setK(nCentroids).setSeed(42L).setMaxIter(5)
      .fit(train.select("features").limit(math.max(nCentroids * 100, 1000)))
    val indexed = model.transform(train)
      .select(col("corpus_id"), col("cv"), col("prediction").as("cell"))

    // distances from each query to every centroid, as literal arrays
    val centroids = model.clusterCenters.map(_.toArray.toSeq).toSeq
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cellDists = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(l2Sq(col("qv"), typedLit(c)).as("d"), lit(i).as("cell"))
    }: _*)
    val probed = q.withColumn("probe",
        explode(slice(array_sort(cellDists), 1, nProbe)))
      .select(col("query_id"), col("qv"), col("probe.cell").as("cell"))

    val scored = indexed.join(probed, Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
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
