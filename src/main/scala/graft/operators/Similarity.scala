package graft.operators

import graft.functions.VectorFunctions._
import graft.functions.VectorExprs.cosineSim
import graft.plans.TopK
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2e).
  *
  * `bruteForceTopK` is the exact baseline: a broadcast of the (small) query
  * set against the full corpus — one pass, no corpus shuffle, linear in
  * |corpus|×|queries|. `lshTopK` is the scale path: corpus and queries are
  * bucketed by random-hyperplane signs so each query only scores its bucket;
  * recall is tunable via `nBits` (fewer bits → bigger buckets → higher
  * recall, more compute). `ivfBuild`/`ivfQuery` split the inverted-file
  * index lifecycle the way a production ANN deployment does: index
  * construction is an offline pass, probing is cheap and repeatable.
  *
  * All three rank tails go through [[graft.plans.TopK.perGroup]]: a
  * `row_number().over(Window.partitionBy(query_id))` tail would shuffle and
  * fully sort EVERY scored (query, candidate) pair — |corpus|×|queries| rows
  * for brute force — whereas the TopKPerGroup operator bounds each input
  * partition to k rows per query map-side, so the exchange carries at most
  * k×|queries| rows and the rank column is a window over that survivor set.
  */
object Similarity {

  /** Exact per-query top-k + rank over pre-scored candidates
    * (query_id, corpus_id, cos). See class doc for why this is not a plain
    * window.
    */
  private def rankTail(scored: DataFrame, k: Int): DataFrame = {
    val survivors = TopK.perGroup(scored, Seq("query_id"),
      Seq(TopK.desc("cos"), TopK.asc("corpus_id")), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    survivors.withColumn("rk", row_number().over(w).cast(LongType))
  }

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
    rankTail(scored, k)
  }

  // ------------------------------------------------------------------ IVF

  /** A built inverted-file index: k-means centroids (driver-side literals)
    * plus the corpus with its cell assignment, persisted so repeated probes
    * skip re-assignment. At cluster scale `indexed` would be written to a
    * parquet table partitioned by `cell` — the persist() here is the
    * single-JVM stand-in for that.
    */
  final case class IvfIndex(centroids: Seq[Seq[Double]], indexed: DataFrame) {
    def unpersist(): Unit = indexed.unpersist()
  }

  /** Centroid ids ordered by squared-L2 distance from `v` — a pure
    * codegen'd expression over centroid literals (no model object in the
    * per-row path).
    */
  private def cellRanking(v: Column, centroids: Seq[Seq[Double]]): Column =
    array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(l2Sq(v, typedLit(c)).as("d"), lit(i).as("cell"))
    }: _*))

  /** Offline index build: train a coarse quantizer on a bounded subsample
    * (a `sample()`, not a `limit()` — limit funnels rows to one partition),
    * then assign every corpus vector to its nearest centroid in one
    * distributed pass.
    */
  def ivfBuild(corpus: DataFrame, vecCol: String, idCol: String,
               nCentroids: Int = 16, trainTarget: Int = 1600,
               persist: Boolean = true): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    // a coarse quantizer only needs ~100 points per centroid; size the
    // sample fraction off the row count (cheap parquet-metadata job)
    val n = math.max(c.count(), 1L)
    val frac = math.min(1.0, trainTarget.toDouble * 1.2 / n)
    val train = c.sample(withReplacement = false, frac, seed = 42L)
      .withColumn("features", array_to_vector(col("cv").cast(ArrayType(DoubleType))))
    val model = new KMeans().setK(nCentroids).setSeed(42L).setMaxIter(5)
      .fit(train.select("features"))
    val centroids = model.clusterCenters.map(_.toArray.toSeq).toSeq
    val assigned = c.withColumn("cell",
      element_at(cellRanking(col("cv"), centroids), 1).getField("cell"))
    val indexed =
      if (persist) assigned.persist(StorageLevel.MEMORY_AND_DISK) else assigned
    IvfIndex(centroids, indexed)
  }

  /** Probe a built index: each query scores only its `nProbe` nearest cells
    * (the classic recall/compute knob). The only join is corpus-cell ∈
    * probed-cells; the rank tail is TopKPerGroup-bounded.
    */
  def ivfQuery(index: IvfIndex, queries: DataFrame,
               vecCol: String, idCol: String, k: Int, nProbe: Int = 2): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probed = q.withColumn("probe",
        explode(slice(cellRanking(col("qv"), index.centroids), 1, nProbe)))
      .select(col("query_id"), col("qv"), col("probe").getField("cell").as("cell"))
    val scored = index.indexed.join(probed, Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), cosineSim(col("qv"), col("cv")).as("cos"))
    rankTail(scored, k)
  }

  /** One-shot convenience: build + probe, index discarded afterwards.
    * STRONGLY prefer ivfBuild (once, offline) + ivfQuery (per probe) for any
    * corpus probed more than once — this re-trains the quantizer and
    * re-assigns every corpus vector on EVERY call. The transient index is
    * not persisted, so nothing leaks cached blocks after the result is
    * consumed (the cell assignment is recomputed by each downstream action,
    * which is the price of one-shot convenience).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 2): DataFrame =
    ivfQuery(ivfBuild(corpus, vecCol, idCol, nCentroids, persist = false), queries,
      vecCol, idCol, k, nProbe)

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
    rankTail(scored, k)
  }
}
