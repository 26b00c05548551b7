package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fresh-content scale harness for the near-dup dedup family.
  *
  * [[ScaleUp]] fans tables with EXACT copies, which the r7 exact-collapse
  * rewrites (distinct-signature / distinct-gram-set / distinct-vector
  * grouping) absorb by construction — quadratic work tracks distinct
  * content, and exact copies add none. That makes the 10× ScaleUp evidence
  * the EASY case. This harness measures the hard one: every fanned copy is
  * a NEAR-duplicate with DISTINCT content (two appended tokens per text
  * copy; per-element jitter on embeddings keeping cosine ≈ 0.999), so
  * distinct-content volume grows O(n) with the fan-out and the collapse
  * optimizations cannot help. Operators run with the SAME parameters as
  * their registered queries; output is one JSON line of wall seconds and
  * result sizes per operator.
  *
  * Ids stride by 10^7 per copy — far above both the planted-fixture bases
  * and any real id — but nothing here feeds the oracle: this is a
  * perf-only harness (the correctness of each operator is pinned by its
  * sf0.01 oracle row and specs).
  *
  * Usage: runMain graft.tools.DedupScale [srcDir] [factor] [ops]
  *   ops: comma-separated subset of
  *        simhash,minhash,ngram,embed,embed12,semdedup (default: all)
  */
object DedupScale {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(30)
    val only = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, factor, only)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, factor: Int,
          only: Option[Set[String]]): Unit = {
    import graft.operators.Dedup

    val stride = 10000000L // disjoint per-copy id ranges, no fixture overlap

    // near-dup fan-out with O(n) distinct content: copy 0 is the original;
    // copy c appends two copy-and-doc-specific tokens (distinct gram sets,
    // distinct simhash for token-rich docs, true Jaccard stays high)
    val docs = Tables.documents(spark, src)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .withColumn("__c", explode(sequence(lit(0L), lit(factor - 1L))))
      .select(
        (col("doc_id") + col("__c") * stride).as("doc_id"),
        when(col("__c") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rev"), col("__c"),
            lit(" m"), pmod(col("doc_id") * 31 + col("__c"), lit(9973)))).as("text"),
        col("lang"), col("source"))

    // per-element jitter: distinct bits, direction shift ~1e-3 (cos≈0.999);
    // a pure scalar multiple would keep every hyperplane sign identical
    val embs = Tables.embeddings(spark, src)
      .select(col("vec_id"), col("embedding"))
      .withColumn("__c", explode(sequence(lit(0L), lit(factor - 1L))))
      .select(
        (col("vec_id") + col("__c") * stride).as("vec_id"),
        when(col("__c") === 0, col("embedding"))
          .otherwise(transform(col("embedding"),
            (x, i) => x * (lit(1.0d) +
              (pmod(i * col("__c"), lit(7)) - lit(3.0d)) * lit(0.001d)))
            .cast("array<float>")).as("embedding"))

    // materialize the fanned inputs as multi-file parquet (the shape scaled
    // data has; also keeps mutation cost out of every measured operator)
    val base = "target/dedupscale"
    docs.repartition(32).write.mode("overwrite").parquet(s"$base/documents.parquet")
    embs.repartition(32).write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val d = spark.read.parquet(s"$base/documents.parquet")
    val e = spark.read.parquet(s"$base/embeddings.parquet")
    val nDocs = d.count(); val nVecs = e.count()

    // diagnostic ops run only when explicitly named: ngrampf forces the
    // PPJoin prefix path regardless of block population, and on THIS
    // template-generated synthetic corpus its candidate volume measures
    // the corpus's sub-threshold similarity mass (every doc's rarest grams
    // are still shared by hundreds of template-mates), not the operator —
    // the exact reason ngramJaccardPairs auto-prefers the quadratic walk
    // until blocks outgrow maxQuadraticBlock. A-B at factor 10: identical
    // 224,794 pairs, 8.4 s quadratic vs 29.6 s forced-prefix.
    val diagnosticOnly = Set("ngrampf")
    def time(name: String)(f: => Long): Option[(String, Double, Long)] =
      if (only.exists(o => !o(name)) ||
          (only.isEmpty && diagnosticOnly(name))) None
      else {
        val t0 = System.nanoTime()
        val rows = f
        Some((name, (System.nanoTime() - t0) / 1e9, rows))
      }

    val results = Seq(
      time("simhash") {
        Dedup.simhashPairs(d, "text", "doc_id", maxDist = 3).count()
      },
      time("minhash") {
        Dedup.minhashPairs(d, "text", "doc_id",
          shingleK = 3, nHashes = 64, bands = 16, threshold = 0.5).count()
      },
      time("ngram") {
        Dedup.ngramJaccardPairs(d, "text", "doc_id",
          blockCols = Seq("lang", "source"), n = 4, threshold = 0.8).count()
      },
      time("ngrampf") { // forced PPJoin prefix-filter path (the hot-block
        // strategy) measured against the same corpus for the strategy A-B
        Dedup.ngramJaccardPairs(d, "text", "doc_id",
          blockCols = Seq("lang", "source"), n = 4, threshold = 0.8,
          maxQuadraticBlock = 0).count()
      },
      time("embed") { // the registered query's setting (8 hyperplanes)
        Dedup.embeddingPairs(e, "embedding", "vec_id",
          nBits = 8, threshold = 0.95, probeRadius = 2).count()
      },
      time("embed12") { // the scale-tuned setting: more hyperplanes ->
        // finer buckets; the operator's documented knob for larger corpora
        Dedup.embeddingPairs(e, "embedding", "vec_id",
          nBits = 12, threshold = 0.95, probeRadius = 2).count()
      },
      time("semdedup") {
        Dedup.semanticDedup(e, "embedding", "vec_id",
          nCells = 16, threshold = 0.92).count()
      }
    ).flatten

    val qjson = results.map { case (n, s, rows) =>
      s""""$n":{"sec":${f"$s%.3f"},"rows":$rows}"""
    }.mkString(",")
    println(s"""{"metric":"dedup_scale","factor":$factor,"n_docs":$nDocs,""" +
      s""""n_vecs":$nVecs,"distinct_content":true,"ops":{$qjson}}""")
  }
}
