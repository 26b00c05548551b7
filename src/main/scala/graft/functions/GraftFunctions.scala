package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the Column
  * API — the path a SQL-first user of the engine takes.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSimExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("jaccard_sorted",
      exprs => JaccardSortedExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("regexp_replace_some",
      exprs => RegexpReplaceSomeExpr(exprs(0),
        exprs(1).eval().toString, exprs(2).eval().toString,
        exprs(3).eval().asInstanceOf[Int]), "scala_udf")
    // round-3 fused text/vector expressions
    reg.createOrReplaceTempFunction("word_shingle_hashes",
      exprs => WordShingleHashExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int], distinct = true, sorted = false), "scala_udf")
    reg.createOrReplaceTempFunction("token_hashes",
      exprs => WordShingleHashExpr(exprs(0), 1, distinct = false, sorted = false), "scala_udf")
    reg.createOrReplaceTempFunction("ngram_hashes",
      exprs => NGramHashExpr(exprs(0), exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSigExpr(exprs(0), exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("sig_agree",
      exprs => SigAgreeExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHashExpr(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("lsh_bucket",
      exprs => LshBucketExpr(exprs(0), exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    // round-4: unicode canonicalization (same names DuckDB/utf8proc use)
    reg.createOrReplaceTempFunction("nfc_normalize",
      exprs => UnicodeNormalizeExpr(exprs(0), "NFC"), "scala_udf")
    reg.createOrReplaceTempFunction("nfkc_normalize",
      exprs => UnicodeNormalizeExpr(exprs(0), "NFKC"), "scala_udf")
  }
}
