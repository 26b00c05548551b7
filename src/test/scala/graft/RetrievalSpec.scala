package graft

import graft.operators.{Corpus, Retrieval}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval stack (BM25 / query-likelihood / RRF), PMI co-occurrence and
  * exact context-window packing: formula pins on hand-computed fixtures,
  * ranking invariants, and tiling invariants.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana banana banana durian apple"),
    (3L, "cherry cherry durian"),
    (4L, "apple apple apple apple banana")
  ).toDF("doc_id", "text")

  test("lexStats aggregates tf/dl/df/totals exactly") {
    val s = Retrieval.lexStats(fixture, "doc_id", "text", minTokenLen = 3)
    val tf = s.tf.as[(Long, String, Long, Long)].collect()
      .map { case (id, tok, f, dl) => ((id, tok), (f, dl)) }.toMap
    assert(tf((1L, "apple")) == ((2L, 4L)))
    assert(tf((2L, "banana")) == ((3L, 5L)))
    assert(tf((4L, "apple")) == ((4L, 5L)))
    val df = s.df.as[(String, Long)].collect().toMap
    assert(df == Map("apple" -> 3L, "banana" -> 3L, "cherry" -> 2L, "durian" -> 2L))
    val (n, tot) = s.totals.as[(Long, Long)].collect().head
    assert(n == 4L && tot == 17L)
  }

  test("bm25PerTerm matches the hand-computed Okapi formula (log-free idf)") {
    val s = Retrieval.lexStats(fixture, "doc_id", "text")
    val q = Retrieval.queryTermsByDf(s.df, nTerms = 1, offset = 0) // 'apple', df=3
    val got = Retrieval.bm25PerTerm(s, q, k1 = 1.2, b = 0.75, logIdf = false)
      .select("doc_id", "s").as[(Long, Double)].collect().toMap
    // doc 1: tf=2, dl=4; N=4, df=3, avgdl=17/4
    val k1 = 1.2; val b = 0.75
    def score(tf: Long, dl: Long): Double = {
      val idf = (4.0 - 3L + 0.5) / (3L + 0.5)
      val avgdl = 17.0 / 4L
      idf * ((tf * (k1 + 1.0)) / ((tf + k1 * (1.0 - b)) + (k1 * b * dl) / avgdl))
    }
    assert(got(1L) == score(2L, 4L))
    assert(got(2L) == score(1L, 5L))
    assert(got(4L) == score(4L, 5L))
    assert(!got.contains(3L)) // no 'apple' in doc 3
  }

  test("logIdf=true ranks single-term queries identically to the odds form") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val s = Retrieval.lexStats(docs, "doc_id", "text")
    val q = Retrieval.queryTermsByDf(s.df, nTerms = 1, offset = 11)
    def ranks(logIdf: Boolean) = Retrieval.topK(
        Retrieval.fuseFixedOrder(
          Retrieval.bm25PerTerm(s, q, logIdf = logIdf), Seq(12)), 20)
      .select("doc_id", "rk").as[(Long, Long)].collect().toMap
    assert(ranks(logIdf = false) == ranks(logIdf = true))
  }

  test("fuseFixedOrder folds per-term scores left-to-right with 0.0 for absent") {
    val s = Retrieval.lexStats(fixture, "doc_id", "text")
    val q = Retrieval.queryTermsByDf(s.df, nTerms = 2, offset = 0) // apple, banana
    val per = Retrieval.qlPerTerm(s, q)
    val fused = Retrieval.fuseFixedOrder(per, Seq(1, 2))
      .select("doc_id", "tf_1", "tf_2", "dl", "score")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: apple tf 2/dl 4, banana 1/4 → 0.5 + 0.25
    assert(fused(1L) == ((1L, 2L, 1L, 4L, (2.0 / 4L) + (1.0 / 4L))))
    // doc 3 has neither query term → absent entirely
    assert(!fused.contains(3L))
    // doc 4: apple 4/5, banana 1/5
    assert(fused(4L)._5 == (4.0 / 5L) + (1.0 / 5L))
  }

  test("bm25TopK / hybridTopK one-call wrappers: k ranked rows, deterministic") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val a = Retrieval.bm25TopK(docs, "doc_id", "text", k = 15)
      .select("doc_id", "rk").as[(Long, Long)].collect().sortBy(_._2)
    assert(a.length == 15 && a.map(_._2).toSeq == (1L to 15L))
    val again = Retrieval.bm25TopK(docs, "doc_id", "text", k = 15)
      .select("doc_id", "rk").as[(Long, Long)].collect().sortBy(_._2)
    assert(a.toSeq == again.toSeq)
    val h = Retrieval.hybridTopK(docs, "doc_id", "text", k = 12)
      .select("doc_id", "r_a", "r_b", "rk").as[(Long, Long, Long, Long)]
      .collect()
    assert(h.length == 12 && h.map(_._4).sorted.toSeq == (1L to 12L))
    // every fused row cites at least one source list
    assert(h.forall(r => r._2 > 0 || r._3 > 0))
  }

  test("bm25TopK plan: TakeOrdered cut, no corpus-scale range sort") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val df = Retrieval.bm25TopK(docs, "doc_id", "text", k = 20)
    df.collect()
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): String = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case other => other.toString
    }
    val plan = unwrap(df.queryExecution.executedPlan)
    // the final cut is per-partition heaps + a k-row driver merge
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // neither the vocabulary cut nor the top-k may global-sort the corpus
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("extendLexStats(lexStats(a), b) == lexStats(a ∪ b) value-for-value") {
    val a = Tables.documents(spark, TestSpark.sf).limit(300)
      .select(col("doc_id"), col("text"))
    val b = Seq((900001L, "apple banana apple"), (900002L, "cherry cherry"),
      (900003L, "zzzz unseen token")).toDF("doc_id", "text")
    val inc = Retrieval.extendLexStats(Retrieval.lexStats(a, "doc_id", "text"),
      b, "doc_id", "text")
    val full = Retrieval.lexStats(a.unionByName(b), "doc_id", "text")
    def tfSet(s: Retrieval.LexStats) =
      s.tf.as[(Long, String, Long, Long)].collect().toSet
    def dfSet(s: Retrieval.LexStats) = s.df.as[(String, Long)].collect().toSet
    def tot(s: Retrieval.LexStats) = s.totals.as[(Long, Long)].collect().head
    assert(tfSet(inc) == tfSet(full))
    assert(dfSet(inc) == dfSet(full))
    assert(tot(inc) == tot(full))
    // the delta genuinely contributes: an unseen token appears df=1
    assert(dfSet(inc).contains(("zzzz", 1L)) || dfSet(inc).contains(("unseen", 1L)))
  }

  test("hybridDenseTopK == rrfFuse(bm25 list, brute-force dense list) at full probe") {
    // shared id space: every doc has text AND a vector; nProbe = nCells
    // degrades the IVF leg to exact, so the wrapper must equal the
    // hand-composed fusion of its two legs.
    val docs = Tables.documents(spark, TestSpark.sf).limit(200)
      .select(col("doc_id"), col("text")).cache()
    val vecs = docs.select(col("doc_id").as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        i => (pmod(col("doc_id") * (i + lit(3)) + i * i, lit(97)) / lit(97.0d))
          .cast("float")).as("embedding")).cache()
    val idx = graft.operators.Similarity.ivfBuild(vecs, "embedding", "vec_id",
      nCentroids = 4)
    val qv = vecs.filter(col("vec_id") === 7L)
    val got = Retrieval.hybridDenseTopK(docs, "doc_id", "text", idx, qv,
        "embedding", "vec_id", nTerms = 2, offset = 4, listKLex = 20,
        listKDense = 10, k = 15, nProbe = 4, logIdf = false)
      .select("doc_id", "r_a", "r_b", "rk").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._4)
    val s = Retrieval.lexStats(docs, "doc_id", "text")
    val qt = Retrieval.queryTermsByDf(s.df, 2, 4)
    val lex = Retrieval.topK(Retrieval.fuseFixedOrder(
      Retrieval.bm25PerTerm(s, qt, logIdf = false), Seq(5, 6)), 20)
    val dense = graft.operators.Similarity
      .bruteForceTopK(vecs, qv, "embedding", "vec_id", k = 10)
      .select(col("corpus_id").as("doc_id"), col("rk"))
    val want = Retrieval.rrfFuse(lex.select(col("doc_id"), col("rk")), dense, 60.0, 15)
      .select("doc_id", "r_a", "r_b", "rk").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._4)
    assert(got.toSeq == want.toSeq)
    assert(got.length == 15 && got.exists(_._3 > 0) && got.exists(_._2 > 0))
  }

  test("rrfFuse: shared-top doc wins; single-list docs contribute one term") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rk")
    val b = Seq((10L, 2L), (13L, 1L)).toDF("doc_id", "rk")
    val got = Retrieval.rrfFuse(a, b, kRrf = 60.0, k = 10)
      .select("doc_id", "r_a", "r_b", "rk").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._4)
    // fused: 10 → 1/61+1/62; 13 → 1/61; 11 → 1/62; 12 → 1/63
    assert(got.map(_._1).toSeq == Seq(10L, 13L, 11L, 12L))
    assert(got.head == ((10L, 1L, 2L, 1L)))
    assert(got(1) == ((13L, 0L, 1L, 2L))) // absent from A → r_a = 0
  }

  test("pmiTopPairs: exact pair counts, marginals, and PMI-argument ranking") {
    val got = Corpus.pmiTopPairs(fixture, "doc_id", "text", vocabSize = 4, k = 10)
      .select("tok_a", "tok_b", "c_xy", "c_x", "c_y", "rk")
      .as[(String, String, Long, Long, Long, Long)].collect().sortBy(_._6)
    // doc sets: apple{1,2,4} banana{1,2,4} cherry{1,3} durian{2,3}
    val counts = got.map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(counts(("apple", "banana")) == ((3L, 3L, 3L)))
    assert(counts(("cherry", "durian")) == ((1L, 2L, 2L)))
    assert(counts(("apple", "cherry")) == ((1L, 3L, 2L)))
    // ranking by (c_xy*N)/(c_x*c_y): apple-banana 12/9≈1.33 and
    // cherry-durian 4/4=1.0 lead the 4/6≈0.67 cross pairs
    assert(got.head._1 == "apple" && got.head._2 == "banana")
    assert(got(1)._1 == "cherry" && got(1)._2 == "durian")
    // pairs are canonical (a < b) and c_xy ≤ min(c_x, c_y)
    got.foreach { r => assert(r._1 < r._2); assert(r._3 <= math.min(r._4, r._5)) }
  }

  test("packChunks tiles sequences exactly: per-doc and per-seq invariants") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"))
    val budget = 512L
    val chunks = Corpus.packChunks(docs, "source", "doc_id", "n_tokens", budget)
    // every document's slices sum to its token count
    val perDoc = chunks.groupBy("doc_id").agg(sum("take_n").as("got"))
      .join(docs.filter(col("n_tokens") > 0), "doc_id")
      .filter(col("got") =!= col("n_tokens")).count()
    assert(perDoc == 0L)
    // every sequence except each group's last holds exactly `budget` tokens
    val perSeq = chunks.groupBy("source", "seq_id").agg(sum("take_n").as("got"))
    val lastSeq = perSeq.groupBy("source").agg(max("seq_id").as("last"))
    val short = perSeq.join(lastSeq, "source")
      .filter(col("seq_id") =!= col("last") && col("got") =!= budget).count()
    assert(short == 0L)
    // slices within a sequence tile contiguously from offset 0
    val rows = chunks.select("source", "seq_id", "doc_id", "seq_off", "take_n")
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2))
    rows.values.foreach { slices =>
      val sorted = slices.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      sorted.sliding(2).foreach {
        case Array(p, n) => assert(p._4 + p._5 == n._4)
        case _ =>
      }
    }
    // doc_off advances by the straddle: a split doc's second slice starts
    // where its first ended
    val split = chunks.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("doc_id").as[Long].collect().toSet
    assert(split.nonEmpty) // fixture corpus genuinely straddles boundaries
    chunks.filter(col("doc_id").isInCollection(split))
      .select("doc_id", "seq_id", "doc_off", "take_n")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).values.foreach { slices =>
        val sorted = slices.sortBy(_._2)
        assert(sorted.head._3 == 0L)
        sorted.sliding(2).foreach {
          case Array(p, n) => assert(p._3 + p._4 == n._3)
          case _ =>
        }
      }
  }
}
