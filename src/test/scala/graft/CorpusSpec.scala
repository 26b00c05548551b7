package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation operators: quality filtering (exact + approx agreement),
  * deterministic mixture sampling, sequence packing invariants.
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("qualityFilterTop keeps exactly the top fraction per group, ties by id") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 20L), ("a", 4L, 30L),
      ("b", 5L, 1L), ("b", 6L, 2L)
    ).toDF("g", "id", "score")
    val kept = Corpus.qualityFilterTop(df, "score", "g", "id", 1, 2)
      .select("id").as[Long].collect().toSet
    // group a keeps 2 of 4: score 30 (id 2) and 30 (id 4); b keeps 1 of 2: score 2
    assert(kept == Set(2L, 4L, 6L))
  }

  test("deterministicShuffle is a reproducible seeded permutation (r10)") {
    val docs = Tables.documents(spark, TestSpark.sf).select("doc_id")
    val n = docs.count()
    val s1 = Corpus.deterministicShuffle(docs, "doc_id", seed = 7L)
    val got = s1.select("doc_id", "pos").as[(Long, Long)].collect()
    // positions are exactly 0..n-1, each once
    assert(got.map(_._2).sorted.toSeq == (0L until n).toSeq)
    // same seed → identical order; different seed → a different order
    val again = Corpus.deterministicShuffle(docs, "doc_id", seed = 7L)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(got.forall { case (id, pos) => again(id) == pos })
    val other = Corpus.deterministicShuffle(docs, "doc_id", seed = 8L)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(got.exists { case (id, pos) => other(id) != pos })
    // the order is genuinely scrambled, not sorted-by-id
    val byPos = got.sortBy(_._2).map(_._1)
    assert(byPos.toSeq != byPos.sorted.toSeq)
    // negative ids (hash-derived) order without overflow, total order holds
    val neg = Seq(Long.MinValue, -5L, 0L, 5L, Long.MaxValue).toDF("doc_id")
    val negPos = Corpus.deterministicShuffle(neg, "doc_id", seed = 1L)
      .select("pos").as[Long].collect().sorted.toSeq
    assert(negPos == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("deterministicShuffle's 2^61-1 field: exact vs BigInt, and >2^31-1 id domains reorder (r11)") {
    val p61 = Corpus.ShufflePrime
    assert(p61 == (1L << 61) - 1)
    // The limb-split mulmod must agree with arbitrary-precision arithmetic
    // on the FULL long id domain — the exactness claim every engine-replay
    // rests on. Fixed pseudo-random ids plus the overflow-prone edges.
    val rnd = new scala.util.Random(20260814L)
    val ids = (Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, p61, p61 + 1,
      2 * p61, 2147483647L, 2147483648L) ++
      Seq.fill(300)(rnd.nextLong())).distinct
    for (seed <- Seq(11L, 42L, -3L)) {
      val (aEff, b) = Corpus.shuffleConstants(seed)
      def expectedKey(id: Long): Long = {
        val k0 = ((BigInt(id) mod p61) + p61) mod p61
        ((k0 * aEff + b) mod p61).toLong
      }
      val expectedOrder = ids.sortBy(id => (expectedKey(id), id))
      val got = Corpus.deterministicShuffle(ids.toDF("doc_id"), "doc_id", seed)
        .select("doc_id", "pos").as[(Long, Long)].collect()
        .sortBy(_._2).map(_._1).toSeq
      assert(got == expectedOrder, s"seed $seed: column mulmod drifted from BigInt")
    }
    // Ids exactly 2^31-1 and 2(2^31-1) apart collided mod the OLD field,
    // so their relative order was pinned to id order under EVERY seed.
    // In the 2^61-1 field they must reorder for some seed.
    val p31 = 2147483647L
    val congruent = Seq(5L, 5L + p31, 5L + 2 * p31)
    val orders = (1L to 6L).map { seed =>
      Corpus.deterministicShuffle(congruent.toDF("doc_id"), "doc_id", seed)
        .select("doc_id", "pos").as[(Long, Long)].collect()
        .sortBy(_._2).map(_._1).toSeq
    }
    assert(orders.distinct.size > 1,
      "ids congruent mod 2^31-1 still sit in a fixed relative order — field not widened")
  }

  test("qualityFilterApprox agrees with the exact filter on a well-separated corpus") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("score"))
    val exact = Corpus.qualityFilterTop(docs, "score", "source", "doc_id", 1, 2)
      .select("doc_id").as[Long].collect().toSet
    val approx = Corpus.qualityFilterApprox(docs, "score", "source", 0.5)
      .select("doc_id").as[Long].collect().toSet
    val overlap = (exact intersect approx).size.toDouble / exact.size
    assert(overlap >= 0.9, s"approx/exact overlap only $overlap")
    // approx keeps roughly the requested fraction
    assert(math.abs(approx.size.toDouble / docs.count() - 0.5) < 0.1)
  }

  test("mixtureSample is deterministic and tracks per-group rates") {
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) "hi" else "lo")).toDF("id", "g")
    val rates = Map("hi" -> 800, "lo" -> 100)
    val s1 = Corpus.mixtureSample(df, "id", "g", rates).as[(Long, String)].collect().toSet
    val s2 = Corpus.mixtureSample(df.repartition(7), "id", "g", rates)
      .as[(Long, String)].collect().toSet
    assert(s1 == s2, "selection must not depend on partitioning")
    val hi = s1.count(_._2 == "hi").toDouble / 2000
    val lo = s1.count(_._2 == "lo").toDouble / 2000
    assert(math.abs(hi - 0.8) < 0.05, s"hi rate $hi")
    assert(math.abs(lo - 0.1) < 0.05, s"lo rate $lo")
    // unknown groups default to dropped
    assert(Corpus.mixtureSample(df, "id", "g", Map.empty).count() == 0)
  }

  test("packSequences: contiguous, budget-aligned starts, bounded overshoot") {
    val df = (1L to 100L).map(i => (i, "g", 100L + (i % 7) * 50)).toDF("id", "g", "toks")
    val packed = Corpus.packSequences(df, "g", "id", "toks", budget = 1000L)
    val seqs = packed.groupBy("seq_id")
      .agg(sum("toks").as("total"), max("toks").as("biggest"),
        min("id").as("lo"), max("id").as("hi"))
      .collect()
    val maxDoc = 100L + 6 * 50
    seqs.foreach { r =>
      assert(r.getAs[Long]("total") <= 1000L + maxDoc,
        s"sequence ${r.getAs[Long]("seq_id")} overshoots by more than one doc")
    }
    // sequences partition the id range contiguously
    val ranges = seqs.map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(lo2 == hi1 + 1, "non-contiguous packing")
      case _ =>
    }
  }

  test("qualityModelTrain: closed-form integer weights, exact on a micro-corpus (r14)") {
    // hand-computed: pos docs {alpha beta, alpha gamma}, neg {zeta eta,
    // zeta theta}. CP=4 pos occurrences, CT=8 total, base=(1000*4)//8=500.
    // alpha: (1000*3)//4 - 500 = 250;  beta/gamma: (1000*2)//3 - 500 = 166
    // zeta: (1000*1)//4 - 500 = -250;  eta/theta: (1000*1)//3 - 500 = -167
    val docs = Seq(
      (1L, "alpha beta", true), (2L, "alpha gamma", true),
      (3L, "zeta eta", false), (4L, "zeta theta", false)
    ).toDF("doc_id", "text", "lab")
    val w = Corpus.qualityModelTrain(docs, "text", col("lab"))
      .as[(String, Long)].collect().toMap
    assert(w == Map("alpha" -> 250L, "beta" -> 166L, "gamma" -> 166L,
      "zeta" -> -250L, "eta" -> -167L, "theta" -> -167L), w.toString)
    // pruning: |250| x2, then |-167| x2, then 166s; ties break token-asc.
    // topK=3 keeps alpha, zeta, then eta (eta < theta)
    val m3 = Corpus.qualityModelCollect(
      Corpus.qualityModelTrain(docs, "text", col("lab")), topK = 3)
    assert(m3.weights.map(_._1).toSet == Set("alpha", "zeta", "eta"),
      m3.weights.toString)
    // codegen scorer: dot product with occurrence counts; OOV tokens 0;
    // exact-zero scores do NOT pass a `> 0` keep gate
    val full = Corpus.qualityModelCollect(
      Corpus.qualityModelTrain(docs, "text", col("lab")), topK = 100)
    val scores = Seq((10L, "alpha alpha beta"), (11L, "zeta unknown"),
      (12L, "alpha zeta"), (13L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.QualityModelFns.score(col("text"), full).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(scores == Map(10L -> 666L, 11L -> -250L, 12L -> 0L, 13L -> 0L),
      scores.toString)
  }

  test("trained classifier generalizes token evidence beyond the heuristic gate (r14)") {
    // the weak-supervision promise: train on heuristic labels, then score
    // HELD-OUT docs the heuristic mis-handles. A short doc (fails the
    // length-driven heuristic) written in positive-class tokens must be
    // KEPT by the classifier; a long stopword-padded doc (passes the
    // heuristic) drowned in negative-class tokens must be REJECTED —
    // survivors are neither a subset nor a superset of the heuristic's.
    import graft.functions.TextFunctions.qualityScore
    val goodBody = "the report covers the annual results and the board " +
      "found that it is on track for a strong year with solid margins "
    val spamBody = "zzbuy zzcheap zzpills zznow zzclick zzhere zzwin " +
      "zzprize!!! ??? !!! ;;; ((( ))) zzfree zzcash "
    val train = ((1 to 30).map(i => (i.toLong, goodBody * 4)) ++
      (31 to 60).map(i => (i.toLong, spamBody))).toDF("doc_id", "text")
    val label = qualityScore(col("text")) >= 500L
    // premise: the heuristic actually splits the training corpus
    val labs = train.select(label.as("l")).as[Boolean].collect()
    assert(labs.count(identity) == 30 && labs.count(!_) == 30)
    val model = Corpus.qualityModelCollect(
      Corpus.qualityModelTrain(train, "text", label), topK = 64)
    // doc 101: >=400 chars, ~10% stopwords (stopScore 300), ZERO
    // punctuation (no penalty) -> heuristic quality = 650, passes — but
    // 90% of its tokens carry trained negative evidence
    val spamRun = "zzbuy zzcheap zzpills zznow zzclick zzhere zzwin " +
      "zzfree zzcash "
    val held = Seq(
      (100L, "the board found the results strong"), // short: heuristic rejects
      (101L, "the and of to in is that it for with " + spamRun * 10)
    ).toDF("doc_id", "text")
    val h = held.select(col("doc_id"), (qualityScore(col("text")) >= 500L).as("heur"),
        (graft.functions.QualityModelFns.score(col("text"), model) > 0L).as("clf"))
      .as[(Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(h(100L) == ((false, true)),
      s"short positive-token doc: heuristic rejects, classifier keeps: $h")
    assert(h(101L) == ((true, false)),
      s"stopword-padded spam doc: heuristic passes, classifier rejects: $h")
  }

  test("dsirWeights: integer share-difference weights, exact on a micro-corpus (r14)") {
    // raw = 4 docs, target = docs 1-2. c_tgt: alpha 2, beta/gamma 1,
    // zeta/eta/theta 0; c_raw: alpha/zeta 2, beta/gamma/eta/theta 1.
    // T_tgt=4, T_raw=8, V=6, S=1e6:
    //   alpha: 3e6//10 - 3e6//14 = 300000-214285 =  85715
    //   beta/gamma: 2e6//10 - 2e6//14 = 200000-142857 = 57143
    //   zeta: 1e6//10 - 3e6//14 = 100000-214285 = -114285
    //   eta/theta: 1e6//10 - 2e6//14 = 100000-142857 = -42857
    val raw = Seq((1L, "alpha beta"), (2L, "alpha gamma"),
      (3L, "zeta eta"), (4L, "zeta theta")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") <= 2L)
    val w = Corpus.dsirWeights(raw, target, "text")
      .as[(String, Long)].collect().toMap
    assert(w == Map("alpha" -> 85715L, "beta" -> 57143L, "gamma" -> 57143L,
      "zeta" -> -114285L, "eta" -> -42857L, "theta" -> -42857L), w.toString)
    // resample: target-like docs outrank raw-like ones; the k boundary
    // tie (docs 3,4 at -157142) breaks by id asc — deterministic
    val model = Corpus.qualityModelCollect(
      Corpus.dsirWeights(raw, target, "text"), topK = 100)
    val top3 = Corpus.dsirResample(raw, "text", "doc_id", model, k = 3)
      .select("doc_id", "dsir_score").as[(Long, Long)].collect().toMap
    assert(top3 == Map(1L -> 142858L, 2L -> 142858L, 3L -> -157142L),
      top3.toString)
  }

  test("hashed DSIR equals the exact form on a collision-free vocabulary (r14)") {
    val raw = Seq((1L, "alpha beta"), (2L, "alpha gamma"),
      (3L, "zeta eta"), (4L, "zeta theta")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") <= 2L)
    val b = 1 << 16
    // measured precondition: the 6 tokens occupy 6 DISTINCT buckets, so
    // the bucket domain is in bijection with the vocabulary and the
    // estimator must agree exactly (V = occupied buckets = |vocab|)
    val bucketOf = Seq("alpha", "beta", "gamma", "zeta", "eta", "theta")
      .map(t => t -> raw.sparkSession.range(1)
        .select(pmod(xxhash64(lit(t)), lit(b.toLong))).as[Long](
          org.apache.spark.sql.Encoders.scalaLong).head()).toMap
    assert(bucketOf.values.toSet.size == 6, s"hash collision: $bucketOf")
    val exact = Corpus.dsirWeights(raw, target, "text")
      .as[(String, Long)].collect().toMap
    val hashed = Corpus.dsirWeightsHashed(raw, target, "text", buckets = b)
      .as[(Long, Long)].collect().toMap
    assert(hashed == exact.map { case (t, w) => bucketOf(t) -> w },
      s"hashed=$hashed exact=$exact")
    // the dense codegen scorer reproduces the exact dot product per doc
    val hm = Corpus.dsirHashedCollect(
      Corpus.dsirWeightsHashed(raw, target, "text", buckets = b), buckets = b)
    val scores = raw.select(col("doc_id"),
        graft.functions.QualityModelFns.scoreHashed(col("text"), hm).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(scores == Map(1L -> 142858L, 2L -> 142858L,
      3L -> -157142L, 4L -> -157142L), scores.toString)
    // the model cap documents the driver-heap argument like bpeTrain's
    val e = intercept[IllegalArgumentException](
      Corpus.dsirWeightsHashed(raw, target, "text", buckets = (1 << 22) + 1))
    assert(e.getMessage.contains("2^22"))
  }
}
