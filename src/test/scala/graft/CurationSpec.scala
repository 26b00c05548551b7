package graft

import graft.operators.{Corpus, Dedup, Embeddings, Profiling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Late-round-5 curation operators: heavy-hitter n-grams, inverted index,
  * duplicated-span coverage, fixed-point centroids, column mode.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topNgrams counts, orders, and tie-breaks deterministically") {
    val df = Seq(
      "a b a b c",   // bigrams: "a b", "b a", "a b", "b c"
      "a b x",       // "a b", "b x"
      "zz"           // too short for bigrams
    ).toDF("text")
    val top = Corpus.topNgrams(df, "text", n = 2, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)),
      s"got $top") // ties (1,1,1) break on text: "b a" < "b c" < "b x"
  }

  test("chunkSliding: overlap, short tail, no dropped tokens, empty docs skipped") {
    val df = Seq(
      (1L, (0 until 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "only three tokens"),
      (3L, "   "),                                       // whitespace-only → no chunks
      (4L, "")                                           // empty → no chunks
    ).toDF("doc_id", "text")
    val out = Corpus.chunkSliding(df, "doc_id", "text", chunkSize = 4, stride = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // doc 1: starts 0,3,6,9 → [w0..w3] [w3..w6] [w6..w9] [w9] — overlap of 1,
    // trailing chunk short, every token present
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.map(_._2) == Seq(0L, 1L, 2L, 3L))
    assert(doc1.map(_._3) == Seq(4L, 4L, 4L, 1L))
    assert(doc1.head._4 == "w0 w1 w2 w3" && doc1.last._4 == "w9")
    assert(doc1(1)._4.startsWith("w3")) // stride 3 < size 4 → overlap
    assert(out.filter(_._1 == 2L) == Seq((2L, 0L, 3L, "only three tokens")))
    assert(!out.exists(r => r._1 == 3L || r._1 == 4L))
  }

  test("splitAssign: disjoint-exhaustive, deterministic, boundary-correct") {
    val ids = (0L until 2000L).toDF("id")
    val split = ids.select(col("id"), Corpus.splitAssign(col("id")).as("s"))
    val counts = split.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 2000L)
    // ~80/10/10 within tolerance on 2000 ids
    assert(counts("train") > 1500 && counts("train") < 1700, s"$counts")
    // deterministic: same ids → same assignment, independent of partitioning
    val again = ids.repartition(7).select(col("id"), Corpus.splitAssign(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    val first = split.as[(Long, String)].collect().toMap
    assert(again == first)
    // degenerate boundaries
    val allTrain = ids.select(Corpus.splitAssign(col("id"), 1000, 1000).as("s"))
      .distinct().as[String].collect().toSeq
    assert(allTrain == Seq("train"))
  }

  test("invertedIndex: sorted postings, df bounds drop hapaxes and stop-terms") {
    val df = Seq(
      (3L, "apple banana stopper"),
      (1L, "apple stopper"),
      (2L, "apple cherry stopper")
    ).toDF("id", "text")
    val idx = Corpus.invertedIndex(df, "id", "text", minDf = 2L, maxDf = 2L)
      .as[(String, Long, String)].collect()
    // apple df=3 exceeds maxDf, banana/cherry df=1 below minDf, stopper df=3 out
    assert(idx.isEmpty)
    val idx2 = Corpus.invertedIndex(df, "id", "text", minDf = 2L, maxDf = 3L)
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(idx2 == Map("apple" -> (3L, "1,2,3"), "stopper" -> (3L, "1,2,3")))
  }

  test("duplicatedSpanCoverage marks exactly the shared spans") {
    val shared = "one two three four five" // a single 5-token span
    val df = Seq(
      (1L, s"alpha beta $shared"),         // 3 spans, 1 shared
      (2L, s"$shared gamma delta"),        // 3 spans, 1 shared
      (3L, "totally different words here entirely now"), // 6 tokens → 2 spans, 0 shared
      (4L, "too short")                    // < 5 tokens: absent
    ).toDF("doc_id", "text")
    val cov = Dedup.duplicatedSpanCoverage(df, "text", "doc_id", k = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(cov == Seq((1L, 3L, 1L, 333L), (2L, 3L, 1L, 333L), (3L, 2L, 0L, 0L)),
      s"got $cov")
  }

  test("removeDuplicatedSpans: keeps first occurrence, rewrites the rest") {
    val shared = "one two three four five"
    val df = Seq(
      (1L, s"alpha beta $shared"),          // first occurrence of the span
      (2L, s"$shared gamma delta"),         // later occurrence → span removed
      (3L, "Too SHORT"),                    // < 5 tokens → normalized pass-through
      (4L, ""),                             // empty → ""
      (5L, "x y z w v x y z w v")           // self-repetition: second copy removed
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(df, "text", "doc_id", k = 5)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "alpha beta one two three four five"), // corpus-wide first: untouched
      (2L, "gamma delta"),                        // covered tokens dropped
      (3L, "too short"),                          // lowercase-normalized, no spans
      (4L, ""),
      (5L, "x y z w v")                           // within-doc repeat removed
    ), s"got $out")
    // partitioning-independent: the (id, pos)-first tie-break is data-driven
    val again = Dedup.removeDuplicatedSpans(df.repartition(7), "text", "doc_id", k = 5)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(again == out)
  }

  test("centroidsFixedPoint is exact and partitioning-independent") {
    val df = Seq(
      (0, Array(1.0f, -0.5f)),
      (0, Array(2.0f, 0.25f)),
      (1, Array(-1.0f, 0.0f))
    ).toDF("label", "vec")
    def run(d: org.apache.spark.sql.DataFrame) =
      Embeddings.centroidsFixedPoint(d, "vec", "label", scaleBits = 2)
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val got = run(df)
    // scale 4: floor(1.0*4)=4, floor(2.0*4)=8 → sum 12, mean 6
    //          floor(-0.5*4)=-2, floor(0.25*4)=1 → sum -1, mean floor(-0.5)=-1
    //          floor(-1.0*4)=-4 → mean -4
    assert(got == Seq(
      (0L, 0L, 2L, 12L, 6L), (0L, 1L, 2L, -1L, -1L),
      (1L, 0L, 1L, -4L, -4L), (1L, 1L, 1L, 0L, 0L)), s"got $got")
    assert(got == run(df.repartition(5)), "must not depend on partitioning")
  }

  test("gapFillDaily densifies spans and forward-fills") {
    val df = Seq(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-04", 40.0),
      (2L, "2024-02-01", 5.0)
    ).toDF("k", "d", "v").withColumn("d", to_date(col("d")))
    val got = graft.operators.TimeSeries.gapFillDaily(df, "k", "d", "v")
      .select(col("k"), date_format(col("d"), "yyyy-MM-dd").as("d"),
        col("filled_v"), col("is_gap"))
      .as[(Long, String, Double, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, "2024-01-01", 10.0, 0L), (1L, "2024-01-02", 10.0, 1L),
      (1L, "2024-01-03", 10.0, 1L), (1L, "2024-01-04", 40.0, 0L),
      (2L, "2024-02-01", 5.0, 0L)), s"got $got")
  }

  test("outliersBySigma flags exactly the >m-sigma rows, exact arithmetic") {
    import org.apache.spark.sql.types.DecimalType
    // group g: nine 10.00s and one 20.00 → mean 11, var = (9*1 + 81)/10 = 9,
    // sigma 3; |20-11| = 9 = 3.0σ: NOT flagged at m=3σ... use m=2.9 (29/10)
    val vals = Seq.fill(9)(BigDecimal("10.00")) :+ BigDecimal("20.00")
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "g", "x")
      .withColumn("x", col("x").cast(DecimalType(12, 2)))
    val at29 = graft.operators.Profiling.outliersBySigma(df, "x", "g", 29, 10)
      .select("id").as[Long].collect().toSet
    assert(at29 == Set(9L), s"got $at29")
    // exactly at the boundary (3σ) the strict inequality excludes it
    val at30 = graft.operators.Profiling.outliersBySigma(df, "x", "g", 3, 1)
      .select("id").as[Long].collect().toSet
    assert(at30.isEmpty, s"got $at30")
    // knownGroups hint (r11 advice): skips the approx-distinct probe job
    // without changing the flag set — on either side of the broadcast gate
    val hintedLow = graft.operators.Profiling
      .outliersBySigma(df, "x", "g", 29, 10, knownGroups = Some(1L))
      .select("id").as[Long].collect().toSet
    val hintedHigh = graft.operators.Profiling
      .outliersBySigma(df, "x", "g", 29, 10, knownGroups = Some(2000000L))
      .select("id").as[Long].collect().toSet
    assert(hintedLow == Set(9L) && hintedHigh == Set(9L))
  }

  test("distributionDrift: exact zero on identical snapshots, clamped edges, shift sign (r12)") {
    // identical snapshots: pa == pb per bin -> (pa-pb)=0 -> every psi_term
    // EXACTLY 0.000000 (no epsilon residue — the smoothing sits inside ln,
    // multiplied by an exact zero)
    val a = Seq(1.0, 2.0, 5.0, 9.0, 9.5).toDF("x")
    val same = Profiling.distributionDrift(a, a, "x",
        lo = 0.0, hi = 10.0, nBuckets = 5)
      .collect()
    assert(same.nonEmpty)
    same.foreach { r =>
      assert(r.getLong(1) == r.getLong(2))
      assert(r.getDecimal(3).signum == 0, r.toString)
    }
    // clamping: values outside [lo,hi] land in the EDGE bins (range drift
    // must not silently vanish), and a mass shift prices with the right
    // sign — bin losing mass in B gets a positive term (pa>pb), the bin
    // gaining mass a positive term too only when ... sign = (pa-pb)*ln(pa/pb):
    // both factors flip together, so every nonzero term is positive
    val b = Seq(-3.0, 42.0, 5.0, 5.1, 9.0).toDF("x") // -3 -> bin 0, 42 -> bin 4
    val drift = Profiling.distributionDrift(a, b, "x",
        lo = 0.0, hi = 10.0, nBuckets = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDecimal(3)))).toMap
    // B bin populations: 0 -> {-3.0 clamped}, 2 -> {5.0, 5.1}, 4 -> {9.0, 42.0 clamped}
    assert(drift(0)._2 == 1L && drift(2)._2 == 2L && drift(4)._2 == 2L,
      drift.toString)
    // PSI terms are nonnegative by construction; a shifted bin is > 0
    assert(drift.values.forall(_._3.signum >= 0))
    assert(drift(1)._3.signum > 0, // A had 2.0 in bin 1, B has nothing
      drift(1).toString)
  }

  test("categoricalDrift: baseline-topK vocabulary, novel-category fold, exact zero (r12)") {
    val a = Seq("en", "en", "en", "de", "de", "fr").toDF("lang")
    // identical snapshots: every term exactly zero
    val same = Profiling.categoricalDrift(a, a, "lang", topK = 2).collect()
    assert(same.map(_.getString(0)).toSet == Set("en", "de", "__other__"))
    same.foreach(r => assert(r.getDecimal(4).signum == 0, r.toString))
    // vocabulary comes from A's top-K (count desc, value asc): "fr" folds
    // to __other__; a category ONLY in B (the new-source drift) folds
    // there too instead of vanishing
    val b = Seq("en", "de", "de", "zz", "zz", "zz").toDF("lang")
    val drift = Profiling.categoricalDrift(a, b, "lang", topK = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getDecimal(4)))).toMap
    assert(drift("en") == ((3L, 1L, drift("en")._3)))
    assert(drift("de") == ((2L, 2L, drift("de")._3)))
    assert(drift("__other__")._1 == 1L && drift("__other__")._2 == 3L,
      drift.toString)
    assert(drift("de")._3.signum == 0) // 2/6 both sides
    assert(drift("en")._3.signum > 0 && drift("__other__")._3.signum > 0)
    // count ties in the vocabulary break by value ascending: with topK=1
    // over {x:2, y:2} the vocabulary is {x}, deterministically
    val t = Seq("y", "x", "y", "x").toDF("lang")
    val v1 = Profiling.categoricalDrift(t, t, "lang", topK = 1)
      .collect().map(_.getString(0)).toSet
    assert(v1 == Set("x", "__other__"), v1.toString)
  }

  test("categoricalDrift: a genuine '__other__' category never merges with the fold bucket (r13)") {
    // '__other__' is a REAL data value here, frequent enough to make the
    // vocabulary — folded novel mass must stay a separate row
    val a = Seq("__other__", "__other__", "en", "fr").toDF("lang")
    val b = Seq("__other__", "zz", "zz", "en").toDF("lang")
    val rows = Profiling.categoricalDrift(a, b, "lang", topK = 2)
      .collect().map(r => (r.getString(0), r.getBoolean(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // vocab = {__other__: 2, en: 1} (fr loses the asc tie-break to en)
    assert(rows(("__other__", false)) == ((2L, 1L)), rows.toString)
    // fold bucket: A's fr, B's zz+zz — disjoint from the genuine category
    assert(rows(("__other__", true)) == ((1L, 2L)), rows.toString)
    assert(rows(("en", false)) == ((1L, 1L)))
    assert(rows.size == 3)
  }

  test("distributionDrift: NaN excluded, empty side raises instead of null PSI (r13)") {
    val a = Seq(1.0, Double.NaN, 5.0).toDF("x")
    val b = Seq(1.0, 5.0).toDF("x")
    // NaN is excluded, not coerced into bucket 0: sides are then identical
    val rows = Profiling.distributionDrift(a, b, "x", lo = 0.0, hi = 10.0,
      nBuckets = 5).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      .toSeq == Seq((0L, 1L, 1L), (2L, 1L, 1L)))
    rows.foreach(r => assert(r.getDecimal(3).signum == 0))
    // an empty side must raise (a null-PSI report reads as "no drift")
    val empty = Seq.empty[Double].toDF("x")
    val e = intercept[Exception] {
      Profiling.distributionDrift(a, empty, "x", 0.0, 10.0, 5).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("zero rows"),
      e.getMessage)
  }

  test("drift baselines: persisted round-trip == two-snapshot form; vocab hint == no-hint (r13)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_driftspec").toString
    graft.TempFiles.cleanupAtExit(java.nio.file.Paths.get(tmp))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // numeric: write bucket counts + binning once, score B against the file
    val a = Seq(1.0, 2.0, 5.0, 9.0, 9.5).toDF("x")
    val b = Seq(-3.0, 42.0, 5.0, 5.1, 9.0).toDF("x")
    Profiling.writeDriftBaseline(a, "x", lo = 0.0, hi = 10.0, nBuckets = 5,
      dir = s"$tmp/nb")
    assert(canon(Profiling.distributionDriftFromBaseline(
        spark.read.parquet(s"$tmp/nb"), b, "x"))
      == canon(Profiling.distributionDrift(a, b, "x", 0.0, 10.0, 5)))
    // driftBounds feeds the binning contract without a caller-side scan
    val bounds = Profiling.driftBounds(a, "x").as[(Double, Double, Long)]
      .collect().head
    assert(bounds == ((1.0, 9.5, 5L)))
    // categorical: precomputed vocabulary == recomputed; persisted == direct
    val ca = Seq("en", "en", "en", "de", "de", "fr").toDF("lang")
    val cb = Seq("en", "de", "de", "zz", "zz", "zz").toDF("lang")
    val vocab = Profiling.categoricalVocabulary(ca, "lang", topK = 2)
    assert(canon(Profiling.categoricalDrift(ca, cb, "lang", vocab))
      == canon(Profiling.categoricalDrift(ca, cb, "lang", topK = 2)))
    Profiling.writeCategoricalBaseline(ca, "lang", topK = 2, dir = s"$tmp/cb")
    assert(canon(Profiling.categoricalDriftFromBaseline(
        spark.read.parquet(s"$tmp/cb"), cb, "lang"))
      == canon(Profiling.categoricalDrift(ca, cb, "lang", topK = 2)))
  }

  test("equi-mass drift: quantile cuts, open edge bins, merge == recompute (r13)") {
    // quantileCuts: exact linear-interpolation percentiles, NaN excluded
    val a = (1 to 100).map(_.toDouble).toDF("x")
    val cuts = Profiling.quantileCuts(a, "x", nBuckets = 4)
    assert(cuts == Seq(25.75, 50.5, 75.25), cuts.toString) // 1..100 quartiles
    // bucket(v) = #{cuts <= v}: equal mass per bin on the baseline itself
    val self = Profiling.distributionDriftByCuts(a, a, "x", cuts)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDecimal(3))))
      .toMap
    assert(self.keySet == Set(0L, 1L, 2L, 3L))
    assert(self.values.map(_._1).toSeq.sorted == Seq(25L, 25L, 25L, 25L))
    self.values.foreach(v => assert(v._2.signum == 0))
    // range drift lands in the open edge bins, never vanishes
    val b = Seq(-50.0, 1e9).toDF("x")
    val edges = Profiling.distributionDriftByCuts(a, b, "x", cuts)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(edges(0L) == 1L && edges(3L) == 1L, edges.toString)
    // mergeDriftBaselines: epoch-merged counts == recomputed over union,
    // and mismatched binning contracts refuse
    val tmp = java.nio.file.Files.createTempDirectory("graft_mergespec").toString
    graft.TempFiles.cleanupAtExit(java.nio.file.Paths.get(tmp))
    val e1 = (1 to 40).map(_.toDouble).toDF("x")
    val e2 = (30 to 90).map(_.toDouble).toDF("x")
    Profiling.writeDriftBaseline(e1, "x", 0.0, 100.0, 5, s"$tmp/e1")
    Profiling.writeDriftBaseline(e2, "x", 0.0, 100.0, 5, s"$tmp/e2")
    Profiling.writeDriftBaseline(e1.unionByName(e2), "x", 0.0, 100.0, 5, s"$tmp/u")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(Profiling.mergeDriftBaselines(
        spark.read.parquet(s"$tmp/e1"), spark.read.parquet(s"$tmp/e2")))
      == canon(spark.read.parquet(s"$tmp/u")))
    Profiling.writeDriftBaseline(e2, "x", 0.0, 200.0, 5, s"$tmp/bad")
    val err = intercept[IllegalArgumentException] {
      Profiling.mergeDriftBaselines(
        spark.read.parquet(s"$tmp/e1"), spark.read.parquet(s"$tmp/bad"))
    }
    assert(err.getMessage.contains("contracts differ"))
    // categorical twin: same-vocabulary epochs sum; foreign vocab refuses
    val c1 = Seq("en", "en", "de", "fr").toDF("lang")
    val c2 = Seq("en", "de", "de", "zz").toDF("lang")
    val vocab = Profiling.categoricalVocabulary(c1, "lang", topK = 2)
    Profiling.foldedCounts(c1, "lang", vocab).write.parquet(s"$tmp/c1")
    Profiling.foldedCounts(c2, "lang", vocab).write.parquet(s"$tmp/c2")
    Profiling.foldedCounts(c1.unionByName(c2), "lang", vocab)
      .write.parquet(s"$tmp/cu")
    assert(canon(Profiling.mergeCategoricalBaselines(
        spark.read.parquet(s"$tmp/c1"), spark.read.parquet(s"$tmp/c2")))
      == canon(spark.read.parquet(s"$tmp/cu")))
    Profiling.writeCategoricalBaseline(
      Seq("xx", "xx", "yy").toDF("lang"), "lang", topK = 2, s"$tmp/cbad")
    val cerr = intercept[IllegalArgumentException] {
      Profiling.mergeCategoricalBaselines(
        spark.read.parquet(s"$tmp/c1"), spark.read.parquet(s"$tmp/cbad"))
    }
    assert(cerr.getMessage.contains("vocabularies differ"))
  }

  test("columnMode tie-breaks on value ascending") {
    val df = Seq("b", "b", "a", "a", "c").toDF("v")
    val m = Profiling.columnMode(df, "v").as[(String, String, Long)].collect().head
    assert(m == ("v", "a", 2L)) // a and b tie at 2; a wins
  }

  test("selectUnderBudget equals the naive global-sort greedy (zero-token docs, boundary budgets)") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 400L).map { id =>
      (id, rnd.nextInt(6).toLong,
        if (rnd.nextInt(10) == 0) 0L else rnd.nextInt(50).toLong + 1)
    }
    val df = rows.toDF("doc_id", "quality", "n_tokens")
    val sorted = rows.sortBy { case (id, q, _) => (-q, id) }
    // include an exact bucket-boundary budget so the <=-prefilter edge fires
    val q5total = rows.filter(_._2 == 5L).map(_._3).sum
    for (budget <- Seq(0L, 37L, q5total, q5total + 1, 2000L, 1000000L)) {
      val got = Corpus.selectUnderBudget(df, "quality", "doc_id", "n_tokens", budget)
        .select("doc_id").as[Long].collect().toSet
      var cum = 0L
      val want = sorted.takeWhile { case (_, _, t) => cum += t; cum <= budget }
        .map(_._1).toSet
      assert(got == want, s"budget=$budget: got ${got.size}, want ${want.size}")
    }
    // fraction variant: same answer as the explicit floor(total/2) budget
    val total = rows.map(_._3).sum
    val viaBudget = Corpus.selectUnderBudget(df, "quality", "doc_id", "n_tokens", total / 2)
      .select("doc_id").as[Long].collect().toSet
    val viaFraction = Corpus.selectUnderBudgetFraction(df, "quality", "doc_id", "n_tokens", 1L, 2L)
      .select("doc_id").as[Long].collect().toSet
    assert(viaFraction == viaBudget)
  }

  test("canonicalizeUrl: query/fragment stripped, host-only lowercasing, one trailing slash") {
    val cases = Seq(
      ("HTTPS://WWW.Ex.COM/Path/Sub/?q=1#f", "https://www.ex.com/Path/Sub"),
      ("http://a.b/", "http://a.b"),
      ("http://a.b", "http://a.b"),
      ("http://A.B/P?x=1", "http://a.b/P"),
      ("https://h/p#frag", "https://h/p"),
      ("https://H.co/a//", "https://h.co/a/"), // exactly ONE trailing slash drops
      // scheme-less: pass through after the fragment/query strip (previously
      // doubled into "a.b/x://a.b/x")
      ("a.b/Path?q=1#f", "a.b/Path"),
      ("relative/path", "relative/path")
    )
    val got = cases.map(_._1).toDF("url")
      .select(graft.functions.TextFunctions.canonicalizeUrl(col("url")))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("bigramFluency counts corpus bigram mass and rare bigrams per doc") {
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x")).toDF("doc_id", "text")
    // corpus bigram counts: "a b" = 3 (2 in doc1 + 1 in doc2), "b a" = 1, "b c" = 1
    val got = Corpus.bigramFluency(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = Set(
      (1L, 3L, 1L, (3L + 1L + 3L) * 1000 / 3),  // "a b","b a","a b"; rare: "b a"
      (2L, 2L, 1L, (3L + 1L) * 1000 / 2))       // "a b","b c"; rare: "b c"
    assert(got == want, s"got $got") // doc 3: no bigrams, absent
  }

  test("isqrt via floor(sqrt(double)) is exact at perfect-square boundaries") {
    // the d_source_mix weight must floor identically in Spark and DuckDB;
    // both compute floor of the IEEE-correctly-rounded sqrt. Prove the
    // boundary cases never round across an integer at token-count scales.
    for (k <- Seq(1L, 2L, 10L, 999L, 65536L, 1000003L, 30000001L)) {
      assert(math.floor(math.sqrt((k * k - 1).toDouble)).toLong == k - 1, s"k=$k low")
      assert(math.floor(math.sqrt((k * k).toDouble)).toLong == k, s"k=$k sq")
      assert(math.floor(math.sqrt((k * k + 1).toDouble)).toLong == k, s"k=$k high")
    }
  }
}
