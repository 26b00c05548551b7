package graft

import graft.functions.{Bpe, BpeCompute, BpeModel}
import graft.operators.Corpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE tokenizer training + encode (SURVEY.md §2e).
  *
  * The trainer is pinned against an INDEPENDENT naive reimplementation
  * (straight from Sennrich et al.'s algorithm sketch: immutable maps, no
  * shared code with the operator) on corpora where word counts are known,
  * plus encode round-trip / monotonicity properties.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- independent naive trainer (dictionary BPE, Sennrich ACL'16) ----
  private def naiveSymbols(w: String): Vector[String] =
    w.map(_.toString).toVector :+ "</w>"

  private def naiveReplace(syms: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.size) {
      if (i < syms.size - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += (p._1 + p._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def naiveTrain(wordCounts: Map[String, Long], numMerges: Int): Vector[(String, String)] = {
    var vocab = wordCounts.map { case (w, c) => naiveSymbols(w) -> c }
    var merges = Vector.empty[(String, String)]
    var continue = true
    while (merges.size < numMerges && continue) {
      val pairs = vocab.toSeq
        .flatMap { case (syms, c) => syms.zip(syms.tail).map(_ -> c) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairs.isEmpty) continue = false
      else {
        val best = pairs.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges :+= best
        vocab = vocab.map { case (syms, c) => naiveReplace(syms, best) -> c }
      }
    }
    merges
  }

  private def corpusOf(words: Map[String, Long]): org.apache.spark.sql.DataFrame =
    // one word per row, count times — word counts are then exactly `words`
    words.toSeq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .toDF("text").repartition(7) // partitioning must not matter

  test("bpeTrain matches the independent naive trainer (classic corpus)") {
    // the Sennrich paper's running example vocabulary
    val counts = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = Corpus.bpeTrain(corpusOf(counts), "text", numMerges = 10).merges
    val want = naiveTrain(counts, 10)
    assert(got == want, s"got $got\nwant $want")
    // first merges are the famous ones: (e,s) count 9, then (es,t) 9...
    assert(got.take(2) == Vector(("e", "s"), ("es", "t")))
  }

  test("bpeTrain matches naive on a tie-heavy corpus (lexicographic breaks)") {
    val counts = Map("ab" -> 3L, "ba" -> 3L, "cd" -> 3L, "dc" -> 3L, "abcd" -> 1L)
    val got = Corpus.bpeTrain(corpusOf(counts), "text", numMerges = 6).merges
    assert(got == naiveTrain(counts, 6))
  }

  test("bpeTrain is partitioning-independent and stops when merges exhaust") {
    val counts = Map("aa" -> 2L, "bb" -> 1L)
    val a = Corpus.bpeTrain(corpusOf(counts), "text", numMerges = 100)
    val b = Corpus.bpeTrain(corpusOf(counts).repartition(1), "text", numMerges = 100)
    assert(a == b)
    // every word eventually collapses to one symbol; no infinite merges
    assert(a.merges.size < 100)
    val enc = corpusOf(counts).select(Bpe.encode(col("text"), a).as("t"))
      .as[Seq[String]].collect()
    assert(enc.forall(_.size == 1), s"fully-merged words must be single tokens: ${enc.toSeq}")
  }

  test("maxWords caps the candidate table at the frequency head") {
    val counts = Map("xy" -> 10L, "zq" -> 1L)
    val capped = Corpus.bpeTrain(corpusOf(counts), "text", numMerges = 10, maxWords = 1)
    // only "xy" participates: no merge may involve z or q
    assert(capped.merges.nonEmpty)
    assert(capped.merges.forall { case (l, r) => !(l + r).exists("zq".contains(_)) })
  }

  test("maxWords guard rejects caps that would overflow the driver table") {
    val df = corpusOf(Map("aa" -> 1L))
    intercept[IllegalArgumentException] {
      Corpus.bpeTrain(df, "text", numMerges = 1, maxWords = 0)
    }
    intercept[IllegalArgumentException] {
      Corpus.bpeTrain(df, "text", numMerges = 1, maxWords = (1 << 22) + 1)
    }
  }

  test("encode: zero-merge model yields code points + </w>; round-trip lossless") {
    val empty = BpeModel(Vector.empty)
    val docs = Seq("Hello world", "a", "  spaced   out  ").toDF("text")
    val enc = docs.select(Bpe.encode(col("text"), empty).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(enc.head == "hello".map(_.toString) ++ Seq("</w>") ++
      "world".map(_.toString) :+ "</w>")
    // losslessness: concatenating tokens and splitting on </w> recovers the
    // lowercased words, for any model
    val model = Corpus.bpeTrain(docs, "text", numMerges = 5)
    val enc2 = docs.select(Bpe.encode(col("text"), model).as("t"))
      .as[Seq[String]].collect().toSeq
    enc2.zip(Seq("hello world", "a", "  spaced   out  ")).foreach { case (toks, txt) =>
      val words = txt.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      assert(toks.mkString.split("</w>", -1).filter(_.nonEmpty).toSeq == words)
    }
  }

  test("encode token count is monotone non-increasing in merge count") {
    val docs = Seq("the cat sat on the mat", "the thematic theme").toDF("text")
    val model = Corpus.bpeTrain(docs, "text", numMerges = 12)
    val sizes = (0 to model.merges.size).map { k =>
      val m = BpeModel(model.merges.take(k))
      docs.select(sum(size(Bpe.encode(col("text"), m))))
        .as[Long].collect()(0)
    }
    sizes.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"token count grew after a merge: $sizes")
    }
  }

  test("encodeWord replays merges in rank order, not text order") {
    // ranks: (a,b) learned AFTER (b,c) — encode must apply lowest rank
    // first even though (a,b) is leftmost
    val model = BpeModel(Vector(("b", "c"), ("a", "bc")))
    val got = BpeCompute.encodeWord("abc", model.ranks).toSeq
    assert(got == Seq("abc", "</w>"))
  }

  test("registered queries: bpe merge table and vocab coverage shapes") {
    val dir = TestSpark.sf
    // the synthetic corpus draws from a bounded word set, so merges may
    // exhaust (every head word fully merged) before the 150 requested —
    // ranks must still be contiguous from 0
    val merges = SparkEntry.queries("d_bpe_train")(spark, dir).collect()
    assert(merges.length > 50 && merges.length <= 150)
    assert(merges.map(_.getLong(0)).sorted.toSeq == (0L until merges.length).toSeq)
    val cov = SparkEntry.queries("d_vocab_coverage")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(cov.nonEmpty)
    cov.foreach { case (_, n, oov, pm) =>
      assert(oov >= 0 && oov <= n)
      assert(pm == oov * 1000 / n)
    }
    // the vocab head covers common tokens: corpus-wide OOV rate is well
    // under 100% and at least one document is not fully in-vocab
    assert(cov.map(_._3).sum < cov.map(_._2).sum)
    assert(cov.exists(_._3 > 0))
  }

  test("d_bpe_roundtrip: decode identity + charset OOV on a hostile fixture (r15)") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.sf
    val out = SparkEntry.queries("d_bpe_roundtrip")(spark, dir)
    // identity: the decoded column equals the engine-independent
    // normalization for EVERY document, under a real trained model
    val norm = array_join(filter(split(lower(col("text")), "\\s+"),
      t => length(t) > 0), " ")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), norm.as("expect"))
    val joined = out.join(docs, "doc_id")
    assert(joined.filter(col("decoded") =!= col("expect")).count() == 0,
      "encode-decode must reproduce the normalized text exactly")
    // coverage: the English training slice is fully in-alphabet by
    // construction (its own charset). The synthetic corpus is pure ASCII
    // (the m_multimodal_sample premise), so cross-lang OOV stays 0 here —
    // the nonzero path is pinned below on a planted non-ASCII fixture.
    val byLang = joined.join(
        Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
    assert(byLang.filter(col("lang") === "en")
      .filter(col("oov_chars") > 0).count() == 0)
    // planted fixture: the same translate-deletion counting with an
    // ASCII-only alphabet must count each non-ASCII code point as OOV
    val oovProbe = Seq(("straße café", 10L), ("ascii only", 9L))
      .toDF("s", "expect")
      .select(col("expect"), col("s"),
        length(translate(translate(col("s"), " ", ""),
          "abcdefghijklmnopqrstuvwxyz", "")).cast("long").as("oov"))
      .collect()
    assert(oovProbe.forall(r => r.getLong(2) ==
      (if (r.getLong(0) == 10L) 2L else 0L)), oovProbe.mkString(","))
    // arithmetic: per-mille column derives exactly
    assert(out.filter(
      expr("oov_per_mille != oov_chars * 1000 div greatest(n_cp, 1)"))
      .count() == 0)
  }
}
