package graft

import graft.functions.{ShingleHash, TextFunctions}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-for-bit parity of the fused text→hash expressions
  * (graft.functions.ShingleHashExprs) against the higher-order-function
  * formulations they replaced — including the edge cases the HOF versions
  * define: empty text, all-whitespace text, sub-k documents, duplicate
  * shingles, unicode and multi-space runs.
  */
class ShingleHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the the the the",
    "",
    "   ",
    "one",
    "two words",
    "Tabs\tand\nnewlines   and  runs of   spaces",
    "Für straße UPPER Mixed ÄÖÜ tokens",
    "汉字 mixed with ascii 汉字 text",
    "a b a b a b a b"
  ).toDF("t")

  private def collectArr(dfCol: org.apache.spark.sql.Column): Seq[Seq[Long]] =
    samples.select(dfCol.as("x")).as[Seq[Long]].collect().toSeq

  test("wordShingleHashes == hashArray(shinglesFromTokens(tokens))") {
    for (k <- Seq(2, 3, 5)) {
      val fused = collectArr(ShingleHash.wordShingleHashes(col("t"), k))
      val hof = collectArr(hashArray(shinglesFromTokens(tokens(col("t")), k)))
      assert(fused == hof, s"k=$k")
    }
  }

  test("sorted wordShingleHashes == array_sort of the HOF form (fingerprint path)") {
    val fused = collectArr(ShingleHash.wordShingleHashes(col("t"), 3, sorted = true))
    val hof = collectArr(array_sort(hashArray(shinglesFromTokens(tokens(col("t")), 3))))
    assert(fused == hof)
  }

  test("tokenHashes == hashArray(tokens) (simhash input)") {
    val fused = collectArr(ShingleHash.tokenHashes(col("t")))
    val hof = collectArr(hashArray(tokens(col("t"))))
    assert(fused == hof)
  }

  test("bigramHashes == hashArray(bigramsFromTokens(tokens)) on >=2-token docs") {
    // the HOF bigram builder is undefined below 2 tokens (ANSI element_at);
    // the fused expression returns an empty array there instead
    val big = samples.filter(size(tokens(col("t"))) >= 2)
    val fused = big.select(ShingleHash.bigramHashes(col("t")).as("x"))
      .as[Seq[Long]].collect().toSeq
    val hof = big.select(hashArray(bigramsFromTokens(tokens(col("t")))).as("x"))
      .as[Seq[Long]].collect().toSeq
    assert(fused == hof)
    val tiny = Seq("one", "", "  ").toDF("t")
      .select(ShingleHash.bigramHashes(col("t")).as("x")).as[Seq[Long]].collect()
    assert(tiny.forall(_.isEmpty))
  }

  test("ngramHashes == array_sort(hashArray(ngramsFromNormalized(normalizeWs)))") {
    for (n <- Seq(2, 4)) {
      val fused = collectArr(ShingleHash.ngramHashes(col("t"), n))
      val hof = collectArr(
        array_sort(hashArray(ngramsFromNormalized(normalizeWs(col("t")), n))))
      assert(fused == hof, s"n=$n")
    }
  }

  test("fingerprint (fused) matches the HOF bottom-k formulation") {
    val fused = collectArr(TextFunctions.fingerprint(col("t"), 3, 8))
    val hof = collectArr(slice(array_sort(hashArray(wordShingles(col("t"), 3))), 1, 8))
    assert(fused == hof)
  }

  test("ngramTexts: xxhash64 of each text == positionShingleHashes, all edge cases") {
    for (n <- Seq(1, 2, 5)) {
      val rows = samples
        .select(ShingleHash.ngramTexts(col("t"), n).as("texts"),
          ShingleHash.positionShingleHashes(col("t"), n).as("hashes"))
        .select(transform(col("texts"), g => xxhash64(g)).as("rehashed"),
          col("hashes"))
        .as[(Seq[Long], Seq[Long])].collect()
      rows.foreach { case (re, h) => assert(re == h, s"n=$n") }
    }
  }

  test("null text yields null, not a crash") {
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(ShingleHash.wordShingleHashes(col("t"), 3).as("a"),
        ShingleHash.ngramHashes(col("t"), 4).as("b"),
        ShingleHash.tokenHashes(col("t")).as("c"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
