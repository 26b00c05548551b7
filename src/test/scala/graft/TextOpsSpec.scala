package graft

import graft.functions.TextFunctions._
import graft.operators.Contamination
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scrubPii redacts emails, urls, ips and phones but not plain text") {
    val s = Seq("mail a@b.co or http://x.y/z from 10.1.2.3 call +1 (555) 123-4567 ok")
      .toDF("t").select(scrubPii(col("t"))).as[String].collect()(0)
    assert(s == "mail <EMAIL> or <URL> from <IP> call <PHONE> ok")
    val clean = Seq("nothing to redact here 42").toDF("t")
      .select(scrubPii(col("t"))).as[String].collect()(0)
    assert(clean == "nothing to redact here 42")
  }

  test("stripMarkup removes tags, unescapes entities, collapses whitespace") {
    val out = Seq(
      "<p class=\"x\">Hello <b>world</b></p>\n\n<br/>",
      "a &lt; b &amp;&amp; c &gt; d",
      "&amp;lt; stays escaped once",   // &amp; unescapes LAST
      "no markup at all"
    ).toDF("t").select(stripMarkup(col("t"))).as[String].collect().toSeq
    assert(out == Seq(
      "Hello world",
      "a < b && c > d",
      "&lt; stays escaped once",
      "no markup at all"), s"got $out")
  }

  test("splitSentences consumes delimiters, keeps trailing terminator attached") {
    val out = Seq("One two. Three four! Five? Six.")
      .toDF("t").select(splitSentences(col("t"))).as[Seq[String]].collect()(0)
    assert(out == Seq("One two", "Three four", "Five", "Six."), s"got $out")
  }

  test("repetition metric flags a degenerate document") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "every word here is used exactly once")
    ).toDF("doc_id", "text")
    val bg = docs.select(col("doc_id"), explode(bigramsFromTokens(tokens(col("text")))).as("bg"))
      .groupBy("doc_id", "bg").count()
      .groupBy("doc_id").agg((max("count") * 1000 / sum("count")).as("rep_pm"))
      .as[(Long, Double)].collect().toMap
    assert(bg(1L) == 1000.0) // one bigram repeated throughout
    assert(bg(2L) < 200.0)
  }

  test("unicode NFC normalization composes combining sequences (codegen + interpreted)") {
    import graft.functions.NormalizeExpr
    // "é" composed (U+00E9) vs "e"+U+0301; "Å" (U+00C5) vs "A"+U+030A
    val df = Seq(("caf\u00e9 \u00c5", "cafe\u0301 A\u030A")).toDF("composed", "decomposed")
    val r = df.select(NormalizeExpr.nfc(col("composed")).as("c"),
      NormalizeExpr.nfc(col("decomposed")).as("d")).collect()(0)
    assert(r.getString(0) == r.getString(1), "NFC must unify the two spellings")
    assert(r.getString(0) == "caf\u00e9 \u00c5")
    // interpreted path (filter forces eval in some plans) agrees with codegen
    val n = df.filter(NormalizeExpr.nfc(col("composed")) ===
      NormalizeExpr.nfc(col("decomposed"))).count()
    assert(n == 1)
    // NFKC folds compatibility forms: the ﬁ ligature becomes "fi"
    val lig = Seq("ﬁsh").toDF("t")
      .select(NormalizeExpr.nfkc(col("t"))).as[String].collect()(0)
    assert(lig == "fish")
  }

  test("contamination finds a planted benchmark copy and ignores disjoint docs") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta") // overlaps doc 1 only
    ).toDF("doc_id", "text")
    val hits = Contamination.sharedShingles(corpus, bench, "text", "doc_id",
      k = 3, minShared = 3).as[(Long, Long, Long)].collect()
    assert(hits.length == 1)
    assert(hits(0)._1 == 1L && hits(0)._2 == 100L && hits(0)._3 >= 3L)
  }
}
