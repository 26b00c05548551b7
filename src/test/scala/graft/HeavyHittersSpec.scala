package graft

import graft.functions.MisraGriesAgg.misraGries
import graft.operators.Corpus
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed token stream: token i appears ~ n/i times (zipf-ish) plus a long
  // uniform tail of near-unique tokens — the distribution the decrement
  // path and the merge-trim path both fire on
  private def skewedTokens(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.6) s"head${(1 / (rnd.nextDouble() + 0.01)).toInt}"
      else s"tail${rnd.nextInt(n)}"
    }
  }

  test("Misra-Gries: estimates never exceed truth; every f > N/(cap+1) item survives") {
    for ((seed, nParts) <- Seq((1, 1), (2, 7), (3, 32))) {
      val toks = skewedTokens(seed, 20000)
      val exact = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val df = toks.toDF("tok").repartition(nParts)
      val sk = df.agg(misraGries(col("tok"), 100).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toMap
      assert(sk.size <= 100)
      sk.foreach { case (k, est) =>
        assert(est <= exact(k), s"overestimate for $k: $est > ${exact(k)}")
      }
      val floor = toks.size / 101
      exact.filter(_._2 > floor).keys.foreach { k =>
        assert(sk.contains(k), s"guaranteed hitter $k (f=${exact(k)}) missing " +
          s"at nParts=$nParts")
      }
    }
  }

  test("heavyHitterTokens is EXACT: equals groupBy/filter truth at any partitioning") {
    val docs = skewedTokens(11, 6000).grouped(20).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    for (nParts <- Seq(1, 13)) {
      val d = docs.repartition(nParts)
      val toks = d.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      val n = toks.count()
      val want = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 150 > n).as[(String, Long)].collect().toSet
      val got = Corpus.heavyHitterTokens(d, "text", denom = 150, capacity = 600)
        .as[(String, Long)].collect().toSet
      assert(got == want, s"nParts=$nParts: got ${got.size}, want ${want.size}")
      assert(want.nonEmpty, "degenerate fixture: no heavy hitters to check")
    }
  }

  test("heavyHitterTokens: empty corpus and capacity guard") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Corpus.heavyHitterTokens(empty, "text").count() == 0)
    intercept[IllegalArgumentException] {
      Corpus.heavyHitterTokens(empty, "text", denom = 500, capacity = 100)
    }
  }

  test("property: MG bounds hold for arbitrary streams (unicode, empties, skew, capacities)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val tokenGen = Gen.frequency(
      (5, Gen.oneOf("héad", "ключ", "主键", "x", "")), // hot incl. unicode + empty string
      (3, Gen.alphaLowerChar.map(c => s"t$c")),
      (2, Gen.chooseNum(0, 5000).map(i => s"u$i")))
    for (seed <- 1 to 4; cap <- Seq(3, 17, 64)) {
      val toks = (0 until 400).flatMap(i =>
        tokenGen.apply(Gen.Parameters.default, Seed(seed * 1000L + i)))
      val exact = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val sk = toks.toDF("tok").repartition(seed * 3 + 1)
        .agg(misraGries(col("tok"), cap).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toMap
      assert(sk.size <= cap, s"seed=$seed cap=$cap size")
      sk.foreach { case (k, est) =>
        assert(est <= exact(k), s"seed=$seed cap=$cap overestimate $k")
      }
      val floor = toks.size / (cap + 1)
      exact.filter(_._2 > floor).keys.foreach { k =>
        assert(sk.contains(k), s"seed=$seed cap=$cap guaranteed $k missing")
      }
    }
  }

  test("generalized heavyHitters profiles any string column exactly") {
    val rows = ((1 to 300).map(_ => "BUILDING") ++ (1 to 200).map(_ => "MACHINERY")
      ++ (1 to 40).map(i => s"seg$i")).map(Tuple1(_)).toDF("segment")
    val got = Corpus.heavyHitters(rows, "segment", denom = 4, capacity = 16)
      .as[(String, Long)].collect().toSet
    assert(got == Set(("BUILDING", 300L), ("MACHINERY", 200L)))
  }

  test("sketch serde round-trips through the partial-merge path (multi-partition agg)") {
    // 64 partitions forces serialize/deserialize + merge of partial buffers;
    // a broken serde would corrupt counts or drop items
    val toks = (1 to 5000).map(i => s"w${i % 7}") ++ (1 to 500).map(i => s"u$i")
    val sk = toks.toDF("tok").repartition(64)
      .agg(misraGries(col("tok"), 50).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toMap
    (0 until 7).foreach { i =>
      assert(sk.contains(s"w$i"), s"w$i (freq ~714 of 5500) must survive")
    }
  }
}
