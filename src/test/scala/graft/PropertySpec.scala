package graft

import graft.functions.Transformers._
import graft.functions.{JaccardExpr, VectorExprs}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks: generate batches with ScalaCheck, evaluate through
  * Spark ONCE per property (one job, not one per sample), and compare
  * against plain-Scala reference semantics.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 60): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8))
  private val sentence = Gen.listOfN(12, word).map(_.mkString(" "))

  test("property: concatAll == prefix + mkString(sep) + suffix") {
    val data = samples(Gen.zip(word, word, word))
    val got = data.toDF("a", "b", "c")
      .select(concatAll("-", "<", ">", col("a"), col("b"), col("c")))
      .as[String].collect()
    val expect = data.map { case (a, b, c) => Seq(a, b, c).mkString("<", "-", ">") }
    assert(got.toSeq == expect)
  }

  test("property: replaceSome(max) == Scala take-n regex replacement") {
    val data = samples(Gen.zip(sentence, Gen.chooseNum(1, 5)))
    val got = data.toDF("s", "n").select(col("n"),
        replaceSome(col("s"), "a", "_", 3).as("r"))
      .as[(Int, String)].collect().map(_._2)
    val expect = data.map { case (s, _) =>
      // replace first 3 'a's
      var out = s; var i = 0
      while (i < 3 && out.indexOf('a') >= 0 != false && { val p = out.indexOf('a'); p >= 0 }) {
        val p = out.indexOf('a'); out = out.substring(0, p) + "_" + out.substring(p + 1); i += 1
      }
      out
    }
    assert(got.toSeq == expect)
  }

  test("property: one-pass token profile == higher-order formulation (r15)") {
    // adversarial whitespace/unicode coverage: every Java-\s char, unicode
    // whitespace that \s does NOT match (NBSP, ideographic space), multi-
    // byte tokens, case folding (incl. İ whose lowering adds a code
    // point), leading/trailing/multiple separators, empties
    val tricky = Seq(
      "", " ", "\t\n\f\r", "the quick  brown\tfox", " the the THE ",
      "café Über straße", "你好 世界",
      "a b", "İstanbul IS is", "and\nof\rto\finis",
      "  x  ", "the", "THE.", "word-with-dash the,comma")
    val gen = samples(Gen.listOfN(10,
      Gen.oneOf(word, Gen.oneOf(tricky), sentence)).map(_.mkString(" ")), 40)
    val data = (tricky ++ gen).toDF("s")
    val stops = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is")
    // higher-order reference semantics, computed in the same job
    val toks = filter(split(lower(col("s")), "\\s+"), t => length(t) > 0)
    val rows = data.select(
        tokenCount(col("s")).as("fast_n"),
        size(toks).cast("long").as("ref_n"),
        stopwordPerMille(col("s"), stops).as("fast_stop"),
        when(size(toks) === 0, 0L).otherwise(floor(
          size(filter(toks, t => array_contains(lit(stops.toArray), t)))
            .cast("long") * 1000 / size(toks))).cast("long").as("ref_stop"),
        meanTokenLenPerMille(col("s")).as("fast_len"),
        when(size(toks) === 0, 0L).otherwise(floor(
          aggregate(toks, lit(0L), (acc, t) => acc + length(t)) * 1000
            / size(toks))).cast("long").as("ref_len"))
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == r.getLong(1), s"token count diverged at row $i: $r")
      assert(r.getLong(2) == r.getLong(3), s"stopword pm diverged at row $i: $r")
      assert(r.getLong(4) == r.getLong(5), s"mean len pm diverged at row $i: $r")
    }
  }

  test("property: splitSelect matches Scala split semantics incl. missing idx") {
    val data = samples(Gen.listOfN(4, word).map(_.mkString("#")))
    for (idx <- Seq(0, 2, 9)) {
      val got = data.toDF("s").select(splitSelect(col("s"), "#", idx))
        .as[String].collect()
      val expect = data.map { s =>
        val parts = s.split("#", -1)
        if (idx < parts.length) parts(idx).trim else ""
      }
      assert(got.toSeq == expect.toSeq, s"idx=$idx")
    }
  }

  test("property: timestampCalibrate reduce is floor-div and add inverts it") {
    val data = samples(Gen.chooseNum(0L, 4102444800000L))
    val got = data.toDF("ms")
      .select(timestampCalibrate(col("ms"), "reduce").as("s"),
        timestampCalibrate(timestampCalibrate(col("ms"), "reduce"), "add").as("back"))
      .as[(Long, Long)].collect()
    data.zip(got).foreach { case (ms, (s, back)) =>
      assert(s == ms / 1000 && back == (ms / 1000) * 1000)
    }
  }

  test("property: per-mille text metrics stay in [0, 1000]") {
    val messy = samples(Gen.listOfN(8,
      Gen.oneOf(word, Gen.const("!!!"), Gen.const("the"), Gen.const("...")))
      .map(_.mkString(" ")))
    val rows = messy.toDF("t").select(
      punctPerMille(col("t")).as("p"),
      stopwordPerMille(col("t")).as("s"))
      .as[(Long, Long)].collect()
    rows.foreach { case (p, s) =>
      assert(p >= 0 && p <= 1000 && s >= 0 && s <= 1000)
    }
  }

  test("property: chunkSliding covers every token; stride==size concatenates back") {
    val doc = Gen.zip(Gen.chooseNum(1L, 1000000L),
      Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString("  ")))
    val data = samples(doc).distinctBy(_._1)
    val df = data.toDF("doc_id", "text")
    for ((size, stride) <- Seq((4, 4), (4, 3), (5, 2))) {
      val chunks = graft.operators.Corpus
        .chunkSliding(df, "doc_id", "text", size, stride)
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      data.foreach { case (id, text) =>
        val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        val got = chunks.getOrElse(id, Array.empty[(Long, Long, Long, String)])
        if (toks.isEmpty) assert(got.isEmpty, s"doc $id: chunks from empty doc")
        else {
          // chunk i == tokens[i*stride, i*stride+size) rendered with single spaces
          val expect = Range(0, toks.length, stride).map(s =>
            toks.slice(s, s + size))
          assert(got.map(_._4).toSeq == expect.map(_.mkString(" ")), s"doc $id")
          assert(got.map(_._3).toSeq == expect.map(_.length.toLong), s"doc $id n_tokens")
          // no overlap case: chunks concatenate back to the tokenized doc
          if (size == stride)
            assert(got.flatMap(_._4.split(" ")).toSeq == toks, s"doc $id reassembly")
        }
      }
    }
  }

  test("property: jaccardSorted equals set-based Jaccard") {
    val setGen = Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted)
    val data = samples(Gen.zip(setGen, setGen)).filter { case (a, b) => a.nonEmpty || b.nonEmpty }
    val got = data.toDF("a", "b")
      .select(JaccardExpr.jaccardSorted(col("a"), col("b"))).as[Double].collect()
    data.zip(got).foreach { case ((a, b), j) =>
      val expect = a.toSet.intersect(b.toSet).size.toDouble / a.toSet.union(b.toSet).size
      assert(math.abs(j - expect) < 1e-12, s"a=$a b=$b")
    }
  }

  test("property: PQ encode/LUT/ADC pipeline equals plain-Scala asymmetric cosine") {
    import graft.functions.{PqAdcExpr, PqEncodeExpr, PqLutExpr}
    import graft.operators.Similarity
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1000, 1000).map(_ / 1000.0f))
    val data = samples(Gen.zip(vecGen, vecGen), 40).map { case (q, c) =>
      (q.toArray, c.toArray)
    }
    val df = data.toDF("q", "c")
    val books = Similarity.pqTrain(df.select(col("c").as("embedding")),
      "embedding", m = 4, ksub = 8)
    val got = df.select(toCol(PqAdcExpr(
      toExpr(toCol(PqLutExpr(toExpr(col("q")), books.books, books.ksub))),
      toExpr(toCol(PqEncodeExpr(toExpr(col("c")), books.books))),
      books.normSq, books.ksub)).as("adc")).as[Double].collect()
    // independent plain-Scala reference over the same codebooks
    data.zip(got).foreach { case ((q, c), adc) =>
      val sub = 4
      val codes = books.books.zipWithIndex.map { case (book, mi) =>
        book.indices.minBy { ci =>
          (0 until sub).map { j =>
            val x = if (mi * sub + j < c.length) c(mi * sub + j).toDouble else 0.0
            val d = x - book(ci)(j); d * d
          }.sum
        }
      }
      val dot = codes.zipWithIndex.map { case (ci, mi) =>
        (0 until sub).map { j =>
          val x = if (mi * sub + j < q.length) q(mi * sub + j).toDouble else 0.0
          x * books.books(mi)(ci)(j)
        }.sum
      }.sum
      val cn = codes.zipWithIndex.map { case (ci, mi) =>
        books.books(mi)(ci).map(x => x * x).sum
      }.sum
      val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
      val expect = if (qn * math.sqrt(cn) == 0.0) 0.0 else dot / (qn * math.sqrt(cn))
      assert(math.abs(adc - expect) < 1e-9, s"adc=$adc expect=$expect")
    }
  }

  test("property: cosineSim is 1 on self, symmetric, in [-1, 1]") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray)
      .suchThat(v => v.exists(_ != 0.0f))
    val data = samples(Gen.zip(vec, vec))
    val got = data.toDF("a", "b").select(
      VectorExprs.cosineSim(col("a"), col("a")).as("self"),
      VectorExprs.cosineSim(col("a"), col("b")).as("ab"),
      VectorExprs.cosineSim(col("b"), col("a")).as("ba"))
      .as[(Double, Double, Double)].collect()
    got.foreach { case (self, ab, ba) =>
      assert(math.abs(self - 1.0) < 1e-6)
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
    }
  }

  test("property: fused nearestCells equals the struct-sort centroid ranking") {
    import graft.functions.VectorFunctions
    val centroids: Seq[Seq[Double]] =
      (0 until 6).map(i => Seq.tabulate(8)(j => (i * 8 + j) % 5 - 2.0))
    val vec = Gen.listOfN(8, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray)
    val data = samples(vec)
    val structRank = array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(VectorFunctions.l2Sq(col("v"), typedLit(c)).as("d"), lit(i).as("cell"))
    }: _*))
    val got = data.toDF("v").select(
      VectorExprs.nearestCells(col("v"), centroids).as("fused"),
      transform(structRank, s => s.getField("cell")).as("hof"))
      .as[(Seq[Int], Seq[Int])].collect()
    got.foreach { case (fused, hof) => assert(fused == hof) }
  }

  test("property: fused lshBucket equals the per-plane hyperplaneSign packing") {
    import graft.functions.VectorFunctions
    val nBits = 8
    val vec = Gen.listOfN(32, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray)
      .suchThat(v => v.exists(_ != 0.0f))
    val data = samples(vec)
    val hofBucket = (0 until nBits)
      .map(p => VectorFunctions.hyperplaneSign(col("v"), p).cast("long") * lit(1L << p))
      .reduce(_ + _)
    val got = data.toDF("v").select(
      VectorExprs.lshBucket(col("v"), nBits).as("fused"),
      hofBucket.as("hof"))
      .as[(Long, Long)].collect()
    got.foreach { case (fused, hof) => assert(fused == hof) }
  }

  test("property: xlsx workbook round-trips arbitrary unicode cell matrices") {
    import graft.sources.Excel
    // XML-representable strings: printable ASCII + BMP letters + specials
    // the writer must escape, plus the three representable control chars
    // (tab/LF raw, CR as &#13; — a raw CR would normalize to LF on read);
    // all other C0 controls are rejected by the writer (tested separately)
    val cell = Gen.listOf(Gen.frequency(
      8 -> Gen.choose(' ', '~'),
      1 -> Gen.oneOf('<', '>', '&', '"', '\'', 'é', 'ñ', '漢', '→'),
      1 -> Gen.oneOf('\t', '\n', '\r')
    )).map(_.mkString.take(24))
    val rowGen = Gen.listOfN(4, Gen.option(cell))
    val data = samples(rowGen, n = 40)
    val df = data.map { r =>
      (r(0).orNull, r(1).orNull, r(2).orNull, r(3).orNull)
    }.toDF("c0", "c1", "c2", "c3")
    val dir = java.nio.file.Files.createTempDirectory("xlsx_prop")
    Excel.write(df, dir.resolve("p.xlsx").toString)
    val back = Excel.parseWorkbook(
      java.nio.file.Files.readAllBytes(dir.resolve("p.xlsx")))
    assert(back.length == data.length + 1) // header + rows
    back.drop(1).zip(data).zipWithIndex.foreach { case ((got, want), i) =>
      val w = want.map(_.orNull)
      // absent trailing cells parse as a shorter row — pad like the reader
      val g = got.padTo(4, null).toSeq
      assert(g == w, s"row $i: $g != $w")
    }
  }

  test("property: fixed-width round-trip through the V2 source, arbitrary cells") {
    // widths 10; values are interior-space-free, <= 8 chars (the format's
    // contract: trim="both" means leading/trailing whitespace is not
    // value-carrying), empties round-trip as null
    val cell = Gen.oneOf(
      Gen.const(""),
      Gen.nonEmptyListOf(Gen.frequency(
        6 -> Gen.alphaNumChar,
        1 -> Gen.oneOf('-', '_', '.', '#', '@'))).map(_.mkString.take(8)))
    val rowGen = Gen.listOfN(3, cell)
    val data = samples(rowGen, n = 50)
    val df = data.map(r => (r(0), r(1), r(2))).toDF("a", "b", "c")
    val dir = java.nio.file.Files.createTempDirectory("fw_prop").toString + "/out"
    val fields = Seq(("a", 10), ("b", 10), ("c", 10))
    graft.sinks.Sinks.writeFixedWidth(df, dir, fields)
    val back = spark.read.format("fixedwidth")
      .option("fields", "a:10,b:10,c:10").load(dir)
      .as[(String, String, String)].collect()
      .map(r => List(r._1, r._2, r._3).map(Option(_).getOrElse(""))).toSet
    val want = data.map(_.toList).toSet
    assert(back == want, s"missing=${want -- back} extra=${back -- want}")
  }
}
