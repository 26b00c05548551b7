package graft

import graft.sources.Xls
import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

/** BIFF8 .xls reader spec. The fixtures are written by a minimal test-only
  * CFB + BIFF8 writer below, deliberately covering the format's hard
  * corners: the mini-stream storage path (streams < 4096 bytes live in
  * 64-byte mini sectors inside the root entry's chain), an SST string
  * split across a CONTINUE record WITH an encoding flip (compressed →
  * UTF-16), and every cell record family the reader supports.
  */
class XlsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ------------------------------------------------------- BIFF helpers

  private def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] = le16(v & 0xFFFF) ++ le16((v >>> 16) & 0xFFFF)
  private def rec(id: Int, body: Array[Byte]): Array[Byte] =
    le16(id) ++ le16(body.length) ++ body
  private def compressed(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  private def utf16(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
  private def doubleBytes(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    (0 until 8).map(i => ((bits >> (8 * i)) & 0xFF).toByte).toArray
  }

  private def bofGlobals = rec(0x0809, le16(0x0600) ++ le16(0x0005) ++
    le16(0x0DBB) ++ le16(0x07CC) ++ le32(0) ++ le32(0))
  private def bofSheet = rec(0x0809, le16(0x0600) ++ le16(0x0010) ++
    le16(0x0DBB) ++ le16(0x07CC) ++ le32(0) ++ le32(0))
  private def eof = rec(0x000A, Array.empty[Byte])

  /** One XLUnicodeRichExtendedString, no runs: compressed when every char
    * fits 8 bits, UTF-16 otherwise (grbit 0x01) — the same choice a real
    * writer makes per string.
    */
  private def sstEntry(s: String): Array[Byte] =
    if (s.forall(_ < 256)) le16(s.length) ++ Array(0x00.toByte) ++ compressed(s)
    else le16(s.length) ++ Array(0x01.toByte) ++ utf16(s)

  private def labelSst(row: Int, c: Int, isst: Int): Array[Byte] =
    rec(0x00FD, le16(row) ++ le16(c) ++ le16(0) ++ le32(isst))
  private def number(row: Int, c: Int, d: Double): Array[Byte] =
    rec(0x0203, le16(row) ++ le16(c) ++ le16(0) ++ doubleBytes(d))
  private def rkInt(v: Int): Int = (v << 2) | 0x02
  private def rkCell(row: Int, c: Int, rk: Int): Array[Byte] =
    rec(0x027E, le16(row) ++ le16(c) ++ le16(0) ++ le32(rk))
  private def mulRk(row: Int, colFirst: Int, rks: Seq[Int]): Array[Byte] =
    rec(0x00BD, le16(row) ++ le16(colFirst) ++
      rks.flatMap(rk => le16(0) ++ le32(rk)).toArray ++
      le16(colFirst + rks.length - 1))
  private def boolErr(row: Int, c: Int, value: Boolean): Array[Byte] =
    rec(0x0205, le16(row) ++ le16(c) ++ le16(0) ++
      Array((if (value) 1 else 0).toByte, 0x00.toByte))
  private def errCell(row: Int, c: Int): Array[Byte] =
    rec(0x0205, le16(row) ++ le16(c) ++ le16(0) ++
      Array(0x17.toByte, 0x01.toByte)) // #REF!
  private def formulaNum(row: Int, c: Int, d: Double): Array[Byte] =
    rec(0x0006, le16(row) ++ le16(c) ++ le16(0) ++ doubleBytes(d) ++
      le16(0) ++ le32(0) ++ le16(0)) // grbit, chn, cce=0 (no parsed expr)
  private def formulaStr(row: Int, c: Int): Array[Byte] =
    rec(0x0006, le16(row) ++ le16(c) ++ le16(0) ++
      Array[Byte](0x00, 0, 0, 0, 0, 0, 0xFF.toByte, 0xFF.toByte) ++
      le16(0) ++ le32(0) ++ le16(0))
  private def stringRec(s: String): Array[Byte] =
    rec(0x0207, le16(s.length) ++ Array(0x00.toByte) ++ compressed(s))
  private def label(row: Int, c: Int, s: String): Array[Byte] =
    rec(0x0204, le16(row) ++ le16(c) ++ le16(0) ++
      le16(s.length) ++ Array(0x00.toByte) ++ compressed(s))

  private def boundsheet(pos: Int, name: String): Array[Byte] =
    rec(0x0085, le32(pos) ++ le16(0) ++
      Array(name.length.toByte, 0x00.toByte) ++ compressed(name))

  /** Assemble a workbook stream from (sheet name, cell records) substreams;
    * every BOUNDSHEET position is fixed up after globals layout.
    */
  private def workbookStreamMulti(sstRecords: Array[Byte],
                                  sheets: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bsLens = sheets.map { case (n, _) => 4 + 4 + 2 + 2 + n.length }
    val globalsLen = bofGlobals.length + bsLens.sum + sstRecords.length + eof.length
    val bodies = sheets.map { case (_, cells) => bofSheet ++ cells ++ eof }
    val offsets = bodies.scanLeft(globalsLen)(_ + _.length).init
    val globals = bofGlobals ++
      sheets.zip(offsets).map { case ((n, _), off) => boundsheet(off, n) }
        .foldLeft(Array.empty[Byte])(_ ++ _) ++
      sstRecords ++ eof
    assert(globals.length == globalsLen)
    globals ++ bodies.foldLeft(Array.empty[Byte])(_ ++ _)
  }

  private def workbookStream(sstRecords: Array[Byte],
                             sheetCells: Array[Byte]): Array[Byte] =
    workbookStreamMulti(sstRecords, Seq("Sheet1" -> sheetCells))

  // -------------------------------------------------------- CFB helpers

  private val FREE = 0xFFFFFFFF
  private val END = 0xFFFFFFFE
  private val FATSECT = 0xFFFFFFFD

  private def dirEntry(name: String, objType: Int, start: Int, size: Int,
                       child: Int = FREE): Array[Byte] = {
    val out = new Array[Byte](128)
    val n = utf16(name)
    System.arraycopy(n, 0, out, 0, n.length)
    System.arraycopy(le16(n.length + 2), 0, out, 64, 2)
    out(66) = objType.toByte
    out(67) = 1 // black
    System.arraycopy(le32(FREE), 0, out, 68, 4) // left sibling
    System.arraycopy(le32(FREE), 0, out, 72, 4) // right sibling
    System.arraycopy(le32(child), 0, out, 76, 4)
    System.arraycopy(le32(start), 0, out, 116, 4)
    System.arraycopy(le32(size), 0, out, 120, 4)
    out
  }

  private def cfbHeader(numFat: Int, firstDir: Int, firstMiniFat: Int,
                        numMiniFat: Int, fatSids: Seq[Int]): Array[Byte] = {
    val h = new Array[Byte](512)
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
    System.arraycopy(magic, 0, h, 0, 8)
    System.arraycopy(le16(0x003E), 0, h, 24, 2) // minor version
    System.arraycopy(le16(0x0003), 0, h, 26, 2) // major version 3
    System.arraycopy(le16(0xFFFE), 0, h, 28, 2) // little-endian
    System.arraycopy(le16(9), 0, h, 30, 2)      // 512-byte sectors
    System.arraycopy(le16(6), 0, h, 32, 2)      // 64-byte mini sectors
    System.arraycopy(le32(numFat), 0, h, 44, 4)
    System.arraycopy(le32(firstDir), 0, h, 48, 4)
    System.arraycopy(le32(4096), 0, h, 56, 4)   // mini cutoff
    System.arraycopy(le32(firstMiniFat), 0, h, 60, 4)
    System.arraycopy(le32(numMiniFat), 0, h, 64, 4)
    System.arraycopy(le32(END), 0, h, 68, 4)    // no DIFAT chain
    System.arraycopy(le32(0), 0, h, 72, 4)
    var i = 0
    while (i < 109) {
      System.arraycopy(le32(if (i < fatSids.length) fatSids(i) else FREE),
        0, h, 76 + 4 * i, 4)
      i += 1
    }
    h
  }

  private def sector(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](512)
    var o = 0
    parts.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
    out
  }

  private def fatSector(entries: Seq[Int]): Array[Byte] =
    sector(entries.padTo(128, FREE).flatMap(le32).toArray)

  /** Small stream (< 4096): store the workbook in the MINI stream. Layout:
    * sector 0 FAT, 1 directory, 2 miniFAT, 3.. mini-stream container.
    */
  private def cfbMini(stream: Array[Byte]): Array[Byte] = {
    val nMini = (stream.length + 63) / 64
    val containerBytes = nMini * 64
    val nContainer = (containerBytes + 511) / 512
    val fat = Seq(FATSECT, END, END) ++
      (0 until nContainer).map(k => if (k == nContainer - 1) END else 4 + k)
    val miniFat = (0 until nMini).map(k => if (k == nMini - 1) END else k + 1)
    val dir = sector(
      dirEntry("Root Entry", 5, 3, containerBytes, child = 1) ++
      dirEntry("Workbook", 2, 0, stream.length))
    val container = java.util.Arrays.copyOf(stream, nContainer * 512)
    val out = new ByteArrayOutputStream()
    out.write(cfbHeader(1, 1, 2, 1, Seq(0)))
    out.write(fatSector(fat))
    out.write(dir)
    out.write(fatSector(miniFat)) // same shape: 128 int32 entries
    out.write(container)
    out.toByteArray
  }

  /** Large stream (>= 4096): regular FAT chain. Layout: sector 0 FAT,
    * 1 directory, 2.. workbook.
    */
  private def cfbRegular(stream: Array[Byte]): Array[Byte] = {
    val n = (stream.length + 511) / 512
    require(2 + n <= 128, "test fixture exceeds one FAT sector")
    val fat = Seq(FATSECT, END) ++
      (0 until n).map(k => if (k == n - 1) END else 3 + k)
    val dir = sector(
      dirEntry("Root Entry", 5, END, 0, child = 1) ++
      dirEntry("Workbook", 2, 2, stream.length))
    val out = new ByteArrayOutputStream()
    out.write(cfbHeader(1, 1, END, 0, Seq(0)))
    out.write(fatSector(fat))
    out.write(dir)
    out.write(java.util.Arrays.copyOf(stream, n * 512))
    out.toByteArray
  }

  private def writeTmp(name: String, bytes: Array[Byte]): String = {
    val dir = Files.createTempDirectory(name)
    Files.write(Paths.get(dir.toString, s"$name.xls"), bytes)
    dir.toString
  }

  // ------------------------------------------------------------- fixtures

  /** header row + one data row covering every record family. */
  private def smallFixture: Array[Byte] = {
    val strings = Seq("id", "name", "qty", "price", "ok", "calc", "note", "alpha")
    val sst = rec(0x00FC, le32(strings.length) ++ le32(strings.length) ++
      strings.flatMap(sstEntry).toArray)
    val cells =
      (0 until 7).map(c => labelSst(0, c, c)).reduce(_ ++ _) ++ // header row
      labelSst(1, 0, 7) ++            // "alpha"
      label(1, 1, "inline") ++        // LABEL inline string
      rkCell(1, 2, rkInt(42)) ++      // RK integer 42
      number(1, 3, 19.25) ++          // NUMBER double
      boolErr(1, 4, value = true) ++  // BOOLERR
      formulaNum(1, 5, 7.0) ++        // FORMULA with numeric result
      formulaStr(1, 6) ++ stringRec("from-formula") ++
      mulRk(2, 0, Seq(rkInt(1), rkInt(2), rkInt(300))) ++ // MULRK row
      errCell(2, 3)                   // error cell → null
    cfbMini(workbookStream(sst, cells))
  }

  /** SST split across CONTINUE with an encoding flip: string 0 starts
    * compressed in the SST record and continues in UTF-16 inside the
    * CONTINUE; padding strings push the stream over 4096 bytes so the
    * regular-FAT path is exercised too.
    */
  private def continueFixture: Array[Byte] = {
    val headPart = "latin-"         // compressed half
    val tailPart = "héllo€" // utf-16 half (needs 16-bit chars)
    val full = headPart + tailPart
    val pads = (0 until 80).map(i => s"pad-string-$i-${"x" * 60}")
    // SST record: totals, string-0 header + compressed head chars ONLY
    val sstBody = le32(1 + pads.length) ++ le32(1 + pads.length) ++
      le16(full.length) ++ Array(0x00.toByte) ++ compressed(headPart)
    // CONTINUE: fresh grbit (0x01 = 16-bit) + tail chars + pad strings
    val contBody = Array(0x01.toByte) ++ utf16(tailPart) ++
      pads.flatMap(sstEntry).toArray
    val sst = rec(0x00FC, sstBody) ++ rec(0x003C, contBody)
    val cells = labelSst(0, 0, 0) ++ labelSst(1, 0, 3) // "pad-string-2-..."
    cfbRegular(workbookStream(sst, cells))
  }

  // ----------------------------------------------------------------- tests

  test("small .xls: mini-stream storage, every cell record family") {
    val rows = Xls.parseWorkbook(smallFixture)
    assert(rows.length == 3)
    assert(rows(0).toSeq == Seq("id", "name", "qty", "price", "ok", "calc", "note"))
    assert(rows(1).toSeq == Seq("alpha", "inline", "42", "19.25", "true", "7",
      "from-formula"))
    assert(rows(2).toSeq == Seq("1", "2", "300", null))
  }

  test("small .xls reads as a DataFrame with header, like the xlsx source") {
    val dir = writeTmp("xlssmall", smallFixture)
    val df = Xls.read(spark, dir)
    assert(df.columns.toSeq == Seq("id", "name", "qty", "price", "ok", "calc", "note"))
    val r = df.collect().head
    assert(r.getString(0) == "alpha" && r.getString(2) == "42" &&
      r.getString(3) == "19.25" && r.getString(4) == "true")
  }

  test("SST string split across CONTINUE with compressed→UTF-16 flip") {
    val rows = Xls.parseWorkbook(continueFixture)
    assert(rows(0)(0) == "latin-héllo€")
    assert(rows(1)(0).startsWith("pad-string-2-"))
  }

  test("regular-FAT chain path (stream >= 4096 bytes)") {
    // continueFixture is > 4096 by construction; also via the DataFrame API
    val dir = writeTmp("xlsbig", continueFixture)
    val df = Xls.read(spark, dir, header = false)
    assert(df.count() == 2)
    assert(df.collect().map(_.getString(0)).toSet ==
      Set("latin-héllo€", "pad-string-2-" + "x" * 60))
  }

  test("property: arbitrary cell matrices round-trip through the BIFF writer") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // cells: unicode strings (BMP, no surrogates), doubles, 30-bit RK ints,
    // booleans, or absent
    val str = Gen.listOfN(6, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf('é', 'ü', '€', '試', 'λ')))
      .map(_.mkString)
    sealed trait Cell
    case class S(v: String) extends Cell
    case class D(v: Double) extends Cell
    case class I(v: Int) extends Cell
    case class B(v: Boolean) extends Cell
    val cell: Gen[Option[Cell]] = Gen.frequency(
      4 -> str.map(s => Some(S(s))),
      2 -> Gen.chooseNum(-1e6, 1e6).map(d => Some(D(d))),
      2 -> Gen.chooseNum(-(1 << 29), (1 << 29) - 1).map(i => Some(I(i))), // 30-bit signed RK range
      1 -> Gen.oneOf(true, false).map(b => Some(B(b))),
      1 -> Gen.const(None))
    val matrix = Gen.listOfN(8, Gen.listOfN(5, cell))
    (0 until 12).foreach { trial =>
      val m = matrix(Gen.Parameters.default, Seed(4242L + trial)).get
      val strings = m.flatten.flatten.collect { case S(v) => v }.distinct
      val sidx = strings.zipWithIndex.toMap
      val sst = rec(0x00FC, le32(strings.length) ++ le32(strings.length) ++
        strings.flatMap(sstEntry).toArray)
      val cells = m.zipWithIndex.flatMap { case (row, r) =>
        row.zipWithIndex.flatMap {
          case (Some(S(v)), c) => labelSst(r, c, sidx(v)).toSeq
          case (Some(D(v)), c) => number(r, c, v).toSeq
          case (Some(I(v)), c) => rkCell(r, c, rkInt(v)).toSeq
          case (Some(B(v)), c) => boolErr(r, c, v).toSeq
          case (None, _)       => Seq.empty[Byte]
        }
      }.toArray
      val stream = workbookStream(sst, cells)
      val bytes = if (stream.length < 4096) cfbMini(stream) else cfbRegular(stream)
      val got = Xls.parseWorkbook(bytes)
      // expected: rows that have at least one present cell, trailing-null
      // trimmed, numbers rendered like the xlsx reader renders <v>
      def render(c: Cell): String = c match {
        case S(v) => v
        case D(v) => if (v == math.rint(v)) v.toLong.toString else v.toString
        case I(v) => v.toString
        case B(v) => if (v) "true" else "false"
      }
      val expect = m.map(_.map(_.map(render).orNull)).zipWithIndex
        .filter(_._1.exists(_ != null))
        .map { case (row, _) => row.reverse.dropWhile(_ == null).reverse }
      assert(got.map(_.toSeq) == expect.map(_.toSeq), s"trial $trial")
    }
  }

  test("multi-sheet workbook: first sheet by default, others by name") {
    val strings = Seq("front", "back")
    val sst = rec(0x00FC, le32(2) ++ le32(2) ++ strings.flatMap(sstEntry).toArray)
    val bytes = cfbMini(workbookStreamMulti(sst, Seq(
      "Data"    -> (labelSst(0, 0, 0) ++ number(0, 1, 1.5)),
      "Archive" -> (labelSst(0, 0, 1) ++ number(0, 1, 2.5)))))
    assert(Xls.parseWorkbook(bytes).map(_.toSeq) ==
      Vector(Seq("front", "1.5")))
    assert(Xls.parseWorkbook(bytes, Some("Archive")).map(_.toSeq) ==
      Vector(Seq("back", "2.5")))
    val e = intercept[IllegalArgumentException] {
      Xls.parseWorkbook(bytes, Some("Nope"))
    }
    assert(e.getMessage.contains("Data") && e.getMessage.contains("Archive"))
  }

  test("non-OLE2 bytes fail fast with a clear message") {
    val e = intercept[IllegalArgumentException] {
      Xls.parseWorkbook("PKnot-an-xls".getBytes)
    }
    assert(e.getMessage.contains("OLE2"))
  }
}
