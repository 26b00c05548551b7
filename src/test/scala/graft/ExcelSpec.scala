package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{Excel, Sources}
import graft.sinks.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JDK .xlsx source/sink (reference surface:
  * helpers/ExcelToCSVConverter.scala). Covers the write→read round-trip,
  * foreign-file cell forms the writer never produces (shared strings,
  * sparse rows with explicit refs), and the directory-of-workbooks scale
  * path.
  */
class ExcelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)

  test("column letter/index conversion is bijective over three widths") {
    assert(Excel.colLetters(0) == "A" && Excel.colIndex("A1") == 0)
    assert(Excel.colLetters(25) == "Z" && Excel.colIndex("Z9") == 25)
    assert(Excel.colLetters(26) == "AA" && Excel.colIndex("AA12") == 26)
    assert(Excel.colLetters(701) == "ZZ" && Excel.colIndex("ZZ1") == 701)
    assert(Excel.colLetters(702) == "AAA" && Excel.colIndex("AAA1") == 702)
    (0 until 2000).foreach(i => assert(Excel.colIndex(Excel.colLetters(i) + "5") == i))
  }

  test("write→read round-trips strings, numbers, booleans, nulls and XML-hostile text") {
    val dir = tmpDir("xlsx_rt")
    val df = Seq(
      (1L, "plain", Some(1.5), Some(true)),
      (2L, "a <tag> & \"quote\" 'tick'", Some(-0.25), Some(false)),
      (3L, "unicode ñ → 漢字", None, None),
      (4L, "  spaces kept  ", Some(42.0), Some(true))
    ).toDF("id", "txt", "score", "flag")
      // null cells in two typed columns
      .withColumn("score", when(col("id") === 3, lit(null)).otherwise(col("score")))
    Sinks.writeExcel(df, dir.resolve("t.xlsx").toString)
    val back = Sources.readExcel(spark, dir.toString)
    assert(back.columns.toSeq == Seq("id", "txt", "score", "flag"))
    val rows = back.sort(col("id").cast("long")).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getString(0)).toSeq == Seq("1", "2", "3", "4"))
    assert(rows(1).getString(1) == "a <tag> & \"quote\" 'tick'")
    assert(rows(2).getString(1) == "unicode ñ → 漢字")
    assert(rows(3).getString(1) == "  spaces kept  ")
    assert(rows(2).isNullAt(2) && rows(2).isNullAt(3)) // null cells survive
    assert(rows(0).getString(2) == "1.5" && rows(0).getString(3) == "true")
    assert(rows(1).getString(2) == "-0.25" && rows(1).getString(3) == "false")
  }

  /** Hand-built workbook exercising what our writer never emits: a shared-
    * string table, rich-text runs, sparse rows that skip cells via explicit
    * `r` refs, and a second sheet.
    */
  private def foreignWorkbook(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def put(name: String, s: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(s.getBytes("UTF-8")); z.closeEntry()
    }
    put("[Content_Types].xml",
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("_rels/.rels", """<Relationships/>""")
    put("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Data" sheetId="1" r:id="rId7"/>
        |<sheet name="Extra" sheetId="2" r:id="rId8"/></sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId7" Type="t" Target="worksheets/data99.xml"/>
        |<Relationship Id="rId8" Type="t" Target="worksheets/extra.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |<si><t>name</t></si>
        |<si><r><t>rich </t></r><r><t>text</t></r></si>
        |<si><t xml:space="preserve">shared &amp; escaped</t></si></sst>""".stripMargin)
    put("xl/worksheets/data99.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>num</t></is></c><c r="C1" t="inlineStr"><is><t>ok</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>3.5</v></c><c r="C2" t="b"><v>1</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>2</v></c><c r="C3" t="b"><v>0</v></c></row>
        |<row r="4"><c r="B4"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    put("xl/worksheets/extra.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>other</t></is></c></row>
        |<row r="2"><c r="A2"><v>1</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    bos.toByteArray
  }

  test("foreign workbook: shared strings, rich-text runs, sparse rows, rels-resolved sheet") {
    val rows = Excel.parseWorkbook(foreignWorkbook())
    assert(rows.length == 4)
    assert(rows(0).toSeq == Seq("name", "num", "ok"))
    assert(rows(1).toSeq == Seq("rich text", "3.5", "true"))
    // row 3 skips B entirely — explicit refs must leave a null hole
    assert(rows(2).toSeq == Seq("shared & escaped", null, "false"))
    // row 4 starts at B — A must be null-padded
    assert(rows(3).toSeq == Seq(null, "7"))
  }

  test("foreign workbook: sheet selection by name") {
    val extra = Excel.parseWorkbook(foreignWorkbook(), sheet = Some("Extra"))
    assert(extra.map(_.toSeq) == Vector(Seq("other"), Seq("1")))
    val err = intercept[IllegalArgumentException] {
      Excel.parseWorkbook(foreignWorkbook(), sheet = Some("Nope"))
    }
    assert(err.getMessage.contains("not found"))
  }

  test("foreign workbook reads as a DataFrame with null-padded sparse rows") {
    val dir = tmpDir("xlsx_foreign")
    java.nio.file.Files.write(dir.resolve("f.xlsx"), foreignWorkbook())
    val df = Sources.readExcel(spark, dir.toString)
    assert(df.columns.toSeq == Seq("name", "num", "ok"))
    assert(df.count() == 3)
    assert(df.filter(col("name").isNull && col("num") === "7").count() == 1)
  }

  test("directory of workbooks reads as one DataFrame (one task per file)") {
    val dir = tmpDir("xlsx_many")
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((3L, "z")).toDF("k", "v")
    Sinks.writeExcel(a, dir.resolve("a.xlsx").toString)
    Sinks.writeExcel(b, dir.resolve("b.xlsx").toString)
    val back = Sources.readExcel(spark, dir.toString)
    assert(back.count() == 3)
    assert(back.select("k").as[String].collect().toSet == Set("1", "2", "3"))
  }

  test("sharded write emits one workbook per partition, read back whole") {
    val dir = tmpDir("xlsx_shard").toString + "/out"
    val df = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v").repartition(3)
    Excel.writeSharded(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".xlsx"))
    assert(files.length == 3, s"expected 3 shards, got ${files.length}")
    val back = Sources.readExcel(spark, dir)
    assert(back.count() == 50)
    assert(back.select("k").as[String].collect().map(_.toLong).toSet ==
      (1 to 50).map(_.toLong).toSet)
  }

  test("malformed bytes fail with a clear not-an-xlsx error") {
    val garbage = Array.tabulate[Byte](256)(i => (i * 7).toByte)
    val err = intercept[IllegalArgumentException] {
      Excel.parseWorkbook(garbage)
    }
    assert(err.getMessage.contains("not an xlsx"))
  }

  test("inline-string cell with multiple rich-text runs concatenates all runs") {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def put(name: String, s: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(s.getBytes("UTF-8")); z.closeEntry()
    }
    put("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheets><sheet name="S" sheetId="1"/></sheets></workbook>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><r><t>in </t></r><r><t xml:space="preserve">line </t></r><r><t>runs</t></r></is></c>
        |<c r="B1" t="inlineStr"><is><t>single</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    val rows = Excel.parseWorkbook(bos.toByteArray)
    assert(rows.map(_.toSeq) == Vector(Seq("in line runs", "single")))
  }

  test("carriage returns round-trip; other C0 control chars are rejected at write") {
    val dir = tmpDir("xlsx_cr")
    val df = Seq((1L, "crlf\r\nline"), (2L, "bare\rcr"), (3L, "tab\tlf\n"))
      .toDF("id", "txt")
    Sinks.writeExcel(df, dir.resolve("cr.xlsx").toString)
    val back = Sources.readExcel(spark, dir.toString)
      .sort(col("id").cast("long")).select("txt").as[String].collect()
    // a raw CR would be XML-normalized to LF on read; &#13; must survive
    assert(back.toSeq == Seq("crlf\r\nline", "bare\rcr", "tab\tlf\n"))
    // Excel.write streams driver-side, so the escape failure surfaces raw
    val err = intercept[IllegalArgumentException] {
      Sinks.writeExcel(Seq((1L, "nul\u0000byte")).toDF("id", "txt"),
        dir.resolve("bad.xlsx").toString)
    }
    assert(err.getMessage.contains("control character"))
  }

  test("header=false yields positional columns") {
    val dir = tmpDir("xlsx_nohdr")
    Sinks.writeExcel(Seq((1, "a")).toDF("c1", "c2"), dir.resolve("n.xlsx").toString)
    val back = Sources.readExcel(spark, dir.toString, header = false)
    assert(back.columns.toSeq == Seq("_c0", "_c1"))
    assert(back.count() == 2) // header row counts as data
  }
}
