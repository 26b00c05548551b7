package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pngMagic = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2, 3)
  private val jpegMagic = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 9)

  test("attachMetadata sniffs formats from magic bytes") {
    val df = Seq((1L, pngMagic), (2L, jpegMagic), (3L, "plain".getBytes))
      .toDF("id", "payload")
    val meta = Multimodal.attachMetadata(df, "payload")
      .select(col("id"), col("media_meta.format"), col("media_meta.byte_len"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(meta(0)._2 == "png" && meta(0)._3 == 7)
    assert(meta(1)._2 == "jpeg")
    assert(meta(2)._2 == "unknown")
  }

  test("byteHistogram is a normalized 16-bucket feature per payload") {
    val df = Seq((1L, Array.fill[Byte](64)(0x00)), (2L, Array.fill[Byte](32)(0xff.toByte)))
      .toDF("id", "payload")
    val feats = Multimodal.byteHistogram(df, "payload", "id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L)(0) == 1.0f && feats(1L).sum == 1.0f)
    assert(feats(2L)(15) == 1.0f)
  }

  test("sampleChunks keeps every stride-th chunk with correct bytes") {
    val payload = (0 until 100).map(_.toByte).toArray
    val df = Seq((1L, payload)).toDF("id", "payload")
    val chunks = Multimodal.sampleChunks(df, "payload", chunkBytes = 10, stride = 2)
      .select(col("chunk_idx"), length(col("chunk")).as("len"))
      .as[(Int, Int)].collect().sortBy(_._1)
    assert(chunks.map(_._1).toSeq == Seq(0, 2, 4, 6, 8))
    assert(chunks.forall(_._2 == 10))
  }

  test("decodePixels is an explicit documented stub") {
    intercept[UnsupportedOperationException] {
      Multimodal.decodePixels(pngMagic)
    }
  }

  private def bytesOf(hexStr: String): Array[Byte] =
    hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("decodeHeader parses PNG IHDR geometry (big-endian)") {
    // 640×480, bit depth 8, truecolor+alpha
    val png = bytesOf("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000280" + "000001E0" + "08" + "06000000" + "DEADBEEF")
    assert(Multimodal.decodeHeader(png) ==
      (("png", Some(640), Some(480), Some(8))))
  }

  test("decodeHeader walks JPEG segments to any SOFn (skips APP0 + COM)") {
    // SOI, APP0 (JFIF), COM segment, then PROGRESSIVE SOF2: 1024×768
    val jpeg = bytesOf("FFD8" +
      "FFE0" + "0010" + "4A46494600010100000100010000" +
      "FFFE" + "0005" + "414243" + // COM "ABC"
      "FFC2" + "0011" + "08" + "0300" + "0400" + "03011100021101031101")
    assert(Multimodal.decodeHeader(jpeg) ==
      (("jpeg", Some(1024), Some(768), Some(8))))
  }

  test("decodeHeader reads the GIF logical screen (little-endian + packed bits)") {
    // GIF87a 320×200, packed 0x91 -> GCT size bits 001 -> depth 2
    val gif = "GIF87a".getBytes("US-ASCII") ++
      bytesOf("4001" + "C800" + "91" + "0000")
    assert(Multimodal.decodeHeader(gif) ==
      (("gif", Some(320), Some(200), Some(2))))
  }

  test("decodeHeader: truncated headers keep the format tag with null geometry") {
    val pngSig = bytesOf("89504E470D0A1A0A")
    assert(Multimodal.decodeHeader(pngSig) == (("png", None, None, None)))
    val gifSig = "GIF89a".getBytes("US-ASCII")
    assert(Multimodal.decodeHeader(gifSig) == (("gif", None, None, None)))
    // JPEG that ends before any SOF marker
    val noSof = bytesOf("FFD8FFD9")
    assert(Multimodal.decodeHeader(noSof) == (("jpeg", None, None, None)))
    // JPEG whose SOF header itself is cut mid-field
    val cutSof = bytesOf("FFD8" + "FFC0" + "001108" + "03")
    assert(Multimodal.decodeHeader(cutSof) == (("jpeg", None, None, None)))
    assert(Multimodal.decodeHeader("plain".getBytes) ==
      (("unknown", None, None, None)))
    assert(Multimodal.decodeHeader(Array.emptyByteArray) ==
      (("unknown", None, None, None)))
  }

  test("decodeHeaders DataFrame face emits nullable geometry columns") {
    val png = bytesOf("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000010" + "00000020" + "01" + "03000000" + "00000000")
    val df = Seq((1L, png), (2L, "nope".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.decodeHeaders(df, "payload", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
      .sortBy(_._1)
    assert(out(0) == ((1L, "png", Some(16), Some(32), Some(1))))
    assert(out(1) == ((2L, "unknown", None, None, None)))
  }
}
