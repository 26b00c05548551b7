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

  // ------------------------------------------------ real PNG pixel codec

  private def raster(w: Int, h: Int, ch: Int)(f: (Int, Int, Int) => Int) = {
    val px = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      px((y * w + x) * ch + c) = f(x, y, c).toByte
    Multimodal.Raster(w, h, ch, px)
  }

  test("PNG encode→decode round-trips gray, RGB and RGBA rasters exactly") {
    for (ch <- Seq(1, 3, 4)) {
      val img = raster(7, 5, ch)((x, y, c) => (x * 31 + y * 47 + c * 101) % 256)
      val back = Multimodal.decodePng(Multimodal.encodePng(img))
      assert(back.nonEmpty, s"channels=$ch")
      assert(back.get.width == 7 && back.get.height == 5 && back.get.channels == ch)
      assert(back.get.pixels.toSeq == img.pixels.toSeq, s"channels=$ch")
    }
  }

  test("PNG decoder reconstructs all five scanline filter types") {
    // Hand-build the FILTERED stream (encodePng only emits filter 0): a
    // 4x5 RGB image where row r uses filter r (None/Sub/Up/Average/Paeth),
    // then deflate it and wrap in chunks via encodePng's own framing by
    // splicing the IDAT. Expected pixels derive from the spec recurrences.
    val w = 4; val h = 5; val ch = 3; val stride = w * ch
    val expected = new Array[Byte](h * stride)
    val filtered = new Array[Byte](h * (stride + 1))
    val rnd = new scala.util.Random(42)
    for (r <- 0 until h) {
      filtered(r * (stride + 1)) = r.toByte // filter type = row index
      for (x <- 0 until stride) {
        val cur = rnd.nextInt(256)
        filtered(r * (stride + 1) + 1 + x) = cur.toByte
        val left = if (x >= ch) expected(r * stride + x - ch) & 0xff else 0
        val up = if (r > 0) expected((r - 1) * stride + x) & 0xff else 0
        val ul = if (r > 0 && x >= ch) expected((r - 1) * stride + x - ch) & 0xff else 0
        val p = left + up - ul
        val paeth =
          if (math.abs(p - left) <= math.abs(p - up) &&
              math.abs(p - left) <= math.abs(p - ul)) left
          else if (math.abs(p - up) <= math.abs(p - ul)) up else ul
        val v = r match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 => cur + paeth
        }
        expected(r * stride + x) = (v & 0xff).toByte
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(filtered); d.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
    d.end()
    // frame: signature + IHDR + custom IDAT + IEND (reuse encodePng's CRC math
    // by building a same-geometry shell and replacing its IDAT payload)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      out.write(tb); out.write(data); out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))
    chunk("IDAT", buf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    val got = Multimodal.decodePng(out.toByteArray)
    assert(got.nonEmpty)
    assert(got.get.pixels.toSeq == expected.toSeq)
  }

  test("PNG decoder refuses torn payloads instead of returning torn rasters") {
    val img = raster(6, 4, 3)((x, y, c) => x + y + c)
    val good = Multimodal.encodePng(img)
    assert(Multimodal.decodePng(good.take(20)).isEmpty)       // mid-IHDR cut
    assert(Multimodal.decodePng(good.dropRight(15)).isEmpty)  // IEND gone
    assert(Multimodal.decodePng(good.take(good.length - 30)).isEmpty)
    // geometry/stream length mismatch: lie about the height
    val lying = good.clone()
    lying(23) = 99.toByte // IHDR height low byte
    assert(Multimodal.decodePng(lying).isEmpty)
    // 16-bit depth and interlace are out of scope, not mis-decoded
    val deep = good.clone(); deep(24) = 16.toByte
    assert(Multimodal.decodePng(deep).isEmpty)
    // null payloads refuse instead of NPEing the task
    assert(Multimodal.decodePng(null).isEmpty)
    assert(Multimodal.decodeWav(null).isEmpty)
  }

  test("PNG decoder refuses decompression bombs without allocating") {
    // a valid 25-byte header claiming a 60000x60000 RGBA raster (13.4 GB)
    // must be refused by the geometry guard, not attempted
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      out.write(tb); out.write(data); out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", be32(60000) ++ be32(60000) ++ Array[Byte](8, 6, 0, 0, 0))
    chunk("IEND", Array.emptyByteArray)
    val t0 = System.nanoTime()
    assert(Multimodal.decodePng(out.toByteArray).isEmpty)
    assert((System.nanoTime() - t0) < 1e9) // refusal, not a 13 GB attempt
  }

  test("WAV encode→decode round-trips PCM samples, rejects truncation") {
    val samples = Array.tabulate(200)(i => ((i * 37) % 4096 - 2048).toShort)
    val clip = Multimodal.PcmClip(16000, 2, samples)
    val bytes = Multimodal.encodeWav(clip)
    val back = Multimodal.decodeWav(bytes)
    assert(back.nonEmpty)
    assert(back.get.sampleRate == 16000 && back.get.channels == 2)
    assert(back.get.samples.toSeq == samples.toSeq)
    assert(Multimodal.decodeWav(bytes.dropRight(1)).isEmpty) // data overrun
    assert(Multimodal.decodeWav(bytes.take(30)).isEmpty)     // no data chunk
    assert(Multimodal.decodeWav("RIFFxxxx".getBytes).isEmpty)
    // non-PCM format tag refused
    val alaw = bytes.clone(); alaw(20) = 6.toByte
    assert(Multimodal.decodeWav(alaw).isEmpty)
  }

  test("decodeImage (JDK codec): JPEG lossy round-trip bounded, PNG exact, torn refused") {
    // uniform-color JPEG: full entropy decode must land within quantization
    // distance of the planted color (measured max 3; a colorspace or
    // stride defect shows 50+)
    val uni = raster(10, 8, 3)((_, _, c) => Seq(200, 60, 130)(c))
    val jb = Multimodal.encodeJpeg(uni)
    val back = Multimodal.decodeImage(jb)
    assert(back.nonEmpty && back.get.width == 10 && back.get.height == 8)
    val maxErr = back.get.pixels.zipWithIndex.map { case (p, i) =>
      math.abs((p & 0xff) - Seq(200, 60, 130)(i % 3)) }.max
    assert(maxErr <= 8, s"JPEG uniform reconstruction err $maxErr")
    // the JDK codec reads our own PNG encoder's output EXACTLY
    val img = raster(7, 5, 3)((x, y, c) => (x * 31 + y * 47 + c * 101) % 256)
    val viaIIO = Multimodal.decodeImage(Multimodal.encodePng(img))
    assert(viaIIO.nonEmpty && viaIIO.get.pixels.toSeq == img.pixels.toSeq)
    // torn and null payloads refuse
    assert(Multimodal.decodeImage(jb.take(10)).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    // decodePixels routes PNG through the wire path, JPEG through the codec
    assert(Multimodal.decodePixels(Multimodal.encodePng(img)).length == 7 * 5 * 3)
    assert(Multimodal.decodePixels(jb).length == 10 * 8 * 3)
  }

  test("JPEG uniform reconstruction error over the FULL gate palette stays ≤ tol/2") {
    // m_multimodal_jpeg's oracle hardcodes within_tol=1 for every
    // non-corrupt row, which couples the gate to the JDK codec pair staying
    // inside tol=8 for all 256 palette values. This spec pins that coupling
    // with 2x margin: the EXACT palette and geometries the gate generates
    // (doc_id-derived uniform colors, 8-12 x 6-8), measured max error must
    // stay <= 4. A JDK encoder/decoder change (default quality /
    // subsampling) trips THIS spec first — a named signal, not an oracle
    // flake (r16, ADVICE item 3).
    val maxErr = (0 until 256).map { id =>
      val w = 8 + id % 5; val h = 6 + id % 3
      val rgb = Array((id * 5) % 256, (id * 7) % 256, (id * 11) % 256)
      val px = Array.tabulate(w * h * 3)(i => rgb(i % 3).toByte)
      val back = Multimodal.decodeImage(
        Multimodal.encodeJpeg(Multimodal.Raster(w, h, 3, px)))
      assert(back.nonEmpty && back.get.width == w && back.get.height == h)
      back.get.pixels.zipWithIndex
        .map { case (p, i) => math.abs((p & 0xff) - rgb(i % 3)) }.max
    }.max
    assert(maxErr <= 4, s"JPEG palette reconstruction err $maxErr (gate tol 8)")
  }

  test("pngStats / wavStats report exact integer stats with ok=0 for corrupt") {
    val img = raster(3, 2, 3)((x, y, c) => x * 3 + y * 7 + c * 11)
    val png = Multimodal.encodePng(img)
    val pdf = Seq((1L, png), (2L, png.take(10))).toDF("doc_id", "payload")
    val prows = Multimodal.pngStats(pdf, "payload", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    val expSum0 = (for (y <- 0 until 2; x <- 0 until 3) yield x * 3 + y * 7).sum
    assert(prows(1L) == ((1L, 3L, 2L, expSum0.toLong)))
    assert(prows(2L) == ((0L, -1L, -1L, -1L)))
    val wav = Multimodal.encodeWav(Multimodal.PcmClip(8000, 1,
      Array[Short](-5, 3, 0, 2047, -2048)))
    val adf = Seq((1L, wav), (2L, wav.dropRight(2))).toDF("doc_id", "payload")
    val arows = Multimodal.wavStats(adf, "payload", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(arows(1L) == ((1L, 5L, 5L + 3 + 0 + 2047 + 2048, 2048L)))
    assert(arows(2L) == ((0L, -1L, -1L, -1L)))
  }
}
