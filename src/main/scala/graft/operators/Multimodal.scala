package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2e): treat image/audio/video as
  * opaque `binary` columns with typed metadata, and run feature extraction
  * batch-wise per partition.
  *
  * The Spark-side shape — schema, partition-parallel batched extraction,
  * deterministic features — is real and tested; the actual pixel/sample
  * DECODER is stubbed (`decodePixels`) because no image/audio codec library
  * ships in this container. A production deployment drops its codec into
  * `decodePixels` without touching any of the plumbing.
  */
object Multimodal {

  /** Typed metadata for an opaque media payload: byte length, sha-256
    * content id, and a magic-byte format sniff — pure expressions, no UDF.
    * (Format sniffing mirrors what the reference's file parsers do with
    * DFASDL `bin` elements.)
    */
  def attachMetadata(df: DataFrame, binCol: String): DataFrame = {
    val bin = col(binCol)
    val magic = upper(hex(substring(bin, 1, 4)))
    df.withColumn("media_meta", struct(
      length(bin).cast(LongType).as("byte_len"),
      sha2(bin, 256).as("content_sha256"),
      when(magic.startsWith("89504E47"), "png")
        .when(magic.startsWith("FFD8FF"), "jpeg")
        .when(magic.startsWith("52494646"), "riff")
        .when(magic.startsWith("1A45DFA3"), "webm")
        .otherwise("unknown").as("format")
    ))
  }

  /** Byte-histogram feature: 16 buckets over byte values, L1-normalized —
    * a real, deterministic per-payload feature computed without any codec
    * (usable for corruption screening / format clustering at scale).
    * Implemented with mapPartitions in batches, the Scala analog of
    * `mapInPandas`: per-partition, per-batch iteration with a bounded batch
    * size, which is exactly the shape a vectorized decoder needs.
    */
  def byteHistogram(df: DataFrame, binCol: String, idCol: String,
                    batchSize: Int = 256): DataFrame =
    byteHistogramCounts(df, binCol, idCol, batchSize)
      .select(col("id"),
        transform(col("counts"),
          c => c.cast(DoubleType) / greatest(col("n_bytes"), lit(1L)).cast(DoubleType))
          .cast(ArrayType(FloatType)).as("features"))

  /** Raw 16-bucket byte counts + payload length — the integer-exact form of
    * [[byteHistogram]] (no float division), which is what an engine-portable
    * comparison needs. Dataset mapPartitions with a product encoder: the
    * per-partition batched iteration a vectorized decoder needs, without the
    * RDD detour's Row reflection.
    */
  def byteHistogramCounts(df: DataFrame, binCol: String, idCol: String,
                          batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a vectorized decoder would process a block
          batch.iterator.map { case (id, bytes) =>
            val hist = new Array[Long](16)
            var i = 0
            while (i < bytes.length) {
              hist((bytes(i) & 0xff) >>> 4) += 1
              i += 1
            }
            (id, hist, bytes.length.toLong)
          }
        }
      }.toDF("id", "counts", "n_bytes")
  }

  /** STUB — pixel decode. The plumbing contract: binary in, H×W×C float
    * tensor (flattened) out. No codec library is available in this build;
    * wire an actual decoder here in production. Header-level decode —
    * format, dimensions, bit depth — is NOT stubbed: [[decodeHeader]] is a
    * real pure-JDK parser.
    */
  def decodePixels(bin: Array[Byte]): Array[Float] =
    throw new UnsupportedOperationException(
      "pixel decode requires an image codec library, none ships in this " +
        "container; byteHistogram demonstrates the identical partition/batch " +
        "plumbing with a codec-free feature")

  /** REAL header decode (r15 — retires the SURVEY §2e "decode stubbed"
    * note at the metadata level): parse the container header of an opaque
    * media payload with pure JDK byte arithmetic — no codec library — and
    * return (format, width, height, bit_depth). This is the decode step a
    * curation pipeline actually needs at scan time (resolution filters,
    * aspect-ratio buckets, bit-depth screens) without ever decompressing
    * pixel data:
    *
    *  - PNG: 8-byte signature, then the IHDR chunk's big-endian
    *    width/height and bit-depth byte (ISO/IEC 15948 §11.2.2).
    *  - JPEG: SOI, then a marker scan that skips variable-length segments
    *    to the first SOF frame header (any SOFn except DHT/DAC/JPG) —
    *    precision, big-endian height then width (ITU T.81 §B.2.2).
    *  - GIF: GIF87a/GIF89a signature, then the logical-screen descriptor's
    *    LITTLE-endian width/height and the packed field's GCT-size bits
    *    (bit depth = (packed & 7) + 1; GIF89a spec §18).
    *
    * A payload whose magic matches but whose header is truncated keeps its
    * format tag with null geometry; an unrecognized payload is
    * ("unknown", null, null, null). Total per payload: a few dozen byte
    * reads, no allocation beyond the result.
    */
  def decodeHeader(b: Array[Byte])
  : (String, Option[Int], Option[Int], Option[Int]) = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val n = b.length
    def startsWith(sig: Int*): Boolean =
      n >= sig.length && sig.indices.forall(i => u8(i) == sig(i))
    if (startsWith(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)) {
      // IHDR must be the first chunk: length(4) type(4) at offset 8,
      // width/height/depth at 16/20/24
      if (n >= 25 && be32(8) >= 13 &&
          u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
        ("png", Some(be32(16)), Some(be32(20)), Some(u8(24)))
      else ("png", None, None, None)
    } else if (startsWith(0xff, 0xd8)) {
      var i = 2
      var res: (String, Option[Int], Option[Int], Option[Int]) =
        ("jpeg", None, None, None)
      var done = false
      while (!done && i + 1 < n) {
        if (u8(i) != 0xff) { done = true } // desynced — not a marker
        else {
          var j = i + 1
          while (j < n && u8(j) == 0xff) j += 1 // fill bytes
          if (j >= n) done = true
          else u8(j) match {
            case m if (m >= 0xc0 && m <= 0xcf) &&
                m != 0xc4 && m != 0xc8 && m != 0xcc => // SOFn frame header
              if (j + 8 < n)
                res = ("jpeg", Some(be16(j + 6)), Some(be16(j + 4)),
                  Some(u8(j + 3)))
              done = true
            case m if m == 0x01 || (m >= 0xd0 && m <= 0xd9) => // standalone
              i = j + 1
            case _ => // variable-length segment: skip by its length field
              if (j + 2 < n) i = j + 1 + be16(j + 1) else done = true
          }
        }
      }
      res
    } else if (startsWith('G', 'I', 'F', '8') && n >= 6 &&
        (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a') {
      if (n >= 11)
        ("gif", Some(le16(6)), Some(le16(8)), Some((u8(10) & 0x07) + 1))
      else ("gif", None, None, None)
    } else ("unknown", None, None, None)
  }

  /** [[decodeHeader]] over a DataFrame's binary column — the same batched
    * per-partition plumbing as [[byteHistogramCounts]] (where a pixel
    * decoder would slot in), emitting (id, format, width, height,
    * bit_depth) with null geometry for truncated/unknown payloads.
    */
  def decodeHeaders(df: DataFrame, binCol: String, idCol: String,
                    batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.iterator.map { case (id, bytes) =>
          val (fmt, w, h, d) = decodeHeader(bytes)
          (id, fmt, w, h, d)
        })
      }.toDF("id", "format", "width", "height", "bit_depth")
  }

  /** Frame sampling plumbing for chunked media: split the payload into
    * fixed-size chunks and keep every `stride`-th one — pure expressions
    * (posexplode over computed offsets), no UDF, fully distributed.
    */
  def sampleChunks(df: DataFrame, binCol: String, chunkBytes: Int,
                   stride: Int): DataFrame = {
    val nChunks = ceil(length(col(binCol)).cast(DoubleType) / chunkBytes).cast(IntegerType)
    df.withColumn("chunk_idx",
        explode(filter(sequence(lit(0), greatest(nChunks - 1, lit(0))),
          i => i % stride === 0)))
      .withColumn("chunk",
        expr(s"substring($binCol, chunk_idx * $chunkBytes + 1, $chunkBytes)"))
  }
}
