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
    * wire an actual decoder here in production.
    */
  def decodePixels(bin: Array[Byte]): Array[Float] =
    throw new UnsupportedOperationException(
      "pixel decode requires an image codec library, none ships in this " +
        "container; byteHistogram demonstrates the identical partition/batch " +
        "plumbing with a codec-free feature")

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
