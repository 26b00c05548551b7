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
}
