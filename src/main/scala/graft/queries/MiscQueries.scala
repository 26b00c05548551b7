package graft.queries

import graft.Tables
import graft.operators.Multimodal
import graft.streaming.Streams
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sessionization (batch twin of graft.streaming session windows) and
  * multimodal-column queries (SURVEY.md §2e/§2f).
  */
object MiscQueries {

  // Gap-based sessionization as gaps-and-islands — the batch twin of
  // Streams.sessionCounts, written so a DuckDB oracle can replay it exactly.
  private def sSessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapMs = 30L * 60 * 1000
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"))
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ms"))
    val wSess = Window.partitionBy(col("user_id")).orderBy(col("ms"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("brk",
        when(col("ms") - lag(col("ms"), 1).over(wOrd) > gapMs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(wSess))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ms")) - min(col("ms"))).as("dur_ms"))
  }

  private val sSessionizeSql =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
      |b AS (
      | SELECT user_id, ms,
      |  CASE WHEN ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms) > 1800000
      |       THEN 1 ELSE 0 END AS brk
      | FROM e),
      |s AS (
      | SELECT user_id, ms,
      |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ms
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      | FROM b)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      | COUNT(*) AS n_events, CAST(MAX(ms) - MIN(ms) AS BIGINT) AS dur_ms
      |FROM s GROUP BY user_id, session_id""".stripMargin

  // Multimodal metadata over a binary payload column (documents' text bytes
  // stand in for media payloads — the plumbing is payload-agnostic).
  private def mMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .select(col("doc_id"),
        length(col("payload")).cast(LongType).as("byte_len"),
        sha2(col("payload"), 256).as("content_sha256"))

  private val mMetaSql =
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      | sha256(text) AS content_sha256
      |FROM documents""".stripMargin

  // m_multimodal_dedup: exact payload-level dedup — group on the binary
  // content hash (the media-file dedup step of a multimodal pipeline; the
  // bytes themselves never shuffle, only 32-byte digests). Planted binary
  // copies prove collapse; survivors keep the smallest id.
  private def mDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
    val doubled = docs.unionByName(
      docs.filter(col("doc_id") < 60).withColumn("doc_id", col("doc_id") + 300000L))
    doubled.groupBy(sha2(col("payload"), 256).as("content_sha256"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  private val mDedupSql =
    """WITH u AS (
      | SELECT doc_id, text FROM documents
      | UNION ALL SELECT doc_id + 300000, text FROM documents WHERE doc_id < 60)
      |SELECT sha256(text) AS content_sha256,
      | CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS n_copies
      |FROM u GROUP BY 1""".stripMargin

  // t_transcode: binary↔text codecs (base64 / hex) — the payload staging
  // transformers an ETL uses to move binary through text-only channels.
  // base64 runs on a 48-byte slice (64 output chars) so neither engine's
  // MIME line-wrapping threshold (76 chars) can fire; the round-trip
  // equality is asserted as a column both engines must agree is TRUE.
  private def tTranscode(spark: SparkSession, dir: String): DataFrame = {
    val payload = col("text").cast(BinaryType)
    val head = substring(payload, 1, 48)
    Tables.documents(spark, dir).select(col("doc_id"),
      base64(head).as("b64"),
      hex(substring(payload, 1, 16)).as("hx"),
      (unbase64(base64(head)) === head).as("rt_ok"))
  }

  private val tTranscodeSql =
    """SELECT doc_id,
      | to_base64(encode(substring(text, 1, 48))) AS b64,
      | hex(encode(substring(text, 1, 16))) AS hx,
      | from_base64(to_base64(encode(substring(text, 1, 48)))) = encode(substring(text, 1, 48)) AS rt_ok
      |FROM documents""".stripMargin

  // Full multimodal plumbing: metadata struct + batched per-partition
  // feature extraction + chunk sampling. The 16-bucket byte histogram is
  // rendered per-million in INTEGER arithmetic (count*1e6 div n — the
  // pmod trick keeps the double division exact), so DuckDB can replay it
  // bit-for-bit: the corpus is ASCII, so per-character high nibbles are the
  // byte histogram.
  private def mFeatures(spark: SparkSession, dir: String): DataFrame = {
    val withBin = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
    val meta = Multimodal.attachMetadata(withBin, "payload")
      .select(col("doc_id"), col("media_meta.byte_len").as("byte_len"),
        col("media_meta.format").as("format"))
    val feats = Multimodal.byteHistogramCounts(withBin, "payload", "doc_id")
      .withColumnRenamed("id", "doc_id")
      // canonical fixed-precision render (per-million buckets): the driver's
      // pandas sort cannot hash array cells, and the render must be
      // integer-exact so both engines agree
      .withColumn("features",
        array_join(transform(col("counts"), c => {
          val x = c * lit(1000000L)
          val n = greatest(col("n_bytes"), lit(1L))
          ((x - pmod(x, n)) / n).cast(LongType).cast(StringType)
        }), ","))
      .select(col("doc_id"), col("features"))
    meta.join(feats, "doc_id")
  }

  private val mFeaturesSql =
    """WITH ch AS (
      | SELECT doc_id, octet_length(encode(text)) AS n,
      |  list_transform(string_split_regex(text, ''), c -> unicode(c) >> 4) AS nib
      | FROM documents)
      |SELECT doc_id, CAST(n AS BIGINT) AS byte_len, 'unknown' AS format,
      | array_to_string(list_transform(range(0, 16),
      |   b -> CAST(len(list_filter(nib, x -> x = b)) * 1000000 // greatest(n, 1) AS VARCHAR)), ',') AS features
      |FROM ch""".stripMargin

  // -------------------------------------------------- m_multimodal_decode
  // REAL header decode (closes the one admitted stub in the tree, r15):
  // Multimodal.decodeHeader parses PNG IHDR / JPEG SOFn / GIF
  // logical-screen geometry with pure JDK byte arithmetic. The fixture
  // PLANTS real container headers whose integer fields derive from doc_id
  // (format by doc_id % 4; width/height/depth by independent moduli), so
  // the decoder must genuinely parse the bytes — signature check, chunk
  // walk, marker-segment skip (the JPEG header carries a full APP0/JFIF
  // segment before its SOF0), endianness per format (PNG/JPEG big-endian,
  // GIF little-endian), packed-field bit extraction — while DuckDB
  // replays the planted values by the same doc_id arithmetic. The
  // doc_id % 4 == 3 leg plants a bare 8-byte PNG signature: format tag
  // without geometry, pinning the truncated-header → null contract.
  private def mDecode(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val w = (id % 997 + 1).cast(LongType)
    val h = (id % 613 + 1).cast(LongType)
    val hx = (c: Column, len: Int) => lpad(hex(c), len, "0")
    val pngDepth = element_at(
      array(lit(1L), lit(2L), lit(4L), lit(8L), lit(16L)),
      (id % 5 + 1).cast(IntegerType))
    val gifDepth = (id % 8 + 1).cast(LongType)
    // GIF packed field: GCT flag + color-resolution bits + GCT-size bits
    val gifPacked = lit(128L) + (gifDepth - 1) * 16 + (gifDepth - 1)
    val payloadHex =
      when(id % 4 === 0, // PNG: signature + IHDR (13-byte data) + CRC
        concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
          hx(w, 8), hx(h, 8), hx(pngDepth, 2), lit("06000000DEADBEEF")))
      .when(id % 4 === 1, // JPEG: SOI + APP0/JFIF segment + SOF0
        concat(lit("FFD8" + "FFE0" + "0010" + "4A46494600010100000100010000" +
          "FFC0" + "0011" + "08"), hx(h, 4), hx(w, 4),
          lit("03011100021101031101")))
      .when(id % 4 === 2, // GIF89a logical screen descriptor (LE fields)
        concat(lit("474946383961"),
          hx(w % 256, 2), hx(expr("(doc_id % 997 + 1) div 256"), 2),
          hx(h % 256, 2), hx(expr("(doc_id % 613 + 1) div 256"), 2),
          hx(gifPacked, 2), lit("0000")))
      .otherwise(lit("89504E470D0A1A0A")) // truncated: signature only
    val withBin = Tables.documents(spark, dir)
      .select(col("doc_id"), unhex(payloadHex).as("payload"))
    Multimodal.decodeHeaders(withBin, "payload", "doc_id")
      .select(col("id").as("doc_id"), col("format"),
        col("width"), col("height"), col("bit_depth"))
  }

  private val mDecodeSql =
    """SELECT doc_id,
      | CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
      |  WHEN 2 THEN 'gif' ELSE 'png' END AS format,
      | CASE WHEN doc_id % 4 = 3 THEN NULL
      |  ELSE CAST(doc_id % 997 + 1 AS INT) END AS width,
      | CASE WHEN doc_id % 4 = 3 THEN NULL
      |  ELSE CAST(doc_id % 613 + 1 AS INT) END AS height,
      | CASE CAST(doc_id % 4 AS INT)
      |  WHEN 0 THEN CAST(([1,2,4,8,16])[CAST(doc_id % 5 AS INT) + 1] AS INT)
      |  WHEN 1 THEN 8
      |  WHEN 2 THEN CAST(doc_id % 8 + 1 AS INT)
      |  ELSE NULL END AS bit_depth
      |FROM documents""".stripMargin

  // ------------------------------------------------------- q27_skew_join
  // The salted skew join under the driver's hash-check: spreading each hot
  // key over saltFactor sub-keys (dimension side replicated + broadcast)
  // must return EXACTLY the plain join's rows, so the oracle is simply the
  // unsalted join. l_linenumber keeps output rows unique for stable sorts.
  private def qSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 45.0) // pushed below the salt projection
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    graft.operators.SkewJoin.salted(li, o, "l_orderkey", "o_orderkey", saltFactor = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("o_totalprice"))
  }

  private val qSkewJoinSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_quantity >= 45.0""".stripMargin

  // -------------------------------------------------- m_multimodal_sample
  // Frame-sampling plumbing over opaque binary payloads: fixed-size chunks,
  // keep every stride-th (what a video pipeline does per frame-group).
  // Chunks render as sha256 so cells stay scalar. The corpus text is pure
  // ASCII (verified), so the oracle's character slicing replays the byte
  // slicing exactly; sha256(VARCHAR) hashes the same UTF-8 bytes Spark's
  // sha2(BINARY) sees.
  private def mSample(spark: SparkSession, dir: String): DataFrame = {
    val withBin = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
    Multimodal.sampleChunks(withBin, "payload", chunkBytes = 100, stride = 3)
      .select(col("doc_id"), col("chunk_idx").cast(LongType).as("chunk_idx"),
        sha2(col("chunk"), 256).as("chunk_sha"))
  }

  private val mSampleSql =
    """SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
      | sha256(substring(text, u.i * 100 + 1, 100)) AS chunk_sha
      |FROM documents,
      | UNNEST(range(0, greatest(CAST(ceil(length(text) / 100.0) AS INT), 1))) AS u(i)
      |WHERE u.i % 3 = 0""".stripMargin

  // ------------------------------------------------------- q18_asof_join
  // Latest order at-or-before each event for the same user — backward as-of
  // join via graft.operators.AsOfJoin (union + window; one shuffle). The
  // right side is pre-deduped to one row per (key, time) so ties are
  // deterministic on both engines; DuckDB replays it with its native ASOF.
  private def qAsof(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val ev = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    graft.operators.AsOfJoin.backward(ev, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightPayload = Seq("o_orderkey", "o_orderdate"))
      .filter(col("asof").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("asof.o_orderkey").as("matched_order"),
        col("asof.o_orderdate").as("matched_date"))
  }

  private val qAsofSql =
    """WITH o AS (
      | SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      | FROM orders GROUP BY o_custkey, o_orderdate)
      |SELECT event_id, user_id, o_orderkey AS matched_order, o_orderdate AS matched_date
      |FROM events ASOF JOIN o
      | ON user_id = o_custkey AND ts >= o_orderdate""".stripMargin

  // ---------------------------------------------------- q24_interval_join
  // Range (interval) join: every purchase attributed to the same user's
  // clicks in the preceding 30 minutes — the batch twin of
  // Streams.attributionJoin (the watermarked stream-stream join). The plan
  // is an equi-join on user_id with the time band as a join-level filter:
  // one hash shuffle on the key, no cartesian, which is the shape that
  // survives a 100 TB event table.
  private def qIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    Streams.attributionJoin(ev) // identical logic; batch DataFrames are fine
  }

  private val qIntervalJoinSql =
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
      | epoch_ms(c.ts) AS click_ms, epoch_ms(p.ts) AS purchase_ms
      |FROM events c JOIN events p ON c.user_id = p.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |WHERE c.event_type = 'click' AND p.event_type = 'purchase'""".stripMargin

  // ---------------------------------------------------- q26_asof_forward
  // Earliest event at-or-after each order's date per customer (the
  // next-activity lookup) — the forward mirror of q18, same single
  // shuffle+sort composition; DuckDB replays it with a forward ASOF
  // (o_orderdate <= ts). Events pre-deduped per (user, ts) so ties are
  // deterministic; the match timestamp renders as epoch ms (nanos-safe).
  private def qAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("event_id"))
    val orders = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    graft.operators.AsOfJoin.forward(orders, ev,
        leftKey = "o_custkey", rightKey = "user_id",
        leftTime = "o_orderdate", rightTime = "ts",
        rightPayload = Seq("event_id", "ts"))
      .filter(col("asof").isNotNull)
      .select(col("o_orderkey"), col("o_custkey"),
        col("asof.event_id").as("next_event"),
        unix_millis(col("asof.ts")).as("next_ms"))
  }

  private val qAsofForwardSql =
    """WITH e AS (
      | SELECT user_id, ts, MAX(event_id) AS event_id
      | FROM events GROUP BY user_id, ts)
      |SELECT o_orderkey, o_custkey, event_id AS next_event, epoch_ms(e.ts) AS next_ms
      |FROM orders ASOF JOIN e
      | ON o_custkey = user_id AND o_orderdate <= e.ts""".stripMargin

  // ------------------------------------------------- m_multimodal_pixels
  // REAL pixel decode (r15 — the pixel-level companion to
  // m_multimodal_decode's header walk): the fixture ENCODES a genuine PNG
  // per document (Multimodal.encodePng: deflated IDAT, CRC-32 chunks) whose
  // pixel values derive from doc_id arithmetic, and the query must decode
  // it back — signature, chunk walk, Inflater, scanline unfiltering —
  // to report integer raster stats. DuckDB replays the planted pixel
  // function over generate_series without ever touching PNG bytes, so any
  // decoder defect (wrong stride, filter, channel order, inflate slip)
  // breaks the hash. The doc_id % 7 == 3 leg truncates the payload to 20
  // bytes, pinning the corrupt → ok=0/-1 contract.
  private def mPixels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).filter(col("doc_id") < 300)
      .select(col("doc_id")).as[Long]
    val payloads = ids.mapPartitions(_.map { id =>
      val w = (8 + id % 5).toInt; val h = (6 + id % 3).toInt
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            px((y * w + x) * 3 + c) =
              ((id * 5 + x * 3 + y * 7 + c * 11) % 256).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      val bytes = Multimodal.encodePng(Multimodal.Raster(w, h, 3, px))
      (id, if (id % 7 == 3) bytes.take(20) else bytes)
    }).toDF("doc_id", "payload")
    Multimodal.pngStats(payloads, "payload", "doc_id")
      .select(col("id").as("doc_id"), col("ok"), col("width"), col("height"),
        col("channels"), col("sum_c0"), col("sum_c1"), col("sum_c2"))
  }

  private val mPixelsSql =
    """WITH g AS (
      | SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h,
      |  doc_id % 7 = 3 AS corrupt
      | FROM documents WHERE doc_id < 300),
      |px AS (
      | SELECT doc_id, w, unnest(generate_series(0, w*h - 1)) AS p
      | FROM g WHERE NOT corrupt),
      |s AS (
      | SELECT doc_id,
      |  SUM((doc_id*5 + (p % w)*3 + (p // w)*7) % 256) AS s0,
      |  SUM((doc_id*5 + (p % w)*3 + (p // w)*7 + 11) % 256) AS s1,
      |  SUM((doc_id*5 + (p % w)*3 + (p // w)*7 + 22) % 256) AS s2
      | FROM px GROUP BY 1)
      |SELECT g.doc_id,
      | CAST(CASE WHEN corrupt THEN 0 ELSE 1 END AS BIGINT) AS ok,
      | CAST(CASE WHEN corrupt THEN -1 ELSE w END AS BIGINT) AS width,
      | CAST(CASE WHEN corrupt THEN -1 ELSE h END AS BIGINT) AS height,
      | CAST(CASE WHEN corrupt THEN -1 ELSE 3 END AS BIGINT) AS channels,
      | CAST(COALESCE(s0, -1) AS BIGINT) AS sum_c0,
      | CAST(COALESCE(s1, -1) AS BIGINT) AS sum_c1,
      | CAST(COALESCE(s2, -1) AS BIGINT) AS sum_c2
      |FROM g LEFT JOIN s USING (doc_id)""".stripMargin

  // -------------------------------------------------- m_multimodal_audio
  // REAL audio decode (r15): the fixture encodes genuine 16-bit PCM WAV
  // containers (Multimodal.encodeWav) with doc_id-derived sample rate,
  // length and waveform; the query decodes them back (RIFF chunk walk,
  // fmt validation, little-endian sample extraction) and reports the
  // silence/clipping screens — total and peak absolute amplitude — that
  // DuckDB replays arithmetically. The doc_id % 11 == 5 leg drops the
  // last 3 bytes so the data chunk's declared length overruns the
  // payload, pinning the truncated → ok=0/-1 contract.
  private def mAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).filter(col("doc_id") < 300)
      .select(col("doc_id")).as[Long]
    val payloads = ids.mapPartitions(_.map { id =>
      val rate = (8000 + (id % 4) * 4000).toInt
      val n = (64 + id % 32).toInt
      val samples = Array.tabulate(n)(i => ((id * 31 + i * 17) % 4096 - 2048).toShort)
      val bytes = Multimodal.encodeWav(Multimodal.PcmClip(rate, 1, samples))
      (id, if (id % 11 == 5) bytes.dropRight(3) else bytes)
    }).toDF("doc_id", "payload")
    Multimodal.wavStats(payloads, "payload", "doc_id")
      .select(col("id").as("doc_id"), col("ok"), col("sample_rate"),
        col("channels"), col("n_samples"), col("sum_abs"), col("max_abs"))
  }

  private val mAudioSql =
    """WITH g AS (
      | SELECT doc_id, 8000 + (doc_id % 4) * 4000 AS rate, 64 + doc_id % 32 AS n,
      |  doc_id % 11 = 5 AS corrupt
      | FROM documents WHERE doc_id < 300),
      |sm AS (
      | SELECT doc_id, unnest(generate_series(0, n - 1)) AS i
      | FROM g WHERE NOT corrupt),
      |s AS (
      | SELECT doc_id,
      |  SUM(ABS((doc_id*31 + i*17) % 4096 - 2048)) AS sa,
      |  MAX(ABS((doc_id*31 + i*17) % 4096 - 2048)) AS ma
      | FROM sm GROUP BY 1)
      |SELECT g.doc_id,
      | CAST(CASE WHEN corrupt THEN 0 ELSE 1 END AS BIGINT) AS ok,
      | CAST(CASE WHEN corrupt THEN -1 ELSE rate END AS BIGINT) AS sample_rate,
      | CAST(CASE WHEN corrupt THEN -1 ELSE 1 END AS BIGINT) AS channels,
      | CAST(CASE WHEN corrupt THEN -1 ELSE n END AS BIGINT) AS n_samples,
      | CAST(COALESCE(sa, -1) AS BIGINT) AS sum_abs,
      | CAST(COALESCE(ma, -1) AS BIGINT) AS max_abs
      |FROM g LEFT JOIN s USING (doc_id)""".stripMargin

  // --------------------------------------------------- m_multimodal_jpeg
  // REAL JPEG pixel decode through the JDK codec (r15 — javax.imageio
  // ships in java.desktop, so the "no codec library in this container"
  // boundary recorded in earlier rounds was WRONG and is retired): the
  // fixture encodes genuine baseline JPEGs (entropy-coded, quantized) of
  // uniform doc_id-derived color; the query must run the full decode —
  // Huffman, dequantize, IDCT, YCbCr→RGB — and report exact geometry plus
  // the within-tolerance flag (the invariant-oracle trick for a LOSSY
  // codec: reconstruction values are codec-specific, but uniform blocks
  // must come back within quantization distance — measured max error 3
  // over the full palette, tol 8, while a stride/channel/colorspace defect
  // shows 50+). doc_id % 13 == 7 truncates to 10 bytes, pinning ok=0.
  // JDK-VERSION COUPLING (r16, ADVICE): the oracle hardcodes within_tol=1,
  // so the gate assumes the JDK's JPEG encoder/decoder pair stays inside
  // tol=8 for all 256 palette values. MultimodalSpec's full-palette test
  // pins the measured max error <= 4 (2x margin) — a codec change trips
  // that named spec before it can flake this oracle.
  private def mJpeg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).filter(col("doc_id") < 300)
      .select(col("doc_id")).as[Long]
    val payloads = ids.mapPartitions(_.map { id =>
      val w = (8 + id % 5).toInt; val h = (6 + id % 3).toInt
      val rgb = Array(((id * 5) % 256).toByte, ((id * 7) % 256).toByte,
        ((id * 11) % 256).toByte)
      val px = Array.tabulate(w * h * 3)(i => rgb(i % 3))
      val bytes = Multimodal.encodeJpeg(Multimodal.Raster(w, h, 3, px))
      (id, if (id % 13 == 7) bytes.take(10) else bytes)
    }).toDF("doc_id", "payload")
    Multimodal.jpegUniformStats(payloads, "payload", "doc_id",
        pmod(col("doc_id") * 5, lit(256)), pmod(col("doc_id") * 7, lit(256)),
        pmod(col("doc_id") * 11, lit(256)), tol = 8)
      .select(col("id").as("doc_id"), col("ok"), col("width"), col("height"),
        col("within_tol"))
  }

  private val mJpegSql =
    """SELECT doc_id,
      | CAST(CASE WHEN doc_id % 13 = 7 THEN 0 ELSE 1 END AS BIGINT) AS ok,
      | CAST(CASE WHEN doc_id % 13 = 7 THEN -1 ELSE 8 + doc_id % 5 END AS BIGINT) AS width,
      | CAST(CASE WHEN doc_id % 13 = 7 THEN -1 ELSE 6 + doc_id % 3 END AS BIGINT) AS height,
      | CAST(CASE WHEN doc_id % 13 = 7 THEN -1 ELSE 1 END AS BIGINT) AS within_tol
      |FROM documents WHERE doc_id < 300""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q18_asof_join", qAsof, Some(qAsofSql)),
    QueryDef("q26_asof_forward", qAsofForward, Some(qAsofForwardSql)),
    QueryDef("q27_skew_join", qSkewJoin, Some(qSkewJoinSql)),
    QueryDef("q24_interval_join", qIntervalJoin, Some(qIntervalJoinSql)),
    QueryDef("s_sessionize", sSessionize, Some(sSessionizeSql)),
    QueryDef("m_multimodal_meta", mMeta, Some(mMetaSql)),
    QueryDef("m_multimodal_dedup", mDedup, Some(mDedupSql)),
    QueryDef("t_transcode", tTranscode, Some(tTranscodeSql)),
    QueryDef("m_multimodal_feat", mFeatures, Some(mFeaturesSql)),
    QueryDef("m_multimodal_sample", mSample, Some(mSampleSql)),
    QueryDef("m_multimodal_decode", mDecode, Some(mDecodeSql)),
    QueryDef("m_multimodal_pixels", mPixels, Some(mPixelsSql)),
    QueryDef("m_multimodal_audio", mAudio, Some(mAudioSql)),
    QueryDef("m_multimodal_jpeg", mJpeg, Some(mJpegSql))
  )
}
