package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Stage the static events parquet as a one-drop streaming directory.
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("events_stream").toString
    // normalize ts to TimestampType (Tables.events handles every testdata
    // generation's physical type) — eventSchema declares a timestamp
    Tables.events(spark, TestSpark.sf)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed event-time aggregation matches its batch twin") {
    val streamed = Streams.runToMemory(spark,
      Streams.windowedCounts(Streams.eventStream(spark, streamDir),
        window_ = "1 hour", slide = "1 hour", watermark = "2 hours"),
      "win_counts", OutputMode.Append())
    val batch = Tables.events(spark, TestSpark.sf)
      .groupBy(date_trunc("hour", col("ts")).as("wstart"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // Append mode only emits windows the watermark has passed, so the final
    // hours of a finite input stay withheld: streamed ⊆ batch, and every
    // window older than maxTs - watermark must have been flushed.
    val s = streamed.select("wstart", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val b = batch.select("wstart", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(s.subsetOf(b), s"streamed windows disagree with batch: ${(s -- b).take(3)}")
    val maxTs = Tables.events(spark, TestSpark.sf).agg(max(col("ts")))
      .collect()(0).getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 3L * 3600 * 1000)
    val expectedOld = b.filter(_._1.before(cutoff))
    assert(expectedOld.subsetOf(s),
      s"watermark-passed windows missing: ${(expectedOld -- s).take(3)}")
  }

  test("streaming dedup drops replayed event_ids") {
    val dir = Files.createTempDirectory("events_dup").toString
    val ev = spark.read.parquet(s"${TestSpark.sf}/events.parquet").limit(100)
    ev.write.mode("overwrite").parquet(dir)
    ev.write.mode("append").parquet(dir) // replay the same batch
    val deduped = Streams.runToMemory(spark,
      Streams.dedupStream(Streams.eventStream(spark, dir)), "dedup_out")
    assert(deduped.count() == 100)
  }

  test("session windows group events by gap per user") {
    val sessions = Streams.runToMemory(spark,
      Streams.sessionCounts(Streams.eventStream(spark, streamDir), gap = "30 minutes"),
      "sessions_out", OutputMode.Append())
    assert(sessions.count() > 0)
    // Append mode withholds sessions the watermark hasn't closed, so the
    // emitted total is ≤ the batch count and per-user totals never exceed it.
    val total = sessions.agg(sum("n_events")).as[Long].collect()(0)
    val all = Tables.events(spark, TestSpark.sf).count()
    assert(total <= all && total > 0)
    val perUserBatch = Tables.events(spark, TestSpark.sf)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    val perUserStream = sessions.groupBy("user_id")
      .agg(sum("n_events").as("n")).as[(Long, Long)].collect()
    assert(perUserStream.forall { case (u, n) => n <= perUserBatch(u) })
  }

  test("checkpointed parquet sink writes and is resumable") {
    val out = Files.createTempDirectory("sink_out").toString
    val ckpt = Files.createTempDirectory("sink_ckpt").toString
    val q = Streams.toParquet(
      Streams.eventStream(spark, streamDir).select("event_id", "event_type"),
      out, ckpt)
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(out).count() ==
      Tables.events(spark, TestSpark.sf).count())
    // resume from checkpoint: no new input → no duplicate output
    val q2 = Streams.toParquet(
      Streams.eventStream(spark, streamDir).select("event_id", "event_type"),
      out, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(out).count() ==
      Tables.events(spark, TestSpark.sf).count())
  }

  test("foreachBatch JDBC sink lands micro-batches in Derby") {
    val db = Files.createTempDirectory("sderby") + "/evdb"
    val url = s"jdbc:derby:$db;create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val ckpt = Files.createTempDirectory("jdbc_ckpt").toString
    val q = Streams.toJdbc(
      Streams.eventStream(spark, streamDir).select("event_id", "user_id", "value"),
      ckpt, url, "events_sink", props)
    q.processAllAvailable(); q.stop()
    val back = graft.sources.Sources.readJdbc(spark, url, "events_sink", props)
    assert(back.count() == Tables.events(spark, TestSpark.sf).count())
  }

  test("stream-static contamination join matches the batch operator") {
    val docsDir = Files.createTempDirectory("docs_stream").toString
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .write.mode("overwrite").parquet(docsDir)
    val bench = Tables.documents(spark, TestSpark.sf)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
    // Append since r15: the broadcast-index gate is stateless (the old
    // join+aggregation form needed Complete/Update)
    val streamed = Streams.runToMemory(spark,
      Streams.contaminationStream(Streams.documentStream(spark, docsDir), bench),
      "contam_stream", OutputMode.Append())
      .as[(Long, Long, Long)].collect().toSet
    val batch = graft.operators.Contamination.sharedShingles(
        Tables.documents(spark, TestSpark.sf), bench, "text", "doc_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"stream/batch contamination disagree: ${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
  }

  test("chunkSliding applies unchanged to a document stream (stateless per-row op)") {
    val docsDir = Files.createTempDirectory("docs_chunk").toString
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .write.mode("overwrite").parquet(docsDir)
    // the BATCH operator runs on the streaming frame as-is — chunking is a
    // pure plan transformation, so streaming reuses it without a twin
    val streamed = Streams.runToMemory(spark,
      graft.operators.Corpus.chunkSliding(
        Streams.documentStream(spark, docsDir), "doc_id", "text", 64, 48),
      "chunk_stream", OutputMode.Append())
      .as[(Long, Long, Long, String)].collect().toSet
    val batch = graft.operators.Corpus.chunkSliding(
        Tables.documents(spark, TestSpark.sf), "doc_id", "text", 64, 48)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(streamed == batch,
      s"stream/batch chunking disagree: ${(streamed diff batch).take(2)}")
  }

  test("stream-static cross-corpus dedup matches the batch operator") {
    val docsDir = Files.createTempDirectory("docs_xdedup").toString
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .write.mode("overwrite").parquet(docsDir)
    val reference = Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id") < 250)
    val streamed = Streams.runToMemory(spark,
      Streams.crossDedupStream(Streams.documentStream(spark, docsDir), reference)
        .select(col("doc_id")),
      "xdedup_stream", OutputMode.Append())
      .as[Long].collect().toSet
    val batch = graft.operators.Dedup.crossDedup(
        Tables.documents(spark, TestSpark.sf), reference, "text")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(streamed == batch,
      s"stream/batch cross-dedup disagree: ${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
    assert(streamed.nonEmpty && !streamed.exists(_ < 250))
    // r9: the managed variant returns the persisted reference-digest
    // handle so a long-lived session can unpersist deterministically
    val (gated, handle) = Streams.crossDedupStreamManaged(
      Streams.documentStream(spark, docsDir), reference)
    Streams.runToMemory(spark, gated.select(col("doc_id")),
      "xdedup_stream_managed", OutputMode.Append())
    assert(handle.storageLevel.useMemory || handle.storageLevel.useDisk,
      "handle should be persisted after the gate ran")
    handle.unpersist(blocking = true)
    assert(handle.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE,
      "unpersisting the handle must release the cached reference digests")
  }

  test("semDedupGateStream: online SemDeDup matches brute-force survivors (r15)") {
    import graft.operators.Similarity
    import graft.functions.VectorExprs
    val e = Tables.embeddings(spark, TestSpark.sf)
    val idx = Similarity.ivfBuild(e, "embedding", "vec_id",
      nCentroids = 4, persist = false)
    // incoming = identical copies of reference vectors (must DROP: an
    // identical vector ranks the centroids identically, so it lands in
    // its twin's cell and the cos = 1 residual fires) + negated vectors
    // (novel BY CONSTRUCTION: cos(-v, u) = -cos(v, u), bounded by the
    // corpus's background cosine — must SURVIVE)
    val copies = e.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val negated = e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 200000L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    val incoming = copies.unionByName(negated)
    val dir = Files.createTempDirectory("semgate_stream").toString
    incoming.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(incoming.schema).parquet(dir)
    val survived = Streams.runToMemory(spark,
      Streams.semDedupGateStream(stream, idx, "embedding", tau = 0.8)
        .select(col("vec_id")),
      "semgate_survivors").as[Long].collect().toSet
    // brute-force survivors: no reference vector within tau, no cells
    val brute = incoming.as("i").join(e.as("r"),
        VectorExprs.cosineSim(col("i.embedding"), col("r.embedding")) >= lit(0.8),
        "left_anti")
      .select(col("vec_id")).as[Long].collect().toSet
    assert(survived == brute,
      s"gate/brute disagree: ${(survived diff brute).take(3)} / ${(brute diff survived).take(3)}")
    assert(survived == (0L until 50L).map(_ + 200000L).toSet,
      "exactly the negated novels must survive")
  }

  test("stream-stream interval join matches the batch range join") {
    // inner stream-stream joins emit matches as they arrive (the watermark
    // only bounds buffered state), so a one-drop finite input yields the
    // complete batch answer
    val streamed = Streams.runToMemory(spark,
      Streams.attributionJoin(Streams.eventStream(spark, streamDir)),
      "attr_join", OutputMode.Append())
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val batch = Streams.attributionJoin(Tables.events(spark, TestSpark.sf))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"stream/batch interval join disagree: ${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
    assert(batch.nonEmpty)
  }

  test("streaming near-dup dedup keeps one doc per simhash signature") {
    val docsDir = Files.createTempDirectory("docs_stream_nd").toString
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "ALPHA  beta\tgamma delta"), // same tokens after normalization
      (3L, "completely different content here")
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(docsDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    val kept = Streams.runToMemory(spark,
      Streams.nearDupDedupStream(stream), "neardup_stream", OutputMode.Append())
      .select("doc_id").as[Long].collect().toSet
    assert(kept.size == 2, s"expected one of {1,2} plus 3, got $kept")
    assert(kept.contains(3L))
    assert(kept.contains(1L) || kept.contains(2L))
  }

  test("streaming quality gate equals the batch filter") {
    val docsDir = Files.createTempDirectory("docs_stream_q").toString
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .write.mode("overwrite").parquet(docsDir)
    val streamed = Streams.runToMemory(spark,
      Streams.qualityGate(Streams.documentStream(spark, docsDir), minQuality = 300L)
        .select(col("doc_id"), col("quality")),
      "quality_stream", OutputMode.Append())
      .as[(Long, Long)].collect().toSet
    val batch = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
      .filter(col("quality") >= 300L)
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("trained-model streaming gate equals the batch filter (r14)") {
    // train-offline / gate-online: the closed-form model trains on the
    // static corpus, then scores each micro-batch as a stateless codegen
    // filter — survivors and scores must equal the batch application
    import graft.operators.Corpus
    import graft.functions.TextFunctions.qualityScore
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val model = Corpus.qualityModelCollect(
      Corpus.qualityModelTrain(docs, "text", qualityScore(col("text")) >= 500L),
      topK = 16)
    val docsDir = Files.createTempDirectory("docs_stream_qm").toString
    docs.write.mode("overwrite").parquet(docsDir)
    val streamed = Streams.runToMemory(spark,
      Streams.documentStream(spark, docsDir)
        .select(col("doc_id"),
          graft.functions.QualityModelFns.score(col("text"), model).as("score"))
        .filter(col("score") > 0L),
      "qm_stream", OutputMode.Append())
      .as[(Long, Long)].collect().toSet
    val batch = docs.select(col("doc_id"),
        graft.functions.QualityModelFns.score(col("text"), model).as("score"))
      .filter(col("score") > 0L)
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("toParquetUnique lands replayed and cross-batch duplicate keys once") {
    val in = Files.createTempDirectory("uniq_in").toString
    val out = Files.createTempDirectory("uniq_sink").toString + "/t"
    val ckpt = Files.createTempDirectory("uniq_ckpt").toString
    val all = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    val first = all.filter(col("event_id") < 200)
    val fresh = all.filter(col("event_id") >= 200 && col("event_id") < 350)
    val (nFirst, nFresh) = (first.count(), fresh.count())
    assert(nFirst > 0 && nFresh > 0)
    first.write.mode("overwrite").parquet(in)
    val q1 = Streams.toParquetUnique(
      Streams.eventStream(spark, in), out, ckpt, keys = Seq("event_id"))
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).count() == nFirst)
    // drop the SAME rows again plus genuinely fresh ones; only the fresh land
    first.write.mode("append").parquet(in)
    fresh.write.mode("append").parquet(in)
    val q2 = Streams.toParquetUnique(
      Streams.eventStream(spark, in), out, ckpt, keys = Seq("event_id"))
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == nFirst + nFresh,
      s"expected ${nFirst + nFresh} unique keys, got ${got.count()}")
    assert(got.select("event_id").distinct().count() == nFirst + nFresh)
  }

  test("toUpsertSink maintains exactly the latest version of every key") {
    val in = Files.createTempDirectory("ups_in").toString
    val out = Files.createTempDirectory("ups_sink").toString + "/t"
    val ckpt = Files.createTempDirectory("ups_ckpt").toString
    // batch 1: two changes for k1 in ONE batch (seq 2 must win) + k2
    Seq((1L, "a", 1L), (1L, "a2", 2L), (2L, "b", 1L)).toDF("k", "v", "seq")
      .write.mode("overwrite").parquet(in)
    def stream = spark.readStream
      .schema(spark.read.parquet(in).schema).parquet(in)
    val q1 = Streams.toUpsertSink(stream, out, ckpt, keys = Seq("k"), seqCol = "seq")
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a2", 2L), (2L, "b", 1L)))
    // batch 2 (checkpoint resumes — only new files): update k2, insert k3
    Seq((2L, "B", 2L), (3L, "c", 1L)).toDF("k", "v", "seq")
      .write.mode("append").parquet(in)
    val q2 = Streams.toUpsertSink(stream, out, ckpt, keys = Seq("k"), seqCol = "seq")
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(out).as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a2", 2L), (2L, "B", 2L), (3L, "c", 1L)))
  }

  test("toJdbcUpsertSink maintains the latest version of every key in Derby (r9)") {
    val in = Files.createTempDirectory("jups_in").toString
    val db = Files.createTempDirectory("jups_db") + "/updb"
    val url = s"jdbc:derby:$db;create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val ckpt = Files.createTempDirectory("jups_ckpt").toString
    // seed the target table (the sync target pre-exists in the reference)
    graft.sinks.Sinks.writeJdbc(
      Seq((1L, "seeded", 0L)).toDF("k", "v", "seq"), url, "sync_t", props,
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    // batch 1: two changes for k1 in ONE batch (seq 2 wins) + new k2
    Seq((1L, "a", 1L), (1L, "a2", 2L), (2L, "b", 1L)).toDF("k", "v", "seq")
      .write.mode("overwrite").parquet(in)
    def stream = spark.readStream
      .schema(spark.read.parquet(in).schema).parquet(in)
    val q1 = Streams.toJdbcUpsertSink(stream, ckpt, url, "sync_t",
      keys = Seq("k"), seqCol = "seq", props = props)
    q1.processAllAvailable(); q1.stop()
    def snap() = graft.sources.Sources.readJdbc(spark, url, "sync_t", props)
      .as[(Long, String, Long)].collect().toSet
    assert(snap() == Set((1L, "a2", 2L), (2L, "b", 1L)))
    // batch 2 via checkpoint resume: update k2, insert k3
    Seq((2L, "B", 2L), (3L, "c", 1L)).toDF("k", "v", "seq")
      .write.mode("append").parquet(in)
    val q2 = Streams.toJdbcUpsertSink(stream, ckpt, url, "sync_t",
      keys = Seq("k"), seqCol = "seq", props = props)
    q2.processAllAvailable(); q2.stop()
    assert(snap() == Set((1L, "a2", 2L), (2L, "B", 2L), (3L, "c", 1L)))
  }

  test("toJdbcCdcSink applies tombstones and later re-inserts (r10)") {
    val in = Files.createTempDirectory("jcdc_in").toString
    val db = Files.createTempDirectory("jcdc_db") + "/cdcdb"
    val url = s"jdbc:derby:$db;create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val ckpt = Files.createTempDirectory("jcdc_ckpt").toString
    graft.sinks.Sinks.writeJdbc(
      Seq((1L, "seeded", 0L, "U")).toDF("k", "v", "seq", "op"), url, "cdc_s",
      props, mode = org.apache.spark.sql.SaveMode.Overwrite)
    // batch 1: k1 updated THEN tombstoned in one batch (seq 2 wins → gone),
    // k2 inserted
    Seq((1L, "a", 1L, "U"), (1L, "", 2L, "D"), (2L, "b", 1L, "U"))
      .toDF("k", "v", "seq", "op")
      .write.mode("overwrite").parquet(in)
    def stream = spark.readStream
      .schema(spark.read.parquet(in).schema).parquet(in)
    val q1 = Streams.toJdbcCdcSink(stream, ckpt, url, "cdc_s",
      keys = Seq("k"), seqCol = "seq", opCol = "op", props = props)
    q1.processAllAvailable(); q1.stop()
    def snap() = graft.sources.Sources.readJdbc(spark, url, "cdc_s", props)
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(snap() == Set((2L, "b")), snap().toString)
    // batch 2 via checkpoint resume: the deleted key re-appears (replayed-
    // log semantics), k2 tombstoned
    Seq((1L, "back", 3L, "U"), (2L, "", 2L, "D")).toDF("k", "v", "seq", "op")
      .write.mode("append").parquet(in)
    val q2 = Streams.toJdbcCdcSink(stream, ckpt, url, "cdc_s",
      keys = Seq("k"), seqCol = "seq", opCol = "op", props = props)
    q2.processAllAvailable(); q2.stop()
    assert(snap() == Set((1L, "back")), snap().toString)
  }

  test("toJdbcCdcSink: a seq tie between delete and update resolves to the delete (r11)") {
    val in = Files.createTempDirectory("jtie_in").toString
    val db = Files.createTempDirectory("jtie_db") + "/tiedb"
    val url = s"jdbc:derby:$db;create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    graft.sinks.Sinks.writeJdbc(
      Seq((1L, "seeded", 0L, "U"), (2L, "seeded", 0L, "U"))
        .toDF("k", "v", "seq", "op"), url, "tie_s",
      props, mode = org.apache.spark.sql.SaveMode.Overwrite)
    // k1: U and D both at seq 1 — whether the key EXISTS must not depend
    // on aggregation order; the documented contract makes the delete win.
    // k2: same tie with the rows in the opposite physical order.
    Seq((1L, "u", 1L, "U"), (1L, "", 1L, "D"),
        (2L, "", 1L, "D"), (2L, "u", 1L, "U"))
      .toDF("k", "v", "seq", "op")
      .write.mode("overwrite").parquet(in)
    val ckpt = Files.createTempDirectory("jtie_ckpt").toString
    val q = Streams.toJdbcCdcSink(
      spark.readStream.schema(spark.read.parquet(in).schema).parquet(in),
      ckpt, url, "tie_s", keys = Seq("k"), seqCol = "seq", opCol = "op",
      props = props)
    q.processAllAvailable(); q.stop()
    val left = graft.sources.Sources.readJdbc(spark, url, "tie_s", props)
      .select("k").as[Long].collect().toSet
    assert(left == Set.empty[Long],
      s"delete must deterministically win a seq tie; keys left: $left")
  }

  test("toShardedExportSink: each version matches the batch export over the grown corpus (r11)") {
    val in = Files.createTempDirectory("shx_in").toString
    val staging = Files.createTempDirectory("shx_stage").toString + "/corpus"
    val export = Files.createTempDirectory("shx_out").toString + "/shards"
    val ckpt = Files.createTempDirectory("shx_ckpt").toString
    val all = Tables.documents(spark, TestSpark.sf).select("doc_id")
    val first = all.filter(col("doc_id") % 3 =!= 0)
    first.write.mode("overwrite").parquet(in)
    def stream = spark.readStream
      .schema(spark.read.parquet(in).schema).parquet(in)
    val q1 = Streams.toShardedExportSink(stream, ckpt, staging, export,
      "doc_id", seed = 11L, nShards = 4)
    q1.processAllAvailable(); q1.stop()
    // version 0 = batch export over batch-1 docs, bit-for-bit
    def exported(v: Long) = spark.read.parquet(s"$export/v=$v")
      .select("doc_id", "pos").as[(Long, Long)].collect().toSet
    def batchRef(docs: org.apache.spark.sql.DataFrame) = {
      val ref = Files.createTempDirectory("shx_ref").toString + "/t"
      graft.sinks.Sinks.writeShuffledShards(docs, ref, "doc_id", 11L, 4)
      spark.read.parquet(ref).select("doc_id", "pos")
        .as[(Long, Long)].collect().toSet
    }
    assert(exported(0) == batchRef(first), "v0 must equal the batch export")
    // grow the corpus: REPLAYED docs (idempotent staging) + novel ones
    first.limit(50).write.mode("append").parquet(in)
    all.filter(col("doc_id") % 3 === 0).write.mode("append").parquet(in)
    val q2 = Streams.toShardedExportSink(stream, ckpt, staging, export,
      "doc_id", seed = 11L, nShards = 4)
    q2.processAllAvailable(); q2.stop()
    val versions = new java.io.File(export).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName.stripPrefix("v=").toLong)
      .sorted
    val vLast = versions.last
    assert(vLast > 0, s"second trigger must write a new version, got $versions")
    // the latest version re-exports the WHOLE accumulated corpus — novel
    // docs integrated into a fresh permutation, replayed docs staged once
    assert(exported(vLast) == batchRef(all),
      "latest version must equal the batch export over the full corpus")
    assert(spark.read.parquet(staging).count() == all.count(),
      "replayed batch rows must stage exactly once")
  }

  test("toIvfAppendSink grows a durable ANN index across micro-batches (r11)") {
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "embedding")
    val idxDir = Files.createTempDirectory("ivf_sink").toString + "/idx"
    graft.operators.Similarity.ivfWrite(
      graft.operators.Similarity.ivfBuild(e, "embedding", "vec_id",
        nCentroids = 4, persist = false), idxDir)
    val nBase = e.count()
    val in = Files.createTempDirectory("ivf_in").toString
    val ckpt = Files.createTempDirectory("ivf_ckpt").toString
    val incoming = e.select((col("vec_id") + 8000000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => x * (lit(1.0d) + lit(0.002d) * (i % 3)))
        .cast("array<float>").as("embedding"))
    // two micro-batches, the second replaying half of the first (the
    // crash-recovery shape the append must absorb)
    incoming.filter(col("vec_id") % 2 === 0).write.mode("overwrite").parquet(in)
    def stream = spark.readStream
      .schema(spark.read.parquet(in).schema).parquet(in)
    val q1 = Streams.toIvfAppendSink(stream, ckpt, idxDir, "embedding", "vec_id")
    q1.processAllAvailable(); q1.stop()
    incoming.write.mode("append").parquet(in) // replays evens + adds odds
    val q2 = Streams.toIvfAppendSink(stream, ckpt, idxDir, "embedding", "vec_id")
    q2.processAllAvailable(); q2.stop()
    val grown = graft.operators.Similarity.ivfRead(spark, idxDir)
    assert(grown.indexed.count() == nBase + incoming.count(),
      "each incoming id must be indexed exactly once across batches")
    // the grown index serves: a probe finds an appended vector's parent
    val probe = incoming.filter(col("vec_id") === 8000001L)
    if (probe.count() > 0) {
      val hits = graft.operators.Similarity.ivfQuery(grown, probe,
        "embedding", "vec_id", k = 3, nProbe = 2)
        .select("corpus_id").as[Long].collect().toSet
      assert(hits.contains(1L), s"grown index must serve appended content: $hits")
    }
  }

  test("toUpsertSink restores a staged-aside table after a mid-swap crash") {
    // regression (r8 review): the swap is dir -> .old, tmp -> dir, delete
    // .old. A crash between the renames leaves .old as the ONLY copy of
    // the table; the replayed batch must restore it, not delete it and
    // republish just its own rows.
    val in = Files.createTempDirectory("upsc_in").toString
    val base = Files.createTempDirectory("upsc_sink").toString
    val out = base + "/t"
    val ckpt = Files.createTempDirectory("upsc_ckpt").toString
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "seq")
      .write.mode("overwrite").parquet(in)
    def stream = spark.readStream
      .schema(spark.read.parquet(in).schema).parquet(in)
    val q1 = Streams.toUpsertSink(stream, out, ckpt, keys = Seq("k"), seqCol = "seq")
    q1.processAllAvailable(); q1.stop()
    // simulate the crash window: table staged aside, publish never happened
    assert(new java.io.File(out).renameTo(new java.io.File(out + ".old")))
    Seq((3L, "c", 1L)).toDF("k", "v", "seq").write.mode("append").parquet(in)
    val q2 = Streams.toUpsertSink(stream, out, ckpt, keys = Seq("k"), seqCol = "seq")
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(out).as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))) // history survived
    assert(!new java.io.File(out + ".old").exists())
  }

  test("crossNearDedupStream: conservative vs batch; novel docs pass the gate") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val mutated = docs.filter(col("doc_id") < 30)
      .select((col("doc_id") + 900000L).as("doc_id"),
        regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
    val novel = docs.filter(col("doc_id") >= 40 && col("doc_id") < 70)
      .select((col("doc_id") + 1800000L).as("doc_id"),
        array_join(reverse(graft.functions.TextFunctions.tokens(col("text"))), " ")
          .as("text"))
    val incoming = mutated.unionByName(novel)
    val reference = docs.select("doc_id", "text")
    val batchKept = graft.operators.Dedup
      .crossNearDedup(incoming, reference, "text", "doc_id", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val incomingDir = Files.createTempDirectory("cross_near_stream").toString
    incoming.write.mode("overwrite").parquet(incomingDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(incomingDir)
    val streamKept = Streams.runToMemory(spark,
      Streams.crossNearDedupStream(stream, reference), "cross_near_out",
      OutputMode.Append())
      .select("doc_id").as[Long].collect().toSet
    // no false negatives: everything the batch gate drops, the stream drops
    assert(streamKept.subsetOf(batchKept),
      s"stream kept ${streamKept -- batchKept} that batch dropped")
    // and the gate is not trivially closed: the novel docs pass
    assert(streamKept == novel.select("doc_id").as[Long].collect().toSet)
  }

  test("streaming Misra-Gries sketch keeps the guarantee across micro-batches") {
    val docsDir = Files.createTempDirectory("docs_stream_hh").toString
    // two files -> two micro-batches exercising the state-store merge path
    val mk = (range: Range, salt: String) => range.map { i =>
      (i.toLong, (Seq.fill(6)(s"hot${i % 3}") ++ Seq(s"rare$salt$i")).mkString(" "))
    }.toDF("doc_id", "text")
    mk(1 to 40, "a").write.mode("overwrite").parquet(docsDir)
    mk(41 to 80, "b").write.mode("append").parquet(docsDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.option("maxFilesPerTrigger", "1")
      .schema(schema).parquet(docsDir)
    val sk = Streams.runToMemory(spark,
      Streams.heavyHittersStream(stream, capacity = 10),
      "hh_stream", OutputMode.Complete())
      .select(explode(col("sketch")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toMap
    assert(sk.size <= 10)
    // hot0..hot2 are ~30% of the stream each -- far above N/(cap+1)
    (0 to 2).foreach(i => assert(sk.contains(s"hot$i"), s"hot$i missing from $sk"))
    // estimates never exceed truth (~27 docs x 6 occurrences per hot token)
    (0 to 2).foreach { i =>
      assert(sk(s"hot$i") <= 6L * 27, s"overestimate for hot$i: ${sk(s"hot$i")}")
    }
  }

  test("drift sinks score each micro-batch against the persisted baseline (r13)") {
    import graft.operators.Profiling
    val base = Files.createTempDirectory("drift_base").toString
    val in = Files.createTempDirectory("drift_in").toString
    val rep = Files.createTempDirectory("drift_rep").toString + "/r"
    val ckpt = Files.createTempDirectory("drift_ckpt").toString
    val o = Tables.orders(spark, TestSpark.sf).select(col("o_totalprice"))
    Profiling.writeDriftBaseline(o, "o_totalprice",
      lo = 0.0, hi = 500000.0, nBuckets = 10, dir = s"$base/n")
    // batch 0: the baseline snapshot itself — every psi_term exactly zero
    o.write.mode("overwrite").parquet(in)
    def stream = spark.readStream
      .schema(spark.read.parquet(in).schema).parquet(in)
    val q1 = Streams.toDriftSink(stream, "o_totalprice", s"$base/n", rep, ckpt)
    q1.processAllAvailable(); q1.stop()
    // batch 1 (same checkpoint → only the appended files): a +150000 shift
    o.select((col("o_totalprice") + 150000.0).as("o_totalprice"))
      .write.mode("append").parquet(in)
    val q2 = Streams.toDriftSink(stream, "o_totalprice", s"$base/n", rep, ckpt)
    q2.processAllAvailable(); q2.stop()
    val report = spark.read.parquet(rep)
    val psi = report.groupBy(col("batch_id").cast("long"))
      .agg(sum(col("psi_term")).as("psi"))
      .as[(Long, java.math.BigDecimal)].collect().toMap
    assert(psi.keySet == Set(0L, 1L), psi.toString)
    assert(psi(0L).signum == 0, s"identical batch must read PSI 0: $psi")
    assert(psi(1L).doubleValue > 0.25, s"shifted batch must alarm: $psi")
    // replay-idempotent layout: one OVERWRITTEN partition dir per batch —
    // a redelivered batch rewrites its own rows, never appends duplicates
    val parts = new java.io.File(rep).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    assert(parts == Set("batch_id=0", "batch_id=1"), parts.toString)
    // per-batch parity with the batch operator against the same baseline
    val batchRef = Profiling.distributionDriftFromBaseline(
        spark.read.parquet(s"$base/n"), o, "o_totalprice")
      .collect().map(_.toString).sorted.toSeq
    val streamedB0 = report.filter(col("batch_id") === 0L).drop("batch_id")
      .collect().map(_.toString).sorted.toSeq
    assert(streamedB0 == batchRef)
    // categorical twin: baseline vocabulary read from disk, never recomputed
    val cat = Tables.orders(spark, TestSpark.sf).select(col("o_orderpriority"))
    Profiling.writeCategoricalBaseline(cat, "o_orderpriority", topK = 3,
      dir = s"$base/c")
    val cin = Files.createTempDirectory("drift_cin").toString
    val crep = Files.createTempDirectory("drift_crep").toString + "/r"
    val cckpt = Files.createTempDirectory("drift_cckpt").toString
    cat.write.mode("overwrite").parquet(cin)
    val q3 = Streams.toCatDriftSink(
      spark.readStream.schema(spark.read.parquet(cin).schema).parquet(cin),
      "o_orderpriority", s"$base/c", crep, cckpt)
    q3.processAllAvailable(); q3.stop()
    val catRef = Profiling.categoricalDriftFromBaseline(
        spark.read.parquet(s"$base/c"), cat, "o_orderpriority")
      .collect().map(_.toString).sorted.toSeq
    val catStreamed = spark.read.parquet(crep)
      .filter(col("batch_id") === 0L).drop("batch_id")
      .collect().map(_.toString).sorted.toSeq
    assert(catStreamed == catRef)
  }

  test("rolling drift sink scores each batch against the previous window (r13)") {
    import graft.operators.Profiling
    val in = Files.createTempDirectory("rdrift_in").toString
    val state = Files.createTempDirectory("rdrift_state").toString + "/ledger"
    val rep = Files.createTempDirectory("rdrift_rep").toString + "/r"
    val ckpt = Files.createTempDirectory("rdrift_ckpt").toString
    val o = Tables.orders(spark, TestSpark.sf).select(col("o_totalprice"))
    def sink() = Streams.toRollingDriftSink(
      spark.readStream.schema(spark.read.parquet(in).schema).parquet(in),
      "o_totalprice", lo = 0.0, hi = 500000.0, nBuckets = 10,
      windowBatches = 2, stateDir = state, reportDir = rep,
      checkpointDir = ckpt)
    // batch 0: seeds the ledger, no history -> no report
    o.write.mode("overwrite").parquet(in)
    val q0 = sink(); q0.processAllAvailable(); q0.stop()
    assert(!new java.io.File(rep).exists(),
      "the seed batch has no window to score against")
    // batch 1: identical data -> scored vs batch 0, PSI exactly 0
    o.write.mode("append").parquet(in)
    val q1 = sink(); q1.processAllAvailable(); q1.stop()
    // batch 2: shifted -> scored vs batches {0, 1}, alarms
    o.select((col("o_totalprice") + 150000.0).as("o_totalprice"))
      .write.mode("append").parquet(in)
    val q2 = sink(); q2.processAllAvailable(); q2.stop()
    val report = spark.read.parquet(rep)
    val psi = report.groupBy(col("batch_id"))
      .agg(sum(col("psi_term")).as("psi"))
      .as[(Long, java.math.BigDecimal)].collect().toMap
    assert(psi.keySet == Set(1L, 2L), psi.toString)
    assert(psi(1L).signum == 0, s"identical batch must read PSI 0: $psi")
    assert(psi(2L).doubleValue > 0.25, s"shifted batch must alarm: $psi")
    // per-batch parity: batch 2's row set equals the batch operator over
    // (window union, batch) — count_a is the two-batch rolling total
    val ref = Profiling.distributionDrift(
        o.unionByName(o), // batches 0 and 1 were each the full snapshot
        spark.read.parquet(in).limit(0) // placeholder, replaced below
          .unionByName(o.select((col("o_totalprice") + 150000.0)
            .as("o_totalprice"))),
        "o_totalprice", 0.0, 500000.0, 10)
      .collect().map(_.toString).sorted.toSeq
    val got = report.filter(col("batch_id") === 2L).drop("batch_id")
      .collect().map(_.toString).sorted.toSeq
    assert(got == ref)
    // the ledger holds only the last `windowBatches` batches
    val ledger = spark.read.parquet(state)
    assert(ledger.select("batch_id").distinct().as[Long].collect().toSet
      == Set(1L, 2L))
    // categorical twin over a persisted vocabulary: identical second
    // batch → PSI 0; folds stay keyed by the FIXED vocabulary per batch
    val cat = Tables.orders(spark, TestSpark.sf).select(col("o_orderpriority"))
    val base = Files.createTempDirectory("rcdrift").toString
    Profiling.writeCategoricalVocabulary(cat, "o_orderpriority", topK = 3,
      dir = s"$base/v")
    val cin = Files.createTempDirectory("rcdrift_in").toString
    cat.write.mode("overwrite").parquet(cin)
    def csink() = Streams.toRollingCatDriftSink(
      spark.readStream.schema(spark.read.parquet(cin).schema).parquet(cin),
      "o_orderpriority", s"$base/v", windowBatches = 2,
      stateDir = s"$base/ledger", reportDir = s"$base/r",
      checkpointDir = s"$base/ckpt")
    val cq0 = csink(); cq0.processAllAvailable(); cq0.stop()
    cat.write.mode("append").parquet(cin)
    val cq1 = csink(); cq1.processAllAvailable(); cq1.stop()
    val cpsi = spark.read.parquet(s"$base/r")
      .agg(sum(col("psi_term"))).as[java.math.BigDecimal].collect().head
    assert(cpsi.signum == 0, s"identical categorical batch must read 0: $cpsi")
    val crows = spark.read.parquet(s"$base/r")
      .select("category", "is_fold").distinct()
      .as[(String, Boolean)].collect().toSet
    // 5 priorities, top-3 vocabulary: 3 vocab rows + the fold bucket
    assert(crows.count(!_._2) == 3 && crows.count(_._2) == 1, crows.toString)
  }

  test("multi-column rolling drift matches the single-column sinks per column (r14)") {
    import graft.operators.Profiling
    val base = Files.createTempDirectory("mdrift").toString
    val o = Tables.orders(spark, TestSpark.sf)
      .select(col("o_totalprice"), col("o_orderpriority"))
    // batch 1 shifts the numeric column and leaves the categorical alone:
    // the two columns must score INDEPENDENTLY (own slice, own totals)
    val mut = o.select((col("o_totalprice") + 150000.0).as("o_totalprice"),
      col("o_orderpriority"))
    Profiling.writeCategoricalVocabulary(o.select(col("o_orderpriority")),
      "o_orderpriority", topK = 3, dir = s"$base/v")
    // the multi sink: ONE query, ONE ledger, both columns
    val min_ = s"$base/min"
    o.write.mode("overwrite").parquet(min_)
    def msink() = Streams.toRollingMultiDriftSink(
      spark.readStream.schema(spark.read.parquet(min_).schema).parquet(min_),
      numeric = Seq(Streams.NumericDriftCol("o_totalprice", 0.0, 500000.0, 10)),
      categorical = Seq(Streams.CatDriftCol("o_orderpriority", s"$base/v")),
      windowBatches = 2, stateDir = s"$base/mledger",
      reportDir = s"$base/mr", checkpointDir = s"$base/mckpt")
    val mq0 = msink(); mq0.processAllAvailable(); mq0.stop()
    assert(!new java.io.File(s"$base/mr").exists(),
      "the seed batch has no window to score against")
    mut.write.mode("append").parquet(min_)
    val mq1 = msink(); mq1.processAllAvailable(); mq1.stop()
    // single-column references over the SAME batch sequence
    val nin = s"$base/nin"
    o.select(col("o_totalprice")).write.mode("overwrite").parquet(nin)
    def nsink() = Streams.toRollingDriftSink(
      spark.readStream.schema(spark.read.parquet(nin).schema).parquet(nin),
      "o_totalprice", lo = 0.0, hi = 500000.0, nBuckets = 10,
      windowBatches = 2, stateDir = s"$base/nledger",
      reportDir = s"$base/nr", checkpointDir = s"$base/nckpt")
    val nq0 = nsink(); nq0.processAllAvailable(); nq0.stop()
    mut.select(col("o_totalprice")).write.mode("append").parquet(nin)
    val nq1 = nsink(); nq1.processAllAvailable(); nq1.stop()
    val cin = s"$base/cin"
    o.select(col("o_orderpriority")).write.mode("overwrite").parquet(cin)
    def csink() = Streams.toRollingCatDriftSink(
      spark.readStream.schema(spark.read.parquet(cin).schema).parquet(cin),
      "o_orderpriority", s"$base/v", windowBatches = 2,
      stateDir = s"$base/cledger", reportDir = s"$base/cr",
      checkpointDir = s"$base/cckpt")
    val cq0 = csink(); cq0.processAllAvailable(); cq0.stop()
    mut.select(col("o_orderpriority")).write.mode("append").parquet(cin)
    val cq1 = csink(); cq1.processAllAvailable(); cq1.stop()
    // per-column parity: the multi report restricted to a column is
    // row-identical to that column's single sink (numeric bucket travels
    // in the string `key`)
    val mr = spark.read.parquet(s"$base/mr").filter(col("batch_id") === 1L)
    val numGot = mr.filter(col("column") === "o_totalprice")
      .select(col("key").cast("long").as("bucket"),
        col("count_a"), col("count_b"), col("psi_term"))
      .collect().map(_.toString).sorted.toSeq
    val numRef = spark.read.parquet(s"$base/nr")
      .filter(col("batch_id") === 1L).drop("batch_id")
      .collect().map(_.toString).sorted.toSeq
    assert(numGot == numRef)
    val catGot = mr.filter(col("column") === "o_orderpriority")
      .select(col("key").as("category"), col("is_fold"),
        col("count_a"), col("count_b"), col("psi_term"))
      .collect().map(_.toString).sorted.toSeq
    val catRef = spark.read.parquet(s"$base/cr")
      .filter(col("batch_id") === 1L).drop("batch_id")
      .collect().map(_.toString).sorted.toSeq
    assert(catGot == catRef)
    // the independence check the combined report must preserve: numeric
    // alarms, identical categorical reads exactly 0
    val perCol = mr.groupBy(col("column"))
      .agg(sum(col("psi_term")).cast("double").as("psi"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(perCol("o_totalprice") > 0.25, perCol.toString)
    assert(perCol("o_orderpriority") == 0.0, perCol.toString)
    // ONE ledger holds both columns' window counts
    val ledger = spark.read.parquet(s"$base/mledger")
    assert(ledger.select("column").distinct()
      .collect().map(_.getString(0)).toSet
      == Set("o_totalprice", "o_orderpriority"))
  }

  test("rolling ledger sink is not wedged by post-publish .old residue (r13 ADVICE)") {
    // crash window: a batch published its ledger and died before deleting
    // .old. The next batch's stage-aside rename hits the existing .old —
    // before the Publish helper, every subsequent batch threw
    // 'cannot stage ledger aside' until manual cleanup.
    val in = Files.createTempDirectory("rwedge_in").toString
    val state = Files.createTempDirectory("rwedge_state").toString + "/ledger"
    val rep = Files.createTempDirectory("rwedge_rep").toString + "/r"
    val ckpt = Files.createTempDirectory("rwedge_ckpt").toString
    val o = Tables.orders(spark, TestSpark.sf).select(col("o_totalprice"))
    def sink() = Streams.toRollingDriftSink(
      spark.readStream.schema(spark.read.parquet(in).schema).parquet(in),
      "o_totalprice", lo = 0.0, hi = 500000.0, nBuckets = 10,
      windowBatches = 2, stateDir = state, reportDir = rep,
      checkpointDir = ckpt)
    o.write.mode("overwrite").parquet(in)
    val q0 = sink(); q0.processAllAvailable(); q0.stop()
    // plant the residue: .old ALONGSIDE the live ledger (post-publish crash)
    val residue = new java.io.File(state + ".old")
    assert(residue.mkdirs())
    java.nio.file.Files.write(new java.io.File(residue, "junk").toPath,
      "residue".getBytes("UTF-8"))
    o.write.mode("append").parquet(in)
    val q1 = sink(); q1.processAllAvailable(); q1.stop() // must not wedge
    assert(!residue.exists(), "residue must be cleared by the publish")
    val psi = spark.read.parquet(rep)
      .agg(sum(col("psi_term"))).as[java.math.BigDecimal].collect().head
    assert(psi.signum == 0, s"identical batch must still score PSI 0: $psi")
    assert(spark.read.parquet(state).select("batch_id").distinct()
      .as[Long].collect().toSet == Set(0L, 1L))
  }

  test("mapGroupsWithState keeps running per-user totals") {
    implicit val s = spark
    val out = Streams.runToMemory(spark,
      Streams.runningUserTotals(Streams.eventStream(spark, streamDir)).toDF(),
      "running_out", OutputMode.Update())
    val users = Tables.events(spark, TestSpark.sf)
      .select(countDistinct("user_id")).as[Long].collect()(0)
    assert(out.select("user_id").distinct().count() == users)
  }

  test("toAnnServeSink: streamed top-k over two drains equals the batch probe") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, TestSpark.sf).select("vec_id", "embedding")
    val idx = Similarity.ivfBuild(e, "embedding", "vec_id", nCentroids = 8,
      trainTarget = 4000)
    val queries = e.filter(col("vec_id") < 20)
    val inDir = Files.createTempDirectory("servein").toString
    val outDir = Files.createTempDirectory("serveout").toString + "/r"
    val ckpt = Files.createTempDirectory("serveckpt").toString
    queries.filter(col("vec_id") < 10).write.mode("append").parquet(inDir)
    val q = Streams.toAnnServeSink(
      spark.readStream.schema(queries.schema).parquet(inDir),
      idx, "embedding", "vec_id", k = 5, nProbe = 3, outDir, ckpt)
    q.processAllAvailable()
    queries.filter(col("vec_id") >= 10).write.mode("append").parquet(inDir)
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(outDir)
      .select("query_id", "corpus_id", "rk")
      .as[(Long, Long, Long)].collect().toSet
    val want = Similarity.ivfQuery(idx, queries, "embedding", "vec_id",
        k = 5, nProbe = 3)
      .select("query_id", "corpus_id", "rk")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want) // serving is stateless per query
    // replay-idempotent layout: results live under batch_id partitions
    val batches = spark.read.parquet(outDir).select("batch_id")
      .distinct().count()
    assert(batches >= 2)
  }

  test("toHybridServeSink: two drains equal the batch fusion; batch_id partitions") {
    import graft.operators.{Retrieval, Similarity}
    val e = Tables.embeddings(spark, TestSpark.sf).select("vec_id", "embedding")
    val idx = Similarity.ivfBuild(e, "embedding", "vec_id", nCentroids = 8,
      trainTarget = 4000)
    // a static lexical artifact over the documents corpus (offline half)
    val lex = Retrieval.bm25TopK(Tables.documents(spark, TestSpark.sf),
        "doc_id", "text", k = 30)
      .select(col("doc_id"), col("rk")).localCheckpoint()
    val queries = e.filter(col("vec_id") < 20)
    val inDir = Files.createTempDirectory("hsrvin").toString
    val outDir = Files.createTempDirectory("hsrvout").toString + "/r"
    val ckpt = Files.createTempDirectory("hsrvckpt").toString
    queries.filter(col("vec_id") < 10).write.mode("append").parquet(inDir)
    val q = Streams.toHybridServeSink(
      spark.readStream.schema(queries.schema).parquet(inDir),
      idx, "embedding", "vec_id", lex, listKDense = 5, nProbe = 3,
      kRrf = 60.0, k = 10, outDir, ckpt)
    q.processAllAvailable()
    queries.filter(col("vec_id") >= 10).write.mode("append").parquet(inDir)
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(outDir)
      .select("query_id", "doc_id", "r_a", "r_b", "rk")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // serving is stateless per query: the two-drain union must equal the
    // one-shot batch composition over ALL queries
    val dense = Similarity.ivfQuery(idx, queries, "embedding", "vec_id",
        k = 5, nProbe = 3)
      .select(col("query_id"), col("corpus_id").as("doc_id"), col("rk"))
    val want = Retrieval.rrfFusePerQuery(lex, dense, 60.0, 10)
      .select("query_id", "doc_id", "r_a", "r_b", "rk")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty && got.exists(_._3 > 0) && got.exists(_._4 > 0))
    // replay-idempotent layout: results live under batch_id partitions
    assert(spark.read.parquet(outDir).select("batch_id").distinct().count() >= 2)
    lex.unpersist()
  }

  test("packStream carries the open window across micro-batches (packChunks parity)") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val mid = docs.agg(max("doc_id")).as[Long].collect()(0) / 2
    val inDir = Files.createTempDirectory("packin").toString
    val outDir = Files.createTempDirectory("packout").toString + "/r"
    val ckpt = Files.createTempDirectory("packckpt").toString
    // drop 1: the low half of every source — the open window at its end
    // must continue, not reset, when drop 2 arrives
    docs.filter(col("doc_id") < mid).write.mode("append").parquet(inDir)
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val stream = spark.readStream.schema(docs.schema).parquet(inDir)
    val q = Streams.packStream(stream, budget = 512L).toDF()
      .writeStream.format("parquet").outputMode("append")
      .option("path", outDir).option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    docs.filter(col("doc_id") >= mid).write.mode("append").parquet(inDir)
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(outDir)
      .select("source", "seq_id", "doc_id", "doc_off", "seq_off", "take_n")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val want = graft.operators.Corpus
      .packChunks(docs, "source", "doc_id", "n_tokens", 512L)
      .select("source", "seq_id", "doc_id", "doc_off", "seq_off", "take_n")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    // the carry was real: some sequence at the batch boundary resumed
    // mid-window (a drop-2 doc landing at a nonzero seq_off it could only
    // inherit from drop 1's open window)
    val firstDrop2 = got.filter(r => r._3 >= mid).groupBy(_._1)
      .map { case (_, rs) => rs.minBy(r => (r._2, r._5)) }
    assert(firstDrop2.exists(_._5 != 0L))
  }
}
