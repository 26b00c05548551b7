package graft

import graft.operators.{Profiling, SkewJoin, Validators}
import graft.sinks.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-design assertions (SURVEY.md §5): these tests pin the PLAN shapes
  * that matter at 100 TB, so a regression that silently reintroduces a
  * shuffle or drops a pushdown fails CI, not a cluster run.
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("bloom prefilter prunes map-side, keeps the join exact") {
    import graft.operators.BloomJoin
    val probe = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber")
    val build = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 480000.0).select("o_orderkey")
    val plain = probe.join(build, col("l_orderkey") === col("o_orderkey"))
    val bloomed = BloomJoin.innerPrefiltered(
      probe, "l_orderkey", build, "o_orderkey", expectedKeys = 20000L)
    // exact: the join removes bloom false positives
    assert(bloomed.count() == plain.count())
    // the prefilter really prunes: far fewer probe rows survive than exist
    val pruned = BloomJoin.prefilter(
      probe, "l_orderkey", build, "o_orderkey", expectedKeys = 20000L).count()
    val total = probe.count()
    assert(pruned < total / 2, s"bloom kept $pruned of $total probe rows")
    // and it prunes BELOW the exchange: the probe side's shuffle input must
    // carry the bloom predicate (string-pinned — collect() cannot traverse
    // an unfinalized AdaptiveSparkPlanExec)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = BloomJoin.innerPrefiltered(probe, "l_orderkey", build,
        "o_orderkey", expectedKeys = 20000L).queryExecution.executedPlan.toString
      val underExchange =
        "Exchange hashpartitioning\\(l_orderkey[\\s\\S]*?bloom_might_contain".r
          .findFirstIn(plan).isDefined
      assert(underExchange, s"bloom filter not below the probe exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // r11: the bits allocate from the parameter — an oversized request is
    // a driver-killing allocation and must reject upfront
    val oversized = intercept[IllegalArgumentException] {
      BloomJoin.prefilter(probe, "l_orderkey", build, "o_orderkey",
        expectedKeys = 1000000000000L, fpp = 0.000001)
    }
    assert(oversized.getMessage.contains("maxBloomBytes"))
  }

  test("overwritePartitions replaces only the partitions present in the batch") {
    val dir = java.nio.file.Files.createTempDirectory("dynpart").toString + "/t"
    val day1 = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0))
      .toDF("id", "day", "v")
    Sinks.overwritePartitions(day1, dir, Seq("day"))
    // reprocess day 2 only, with corrected values + an extra row
    val day2fix = Seq((2L, "2024-01-02", 21.0), (3L, "2024-01-02", 22.0))
      .toDF("id", "day", "v")
    Sinks.overwritePartitions(day2fix, dir, Seq("day"))
    val got = spark.read.parquet(dir).select("id", "day", "v")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    // day 1 untouched; day 2 fully replaced by the new batch
    assert(got == Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 21.0),
      (3L, "2024-01-02", 22.0)), s"got $got")
    // conf restored
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .forall(_ != "dynamic"))
  }

  test("hive-partitioned layout: key filters prune to matching partitions only") {
    val dir = java.nio.file.Files.createTempDirectory("hivepart").toString + "/t"
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    val df = days.zipWithIndex.flatMap { case (d, i) =>
      (1 to 10).map(j => (i * 10L + j, d, j.toDouble))
    }.toDF("id", "day", "v")
    Sinks.overwritePartitions(df, dir, Seq("day"))
    val q = spark.read.parquet(dir).filter(col("day") === "2024-01-02")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    // the day predicate must be a PARTITION filter (pruned at planning,
    // zero data read from the other days), not a post-scan data filter
    assert(scan.partitionFilters.exists(_.toString.contains("day")),
      s"day filter did not reach partition pruning: ${scan.partitionFilters}")
    val survivingFiles = scan.relation.location
      .listFiles(scan.partitionFilters, Nil).flatMap(_.files)
    assert(survivingFiles.nonEmpty &&
      survivingFiles.forall(_.getPath.toString.contains("day=2024-01-02")),
      s"pruning left files from other partitions: $survivingFiles")
    assert(q.count() == 10)
  }

  test("salted skew join returns exactly the plain join result") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    val salted = SkewJoin.salted(li, o, "l_orderkey", "o_orderkey", saltFactor = 4).count()
    assert(salted == plain)
  }

  test("bucketed tables join without an exchange") {
    // default warehouse dir (./spark-warehouse, gitignored) — the
    // warehouse location is a static conf and can't move at runtime
    Sinks.writeBucketed(Tables.orders(spark, sf), "orders_b", 4, Seq("o_orderkey"))
    Sinks.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "lineitem_b", 4, Seq("l_orderkey"))
    // tiny test tables would otherwise broadcast (which disables bucketed
    // scans); at real scale both sides exceed the threshold and the
    // bucketed sort-merge path below is what the planner picks
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("dataset checksum is order- and partitioning-independent") {
    val df = Tables.orders(spark, sf)
    val a = Profiling.datasetChecksum(df, Seq("o_orderkey", "o_totalprice")).collect()(0)
    val b = Profiling.datasetChecksum(df.repartition(13).sortWithinPartitions("o_totalprice"),
      Seq("o_orderkey", "o_totalprice")).collect()(0)
    assert(a == b)
    // and sensitive to any changed value
    val c = Profiling.datasetChecksum(
      df.withColumn("o_totalprice", col("o_totalprice") + 0.01),
      Seq("o_orderkey", "o_totalprice")).collect()(0)
    assert(a != c)
  }

  test("column digests match reference algorithms") {
    val d = Seq("hello").toDF("s")
      .select(Profiling.columnDigest(col("s"), "md5").as("m"),
        Profiling.columnDigest(col("s"), "sha256").as("h"))
      .collect()(0)
    assert(d.getString(0) == "5d41402abc4b2a76b9719d911017c592")
    assert(d.getString(1) ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
  }

  test("broadcast joins appear where dims are small (q3, q5)") {
    Seq("q3_join_agg", "q5_multi_join").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q should broadcast a dim:\n$plan")
    }
  }

  test("filter pushdown reaches the scan in conditional aggregation (q6)") {
    val plan = SparkEntry.queries("q6_cond_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("l_discount"), plan)
  }

  test("per-row curation ops are shuffle-free: no exchange in their plans") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    Seq("d_doc_chunk", "d_markup_strip", "d_sentence_split",
        "d_bpe_encode").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"$q should be pure per-row work:\n$plan")
    }
  }

  test("d_heavy_hitters: recount scan is candidate-filtered (INSET), not full-vocabulary") {
    // string-pinned — collect() cannot traverse an unfinalized
    // AdaptiveSparkPlanExec. The candidate-set membership filter sits on
    // the exploded tokens directly above the scan (Catalyst cannot hoist a
    // Filter over the Aggregate), so its presence means only candidate
    // tokens are counted and shuffled — without it the recount would be a
    // full-vocabulary groupBy again.
    val plan = SparkEntry.queries("d_heavy_hitters")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.toUpperCase.contains("INSET"),
      s"candidate INSET filter missing from recount plan:\n$plan")
  }

  test("DenseId numbers rows like a global window without one") {
    val df = Tables.customer(spark, sf).select(col("c_custkey"))
    val dense = graft.operators.DenseId.withDenseId(df, "c_custkey", "id", startAt = 10L)
    // exact parity with the single-task formulation
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("c_custkey"))
    val windowed = df.withColumn("id", row_number().over(w).cast("long") + 9L)
    assert(dense.except(windowed).isEmpty && windowed.except(dense).isEmpty)
  }

  test("DenseId shuffles the data once into one pinned partitioning") {
    val df = Tables.customer(spark, sf).select(col("c_custkey"))
    val dense = graft.operators.DenseId.withDenseId(df, "c_custkey", "id")
    dense.collect()
    val plan = dense.queryExecution.executedPlan.toString
    // the ranged table materializes ONCE (lazy localCheckpoint): both the
    // counting and numbering branches read the same blocks, so the range
    // BOUNDARIES are pinned by construction — two independently-sampled
    // range exchanges could disagree and duplicate/skip ids (r8 review)
    assert(!plan.contains("Exchange rangepartitioning"),
      s"data must not re-shuffle after the pinned partitioning:\n$plan")
    assert(plan.contains("*("), s"DenseId plan lost whole-stage codegen:\n$plan")
    // offsets reach the data by broadcast, never a data-sized exchange
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the data-touching sort + the prefix-sum window's bounded sort
    assert("Sort \\[c_custkey".r.findAllIn(plan).size >= 1 &&
      "Sort \\[__graft_pid".r.findAllIn(plan).size >= 1, plan)
  }

  test("EVERY registry query: windows only over keys or partition-count-bounded input") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    SparkEntry.registry.foreach { d =>
      val optimized = d.run(spark, sf).queryExecution.optimizedPlan
      optimized.collect { case w: LWindow => w }.foreach { w =>
        // an empty partition spec funnels its whole input through one task —
        // only acceptable when that input is already aggregated down to at
        // most numShufflePartitions rows (DenseId's per-partition counts)
        assert(w.partitionSpec.nonEmpty ||
          w.child.collectFirst { case a: Aggregate => a }.isDefined,
          s"${d.name} has a global window over unbounded input:\n$optimized")
      }
    }
  }

  test("dedup-family exchanges carry hashes, never text or token arrays") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, StringType}
    Seq("d_dedup_minhash", "d_dedup_simhash", "d_dedup_ngram",
        "d_contamination", "d_repetition", "d_fingerprint",
        "d_cross_dedup", "d_bigram_fluency", "d_cross_neardedup").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
      plan.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
        e.child.output.foreach { attr =>
          assert(!attr.dataType.isInstanceOf[ArrayType] ||
            attr.dataType.asInstanceOf[ArrayType].elementType != StringType,
            s"$q shuffles a string array (${attr.name}) — hash before the exchange")
          // block keys (lang/source) are legitimate scalar strings; the
          // document payload columns must never cross an exchange
          assert(!Seq("text", "toks", "norm", "grams_s").contains(attr.name.toLowerCase),
            s"$q shuffles raw text column '${attr.name}':\n$plan")
        }
      }
    }
  }

  test("DSIR: the corpus never shuffles to score; train exchanges carry tokens only (r14)") {
    import graft.operators.Corpus
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, StringType}
    def deep(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        deep(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        deep(s.plan)
      case other => other.children.flatMap(deep)
    })
    val docs = Tables.documents(spark, sf)
    val target = docs.filter(col("lang") === "en")
    // train side: the only string crossing an exchange is the single
    // token/feature key of the partial-combined count aggregate — never
    // the document text or the token ARRAY
    val w = Corpus.dsirWeights(docs, target, "text")
    w.collect() // finalize AQE so the executed tree is real
    deep(w.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }.foreach { e =>
        e.child.output.foreach { attr =>
          assert(!attr.dataType.isInstanceOf[ArrayType] ||
            attr.dataType.asInstanceOf[ArrayType].elementType != StringType,
            s"dsir train shuffles a string array (${attr.name})")
          assert(attr.name.toLowerCase != "text",
            s"dsir train shuffles raw text")
        }
      }
    // scoring side: ZERO shuffle exchanges — the pruned model rides the
    // codegen expression and the top-k is TakeOrdered's per-partition
    // heap merge, so selection costs one scan at any corpus size
    val model = Corpus.qualityModelCollect(w, topK = 64)
    val sel = Corpus.dsirResample(docs, "text", "doc_id", model, k = 100)
    sel.collect()
    val shuffles = deep(sel.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"dsirResample shuffles:\n${sel.queryExecution.executedPlan}")
  }

  test("drift pair: no raw value column ever crosses an exchange (r13)") {
    // the scale contract of p_drift / p_drift_cat: every exchange carries
    // bucket/category keys + partially-combined counts (≤ nBuckets /
    // topK+1 groups per task), never the scanned rows — so the report
    // costs the same at any snapshot size
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def deep(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        deep(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        deep(s.plan)
      case other => other.children.flatMap(deep)
    })
    def pinNoRawShuffle(name: String, df: org.apache.spark.sql.DataFrame,
                        raw: String): Unit = {
      df.collect() // finalize AQE so the executed tree is real
      val plan = df.queryExecution.executedPlan
      val exchanges = deep(plan).collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty, s"$name: expected aggregate exchanges")
      exchanges.foreach { e =>
        e.child.output.foreach { attr =>
          assert(!attr.name.equalsIgnoreCase(raw) &&
            !attr.name.equalsIgnoreCase("__v"),
            s"$name shuffles the raw value column '${attr.name}' — " +
              s"the aggregate must partial-combine map-side:\n$plan")
        }
      }
    }
    pinNoRawShuffle("p_drift",
      SparkEntry.queries("p_drift")(spark, sf), "o_totalprice")
    pinNoRawShuffle("p_drift_cat",
      SparkEntry.queries("p_drift_cat")(spark, sf), "o_orderpriority")
    // the persisted-baseline path is what the drift SINKS execute per
    // micro-batch; the registered s_drift query only reads back the tiny
    // report (no exchanges), so pin the OPERATOR's plan directly
    val tmp = java.nio.file.Files.createTempDirectory("graft_driftpin").toString
    graft.TempFiles.cleanupAtExit(java.nio.file.Paths.get(tmp))
    val o = Tables.orders(spark, sf).select(col("o_totalprice"))
    Profiling.writeDriftBaseline(o, "o_totalprice", 0.0, 500000.0, 20, s"$tmp/b")
    pinNoRawShuffle("distributionDriftFromBaseline",
      Profiling.distributionDriftFromBaseline(
        spark.read.parquet(s"$tmp/b"), o, "o_totalprice"), "o_totalprice")
  }

  test("substring rewrite: span-decision exchanges carry only (id, pos, hash) (r13)") {
    // removeDuplicatedSpans' corpus-wide KEEP/DROP decision must never
    // shuffle text: every exchange whose payload includes the span hash
    // `h` carries fixed-width columns only. The reassembly exchanges
    // (token text grouped per doc) are the OUTPUT corpus itself — the
    // same one-rewrite floor lineDedup has — and are keyed by (id, pos),
    // never by h.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    val df = SparkEntry.queries("d_substring_rewrite")(spark, sf)
    df.collect()
    def deep(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        deep(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        deep(s.plan)
      case other => other.children.flatMap(deep)
    })
    val exchanges = deep(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    val decision = exchanges.filter(_.child.output.exists(_.name == "h"))
    assert(decision.nonEmpty, "expected hash-keyed decision exchanges")
    decision.foreach { e =>
      e.child.output.foreach(attr =>
        assert(attr.dataType != StringType,
          s"span-decision exchange shuffles text column '${attr.name}'"))
    }
  }

  test("q53: each choice combination's regex stages exactly once; no filter re-match (r13)") {
    // the r12 dispatchRows contract: the no-combination-parses drop is an
    // explode over a conditional array, NOT a .filter — the optimizer
    // would push a deterministic filter below the staged projection by
    // SUBSTITUTING the alias definitions, re-running every combination's
    // full-record match per predicate (measured 45% slower). Pin both:
    // regexp_groups appears once per combination (2 for q53's two-branch
    // choice), and never inside a Filter condition.
    import graft.functions.RegexpGroupsExpr
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val optimized = SparkEntry.queries("q53_dfasdl_mixed")(spark, sf)
      .queryExecution.optimizedPlan
    def countGroups(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      (if (e.isInstanceOf[RegexpGroupsExpr]) 1 else 0) +
        e.children.map(countGroups).sum
    val total = optimized.collect { case p => p }
      .flatMap(_.expressions).map(countGroups).sum
    assert(total == 2,
      s"q53 must stage each combination's match exactly once, found $total:\n$optimized")
    optimized.collect { case f: Filter => f }.foreach { f =>
      assert(countGroups(f.condition) == 0,
        s"a combination match leaked into a Filter (alias substitution):\n$f")
    }
  }

  test("compactParquet collapses a many-small-files dataset, content intact") {
    val in = java.nio.file.Files.createTempDirectory("compact_in").toString
    val out = java.nio.file.Files.createTempDirectory("compact_out").toString + "/t"
    val src = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    src.repartition(64).write.mode("overwrite").parquet(in) // 64 tiny files
    val n = Sinks.compactParquet(spark, in, out, targetFileBytes = 1L << 30)
    assert(n == 1)
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"expected 1 compacted file, found $files")
    // order-independent checksum: compaction must not lose or alter rows
    val cols = Seq("o_orderkey", "o_totalprice")
    assert(Profiling.datasetChecksum(spark.read.parquet(out), cols).collect()(0) ==
      Profiling.datasetChecksum(src, cols).collect()(0))
  }

  test("writeSorted lays files out with pairwise-disjoint key ranges") {
    val out = java.nio.file.Files.createTempDirectory("sorted_out").toString + "/t"
    Sinks.writeSorted(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
      out, Seq("o_orderkey"), nFiles = 8)
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length >= 2, "range partitioning should produce several files")
    ranges.sliding(2).foreach { case Array((_, _, hi1), (_, lo2, _)) =>
      assert(hi1 < lo2, s"file key ranges overlap: hi=$hi1 vs next lo=$lo2")
    }
  }

  test("writeShuffledShards: deterministic round-robin shards, pos-ordered files (r10)") {
    val out = java.nio.file.Files.createTempDirectory("shards_out").toString + "/t"
    val docs = Tables.documents(spark, sf).select("doc_id")
    val n = docs.count()
    Sinks.writeShuffledShards(docs, out, "doc_id", seed = 11L, nShards = 4)
    val back = spark.read.parquet(out)
    // every row lands exactly once; shard = pos % 4
    assert(back.count() == n)
    assert(back.filter(col("shard") =!= col("pos") % 4).count() == 0)
    // within a shard directory the single file is pos-ascending (a
    // training consumer reads it sequentially in global-order stride)
    val s0 = spark.read.parquet(out + "/shard=0").select("pos")
      .as[Long].collect()
    assert(s0.toSeq == s0.sorted.toSeq && s0.nonEmpty)
    // reproducible: a second write yields the identical assignment
    val out2 = java.nio.file.Files.createTempDirectory("shards_out2").toString + "/t"
    Sinks.writeShuffledShards(docs, out2, "doc_id", seed = 11L, nShards = 4)
    val a = back.select("doc_id", "pos").as[(Long, Long)].collect().toSet
    val b = spark.read.parquet(out2).select("doc_id", "pos")
      .as[(Long, Long)].collect().toSet
    assert(a == b)
    // the layout carries its permutation-scheme version (r11 advice:
    // v1→v2 field widening changed every seed's permutation, so consumers
    // need a machine-readable tag to tell layouts apart)
    val marker = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "_graft_shuffle_scheme")), "UTF-8").trim
    assert(marker == graft.operators.Corpus.ShuffleSchemeVersion.toString)
    // review-caught marker integrity (r12): the tag must describe what is
    // ON DISK. Simulate an old-scheme layout by rewriting the marker —
    // (a) an Ignore-mode write that no-ops must NOT restamp it, and
    // (b) appending current-scheme shards onto it must refuse (one
    // directory mixing two permutations reproduces under neither)
    val mPath = java.nio.file.Paths.get(out, "_graft_shuffle_scheme")
    // drop the local-FS checksum sidecar when hand-editing the marker, or
    // the next Hadoop read fails on the stale CRC
    def stampScheme(v: String): Unit = {
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(out, "._graft_shuffle_scheme.crc"))
      java.nio.file.Files.write(mPath, s"$v\n".getBytes("UTF-8"))
    }
    stampScheme("1")
    Sinks.writeShuffledShards(docs, out, "doc_id", seed = 11L, nShards = 4,
      mode = org.apache.spark.sql.SaveMode.Ignore)
    assert(new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8").trim
      == "1", "Ignore no-op must not restamp an old-scheme layout")
    val e = intercept[IllegalStateException](
      Sinks.writeShuffledShards(docs, out, "doc_id", seed = 11L, nShards = 4,
        mode = org.apache.spark.sql.SaveMode.Append))
    assert(e.getMessage.contains("mix permutations"), e.getMessage)
    // appending onto an UNVERSIONED layout (pre-marker v1 export) refuses
    // too — marker absence means scheme v1, not "anything goes"
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(out, "._graft_shuffle_scheme.crc"))
    java.nio.file.Files.deleteIfExists(mPath)
    val e2 = intercept[IllegalStateException](
      Sinks.writeShuffledShards(docs, out, "doc_id", seed = 11L, nShards = 4,
        mode = org.apache.spark.sql.SaveMode.Append))
    assert(e2.getMessage.contains("UNVERSIONED"), e2.getMessage)
    // ...but a merely EXISTING empty directory (pre-created target, or a
    // first Append that died before writing data) must stay appendable —
    // marker absence only means v1 when shard data is present
    val empty = java.nio.file.Files.createTempDirectory("shards_empty")
      .toString
    Sinks.writeShuffledShards(docs, empty, "doc_id", seed = 11L, nShards = 4,
      mode = org.apache.spark.sql.SaveMode.Append)
    assert(spark.read.parquet(empty).count() == n)
    // appending onto a SAME-scheme layout still works and keeps the tag
    stampScheme(graft.operators.Corpus.ShuffleSchemeVersion.toString)
    Sinks.writeShuffledShards(docs, out, "doc_id", seed = 11L, nShards = 4,
      mode = org.apache.spark.sql.SaveMode.Append)
    assert(spark.read.parquet(out).count() == 2 * n)
    assert(new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8").trim
      == graft.operators.Corpus.ShuffleSchemeVersion.toString)
  }

  test("writeShuffledShards routes shard i to partition i exactly; write plan adds no sort (r11)") {
    // the preimage table: entry i must hash-partition to partition i under
    // Catalyst's partitionIdExpression (pmod(murmur3(x, 42), n)) — this is
    // what guarantees nShards tasks each own exactly one shard, instead of
    // hash-collisions leaving ~1/e of the writers idle
    for (n <- Seq(1, 2, 4, 7, 32, 1000)) {
      val pre = Sinks.shardPartitionPreimages(n)
      (0 until n).foreach { i =>
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(pre(i), 42)
        assert(((h % n) + n) % n == i, s"preimage $i wrong for n=$n")
      }
    }
    // glass-box: the pre-write exchange lands every row of shard i in
    // partition i (one shard per writer task, no empties)
    val docs = Tables.documents(spark, sf).select("doc_id")
    val pre4 = Sinks.shardPartitionPreimages(4)
    val routed = graft.operators.Corpus.deterministicShuffle(docs, "doc_id", 11L)
      .withColumn("shard", (col("pos") % 4).cast("int"))
      .repartition(4, element_at(typedLit(pre4.toSeq), col("shard") + 1))
      .select(spark_partition_id().as("pid"), col("shard"))
    assert(routed.filter(col("pid") =!= col("shard")).count() == 0,
      "shard i must land in partition i exactly")
    // the write plan must contain ONLY our sortWithinPartitions(shard, pos):
    // a pos-only child sort makes the dynamic-partition writer insert its
    // own sort on `shard`, whose stability is not guaranteed under spill —
    // capture the write's executed plan via a listener and count sorts
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.execution.SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = plans.add(qe.executedPlan)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = java.nio.file.Files.createTempDirectory("shards_plan").toString + "/t"
      Sinks.writeShuffledShards(docs, out, "doc_id", seed = 11L, nShards = 4)
      // the listener fires asynchronously; poll briefly for the write plan
      def capture(): Array[org.apache.spark.sql.execution.SparkPlan] =
        plans.toArray(Array.empty[org.apache.spark.sql.execution.SparkPlan])
          .filter(_.toString.contains("WriteFiles"))
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (capture().isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      val writePlans = capture()
      assert(writePlans.nonEmpty, "write plan not captured")
      writePlans.foreach { p =>
        val sorts = p.collectWithSubqueries {
          case s: org.apache.spark.sql.execution.SortExec => s }
        assert(sorts.size <= 1,
          s"writer inserted an extra (stability-unsafe) sort:\n$p")
        sorts.foreach { s =>
          val keys = s.sortOrder.map(_.child.toString).mkString(",")
          assert(keys.contains("shard") && keys.contains("pos"),
            s"child sort must already satisfy the writer ordering, got $keys")
        }
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("keyed JDBC sinks: pre-write exchange is ONE hash repartition on the keys (r11)") {
    // the one-writer-per-key contract (correctness at 1000 executors, not
    // an optimization) rests on the pre-write plan being a single hash
    // exchange on the key columns with our partition-local sort above it —
    // pin it so an optimizer change or future edit can't silently add an
    // exchange (two writers per key → interleaved probes, deadlock) or
    // drop the sort (adjacent-duplicate check goes blind)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    // AQE wraps the executed tree in leaf-like AdaptiveSparkPlanExec /
    // QueryStageExec nodes, so a plain collect sees NO exchange — unwrap
    // them (but not InMemoryTableScan: a cached relation's internal plan
    // belongs to the persist, not to this write)
    def deepCollect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
      val here = if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      here ++ kids.flatMap(deepCollect(_)(pf))
    }
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        if (funcName == "foreachPartition") plans.add(qe.executedPlan)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    val db = java.nio.file.Files.createTempDirectory("pin_db") + "/pindb"
    val url = s"jdbc:derby:$db;create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val seed = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "v", "x")
    graft.sinks.Sinks.writeJdbc(seed, url, "pin_t", props,
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    spark.listenerManager.register(listener)
    try {
      Sinks.writeJdbcCdc(
        Seq((1L, "A", 9.0, "U"), (2L, "", 0.0, "D"), (3L, "c", 3.0, "U"))
          .toDF("id", "v", "x", "op"),
        url, "pin_t", Seq("id"), "op", "D", props)
      def capture() = plans.toArray(Array.empty[SparkPlan])
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      // CDC = one delete pass + one upsert pass → two foreachPartition plans
      while (capture().length < 2 && System.nanoTime() < deadline)
        Thread.sleep(100)
      val captured = capture()
      assert(captured.length >= 2, "delete+upsert write plans not captured")
      captured.foreach { p =>
        val exchanges = deepCollect(p) { case e: ShuffleExchangeExec => e }
        assert(exchanges.length == 1,
          s"pre-write plan must contain exactly ONE exchange:\n$p")
        exchanges.head.outputPartitioning match {
          case h: HashPartitioning =>
            assert(h.expressions.map(_.toString).exists(_.contains("id")),
              s"exchange must hash on the key columns:\n$p")
          case other => fail(s"expected hash partitioning, got $other:\n$p")
        }
        val sorts = deepCollect(p) {
          case s: org.apache.spark.sql.execution.SortExec => s }
        // the upsert pass (non-key columns in the output) carries the
        // LOAD-BEARING partition-local key sort — the adjacent-duplicate
        // check reads consecutive rows; the delete pass's sort is a
        // locality nicety AQE may (and does) eliminate, which is safe
        // because its upstream dropDuplicates already made keys unique
        // classify by the row schema under the object deserializer (the
        // wrapper's own output is just `obj`): delete pass ships keys only
        val isUpsertPass = deepCollect(p) {
          case d: org.apache.spark.sql.execution.DeserializeToObjectExec =>
            d.child.output.map(_.name).toSet
        }.headOption.exists(_ != Set("id"))
        if (isUpsertPass) {
          assert(sorts.length == 1 && !sorts.head.global,
            s"upsert pass must keep exactly one partition-local key sort:\n$p")
          assert(sorts.head.sortOrder.map(_.child.toString).mkString(",").contains("id"),
            s"upsert sort must order by the key columns:\n$p")
        } else
          assert(sorts.forall(!_.global),
            s"delete pass must not contain a global sort:\n$p")
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("writeZOrdered bounds per-file ranges on BOTH interleaved columns") {
    val src = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
    def spans(dir: String): Seq[(Double, Double)] = {
      val g = spark.read.parquet(dir).agg(
        (max("l_partkey") - min("l_partkey")).cast("double").as("pg"),
        (max("l_suppkey") - min("l_suppkey")).cast("double").as("sg"))
        .as[(Double, Double)].collect()(0)
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("l_partkey") - min("l_partkey")).cast("double").as("p"),
          (max("l_suppkey") - min("l_suppkey")).cast("double").as("s"))
        .select(col("p") / g._1, col("s") / g._2)
        .as[(Double, Double)].collect().toSeq
    }
    val zOut = java.nio.file.Files.createTempDirectory("z_out").toString + "/t"
    Sinks.writeZOrdered(src, zOut, "l_partkey", "l_suppkey", nFiles = 16)
    val zSpans = spans(zOut)
    assert(zSpans.length >= 8, s"expected many files, got ${zSpans.length}")
    // single-key layout leaves the OTHER column spanning ~its full range
    val sOut = java.nio.file.Files.createTempDirectory("z_cmp").toString + "/t"
    Sinks.writeSorted(src, sOut, Seq("l_partkey"), nFiles = 16)
    val sSpans = spans(sOut)
    def avg(xs: Seq[Double]) = xs.sum / xs.length
    val (zP, zS) = (avg(zSpans.map(_._1)), avg(zSpans.map(_._2)))
    val sS = avg(sSpans.map(_._2))
    // z-curve: BOTH dimensions compact per file; sorted: secondary ~full
    assert(zP <= 0.6 && zS <= 0.6, s"z-order spans not compact: p=$zP s=$zS")
    assert(zS < sS * 0.75, s"z-order should beat single-key on the secondary: $zS vs $sS")
    // layout change must not change content
    assert(Validators.contentMatches(spark.read.parquet(zOut), src,
      Seq("l_partkey", "l_suppkey")))
  }

  test("salted skew join broadcasts the replicated dimension side (q27)") {
    val plan = SparkEntry.queries("q27_skew_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"salt replication should broadcast, not shuffle, the dim side:\n$plan")
  }

  test("salted skew join falls back to a shuffle join when the replicated side outgrows the broadcast cap") {
    // the r11 x100 leg: a forced broadcast of a dimension that grew with
    // the corpus dies on the driver; the operator must degrade to a
    // (key, salt) shuffle join — same rows, no broadcast — once the
    // Catalyst size estimate crosses maxBroadcastBytes
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") >= 45.0)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    // NO threshold override: the refused path must defeat the planner's
    // OWN auto-broadcast too (the Generate estimate ignores the salt
    // replication, so at default settings the planner would broadcast the
    // oversized side the gate just refused — the review-caught hole)
    val forced = SkewJoin.salted(li, o, "l_orderkey", "o_orderkey",
      saltFactor = 4, maxBroadcastBytes = 1L)
    val plan = forced.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"a 1-byte cap must force the shuffle path even at default auto-threshold:\n$plan")
    val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    assert(forced.count() == expected)
  }

  test("q41's JDBC scan is range-partitioned for parallel pull (4 tasks)") {
    val df = SparkEntry.queries("q41_jdbc")(spark, sf)
    assert(df.rdd.getNumPartitions == 4,
      s"partitioned JDBC read should fan out, got ${df.rdd.getNumPartitions}")
  }

  test("q42's compiled cookbook fuses into the scan: no exchange") {
    val plan = SparkEntry.queries("q42_dfasdl")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"cookbook recipe must be a pure projection over the csv scan:\n$plan")
  }

  test("no cartesian products anywhere in the registry") {
    SparkEntry.registry.foreach { d =>
      val plan = d.run(spark, sf).queryExecution.executedPlan.toString
      // brute-force ANN intentionally uses a broadcast nested loop (bounded
      // by the tiny query side); everything else must be hash/merge joins
      if (d.name != "d_ann_brute")
        assert(!plan.contains("CartesianProduct"), s"${d.name} has a cartesian:\n$plan")
    }
  }
}
