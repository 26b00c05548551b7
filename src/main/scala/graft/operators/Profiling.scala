package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling, the Spark form of the reference's analyzer stack
  * (/root/reference/src/main/scala/com/wegtam/tensei/agent/analyzer/
  * NumericAnalyzer.scala, StringAnalyzer.scala and Stats.scala): basic
  * statistics per column, computed in ONE distributed aggregation pass over
  * the table — the reference streams sampled values through actors; here
  * partial aggregates combine map-side so the driver only sees final stats.
  */
object Profiling {

  /** Sampled input for profile passes — Stats.scala:46 takes a `percent`
    * parameter so the reference can profile a fraction of a huge source;
    * `df.sample` is the distributed equivalent (per-partition Bernoulli
    * sampling, no shuffle, deterministic under the fixed seed).
    */
  private def sampled(df: DataFrame, samplePercent: Double): DataFrame = {
    require(samplePercent > 0 && samplePercent <= 100,
      s"samplePercent must be in (0, 100], got $samplePercent")
    if (samplePercent >= 100) df
    else df.sample(withReplacement = false, samplePercent / 100.0, seed = 42L)
  }

  /** NumericAnalyzer.scala:41-58 equivalent: count/min/max/mean per numeric
    * column. Mean is reported as an exact integer per-mille (floor(sum*1000/
    * n)) so results are engine-portable (SURVEY.md §6). `samplePercent`
    * mirrors Stats.scala:46's sampled profiling.
    */
  def numericProfile(df: DataFrame, cols: Seq[String],
                     samplePercent: Double = 100.0): DataFrame = {
    val in = sampled(df, samplePercent)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}_count"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        floor(sum(col(c).cast(DecimalType(18, 4))).cast(DoubleType) * 1000 / count(col(c)))
          .cast(LongType).as(s"${c}_mean_milli")
      )
    }
    in.agg(aggs.head, aggs.tail: _*)
  }

  /** StringAnalyzer.scala:38-54 equivalent: length stats + cardinality per
    * string column. `samplePercent` mirrors Stats.scala:46.
    */
  def stringProfile(df: DataFrame, cols: Seq[String],
                    samplePercent: Double = 100.0): DataFrame = {
    val in = sampled(df, samplePercent)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}_count"),
        min(length(col(c))).cast(LongType).as(s"${c}_min_len"),
        max(length(col(c))).cast(LongType).as(s"${c}_max_len"),
        countDistinct(col(c)).as(s"${c}_distinct")
      )
    }
    in.agg(aggs.head, aggs.tail: _*)
  }

  /** Equi-width value histogram over `[lo, hi]` — the distribution view a
    * profiler reports next to min/max/mean (the reference's analyzers keep
    * per-field stats; a histogram is the same single aggregation pass with
    * a computed bucket key). Values outside the range are dropped (report
    * them via [[numericProfile]]'s min/max first). One scan, one keyed
    * aggregate over at most `nBuckets` groups — partial combine makes the
    * exchange `nBuckets` rows per task at any table size.
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, s"need hi > lo and nBuckets > 0")
    val width = (hi - lo) / nBuckets
    val v = col(valueCol)
    val bucket = least(floor((v - lo) / width), lit(nBuckets - 1)).cast(LongType)
    df.filter(v.isNotNull && v >= lo && v <= hi)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (lit(lo) + col("bucket") * width).as("bucket_lo"),
        (lit(lo) + (col("bucket") + 1) * width).as("bucket_hi"),
        col("n"))
  }

  /** Distribution drift between two snapshots of a numeric column as a
    * per-bin population-stability-index table — the "did the new crawl
    * shift my feature?" check a training pipeline runs between ingests.
    * Fixed equi-width bins over `[lo, hi]` (same contract as
    * [[histogram]]); out-of-range values CLAMP into the edge bins rather
    * than drop, so range drift cannot silently vanish from the report.
    * Output: (`bucket`, `count_a`, `count_b`, `psi_term`) where
    * `psi_term` = (pA−pB)·ln((pA+ε)/(pB+ε)), ε = 1e-9, rounded to
    * DECIMAL(38,6) (ln's last-ulp can differ across libm builds; six
    * decimals is far above that noise and far below any real drift).
    * PSI = SUM(psi_term); the usual read is <0.1 stable, >0.25 shifted.
    *
    * Scale shape: two scans union into one keyed aggregate over at most
    * `nBuckets` groups (partial combine → `nBuckets` rows per task on
    * the exchange at any table size), then a one-row totals broadcast —
    * no data-sized shuffle at 100 TB.
    */
  def distributionDrift(a: DataFrame, b: DataFrame, valueCol: String,
                        lo: Double, hi: Double, nBuckets: Int): DataFrame =
    distributionDriftFromCountPair(
      bucketCounts(a, valueCol, lo, hi, nBuckets, "count_a"),
      bucketCounts(b, valueCol, lo, hi, nBuckets, "count_b"))

  /** One side's equi-width bucket counts — the persistable half of
    * [[distributionDrift]]. NULL and NaN values are EXCLUDED (under
    * Spark's NaN-is-largest ordering the clamp would otherwise land NaN
    * in the TOP edge bin and silently inflate its mass); out-of-range
    * values clamp into the edge bins as documented on
    * [[distributionDrift]]. ≤ `nBuckets` rows, map-side partial combine.
    */
  def bucketCounts(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                   nBuckets: Int, countName: String = "count"): DataFrame = {
    require(nBuckets > 0 && hi > lo, s"need hi > lo and nBuckets > 0")
    val width = (hi - lo) / nBuckets
    val v = df(valueCol).cast(DoubleType)
    df.filter(v.isNotNull && !isnan(v)).select(
        least(greatest(floor((v - lo) / width), lit(0.0)),
          lit((nBuckets - 1).toDouble)).cast(LongType).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as(countName))
  }

  /** The EQUI-MASS form of [[distributionDrift]]: bins are the baseline's
    * own quantile cuts ([[quantileCuts]] — the classic PSI convention is
    * its deciles), so every bin holds ~1/nBuckets of baseline mass and the
    * report is sensitive across the whole distribution, not just where
    * equi-width bins happen to be populated. `cuts` are the n−1 interior
    * thresholds ascending; bucket(v) = #{cuts ≤ v} — an open-ended chain,
    * so range drift lands in the edge bins like the equi-width form.
    * Duplicate cuts (a mass point spanning quantiles) merely leave a bin
    * structurally empty on BOTH sides — harmless under the ε smoothing.
    * Same output, smoothing, and bounded-exchange contract.
    */
  def distributionDriftByCuts(a: DataFrame, b: DataFrame, valueCol: String,
                              cuts: Seq[Double]): DataFrame =
    distributionDriftFromCountPair(
      bucketCountsByCuts(a, valueCol, cuts, "count_a"),
      bucketCountsByCuts(b, valueCol, cuts, "count_b"))

  /** One side's counts over irregular cut thresholds — bucket(v) =
    * #{cuts ≤ v}, a codegen'd indicator chain (fine for the ≤ dozens of
    * cuts PSI uses). NULL/NaN excluded as in [[bucketCounts]].
    */
  def bucketCountsByCuts(df: DataFrame, valueCol: String, cuts: Seq[Double],
                         countName: String = "count"): DataFrame = {
    require(cuts.nonEmpty && cuts == cuts.sorted,
      "cuts must be nonempty ascending interior thresholds")
    val v = df(valueCol).cast(DoubleType)
    df.filter(v.isNotNull && !isnan(v)).select(
        cuts.map(t => when(v >= lit(t), 1L).otherwise(0L))
          .reduce(_ + _).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as(countName))
  }

  /** The n−1 interior quantile thresholds of `valueCol` (EXACT linear-
    * interpolation percentiles — Spark `percentile` and DuckDB
    * `quantile_cont` share the definition bit-for-bit, the p_percentiles
    * evidence), NaN-excluded. One aggregate, n−1 doubles to the driver —
    * compute ONCE on the baseline and persist next to its counts; deciles
    * (nBuckets = 10) are the classic PSI convention.
    */
  def quantileCuts(df: DataFrame, valueCol: String, nBuckets: Int): Seq[Double] = {
    require(nBuckets > 1, "need nBuckets > 1")
    val v = df(valueCol).cast(DoubleType)
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val row = df.filter(v.isNotNull && !isnan(v))
      .select(percentile(v, lit(ps.toArray)).as("q"))
      .head()
    require(!row.isNullAt(0), s"quantileCuts: $valueCol has no " +
      "non-null/non-NaN values — cannot derive cuts from an empty baseline")
    row.getSeq[Double](0).toSeq
  }

  /** Merge two same-contract numeric baselines ([[writeDriftBaseline]]'s
    * layout) into one: counts sum per bucket, the binning contract must
    * match exactly (required — summing counts binned under different
    * contracts is meaningless). The epoch-rolling update: merge each new
    * epoch's counts into the standing baseline instead of re-scanning
    * history; spec pins merged == recomputed-over-union.
    */
  def mergeDriftBaselines(a: DataFrame, b: DataFrame): DataFrame = {
    def contract(df: DataFrame) =
      df.select(col("lo"), col("hi"), col("n_buckets")).limit(1).collect()
        .headOption.map(r => (r.getDouble(0), r.getDouble(1), r.getInt(2)))
    val (ca, cb) = (contract(a), contract(b))
    (ca, cb) match {
      case (Some(x), Some(y)) =>
        require(x == y, s"mergeDriftBaselines: binning contracts differ " +
          s"($x vs $y) — counts binned under different contracts cannot sum")
        a.unionByName(b)
          .groupBy(col("bucket"), col("lo"), col("hi"), col("n_buckets"))
          .agg(sum(col("count")).as("count"))
          .select(col("bucket"), col("count"), col("lo"), col("hi"),
            col("n_buckets"))
      case _ => if (ca.isEmpty) b else a // an empty side is a no-op
    }
  }

  /** PSI from two PRECOMPUTED count tables — `aCounts` as (bucket,
    * count_a), `bCounts` as (bucket, count_b); buckets missing on a side
    * count 0. The primitive under every drift form; exposed for callers
    * that maintain counts themselves (the rolling streaming ledger).
    */
  def distributionDriftFromCountPair(aCounts: DataFrame,
                                     bCounts: DataFrame): DataFrame =
    psiFromCounts(
      aCounts.join(bCounts, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("count_a"), lit(0L)).as("count_a"),
          coalesce(col("count_b"), lit(0L)).as("count_b")),
      Seq("bucket"), "distributionDriftFromCountPair")

  /** The shared PSI tail: per-key counts → ε-smoothed psi_term. A zero-row
    * side RAISES (assert_true) instead of nulling every psi_term through a
    * 0/0 — a drift report silently full of nulls reads as "no drift".
    * When BOTH sides are empty there are no rows to evaluate the guard on:
    * the report is EMPTY (zero buckets) — distinguishable from "no drift"
    * (which has rows with psi_term 0) by its row count; the persisted-
    * baseline and sink paths can't reach it (writeDriftBaseline refuses an
    * empty snapshot, FromBaseline requires a non-empty file).
    */
  private def psiFromCounts(counts: DataFrame, keyCols: Seq[String],
                            opName: String): DataFrame = {
    val totals = counts.agg(sum(col("count_a")).as("__na"),
      sum(col("count_b")).as("__nb"))
    val pa = col("count_a") / col("__na")
    val pb = col("count_b") / col("__nb")
    val term = ((pa - pb) * log((pa + lit(1e-9)) / (pb + lit(1e-9))))
      .cast(DecimalType(38, 6))
    counts.crossJoin(broadcast(totals)) // one-row totals: bounded by construction
      .select(keyCols.map(col) ++ Seq(col("count_a"), col("count_b"),
        coalesce(
          assert_true(col("__na") > 0 && col("__nb") > 0,
            lit(s"$opName: a snapshot side has zero rows in range — PSI undefined"))
            .cast(DecimalType(38, 6)),
          term).as("psi_term")): _*)
  }

  /** One-row (`lo`, `hi`, `n`) bounds of a numeric column, NaN-excluded —
    * compute ONCE on the baseline snapshot and persist next to
    * [[bucketCounts]] so recurring drift checks never re-scan the baseline
    * (see [[writeDriftBaseline]]).
    */
  def driftBounds(df: DataFrame, valueCol: String): DataFrame = {
    val v = df(valueCol).cast(DoubleType)
    df.filter(v.isNotNull && !isnan(v))
      .agg(min(v).as("lo"), max(v).as("hi"), count(lit(1)).as("n"))
  }

  /** Persist a numeric drift baseline: bucket counts + the binning contract
    * (`lo`, `hi`, `n_buckets` as columns — self-describing, ≤ nBuckets
    * rows). Recurring checks ([[distributionDriftFromBaseline]], the
    * streaming drift sink) read THIS instead of re-scanning the snapshot.
    */
  def writeDriftBaseline(df: DataFrame, valueCol: String, lo: Double,
                         hi: Double, nBuckets: Int, dir: String): Unit = {
    // refuse an empty baseline at the WRITE (the error belongs where the
    // cause is — every later read would otherwise fail far from it, or
    // score batches against nothing); a limit-1 probe, early-exits
    val v = df(valueCol).cast(DoubleType)
    require(!df.filter(v.isNotNull && !isnan(v)).isEmpty,
      s"writeDriftBaseline: $valueCol has no non-null/non-NaN values — " +
        "refusing to persist an empty baseline")
    bucketCounts(df, valueCol, lo, hi, nBuckets)
      .withColumn("lo", lit(lo)).withColumn("hi", lit(hi))
      .withColumn("n_buckets", lit(nBuckets))
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** [[distributionDrift]] against a PERSISTED baseline (the
    * [[writeDriftBaseline]] layout): only snapshot B scans; the baseline
    * side is its ≤ nBuckets stored counts. Result is row-identical to
    * `distributionDrift(a, b, …)` with the baseline's binning contract
    * (pinned by spec). The one driver action is a ≤ nBuckets-row collect
    * of the binning params — bounded by construction.
    */
  def distributionDriftFromBaseline(baseline: DataFrame, b: DataFrame,
                                    valueCol: String): DataFrame = {
    val params = baseline.select(col("lo"), col("hi"), col("n_buckets"))
      .limit(1).collect()
    require(params.nonEmpty, "distributionDriftFromBaseline: the baseline " +
      "is empty — write it from a non-empty snapshot (writeDriftBaseline)")
    val head = params(0)
    val (lo, hi, nBuckets) = (head.getDouble(0), head.getDouble(1), head.getInt(2))
    distributionDriftFromCountPair(
      baseline.select(col("bucket"), col("count").as("count_a")),
      bucketCounts(b, valueCol, lo, hi, nBuckets, "count_b"))
  }

  /** [[distributionDrift]]'s categorical twin: per-category PSI between
    * two snapshots of a discrete column (source, language, label — the
    * features a numeric binning can't see). The category vocabulary is
    * the BASELINE's top-`topK` values by count (ties broken by value
    * ascending, so the vocabulary is deterministic); everything else —
    * including categories that appear only in B, the classic new-source
    * drift — folds into the (`__other__`, `is_fold` = true) row, so novel
    * mass is reported, never dropped — and never conflated with a genuine
    * data category that happens to be NAMED `__other__` (which groups
    * under `is_fold` = false). Output adds the `is_fold` key; smoothing
    * contract identical to [[distributionDrift]].
    *
    * SCHEMA CHANGE (r13): `is_fold` was inserted at position 1, shifting
    * `count_a`/`count_b`/`psi_term` right by one. Consumers must select
    * columns BY NAME — positional reads (`row.getDecimal(3)`-style)
    * against the pre-r13 layout silently read the wrong column or throw a
    * cast error.
    *
    * Scale shape: one keyed aggregate per side (partial combine), a
    * driver-bounded top-K vocabulary (≤ topK rows collected via sort),
    * then the same ≤(topK+1)-group aggregate + one-row totals broadcast.
    */
  def categoricalDrift(a: DataFrame, b: DataFrame, catCol: String,
                       topK: Int): DataFrame =
    categoricalDrift(a, b, catCol, categoricalVocabulary(a, catCol, topK))

  /** [[categoricalDrift]] with a PRECOMPUTED vocabulary (one `category`
    * column) — recurring checks pass the persisted baseline vocabulary
    * instead of paying the top-K sort over the baseline on every call (the
    * known-cardinality-hint pattern; spec pins hint == no-hint results).
    *
    * The fold bucket is keyed by `is_fold`, NOT by the `__other__` label
    * alone: a genuine data category named `__other__` groups as
    * (`__other__`, false) while folded novel mass is (`__other__`, true) —
    * the two never merge.
    */
  def categoricalDrift(a: DataFrame, b: DataFrame, catCol: String,
                       vocab: DataFrame): DataFrame =
    categoricalDriftFromCountPair(
      foldedCounts(a, catCol, vocab, "count_a"),
      foldedCounts(b, catCol, vocab, "count_b"))

  /** One side's vocabulary-folded category counts — the shared primitive
    * under every categorical drift form (two-snapshot, persisted
    * baseline, streaming); ≤ topK+1 groups, map-side partial combine.
    */
  def foldedCounts(df: DataFrame, catCol: String, vocab: DataFrame,
                   countName: String = "count"): DataFrame =
    df.filter(col(catCol).isNotNull)
      .select(col(catCol).cast(StringType).as("__v"))
      .join(broadcast(vocab), col("__v") === col("category"), "left")
      .select(coalesce(col("category"), lit("__other__")).as("category"),
        col("category").isNull.as("is_fold"))
      .groupBy(col("category"), col("is_fold"))
      .agg(count(lit(1)).as(countName))

  /** Categorical PSI from two precomputed [[foldedCounts]] tables —
    * (category, is_fold, count_a/count_b); keys missing on a side count
    * 0. The categorical twin of [[distributionDriftFromCountPair]].
    */
  def categoricalDriftFromCountPair(aCounts: DataFrame,
                                    bCounts: DataFrame): DataFrame =
    psiFromCounts(
      aCounts.join(bCounts, Seq("category", "is_fold"), "full_outer")
        .select(col("category"), col("is_fold"),
          coalesce(col("count_a"), lit(0L)).as("count_a"),
          coalesce(col("count_b"), lit(0L)).as("count_b")),
      Seq("category", "is_fold"), "categoricalDriftFromCountPair")

  /** The deterministic baseline top-`topK` vocabulary (count desc, value
    * asc under ties) — [[categoricalDrift]]'s default, exposed so a
    * recurring check can compute it ONCE and persist it (one `category`
    * column, ≤ topK rows).
    */
  def categoricalVocabulary(df: DataFrame, catCol: String, topK: Int): DataFrame = {
    require(topK > 0, "need topK > 0")
    df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).cast(StringType).as("category"))
      .agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("category"))
      .limit(topK)
      .select(col("category"))
  }

  /** Persist the baseline vocabulary alone (one `category` column, ≤ topK
    * rows) — the fixed fold key a rolling categorical check
    * ([[graft.streaming.Streams.toRollingCatDriftSink]]) folds every
    * batch through: the window's ledger counts are only summable under
    * ONE vocabulary, so it must persist independently of any counts.
    */
  def writeCategoricalVocabulary(df: DataFrame, catCol: String, topK: Int,
                                 dir: String): Unit =
    categoricalVocabulary(df, catCol, topK)
      .coalesce(1).write.mode("overwrite").parquet(dir)

  /** Merge two same-vocabulary categorical baselines
    * ([[writeCategoricalBaseline]]'s layout) — the categorical twin of
    * [[mergeDriftBaselines]]: folded counts sum per (category, is_fold);
    * the two baselines' NON-FOLD category sets (their vocabularies) must
    * be equal, or folded mass from different vocabularies would mix.
    * The check compares OBSERVED non-fold sets — exact for baselines
    * written from their vocabulary's own snapshot (every top-K category
    * has mass there by construction); a hint-vocabulary baseline whose
    * snapshot had zero mass in some vocab category can trip it
    * spuriously — prefer same-vocabulary epochs for rolling merges.
    */
  def mergeCategoricalBaselines(a: DataFrame, b: DataFrame): DataFrame = {
    def vocabOf(df: DataFrame): Set[String] =
      df.filter(!col("is_fold")).select(col("category"))
        .collect().map(_.getString(0)).toSet // ≤ topK rows by construction
    val (va, vb) = (vocabOf(a), vocabOf(b))
    if (va.nonEmpty && vb.nonEmpty)
      require(va == vb, s"mergeCategoricalBaselines: vocabularies differ " +
        s"(${va.diff(vb).take(3)} vs ${vb.diff(va).take(3)} …) — folded " +
        "counts under different vocabularies cannot sum")
    a.unionByName(b)
      .groupBy(col("category"), col("is_fold"))
      .agg(sum(col("count")).as("count"))
      .select(col("category"), col("is_fold"), col("count"))
  }

  /** Persist a categorical drift baseline: the folded per-category counts
    * (`category`, `is_fold`, `count`) — ≤ topK+1 rows, self-describing.
    * Recurring checks ([[categoricalDriftFromBaseline]], the streaming
    * sink) read this instead of re-scanning the baseline snapshot.
    */
  def writeCategoricalBaseline(df: DataFrame, catCol: String, topK: Int,
                               dir: String): Unit =
    foldedCounts(df, catCol, categoricalVocabulary(df, catCol, topK))
      .coalesce(1).write.mode("overwrite").parquet(dir)

  /** [[categoricalDrift]] against a persisted [[writeCategoricalBaseline]]
    * layout: only snapshot B scans; its vocabulary is the baseline's
    * non-fold categories. Row-identical to `categoricalDrift(a, b, …)`
    * with the baseline's topK (pinned by spec).
    */
  def categoricalDriftFromBaseline(baseline: DataFrame, b: DataFrame,
                                   catCol: String): DataFrame = {
    val vocab = baseline.filter(!col("is_fold")).select(col("category"))
    categoricalDriftFromCountPair(
      baseline.select(col("category"), col("is_fold"),
        col("count").as("count_a")),
      foldedCounts(b, catCol, vocab, "count_b"))
  }

  /** Exact Pearson correlation between two columns, engine-portably: the
    * five moment sums accumulate as DECIMAL (exact, order-independent —
    * a plain float `corr()` depends on partition addition order), and only
    * the final closed-form expression runs in floating point. The double
    * ops (*, -, /, sqrt) are IEEE-754 correctly-rounded everywhere, but an
    * engine's decimal→double CAST may double-round (DuckDB's int128 path
    * does), so cross-engine agreement is within 1 ulp — quantize through a
    * DECIMAL render for an exact compare (see the p_corr query). One
    * aggregation pass.
    */
  def corrExact(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // DECIMAL(18,6) inputs keep every product at DECIMAL(37,12) — inside
    // the 38-digit cap, so no precision-loss rescale (whose HALF_UP ties
    // are not engine-portable) ever fires; the sums stay exact for
    // |x| < 10¹² (the 18,6 integral capacity — beyond it the cast nulls
    // the row out of n AND the moments together, see the count below)
    def d(c: Column) = c.cast(DecimalType(18, 6))
    val x = col(xCol); val y = col(yCol)
    // Drop a row when EITHER value is outside the DECIMAL(18,6) capacity,
    // not just when it is null: a one-sided overflow would otherwise leave
    // the row out of n/sx/sxx/sxy (null-propagating products under
    // non-ANSI) but still inside sy/syy, making the six aggregates
    // disagree about the row set and the correlation silently wrong —
    // and under ANSI mode (Spark 4 default) the overflowing cast would
    // crash the whole aggregation. The explicit double-precision guard
    // (0.6 under the 10^12 integral capacity, far beyond the ~1.2e-4 ulp
    // at that magnitude, so no admitted value can overflow after HALF_UP
    // rounding to 6 dp) keeps every aggregate on the same row set in both
    // modes, so a plain count is again exact.
    def fits(c: Column) = abs(c.cast(DoubleType)) < lit(999999999999.4)
    val in = df.filter(x.isNotNull && y.isNotNull && fits(x) && fits(y))
    in.agg(
        count(lit(1)).as("n"),
        sum(d(x)).as("sx"),
        sum(d(y)).as("sy"),
        sum(d(x) * d(x)).as("sxx"),
        sum(d(y) * d(y)).as("syy"),
        sum(d(x) * d(y)).as("sxy"))
      .select(col("n"),
        ((col("n") * col("sxy").cast(DoubleType) -
          col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
          sqrt((col("n") * col("sxx").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sx").cast(DoubleType)) *
            (col("n") * col("syy").cast(DoubleType) -
              col("sy").cast(DoubleType) * col("sy").cast(DoubleType))))
          .as("corr"))
  }

  /** Order-independent dataset checksum — the distributed analog of the
    * reference's ChecksumValidator/DigestHelpers file digests: per-row
    * xxhash64 over the selected columns, combined with commutative
    * aggregates (sum + xor + count) so the result is identical under any
    * partitioning or row order. Two datasets with equal checksums are equal
    * with overwhelming probability; no sort, one pass.
    */
  def datasetChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    val h = xxhash64(cols.map(col): _*)
    df.agg(
      // decimal sum: commutative and overflow-free at any row count (ANSI
      // mode rejects a wrapping long sum)
      sum(h.cast(DecimalType(38, 0))).as("sum_hash"),
      expr(s"bit_xor(xxhash64(${cols.map(c => s"`$c`").mkString(", ")}))")
        .as("xor_hash"),
      count(lit(1)).as("n_rows"))
  }

  /** Per-value digest column (ChecksumValidator's md5/sha over one field).
    * Non-binary inputs digest their STRING rendering (Spark only permits
    * string/binary → binary casts, so a direct binary cast of a
    * numeric/date field fails analysis); pass `raw = true` for a BINARY
    * column to digest its bytes directly — routing bytes through a string
    * cast would corrupt non-UTF8 payloads.
    */
  def columnDigest(c: Column, algo: String = "sha256",
                   raw: Boolean = false): Column = {
    val bin =
      if (raw) c
      else c.cast(org.apache.spark.sql.types.StringType)
        .cast(org.apache.spark.sql.types.BinaryType)
    algo match {
      case "md5"    => md5(bin)
      case "sha256" => sha2(bin, 256)
      case "crc32"  => crc32(bin)
      case other    => throw new IllegalArgumentException(s"unknown algo: $other")
    }
  }

  /** Per-group sigma-distance outliers with EXACT arithmetic (within the
    * decimal budget below): flags rows
    * where `|x − mean| > (mNum/mDen)·σ` (population σ), computed entirely
    * in decimals so the flag set is identical on every engine and
    * partitioning — no sqrt, no division, no float accumulation. The
    * predicate compares squares: `mDen²·(n·x − s)² > mNum²·(n·s2 − s²)`,
    * where s/s2 are the exact decimal sum and sum-of-squares.
    *
    * `valueCol` must already be an exact DECIMAL(12,2) (money-style)
    * column. Decimal budget, honestly stated (r8 review): the sum casts
    * hold for |x| ≲ 10⁶ at ~10⁶ rows per group (sum(x²) must stay inside
    * DECIMAL(26,4)'s 10²² and the d1·d1·mDen² product inside the capped
    * DECIMAL(38,4)); multipliers mNum/mDen belong below 100. Beyond those
    * bounds a cast overflows → NULL predicate → rows silently unflagged
    * (ANSI: the job fails loudly instead) — widen every cast in lockstep
    * with the DuckDB oracle, whose own int64/int128 behavior fixed these
    * exact widths. One partial-combined
    * moment aggregate (3 values per group) broadcast back; the flag is a
    * codegen'd per-row predicate, so the whole operator is one scan plus
    * one broadcast join.
    */
  def outliersBySigma(df: DataFrame, valueCol: String, groupCol: String,
                      mNum: Int, mDen: Int,
                      knownGroups: Option[Long] = None): DataFrame = {
    val x = col(valueCol)
    val moments = df.groupBy(col(groupCol)).agg(
      // count(x), not count(*): moments must cover exactly the non-null
      // values the sums cover, or nullable columns skew the mean
      count(x).cast(DecimalType(10, 0)).as("__n"),
      sum(x).cast(DecimalType(18, 2)).as("__s"),
      sum((x * x).cast(DecimalType(25, 4))).cast(DecimalType(26, 4)).as("__s2"))
    val d1 = (col("__n") * x - col("__s")).cast(DecimalType(18, 2))
    val dd = (col("__n") * col("__s2") - col("__s") * col("__s"))
      .cast(DecimalType(34, 4))
    // one moments row per group: broadcast-shaped for the usual low-card
    // groupCol, but a high-cardinality groupCol scales it with the data.
    // Gate on GROUP CARDINALITY, not the Catalyst size estimate: an
    // Aggregate's estimate is child-scaled (≈ the full scan size, verified
    // against Spark's SizeInBytesOnlyStatsPlanVisitor), so a size-gated
    // hint would be withheld exactly when df is LARGE even for a 5-value
    // groupCol — and the planner, seeing the same estimate, would then
    // sort-merge-join the whole table onto a handful of keys. One
    // column-pruned approx-distinct pass decides instead — unless the
    // caller already knows the cardinality (`knownGroups`), which keeps
    // this a lazy plan-construction call with no job at all: repeated
    // invocations over the same wide table shouldn't re-pay a full
    // column scan just to re-learn that the group count is 5.
    val nGroups = knownGroups.getOrElse(
      df.agg(approx_count_distinct(col(groupCol))).head.getLong(0))
    val right = if (nGroups <= 1000000L) broadcast(moments) else moments
    df.join(right, groupCol)
      .filter(d1 * d1 * lit(mDen * mDen).cast(DecimalType(4, 0)) >
        dd * lit(mNum * mNum).cast(DecimalType(4, 0)))
      .drop("__n", "__s", "__s2")
  }

  /** Most frequent value of a column with a fully deterministic tie-break
    * (count desc, then value asc) — the mode statistic of a profiling
    * report. One partial-combined aggregate then a 1-row
    * `TakeOrderedAndProject`; no global sort. Output:
    * (col_name, value, n) with the value rendered as string so modes of
    * different columns union into one report.
    */
  def columnMode(df: DataFrame, colName: String): DataFrame =
    df.groupBy(col(colName).cast(org.apache.spark.sql.types.StringType).as("value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc)
      .limit(1)
      .select(lit(colName).as("col_name"), col("value"), col("n"))

  /** Null/completeness profile — the reference's SyntaxValidator-style
    * sanity pass over every column.
    */
  def completeness(df: DataFrame): DataFrame = {
    val aggs: Seq[Column] = df.columns.toSeq.map { c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls")
    } :+ count(lit(1)).as("total_rows")
    df.agg(aggs.head, aggs.tail: _*)
  }
}
