package graft.operators

import graft.functions.BloomExpr
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Explicit Bloom-filter join pruning — the runtime-filter shape that makes
  * selective fact-dim joins survive 100 TB: when the build side matches only
  * a sliver of the probe side's keys, shuffling the whole probe side just to
  * drop 99% of it in the join is the dominant cost. A Bloom filter over the
  * build keys, broadcast to the probe scan, drops non-matching rows
  * MAP-SIDE — before the exchange — so shuffle volume scales with the match
  * rate, not the table size.
  *
  * Spark's own `InjectRuntimeFilter` does this opportunistically but
  * conservatively (creation-side thresholds, one filter per query, no
  * user control); this operator is the explicit form: the caller knows the
  * build side is selective and sizes the filter.
  *
  * Sizing: the filter costs ~1.2 bytes/key at 1% fpp. It is merged on the
  * driver and torrent-broadcast once — the same lifecycle as Spark's own
  * runtime filters. False positives only cost wasted shuffle rows; the
  * subsequent join keeps results EXACT.
  */
object BloomJoin {

  /** Bytes an optimally-sized Bloom filter needs for `expectedKeys` at
    * `fpp` — bits = ceil(−n·ln(fpp)/ln²2). Shared by every pre-allocation
    * gate (this join's and the streaming near-dup filter's) so the sizing
    * math cannot drift between them.
    */
  private[graft] def requiredBloomBytes(expectedKeys: Long, fpp: Double): Long =
    math.ceil(-expectedKeys * math.log(fpp) / (math.log(2) * math.log(2)))
      .toLong / 8

  /** Rows of `probe` whose `probeKey` might appear in `build`'s `buildKey`
    * (exactly all matching rows, plus ~`fpp` of the rest). The filter build
    * is one distributed aggregate over `build`; the probe filter is a
    * codegen'd map-side predicate.
    */
  def prefilter(probe: DataFrame, probeKey: String,
                build: DataFrame, buildKey: String,
                expectedKeys: Long, fpp: Double = 0.01,
                maxBloomBytes: Long = 256L << 20): DataFrame = {
    // the bits allocate from the PARAMETER: an oversized expectedKeys is a
    // driver-killing allocation regardless of the build side's real size —
    // reject upfront (same gate as the streaming near-dup filter). Under-
    // sizing here is perf-only (the join removes false positives), so it
    // needs no saturation check.
    require(expectedKeys > 0,
      s"BloomJoin: expectedKeys must be positive, got $expectedKeys")
    val needed = requiredBloomBytes(expectedKeys, fpp)
    require(needed <= maxBloomBytes,
      s"BloomJoin: a $expectedKeys-key filter at fpp=$fpp needs " +
        s"${needed >> 20} MB > maxBloomBytes=${maxBloomBytes >> 20} MB — " +
        "raise the bound explicitly or skip the prefilter")
    val bf = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val handle = probe.sparkSession.sparkContext.broadcast(bf)
    probe.filter(BloomExpr.mightContain(col(probeKey), handle))
  }

  /** Inner equi-join with the probe side Bloom-pruned first. Semantically
    * identical to `probe.join(build, probeKey === buildKey)` — the join
    * removes Bloom false positives — but the probe exchange only carries
    * likely-matching rows.
    */
  def innerPrefiltered(probe: DataFrame, probeKey: String,
                       build: DataFrame, buildKey: String,
                       expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val pruned = prefilter(probe, probeKey, build, buildKey, expectedKeys, fpp)
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }
}
