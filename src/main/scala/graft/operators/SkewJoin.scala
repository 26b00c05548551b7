package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation joins (SURVEY.md §5).
  *
  * AQE splits skewed partitions for sort-merge joins at runtime, but when a
  * handful of hot keys dominate (the classic power-law key problem at
  * 100 TB) explicit salting still wins: the hot key's rows spread over
  * `saltFactor` sub-keys, and the (small) build side is replicated once per
  * sub-key. Result is identical to the plain join.
  */
object SkewJoin {

  /** Inner-join `big` (skewed) with `small` on `bigKey == smallKey`,
    * spreading each key over `saltFactor` salts. `small` is replicated
    * `saltFactor`× (it should be the dimension side) and broadcast when it
    * FITS: the Catalyst size estimate of the replicated side is checked
    * against `maxBroadcastBytes`, and an oversized side falls back to a
    * shuffle join on (key, salt) — which still cures the skew (the hot
    * key's rows spread over saltFactor reducers) without materializing the
    * whole dimension on the driver. An unconditional broadcast here is a
    * 100×-scale-up killer, found by the x100 bench leg: the "small" side
    * grows with the corpus, and at sf10 the forced 8-way-replicated
    * broadcast of a 15M-row dimension died with
    * "Not enough memory to build and broadcast" after 78 s of build — the
    * exact failure a 1000-executor job would hit, shifted onto the driver.
    * Either path returns exactly the plain join's rows; the big side never
    * shuffles more than a plain shuffle join.
    */
  def salted(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
             saltFactor: Int = 8, broadcastSmall: Boolean = true,
             maxBroadcastBytes: Long = 64L << 20): DataFrame = {
    // saltFactor 0 would make pmod(_, 0) a NULL salt on every row and the
    // join silently EMPTY (or an ANSI divide-by-zero)
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val salts = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    // the explicit × saltFactor: Catalyst's Generate stats don't reliably
    // account for the replication, so the gate scales the UNREPLICATED
    // side's estimate itself (see Joins.broadcastIfFits for the rationale).
    // The non-broadcast paths carry an explicit merge hint: withholding
    // OUR hint is not enough, because the planner's own auto-threshold
    // sees the Generate estimate — which ignores the replication — and
    // would broadcast the oversized side anyway. AQE may still convert to
    // a broadcast at runtime, but only from the REALIZED shuffle bytes of
    // the replicated side, which is exactly when broadcasting is safe.
    val fits = small.queryExecution.optimizedPlan.stats.sizeInBytes *
      saltFactor <= maxBroadcastBytes
    val right =
      if (broadcastSmall && fits) broadcast(salts) else salts.hint("merge")
    saltedBig.join(right,
        saltedBig(bigKey) === right(smallKey) && saltedBig("__salt") === right("__salt"))
      .drop("__salt")
  }
}
