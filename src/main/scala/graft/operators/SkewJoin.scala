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
    * fits; the big side never shuffles more than a plain shuffle join.
    */
  def salted(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
             saltFactor: Int = 8, broadcastSmall: Boolean = true): DataFrame = {
    // saltFactor 0 would make pmod(_, 0) a NULL salt on every row and the
    // join silently EMPTY (or an ANSI divide-by-zero)
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val salts = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    val right = if (broadcastSmall) broadcast(salts) else salts
    saltedBig.join(right,
        saltedBig(bigKey) === right(smallKey) && saltedBig("__salt") === right("__salt"))
      .drop("__salt")
  }
}
