package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Embedding-column aggregation utilities (SURVEY.md §2e): the vector-side
  * summarization steps of a curation pipeline — per-cluster / per-label
  * centroids for mixture diagnostics, cluster labeling, and seeding ANN
  * index builds (the same statistic the IVF coarse quantizer iterates on).
  */
object Embeddings {

  /** Per-group element-wise centroid of a `array<float>` column, computed in
    * FIXED POINT so the result is exact, order-independent, and identical on
    * every engine: each element contributes `floor(v · 2^scaleBits)` as a
    * 64-bit integer, and those integers sum associatively — unlike float
    * addition, whose result depends on partition boundaries and combine
    * order. The mean renders both as the raw integer sum and as
    * `floor(sum / n)` (still fixed-point; divide by `2^scaleBits` to read it
    * as a float, with quantization error ≤ 2⁻ˢᶜᵃˡᵉᴮⁱᵗˢ).
    *
    * 100 TB shape: `posexplode` multiplies rows by the dimension map-side,
    * then ONE partial-combined aggregate on (group, pos) — the exchange
    * carries `dims × groups` partial sums per task, not vectors. With
    * 64-dim embeddings and 2²⁰ scaling, overflow needs ~2⁴³ rows per group
    * of |v| ≈ 1 — beyond that, drop scaleBits.
    *
    * Output: (`groupCol`, pos, n, sum_fp, mean_fp), one row per group and
    * vector position.
    */
  def centroidsFixedPoint(df: DataFrame, vecCol: String, groupCol: String,
                          scaleBits: Int = 20): DataFrame = {
    val scale = math.pow(2.0, scaleBits)
    df.select(col(groupCol).cast(LongType).as(groupCol),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(groupCol), col("pos").cast(LongType).as("pos"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("v").cast(DoubleType) * lit(scale)).cast(LongType))
          .as("sum_fp"))
      // floor-division via doubles: |sum_fp| stays far inside 2^53, where
      // IEEE division is exact enough for floor to agree across engines
      .withColumn("mean_fp",
        floor(col("sum_fp").cast(DoubleType) / col("n")).cast(LongType))
  }
}
