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
    // group on the column AS IS — a LongType cast here silently nulled
    // every non-numeric label and merged all groups into one NULL centroid
    // (the numeric cast for oracle parity belongs at the query site)
    df.select(col(groupCol).as(groupCol),
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

  /** PCA basis over an embedding column: `mean` + top-`k` eigenvectors of
    * the covariance matrix (rows, descending eigenvalue), plus ALL `d`
    * eigenvalues for variance accounting.
    */
  final case class PcaModel(mean: Array[Double], basis: Array[Array[Double]],
                            eigvals: Array[Double]) {
    /** Variance share of each retained component, in exact integer
      * per-mille of total variance (engine-portable render).
      */
    def varianceSharePm: Array[Long] = {
      val total = eigvals.sum
      if (total <= 0) return Array.fill(basis.length)(0L)
      basis.indices.map(i => (eigvals(i) * 1000 / total).toLong).toArray
    }

    /** Basis rows scaled by 1/√eigval — projecting with this whitens the
      * output to unit per-component variance (the normalization quantized
      * indexes want: every PQ subspace then carries comparable energy).
      */
    def whitenedBasis: Array[Array[Double]] =
      basis.zipWithIndex.map { case (b, i) =>
        val s = 1.0 / math.sqrt(math.max(eigvals(i), 1e-12))
        b.map(_ * s)
      }
  }

  /** Train a PCA basis with ONE distributed pass: the fixed-point Gram
    * aggregate ([[graft.functions.FixedGramAgg]]) reduces the corpus to a
    * single `(1+d+d²)`-long integer buffer — exact and order-independent,
    * so the model is bit-identical across partitionings — and a cyclic
    * Jacobi eigensolver (driver-side, d×d is tiny) diagonalizes the
    * covariance. The d² per-row work runs map-side inside the scan; the
    * exchange is one ~33 KB buffer per partition at d=64.
    *
    * This is the dimensionality-reduction step an embedding pipeline runs
    * before quantized indexing (the rotation/truncation half of OPQ): keep
    * the top-k subspace, spend index bytes where the variance is.
    */
  def pcaTrain(df: DataFrame, vecCol: String, k: Int,
               scaleBits: Int = 20): PcaModel = {
    import graft.functions.FixedGramAgg.fixedGram
    val row = df.agg(fixedGram(col(vecCol), scaleBits).as("g"))
      .selectExpr("g.d", "g.n", "g.sums", "g.gram")
      .collect()(0) // ONE bounded row: the whole sufficient statistic
    val d = row.getLong(0).toInt
    val n = row.getLong(1)
    require(n > 0, "pcaTrain on an empty corpus")
    require(k >= 1 && k <= d, s"k=$k out of range 1..$d")
    val scale = math.pow(2.0, scaleBits)
    val sums = row.getSeq[Long](2).toArray
    val gram = row.getSeq[Long](3).toArray
    val mean = sums.map(_ / scale / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      gram(i * d + j) / scale / n - mean(i) * mean(j)
    }
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.indices.sortBy(i => -vals(i))
    // sign convention: first nonzero coordinate positive (eigenvectors are
    // sign-ambiguous; pin it so the model is reproducible)
    val basis = order.take(k).map { i =>
      val v = vecs.map(_(i))
      val s = v.find(math.abs(_) > 1e-12).map(math.signum).getOrElse(1.0)
      v.map(_ * s)
    }.toArray
    PcaModel(mean, basis, order.map(i => math.max(vals(i), 0.0)).toArray)
  }

  /** Project `vecCol` onto a trained basis as `array<float>` — pure
    * per-row fused work (graft.functions.PcaProjectExpr), zero shuffles;
    * the basis rides the generated code as a reference object.
    */
  def pcaProject(df: DataFrame, vecCol: String, model: PcaModel,
                 outCol: String = "pca", whiten: Boolean = false): DataFrame =
    df.withColumn(outCol, graft.functions.PcaProjectExpr.pcaProject(
      col(vecCol), model.mean,
      if (whiten) model.whitenedBasis else model.basis))

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector columns). O(d³) per sweep, converges in a
    * handful of sweeps — at embedding dimensionality this is microseconds;
    * a distributed eigensolver would spend more time scheduling one job.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]],
                                     maxSweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    while (sweep < maxSweeps && off > 1e-14) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // sign(0) must be +1, not 0: math.signum(0.0) == 0 would make
            // the rotation a NO-OP whenever the two diagonal entries are
            // equal (theta == 0 wants t == 1, a 45-degree rotation), and
            // equal-variance pairs would never diagonalize — wrong
            // eigenvalues with no error (r8 review; spec pins the 2x2
            // equal-diagonal case)
            val sign = if (theta >= 0.0) 1.0 else -1.0
            val t = sign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
}
