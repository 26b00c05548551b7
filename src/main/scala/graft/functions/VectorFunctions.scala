package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns using Spark's
  * higher-order functions — everything stays inside codegen'd expressions,
  * no UDFs, so it runs distributed over any partitioning at 100 TB the same
  * way it runs locally.
  */
object VectorFunctions {

  /** Dot product of two equal-length float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** Euclidean (L2) norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0d, lit(0.0d)).otherwise(dot(a, b) / denom)
  }

  /** Squared L2 distance (cheaper than sqrt for nearest-neighbor ranking). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)

  /** Deterministic random hyperplanes, generated driver-side once and
    * shipped as literal arrays (seeded — identical on every run and every
    * executor). Far cheaper than deriving components from hashes inside the
    * expression: the projection is then pure multiply-add per element.
    */
  private[functions] val MaxDim = 4096
  private[functions] def planeArray(p: Int): Array[Double] = {
    val rnd = new scala.util.Random(0x5eedL + p)
    Array.fill(MaxDim)(rnd.nextDouble() * 2 - 1)
  }

  /** Sign bit of `v`'s projection onto deterministic random hyperplane `p`:
    * random-hyperplane LSH (Charikar, STOC'02): sum_i v[i]*plane_p[i] >= 0.
    * Kept as the readable reference formulation (and parity oracle in
    * VectorExprsSpec); hot paths use the fused [[LshBucketExpr]] instead.
    */
  def hyperplaneSign(v: Column, p: Int): Column = {
    val planeLit = typedLit(planeArray(p).toSeq)
    val proj = aggregate(zip_with(v, slice(planeLit, lit(1), size(v)), (x, w) => x * w),
      lit(0.0d), (acc, x) => acc + x)
    when(proj >= 0.0d, lit(1)).otherwise(lit(0))
  }

  /** Pack `nBits` hyperplane signs into one long bucket id. Vectors with
    * equal bucket ids are likely cosine-similar; used to bound ANN candidate
    * sets (SURVEY.md §2e scale path). One fused codegen pass over the
    * vector — all planes accumulate in the same loop (VectorExprs.lshBucket).
    */
  def lshBucket(v: Column, nBits: Int): Column =
    VectorExprs.lshBucket(v, nBits)
}
