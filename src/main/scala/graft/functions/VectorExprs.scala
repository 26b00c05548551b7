package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd cosine similarity over two `array<float>` columns.
  *
  * The higher-order-function formulation (VectorFunctions.cosine) is
  * evaluated by the interpreter — three array traversals per row with
  * per-element virtual calls. This expression generates a single fused Java
  * loop (dot + both norms in one pass) inside whole-stage codegen, which is
  * what the ANN/dedup hot paths need when scoring millions of candidate
  * pairs. Zero-norm inputs score 0, matching VectorFunctions.cosine.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** All `nBits` random-hyperplane signs of an `array<float>` vector packed
  * into one long bucket id, in a SINGLE pass over the vector (random-
  * hyperplane LSH, Charikar STOC'02).
  *
  * The column formulation (VectorFunctions.hyperplaneSign × nBits) ran one
  * interpreted `aggregate(zip_with(...))` traversal per bit — nBits passes
  * over a 4096-wide literal per row. Here every plane accumulates in the
  * same fused loop; the plane matrix rides along as a codegen reference
  * object, not a literal. Bit p is set iff the projection onto plane p is
  * >= 0 — bit-identical to the HOF formulation (same planes, same
  * left-to-right accumulation order).
  */
case class LshBucketExpr(child: Expression, nBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  // nBits × MaxDim plane matrix, seeded — identical on driver and executors
  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nBits)(VectorFunctions.planeArray)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), VectorFunctions.MaxDim)
    val acc = new Array[Double](nBits)
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      var p = 0
      while (p < nBits) { acc(p) += x * planes(p)(i); p += 1 }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nBits) {
      if (acc(p) >= 0.0) bucket |= 1L << p
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val x = ctx.freshName("x"); val b = ctx.freshName("b")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), ${VectorFunctions.MaxDim});
         |double[] $acc = new double[$nBits];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  for (int $p = 0; $p < $nBits; $p++) $acc[$p] += $x * $planesRef[$p][$i];
         |}
         |long $b = 0L;
         |for (int $p = 0; $p < $nBits; $p++) if ($acc[$p] >= 0.0) $b |= 1L << $p;
         |${ev.value} = $b;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "lsh_bucket"
}

object VectorExprs {
  /** Codegen'd cosine similarity for `array<float>` columns. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd single-pass random-hyperplane LSH bucket id. */
  def lshBucket(v: Column, nBits: Int): Column =
    ColumnBridge.column(LshBucketExpr(ColumnBridge.expression(v), nBits))
}
