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
  // the bucket is one 64-bit word of sign bits; nBits > 64 would silently
  // alias planes through the shift's mod-64 wrap (two planes ORing into
  // one bit -> corrupted buckets), nBits <= 0 a constant bucket (the
  // downstream self-join degenerates to a cross join)
  require(nBits >= 1 && nBits <= 64,
    s"lsh_bucket: nBits must be in [1, 64], got $nBits")

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

/** All centroid ids of a coarse quantizer ordered by squared-L2 distance
  * from an `array<float>` vector, in ONE codegen pass (every centroid
  * accumulates in the same loop over the vector; ties order by centroid id
  * — identical to `array_sort(array(struct(l2Sq(v, c_i), i)))`, which
  * evaluated one interpreted aggregate(zip_with) traversal per centroid).
  * The IVF cell-assignment/probe primitive (Similarity.ivfBuild/ivfQuery).
  */
case class NearestCellsExpr(child: Expression, centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val cs: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  private def rank(dist: Array[Double]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val k = dist.length
    val idx = Array.range(0, k)
    // stable insertion sort: equal distances keep ascending centroid id
    var i = 1
    while (i < k) {
      val d = dist(idx(i)); val v = idx(i)
      var j = i - 1
      while (j >= 0 && dist(idx(j)) > d) { idx(j + 1) = idx(j); j -= 1 }
      idx(j + 1) = v
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(idx)
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val k = cs.length
    val dist = new Array[Double](k)
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = a.getFloat(i).toDouble
      var j = 0
      while (j < k) {
        if (i < cs(j).length) { val d = x - cs(j)(i); dist(j) += d * d }
        j += 1
      }
      i += 1
    }
    rank(dist)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val csRef = ctx.addReferenceObj("centroids", cs, "double[][]")
    val self = ctx.addReferenceObj("expr", this, classOf[NearestCellsExpr].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val dist = ctx.freshName("dist"); val x = ctx.freshName("x")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |int $k = $csRef.length;
         |double[] $dist = new double[$k];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    if ($i < $csRef[$j].length) {
         |      double $d = $x - $csRef[$j][$i];
         |      $dist[$j] += $d * $d;
         |    }
         |  }
         |}
         |${ev.value} = $self.rankPublic($dist);
       """.stripMargin
    })
  }

  /** codegen entry point for the ranking tail */
  def rankPublic(dist: Array[Double]): org.apache.spark.sql.catalyst.util.GenericArrayData =
    rank(dist)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nearest_cells"
}

/** Scalar-quantize an `array<float>` vector to int8 codes (one byte per
  * dimension, symmetric: code_i = round(v_i / scale) with scale =
  * maxAbs/127) — the faiss-SQ8 memory layout. 4× smaller than float32 in
  * memory AND on the wire, which is what lets a 100 TB embedding corpus'
  * candidate scoring stay in RAM. Cosine over the codes needs no scale at
  * all (it cancels), see [[Sq8CosineExpr]]; keep the float vectors around
  * only for the final exact re-rank of the few survivors.
  */
case class Sq8EncodeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    Sq8EncodeExpr.encode(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.Sq8EncodeExpr.encode($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sq8_encode"
}

object Sq8EncodeExpr {
  /** shared by interpreted eval and generated code */
  def encode(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    var maxAbs = 0.0f
    var i = 0
    while (i < n) {
      val x = math.abs(a.getFloat(i))
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = if (maxAbs == 0.0f) 1.0f else maxAbs / 127.0f
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      val q = math.round(a.getFloat(i) / scale)
      out(i) = math.max(-127, math.min(127, q)).toByte
      i += 1
    }
    out
  }
}

/** Cosine similarity over two int8 code arrays in one fused integer loop.
  * The per-vector quantization scales cancel in the cosine, so the codes
  * alone suffice: cos ≈ Σ(a_i·b_i) / (√Σa_i² · √Σb_i²) — integer
  * multiply-adds until the final three doubles, ~4× less memory traffic
  * than the float loop. Zero-norm codes score 0 like CosineSimExpr.
  */
case class Sq8CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    val n = math.min(a.length, b.length)
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = a(i).toLong; val y = b(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $dot = 0L, $na = 0L, $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = (long) $a[$i]; long $y = (long) $b[$i];
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : (double) $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sq8_cosine"
}

object VectorExprs {
  /** Codegen'd cosine similarity for `array<float>` columns. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd int8 scalar quantization of an `array<float>` vector. */
  def sq8Encode(v: Column): Column =
    ColumnBridge.column(Sq8EncodeExpr(ColumnBridge.expression(v)))

  /** Codegen'd cosine over int8 code arrays (scales cancel). */
  def sq8Cosine(a: Column, b: Column): Column =
    ColumnBridge.column(
      Sq8CosineExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd single-pass random-hyperplane LSH bucket id. */
  def lshBucket(v: Column, nBits: Int): Column =
    ColumnBridge.column(LshBucketExpr(ColumnBridge.expression(v), nBits))

  /** Codegen'd single-pass centroid ranking (IVF assignment/probe). */
  def nearestCells(v: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCellsExpr(ColumnBridge.expression(v), centroids))
}
