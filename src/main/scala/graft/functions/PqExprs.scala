package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) for the ANN family (SURVEY.md §2e).
  *
  * A vector is split into `m` contiguous subvectors; each subvector is
  * replaced by the id of its nearest centroid in that subspace's codebook
  * (`ksub` centroids). A 64-dim float32 vector becomes `m` bytes — 32×
  * smaller at m=8 — which is the layout that lets a 100 TB embedding corpus'
  * candidate scan stay in RAM where SQ8's 4× cannot.
  *
  * Scoring is asymmetric (ADC): the query stays un-quantized; per query one
  * small lookup table of query·centroid dot products is computed ONCE
  * ([[PqLutExpr]]), after which each candidate costs `m` table lookups and
  * adds ([[PqAdcExpr]]) instead of `dim` multiply-adds. Centroid norms are
  * index-level constants, so the approximate cosine is
  * Σ_m lut[m][code] / (|q| · sqrt(Σ_m |c_m|²)).
  *
  * All three expressions share static helpers between interpreted eval and
  * generated code (the [[Sq8EncodeExpr]] pattern) — one virtual call per
  * row, inside whole-stage codegen.
  */
object PqExprs {

  /** codes[mi] = argmin_c ‖v[mi·sub .. ) − books[mi][c]‖² (ties → lowest c).
    * Elements past the vector's length read as 0 — encode and LUT agree. */
  def encode(a: ArrayData, books: Array[Array[Array[Double]]]): Array[Byte] = {
    val m = books.length
    val n = a.numElements()
    val out = new Array[Byte](m)
    var mi = 0
    var base = 0
    while (mi < m) {
      val book = books(mi)
      val sub = if (book.length > 0) book(0).length else 0
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d2 = 0.0
        var j = 0
        while (j < sub) {
          val p = base + j
          val x = if (p < n) a.getFloat(p).toDouble else 0.0
          val d = x - cent(j)
          d2 += d * d
          j += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(mi) = best.toByte
      base += sub
      mi += 1
    }
    out
  }

  /** Flat table of length m·ksub + 1: slot mi·ksub + c holds
    * q_sub(mi)·books[mi][c]; the last slot holds |q| (over the FULL vector). */
  def lut(a: ArrayData, books: Array[Array[Array[Double]]], ksub: Int): GenericArrayData = {
    val m = books.length
    val n = a.numElements()
    val out = new Array[Double](m * ksub + 1)
    var mi = 0
    var base = 0
    while (mi < m) {
      val book = books(mi)
      val sub = if (book.length > 0) book(0).length else 0
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dot = 0.0
        var j = 0
        while (j < sub) {
          val p = base + j
          if (p < n) dot += a.getFloat(p).toDouble * cent(j)
          j += 1
        }
        out(mi * ksub + c) = dot
        c += 1
      }
      base += sub
      mi += 1
    }
    var norm = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; norm += x * x; i += 1 }
    out(m * ksub) = math.sqrt(norm)
    new GenericArrayData(out)
  }

  /** ADC approximate cosine: m lookups + adds, three doubles at the end. */
  def adc(lut: ArrayData, codes: Array[Byte], normSq: Array[Double], ksub: Int): Double = {
    val m = codes.length
    var dot = 0.0
    var cn = 0.0
    var mi = 0
    while (mi < m) {
      val slot = mi * ksub + (codes(mi) & 0xff)
      dot += lut.getDouble(slot)
      cn += normSq(slot)
      mi += 1
    }
    val denom = lut.getDouble(m * ksub) * math.sqrt(cn)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

/** PQ-encode an `array<float>` vector to `m` one-byte centroid ids. */
case class PqEncodeExpr(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = BinaryType

  @transient private lazy val bk: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(input: Any): Any =
    PqExprs.encode(input.asInstanceOf[ArrayData], bk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", bk, "double[][][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.PqExprs.encode($a, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** Per-query ADC lookup table (computed once per query row, not per pair). */
case class PqLutExpr(child: Expression, books: Seq[Seq[Seq[Double]]], ksub: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val bk: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(input: Any): Any =
    PqExprs.lut(input.asInstanceOf[ArrayData], bk, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", bk, "double[][][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.PqExprs.lut($a, $ref, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_lut"
}

/** Approximate cosine from a query LUT and a candidate's PQ codes. */
case class PqAdcExpr(left: Expression, right: Expression,
                     normSq: Seq[Double], ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  @transient private lazy val ns: Array[Double] = normSq.toArray

  override def nullSafeEval(l: Any, r: Any): Any =
    PqExprs.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[Array[Byte]], ns, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normSq", ns, "double[]")
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.PqExprs.adc($l, $r, $ref, $ksub)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}
