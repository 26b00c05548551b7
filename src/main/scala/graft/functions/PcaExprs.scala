package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Fixed-point Gram/mean accumulator for PCA over an `array<float>`
  * embedding column: one pass, ONE output row — the buffer is
  * `[d, n, sum_1..sum_d, gram_11..gram_dd]` as int64 (leading `d` slot:
  * the dimensionality captured from the first vector), where each row
  * contributes `floor(x_i · 2^s)` and `floor(x_i x_j · 2^s)`. Integer sums
  * are associative and commutative bit-for-bit, so the covariance (and
  * everything derived from it — eigenvectors, projections) is IDENTICAL
  * across partitionings, run order, and cluster sizes; float accumulation
  * would drift in the last bits per shuffle layout (the same determinism
  * argument as Embeddings.centroidsFixedPoint).
  *
  * Exchange shape at 100 TB: partial aggregation reduces each partition to
  * one `(1 + d + d²)`-long buffer (d=64 → ~33 KB) regardless of row count;
  * the merge tree adds vectors elementwise. The d² work per row
  * (4096 multiply-floors at d=64) runs map-side inside the scan.
  */
case class FixedGramAgg(
    child: Expression,
    scaleBits: Int = 20,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  private val scale = math.pow(2.0, scaleBits)

  // buffer layout: [d, n, sum_0..sum_{d-1}, gram_00..gram_{d-1,d-1}];
  // d is captured from the first vector seen (empty marker: length-0)
  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buf.isEmpty) {
      val nb = new Array[Long](2 + d + d * d); nb(0) = d; nb
    } else {
      require(buf(0) == d, s"inconsistent vector length: ${buf(0)} vs $d")
      buf
    }
    val x = new Array[Double](d)
    var i = 0
    while (i < d) { x(i) = arr.getFloat(i).toDouble; i += 1 }
    b(1) += 1
    i = 0
    while (i < d) {
      b(2 + i) += math.floor(x(i) * scale).toLong
      var j = 0
      val off = 2 + d + i * d
      while (j < d) {
        b(off + j) += math.floor(x(i) * x(j) * scale).toLong
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    require(buf(0) == other(0), "inconsistent vector length across partials")
    var i = 1
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  /** struct<d, n, sums array<long>, gram array<long>> (fixed-point). */
  override def eval(buf: Array[Long]): Any = {
    if (buf.isEmpty) return InternalRow(0L, 0L,
      new GenericArrayData(Array.empty[Long]), new GenericArrayData(Array.empty[Long]))
    val d = buf(0).toInt
    InternalRow(buf(0), buf(1),
      new GenericArrayData(buf.slice(2, 2 + d)),
      new GenericArrayData(buf.slice(2 + d, 2 + d + d * d)))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = FixedGramAgg.resultType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): FixedGramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FixedGramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FixedGramAgg =
    copy(child = newChild)
  override def prettyName: String = "fixed_gram"
}

object FixedGramAgg {
  val resultType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("gram", ArrayType(LongType, containsNull = false), nullable = false)))

  def fixedGram(c: Column, scaleBits: Int = 20): Column =
    ColumnBridge.column(
      FixedGramAgg(ColumnBridge.expression(c), scaleBits).toAggregateExpression())
}

/** Project an `array<float>` vector onto a PCA basis:
  * `y_c = basis_c · (x - mean)` for each of the k components, fused into
  * one codegen'd loop per row (the matrix rides the generated class as a
  * reference object — never serialized per row, never shuffled).
  */
case class PcaProjectExpr(child: Expression,
                          mean: Array[Double], basis: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  private def project(arr: ArrayData): GenericArrayData = {
    val d = mean.length
    // array<float> schemas carry no fixed dimension: a shorter vector
    // would read past the row buffer (garbage projections, no error)
    if (arr.numElements() < d)
      throw new IllegalArgumentException(
        s"pca_project: input vector has ${arr.numElements()} dims, " +
          s"model expects $d")
    val centered = new Array[Double](d)
    var i = 0
    while (i < d) { centered(i) = arr.getFloat(i).toDouble - mean(i); i += 1 }
    val out = new Array[Any](basis.length)
    var c = 0
    while (c < basis.length) {
      val b = basis(c)
      var acc = 0.0
      i = 0
      while (i < d) { acc += b(i) * centered(i); i += 1 }
      out(c) = acc.toFloat
      c += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    project(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pcaProj", this, classOf[PcaProjectExpr].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $self.projectPublic($in);")
  }

  def projectPublic(arr: ArrayData): GenericArrayData = project(arr)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pca_project"
}

object PcaProjectExpr {
  def pcaProject(v: Column, mean: Array[Double], basis: Array[Array[Double]]): Column =
    ColumnBridge.column(PcaProjectExpr(ColumnBridge.expression(v), mean, basis))
}
