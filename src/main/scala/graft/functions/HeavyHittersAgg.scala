package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst
  * `TypedImperativeAggregate`: one pass, fixed memory (`capacity`
  * counters), map-side partial aggregation, mergeable partials — the
  * sketch shape that finds frequent tokens in a 100 TB corpus with a
  * single bounded exchange (each partition ships ≤ `capacity` counters,
  * never its token stream).
  *
  * Guarantees (the classic FREQUENT bounds, preserved under the merge rule
  * of Agarwal et al., "Mergeable Summaries", PODS'12): for every item with
  * true frequency f, the sketch estimate c satisfies
  * `f - N/(capacity+1) <= c <= f` over N total rows — so every item with
  * `f > N/(capacity+1)` is guaranteed present in the output. Pick
  * `capacity` a few times larger than the downstream threshold ratio and
  * the sketch is a certain superset of the true heavy hitters; an exact
  * recount of the (bounded) candidate set then removes the approximation
  * entirely (see CurationQueries d_heavy_hitters — exact answers from a
  * sketch-bounded two-pass plan).
  *
  * Update is amortized O(1): the decrement-all step pays back one earlier
  * increment per decrement. Merge adds counts, then applies the PODS'12
  * rule — subtract the (capacity+1)-th largest combined count from every
  * counter and drop the non-positive ones.
  *
  * Reference lineage: the reference profiles value frequencies per column
  * in its analyzer (`analyzer/` stats workers); this is the bounded-memory
  * form of that profile for unbounded cardinality.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, "misra_gries capacity must be positive")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key, 1L)
        case None => // decrement-all (amortized against prior increments)
          // iterate a SNAPSHOT: scala 2.13 mutable.HashMap corrupts its
          // own iteration when values are updated mid-iteration (verified
          // empirically — keys get skipped), so mutating inside
          // keysIterator silently under-decrements
          buf.toArray.foreach { case (k, c) =>
            if (c - 1 <= 0) buf.remove(k) else buf.update(k, c - 1)
          }
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      // (capacity+1)-th largest count; subtract it everywhere, drop <= 0
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (capacity + 1))
      // snapshot before mutating — see the update() comment
      buf.toArray.foreach { case (k, c) =>
        if (c - cut <= 0) buf.remove(k) else buf.update(k, c - cut)
      }
    }
    buf
  }

  /** array<struct<item,est>> sorted by (est desc, item asc) — deterministic
    * render of the surviving counters.
    */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (k, c) => (-c, k) }.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      val k = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      buf.update(k, in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = MisraGriesAgg.resultType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries needs a STRING column, got $other")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  /** Column API: `misraGries(col, 800)` → array<struct<item,est>>. */
  def misraGries(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), capacity).toAggregateExpression())
}
