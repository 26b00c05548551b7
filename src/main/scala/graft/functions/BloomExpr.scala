package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a BROADCAST Bloom filter — the probe-side predicate
  * of [[graft.operators.BloomJoin]]. Holding the `Broadcast` handle (not the
  * filter bytes) keeps the serialized plan small: executors fetch the filter
  * once via the torrent broadcast and the generated code caches the
  * dereferenced instance per task, so the per-row cost is two hash
  * multiplications against an in-memory bitset.
  *
  * Supports LONG keys (`mightContainLong`) and STRING keys
  * (`mightContainString` over the UTF-8 bytes) — matching what
  * `DataFrameStatFunctions.bloomFilter` inserts for those column types.
  */
case class BloomMightContainExpr(child: Expression, bf: Broadcast[BloomFilter])
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain needs a BIGINT or STRING key, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType   => bf.value.mightContainLong(input.asInstanceOf[Long])
    case StringType => bf.value.mightContainBinary(
      input.asInstanceOf[UTF8String].getBytes)
    case _ => throw new IllegalStateException("unreachable: checked input type")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val bRef = ctx.addReferenceObj("bloomBroadcast", bf,
      classOf[Broadcast[_]].getName)
    // dereference the broadcast once per generated-class instance (per task)
    val bloom = ctx.addMutableState(bfClass, "bloom",
      v => s"$v = ($bfClass) $bRef.value();", forceInline = true)
    child.dataType match {
      case LongType =>
        nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $bloom.mightContainLong($in);")
      case _ =>
        nullSafeCodeGen(ctx, ev, in =>
          s"${ev.value} = $bloom.mightContainBinary($in.getBytes());")
    }
  }

  override def dataType: DataType = BooleanType

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

/** `might_contain` over EVERY element of a `array<bigint>` key column in
  * one generated call — true when ANY key might be in the filter. The
  * loop runs in plain JVM code against the task-cached filter instance,
  * replacing the `exists(keys, k -> might_contain(k))` higher-order
  * formulation whose per-element lambda evaluates INTERPRETED (boxed
  * key, closure dispatch per element): on the streaming near-dup gate
  * that interpreted probe was the measured per-batch ceiling
  * (GateProfile r15: 2.6 s vs 0.5 s per 6250-doc single-task batch).
  */
case class BloomAnyExpr(child: Expression, bf: Broadcast[BloomFilter])
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_any needs array<bigint> keys, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val filter = bf.value
    var i = 0
    var hit = false
    val n = arr.numElements()
    while (!hit && i < n) {
      if (!arr.isNullAt(i) && filter.mightContainLong(arr.getLong(i))) hit = true
      i += 1
    }
    hit
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val bRef = ctx.addReferenceObj("bloomBroadcast", bf,
      classOf[Broadcast[_]].getName)
    val bloom = ctx.addMutableState(bfClass, "bloomAny",
      v => s"$v = ($bfClass) $bRef.value();", forceInline = true)
    nullSafeCodeGen(ctx, ev, in => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $in.numElements();
         |for (int $i = 0; !${ev.value} && $i < $n; $i++) {
         |  if (!$in.isNullAt($i) && $bloom.mightContainLong($in.getLong($i))) {
         |    ${ev.value} = true;
         |  }
         |}
       """.stripMargin
    })
  }

  override def dataType: DataType = BooleanType

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_any"
}

object BloomExpr {
  def mightContain(key: Column, bf: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomMightContainExpr(ColumnBridge.expression(key), bf))

  def mightContainAny(keys: Column, bf: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomAnyExpr(ColumnBridge.expression(keys), bf))
}
