package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a shingle-hash array: `nHashes` permutation minima
  * in one fused loop.
  *
  * The expression-tree formulation (transform over a 0..63 sequence, each
  * re-hashing every element) costs nHashes × |shingles| interpreted
  * expression evaluations per row. Here the rehash is an inlined
  * SplitMix64-style finalizer over (hash ^ seed_i), so the generated code is
  * a tight two-level loop with no allocation beyond the output array.
  */
case class MinHashSigExpr(child: Expression, nHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](nHashes)
    var i = 0
    while (i < nHashes) {
      val seed = MinHashSigExpr.seed(i)
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val m = MinHashSigExpr.mix(a.getLong(j) ^ seed)
        if (m < best) best = m
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val seed = ctx.freshName("seed"); val best = ctx.freshName("best")
      val z = ctx.freshName("z")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$nHashes];
         |for (int $i = 0; $i < $nHashes; $i++) {
         |  long $seed = ($i + 1L) * -7046029254386353131L;
         |  long $best = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $z = $a.getLong($j) ^ $seed;
         |    $z = ($z ^ ($z >>> 30)) * -4658895280553007687L;
         |    $z = ($z ^ ($z >>> 27)) * -7723592293110705685L;
         |    $z = $z ^ ($z >>> 31);
         |    if ($z < $best) $best = $z;
         |  }
         |  $out[$i] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSigExpr {
  // SplitMix64 finalizer — matches the constants in doGenCode
  private[functions] def seed(i: Int): Long = (i + 1L) * -7046029254386353131L
  private[functions] def mix(v: Long): Long = {
    var z = v
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^ (z >>> 31)
  }
}

/** Fraction of positions where two equal-length signature arrays agree —
  * the MinHash Jaccard estimate for a candidate pair, in one codegen'd
  * loop (the `size(filter(zip_with(...)))` formulation runs three
  * interpreted array passes per scored pair).
  */
case class SigAgreeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.DoubleType

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |}
         |${ev.value} = ($n == 0) ? 0.0 : ((double) $eq) / $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sig_agree"
}

object MinHashExpr {
  def minhashSignature(shingleHashes: Column, nHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(shingleHashes), nHashes))

  /** Codegen'd fraction-of-agreeing-positions (MinHash Jaccard estimate). */
  def sigAgree(a: Column, b: Column): Column =
    ColumnBridge.column(SigAgreeExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
