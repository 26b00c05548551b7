package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained linear quality-scorer model: token → integer per-mille weight
  * (the pruned top-K of `Corpus.qualityModelTrain`'s closed-form weights).
  * All-integer by construction, so any engine replays the scoring decision
  * bit-exactly — the margin discipline the oracle gate requires (no logs,
  * no floats anywhere in train or apply).
  *
  * Same deployment shape as [[BpeModel]]: a plain serializable value built
  * once offline, shipped inside the expression tree as a codegen reference
  * object — broadcast with the task binaries, never re-read per row. This
  * is the fastText-style apply path: the (big) corpus never shuffles to
  * score; each row pays one hash-map lookup per token.
  */
final case class QualityModel(weights: IndexedSeq[(String, Long)])
    extends Serializable {
  @transient lazy val byToken: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](weights.size * 2)
    weights.foreach { case (t, w) => m.put(t, w) }
    m
  }
}

/** Per-row linear scoring — pure JVM compute invoked from whole-stage
  * codegen (the generated code calls [[score]] directly, like BpeCompute,
  * so the expression never breaks a codegen span).
  */
object QualityModelCompute {
  private val Ws = Pattern.compile("\\s+")

  /** Dot product of the document's token occurrence counts with the model
    * weights: lowercased whitespace tokens (parity with
    * `TextFunctions.tokens`), out-of-model tokens contribute 0 (the
    * pruned-vocabulary convention).
    */
  def score(input: UTF8String, model: QualityModel): Long = {
    val words = Ws.split(input.toLowerCase.toString, -1)
    val w = model.byToken
    var s = 0L
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val v = w.get(words(i))
        if (v != null) s += v.longValue()
      }
      i += 1
    }
    s
  }
}

/** LONG linear quality score of a text column, one fused per-row pass
  * inside whole-stage codegen; the trained model rides the expression as
  * a codegen reference object.
  */
case class QualityModelScoreExpr(child: Expression, model: QualityModel)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    QualityModelCompute.score(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("qualityModel", model,
      classOf[QualityModel].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.QualityModelCompute$$.MODULE$$" +
        s".score($in, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "quality_model_score"
}

/** HASHED-feature linear model: weights live in a dense array indexed by
  * `xxhash64(token) pmod buckets` — the DSIR paper's hashed design, where
  * model memory is FIXED by the bucket count no matter how large the
  * corpus vocabulary grows (the 100 TB deployment shape; the string-keyed
  * [[QualityModel]] stays the exact, oracle-replayable face). Seed 42
  * matches Spark's `xxhash64` SQL function, so train-side bucketing
  * (`pmod(xxhash64(token), buckets)`) and this scorer agree bit-exactly.
  */
final case class HashedQualityModel(weights: Array[Long]) extends Serializable

object HashedQualityModelCompute {
  private val Ws = Pattern.compile("\\s+")

  /** Sum of bucket weights over the document's token occurrences —
    * tokenization parity with [[QualityModelCompute.score]].
    */
  def score(input: UTF8String, model: HashedQualityModel): Long = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    val words = Ws.split(input.toLowerCase.toString, -1)
    val arr = model.weights
    val b = arr.length.toLong
    var s = 0L
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val h = XxHash64Function.hash(
          UTF8String.fromString(words(i)), StringType, 42L)
        s += arr((((h % b) + b) % b).toInt)
      }
      i += 1
    }
    s
  }
}

/** LONG hashed-bucket linear score of a text column — same fused codegen
  * shape as [[QualityModelScoreExpr]], with the dense weight array riding
  * the expression as a codegen reference object.
  */
case class HashedModelScoreExpr(child: Expression, model: HashedQualityModel)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashedQualityModelCompute.score(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("hashedModel", model,
      classOf[HashedQualityModel].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.HashedQualityModelCompute$$.MODULE$$" +
        s".score($in, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hashed_model_score"
}

/** Column API for the trained quality scorer. */
object QualityModelFns {
  def score(text: Column, model: QualityModel): Column =
    ColumnBridge.column(QualityModelScoreExpr(ColumnBridge.expression(text), model))

  def scoreHashed(text: Column, model: HashedQualityModel): Column =
    ColumnBridge.column(HashedModelScoreExpr(ColumnBridge.expression(text), model))
}
