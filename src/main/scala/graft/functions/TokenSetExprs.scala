package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token profiling for the text-quality family (r15).
  *
  * `tokens(text)` — `filter(split(lower(text), "\\s+"), length > 0)` — and
  * every statistic layered on it (token count, stopword share, mean token
  * length, the per-language stopword scores of langId) ran through
  * higher-order array functions whose lambdas evaluate INTERPRETED per
  * element: one boxed closure dispatch per token per statistic, after the
  * regex split materialized the full token array. On the streaming quality
  * gate that interpreted tail was the measured per-document ceiling — the
  * same failure shape as the bloom-probe `exists()` fixed earlier this
  * round (see Streams.crossNearDedupStream).
  *
  * [[TokenProfileExpr]] computes the whole profile in ONE generated call
  * per row over the lowered text's UTF-8 bytes — no token array, no
  * per-token closures: token boundaries are `\s` runs (Java regex `\s` is
  * exactly [ \t\n\x0B\f\r], all ASCII, so a byte scan is UTF-8-safe),
  * token length is the code-point count (bytes not matching 10xxxxxx —
  * `length()`'s numChars semantics), and set membership compares the
  * token's byte slice against each word's UTF-8 bytes (length-gated
  * linear scan; stopword sets are ≤ tens of entries by nature). The text
  * lowers once via UTF8String.toLowerCase — bit-identical to `lower()`,
  * so every statistic matches its higher-order formulation EXACTLY and
  * the DuckDB oracles replaying `list_filter(string_split_regex(...))`
  * are untouched (PropertySpec pins the equivalence on adversarial
  * whitespace/unicode inputs).
  */
final class TokenSets(setsIn: Array[Array[String]]) extends Serializable {
  private val sets: Array[Array[Array[Byte]]] =
    setsIn.map(_.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  val nSets: Int = sets.length

  @inline private def isWs(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == 0x0B.toByte || b == '\f'.toByte || b == '\r'.toByte

  @inline private def inSet(set: Array[Array[Byte]], b: Array[Byte],
                            start: Int, end: Int): Boolean = {
    val len = end - start
    var k = 0
    while (k < set.length) {
      val w = set(k)
      if (w.length == len) {
        var j = 0
        while (j < len && w(j) == b(start + j)) j += 1
        if (j == len) return true
      }
      k += 1
    }
    false
  }

  /** struct(n_toks, sum_len, hits[nSets]) over the LOWERED text. */
  def profile(lowered: UTF8String): InternalRow = {
    val b = lowered.getBytes
    val n = b.length
    var nToks = 0L
    var sumLen = 0L
    val hits = new Array[Long](nSets)
    var i = 0
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(b(i))) i += 1
        nToks += 1
        var j = start
        while (j < i) { if ((b(j) & 0xC0) != 0x80) sumLen += 1; j += 1 }
        var s = 0
        while (s < nSets) {
          if (inSet(sets(s), b, start, i)) hits(s) += 1
          s += 1
        }
      }
    }
    InternalRow(nToks, sumLen, new GenericArrayData(hits))
  }
}

/** `struct<n_toks, sum_len, hits array<bigint>>` for one document — see
  * [[TokenSets]].
  */
case class TokenProfileExpr(child: Expression, sets: TokenSets)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("hits", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_profile needs string, got $other")
    }

  override def nullSafeEval(text: Any): Any =
    sets.profile(text.asInstanceOf[UTF8String].toLowerCase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("tokenSets", sets,
      classOf[TokenSets].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $setsRef.profile($t.toLowerCase());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "token_profile"
}

object TokenSetExprs {
  /** struct(n_toks, sum_len, hits) column; `wordSets` order keys `hits`. */
  def tokenProfile(text: Column, wordSets: Seq[Seq[String]]): Column =
    ColumnBridge.column(TokenProfileExpr(ColumnBridge.expression(text),
      new TokenSets(wordSets.map(_.toArray).toArray)))
}
