package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer model: learned merge rules, rank-ordered
  * (rank 0 = first/most-frequent merge). Applying the model segments each
  * whitespace word into sub-word units by replaying merges greedily in rank
  * order — the standard BPE encode (Sennrich, Haddow & Birch, ACL'16).
  *
  * Symbol convention: a word's initial symbols are its code points, plus a
  * terminal `</w>` marker symbol, so merges distinguish word-final from
  * word-internal contexts ("est" vs "est</w>").
  *
  * The model is a plain serializable value: built once (driver side, see
  * `Corpus.bpeTrain`), shipped inside the expression tree, shared by every
  * task via the expression's reference objects — never re-read per row.
  */
final case class BpeModel(merges: IndexedSeq[(String, String)])
    extends Serializable {
  /** (left + " " + right) → rank, for O(1) best-pair lookup during encode.
    * A space separator cannot collide: symbols are built from
    * whitespace-SPLIT tokens (plus `</w>`), so no symbol contains a space.
    */
  @transient lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var i = 0
    while (i < merges.size) {
      val (l, r) = merges(i)
      m.put(l + BpeCompute.Sep + r, i)
      i += 1
    }
    m
  }
}

/** Per-row BPE encode — pure JVM compute invoked from whole-stage codegen
  * (the generated code calls [[encode]] directly, like the ShingleHash
  * family, so the expression never breaks a codegen span).
  */
object BpeCompute {
  private[functions] val Sep = " "
  private val Ws = Pattern.compile("\\s+")
  val EndOfWord = "</w>"

  /** Symbols of one word: code points + terminal marker. */
  def wordSymbols(word: String): Array[String] = {
    val cps = word.codePoints().toArray
    val out = new Array[String](cps.length + 1)
    var i = 0
    while (i < cps.length) {
      out(i) = new String(Character.toChars(cps(i)))
      i += 1
    }
    out(cps.length) = EndOfWord
    out
  }

  /** Greedy merge replay on one word's symbol buffer: repeatedly merge the
    * adjacent pair with the LOWEST rank until no adjacent pair is in the
    * model. Mutates and returns a fresh buffer; O(len²·lookup) worst case,
    * fine for natural-language word lengths.
    */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = wordSymbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + Sep + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val next = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, next, 0, bestAt)
        next(bestAt) = syms(bestAt) + syms(bestAt + 1)
        System.arraycopy(syms, bestAt + 2, next, bestAt + 1,
          syms.length - bestAt - 2)
        syms = next
      }
    }
    syms
  }

  /** Whole-text encode: lowercased whitespace words (parity with
    * `TextFunctions.tokens`), each word replayed through the model;
    * sub-word units concatenated in document order.
    */
  def encode(input: UTF8String, model: BpeModel): GenericArrayData = {
    val words = Ws.split(input.toLowerCase.toString, -1)
    val out = new java.util.ArrayList[AnyRef](words.length * 2)
    val ranks = model.ranks
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) {
        val syms = encodeWord(words(w), ranks)
        var i = 0
        while (i < syms.length) {
          out.add(UTF8String.fromString(syms(i)))
          i += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `array<string>` of BPE sub-word units of a text column, one fused
  * per-row pass inside whole-stage codegen. The learned model rides the
  * expression as a codegen reference object — broadcast with the task
  * binaries, no per-row cost.
  */
case class BpeEncodeExpr(child: Expression, model: BpeModel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BpeCompute.encode(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model,
      classOf[BpeModel].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.BpeCompute$$.MODULE$$.encode($in, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

/** Column API for BPE encode. */
object Bpe {
  def encode(text: Column, model: BpeModel): Column =
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(text), model))
}
