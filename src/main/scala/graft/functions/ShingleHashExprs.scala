package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text → hash-array expressions: the map-side "hash before you
  * shuffle" primitives for the dedup / contamination / repetition family.
  *
  * The higher-order-function pipelines they replace
  * (`hashArray(shinglesFromTokens(tokens(text), k))` etc.) had two costs at
  * scale: the interpreted per-element lambda evaluation, and — because the
  * token/shingle arrays had to be materialized as columns to avoid
  * CollapseProject re-evaluation — a first exchange that shipped the whole
  * tokenized corpus. Each expression here runs tokenize→shingle→hash as ONE
  * fused per-row pass inside whole-stage codegen, so the only thing that
  * ever crosses the wire is `(id, array<long>)`.
  *
  * Hash parity: every shingle/gram string is hashed with Spark's own XXH64
  * (seed 42), byte-identical to `functions.xxhash64`, so results match the
  * previous formulation bit-for-bit and the string-based DuckDB oracles
  * keep matching (a 64-bit collision cannot move a count or a Jaccard
  * across a threshold).
  *
  * Reference lineage: the reference dedups/fingerprints documents in its
  * analyzer pipeline one record at a time; these expressions are that
  * per-record pass, made distributable.
  */
private[graft] object ShingleHashCompute {
  private val Ws = Pattern.compile("\\s+")

  private def xx(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L).asInstanceOf[Long]

  /** Lowercased whitespace tokens, empties dropped — parity with
    * `TextFunctions.tokens`.
    */
  private def toks(input: UTF8String): Array[String] =
    Ws.split(input.toLowerCase.toString, -1).filter(_.nonEmpty)

  /** Hashes of word k-shingles.
    *
    * `distinct = true` mirrors `shinglesFromTokens` (array_distinct, and a
    * sub-k document yields its full token string as the only shingle —
    * including the empty string for an all-whitespace document).
    * `distinct = false` mirrors the no-dedup token/bigram builders: exactly
    * `max(n - k + 1, 0)` shingles, duplicates kept in order.
    */
  def wordShingleHashes(input: UTF8String, k: Int, distinct: Boolean,
                        sorted: Boolean): GenericArrayData = {
    val t = toks(input)
    val out: Array[Long] =
      if (distinct) {
        val n = math.max(t.length - k, 0) + 1
        val seen = new java.util.LinkedHashSet[java.lang.Long](n)
        var i = 0
        while (i < n) {
          val sb = new java.lang.StringBuilder
          var j = i
          val end = math.min(i + k, t.length)
          while (j < end) {
            if (j > i) sb.append(' ')
            sb.append(t(j))
            j += 1
          }
          seen.add(xx(sb.toString))
          i += 1
        }
        val arr = new Array[Long](seen.size)
        val it = seen.iterator()
        var p = 0
        while (it.hasNext) { arr(p) = it.next(); p += 1 }
        arr
      } else {
        val n = math.max(t.length - k + 1, 0)
        val arr = new Array[Long](n)
        var i = 0
        while (i < n) {
          if (k == 1) arr(i) = xx(t(i))
          else {
            val sb = new java.lang.StringBuilder
            var j = i
            while (j < i + k) {
              if (j > i) sb.append(' ')
              sb.append(t(j))
              j += 1
            }
            arr(i) = xx(sb.toString)
          }
          i += 1
        }
        arr
      }
    if (sorted) java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** Word n-gram TEXTS (space-joined, duplicates kept in position order) —
    * the string companion of [[wordShingleHashes]]'s `distinct = false`
    * mode, for operators that must RENDER grams (heavy-hitter reports):
    * `xx(gramTexts(t, n)(i)) == wordShingleHashes(t, n, false, false)(i)`
    * by construction, so a hash-phase can recover its texts exactly.
    */
  def wordNgramTexts(input: UTF8String, n: Int): GenericArrayData = {
    val t = toks(input)
    val count = math.max(t.length - n + 1, 0)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      if (n == 1) out(i) = UTF8String.fromString(t(i))
      else {
        val sb = new java.lang.StringBuilder
        var j = i
        while (j < i + n) {
          if (j > i) sb.append(' ')
          sb.append(t(j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted distinct hashes of character n-grams over the normalized
    * (lowercased, whitespace-squeezed) text — parity with
    * `array_sort(hashArray(ngramsFromNormalized(normalizeWs(text), n)))`,
    * counting positions in code points like Spark's `substr`.
    */
  def ngramHashes(input: UTF8String, n: Int): GenericArrayData = {
    val norm = Ws.matcher(input.toLowerCase.toString).replaceAll(" ")
    val cps = norm.codePoints().toArray
    val len = cps.length
    val count = math.max(len - (n - 1), 1)
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    var i = 0
    while (i < count) {
      val gl = math.min(n, len - i)
      val gram = if (gl <= 0) "" else new String(cps, i, gl)
      seen.add(xx(gram))
      i += 1
    }
    val arr = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }
}

/** `array<long>` of word k-shingle hashes of a text column — one fused
  * per-row pass (see [[ShingleHashCompute]]).
  */
case class WordShingleHashExpr(child: Expression, k: Int, distinct: Boolean,
                               sorted: Boolean) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashCompute.wordShingleHashes(
      input.asInstanceOf[UTF8String], k, distinct, sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the heavy lifting is a single static-ish call per row; generating the
    // tokenizer inline would only duplicate library code inside codegen
    val obj = "graft.functions.ShingleHashCompute"
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $obj$$.MODULE$$.wordShingleHashes($in, $k, $distinct, $sorted);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_hashes"
}

/** `array<string>` of word n-gram texts, duplicates kept in position order —
  * one fused per-row pass (see [[ShingleHashCompute.wordNgramTexts]]).
  */
case class WordNgramTextExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashCompute.wordNgramTexts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = "graft.functions.ShingleHashCompute"
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $obj$$.MODULE$$.wordNgramTexts($in, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_ngram_texts"
}

/** Sorted distinct `array<long>` of char n-gram hashes of normalized text. */
case class NGramHashExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashCompute.ngramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = "graft.functions.ShingleHashCompute"
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $obj$$.MODULE$$.ngramHashes($in, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ngram_hashes"
}

/** Column API for the fused text-hash expressions. */
object ShingleHash {
  /** xxhash64 per lowercased whitespace token, duplicates kept in order —
    * parity with `hashArray(tokens(text))` (SimHash's input).
    */
  def tokenHashes(text: Column): Column =
    ColumnBridge.column(WordShingleHashExpr(
      ColumnBridge.expression(text), 1, distinct = false, sorted = false))

  /** xxhash64 per word bigram, duplicates kept — repetition metrics. */
  def bigramHashes(text: Column): Column =
    ColumnBridge.column(WordShingleHashExpr(
      ColumnBridge.expression(text), 2, distinct = false, sorted = false))

  /** xxhash64 per word k-shingle with duplicates kept in position order —
    * exactly `max(tokens - k + 1, 0)` entries, one per span start. The input
    * for span-coverage metrics (duplicated-substring detection), where every
    * POSITION matters, unlike the distinct-set builders above.
    */
  def positionShingleHashes(text: Column, k: Int): Column =
    ColumnBridge.column(WordShingleHashExpr(
      ColumnBridge.expression(text), k, distinct = false, sorted = false))

  /** xxhash64 per distinct word k-shingle — MinHash / contamination input;
    * parity with `hashArray(shinglesFromTokens(tokens(text), k))`.
    */
  def wordShingleHashes(text: Column, k: Int, sorted: Boolean = false): Column =
    ColumnBridge.column(WordShingleHashExpr(
      ColumnBridge.expression(text), k, distinct = true, sorted = sorted))

  /** Sorted distinct xxhash64 per char n-gram of normalized text — n-gram
    * Jaccard input; parity with
    * `array_sort(hashArray(ngramsFromNormalized(normalizeWs(text), n)))`.
    */
  def ngramHashes(text: Column, n: Int): Column =
    ColumnBridge.column(NGramHashExpr(ColumnBridge.expression(text), n))

  /** Word n-gram texts, duplicates kept in position order; element-wise
    * `xxhash64` parity with [[positionShingleHashes]].
    */
  def ngramTexts(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgramTextExpr(ColumnBridge.expression(text), n))
}
