package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-function equivalents of the reference agent's per-field
  * transformers (/root/reference/src/main/scala/com/wegtam/tensei/agent/
  * transformers/).
  *
  * The reference applies these one value at a time inside actors; here each
  * is a pure Catalyst expression, so whole-stage codegen fuses entire
  * transformer chains into a single generated loop and they run distributed
  * over any partitioning. No UDFs anywhere in this file.
  */
object Transformers {

  // ------------------------------------------------------------------ text

  /** Concat.scala:44-56 — join sources with separator, wrap in prefix/suffix. */
  def concatAll(sep: String, prefix: String, suffix: String, cols: Column*): Column =
    concat(lit(prefix), concat_ws(sep, cols: _*), lit(suffix))

  /** Replace.scala:76-83 — replace ALL occurrences of any of the search
    * regexes with the replacement (reference `count` default 0 = all).
    */
  def replaceAllOf(c: Column, searches: Seq[String], replacement: String): Column =
    searches.foldLeft(c)((acc, s) => regexp_replace(acc, s, replacement))

  /** Replace.scala:46-59 `replaceSome` — replace only the first `max`
    * occurrences. Built from Catalyst string primitives (no UDF): locate the
    * n-th match via repeated `regexp_instr`-style stripping.
    */
  def replaceFirst(c: Column, regex: String, replacement: String): Column =
    RegexFns.regexpReplaceSome(c, regex, replacement, 1)

  def replaceSome(c: Column, regex: String, replacement: String, max: Int): Column =
    RegexFns.regexpReplaceSome(c, regex, replacement, max)

  /** Split.scala:44-52 — split on pattern, return element at `idx`
    * (0-based, like the reference's `selected` positions). Missing index →
    * empty string, mirroring Split.scala:80-83.
    */
  def splitSelect(c: Column, pattern: String, idx: Int): Column =
    coalesce(trim(get(split(c, pattern), lit(idx))), lit(""))

  /** Split.scala:57-66 — full split with optional limit (-1 = all parts). */
  def splitAll(c: Column, pattern: String, limit: Int = -1): Column = {
    val parts = transform(split(c, pattern), p => trim(p))
    if (limit > 0) slice(parts, 1, limit) else parts
  }

  /** LowerOrUpper.scala:34-43 — perform ∈ {lower, upper, firstlower, firstupper}. */
  def lowerOrUpper(c: Column, perform: String): Column = perform match {
    case "lower"      => lower(c)
    case "upper"      => upper(c)
    case "firstlower" => concat(lower(c.substr(lit(1), lit(1))), c.substr(lit(2), length(c)))
    case "firstupper" => concat(upper(c.substr(lit(1), lit(1))), c.substr(lit(2), length(c)))
    case other        => throw new IllegalArgumentException(s"unknown perform: $other")
  }

  /** MergeAndExtractByRegEx.scala:33-40 — extract the given regex groups and
    * join them with `filler`. Groups are 0-based group *indexes* into the
    * match, i.e. regexp group numbers 1..n.
    */
  def mergeExtract(c: Column, regex: String, filler: String, groups: Seq[Int]): Column =
    concat_ws(filler, groups.map(g => regexp_extract(c, regex, g + 1)): _*)

  // --------------------------------------------------------------- numeric

  /** CastStringToLong.scala:29-31 — string → long; unparsable → null (the
    * reference actor errors; null is the declarative equivalent).
    * try_cast, because under Spark 4's default ANSI mode a plain cast
    * THROWS on garbage instead of yielding null.
    */
  def castStringToLong(c: Column): Column = trim(c).try_cast(LongType)

  /** ExtractBiggestValue.scala:30-33 — max of numeric inputs. */
  def extractBiggestNumeric(cols: Column*): Column = greatest(cols: _*)

  /** ExtractBiggestValue.scala:30-33 — longest string wins for non-numeric. */
  def extractBiggestString(cols: Column*): Column =
    cols.reduce((a, b) => when(length(a) >= length(b), a).otherwise(b))

  /** IfThenElseNumeric.scala:30-41 — parse the reference's mini-grammar
    * (`if` like "x>42" / "3.141 != x"; `then`/`else` like "x=x+1", "x=3-x",
    * or a constant) into a single when/otherwise Column. Pure plan-side
    * parsing; the emitted expression is fully codegen'd.
    */
  def ifThenElseNumeric(x: Column, ifS: String, thenS: String, elseS: String,
                        asDecimal: Boolean = false): Column = {
    val out = when(parseCond(x, ifS), parseArith(x, thenS)).otherwise(parseArith(x, elseS))
    if (asDecimal) out.cast(DecimalType(38, 10)) else out.cast(LongType)
  }

  private def operand(x: Column, tok: String): Column =
    if (tok.trim == "x") x else lit(BigDecimal(tok.trim))

  private def parseCond(x: Column, s: String): Column = {
    val ops = Seq("==", "!=", "<=", ">=", "<", ">")
    val op = ops.find(o => s.contains(o))
      .getOrElse(throw new IllegalArgumentException(s"no operator in: $s"))
    val Array(l, r) = s.split(java.util.regex.Pattern.quote(op), 2)
    val (lc, rc) = (operand(x, l), operand(x, r))
    op match {
      case "==" => lc === rc
      case "!=" => lc =!= rc
      case "<=" => lc <= rc
      case ">=" => lc >= rc
      case "<"  => lc < rc
      case ">"  => lc > rc
    }
  }

  private def parseArith(x: Column, s: String): Column = {
    val rhs = if (s.contains("=")) s.split("=", 2)(1) else s
    val ops = Seq("+", "-", "*", "/")
    // a leading '-' is a SIGN, not the subtraction operator: find the
    // operator from position 1 so constant branches like "-1" (and
    // "x=-1") parse as negative literals instead of crashing on an empty
    // left operand (r8 review)
    ops.find(o => rhs.indexOf(o, 1) > 0) match {
      case None => operand(x, rhs)
      case Some(op) =>
        val idx = rhs.indexOf(op, 1)
        val (l, r) = (rhs.substring(0, idx), rhs.substring(idx + 1))
        val (lc, rc) = (operand(x, l), operand(x, r))
        op match {
          case "+" => lc + rc
          case "-" => lc - rc
          case "*" => lc * rc
          case "/" => lc / rc
        }
    }
  }

  // ------------------------------------------------------------- date/time

  /** DateConverter.scala:33-43 — numeric epoch millis → timestamp. */
  def epochMillisToTimestamp(c: Column): Column = timestamp_millis(c.cast(LongType))

  /** DateConverter.scala:33-43 — timestamp → numeric epoch millis. The cast
    * lifts TIMESTAMP_NTZ parquet columns into session-TZ (UTC) instants.
    */
  def timestampToEpochMillis(c: Column): Column = unix_millis(c.cast(TimestampType))

  /** DateConverter.scala `format` param — parse a string with an explicit
    * java.time pattern.
    */
  def parseTimestamp(c: Column, format: String): Column = to_timestamp(c, format)

  /** DateTypeConverter.scala:30-36 — target ∈ {date, time, datetime}. */
  def dateTypeConvert(c: Column, target: String): Column = target match {
    case "date"     => c.cast(DateType)
    case "datetime" => c.cast(TimestampType)
    case "time"     => date_format(c, "HH:mm:ss")
    case other      => throw new IllegalArgumentException(s"unknown target: $other")
  }

  /** DateValueToString.scala:30-38 — format a temporal as string; empty
    * format = plain cast.
    */
  def dateValueToString(c: Column, format: String = ""): Column =
    if (format.isEmpty) c.cast(StringType) else date_format(c, format)

  /** TimestampCalibrate.scala:30-34 + atomic/TimestampAdjuster.scala:30-38 —
    * 'add' → seconds*1000 → millis; 'reduce' → millis div 1000 → seconds
    * (integer division, matching the reference's `x / 1000` on longs).
    */
  def timestampCalibrate(c: Column, perform: String): Column = perform match {
    case "add"    => (c.cast(LongType) * 1000).cast(LongType)
    // integral `div`, not floor(double /): the reference divides LONGS
    // (truncation toward zero), so -1500 ms must give -1 s, not floor's
    // -2 — and double division loses precision past 2^53 (r8 review)
    case "reduce" => call_function("div", c.cast(LongType), lit(1000L))
    case other    => throw new IllegalArgumentException(s"unknown perform: $other")
  }

  /** TimestampOffsetTransformer.scala:30-41 — shift a timestamp by a fixed
    * `+|-HH:MM` offset (mode `convert`).
    */
  def timestampOffset(c: Column, offset: String): Column = {
    val sign = if (offset.startsWith("-")) -1 else 1
    val Array(h, m) = offset.stripPrefix("+").stripPrefix("-").split(":")
    val mins = sign * (h.toInt * 60 + m.toInt)
    c + expr(s"INTERVAL '$mins' MINUTE")
  }

  // ------------------------------------------------- constants / erasure

  /** Nullify.scala:27-30 — erase to NULL (typed, so sinks keep the schema). */
  def nullify(dt: DataType = StringType): Column = lit(null).cast(dt)

  /** EmptyString.scala:27-31 — erase to "". */
  def emptyString: Column = lit("")

  /** Overwrite.scala:30-46 — constant of a given type regardless of input. */
  def overwrite(value: String, tpe: String = "string"): Column = tpe match {
    case "string"     => lit(value)
    case "long"       => lit(if (value.isEmpty) 0L else value.toLong)
    case "bigdecimal" => lit(if (value.isEmpty) BigDecimal(0) else BigDecimal(value))
    case "date"       => lit(if (value.isEmpty) "1970-01-01" else value).cast(DateType)
    case "datetime"   => lit(if (value.isEmpty) "1970-01-01 00:00:00" else value).cast(TimestampType)
    case "byte"       => lit(value.getBytes("UTF-8"))
    case "none"       => lit(null).cast(StringType)
    case other        => throw new IllegalArgumentException(s"unknown type: $other")
  }

  // ------------------------------------------------------------------ json

  /** ToJson.scala:28-33 — wrap a value as a labelled JSON object. */
  def toJsonLabelled(label: String, c: Column): Column = to_json(struct(c.as(label)))

  /** MergeToJson.scala:28-34 — N values + N labels → one JSON object. */
  def mergeToJson(labelled: (String, Column)*): Column =
    to_json(struct(labelled.map { case (l, c) => c.as(l) }: _*))

  /** atomic/BoxDataIntoList.scala:27-30 — box values into an array. */
  def boxIntoList(cols: Column*): Column = array(cols: _*)

  /** generators/DrupalVanCodeGenerator.scala:142-151 `toBase36` — one
    * vancode path segment: lowercase base-36 of a per-thread sequence
    * number, prefixed with (digit count - 1), e.g. 1 → "01", 36 → "110".
    * The reference's per-article numbering state becomes a row_number
    * window upstream (see operators/VanCode for the full thread-path
    * composition); this renders one segment.
    */
  def vancodeSegment(n: Column): Column = {
    val b36 = lower(conv(n.cast(StringType), 10, 36))
    concat((length(b36) - 1).cast(StringType), b36)
  }
}
