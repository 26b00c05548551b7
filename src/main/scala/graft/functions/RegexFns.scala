package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Replace only the first `max` matches of `regex` with `replacement`.
  *
  * Mirrors Replace.scala:46-59 (`replaceSome`) in the reference — Spark's
  * built-in `regexp_replace` always replaces every match, so the count-
  * limited form needs a custom Catalyst expression. Implemented as a
  * UnaryExpression (not a Scala UDF) so null-handling and column pruning
  * behave like any built-in; evaluation is interpreter-based
  * (CodegenFallback), fine for a per-field string op off the hot
  * aggregation path.
  */
case class RegexpReplaceSomeExpr(
    child: Expression,
    regex: String,
    replacement: String,
    max: Int
) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  // Compiled once per task, not per row.
  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val m = pattern.matcher(s)
    val sb = new java.lang.StringBuilder
    var n = 0
    var last = 0
    while (n < max && m.find()) {
      sb.append(s, last, m.start()).append(replacement)
      last = m.end()
      n += 1
    }
    sb.append(s, last, s.length)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "regexp_replace_some"
}

/** All capture groups of `regex`'s FIRST match in one pass, as
  * array<string> (a non-participating optional group yields null at its
  * position); null when the input does not match at all.
  *
  * Exists for multi-group record extraction: `regexp_extract(s, p, g)`
  * re-runs the whole match per group, so pulling G leaves out of a
  * G-fragment record pattern (the DFASDL token-stream reader) costs G
  * full matches per record — this expression makes it ONE.
  *
  * Codegen'd (r12): this sits on the token-stream/choice-stream readers'
  * per-record hot path, and a CodegenFallback here breaks the whole-stage
  * span around the record dispatch — the generated code is the same
  * matcher walk over a per-task compiled Pattern reference.
  */
case class RegexpGroupsExpr(child: Expression, regex: String)
    extends UnaryExpression {
  import org.apache.spark.sql.types.ArrayType
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  // Compiled once per task, not per row.
  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  override def nullSafeEval(input: Any): Any = {
    val m = pattern.matcher(input.asInstanceOf[UTF8String].toString)
    if (!m.find()) null
    else {
      val out = new Array[UTF8String](m.groupCount())
      var g = 1
      while (g <= m.groupCount()) {
        val v = m.group(g)
        out(g - 1) = if (v == null) null else UTF8String.fromString(v)
        g += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternRef = ctx.addReferenceObj("pattern", pattern,
      classOf[java.util.regex.Pattern].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.freshName("matcher")
      val arr = ctx.freshName("groups")
      val g = ctx.freshName("g")
      val v = ctx.freshName("v")
      s"""
        java.util.regex.Matcher $m = $patternRef.matcher($c.toString());
        if (!$m.find()) {
          ${ev.isNull} = true;
        } else {
          org.apache.spark.unsafe.types.UTF8String[] $arr =
            new org.apache.spark.unsafe.types.UTF8String[$m.groupCount()];
          for (int $g = 1; $g <= $m.groupCount(); $g++) {
            String $v = $m.group($g);
            $arr[$g - 1] = $v == null ? null :
              org.apache.spark.unsafe.types.UTF8String.fromString($v);
          }
          ${ev.value} =
            new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "regexp_groups"
}

object RegexFns {
  import org.apache.spark.sql.graft.ColumnBridge

  def regexpReplaceSome(c: Column, regex: String, replacement: String, max: Int): Column =
    ColumnBridge.column(
      RegexpReplaceSomeExpr(ColumnBridge.expression(c), regex, replacement, max))

  def regexpGroups(c: Column, regex: String): Column =
    ColumnBridge.column(RegexpGroupsExpr(ColumnBridge.expression(c), regex))
}
