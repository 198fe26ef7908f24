package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass Unicode-script counting for language identification.
  *
  * [[TextAnalysis.languageId]]'s script ratios used to be five separate
  * `length(regexp_replace(text, "[^range]", ""))` passes — each one
  * re-scans the document AND allocates a stripped copy, which the
  * round-5 noop-action bench exposed as the dominant cost of the langid
  * path. [[ScriptCounts]] walks the code points ONCE, no allocation,
  * returning `[total, zh, ja, ko, ru, ar]`; the ratios are then cheap
  * array reads. Semantics are identical: Spark's `length()` and the
  * replaced-string lengths both count Unicode code points, which is
  * exactly what the loop counts (the DuckDB oracle replays the same
  * ranges with `length(regexp_replace(...))` and hash-matches).
  */
object TextScript {

  /** Scalar reference implementation (also called by generated code).
    * Index 0 = total code points, then zh/ja/ko/ru/ar range counts.
    */
  def counts(s: UTF8String): ArrayData = {
    val str = s.toString
    var total = 0L
    var zh = 0L; var ja = 0L; var ko = 0L; var ru = 0L; var ar = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      total += 1
      if (cp >= 0x4e00 && cp <= 0x9fff) zh += 1
      else if (cp >= 0x3040 && cp <= 0x30ff) ja += 1
      else if (cp >= 0xac00 && cp <= 0xd7af) ko += 1
      else if (cp >= 0x0400 && cp <= 0x04ff) ru += 1
      else if (cp >= 0x0600 && cp <= 0x06ff) ar += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array(total, zh, ja, ko, ru, ar))
  }

  case class ScriptCounts(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "script_counts"

    override protected def nullSafeEval(v: Any): Any =
      counts(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val cls = TextScript.getClass.getName.stripSuffix("$") + "$"
        s"${ev.value} = $cls.MODULE$$.counts($c);"
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def scriptCounts(c: Column): Column =
    GraftSqlBridge.column(ScriptCounts(GraftSqlBridge.expression(c)))

  /** Script-mix variant of [[counts]] for
    * [[graft.ops.TextAnalysis.scriptMix]]: `[total, latin, han, digit,
    * whitespace]` in one code-point pass. Latin is the three
    * oracle-replayable letter ranges A–Z / a–z / C0–24F with the D7/F7
    * multiplication and division signs excluded; whitespace is the
    * RE2-`\s` set — exactly tab, LF, FF, CR, space — so the DuckDB
    * oracle's `[^\s]` strip counts identically. NOTE: Java's `\s`
    * additionally matches VT (U+000B); RE2's does not, so VT is
    * deliberately NOT counted here (r12 ADVICE parity fix).
    */
  def mixCounts(s: UTF8String): ArrayData = {
    val str = s.toString
    var total = 0L
    var latin = 0L; var han = 0L; var digit = 0L; var ws = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      total += 1
      if ((cp >= 0x41 && cp <= 0x5a) || (cp >= 0x61 && cp <= 0x7a) ||
        (cp >= 0xc0 && cp <= 0xd6) || (cp >= 0xd8 && cp <= 0xf6) ||
        (cp >= 0xf8 && cp <= 0x24f)) latin += 1
      else if (cp >= 0x4e00 && cp <= 0x9fff) han += 1
      else if (cp >= 0x30 && cp <= 0x39) digit += 1
      else if (cp == 0x20 || cp == 0x09 || cp == 0x0a || cp == 0x0c ||
        cp == 0x0d) ws += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array(total, latin, han, digit, ws))
  }

  case class ScriptMixCounts(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "script_mix_counts"

    override protected def nullSafeEval(v: Any): Any =
      mixCounts(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val cls = TextScript.getClass.getName.stripSuffix("$") + "$"
        s"${ev.value} = $cls.MODULE$$.mixCounts($c);"
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def scriptMixCounts(c: Column): Column =
    GraftSqlBridge.column(ScriptMixCounts(GraftSqlBridge.expression(c)))
}
