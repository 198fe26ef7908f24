package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Oracle-reproducible text hashing.
  *
  * [[CharPolyHash]] is a Horner polynomial over Unicode code points,
  * `h = (h * 31 + cp) mod 2^52` — chosen so the whole recurrence stays
  * below 2^57 (no long overflow under ANSI mode, no 128-bit arithmetic)
  * AND so an external SQL engine can replay it exactly with a
  * `list_reduce` over `unicode(char)` (DuckDB), giving the dedup /
  * fingerprint operators full value-level oracles. xxhash64 would be a
  * stronger mixer but is not expressible in portable SQL; 52 bits of a
  * 31-polynomial is ample for SimHash bit votes and corpus fingerprints.
  *
  * Codegen'd (tight code-point loop, no boxing) so hashing stays inside
  * whole-stage codegen on the 100 TB scan path.
  */
object TextHash {

  val Mask: Long = (1L << 52) - 1

  /** Scalar reference implementation (also called by generated code). */
  def charPolyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) & Mask
      i += Character.charCount(cp)
    }
    h
  }

  case class CharPolyHash(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "char_poly_hash"

    override protected def nullSafeEval(v: Any): Any =
      java.lang.Long.valueOf(charPolyHash(v.asInstanceOf[UTF8String]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val cls = TextHash.getClass.getName.stripSuffix("$") + "$"
        s"${ev.value} = $cls.MODULE$$.charPolyHash($c);"
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def charPolyHash(c: Column): Column =
    GraftSqlBridge.column(CharPolyHash(GraftSqlBridge.expression(c)))
}
