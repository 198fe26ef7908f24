package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for text pipelines — the normalization pass
  * every dedup/fingerprint/tokenize stage should run FIRST, so that
  * visually identical strings ("é" precomposed U+00E9 vs decomposed
  * e + U+0301) hash, shingle, and compare identically. The reference
  * sanitizes feature NAMES only (`feature.py` sanitize); document-level
  * unicode canonicalization is part of the LLM-pipeline brief (near-dup
  * pipelines are blind to composition differences without it).
  *
  * [[NormalizeUnicode]] is a full codegen Catalyst expression wrapping
  * `java.text.Normalizer` (NFC/NFD/NFKC/NFKD per Unicode TR-15) — the
  * normalization stays inside whole-stage codegen next to the
  * lower/trim/regexp stages it composes with, no UDF boundary. DuckDB's
  * `nfc_normalize` provides the exact cross-engine oracle for NFC.
  *
  * Scale shape: row-local scalar expression — no shuffle, no state;
  * `Normalizer.normalize` is a single pass for already-normal text (the
  * common case; `isNormalized` fast path below skips the copy).
  */
object TextNormalize {

  /** Codegen unicode normalization of a string column. `form` is one of
    * NFC | NFD | NFKC | NFKD (validated at plan time, not per row).
    */
  case class NormalizeUnicode(child: Expression, form: String)
      extends UnaryExpression {
    require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
      s"unknown unicode normalization form $form")
    override def dataType: DataType = StringType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName requires a string argument")
    override def prettyName: String = "normalize_unicode"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val f = java.text.Normalizer.Form.valueOf(form)
      if (java.text.Normalizer.isNormalized(s, f)) input
      else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val s = ctx.freshName("s")
        s"""
           |String $s = $c.toString();
           |if (java.text.Normalizer.isNormalized($s,
           |    java.text.Normalizer.Form.$form)) {
           |  ${ev.value} = $c;
           |} else {
           |  ${ev.value} = UTF8String.fromString(
           |    java.text.Normalizer.normalize($s,
           |      java.text.Normalizer.Form.$form));
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** `form`-normalize a string column (default NFC — the canonical
    * composition every dedup pipeline should key on).
    */
  def normalize(c: Column, form: String = "NFC"): Column =
    GraftSqlBridge.column(
      NormalizeUnicode(GraftSqlBridge.expression(c), form))

  /** The canonical-text pass for dedup/fingerprint pipelines: NFC
    * compose, casefold, collapse whitespace runs to one space, trim.
    * One codegen projection — all four stages are row-local scalar
    * expressions.
    */
  def canonicalText(c: Column): Column =
    trim(regexp_replace(lower(normalize(c, "NFC")), "\\s+", " "))
}
