package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC by default).
  *
  * Web-crawled corpora mix composed and decomposed forms of the same
  * text ("café" as U+00E9 vs e + U+0301) — every curation pipeline
  * normalizes early (Dolma/CCNet run NFC/NFKC before tokenizing,
  * hashing, or deduplicating; two byte-different spellings of one word
  * must fingerprint identically). Spark has no built-in for it, and a
  * Scala UDF would pay serialization per row: this is preference order
  * (b) of the build brief — a codegen'd `UnaryExpression`.
  *
  * The generated code takes the `isNormalized` fast path first: for
  * already-NFC text (all ASCII in particular) it is a single scan with
  * ZERO allocation, returning the input buffer untouched; only strings
  * that actually contain denormalized sequences pay the rebuild. `form`
  * is validated against the four Unicode forms at analysis time, so
  * interpolating it into the generated source is safe.
  */
case class NfcNormalize(child: Expression, form: String = "NFC")
    extends UnaryExpression {

  @transient private lazy val normForm = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"graft_nfc requires a string argument, got ${child.dataType.sql}")
    else if (!NfcNormalize.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$form' (expected one of ${NfcNormalize.Forms.mkString(", ")})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, normForm)) input
    else UTF8String.fromString(Normalizer.normalize(s, normForm))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.$form)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.$form));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Column-API surface: `nfc(col)` / `nfc(col, "NFKC")`. */
  def apply(c: Column): Column = apply(c, "NFC")
  def apply(c: Column, form: String): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c), form))
}
