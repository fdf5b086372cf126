package graft.expressions

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a codegen'd scalar expression — the text
  * CANONICALIZATION step of a multilingual corpus pipeline. Crawled text
  * mixes composed ("é" U+00E9) and decomposed ("e"+U+0301) forms of the
  * same glyphs; every byte-keyed operator downstream (exact dedup hashes,
  * span hashes, token frequency joins, BPE vocabularies) treats those as
  * DIFFERENT strings unless normalization runs first, silently splitting
  * what should be one key.
  *
  * Spark has no normalization built-in; a Scala UDF would box every row
  * and block whole-stage codegen on exactly the scan-shaped map where this
  * runs. This expression calls `java.text.Normalizer` (JDK-implemented
  * Unicode standard annexes #15) inline from generated code — preference
  * order (b) of the builder brief, same as [[DotProductLong]].
  *
  * Form contract: NFC/NFKC/NFD/NFKD as named by the standard. The engine's
  * oracle twin is DuckDB's utf8proc-backed `nfc_normalize`; both implement
  * Unicode canonical composition, verified equal on the gate corpus plus
  * injected decomposed/multi-accent fixtures (q_x_normalize). Accent
  * stripping COMPOSES instead of needing its own expression:
  * `regexp_replace(nfd(col), "\\p{Mn}", "")` — decompose, drop combining
  * marks (DuckDB: `strip_accents`).
  */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {
  require(UnicodeNormalize.Forms.contains(formName),
    s"normalization form must be one of ${UnicodeNormalize.Forms.mkString("/")}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unicode_normalize"

  private lazy val form = Normalizer.Form.valueOf(formName)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.expressions.UnicodeNormalize.normalize(
         |  $s, java.text.Normalizer.Form.$formName);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Shared by eval and generated code. Fast path: `Normalizer.isNormalized`
    * is a cheap scan (quick-check property table), and real-world corpora
    * are overwhelmingly already-NFC — skipping the rebuild avoids a String
    * + UTF8String allocation per row on the hot path. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  /** Column surface: `nfc(c)` etc. */
  def apply(c: Column, form: String): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(c), form))
}
