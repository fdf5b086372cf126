package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All w-token span hashes of a token array in ONE primitive pass — the
  * hot loop of the substring-dedup family ([[graft.operators.TextDedup
  * .spanOccurrences]] and friends).
  *
  * The composable form
  * `transform(sequence(0, n−w), i -> conv(substring(md5(concat_ws(' ',
  * slice(toks, i+1, w))), 1, 15), 16, 10))` pays, PER SPAN, an array copy
  * (slice), a string build (concat_ws), a 32-char hex render (md5), a
  * substring, and a base-16 string parse (conv) — all interpreted inside
  * the HOF. This expression digests each span's UTF-8 bytes directly into
  * the thread-local MD5 and folds the first 15 hex nibbles numerically,
  * allocating only the token-bytes table and the output array per row.
  *
  * Value-identical to the HOF form (spec-pinned): the digest sees exactly
  * `concat_ws(' ', slice(...))`'s bytes — null tokens are SKIPPED, not
  * rendered, matching concat_ws — and the 60-bit fold equals parsing the
  * first 15 hex chars base-16. Arrays shorter than `width` yield an empty
  * array (the callers' `when(size >= w)` guard made short inputs empty;
  * folding that rule in here keeps the call site a single expression). */
case class SpanHashes(child: Expression, width: Int) extends UnaryExpression {
  require(width >= 1, s"width must be >= 1: $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "span_hashes"

  override def nullSafeEval(input: Any): Any =
    SpanHashes.compute(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SpanHashes.compute($a, $width);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanHashes {
  private val Space = ' '.toByte

  def compute(arr: ArrayData, w: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](n - w + 1)
    val md = graft.functions.Hashing.localDigest
    i = 0
    while (i <= n - w) {
      var first = true
      var j = i
      while (j < i + w) {
        val tb = toks(j)
        if (tb != null) {
          if (!first) md.update(Space)
          md.update(tb)
          first = false
        }
        j += 1
      }
      val dig = md.digest() // digest() resets the thread-local instance
      // fold of the first 15 hex nibbles == parseLong(hex.substring(0,15), 16)
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
      out(i) = (v << 4) | ((dig(7) >> 4) & 0xfL)
      i += 1
    }
    new GenericArrayData(out)
  }
}
