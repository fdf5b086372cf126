package graft.expressions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Whole-document SimHash fingerprint computed map-side in ONE pass over the
  * token array — no explode, no shuffle.
  *
  * The composable form (explode tokens → per-bit ±1 vote columns → groupBy
  * doc) evaluates `bits` interpreted CASE expressions per token row and
  * shuffles a `bits`-column partial aggregate per document. This expression
  * folds the whole vote-and-sign computation into a per-row loop: at corpus
  * scale SimHash becomes a pure map over the scan, which is the shape a
  * 100 TB fingerprinting pass needs (the dedup JOIN is then the only
  * shuffle).
  *
  * Portability contract: the per-token hash is the engine-wide 60-bit
  * md5-prefix hash ([[graft.functions.Hashing.hash64]] /
  * `conv(substr(md5(t),1,15),16,10)`), so fingerprints are bit-identical to
  * the SQL/DuckDB formulation for every non-degenerate document. Null
  * tokens are skipped; a doc with a null/empty/all-null token array yields
  * a row with a NULL fingerprint — note this is a row-cardinality
  * difference from the explode+groupBy form, which DROPS such docs (the
  * aggregate never sees a row for them). Downstream banding treats a null
  * fingerprint as unmatchable either way (null join keys never equal). */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 60, "SimHash supports 1..60 bits (60-bit portable hash)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any = {
    val r = SimHash.compute(input.asInstanceOf[ArrayData], bits)
    if (r == SimHash.NullSentinel) null else java.lang.Long.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |long $r = graft.expressions.SimHash.compute($a, $bits);
         |if ($r == graft.expressions.SimHash.NullSentinel()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  /** Fingerprints are < 2^60, so Long.MinValue can flag "no tokens" in the
    * primitive-returning fast path shared by eval and codegen. */
  val NullSentinel: Long = Long.MinValue

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** 60-bit md5-prefix hash of a UTF-8 byte string — bit-identical to
    * `conv(substring(md5(s),1,15),16,10)`: the first 15 hex chars are the
    * top 15 nibbles of the big-endian first 8 digest bytes. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (d(i) & 0xffL); i += 1 }
    be >>> 4
  }

  /** Single-pass vote-and-sign over the token array. */
  def compute(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = hash60(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    if (!any) return NullSentinel
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** Column-API surface: map-side SimHash of a tokens array column. */
  def apply(tokens: Column, bits: Int): Column =
    Bridge.column(SimHash(Bridge.expression(tokens), bits))
}
