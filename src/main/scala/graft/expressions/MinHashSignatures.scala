package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All k MinHash signature minima in ONE traversal of the shingle-hash array.
  *
  * The composable form — k separate `array_min(transform(hs, h -> (a_j*h+b_j) % p))`
  * columns — re-traverses the array k times with interpreted per-element
  * lambda calls (HOFs don't participate in whole-stage codegen), which made
  * the MinHash signature stage the bench's worst offender. This expression
  * computes `min_j over elements of (a_j * h + b_j) % p` for every j in a
  * single primitive loop, inline in whole-stage codegen. At corpus scale the
  * signature stage is one scan instead of k.
  *
  * Semantics match the HOF composition per signature: null elements are
  * skipped (as `array_min` does); a signature with no contributing element is
  * null, represented here as a NULL result array — downstream band-key
  * concat/join treats both identically (null key, never matches).
  * Coefficient arithmetic requires `a_j * h + b_j` to stay within a long
  * (callers bound h < p and keep a_j small, as TextDedup does).
  */
case class MinHashSignatures(child: Expression, aCoeffs: Seq[Long], bCoeffs: Seq[Long],
    prime: Long) extends UnaryExpression {
  require(aCoeffs.length == bCoeffs.length && aCoeffs.nonEmpty,
    "aCoeffs and bCoeffs must be non-empty and of equal length")

  private val k = aCoeffs.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = (aCoeffs(j) * h + bCoeffs(j)) % prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val as = ctx.addReferenceObj("minhashA", aCoeffs.toArray, "long[]")
      val bs = ctx.addReferenceObj("minhashB", bCoeffs.toArray, "long[]")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $any = true;
         |    long $h = $a.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($as[$j] * $h + $bs[$j]) % ${prime}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |if (!$any) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignatures {
  /** Column-API surface: all k minima of `(a_j*h + b_j) % prime` over `hashes`. */
  def apply(hashes: Column, aCoeffs: Seq[Long], bCoeffs: Seq[Long], prime: Long): Column =
    Bridge.column(MinHashSignatures(Bridge.expression(hashes), aCoeffs, bCoeffs, prime))
}
