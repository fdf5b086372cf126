package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd integer quantization of an embedding array:
  * `array<float|double>` → `array<bigint>` with element semantics
  * EXACTLY `CAST(round(CAST(x AS DOUBLE) * scale, 0) AS BIGINT)`.
  *
  * The composable form — a `transform(...)` higher-order function — is
  * correct but evaluates INTERPRETED per element (boxed lambda call +
  * Round's BigDecimal dance per coordinate). Quantization runs on EVERY
  * corpus scan of the vector-search family (prepared/lshBuckets/encode),
  * which at sf1 made the interpreted per-element cost the common constant
  * of a dozen ANN gates. This expression is one tight primitive loop per
  * row (the [[DotProductLong]] precedent — preference order (b) of the
  * builder brief: native Expression over UDF).
  *
  * Rounding contract: Spark's `round(x, 0)` on DOUBLE is HALF_UP over the
  * value's SHORTEST DECIMAL representation. A double's shortest repr has
  * fractional part exactly .5 iff the VALUE is exactly k+0.5 (k+0.5 is
  * representable and round-trips), and away from that boundary
  * nearest-integer agrees between the decimal repr and the binary value
  * (integer±0.5 boundaries are all exactly representable, so the repr and
  * the value can never sit on opposite sides). Hence:
  * exact-.5 → floor + (y > 0), everything else → Math.rint. NaN/±Inf
  * follow ANSI `CAST(double AS BIGINT)` and throw — matching the session
  * default the gates run under. Null semantics are the HOF's: null array
  * → null, null element → null element.
  */
case class QuantizeToLong(child: Expression, scale: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${t.simpleString}")
  }
  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "quantize_long"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val isF = elemIsFloat
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = x.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) {
        val d = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
        out(i) = QuantizeToLong.q(d * scale)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        if (!x.isNullAt(i)) {
          val d = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
          out(i) = QuantizeToLong.q(d * scale)
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      val boxed = ctx.freshName("boxed")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val cls = classOf[QuantizeToLong].getName.stripSuffix("$")
      s"""
         |int $n = $a.numElements();
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n && !$hasNull; $i++) {
         |  $hasNull = $a.isNullAt($i);
         |}
         |if (!$hasNull) {
         |  long[] $out = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $cls.q($get * $scale);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |} else {
         |  Object[] $boxed = new Object[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $boxed[$i] = $cls.q($get * $scale);
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeToLong {
  /** HALF_UP-over-shortest-decimal-repr to BIGINT — see the class doc for
    * why this equals `CAST(round(y, 0) AS BIGINT)` on every double. */
  def q(y: Double): Long = {
    if (java.lang.Double.isNaN(y) || java.lang.Double.isInfinite(y))
      throw new ArithmeticException(
        s"quantize_long: cannot cast $y to BIGINT (ANSI cast contract)")
    val f = Math.floor(y)
    // Exact-half test, exact on EVERY double: a true half y = f + 0.5
    // (representable only when |f| < 2^52) satisfies both equalities; the
    // two spurious cases each fail one. `y - f == 0.5` alone accepts
    // y = -0.49999999999999994 (f = -1, fl(y + 1) rounds UP to 0.5) but
    // there y != fl(f + 0.5) = -0.5; `y == f + 0.5` alone accepts integral
    // y >= 2^52 (f + 0.5 rounds back to f) but there y - f == 0.
    if (y - f == 0.5 && y == f + 0.5) f.toLong + (if (y > 0) 1L else 0L)
    else Math.rint(y).toLong
  }

  /** Column-API surface: `quantize_long(a, scale)`. */
  def apply(a: Column, scale: Int): Column =
    Bridge.column(QuantizeToLong(Bridge.expression(a), scale))
}
