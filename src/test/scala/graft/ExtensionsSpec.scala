package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.extensions.{GraftExtensions, RewriteDotProduct}

/** SparkSessionExtensions integration: the dot_long SQL function and the
  * HOF-dot-product rewrite rule. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDf = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    .selectExpr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS dp")

  test("RewriteDotProduct rewrites the HOF pattern and preserves the result") {
    val analyzed = hofDf.queryExecution.analyzed
    val rewritten = RewriteDotProduct(analyzed)
    assert(rewritten.toString.contains("dot_long"),
      s"expected dot_long in:\n$rewritten")
    val got = Bridge.ofRows(spark, rewritten).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(32L)) // 4 + 10 + 18
    assert(hofDf.collect().map(_.getLong(0)).toSeq == got)
  }

  test("dot_long matches HOF null semantics; rewrite fires for containsNull=true") {
    val df = Seq(
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](4L, 5L, 6L)), // element null
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](4L, 5L, 6L)),       // length mismatch
      (Seq[java.lang.Long](2L, 3L, 4L), Seq[java.lang.Long](1L, 1L, 1L))    // clean
    ).toDF("a", "b")
    val hof = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS dp")
    val native = df.select(graft.expressions.DotProductLong(col("a"), col("b")).as("dp"))
    assert(rows(native) == Seq(Seq(null), Seq(null), Seq(9L)))
    assert(rows(hof) == rows(native))
    // toDF on boxed Longs yields containsNull = true — the rule must still fire
    assert(RewriteDotProduct(hof.queryExecution.analyzed).toString.contains("dot_long"))
  }

  test("rule leaves non-matching aggregates alone") {
    val other = Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
      .selectExpr("aggregate(zip_with(a, b, (x, y) -> x + y), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS s")
    val rewritten = RewriteDotProduct(other.queryExecution.analyzed)
    assert(!rewritten.toString.contains("dot_long"))
    assert(Bridge.ofRows(spark, rewritten).collect().head.getLong(0) == 10L)
  }

  test("extensions session: dot_long callable from SQL, rule installed") {
    // a second SparkSession over the same SparkContext, with extensions
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT dot_long(array(1L, 2L), array(10L, 20L)) AS d")
        .collect().head.getLong(0)
      assert(r == 50L)
      // simhash exposed to SQL too, same value as the operator surface
      val sh = s2.sql("SELECT simhash(split('quick brown fox', ' ')) AS f")
        .collect().head.getLong(0)
      val expected = graft.operators.TextDedup
        .simhash(Seq((1L, "quick brown fox")).toDF("doc_id", "text"))
        .collect().head.getLong(1)
      assert(sh == expected)
      // the Misra-Gries sketch aggregate is SQL-callable too
      val hh = s2.sql(
        """SELECT topk_sketch(k, 8, 2) AS hh FROM
           (SELECT CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END AS k
            FROM range(9))""")
        .selectExpr("inline(hh)").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(hh.toSeq == Seq(("b", 6L), ("a", 3L)))
      // optimizer applies the rewrite inside the extensions session — use a
      // non-local source so constant folding can't pre-evaluate the plan
      val df = s2.range(3)
        .selectExpr("id", "transform(sequence(1, 4), x -> x + id) AS a",
          "transform(sequence(1, 4), x -> x * 2 + id) AS b")
        .selectExpr("id", "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS dp")
      assert(df.queryExecution.optimizedPlan.toString.contains("dot_long"))
      // id=0: a=[1,2,3,4], b=[2,4,6,8] → dot = 2+8+18+32 = 60
      val byId = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byId(0L) == 60L)
      // unicode_normalize exposed to SQL: decomposed e+U+0301 composes to e-acute
      val norm = s2.sql("SELECT unicode_normalize('cafe\u0301', 'NFC') AS n")
        .collect().head.getString(0)
      assert(norm == "caf\u00e9" && norm.length == 4)
    } finally {
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }

  test("quantize_long ≡ the transform/round/cast HOF on random + boundary floats") {
    // the codegen'd quantizer must be BIT-identical to the SQL form it
    // replaced (VectorSearch.quantize's old HOF) — including exact-.5
    // HALF_UP cases (k+0.5 scaled back by 10⁴ is float-representable for
    // small k), negatives, nulls, and a null array
    val rng = new scala.util.Random(42)
    val crafted = Seq(0.5f, -0.5f, 1.5f, -1.5f, 2.5f, -2.5f, 0.00005f,
      -0.00005f, 0.00015f, -0.00015f, 0f, 1e-9f, -1e-9f, 0.99995f)
    val rand = Seq.fill(200)(rng.nextFloat() * 4f - 2f)
    val arrs: Seq[Seq[java.lang.Float]] =
      Seq((crafted ++ rand).map(java.lang.Float.valueOf),
        Seq[java.lang.Float](1.25f, null, -3.5f),
        null)
    val df = arrs.toDF("e")
    val hof = df.selectExpr(
      "transform(e, x -> CAST(round(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT)) AS q")
    val native = df.select(
      graft.expressions.QuantizeToLong(col("e"), 10000).as("q"))
    assert(rows(native) == rows(hof))
    // exact-.5 HALF_UP spot check on exactly-representable doubles at
    // scale 1 (x.5 · 1 is exact, so the .5 branch is guaranteed to fire):
    // HALF_UP rounds away from zero, rint would give the even neighbor
    val halves = Seq(Seq(0.5d, -0.5d, 2.5d, -2.5d, 1.5d)).toDF("e")
    val gotH = halves
      .select(graft.expressions.QuantizeToLong(col("e"), 1).as("q"))
      .collect().head.getSeq[Long](0)
    assert(gotH == Seq(1L, -1L, 3L, -3L, 2L), s"HALF_UP at exact .5, got $gotH")
    val hofH = halves
      .selectExpr("transform(e, x -> CAST(round(CAST(x AS DOUBLE) * 1, 0) AS BIGINT)) AS q")
      .collect().head.getSeq[Long](0)
    assert(gotH == hofH)
    // double-input boundary cases where an inexact half test diverges from
    // the SQL form: y = -0.49999999999999994 has fl(y − floor(y)) == 0.5
    // yet is NOT a half (SQL rounds it to 0, a subtraction-only test gave
    // −1); integral y ≥ 2^52 has fl(floor(y) + 0.5) == y yet must stay y.
    val edge = Seq(Seq(-0.49999999999999994d, 0.49999999999999994d,
      4503599627370496.0d, -4503599627370496.0d, 4503599627370497.0d)).toDF("e")
    val gotE = edge.select(graft.expressions.QuantizeToLong(col("e"), 1).as("q"))
      .collect().head.getSeq[Long](0)
    val hofE = edge
      .selectExpr("transform(e, x -> CAST(round(CAST(x AS DOUBLE) * 1, 0) AS BIGINT)) AS q")
      .collect().head.getSeq[Long](0)
    assert(gotE == hofE, s"double boundary: got $gotE vs sql $hofE")
  }
}
