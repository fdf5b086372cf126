package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphRank, Trend}

/** Association rules and exact-moment correlation: hand-checked ratios on
  * tiny baskets, direction asymmetry, and an in-JVM Pearson reference. */
class AssociationsSpec extends SparkSpec {
  import spark.implicits._

  test("associationRules: hand-checked support/confidence/lift and asymmetry") {
    // baskets: {1,2} {1,2} {1,3} {1} — N=4, n_1=4, n_2=2, n_3=1; pair (1,2)
    // in 2 baskets; (1,3) in 1 basket (below minShared=2).
    val m = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 1L)).toDF("g", "i")
    val rules = GraphRank.associationRules(m, "g", "i", minShared = 2L, k = 10)
      .select("antecedent", "consequent", "n_ab", "support", "confidence", "lift")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSet
    assert(rules == Set(
      (1L, 2L, 2L, 0.5, 2.0 / 4.0, 8.0 / 8.0),   // conf P(2|1)=1/2, lift 1
      (2L, 1L, 2L, 0.5, 2.0 / 2.0, 8.0 / 8.0)))  // conf P(1|2)=1 — asymmetric
  }

  test("associationRules: minShared prunes and rank caps") {
    val m = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L)).toDF("g", "i")
    assert(GraphRank.associationRules(m, "g", "i", minShared = 2L).count() == 0L)
    assert(GraphRank.associationRules(m, "g", "i", minShared = 1L, k = 1).count() == 1L)
  }

  test("correlation: matches an in-JVM reference on integer data") {
    val rnd = new scala.util.Random(3)
    val data = (0 until 500).map { _ =>
      val x = rnd.nextInt(1000).toLong
      (x, x * 3 + rnd.nextInt(200), rnd.nextInt(50).toLong)
    }
    val df = data.toDF("x", "y", "z")
    val got = Trend.correlation(df, Seq(
        (col("x"), "x", col("y"), "y"), (col("x"), "x", col("z"), "z")))
      .select("x_col", "y_col", "n", "r").as[(String, String, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._4).toMap

    def ref(xs: Seq[Long], ys: Seq[Long]): Double = {
      val n = BigInt(xs.length)
      val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
      val sxx = xs.map(a => BigInt(a) * a).sum; val syy = ys.map(a => BigInt(a) * a).sum
      (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    }
    assert(got(("x", "y")) == ref(data.map(_._1), data.map(_._2)))
    assert(got(("x", "z")) == ref(data.map(_._1), data.map(_._3)))
    assert(math.abs(got(("x", "y"))) > 0.9) // strongly linear by construction
  }

  test("correlation: zero variance yields NULL r, empty input yields n=0") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    val row = Trend.correlation(df, Seq((col("x"), "x", col("y"), "y"))).head()
    assert(row.getLong(2) == 3L && row.isNullAt(3))
    val empty = Trend.correlation(df.filter(lit(false)),
      Seq((col("x"), "x", col("y"), "y"))).head()
    assert(empty.getLong(2) == 0L && empty.isNullAt(3))
  }

  test("olsFit2: exact recovery of a zero-residual plane") {
    // y = 7 + 3·x1 − 2·x2 exactly, over a non-degenerate design
    val pts = Seq((1L, 0L), (2L, 1L), (3L, 5L), (4L, 2L), (6L, 9L), (8L, 3L))
    val df = pts.map { case (x1, x2) => (7L + 3 * x1 - 2 * x2, x1, x2) }
      .toDF("y", "x1", "x2")
    val r = Trend.olsFit2(df, col("y"), col("x1"), col("x2")).head()
    assert(r.getLong(0) == 6L)
    assert(r.getDouble(1) == 7.0 && r.getDouble(2) == 3.0 && r.getDouble(3) == -2.0)
  }

  test("olsFit2: collinear regressors yield NULL coefficients, empty input n=0") {
    val df = Seq((1L, 1L, 2L), (2L, 2L, 4L), (3L, 3L, 6L)).toDF("y", "x1", "x2")
    val r = Trend.olsFit2(df, col("y"), col("x1"), col("x2")).head()
    assert(r.getLong(0) == 3L && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    val e = Trend.olsFit2(df.filter(lit(false)), col("y"), col("x1"), col("x2")).head()
    assert(e.getLong(0) == 0L && e.isNullAt(1))
  }
}
