package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

/** Property equivalence: the bucketed range joins must produce exactly the
  * pairs of the naive cross-join filter for arbitrary inputs and ANY bucket
  * width — width is a cost knob, never a semantics knob. Small value
  * domains force bucket-boundary landings, degenerate (point) intervals,
  * inverted intervals, shared buckets, and empty sides. */
class RangeJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // quarter-step doubles in [-5, 5]: many exact bucket-edge hits
  private val vGen: Gen[Double] = Gen.choose(-20, 20).map(_ / 4.0)
  private val pointsGen: Gen[List[Double]] =
    Gen.choose(0, 15).flatMap(n => Gen.listOfN(n, vGen))
  private val ivalsGen: Gen[List[(Double, Double)]] =
    Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, Gen.zip(vGen, vGen)))
  private val widthGen: Gen[Double] = Gen.oneOf(0.25, 0.3, 1.0, 2.5, 7.0, 100.0)

  test("pointInInterval ≡ naive filter for arbitrary inputs and widths") {
    val prop = Prop.forAll(pointsGen, ivalsGen, widthGen) { (ps, ivs, w) =>
      val expected = (for {
        (p, pi) <- ps.zipWithIndex
        ((lo, hi), ii) <- ivs.zipWithIndex
        if lo <= hi && p >= lo && p <= hi
      } yield (pi, ii)).sorted
      val got = RangeJoin.pointInInterval(
          ps.zipWithIndex.map(_.swap).toDF("pid", "p").repartition(3), "p",
          ivs.zipWithIndex.map { case ((lo, hi), i) => (i, lo, hi) }
            .toDF("iid", "lo", "hi").repartition(2), "lo", "hi", w)
        .select($"pid", $"iid").as[(Int, Int)].collect().toSeq.sorted
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("intervalOverlap ≡ naive filter, pairs exactly once, any width") {
    val prop = Prop.forAll(ivalsGen, ivalsGen, widthGen) { (ls, rs, w) =>
      val expected = (for {
        ((alo, ahi), ai) <- ls.zipWithIndex
        ((blo, bhi), bi) <- rs.zipWithIndex
        if alo <= ahi && blo <= bhi && alo <= bhi && blo <= ahi
      } yield (ai, bi)).sorted
      val got = RangeJoin.intervalOverlap(
          ls.zipWithIndex.map { case ((lo, hi), i) => (i, lo, hi) }
            .toDF("ai", "alo", "ahi").repartition(2), "alo", "ahi",
          rs.zipWithIndex.map { case ((lo, hi), i) => (i, lo, hi) }
            .toDF("bi", "blo", "bhi").repartition(3), "blo", "bhi", w)
        .select($"ai", $"bi").as[(Int, Int)].collect().toSeq.sorted
      got == expected // sorted list compare: a twice-matched pair fails
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
