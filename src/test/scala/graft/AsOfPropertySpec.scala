package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** Property equivalence: the NATIVE physical as-of join
  * ([[graft.plans.AsOfJoinExec]]) must produce exactly the rows of the
  * union+window composition for arbitrary event sets — keys with no
  * matches, coincident timestamps, duplicate timestamps on both sides,
  * multiple partitions. */
class AsOfPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (event_id, key, ts, payload) with small key/ts domains to force
  // collisions, ties, and empty groups; occasional NULL keys/timestamps
  // exercise the nulls-first group/order parity with the window form
  private def sideGen(idBase: Long): Gen[List[(Long, Option[Long], Option[Long], Double)]] = for {
    n <- Gen.choose(0, 12)
    rows <- Gen.listOfN(n, for {
      k <- Gen.frequency(9 -> Gen.choose(1L, 4L).map(Option(_)), 1 -> Gen.const(None))
      t <- Gen.frequency(9 -> Gen.choose(0L, 10L).map(Option(_)), 1 -> Gen.const(None))
      v <- Gen.choose(0, 99)
    } yield (k, t, v / 10.0))
  } yield rows.zipWithIndex.map { case ((k, t, v), i) => (idBase + i, k, t, v) }

  test("native as-of join ≡ union+window composition for arbitrary inputs") {
    val prop = Prop.forAll(sideGen(100), sideGen(500)) { (lRows, rRows) =>
      val left = lRows.toDF("event_id", "user_id", "tus", "value").repartition(3)
      val right = rRows.toDF("event_id", "user_id", "tus", "value").repartition(2)
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.select("event_id", "user_id", "tus", "matched_event_id", "matched_value")
          .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val composed = norm(AsOfJoin.lastAtOrBefore(
        left, right, "user_id", "tus", "event_id", "value"))
      val native = norm(AsOfJoin.native(
        left, right, "user_id", "tus", "event_id", "value"))
      native == composed
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
