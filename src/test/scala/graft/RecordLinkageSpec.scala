package graft

import graft.operators.RecordLinkage

/** FastSS deletion-neighborhood fuzzy matching: hand-checked edit-1 kinds
  * (substitution / insertion / deletion / exact dup), no false positives,
  * and brute-force equivalence on a randomized corpus — the blocking must
  * be provably lossless for distance ≤ 1. */
class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(recs: Seq[(Long, String)]): Set[(Long, Long, Long)] =
    RecordLinkage.editNeighborPairs(recs.toDF("id", "name"), "id", "name")
      .select("id1", "id2", "dist").as[(Long, Long, Long)].collect().toSet

  test("all three edit kinds and exact duplicates match; distance-2 does not") {
    val got = pairs(Seq(
      (1L, "abc"), (2L, "abd"),  // substitution
      (3L, "ab"),                // deletion of c
      (4L, "abcd"),              // insertion of d
      (5L, "abc"),               // exact duplicate of 1
      (6L, "xyz")))              // unrelated
    assert(got == Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L), (1L, 5L, 0L),
      (2L, 3L, 1L),               // "abd" vs "ab"
      (2L, 4L, 1L),               // "abd" vs "abcd" (delete c)
      (3L, 5L, 1L), (4L, 5L, 1L), (2L, 5L, 1L)))
  }

  test("brute-force equivalence: blocking is lossless for distance <= 1") {
    val rnd = new scala.util.Random(7)
    val recs = (0L until 60L).map(i =>
      (i, (0 until (2 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = Seq(d(i - 1)(j) + 1, d(i)(j - 1) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
      d(a.length)(b.length)
    }
    val expect = (for {
      (i1, s1) <- recs; (i2, s2) <- recs if i1 < i2
      d = lev(s1, s2) if d <= 1
    } yield (i1, i2, d.toLong)).toSet
    assert(pairs(recs) == expect)
  }

  test("single-char and empty names do not error") {
    val got = pairs(Seq((1L, "a"), (2L, "b"), (3L, ""), (4L, "ab")))
    // "a"~"b" share the "" deletion variant (dist 1); ""~single-char dist 1;
    // "ab" matches "a" and "b" (deletion), not "" (dist 2)
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L),
      (1L, 4L, 1L), (2L, 4L, 1L)))
  }

  test("duplicated NULL/empty keys never pair (keyless is not a match signal)") {
    import org.apache.spark.sql.functions.col
    val recs = Seq((1L, ""), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String]), (5L, "abc"), (6L, "abc"))
      .toDF("id", "name")
    val got = graft.operators.RecordLinkage.editNeighborPairs(recs, "id", "name")
      .select(col("id1"), col("id2"), col("dist"))
      .as[(Long, Long, Long)].collect().toSet
    // only the real duplicated key pairs; no (1,2) empty-empty, no (3,4)
    assert(got == Set((5L, 6L, 0L)))
  }
}
