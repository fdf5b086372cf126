package graft

import org.apache.spark.sql.functions._
import graft.operators.Privacy

/** k-anonymity: audit arithmetic, suppression postcondition (the released
  * table IS k-anonymous), NULL-class survival. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // classes: (A,1)×4, (A,2)×2, (B,1)×1 → k=3: two small classes, 3 rows at risk
  private def df = Seq(
    ("A", 1L), ("A", 1L), ("A", 1L), ("A", 1L),
    ("A", 2L), ("A", 2L), ("B", 1L)
  ).toDF("qa", "qb")

  test("audit: class census, rows at risk, actual k") {
    val r = Privacy.kAnonymityAudit(df, Seq("qa", "qb"), 3L).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 2L, 3L, 1L)))
  }

  test("suppression: survivors form a k-anonymous table, nothing else dropped") {
    val kept = Privacy.suppressSmallClasses(df, Seq("qa", "qb"), 3L)
    assert(kept.count() == 4L)
    // postcondition: every surviving class has size >= k
    val minClass = Privacy.kAnonymityAudit(kept, Seq("qa", "qb"), 3L)
      .head().getLong(3)
    assert(minClass >= 3L)
  }

  test("NULL quasi-identifiers form ONE class and survive when large enough") {
    val withNulls = Seq[(Option[String], Option[Long])](
      (None, None), (None, None), (None, None), (Some("A"), Some(1L))
    ).toDF("qa", "qb")
    val kept = Privacy.suppressSmallClasses(withNulls, Seq("qa", "qb"), 2L)
    assert(kept.count() == 3L, "the 3-row NULL class must survive k=2")
    assert(kept.filter(col("qa").isNotNull).count() == 0L)
  }

  test("l-diversity: homogeneous classes flagged even when k-anonymous") {
    // class (A): 4 rows but all share sensitive 's1' → homogeneous at l=2;
    // class (B): 2 rows, 2 distinct sensitive values → diverse
    val df = Seq(
      ("A", "s1"), ("A", "s1"), ("A", "s1"), ("A", "s1"),
      ("B", "s1"), ("B", "s2")
    ).toDF("qa", "sens")
    val r = Privacy.lDiversityAudit(df, Seq("qa"), "sens", 2L).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 4L, 1L)))
  }

  test("k=1 keeps everything; k above max class size drops everything") {
    assert(Privacy.suppressSmallClasses(df, Seq("qa", "qb"), 1L).count() == 7L)
    assert(Privacy.suppressSmallClasses(df, Seq("qa", "qb"), 5L).count() == 0L)
  }

  test("tClosenessAudit: hand-checked EMD; class matching the global distribution scores 0") {
    // global buckets {0:2, 1:2}; class A all-bucket-0, class B all-bucket-1
    // → each class's EMD vs global = 0.5 → 500000 ppm exactly
    val skewed = Seq(("A", 0L), ("A", 0L), ("B", 1L), ("B", 1L)).toDF("seg", "bb")
    val r = Privacy.tClosenessAudit(skewed, Seq("seg"), "bb", tPpm = 100000L)
      .collect().map(x => x.getString(0) -> (x.getAs[Long]("emd_ppm"),
        x.getAs[Boolean]("t_ok"))).toMap
    assert(r == Map("A" -> (500000L, false), "B" -> (500000L, false)))
    // a class whose distribution IS the global one scores exactly 0
    val balanced = Seq(("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L)).toDF("seg", "bb")
    val r2 = Privacy.tClosenessAudit(balanced, Seq("seg"), "bb", tPpm = 100000L)
      .collect().map(x => x.getString(0) -> x.getAs[Long]("emd_ppm")).toMap
    assert(r2 == Map("A" -> 0L, "B" -> 0L))
  }
}
