package graft

import org.apache.spark.sql.functions._
import graft.ops.Expectations
import graft.ops.Expectations._

/** Declarative expectation suite: per-helper violation semantics (NULL is
  * always a violation for value constraints), single-pass evaluation,
  * empty-input behavior, uniqueness and referential rows. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some(10.0), Some("OK"), Some("A-1")),
    (Some(2L), Some(-5.0), Some("OK"), Some("B-2")),
    (Some(3L), Some(50.0), Some("BAD"), Some("notmatching")),
    (None, None, None, None)
  ).toDF("id", "amount", "status", "code")

  private def result(name: String, out: Map[String, (Long, Boolean)]): (Long, Boolean) =
    out(name)

  test("check: each constraint family counts its own violations, NULL violates") {
    val out = Expectations.check(df, Seq(
        notNull("nn_id", col("id")),
        inRange("amount_range", col("amount"), lit(0.0), lit(100.0)),
        inSet("status_domain", col("status"), Seq("OK")),
        matches("code_format", col("code"), "^[A-Z]-[0-9]$")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(result("nn_id", out) == ((1L, false)))          // one NULL id
    assert(result("amount_range", out) == ((2L, false)))   // -5 and NULL
    assert(result("status_domain", out) == ((2L, false)))  // BAD and NULL
    assert(result("code_format", out) == ((2L, false)))    // notmatching and NULL
  }

  test("check: clean constraint passes with zero violations") {
    val out = Expectations.check(df.filter(col("id").isNotNull), Seq(
        notNull("nn_id", col("id")))).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq ==
      Seq(("nn_id", 0L, true)))
  }

  test("check: empty input is all-pass (0 violations, not NULL)") {
    val out = Expectations.check(df.filter(lit(false)), Seq(
        notNull("nn_id", col("id")),
        inRange("amount_range", col("amount"), lit(0.0), lit(1.0))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(("nn_id", 0L, true), ("amount_range", 0L, true)))
  }

  test("unique: counts EXCESS rows per duplicated key") {
    val keys = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val out = Expectations.unique(keys, "uk", Seq("k")).head()
    assert((out.getString(0), out.getLong(1), out.getBoolean(2)) == (("uk", 3L, false)))
    val clean = Expectations.unique(Seq(1L, 2L).toDF("k"), "uk", Seq("k")).head()
    assert(clean.getLong(1) == 0L && clean.getBoolean(2))
  }

  test("foreignKey: orphan child rows are counted, multiset-aware") {
    val child = Seq(1L, 1L, 2L, 9L, 9L, 9L).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Expectations.foreignKey(child, "fk", "ck", parent, "pk").head()
    assert((out.getString(0), out.getLong(1), out.getBoolean(2)) == (("fk", 3L, false)))
  }

  test("suite: row-level and table-level rows union into one report") {
    val rows = Expectations.check(df, Seq(notNull("nn_id", col("id"))))
    val rep = Expectations.suite(rows, Seq(
      Expectations.unique(df, "uk", Seq("id"))))
    assert(rep.count() == 2L)
    assert(rep.columns.toSeq == Seq("constraint", "n_violations", "pass"))
  }
}
