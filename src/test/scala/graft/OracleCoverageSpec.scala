package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every query exposed through the driver's correctness gate must carry a
  * DuckDB oracle, or sit on the explicit allowlist below with a reason. A
  * query that lands without either fails CI here instead of silently getting
  * the driver's weaker rows-only check (the `no_oracle` rows in
  * CORRECTNESS_r*.json).
  */
class OracleCoverageSpec extends AnyFunSuite {

  /** Queries whose outputs are deliberately not SQL-portable. Additions need
    * a justification comment AND a spec pinning the behavior instead. */
  // Empty since round 8: the two approx sketches (percentile, HLL) now
  // hash their accuracy CONTRACTS (ε-rank window / 3×rsd band evaluated
  // in-plan, oracle emits the expected booleans), so every gate query is
  // oracled. Additions need a justification comment AND a spec pinning
  // the behavior instead.
  private val noOracleAllowlist: Map[String, String] = Map.empty

  test("every gate query has an oracle or an allowlisted reason") {
    val oracled = SparkEntry.oracleSql.keySet
    val missing = SparkEntry.queries.keySet -- oracled -- noOracleAllowlist.keySet
    assert(missing.isEmpty,
      s"queries without oracle or allowlist entry: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("allowlist entries are live queries that really lack an oracle") {
    val stale = noOracleAllowlist.keySet.filterNot(SparkEntry.queries.contains)
    assert(stale.isEmpty, s"allowlisted names no longer exist: $stale")
    val shadowed = noOracleAllowlist.keySet.filter(SparkEntry.oracleSql.contains)
    assert(shadowed.isEmpty, s"allowlisted but actually oracled (remove): $shadowed")
  }

  test("query names are unique across query families") {
    val dup = SparkEntry.allQueries.groupBy(_.name).collect {
      case (n, qs) if qs.size > 1 => n
    }
    assert(dup.isEmpty, s"duplicate query names: $dup")
  }
}
