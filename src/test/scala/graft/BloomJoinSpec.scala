package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

/** Bloom join pruning: the no-false-negative contract (pruned join ≡ plain
  * join), membership of every build key, and the sizing-bound FPR on a
  * disjoint probe set. */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: pruned join equals the plain join as a multiset") {
    val build = (1L to 50L).map(_ * 7).toDF("k")
    val probe = (1L to 2000L).flatMap(i => Seq(i, i)).toDF("k") // dup rows too
    val f = BloomJoin.buildFilter(build, "k", 100L, 4000L)
    val pruned = BloomJoin.prune(probe, "k", f).join(build, "k")
    val plain = probe.join(build, "k")
    assert(plain.exceptAll(pruned).count() == 0 &&
      pruned.exceptAll(plain).count() == 0)
    // every build key is a member of its own filter
    assert(build.filter(BloomJoin.mightContain(f, col("k"))).count() == 50)
  }

  test("false-positive rate stays within the (items, bits) sizing bound") {
    val build = (1L to 1000L).toDF("k")
    val f = BloomJoin.buildFilter(build, "k", 1000L, 8000L) // 8 bits/key ≈ 2% fpp
    val disjoint = (1000001L to 1010000L).toDF("k")
    val fps = disjoint.filter(BloomJoin.mightContain(f, col("k"))).count()
    assert(fps <= (10000 * 0.05).toLong, s"observed $fps false positives / 10000")
  }

  test("pruning filter sits map-side over the scan, inside codegen, no exchange") {
    // a LocalRelation probe would constant-fold the filter at optimize
    // time — use a real file scan so the runtime shape is visible
    val build = (1L to 10L).toDF("k")
    val f = BloomJoin.buildFilter(build, "k", 10L, 800L)
    val probe = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_partkey").as("k"))
    val plan = BloomJoin.prune(probe, "k", f).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(800))
    assert(!plan.contains("Exchange"), "pruning must not shuffle: " + plan.take(800))
    assert(plan.linesIterator.exists(l =>
      l.contains("*(1) Filter") && l.contains("might_contain")),
      "filter must run inside WholeStageCodegen over the scan: " + plan.take(800))
  }
}
