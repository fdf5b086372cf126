package graft

import org.apache.spark.sql.functions._
import graft.queries._

/** Sanity over the full gate surface on sf0.001: every query plans, runs,
  * and satisfies a structural property. (Exact oracle equality is checked by
  * dev/check_oracles.py against DuckDB — this suite guards plan-ability and
  * the internal invariants an oracle can't express.) */
class QueriesSpec extends SparkSpec {

  test("every declared query has unique name; every oracle key has a query") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("all queries run non-crashing on sf0.001") {
    SparkEntry.allQueries.foreach { q =>
      val n = q.fn(spark, sf0001).count()
      assert(n >= 0, s"${q.name} failed")
    }
  }

  test("dedup family agrees on the planted near-dups") {
    val ngram = rows(SparkEntry.queries("q_x_dedup_ngram")(spark, sf0001)
      .select("id1", "id2")).map(r => (r(0), r(1))).toSet
    val minhash = rows(SparkEntry.queries("q_x_dedup_minhash")(spark, sf0001)
      .select("id1", "id2")).map(r => (r(0), r(1))).toSet
    // LSH recall: every minhash candidate pair that verified is a true
    // near-dup pair found by the exact blocked scan
    assert(minhash.subsetOf(ngram))
    assert(minhash.nonEmpty)
  }

  test("embed top-k: ranks are 1..5 per query id, sims in [-1,1]") {
    val topk = SparkEntry.queries("q_x_embed_topk")(spark, sf0001).cache()
    val badRank = topk.groupBy("qid").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .filter(col("n") =!= 5 || col("mx") =!= 5)
    assert(badRank.count() == 0)
    assert(topk.filter(col("sim") > 1.0 || col("sim") < -1.0).count() == 0)
    topk.unpersist()
  }

  test("approx group quantiles: ε-rank bound holds per group (gated booleans)") {
    // the r8 gate form hashes the sketch CONTRACT, not the sketch value:
    // per group, the returned element's rank interval must intersect
    // (q ± 1/accuracy)·N. The query evaluates the bound itself — here we
    // assert it covers every group and never emits false.
    val exact = rows(SparkEntry.queries("q_x_group_quantiles")(spark, sf0001)
      .select("lang").orderBy("lang"))
    val bound = rows(SparkEntry.queries("q_x_group_quantiles_approx")(spark, sf0001)
      .select("lang", "p50_in_eps", "p90_in_eps").orderBy("lang"))
    assert(exact.map(_.head) == bound.map(_.head), "one bound row per group")
    bound.foreach { r =>
      assert(r(1) == true && r(2) == true,
        s"lang ${r.head}: sketch violated its ε-rank bound: $r")
    }
  }

  test("approx distinct users: 3x-rsd contract booleans hold per group") {
    // r8 gate form: the query evaluates |estimate − exact| ≤ 3·rsd·exact+1
    // itself and the oracle hashes the expected trues. Here: non-empty
    // coverage, exact counts agree with the exact twin, booleans all true.
    val exact = rows(SparkEntry.queries("q_x_user_distinct")(spark, sf0001)
      .select("event_type", "n_users")).map(r => r(0) -> r(1).asInstanceOf[Long]).toMap
    val bound = rows(SparkEntry.queries("q_x_user_distinct_approx")(spark, sf0001))
    assert(bound.map(_.head).toSet == exact.keySet, "one row per event type")
    bound.foreach { r =>
      assert(r(1) == exact(r.head), s"${r.head}: exact count drifted: $r")
      assert(r(2) == true, s"${r.head}: HLL estimate outside 3x rsd: $r")
    }
  }

  test("IVF probe is a sound approximation of brute force") {
    val brute = rows(graft.operators.VectorSearch.bruteForceTopK(
        Q.t(spark, sf0001, "embeddings"), col("vec_id") < 20, 1)
      .select("qid", "sim")).map(r => r(0) -> r(1).asInstanceOf[Double]).toMap
    val ivf = rows(graft.operators.VectorSearch.ivfProbeTopK(
        Q.t(spark, sf0001, "embeddings"), col("vec_id") < 20, 1)
      .select("qid", "sim")).map(r => r(0) -> r(1).asInstanceOf[Double]).toMap
    // every probed best is ≤ the true best, never better
    ivf.foreach { case (qid, sim) => assert(sim <= brute(qid) + 1e-12, s"qid $qid") }
    assert(ivf.nonEmpty)
  }

  test("validator handles an empty input frame") {
    val empty = Q.t(spark, sf0001, "customer").limit(0)
    val res = graft.ops.Validator.validate(empty,
      graft.model.TableSpec("t", Seq(
        graft.model.ColumnSpec("c_custkey", org.apache.spark.sql.types.LongType, notNull = true)),
        primaryKey = Seq("c_custkey")))
    assert(res.ok && res.rowCount == 0)
  }

  test("validation summary: no nulls; dup-key count matches an independent scan") {
    // (the synthetic lineitem deliberately contains duplicate
    // (l_orderkey, l_linenumber) pairs — the validator must surface them)
    val r = rows(SparkEntry.queries("q_c1_validate_summary")(spark, sf0001)).head
    assert(r(0).asInstanceOf[Long] > 0)                    // row_count
    assert(r(1) == 0L && r(2) == 0L)                       // no nulls
    assert(r(3) == 0L)                                     // no VARCHAR over-width
    val expectedDups = Q.t(spark, sf0001, "lineitem")
      .groupBy("l_orderkey", "l_linenumber").count().filter(col("count") > 1).count()
    assert(r(4) == expectedDups && expectedDups > 0)
  }

  test("fact build: TotalPrice arithmetic and FK completeness at sf0.001") {
    val fact = SparkEntry.queries("q_c3_fact_build")(spark, sf0001).cache()
    assert(fact.count() == 6000)
    val bad = fact.filter(abs(col("totalprice") - col("unitprice") * col("quantity")) > 0.01)
    assert(bad.count() == 0)
    assert(fact.filter(col("customerkey").isNull || col("productkey").isNull ||
      col("storekey").isNull || col("orderdateid").isNull).count() == 0)
    fact.unpersist()
  }

  test("bucketed fact twin: zero hash-partition exchange, identical rows") {
    // force the big-big shape: tiny sf0.001 inputs would auto-broadcast and
    // hide the bucketing question entirely (at 100 TB neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plain = SparkEntry.queries("q_c3_fact_build")(spark, sf0001)
      val bucketed = SparkEntry.queries("q_x_bucketed_fact")(spark, sf0001)
      // the unbucketed build pays a hash shuffle on orderid for the big-big
      // orders ⋈ details join … (dim-build distinct() shuffles exist in both
      // plans — the join key is what bucketing eliminates)
      assert(plain.queryExecution.executedPlan.toString.contains("hashpartitioning(orderid"))
      // … the co-bucketed build pays none, and its scans report bucketing
      val bPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bPlan.contains("hashpartitioning(orderid"),
        s"bucketed fact build must not shuffle on the join key:\n$bPlan")
      assert(bPlan.contains("Bucketed: true"))
      // same rows either way (multiset equality via sorted collect)
      val cols = plain.columns.map(col).toIndexedSeq
      assert(rows(bucketed.orderBy(cols: _*)) == rows(plain.orderBy(cols: _*)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
