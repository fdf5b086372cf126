package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PageRank-style link centrality over an edge list — the graph-quality
  * signal of large-scale pretraining data curation (host/URL authority from
  * the crawl's link graph decides what gets kept; cf. the harmonic-centrality
  * filtering on Common Crawl in public corpus pipelines), and a generic
  * iterative-graph primitive (the reference's warehouse has no graph op;
  * this is part of the training-pipeline extension surface).
  *
  * ==Exactness==
  * Ranks live in FIXED-POINT BIGINT (scale 1e9), every step is integer
  * arithmetic (`div` truncation on non-negative operands matches DuckDB's
  * floor `//`), so a fixed iteration count yields bit-identical ranks on
  * any engine and any parallelism — no float summation order anywhere. The
  * deliberate trade: truncated contributions leak mass (total rank decays a
  * few ulps per iteration), which is irrelevant for ranking/filtering and
  * is the price of cross-engine determinism.
  *
  * ==Scale shape==
  * Each iteration is one join of the edge list with the key-cardinality
  * rank frame plus one groupBy(dst) — the standard Pregel-on-relations
  * shape: shuffle cost O(edges) per iteration, co-partitioned on the join
  * key, no all-pairs and no driver-side graph state (the only collect is
  * the 1-row node count, folded in as a broadcast scalar). Iterations are
  * a FIXED small count (the API contract), so lineage stays bounded
  * without checkpointing.
  */
object GraphRank {

  final val Scale = 1000000000L // 1e9 fixed-point

  /** Undirected expansion of a directed edge list: both directions, so no
    * node is dangling (every node has outdegree ≥ 1 by construction). */
  def undirected(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame =
    edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()

  /** `iters` rounds of damped PageRank over `edges` (directed; use
    * [[undirected]] first for symmetric authority). Nodes = every endpoint.
    * Damping is the rational `dampNum/100` (default 85/100) kept in integer
    * arithmetic. Returns (node BIGINT, rank BIGINT) at scale 1e9.
    *
    * rank₀(v)   = Scale div N
    * rankₖ₊₁(v) = ((100−d)·Scale div 100) div N
    *              + d · Σ_{u→v} (rankₖ(u) div outdeg(u)) div 100
    *
    * Dangling nodes (outdeg 0 in a directed graph) simply leak their mass —
    * acceptable for ranking; eliminate them via [[undirected]]. */
  def pageRank(edges: DataFrame, iters: Int = 3, dampNum: Int = 85): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= 100)
    // materialize the (often distinct-heavy) edge build ONCE: it feeds
    // nodes + outdeg + every iteration's join, and without truncation each
    // iteration's plan re-runs the whole upstream pipeline (measured ~2×
    // end-to-end on the co-purchase gates). Same localCheckpoint device as
    // TextDedup.clusters' rounds.
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    // nodes/outdeg are node-cardinality frames referenced by EVERY
    // iteration level of the lazy rank plan — truncate them too, or each
    // level re-runs their distinct/agg shuffles
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    // 1-row node count riding every row as a broadcast scalar (the same
    // no-collect pattern as the salted-join census)
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // the edge⋈outdeg join is STATIC across iterations — hoist it out of
    // the loop and materialize once; each iteration then pays exactly one
    // rank-side join + one dst aggregation
    val eDeg = e.join(outdeg, "src").localCheckpoint()

    // SQL `div` (IntegralDivide) — the Column API has no integral-divide
    // operator, and float `/` + floor would be off-by-one in the last ulp
    // on long operands; `div` truncation on non-negative values ≡ DuckDB `//`.
    var rank = nodes.crossJoin(broadcast(n))
      .select(col("node"), expr(s"$Scale div n_nodes").as("rank"))
    val base = (100L - dampNum) * Scale / 100L // driver-side exact constant
    for (_ <- 1 to iters) {
      val contrib = eDeg
        .join(rank.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("rank div outdeg")).as("inflow"))
      rank = nodes.crossJoin(broadcast(n))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr(s"($base div n_nodes) + (($dampNum * coalesce(inflow, 0)) div 100)")
            .as("rank"))
    }
    rank
  }

  /** Personalized PageRank (random-walk-with-restart): the restart mass
    * concentrates on `seeds` instead of spreading uniformly, so ranks
    * measure proximity TO THE SEED SET — the "items similar to these" /
    * query-biased authority shape. Same fixed-point BIGINT arithmetic and
    * per-iteration O(edges) shuffle as [[pageRank]]; the only differences
    * are the seed-indicator join (seed set is query-sized → broadcast) and
    * the restart term `(100−d)·Scale div 100 div n_seeds` paid only on
    * seed rows. Non-seed nodes unreachable from the seeds stay at rank 0 —
    * exactly the pruning a recommender wants. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int = 3,
      dampNum: Int = 85): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= 100)
    // one edge materialization for nodes/outdeg/all iterations (see pageRank)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val sd = seeds.select(col("node").cast("long").as("node")).distinct()
      .withColumn("is_seed", lit(1L))
    val ns = sd.agg(count(lit(1)).as("n_seeds"))
    val eDeg = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
      "src").localCheckpoint() // static across iterations, see pageRank
    val base = (100L - dampNum) * Scale / 100L
    // greatest(n_seeds, 1): an EMPTY seed set means is_seed = 0 on every
    // row, so the numerator is already 0 — the floor only prevents the
    // 0-div-0 ANSI error and yields the correct all-zero ranks
    val withSeed = nodes.join(broadcast(sd), Seq("node"), "left")
      .crossJoin(broadcast(ns))
      .select(col("node"), coalesce(col("is_seed"), lit(0L)).as("is_seed"),
        greatest(col("n_seeds"), lit(1L)).as("n_seeds"))
    var rank = withSeed.select(col("node"),
      expr(s"(is_seed * $Scale) div n_seeds").as("rank"))
    for (_ <- 1 to iters) {
      val contrib = eDeg
        .join(rank.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("rank div outdeg")).as("inflow"))
      rank = withSeed.join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr(s"((is_seed * $base) div n_seeds) + " +
            s"(($dampNum * coalesce(inflow, 0)) div 100)").as("rank"))
    }
    rank
  }

  /** Co-occurrence edge list from (group, item) memberships: an edge (a, b),
    * a < b, for every item pair sharing ≥ `minShared` groups. Pair volume is
    * Σ per-group k² — bounded by the LARGEST GROUP, never corpus² (the same
    * contract as the n-gram blocking buckets; at web scale, cap or sample
    * oversized groups before calling — TPC-H orders hold ≤7 parts, so the
    * fixture needs no cap). `minShared` ≥ 2 is the standard sparsifier:
    * one shared basket is noise, repeat co-occurrence is signal. */
  def coOccurrenceEdges(memberships: DataFrame, groupCol: String, itemCol: String,
      minShared: Long = 2L): DataFrame = {
    val m = memberships.select(col(groupCol).cast("long").as("g"),
      col(itemCol).cast("long").as("i")).distinct()
    m.as("x").join(m.as("y"),
        col("x.g") === col("y.g") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("a"), col("b"))
  }

  /** Exact triangle count over an ordered edge list (a < b on every row) —
    * the clustering-coefficient numerator, and the classic test that a
    * relational engine can do graph analytics without an adjacency-matrix
    * blowup. Shape: two equi-joins on node keys (edges⋈edges forming open
    * wedges, then one membership probe closing them) + one count — no
    * node-cardinality collect, no cross join; wedge volume is Σ deg(b)²
    * over middle nodes, the standard bound. Returns one row
    * (n_nodes, n_edges, n_triangles). */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    val wedges = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("wa"), col("e1.b").as("wb"), col("e2.b").as("wc"))
    val tris = wedges.join(e.as("e3"),
      col("wa") === col("e3.a") && col("wc") === col("e3.b"))
    val nodes = e.select(col("a").as("n")).union(e.select(col("b").as("n"))).distinct()
    nodes.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(tris.agg(count(lit(1)).as("n_triangles"))))
  }
}
