package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, Text}

/** Document deduplication operators — the library surface behind the
  * q_x_dedup_* gate queries. Input contract: a DataFrame with an id column
  * and a text column; outputs are pair/cluster frames.
  *
  * Scale invariant shared by all near-dup variants: candidate pairs come
  * from EQUALITY joins on blocking keys (prefix, MinHash band, SimHash
  * half), never from a cross join — shuffle volume is O(docs × keys) and
  * per-bucket work is bucket², with AQE handling skewed buckets. Exact
  * verification (Jaccard / Hamming) runs only on candidates.
  */
object TextDedup {

  /** Exact dedup: one hash aggregate, keep the smallest id per content hash. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** id + toks + distinct 3-shingles + 3-token-prefix blocking key. */
  def shingled(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("toks"))
      .withColumn("sh", Text.shingles("toks"))
      .withColumn("pfx", concat_ws(" ", slice(col("toks"), 1, 3)))

  /** Prefix-blocked n-gram Jaccard near-dup pairs (id1 < id2, jac ≥ t). */
  def ngramJaccard(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val s = shingled(docs)
    val a = s.select(col("doc_id").as("id1"), col("sh").as("sh1"), col("pfx"))
    val b = s.select(col("doc_id").as("id2"), col("sh").as("sh2"), col("pfx"))
    a.join(b, Seq("pfx")).filter(col("id1") < col("id2"))
      .withColumn("jaccard", Text.jaccard("sh1", "sh2"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** MinHash signatures + banded LSH candidates + exact-Jaccard verify.
    * One md5 per shingle; the k permutations are affine maps mod 2^31-1
    * (operands bounded so the arithmetic never overflows a long). */
  def minhashLsh(docs: DataFrame, threshold: Double = 0.5,
      numHashes: Int = 16, numBands: Int = 8): DataFrame = {
    require(numHashes % numBands == 0, "numHashes must be divisible by numBands")
    val rows = numHashes / numBands
    val P = 2147483647L
    def aj(j: Int): Long = 2L * j + 3
    def bj(j: Int): Long = 101L * j + 7

    val base = shingled(docs).withColumn("hs",
      expr(s"transform(sh, s -> CAST(conv(substring(md5(s),1,15),16,10) AS BIGINT) % $P)"))
    val sigs = (0 until numHashes).foldLeft(base) { (df, j) =>
      df.withColumn(s"sig$j", expr(s"array_min(transform(hs, h -> (${aj(j)} * h + ${bj(j)}) % $P))"))
    }
    val bandKeys = (0 until numBands).map { bn =>
      val parts = (0 until rows).map(r => col(s"sig${rows * bn + r}"))
      concat((lit(s"$bn|") +: parts.flatMap(p => Seq(p, lit(":"))).dropRight(1)): _*)
    }
    // Candidate formation carries ONLY (id, band): the shingle arrays would
    // otherwise ride through the explode→join→distinct shuffle (measured 10×
    // slowdown at bench scale; at 100 TB the band shuffle must be id-sized).
    // Shingles are joined back just for the verify step.
    val bands = sigs.select(col("doc_id"), explode(array(bandKeys: _*)).as("band"))
    val cands = bands.select(col("doc_id").as("id1"), col("band"))
      .join(bands.select(col("doc_id").as("id2"), col("band")), Seq("band"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val shd = shingled(docs).select(col("doc_id"), col("sh"))
    cands
      .join(shd.select(col("doc_id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(shd.select(col("doc_id").as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("jaccard", Text.jaccard("sh1", "sh2"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Near-dup CLUSTERS from a pair list: connected components by iterative
    * min-label propagation (each node adopts the smallest id reachable so
    * far; converges in O(diameter) rounds ≤ maxIters). The cluster minimum
    * is the canonical "keep" document; everything else is droppable.
    *
    * Scale shape: each round is one groupBy over the edge list — the
    * standard large-graph connected-components pattern (label propagation,
    * not union-find, because state must live in the data, not the driver).
    * Near-dup graphs have tiny diameters (dup clusters are cliques-ish), so
    * a handful of rounds suffices at any corpus size.
    */
  def clusters(pairs: DataFrame, maxIters: Int = 10): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct().cache()
    val nodes = edges.select(col("src").as("id")).distinct()
    var labels = nodes.withColumn("label", col("id")).cache()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("label", "nl"), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min(col("nl")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).count()
      labels.unpersist() // `changed` materialized `next`; the old cache is dead
      labels = next
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val h = docs.select(col(idCol).as("doc_id"), explode(Text.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), Hashing.hash64(col("tok")).as("h"))
    val votes = (0 until 32).map(i =>
      sum(when(expr(s"shiftright(h, $i) & 1") === 1, 1).otherwise(-1)).as(s"b$i"))
    val voted = h.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val fp = (0 until 32).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    voted.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs: block on either 16-bit half, verify popcount. */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val withHalves = simhash(docs).select(col("doc_id"), col("simhash"),
      expr("shiftright(simhash, 16)").as("hi"), expr("simhash & 65535").as("lo"))
    def half(k: String) = withHalves.select(col("doc_id").as("id1"), col("simhash").as("f1"), col(k))
      .join(withHalves.select(col("doc_id").as("id2"), col("simhash").as("f2"), col(k)), Seq(k))
      .filter(col("id1") < col("id2")).select(col("id1"), col("id2"), col("f1"), col("f2"))
    half("hi").unionByName(half("lo")).distinct()
      .withColumn("hamming", expr("bit_count(f1 ^ f2)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }
}
