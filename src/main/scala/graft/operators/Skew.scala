package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import CacheGuard.PersistTrackedOps

/** Skew mitigation for big-big equi-joins (SCALE.md).
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit salting
  * remains the tool when one side has pathological hot keys (a power-law
  * order key, a null-heavy FK) and the OTHER side is small enough per key to
  * replicate: the skewed side gets a random salt in [0, n), the build side is
  * exploded n× with every salt value, and the join key becomes (key, salt) —
  * splitting each hot key's row group across n tasks.
  */
object Skew {

  /** Salted inner equi-join on `key`: `skewed ⋈ build` where `build`'s rows
    * are replicated `salts`× . Row multiset equals the plain join. */
  def saltedJoin(skewed: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val salted = skewed.withColumn("__salt",
      pmod(spark_hash(skewed.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val replicated = build.withColumn("__salt", explode(lit((0 until salts).toArray)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Random-ish but deterministic per-row salt source: hash of all columns
    * (avoids rand(), which breaks retry/replay determinism at scale). */
  private def spark_hash(cols: Column*): Column = abs(hash(cols: _*))

  /** Top-N heavy-hitter keys with counts — the diagnostic used to decide
    * whether a join needs salting and with how many salts. This is a full
    * groupBy+count over `df` (the shuffle is map-side combined to #keys,
    * but the SCAN is the whole frame): pass `sampleMod > 1` to estimate
    * from a deterministic 1-in-sampleMod row sample instead — per-key
    * counts scale linearly, so reported counts are sampled × sampleMod and
    * the argmax of a genuinely hot key is stable. The sample is keyed on a
    * full-row hash (rand() would break retry/replay determinism); fully
    * identical duplicate rows therefore sample together, which can lump a
    * hot key of REPEATED rows into 0 or sampleMod× — acceptable for a
    * salting heuristic, not for an exact census. */
  def heavyHitters(df: DataFrame, key: String, topN: Int = 20,
      sampleMod: Int = 1): DataFrame = {
    require(sampleMod >= 1)
    val base = if (sampleMod == 1) df
      else df.filter(pmod(spark_hash(df.columns.toIndexedSeq.map(col): _*),
        lit(sampleMod)) === 0)
    base.groupBy(col(key))
      .agg((count(lit(1)) * sampleMod).as("n"))
      .orderBy(col("n").desc, col(key)).limit(topN)
  }

  /** Replication cap for [[saltedJoinAuto]]: every salt multiplies the build
    * side's shuffle volume, so past a point more salts cost more than the
    * skew they cure. 64 splits a key that is 64× the target — beyond that
    * the key is better handled by a broadcast of its build rows or an AQE
    * skew split of the residual. */
  val MaxAutoSalts = 64

  /** Salt count derived from MEASURED skew, not caller guesswork: the
    * hottest key's row count divided by the target rows-per-task, so each
    * hot key splits into tasks of roughly `targetRowsPerTask` rows. Only
    * the RESULT is O(1) rows — the measurement itself scans the frame
    * (see [[heavyHitters]]); at 100 TB either pass `sampleMod` so the
    * estimate aggregates a 1-in-sampleMod slice, measure once on a cached/
    * pre-aggregated frame, or skip the probe and call [[saltedJoin]] with
    * an explicit salt count. Returns 1 (no salting needed) when no key
    * exceeds the target. */
  def chooseSalts(skewed: DataFrame, key: String, targetRowsPerTask: Long,
      sampleMod: Int = 1): Int = {
    require(targetRowsPerTask > 0)
    val top = heavyHitters(skewed, key, 1, sampleMod).collect()
    if (top.isEmpty) 1
    else {
      val hottest = top.head.getLong(1)
      val ideal = (hottest + targetRowsPerTask - 1) / targetRowsPerTask
      math.min(MaxAutoSalts.toLong, math.max(1L, ideal)).toInt
    }
  }

  /** [[saltedJoin]] with the salt count chosen from measured skew
    * ([[chooseSalts]]): no caller tuning knob to get wrong. Falls back to
    * the PLAIN join when no key exceeds the target — salting an unskewed
    * join only replicates the build side for nothing. Cost honesty: this
    * reads the probe side twice (once to measure, once to join); amortize
    * by probing a sample (`sampleMod`), persisting the input, or measuring
    * once per table release rather than per join. */
  def saltedJoinAuto(skewed: DataFrame, build: DataFrame, key: String,
      targetRowsPerTask: Long = 1000000L, sampleMod: Int = 1): DataFrame = {
    val salts = chooseSalts(skewed, key, targetRowsPerTask, sampleMod)
    if (salts == 1) skewed.join(build, Seq(key))
    else saltedJoin(skewed, build, key, salts)
  }

  /** Count–min sketch of `key` occurrence counts: `depth` independent hash
    * rows × 2^widthBits buckets, counts by portable md5 hashing
    * (rerun/engine/partitioning stable, unlike native `hash()`). The
    * `depth` row hashes are SLICES of one md5 per occurrence — 32 bits
    * each, four rows per digest (a second seeded digest covers depth 5–8)
    * — so hashing cost is ~1 md5/occurrence, not `depth`; md5 is the
    * portability tax and was the measured hot path. The frequency sketch
    * for streams and merges: sketches of shards ADD cell-wise (counts are
    * sums), so a 100 TB corpus sketches per-partition and merges
    * depth·width integers — the fixed-size complement of
    * [[heavyHitters]]' exact scan. */
  def cmsSketch(df: DataFrame, key: String, depth: Int = 4,
      widthBits: Int = 10): DataFrame = {
    val width = 1L << widthBits
    cmsBuckets(df.select(col(key).cast("string").as("k")), depth, width)
      .groupBy("s", "b").agg(count(lit(1)).as("c"))
  }

  /** (s, b) bucket coordinates for every row of `kFrame` (one `k` string
    * column) under the [[cmsSketch]] hash family: row `s`'s 32-bit hash is
    * hex slice `[8s mod 32, 8s mod 32 + 8)` of md5("<s div 4>:" + k). */
  private def cmsBuckets(kFrame: DataFrame, depth: Int, width: Long): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 16 && width <= (1L << 24))
    val nBlocks = (depth + 3) / 4
    val withDigests = (0 until nBlocks).foldLeft(kFrame) { (d, blk) =>
      d.withColumn(s"__h$blk", md5(concat(lit(s"$blk:"), col("k"))))
    }
    val sliceOf =
      if (nBlocks == 1) "substring(__h0, 1 + 8 * s, 8)"
      else "substring(CASE WHEN s < 4 THEN __h0 ELSE __h1 END, 1 + 8 * (s % 4), 8)"
    withDigests
      .select(col("*"), explode(lit((0 until depth).toArray)).as("s"))
      .select(col("k"), col("s"),
        pmod(conv(expr(sliceOf), 16, 10).cast("long"), lit(width)).as("b"))
  }

  /** The CMS point-query CONTRACT, evaluated on the data itself for the
    * `topN` true heavy hitters: the estimate never underestimates
    * (structural — every true occurrence increments all of a key's cells),
    * and overestimates by at most `boundMult`·N/width (the ε·N guarantee
    * with the min over `depth` rows driving the failure probability to
    * e^−depth; boundMult=3 ≫ the e ≈ 2.72 of the textbook bound). Output:
    * (rank, skey, true_n, cms_n, no_underestimate, within_bound) — a
    * drifting sketch implementation flips a hashed boolean.
    * Shape: two key-cardinality aggregates + a depth·topN-row probe join;
    * the topN cut is TakeOrderedAndProject (per-partition partial top-k,
    * no global sort). */
  def cmsContract(df: DataFrame, key: String, depth: Int = 4,
      widthBits: Int = 10, boundMult: Int = 3, topN: Int = 20): DataFrame = {
    val width = 1L << widthBits
    val it = df.select(col(key).cast("string").as("k"))
    val sk = cmsSketch(df, key, depth, widthBits)
    // one key-cardinality aggregate feeds top-N, the probe, AND the total
    // (nt = Σn) — without the persist, `top`'s scan+agg lineage would run
    // once per consumer (it feeds the probe join and the final select) and
    // the total would scan the input a third time
    val tru = it.groupBy("k").agg(count(lit(1)).as("n"))
      .persistTracked()
    val top = tru.orderBy(col("n").desc, col("k")).limit(topN)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("k"))).cast("long"))
      .localCheckpoint() // topN rows, eager — cuts the sort lineage for both consumers
    val est = cmsBuckets(top.select(col("k")), depth, width)
      .join(sk, Seq("s", "b"))
      .groupBy("k").agg(min("c").as("cms_n"))
    val tot = tru.agg(sum("n").as("nt"))
    top.join(est, Seq("k")).crossJoin(broadcast(tot))
      .select(col("rank"), col("k").as("skey"), col("n").as("true_n"),
        col("cms_n"),
        (col("cms_n") >= col("n")).as("no_underestimate"),
        ((col("cms_n") - col("n")) <= expr(s"($boundMult * nt) div $width"))
          .as("within_bound"))
  }
}
