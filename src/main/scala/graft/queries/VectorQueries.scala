package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Cross-engine exactness strategy: floats are quantized to integers
  * (round(x*10000)) before any arithmetic, so dot products and norms are
  * EXACT integers (well under 2^53) on both engines; the final cosine is one
  * IEEE divide/sqrt over identical inputs → bitwise-identical doubles, which
  * makes top-k ranks and thresholds deterministic.
  *
  * Scale design:
  *  - [[q_x_embed_topk]] is the brute-force baseline: broadcast the (small)
  *    query set against the full corpus — one scan, no shuffle, O(Q·N) work
  *    fanned across executors.
  *  - [[q_x_dedup_embed]] is the scale path: random-hyperplane LSH buckets
  *    (deterministic planes derived from md5) turn all-pairs similarity into
  *    an equi-join on bucket id — O(Σ bucket²) ≪ O(N²). The same shape backs
  *    an IVF-style ANN: probe the query's bucket instead of the corpus.
  */
object VectorQueries {

  /** Deterministic pseudo-random hyperplanes: plane p, dim j ↦ int in
    * [-1000, 1000], derived from md5("plane:p:j") exactly like Q.hash64 so
    * the constants can be embedded as literals on both engines. */
  private val numPlanes = 8
  private val dim = 64
  private def md5Hash64(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
  private val planes: Array[Array[Long]] =
    Array.tabulate(numPlanes, dim)((p, j) => md5Hash64(s"plane:$p:$j") % 2001L - 1000L)

  /** Quantized embedding (exact integer coordinates). */
  private val quantSpark = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT))"
  private val quantSql = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000, 0) AS DOUBLE))"

  private val dotSpark = "aggregate(zip_with(%s, %s, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
  private def dot(a: String, b: String) = dotSpark.format(a, b)

  val all: Seq[QueryDef] = Seq(

    // Brute-force cosine top-k: queries = vec_id < 50, k = 5, self excluded.
    QueryDef("q_x_embed_topk",
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), expr(quantSpark).as("q"))
          .withColumn("nn", expr(dot("q", "q")))
        val qs = broadcast(e.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("q").as("qv"), col("nn").as("qn")))
        val pairs = qs.join(e.select(col("vec_id").as("nid"), col("q").as("cv"), col("nn").as("cn")),
            col("qid") =!= col("nid"))
          .withColumn("sim", expr(
            s"CAST(${dot("qv", "cv")} AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))"))
        pairs.withColumn("rank",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("qid"), col("nid"), col("sim"), col("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id, $quantSql AS q FROM embeddings),
               n AS (SELECT vec_id, q, list_dot_product(q, q) AS nn FROM e),
               p AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                     list_dot_product(a.q, b.q) / sqrt(a.nn * b.nn) AS sim
                     FROM n a JOIN n b ON a.vec_id < 50 AND b.vec_id <> a.vec_id)
               SELECT qid, nid, sim, rank FROM (
                 SELECT qid, nid, sim,
                        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
                 FROM p) WHERE rank <= 5""")),

    // LSH-bucketed embedding near-dup: 8 random-hyperplane sign bits → 256
    // buckets; exact cosine ≥ 0.8 within buckets.
    QueryDef("q_x_dedup_embed",
      (s, d) => {
        val planeArr = planes.map(p => s"array(${p.mkString(", ")})")
        val bucketExpr = (0 until numPlanes).map { p =>
          s"(CASE WHEN ${dot("q", planeArr(p))} >= 0 THEN ${1L << p} ELSE 0 END)"
        }.mkString(" + ")
        val e = t(s, d, "embeddings").select(col("vec_id"), expr(quantSpark).as("q"))
          .withColumn("nn", expr(dot("q", "q")))
          .withColumn("bucket", expr(bucketExpr))
        val a = e.select(col("vec_id").as("id1"), col("q").as("q1"), col("nn").as("n1"), col("bucket"))
        val b = e.select(col("vec_id").as("id2"), col("q").as("q2"), col("nn").as("n2"), col("bucket"))
        a.join(b, Seq("bucket")).filter(col("id1") < col("id2"))
          .withColumn("sim", expr(
            s"CAST(${dot("q1", "q2")} AS DOUBLE) / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))"))
          .filter(col("sim") >= 0.8)
          .select(col("id1"), col("id2"), col("sim"))
      },
      Some {
        val planeList = planes.map(p => s"[${p.map(_.toDouble).mkString(", ")}]")
        val bucketSql = (0 until numPlanes).map { p =>
          s"(CASE WHEN list_dot_product(q, ${planeList(p)}) >= 0 THEN ${1L << p} ELSE 0 END)"
        }.mkString(" + ")
        s"""WITH e AS (SELECT vec_id, $quantSql AS q FROM embeddings),
            n AS (SELECT vec_id, q, list_dot_product(q, q) AS nn, $bucketSql AS bucket FROM e)
            SELECT a.vec_id AS id1, b.vec_id AS id2,
                   list_dot_product(a.q, b.q) / sqrt(a.nn * b.nn) AS sim
            FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.q, b.q) / sqrt(a.nn * b.nn) >= 0.8"""
      })
  )
}
