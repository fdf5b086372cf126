package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** PCA: Gram/moment exactness, dominant-direction recovery on an
  * anisotropic blob, the exact-zero centered-projection invariant, and
  * determinism of the quantized power iteration. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // 3-D points stretched along (2, 1, 0)/√5 with small off-axis noise:
  // the dominant variance direction is unambiguous.
  private def blob = {
    val pts = (0 until 40).map { i =>
      val t = (i - 20) * 0.1
      val noise = ((i * 37) % 7 - 3) * 0.004
      (i.toLong, Array((2 * t + noise).toFloat, (t - noise).toFloat, (noise * 0.5).toFloat))
    }
    pts.toDF("vec_id", "embedding")
  }

  test("gramStats: exact moments on a hand-checkable fixture") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(3.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val g = Pca.gramStats(df)
    assert(g.n == 2 && g.dim == 2)
    // quantized: (10000, 20000), (30000, -10000)
    assert(g.sums.toSeq == Seq(40000L, 10000L))
    assert(g.gram(0)(0) == 10000L * 10000 + 30000L * 30000)
    assert(g.gram(0)(1) == 10000L * 20000 + 30000L * -10000L)
    assert(g.gram(1)(1) == 20000L * 20000 + 10000L * 10000)
    assert(g.gram(1)(0) == g.gram(0)(1), "stored full-symmetric")
  }

  test("principal direction recovers the stretched axis (sign-normalized)") {
    val g = Pca.gramStats(blob)
    val v = Pca.principalDirection(Pca.covNumerator(g))
    // expected direction ∝ (2, 1, 0): ratio v1/v0 ≈ 0.5, v2 ≈ 0
    assert(v(0) == 1000000L, "dominant component pinned at the scale")
    assert(math.abs(v(1) / 1e6 - 0.5) < 0.02, s"got ${v.toSeq}")
    assert(math.abs(v(2)) < 30000L, s"off-axis ~0, got ${v.toSeq}")
    assert(v(0) > 0, "sign convention: first nonzero positive")
  }

  test("centered projections sum to EXACTLY zero") {
    val g = Pca.gramStats(blob)
    val v = Pca.principalDirection(Pca.covNumerator(g))
    val total = Pca.project(blob, g, v).agg(sum(col("pc1_num"))).head().getDecimal(0)
    assert(total.signum == 0, s"Σ n·(q·v) − (s·v) must cancel exactly, got $total")
  }

  test("mergeGram: shard halves combine to the one-scan moments exactly") {
    val full = Pca.gramStats(blob)
    val even = Pca.gramStats(blob.filter(col("vec_id") % 2 === 0))
    val odd = Pca.gramStats(blob.filter(col("vec_id") % 2 === 1))
    val merged = Pca.mergeGram(even, odd)
    assert(merged.n == full.n)
    assert(merged.sums.toSeq == full.sums.toSeq)
    assert(merged.gram.map(_.toSeq).toSeq == full.gram.map(_.toSeq).toSeq)
    intercept[IllegalArgumentException] {
      Pca.mergeGram(full, Pca.gramStats(
        Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")))
    }
  }

  test("power iteration is deterministic and ragged dims refuse") {
    val g = Pca.gramStats(blob)
    val v1 = Pca.principalDirection(Pca.covNumerator(g))
    val v2 = Pca.principalDirection(Pca.covNumerator(Pca.gramStats(blob)))
    assert(v1.toSeq == v2.toSeq)
    val ragged = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f))).toDF("vec_id", "embedding")
    intercept[Exception] { Pca.gramStats(ragged) }
  }
}
