package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KMeans

/** Property: the map-side assignment expression must equal a direct in-JVM
  * argmax over the model's centroids — the integer score 2·q·c − c·c with
  * ties to the smallest cluster id — for arbitrary vectors and models
  * (including negative coordinates, exact ties from duplicated vectors,
  * and k larger than the distinct-point count). */
class KMeansPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 3
  // quarter-step floats in [-2, 2]: exact quantization, frequent ties
  private val coordGen: Gen[Float] = Gen.choose(-8, 8).map(_ / 4.0f)
  private val vecGen: Gen[Seq[Float]] = Gen.listOfN(Dim, coordGen).map(_.toSeq)
  private val vecsGen: Gen[List[Seq[Float]]] =
    Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, vecGen))

  /** The engine's quantization, replicated driver-side (round = HALF_UP). */
  private def quantize(v: Seq[Float]): Array[Long] =
    v.map(x => BigDecimal(x.toDouble * graft.operators.VectorSearch.Scale)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray

  private def refAssign(q: Array[Long], m: KMeans.Model): Long =
    m.centroids.map { case (cid, c) =>
      val score = 2 * q.zip(c).map { case (a, b) => a * b }.sum - c.map(x => x * x).sum
      (-score, cid.toLong)
    }.min._2

  test("assign ≡ in-JVM argmax over model centroids for arbitrary inputs") {
    val prop = Prop.forAll(vecsGen, Gen.choose(1, 4), Gen.choose(0, 2)) { (vecs, k, iters) =>
      val emb = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val model = KMeans.fit(emb, k, iters)
      val got = KMeans.assign(emb, model).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      vecs.zipWithIndex.forall { case (v, i) =>
        got(i.toLong) == refAssign(quantize(v), model)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("roundedMean is exact rational floor(s/w + 1/2), incl. .5 boundaries") {
    // Adversarial case where a DECIMAL128 intermediate quotient flips the
    // integer: w odd ~4e18, quotient = m + 1/2 − 1/(2w) with m = 1e15. The
    // true value sits 1.25e-19 BELOW the boundary (→ m), but a 34-digit
    // quotient rounds to exactly m + 0.5 (→ m + 1).
    val w = BigInt("4000000000000000001")
    val m = BigInt("1000000000000000")
    val s = (w * (2 * m + 1) - 1) / 2
    assert(KMeans.roundedMean(s, w) == m)
    val old = (BigDecimal(s) / BigDecimal(w) + 0.5)
      .setScale(0, BigDecimal.RoundingMode.FLOOR).toBigInt
    assert(old == m + 1, "the DECIMAL128 path really is wrong here")
    // Exact half rounds UP (floor(x + 1/2) semantics), both signs.
    assert(KMeans.roundedMean(BigInt(5), BigInt(2)) == 3)  // 2.5 → 3
    assert(KMeans.roundedMean(BigInt(-5), BigInt(2)) == -2) // −2.5 → −2
    // Property: matches a 60-digit MathContext reference for random values.
    val mc = new java.math.MathContext(60)
    val prop = Prop.forAll(Gen.choose(Long.MinValue / 4, Long.MaxValue / 4),
        Gen.choose(1L, Long.MaxValue / 4)) { (sv, wv) =>
      val ref = (BigDecimal(sv, mc) / BigDecimal(wv, mc) + 0.5)
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toBigInt
      KMeans.roundedMean(BigInt(sv), BigInt(wv)) == ref
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
