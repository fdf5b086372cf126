package graft

import org.apache.spark.sql.functions._
import graft.operators.NgramLm

/** The one cross-engine hazard the micro-nat contract leaves open: Spark and
  * DuckDB each evaluate `round(ln(x)·1e6)` with their OWN libm, and a
  * last-ulp `ln` disagreement flips the rounded integer exactly when
  * `ln(x)·1e6` sits on a half-integer boundary. This spec measures, for
  * EVERY distinct (c12, c1, V) combination the lm gates actually score on
  * the shipped test tiers, the distance of `ln((c12+1)/(c1+V))·1e6` from
  * the nearest 0.5 boundary — and asserts a margin ≥ 1e-6, about 250× the
  * ~4e-9 ulp scale of a double near 2e7. A failure here means the gate
  * corpus produced a boundary-straddling count pair and the oracle must
  * switch to the q_x_ndcg pattern (driver-baked integer literals in both
  * plans) for that tier. */
class MicroNatBoundarySpec extends SparkSpec {
  import spark.implicits._

  /** Distance of v's fractional part from the 0.5 rounding boundary. */
  private def boundaryDist(v: Double): Double = {
    val f = v - math.floor(v)
    math.abs(f - 0.5)
  }

  /** Min boundary distance over the distinct count pairs scoring joins
    * produce: seen (c12,c1), seen-context-unseen-pair (0,c1), and the
    * unseen-context floor (0,0) → 1/V. */
  private def minDistPooled(dir: String): (Double, Int) = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = NgramLm.trainBigram(docs.filter(col("doc_id") % 2 === 0))
    val pairs = NgramLm.bigrams(docs)
      .join(model.pairs, Seq("w1", "w2"), "left")
      .join(model.contexts, Seq("w1"), "left")
      .select(coalesce(col("c12"), lit(0L)).as("c12"),
        coalesce(col("c1"), lit(0L)).as("c1"))
      .distinct().as[(Long, Long)].collect()
    val v = model.vocabSize
    val ds = pairs.map { case (c12, c1) =>
      boundaryDist(math.log((c12 + 1).toDouble / (c1 + v)) * NgramLm.MicroScale) }
    (ds.min, pairs.length)
  }

  private def minDistPerLang(dir: String): (Double, Int) = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = NgramLm.trainBigramGrouped(
      docs.filter(col("doc_id") % 2 === 0), "lang")
    val triples = NgramLm.bigrams(docs, extraCols = Seq("lang"))
      .join(model.pairs, Seq("lang", "w1", "w2"), "left")
      .join(model.contexts, Seq("lang", "w1"), "left")
      .join(broadcast(model.vocab), Seq("lang"), "left")
      .filter(col("vs").isNotNull) // langs with no model score NULL, not ln
      .select(coalesce(col("c12"), lit(0L)).as("c12"),
        coalesce(col("c1"), lit(0L)).as("c1"), col("vs"))
      .distinct().as[(Long, Long, Long)].collect()
    val ds = triples.map { case (c12, c1, vs) =>
      boundaryDist(math.log((c12 + 1).toDouble / (c1 + vs)) * NgramLm.MicroScale) }
    (ds.min, triples.length)
  }

  private val tiers = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    .filter(d => new java.io.File(s"$d/documents.parquet").exists())

  test("pooled bigram LM: no count pair within 1e-6 of a rounding boundary") {
    assert(tiers.nonEmpty, "no test tiers present")
    tiers.foreach { dir =>
      val (min, n) = minDistPooled(dir)
      info(f"$dir: $n distinct count pairs, min boundary distance $min%.3e")
      assert(min > 1e-6,
        s"$dir: a scored count pair sits $min from a 0.5 micro-nat boundary " +
        "— driver-bake the count→micro-nat table for this tier")
    }
  }

  test("per-lang bigram LMs: no (c12,c1,V_lang) within 1e-6 of a boundary") {
    tiers.foreach { dir =>
      val (min, n) = minDistPerLang(dir)
      info(f"$dir: $n distinct count triples, min boundary distance $min%.3e")
      assert(min > 1e-6,
        s"$dir: a per-lang count triple sits $min from a 0.5 boundary")
    }
  }
}
