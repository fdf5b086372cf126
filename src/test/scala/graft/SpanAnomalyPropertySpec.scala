package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Anomaly, TextDedup}

/** Property equivalence for the span-scrub and k-sigma operators against
  * direct in-JVM references — tiny alphabets force heavy span collisions,
  * overlapping flagged windows, and exact statistical ties. */
class SpanAnomalyPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- scrubDuplicatedSpans vs naive reference ----

  private val W = 3
  private def refScrub(docs: List[(Long, String)]): Map[Long, (String, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    // corpus-wide multiset of width-W windows
    val all = toks.toSeq.flatMap { case (id, ts) =>
      if (ts.length < W) Seq.empty
      else (0 to ts.length - W).map(p => (id, p, ts.slice(p, p + W).mkString(" ")))
    }
    val counts = all.groupBy(_._3).view.mapValues(_.size).toMap
    docs.map { case (id, _) =>
      val ts = toks(id)
      val flagged = (0 to ts.length - W).filter(p =>
        ts.length >= W && counts(ts.slice(p, p + W).mkString(" ")) >= 2)
      val kept = ts.indices.filterNot(i => flagged.exists(p => i >= p && i <= p + W - 1))
        .map(ts)
      id -> (kept.mkString(" "), ts.length.toLong, kept.length.toLong)
    }.toMap
  }

  private val docGen: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
      .map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, docGen))

  test("scrubDuplicatedSpans ≡ naive reference for arbitrary corpora (w=3)") {
    val prop = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expected = refScrub(docs)
      val got = TextDedup.scrubDuplicatedSpans(docs.toDF("doc_id", "text"), width = W)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- scrubDuplicatedSpansKeepOne vs naive reference ----

  private def refScrubKeepOne(docs: List[(Long, String)]): Map[Long, (String, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val all = docs.flatMap { case (id, _) =>
      val ts = toks(id)
      if (ts.length < W) Seq.empty
      else (0 to ts.length - W).map(p => (id, p, ts.slice(p, p + W).mkString(" ")))
    }
    // all occurrences of duplicated spans EXCEPT the (doc_id, pos)-minimal
    // keeper per span — exactly the published keep-one rule
    val flagged: Set[(Long, Int)] = all.groupBy(_._3).filter(_._2.size >= 2).values
      .flatMap(_.sortBy(o => (o._1, o._2)).drop(1).map(o => (o._1, o._2))).toSet
    docs.map { case (id, _) =>
      val ts = toks(id)
      val kept = ts.indices
        .filterNot(i => flagged.exists { case (d, p) => d == id && i >= p && i <= p + W - 1 })
        .map(ts)
      id -> (kept.mkString(" "), ts.length.toLong, kept.length.toLong)
    }.toMap
  }

  test("scrubDuplicatedSpansKeepOne ≡ naive keep-one reference (w=3)") {
    val prop = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expected = refScrubKeepOne(docs)
      val got = TextDedup.scrubDuplicatedSpansKeepOne(docs.toDF("doc_id", "text"), width = W)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("keep-one keeps exactly one occurrence: a twice-repeated span survives once") {
    val docs = List(
      (1L, "x y z q r s t u"),     // span "x y z" also in doc 2
      (2L, "a b c x y z d e"))
    val got = TextDedup.scrubDuplicatedSpansKeepOne(docs.toDF("doc_id", "text"), width = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 holds the (doc_id, pos)-minimal occurrence → untouched;
    // doc 2 loses the covered tokens
    assert(got(1L) == "x y z q r s t u")
    assert(got(2L) == "a b c d e")
    // the blanket form scrubs BOTH occurrences
    val blanket = TextDedup.scrubDuplicatedSpans(docs.toDF("doc_id", "text"), width = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(blanket(1L) == "q r s t u" && blanket(2L) == "a b c d e")
  }

  // ---- int8Components bound property ----

  private val vecGen: Gen[List[Float]] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n,
      Gen.choose(-2000, 2000).map(_ / 1000.0f)))

  test("int8Components: codes in [-127,127] and reconstruction within scale/2 for arbitrary vectors") {
    val prop = Prop.forAll(Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, vecGen))) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val out = graft.operators.VectorSearch.int8Components(df).collect()
      val q = df.select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.posexplode(
          graft.operators.VectorSearch.quantize("embedding"))
          .as(Seq("pos", "v"))).collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong) -> r.getLong(2)).toMap
      out.forall { r =>
        val (id, pos, v8, scale) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
        val orig = q((id, pos))
        math.abs(v8) <= 127 &&
          (scale == 0.0 && orig == 0L && v8 == 0L ||
            scale > 0 && math.abs(orig - v8 * scale) <= scale / 2 + 1e-9)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- sigmaOutliers vs exact BigInt reference ----

  private val seriesGen: Gen[List[(String, Long)]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.oneOf("A", "B"), Gen.choose(-50L, 50L))))

  private def refFlags(series: List[(String, Long)]): Seq[(String, Int, Boolean)] =
    series.zipWithIndex.groupBy(_._1._1).toSeq.flatMap { case (k, pts) =>
      val vs = pts.map(_._1._2).map(BigInt(_))
      val n = BigInt(vs.size)
      val s = vs.sum
      val ssd = vs.map(v => (n * v - s).pow(2)).sum
      pts.map { case ((_, v), idx) =>
        (k, idx, (n * v - s).pow(2) * (n - 1) > 9 * ssd)
      }
    }

  test("sigmaOutliers ≡ exact BigInt reference for arbitrary series") {
    val prop = Prop.forAll(seriesGen) { series =>
      val df = series.zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v) }
        .toDF("k", "t", "v")
      val got = Anomaly.sigmaOutliers(df, Seq("k"), "v").collect()
        .map(r => (r.getString(0), r.getLong(1).toInt, r.getBoolean(3))).toSet
      got == refFlags(series).map(f => (f._1, f._2, f._3)).toSet
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
