package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeVocab

/** Property equivalence: the distributed BPE (vocab-collapsed learning,
  * fold-based merge application) must match a direct in-JVM reference
  * implementation of greedy left-to-right BPE for arbitrary corpora. A tiny
  * alphabet forces repeated chains (aaa…), boundary-sharing symbols, and
  * heavy ties — exactly the cases where a wrong merge rule diverges. */
class BpePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- reference implementation (lists of symbols, no Spark) ----

  /** One greedy left-to-right merge pass: fuse (l,r), skip after a fuse. */
  private def refMerge(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refPairCounts(vocab: Map[List[String], Long]): Map[(String, String), Long] =
    vocab.toSeq.flatMap { case (syms, freq) =>
      syms.zip(syms.drop(1)).map(p => p -> freq)
    }.groupMapReduce(_._1)(_._2)(_ + _)

  private def refLearn(words: Seq[String], steps: Int): List[(String, String, Long)] = {
    var vocab: Map[List[String], Long] = words.filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)
      .map { case (w, f) => w.map(_.toString).toList -> f }
    val merges = scala.collection.mutable.ListBuffer[(String, String, Long)]()
    var step = 0
    var done = false
    while (step < steps && !done) {
      val pc = refPairCounts(vocab)
      if (pc.isEmpty) done = true
      else {
        val ((l, r), w) = pc.minBy { case ((l, r), w) => (-w, l, r) }
        merges += ((l, r, w))
        vocab = vocab.toSeq.map { case (syms, f) => refMerge(syms, l, r) -> f }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
      step += 1
    }
    merges.toList
  }

  private def refEncodedLength(words: Seq[String],
      merges: List[(String, String, Long)]): Long =
    words.filter(_.nonEmpty).map { w =>
      merges.foldLeft(w.map(_.toString).toList) { case (syms, (l, r, _)) =>
        refMerge(syms, l, r)
      }.length.toLong
    }.sum

  // ---- generators: tiny alphabet, short words → chains + ties ----

  private val wordGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
      .map(_.mkString)
  private val corpusGen: Gen[List[String]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, wordGen))

  test("learn + encodedLength ≡ in-JVM greedy BPE for arbitrary corpora") {
    val prop = Prop.forAll(corpusGen) { words =>
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val merges = BpeVocab.learn(docs, 3)
      val expectedMerges = refLearn(words, 3)
      val mergesMatch =
        merges.map(m => (m.left, m.right, m.weight)) == expectedMerges
      val lenMatch = {
        val got = BpeVocab.encodedLength(docs, merges).collect()
        val expected = refEncodedLength(words, expectedMerges)
        if (expected == 0) got.isEmpty else got.head.getLong(1) == expected
      }
      mergesMatch && lenMatch
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("vocab-resident learn ≡ per-merge distributed loop, arbitrary corpora") {
    // The production path collects the word vocab once and loops in driver
    // memory; the distributed twin pays 2 Spark jobs per merge. Both must
    // emit the IDENTICAL merge sequence (step, left, right, weight) —
    // including tie steps, repeated chains, and early exhaustion.
    val prop = Prop.forAll(corpusGen, Gen.choose(1, 5)) { (words, steps) =>
      // split the corpus across two docs: learning must not depend on
      // document boundaries, only on the corpus word histogram
      val (w1, w2) = words.splitAt(words.length / 2)
      val docs = Seq((1L, w1.mkString(" ")), (2L, w2.mkString(" ")))
        .toDF("doc_id", "text")
      BpeVocab.learn(docs, steps) == BpeVocab.learnDistributed(docs, steps)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
