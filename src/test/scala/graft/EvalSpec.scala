package graft

import org.apache.spark.sql.functions._
import graft.operators.Eval

/** Threshold-free eval: hand-checked tie-aware AUC, PR-curve points,
  * degenerate one-class labels, and bucket-boundary invariance of the
  * two-level prefix sum. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  // one-vs-rest fixture: label "p" scored over 6 docs, gold p for 3.
  // scores: pos {9, 5, 5}, neg {7, 5, 1}  (one three-way tie at 5)
  private def scored = Seq(
    (1L, "p", 9L), (2L, "p", 5L), (3L, "p", 5L),
    (4L, "p", 7L), (5L, "p", 5L), (6L, "p", 1L)
  ).toDF("doc_id", "label", "score_micro")
  private def gold = Seq(
    (1L, "p"), (2L, "p"), (3L, "p"),
    (4L, "n"), (5L, "n"), (6L, "n")
  ).toDF("doc_id", "gold")

  test("aucPerLabel: hand-checked tie-aware Mann-Whitney") {
    // pairs (pos, neg): 9 beats 7,5,1 -> 3; each 5 beats 1, ties 5,
    // loses to 7 -> 1 + 0.5 each. U = 3 + 1.5 + 1.5 = 6; 2U = 12.
    // AUC = 6 / 9.
    val r = Eval.aucPerLabel(scored, gold).collect().head
    assert(r.getAs[Long]("n_pos") == 3L)
    assert(r.getAs[Long]("n_neg") == 3L)
    assert(r.getAs[Long]("u2") == 12L)
    assert(r.getAs[Double]("auc") == 12.0 / 18.0)
  }

  test("aucPerLabel: perfect separation gives 1.0, inverted gives 0.0") {
    val s = Seq((1L, "p", 10L), (2L, "p", 9L), (3L, "p", 1L), (4L, "p", 0L))
      .toDF("doc_id", "label", "score_micro")
    val g = Seq((1L, "p"), (2L, "p"), (3L, "n"), (4L, "n")).toDF("doc_id", "gold")
    assert(Eval.aucPerLabel(s, g).collect().head.getAs[Double]("auc") == 1.0)
    val gInv = Seq((1L, "n"), (2L, "n"), (3L, "p"), (4L, "p")).toDF("doc_id", "gold")
    assert(Eval.aucPerLabel(s, gInv).collect().head.getAs[Double]("auc") == 0.0)
  }

  test("aucPerLabel: single-class label yields NULL auc") {
    val s = Seq((1L, "p", 3L), (2L, "p", 4L)).toDF("doc_id", "label", "score_micro")
    val g = Seq((1L, "p"), (2L, "p")).toDF("doc_id", "gold")
    val r = Eval.aucPerLabel(s, g).collect().head
    assert(r.getAs[Long]("n_neg") == 0L && r.isNullAt(r.fieldIndex("auc")))
  }

  test("aucPerLabel: invariant under bucketBits (two-level prefix == flat)") {
    // negative and positive scores straddling bucket boundaries
    val s = Seq((1L, "p", -1048577L), (2L, "p", -1048576L), (3L, "p", -1L),
      (4L, "p", 0L), (5L, "p", 1048575L), (6L, "p", 1048576L))
      .toDF("doc_id", "label", "score_micro")
    val g = Seq((1L, "n"), (2L, "p"), (3L, "n"), (4L, "p"), (5L, "n"), (6L, "p"))
      .toDF("doc_id", "gold")
    val expected = Eval.aucPerLabel(s, g, bucketBits = 62).collect().head.getAs[Long]("u2")
    for (bits <- Seq(1, 20, 40))
      assert(Eval.aucPerLabel(s, g, bucketBits = bits)
        .collect().head.getAs[Long]("u2") == expected)
  }

  test("prCurvePerLabel: hand-checked operating points") {
    val pts = Eval.prCurvePerLabel(scored, gold).collect()
      .map(r => r.getAs[Long]("threshold_micro") ->
        ((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
          r.getAs[Double]("prec"), r.getAs[Double]("recall")))).toMap
    // t=9: keep {9} -> tp 1 fp 0; t=7: {9,7} -> tp 1 fp 1;
    // t=5: {9,7,5,5,5} -> tp 3 fp 2; t=1: everything -> tp 3 fp 3
    assert(pts(9L) == ((1L, 0L, 1.0, 1.0 / 3)))
    assert(pts(7L) == ((1L, 1L, 0.5, 1.0 / 3)))
    assert(pts(5L) == ((3L, 2L, 0.6, 1.0)))
    assert(pts(1L) == ((3L, 3L, 0.5, 1.0)))
    assert(pts.size == 4)
  }

  test("plan shape: every window partitions on (label, bucket) or label-bucket totals — none on label alone over raw scores") {
    // the 100 TB contract: the level-2 window runs within (label, bucket)
    // — a single (label)-partitioned cumsum over the distinct-score frame
    // would put one label's whole score range on one task
    // two windows by design: the PER-SCORE cumsum must carry the bucket
    // key (label, b) — never label alone, which would put a label's whole
    // score range on one task; the label-only window is legal ONLY for the
    // bucket-total prefix (bucket-cardinality-sized frame).
    val plan = Eval.aucPerLabel(scored, gold).queryExecution.executedPlan.toString
    // physical form: `Window [fns], [partitionCols], [orderCols]`
    val windowSpecs = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\], \\[".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val shapes = windowSpecs.map(_.split(",").map(_.trim.takeWhile(_ != '#')).toSeq)
    assert(shapes.contains(Seq("label", "b")),
      s"per-score cumsum must partition on (label, bucket):\n$plan")
    assert(shapes.forall(s => s == Seq("label", "b") || s == Seq("label")),
      s"unexpected window partitioning in:\n$plan")
  }

  test("prCurvePerLabel: per-label partitioning keeps labels independent") {
    val s = Seq((1L, "a", 5L), (2L, "a", 3L), (1L, "b", 4L), (2L, "b", 6L))
      .toDF("doc_id", "label", "score_micro")
    val g = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "gold")
    val byLabel = Eval.prCurvePerLabel(s, g).collect()
      .groupBy(_.getAs[String]("label")).view.mapValues(_.length).toMap
    assert(byLabel == Map("a" -> 2, "b" -> 2))
    // label a: pos has score 5 (doc1), neg 3 -> at t=5 tp=1 fp=0
    val a5 = Eval.prCurvePerLabel(s, g).filter($"label" === "a" && $"threshold_micro" === 5)
      .collect().head
    assert(a5.getAs[Long]("tp") == 1L && a5.getAs[Long]("fp") == 0L)
  }

  test("categoricalMi: zero for independence, ln 2 for a perfect 2x2 coupling") {
    // independent: every (x, y) cell equally likely → every PMI exactly 0
    val ind = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v")).toDF("x", "y")
    val ri = Eval.categoricalMi(ind, "x", "y").collect()
    assert(ri.forall(_.getAs[Long]("pmi_micro") == 0L))
    assert(ri.forall(_.getAs[Long]("mi_micro") == 0L))
    // deterministic coupling x↔y: MI = ln 2 (micro-quantized per cell)
    val dep = Seq(("a", "u"), ("a", "u"), ("b", "v"), ("b", "v")).toDF("x", "y")
    val rd = Eval.categoricalMi(dep, "x", "y").collect()
    val ln2micro = math.round(math.log(2.0) * 1e6) // 693147
    assert(rd.forall(_.getAs[Long]("pmi_micro") == ln2micro))
    assert(rd.head.getAs[Long]("mi_micro") == 4L * ln2micro)
    assert(math.abs(rd.head.getAs[Double]("mi_nats") - math.log(2.0)) < 1e-5)
  }

  test("bigramOverlap: hand-checked clipped counts, exact F1 ppm, NULL on gramless sides") {
    // cand 0 "a b a b c": bigrams (a,b)x2 (b,a) (b,c) → 4 grams
    // ref  1 "a b c a b": bigrams (a,b)x2 (b,c) (c,a) → 4 grams
    // clipped overlap: min(2,2)[a b] + min(1,0)[b a] + min(1,1)[b c] = 3
    // prec = rec = 3/4; f1_ppm = 2*3*1e6 div 8 = 750000
    // pair (2,3): cand "solo" has no bigrams → overlap 0, precision NULL
    val docs = Seq((0L, "a b a b c"), (1L, "a b c a b"),
      (2L, "solo"), (3L, "x y")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (2L, 3L)).toDF("cand_id", "ref_id")
    val r = Eval.bigramOverlap(pairs, docs).orderBy("cand_id").collect()
    assert(r(0).getAs[Long]("n_overlap") == 3L)
    assert(r(0).getAs[Long]("n_cand") == 4L && r(0).getAs[Long]("n_ref") == 4L)
    assert(r(0).getAs[Double]("precision") == 0.75 && r(0).getAs[Double]("recall") == 0.75)
    assert(r(0).getAs[Long]("f1_ppm") == 750000L)
    assert(r(1).getAs[Long]("n_overlap") == 0L)
    assert(r(1).isNullAt(r(1).fieldIndex("precision")), "0/0 precision must be NULL")
    assert(r(1).getAs[Long]("f1_ppm") == 0L)
  }
}
