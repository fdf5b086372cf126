package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.run.{TrainingPipeline, TrainingPipelineConfig}

/** End-to-end corpus build: quality → dedup → sample → pack, committed as
  * atomic catalog tables, deterministic across reruns. */
class TrainingPipelineSpec extends SparkSpec {

  private def docs = graft.queries.Q.t(spark, sf0001, "documents")

  test("corpus build commits consistent tables and a consistent summary") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val cfg = TrainingPipelineConfig(samplePct = 50, seqTokens = 1024, shards = 4)
    val s = new TrainingPipeline(spark, cat).run(docs, cfg)

    assert(s.inputDocs == 500)
    assert(s.afterQuality <= s.inputDocs && s.afterQuality > 0)
    assert(s.afterDedup <= s.afterQuality)
    assert(s.afterSample <= s.afterDedup && s.afterSample > 0)
    assert(cat.read("training_corpus").count() == s.afterSample)
    assert(cat.read("training_sequences").count() == s.afterSample)
    assert(s.totalTokens > 0 && s.sequences > 0 && s.sequences <= s.afterSample)
    // every sequence stays within the token budget offset-wise
    assert(cat.read("training_sequences")
      .filter(col("offset") < 0 || col("offset") >= 1024).count() == 0)
  }

  test("rerun over the same input commits identical tables (determinism)") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val p = new TrainingPipeline(spark, cat)
    val cfg = TrainingPipelineConfig(samplePct = 30, seqTokens = 512, shards = 2)
    val s1 = p.run(docs, cfg)
    val ids1 = rows(cat.read("training_corpus").select("doc_id").orderBy("doc_id"))
    val s2 = p.run(docs, cfg)
    val ids2 = rows(cat.read("training_corpus").select("doc_id").orderBy("doc_id"))
    assert(s1 == s2)
    assert(ids1 == ids2)
  }

  test("gopher gate drops rule-violators map-side without changing the schema") {
    import spark.implicits._
    val good = ("the quick brown fox jumps over a lazy dog and then some more " * 3).trim
    val noStops = ("quick brown fox jumps over lazy dog runs far " * 4).trim
    val input = Seq(
      (1L, good, "en", "s", good.length.toLong),
      (2L, noStops, "en", "s", noStops.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val cfg = TrainingPipelineConfig(
      quality = graft.operators.QualityFilter.Thresholds(minTokens = 5, minStopRatio = 0.0),
      gopher = Some(graft.operators.QualityFilter.GopherThresholds(
        minWords = 10, maxWords = 500)),
      seqTokens = 256, shards = 1)
    val s = new TrainingPipeline(spark, cat).run(input, cfg)
    // doc 2 passes the base quality gate (stop ratio relaxed) but fails the
    // gopher stopword rule; doc 1 survives
    assert(s.afterQuality == 1)
    assert(rows(cat.read("training_corpus").select("doc_id")).flatten == Seq(1L))
    // no gopher metric columns leak into the committed corpus
    assert(!cat.read("training_corpus").columns.exists(_.startsWith("r_")))
    assert(!cat.read("training_corpus").columns.contains("mean_word_len"))
  }

  test("perplexity gate drops the most-surprising docs, short docs pass") {
    import spark.implicits._
    // 20 fluent in-distribution docs, 1 alien-vocab doc, 1 too-short doc —
    // the alien doc must be the (only) doc above the P90 xent cutoff.
    val fluent = (1L to 20L).map(i =>
      (i, "the cat sat on the mat and the dog sat on the rug again"))
    val alien = Seq((100L, "zxq qxz vbn nbv plm mlp wry yrw kjh hjk dfg gfd"))
    val short = Seq((200L, "hello")) // 1 token → no bigrams → NULL xent
    val input = (fluent ++ alien ++ short).map { case (id, t) =>
      (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val cfg = TrainingPipelineConfig(
      quality = graft.operators.QualityFilter.Thresholds(
        minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0),
      dedupExact = false, // the 20 identical fluent docs must all survive
      perplexityQuantile = Some(0.9), seqTokens = 256, shards = 1)
    val s = new TrainingPipeline(spark, cat).run(input, cfg)
    val kept = rows(cat.read("training_corpus").select("doc_id")).flatten.toSet
    assert(!kept.contains(100L), "alien-vocab doc must fall above the cutoff")
    assert(kept.contains(1L) && kept.contains(200L),
      "fluent and unscoreable-short docs must pass")
    assert(s.afterDedup == 21)
  }

  test("NB label-consistency gate drops the mislabeled doc, keeps agreeing ones") {
    import spark.implicits._
    // 10 clearly-"en" docs, 10 clearly-"fr" docs, and one doc whose text is
    // the fr distribution but whose label claims en — the classifier must
    // disagree with exactly that doc.
    val en = (1L to 10L).map(i => (i, s"hello world common text number $i", "en"))
    val fr = (21L to 30L).map(i => (i, s"bonjour monde texte commun numero $i", "fr"))
    val mislabeled = Seq((99L, "bonjour monde texte commun numero extra", "en"))
    val input = (en ++ fr ++ mislabeled).map { case (id, t, l) =>
      (id, t, l, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val cfg = TrainingPipelineConfig(
      quality = graft.operators.QualityFilter.Thresholds(
        minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0),
      nbLabelCol = Some("lang"), seqTokens = 256, shards = 1)
    val s = new TrainingPipeline(spark, cat).run(input, cfg)
    val kept = rows(cat.read("training_corpus").select("doc_id")).flatten.toSet
    assert(!kept.contains(99L), "label-inconsistent doc must drop")
    assert(kept.size == 20, "all label-consistent docs must survive")
    assert(s.afterSample == 20)
  }

  test("near-dup removal drops cluster non-keepers") {
    import spark.implicits._
    val base = (1 to 30).map(i => "tok" + i).mkString(" ")
    val nearDup = (1 to 28).map(i => "tok" + i).mkString(" ") + " tokX tokY"
    val other = (100 to 130).map(i => "w" + i).mkString(" ")
    val tiny = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val cfg = TrainingPipelineConfig(
      quality = graft.operators.QualityFilter.Thresholds(
        minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0),
      nearDupJaccard = Some(0.5), seqTokens = 64, shards = 1)
    val s = new TrainingPipeline(spark, cat).run(tiny, cfg)
    assert(s.afterDedup == 2) // doc 2 is a near-dup of doc 1 → dropped
    assert(rows(cat.read("training_corpus").select("doc_id").orderBy("doc_id"))
      .map(_.head) == Seq(1L, 3L))
  }

  test("near-dup priority keeper: the ranked source survives, not the min id") {
    import spark.implicits._
    val base = (1 to 30).map(i => "tok" + i).mkString(" ")
    val nearDup = (1 to 28).map(i => "tok" + i).mkString(" ") + " tokX tokY"
    // doc 1 (min id, priority 2) vs doc 2 (near-dup, priority 0): with the
    // priority column configured, doc 2 must win the cluster
    val tiny = Seq((1L, base, 2L), (2L, nearDup, 0L), (3L, "solo words only", 1L))
      .toDF("doc_id", "text", "prio")
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val cfg = TrainingPipelineConfig(
      quality = graft.operators.QualityFilter.Thresholds(
        minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0),
      nearDupJaccard = Some(0.5), nearDupPriorityCol = Some("prio"),
      seqTokens = 64, shards = 1)
    new TrainingPipeline(spark, cat).run(tiny, cfg)
    assert(rows(cat.read("training_corpus").select("doc_id").orderBy("doc_id"))
      .map(_.head) == Seq(2L, 3L))
  }

  test("scrub stage keeps one occurrence of a duplicated span and re-budgets tokens") {
    import spark.implicits._
    val open = graft.operators.QualityFilter.Thresholds(
      minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0)
    // docs 1 and 2 share a 3-token span; the rest is distinct
    val tiny = Seq(
      (1L, "x y z q r s t u"),
      (2L, "a b c x y z d e"),
      (3L, "m n o p q1 q2 q3 q4")).toDF("doc_id", "text")
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val cfg = TrainingPipelineConfig(quality = open, scrubSpans = Some(3),
      seqTokens = 64, shards = 1)
    new TrainingPipeline(spark, cat).run(tiny, cfg)
    val corpus = cat.read("training_corpus")
    val texts = rows(corpus.select("doc_id", "text").orderBy("doc_id"))
      .map(r => r(0) -> r(1)).toMap
    // the (doc_id, pos)-minimal occurrence survives; doc 2 loses the copy
    assert(texts(1L) == "x y z q r s t u")
    assert(texts(2L) == "a b c d e")
    assert(texts(3L) == "m n o p q1 q2 q3 q4")
    // the committed corpus carries NO cross-doc duplicated span any more
    assert(graft.operators.TextDedup.duplicatedSpans(corpus, width = 3).count() == 0)
    // n_tokens reflects the SCRUBBED text (doc 2: 8 → 5), so packing
    // budgets what actually ships
    assert(rows(corpus.filter(col("doc_id") === 2L).select("n_tokens")).head.head == 5L)
  }

  test("token budget caps each group's corpus tokens; selection is nested and deterministic") {
    import spark.implicits._
    val open = graft.operators.QualityFilter.Thresholds(
      minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0)
    val tiny = (1L to 30L).map(i =>
      (i, (1 to 10).map(j => s"w$i-$j").mkString(" "), s"g${i % 3}"))
      .toDF("doc_id", "text", "source")
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val cfg = TrainingPipelineConfig(quality = open,
      tokenBudget = Some(graft.run.TokenBudgetConfig("source", 35L)),
      seqTokens = 64, shards = 1)
    new TrainingPipeline(spark, cat).run(tiny, cfg)
    val perGroup = cat.read("training_corpus")
      .groupBy("source").agg(sum(col("n_tokens")).as("tok"))
    // every group fits the 35-token budget (each doc is 10 tokens → ≤3 docs)
    assert(rows(perGroup.select("tok")).flatten.forall(_.asInstanceOf[Long] <= 35L))
    assert(cat.read("training_corpus").count() > 0)
  }

  test("corpus-statistic gates: span-dup and bigram-coverage exclusions") {
    import spark.implicits._
    val copied = (1 to 12).map(i => "c" + i).mkString(" ")
    val tiny = Seq(
      (1L, s"the a of and in to $copied"),         // carries the copied run
      (2L, s"the a of and in to x1 $copied"),      // near-copy: same 12-token run
      (3L, "the a of and in to " + (1 to 12).map(i => "u" + i).mkString(" ")), // unique
      (4L, "zq1 zq2 zq3 zq4 zq5 zq6 the a of and in to"), // rare bigrams up front
      (5L, s"the a of and in to $copied")          // EXACT copy of doc 1
    ).toDF("doc_id", "text")
    val open = graft.operators.QualityFilter.Thresholds(
      minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0)
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    // span gate: exact dedup first collapses 5 into 1; of the KEEPERS,
    // docs 1,2 still share the 12-token run (near-dups, both above the
    // threshold → both drop, the gate's contract), 3,4 pass. The exact
    // copy must NOT cause doc 1's content to count against itself twice.
    val s1 = new TrainingPipeline(spark, cat).run(tiny, TrainingPipelineConfig(
      quality = open, maxSpanDupFraction = Some(0.4), seqTokens = 64, shards = 1,
      corpusTable = "span_gated", sequencesTable = "span_seqs"))
    val kept1 = rows(cat.read("span_gated").select("doc_id").orderBy("doc_id")).map(_.head)
    assert(kept1 == Seq(3L, 4L), s"span gate kept $kept1")
    assert(s1.afterQuality == 5) // map-side gates only
    // exact-copy survival: with ONLY exact copies in play, the span gate
    // must keep the canonical copy (pre-dedup stats would annihilate it)
    val copies = Seq((1L, copied), (2L, copied)).toDF("doc_id", "text")
    val s1b = new TrainingPipeline(spark, cat).run(copies, TrainingPipelineConfig(
      quality = open, maxSpanDupFraction = Some(0.4), seqTokens = 64, shards = 1,
      corpusTable = "copy_gated", sequencesTable = "copy_seqs"))
    assert(rows(cat.read("copy_gated").select("doc_id")).map(_.head) == Seq(1L))
    assert(s1b.afterDedup == 1)
    // coverage gate (runs on the deduped corpus): "w1 w2" appears in all 4
    // distinct docs (count 4 ≥ 3 → common); docs 1-3 score 1/2, doc 4
    // scores 1/4 → dropped at 0.5
    val covDocs = Seq(
      (1L, "w1 w2 w3"), (2L, "w1 w2 w4"), (3L, "w0 w1 w2"),
      (4L, "w1 w2 r1 r2 r3")).toDF("doc_id", "text")
    val s2 = new TrainingPipeline(spark, cat).run(covDocs, TrainingPipelineConfig(
      quality = open, minBigramCoverage = Some(0.5), seqTokens = 64, shards = 1,
      corpusTable = "cov_gated", sequencesTable = "cov_seqs"))
    assert(s2.afterQuality == 4)
    assert(rows(cat.read("cov_gated").select("doc_id").orderBy("doc_id")).map(_.head)
      == Seq(1L, 2L, 3L))
  }

  test("normalizeNfc collapses composed/decomposed copies; hapax gate drops gibberish") {
    import spark.implicits._
    val open = graft.operators.QualityFilter.Thresholds(
      minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0)
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    // docs 1 and 2 are the same text in composed vs decomposed spelling —
    // WITHOUT normalization they are different bytes and both survive
    // exact dedup; WITH normalizeNfc they collapse to the canonical copy
    val comp = "caf\u00e9 cr\u00e8me caf\u00e9 cr\u00e8me"
    val dec = "cafe\u0301 cre\u0300me cafe\u0301 cre\u0300me"
    val pair = Seq((1L, comp), (2L, dec)).toDF("doc_id", "text")
    val raw = new TrainingPipeline(spark, cat).run(pair, TrainingPipelineConfig(
      quality = open, seqTokens = 64, shards = 1,
      corpusTable = "nfc_off", sequencesTable = "nfc_off_seqs"))
    assert(raw.afterDedup == 2)
    val norm = new TrainingPipeline(spark, cat).run(pair, TrainingPipelineConfig(
      normalizeNfc = true, quality = open, seqTokens = 64, shards = 1,
      corpusTable = "nfc_on", sequencesTable = "nfc_on_seqs"))
    assert(norm.afterDedup == 1)
    assert(rows(cat.read("nfc_on").select("doc_id")).map(_.head) == Seq(1L))
    // hapax gate: docs 11/12 share vocabulary (only w5 is corpus-unique →
    // fractions 0 and 1/5); doc 13 is random-ID gibberish — every token
    // corpus-unique (fraction 1.0) → dropped
    val g = Seq(
      (11L, "w1 w2 w3 w4"), (12L, "w4 w3 w2 w1 w5"),
      (13L, "xq9 zk7 pv3 mm2")).toDF("doc_id", "text")
    val s = new TrainingPipeline(spark, cat).run(g, TrainingPipelineConfig(
      quality = open, maxHapaxFraction = Some(0.5), seqTokens = 64, shards = 1,
      corpusTable = "hapax_gated", sequencesTable = "hapax_seqs"))
    assert(rows(cat.read("hapax_gated").select("doc_id").orderBy("doc_id")).map(_.head)
      == Seq(11L, 12L))
    assert(s.afterDedup >= 1)
  }

  test("packByBpe budgets sequences in learned-tokenizer units") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "aaaa aaaa aaaa"), (2L, "aaaa bb"), (3L, "cc dd ee")).toDF("doc_id", "text")
    val open = graft.operators.QualityFilter.Thresholds(
      minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0)
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val s = new TrainingPipeline(spark, cat).run(tiny, TrainingPipelineConfig(
      quality = open, packByBpe = Some(1), seqTokens = 8, shards = 1))
    // merge 1 fuses (a,a): each 'aaaa' → [aa][aa] = 2 symbols
    // doc1 = 6, doc2 = 2+2 = 4, doc3 = 2+2+2 = 6 BPE symbols
    val merges = graft.operators.BpeVocab.learn(tiny, 1)
    val expect = rows(graft.operators.BpeVocab.encodedLength(tiny, merges)
      .orderBy("doc_id")).map(r => r(0) -> r(1)).toMap
    val seqs = rows(cat.read("training_sequences")
      .select("doc_id", "n_tokens").orderBy("doc_id"))
    assert(seqs.map(r => r(0) -> r(1)).toMap == expect)
    assert(s.totalTokens == expect.values.map(_.asInstanceOf[Long]).sum)
    // budget respected: every offset inside [0, seqTokens)
    assert(cat.read("training_sequences")
      .filter(col("offset") < 0 || col("offset") >= 8).count() == 0)
  }

  test("stripMarkup and blockedDomains stages clean before any statistic") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "<p>the plain good text stays here entirely</p><script>var spam=1;</script>"),
      (2L, "fine doc http://ads.bad.net/x linking into a blocked domain"),
      (3L, "another clean document with enough plain words")).toDF("doc_id", "text")
    val open = graft.operators.QualityFilter.Thresholds(
      minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0)
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    new TrainingPipeline(spark, cat).run(tiny, TrainingPipelineConfig(
      quality = open, stripMarkup = true, blockedDomains = Seq("bad.net")))
    val corpus = cat.read("training_corpus").select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(corpus.keySet == Set(1L, 3L), s"blocked doc must drop: ${corpus.keySet}")
    assert(corpus(1L) == "the plain good text stays here entirely",
      s"markup and script body must strip: '${corpus(1L)}'")
  }

  test("urlDedupCol keeps one capture per canonical URL before any stage") {
    import spark.implicits._
    val tiny = Seq(
      (5L, "recrawl copy of the page body words", "http://www.A.com/x"),
      (3L, "first capture of the page body words", "HTTP://a.com/x#frag"),
      (9L, "tracking recrawl of the page body words", "http://a.com/x?utm_source=s"),
      (7L, "a different page entirely with words", "http://b.com/y"))
      .toDF("doc_id", "text", "url")
    val open = graft.operators.QualityFilter.Thresholds(
      minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0)
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    new TrainingPipeline(spark, cat).run(tiny, TrainingPipelineConfig(
      quality = open, urlDedupCol = Some("url")))
    val kept = cat.read("training_corpus").select("doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(3L, 7L),
      s"min-id capture per canonical URL must survive: $kept")
  }

  test("curriculumPhases stages sequences easy→hard; exclusive with packByBpe") {
    import spark.implicits._
    val tiny = (1L to 40L).map(i => (i, Seq.fill(i.toInt)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val open = graft.operators.QualityFilter.Thresholds(
      minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0)
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    new TrainingPipeline(spark, cat).run(tiny, TrainingPipelineConfig(
      quality = open, curriculumPhases = Some(4), seqTokens = 64, shards = 2))
    val seqs = cat.read("training_sequences")
      .select("doc_id", "phase", "n_tokens").as[(Long, Long, Long)].collect()
    assert(seqs.map(_._2).toSet == Set(1L, 2L, 3L, 4L))
    // phase monotone in difficulty (n_tokens = doc_id here)
    val byPhase = seqs.groupBy(_._2).map { case (p, xs) => p -> xs.map(_._3) }
    assert(byPhase(1L).max <= byPhase(2L).min && byPhase(3L).max <= byPhase(4L).min)
    intercept[IllegalArgumentException] {
      new TrainingPipeline(spark, cat).run(tiny, TrainingPipelineConfig(
        quality = open, curriculumPhases = Some(4), packByBpe = Some(1)))
    }
  }

  test("repetition gate drops boilerplate; mixture applies per-group rates") {
    import spark.implicits._
    val varied = (1 to 40).map(i => "tok" + i).mkString(" ")
    val looped = Seq.fill(14)("buy now cheap").mkString(" ") // high repetition
    val tiny = Seq((1L, varied, "en"), (2L, looped, "en"), (3L, varied + " more", "fr"))
      .toDF("doc_id", "text", "lang")
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val open = graft.operators.QualityFilter.Thresholds(
      minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0)
    // repetition gate alone: the looped doc goes, the varied ones stay
    val s = new TrainingPipeline(spark, cat).run(tiny, TrainingPipelineConfig(
      quality = open, maxRepetition = Some(0.3), seqTokens = 64, shards = 1))
    assert(rows(cat.read("training_corpus").select("doc_id").orderBy("doc_id"))
      .map(_.head) == Seq(1L, 3L))
    assert(s.afterQuality == 2)
    // mixture: fr rate 0 drops doc 3 deterministically; en rate 100 keeps all en
    new TrainingPipeline(spark, cat).run(tiny, TrainingPipelineConfig(
      quality = open, seqTokens = 64, shards = 1,
      mix = Some(graft.run.MixtureConfig("lang", Map("en" -> 100, "fr" -> 0)))))
    assert(rows(cat.read("training_corpus").select("doc_id").orderBy("doc_id"))
      .map(_.head) == Seq(1L, 2L))
  }

  test("temperature stage flattens the majority language, keeps the minority whole") {
    import spark.implicits._
    def doc(lang: String, i: Int) =
      ((if (lang == "en") 0L else 100000L) + i,
        (1 to 30).map(t => s"${lang}w${i}t$t").mkString(" "), lang)
    // 4000 en vs 40 fr: α=1/2 keep-rates 1/10 and 1
    val docs = ((1 to 4000).map(doc("en", _)) ++ (1 to 40).map(doc("fr", _)))
      .toDF("doc_id", "text", "lang")
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val open = graft.operators.QualityFilter.Thresholds(
      minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0)
    new TrainingPipeline(spark, cat).run(docs, TrainingPipelineConfig(
      quality = open, seqTokens = 64, shards = 1,
      temperatureGroupCol = Some("lang")))
    val kept = rows(cat.read("training_corpus").groupBy("lang").count()
      .orderBy("lang")).map(r => r.head.toString -> r(1).asInstanceOf[Long]).toMap
    assert(kept("fr") == 40L, "minority language must keep everything")
    assert(math.abs(kept("en") - 400L) <= 80, s"majority ~sqrt-flattened, got $kept")
  }

  test("health check: collapsed source flags after history warms up") {
    import spark.implicits._
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val p = new TrainingPipeline(spark, cat)
    val open = graft.operators.QualityFilter.Thresholds(
      minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0)
    // 20 whitespace tokens per doc, unique text per (run, source, index)
    def corpus(run: Int, nA: Int, nB: Int) = {
      def doc(src: String, i: Int) =
        (run * 1000L + (if (src == "A") 0 else 500) + i,
          (1 to 20).map(t => s"r${run}${src}${i}t$t").mkString(" "), src)
      ((1 to nA).map(doc("A", _)) ++ (1 to nB).map(doc("B", _)))
        .toDF("doc_id", "text", "source")
    }
    val cfg = TrainingPipelineConfig(quality = open, seqTokens = 64, shards = 1,
      healthCheck = Some(graft.run.HealthCheckConfig("source", minHistoryRuns = 4, k = 4)))
    // 5 warm-up runs: A drifts 11..15 docs (healthy variance), B steady at 10
    val warm = (1 to 5).map(r => p.run(corpus(r, 10 + r, 10), cfg))
    assert(warm.take(4).forall(_.healthAnomalies.isEmpty),
      "flags must not fire before minHistoryRuns prior runs exist")
    assert(warm(4).healthAnomalies.contains(0L),
      "healthy drift within k*MAD must not flag")
    // run 6: source B collapses 10 -> 1 docs; A stays in its healthy band
    val s6 = p.run(corpus(6, 13, 1), cfg)
    assert(s6.healthAnomalies.contains(2L)) // (B, docs) and (B, tokens)
    val flags = rows(cat.read("corpus_health_flags")
      .select("group_key", "metric").orderBy("group_key", "metric"))
    assert(flags == Seq(Seq("B", "docs"), Seq("B", "tokens")))
    // history accumulated one (group, metric) pair per run per group
    assert(cat.read("corpus_health").select("run_seq").distinct().count() == 6)
  }

  test("split stage stamps holdouts and packs ONLY the train slice") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-train").toString)
    val s = new TrainingPipeline(spark, cat).run(docs, TrainingPipelineConfig(
      seqTokens = 1024, shards = 4, split = Some(graft.run.SplitConfig(70, 15))))
    val corpus = cat.read("training_corpus")
    assert(rows(corpus.select("split").distinct()).map(_.head).toSet ==
      Set("train", "val", "test"))
    val trainIds = rows(corpus.filter(col("split") === "train").select("doc_id"))
      .map(_.head).toSet
    val seqIds = rows(cat.read("training_sequences").select("doc_id"))
      .map(_.head).toSet
    assert(seqIds == trainIds, "holdout docs must never land in training sequences")
    assert(s.afterSample == corpus.count()) // summary counts the full corpus
    // split stamp is a pure function of doc identity: re-deriving it from
    // the committed corpus reproduces the committed column
    val committed = rows(corpus.orderBy("doc_id").select("doc_id", "split"))
    val rederived = rows(graft.operators.Sampling.stratifiedSplit(
        corpus.drop("split"), "doc_id", 70, 15)
      .orderBy("doc_id").select("doc_id", "split"))
    assert(committed == rederived)
  }
}
