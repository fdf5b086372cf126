package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.operators.{QualityFilter, Sampling, TextDedup}

/** The training-data counterpart of [[PipelineRunner]]: one configurable,
  * catalog-backed corpus build composing the library operators —
  *
  *   quality gate (+ optional repetition gate) → exact dedup →
  *   (optional) substring-dup gate → (optional) bigram-coverage gate →
  *   (optional) near-dup removal → (optional) keep-one span scrub →
  *   (optional) weighted mixture → (optional) per-group token budget →
  *   deterministic sample → (optional) train/val/test stamp →
  *   sequence packing (train slice only when split)
  *
  * The corpus-statistic gates sit AFTER exact dedup on purpose: computed
  * before it, every copy of an exact-duplicate doc would score as fully
  * duplicated and all copies would drop — annihilating the content instead
  * of keeping one.
  *
  * — and committing the selected corpus and its sequence layout as atomic
  * catalog tables. Every stage is the operator the gate queries verify;
  * the pipeline only wires them. Deterministic end to end (hash-based
  * selection, injected thresholds), so a rerun over the same input commits
  * identical tables.
  *
  * Scale shape: the quality/repetition gates, mixture, and sample stages
  * are map-side; exact dedup is one hash aggregate + keep-list join;
  * near-dup removal is the blocked join + label propagation; packing is a
  * per-shard window. Nothing here adds a shuffle the underlying operators
  * don't already have.
  */
final case class MixtureConfig(
    groupCol: String, ratesPct: Map[String, Int], defaultPct: Int = 100)

/** Opt-in per-group TOKEN budget ([[Sampling.tokenBudgetPerGroup]]) applied
  * after the rate mixture: absolute caps in the unit recipes are written in
  * ("at most N tokens of source X"), composing with relative rates. */
final case class TokenBudgetConfig(groupCol: String, budgetTokens: Long)

/** Opt-in holdout stage: stamp each selected doc train/val/test
  * ([[Sampling.stratifiedSplit]] — deterministic, nested, stratum-uniform)
  * and pack ONLY the train slice into sequences (holdout docs must never
  * land in training sequences). */
final case class SplitConfig(trainPct: Int = 90, valPct: Int = 5)

/** Opt-in corpus-health monitor for RECURRING builds: after the corpus
  * commits, per-group metrics (doc count, token sum by `groupCol`) are
  * scored against a robust median/MAD fit ([[graft.operators.Anomaly]]) of
  * the metric history accumulated by prior runs in `historyTable`, then
  * appended to that history. A source that silently collapses (crawler
  * regression, upstream schema break) or explodes (spam flood) flags on the
  * very next build — the train-on-history / score-live shape, with the
  * robust fit so one bad historical run cannot mask the next one.
  * Flags are evaluated only once `minHistoryRuns` prior runs exist (a
  * 2-run median is meaningless); before that the run just contributes
  * history. Flagged rows are committed to `<historyTable>_flags`. */
final case class HealthCheckConfig(
    groupCol: String,
    historyTable: String = "corpus_health",
    k: Int = 4,
    minHistoryRuns: Int = 4)

final case class TrainingPipelineConfig(
    // NFC-canonicalize text FIRST (codegen'd UnicodeNormalize): composed
    // and decomposed spellings of the same glyph must hash/join as one key
    // before any byte-keyed stage (exact dedup, span hashes, BPE)
    normalizeNfc: Boolean = false,
    // strip HTML/XML markup FIRST (script/style bodies, tags, entities,
    // whitespace collapse — [[graft.operators.TextClean.stripMarkup]]):
    // crawled HTML must shed boilerplate bytes before ANY text statistic,
    // hash, or shingle sees them
    stripMarkup: Boolean = false,
    // drop documents linking into these registrable domains
    // ([[graft.operators.TextClean.filterBlockedDomains]]) — the crawl
    // blocklist gate, before quality scoring spends anything on spam
    blockedDomains: Seq[String] = Nil,
    // URL-level recrawl dedup FIRST ([[graft.operators.TextClean
    // .dedupByCanonicalUrl]]): when set to the column holding each doc's
    // source URL, keep one capture per canonical URL (min doc_id) before
    // ANY content stage spends a byte on recrawl copies — the
    // CommonCrawl-ordering of passes (URL dedup, then content dedup)
    urlDedupCol: Option[String] = None,
    quality: QualityFilter.Thresholds = QualityFilter.Thresholds(),
    maxRepetition: Option[Double] = None, // e.g. Some(0.3): drop boilerplate docs
    // the published Gopher rule battery as an extra map-side gate (word
    // count / mean word length / symbol ratio / alpha-word fraction /
    // stopword hits) — rides the same stage frame, zero extra shuffles
    gopher: Option[QualityFilter.GopherThresholds] = None,
    // corpus-statistic gates, applied AFTER exact dedup (each adds one
    // span_hash shuffle over the deduped corpus; docs too short to score
    // pass through):
    maxSpanDupFraction: Option[Double] = None, // e.g. Some(0.5): drop mostly-duplicated docs
    minBigramCoverage: Option[Double] = None,  // e.g. Some(0.2): drop rare-bigram gibberish
    maxHapaxFraction: Option[Double] = None,   // e.g. Some(0.5): drop corpus-unique-token-heavy docs
    // CCNet-style model-based gate: score every doc's bigram-LM
    // cross-entropy under a reference LM trained on the deduped corpus
    // itself and drop docs ABOVE this corpus quantile (e.g. Some(0.9):
    // drop the most-surprising 10%). Runs with the corpus-statistic gates
    // (post-exact-dedup — duplicate copies would otherwise dominate the
    // model's counts); docs too short to score pass through
    perplexityQuantile: Option[Double] = None,
    // model-based label-consistency gate: train a Naive Bayes classifier on
    // the surviving corpus's OWN labels in this column (e.g. "lang") and
    // drop documents the classifier disagrees with — the CCNet-style
    // language-verification step (a doc whose text reads as another class
    // than its metadata claims is mislabeled or misrouted)
    nbLabelCol: Option[String] = None,
    dedupExact: Boolean = true,
    nearDupJaccard: Option[Double] = None, // e.g. Some(0.8): drop near-dup non-keepers
    // when set with nearDupJaccard, each near-dup cluster keeps the doc
    // with the smallest (this column, doc_id) instead of the plain min id
    // — source-ranked dedup (curated beats crawled mirror)
    nearDupPriorityCol: Option[String] = None,
    // keep-one substring scrub (Lee et al.): REWRITE the surviving docs'
    // text, keeping the first occurrence of each duplicated width-token
    // span and dropping the rest; n_tokens is updated to the scrubbed
    // count so packing budgets the text that actually ships
    scrubSpans: Option[Int] = None,        // e.g. Some(8): scrub width-8 dup spans
    mix: Option[MixtureConfig] = None,     // per-group keep rates (data mixing)
    // temperature-flatten a grouping column at α = 1/2 BEFORE explicit
    // rates ([[Sampling.temperatureSampleHalf]] — kept counts ∝ √n_group,
    // the mT5/XLM-R minority-language rebalance); composes with `mix`
    // (flatten languages, then apply hand-set source rates)
    temperatureGroupCol: Option[String] = None,
    tokenBudget: Option[TokenBudgetConfig] = None, // absolute per-group token cap
    split: Option[SplitConfig] = None,     // train/val/test stamp + train-only packing
    healthCheck: Option[HealthCheckConfig] = None, // per-group metric anomaly monitor
    samplePct: Int = 100,
    // when set, learn this many BPE merges ON the packed slice and budget
    // sequences in real tokenizer units (n_bpe_symbols) instead of
    // whitespace tokens — training budgets are BPE tokens
    packByBpe: Option[Int] = None,
    // when set, pack into this many curriculum phases staged by n_tokens
    // (short = easy): sequences carry a `phase` column and consuming them
    // in (phase, shard, seq_id) order is the easy→hard curriculum layout
    // ([[Sampling.packSequencesCurriculum]]). Mutually exclusive with
    // packByBpe (each replaces the packing step)
    curriculumPhases: Option[Int] = None,
    seqTokens: Int = 4096,
    shards: Int = 64,
    corpusTable: String = "training_corpus",
    sequencesTable: String = "training_sequences")

final case class TrainingPipelineSummary(
    inputDocs: Long, afterQuality: Long, afterDedup: Long, afterSample: Long,
    totalTokens: Long, sequences: Long,
    // None = health check off or history still warming up; Some(n) = number
    // of (group, metric) pairs whose value sits > k·MAD from the history
    // median this run
    healthAnomalies: Option[Long] = None)

final class TrainingPipeline(spark: SparkSession, catalog: Catalog) {

  def run(docs0: DataFrame, cfg: TrainingPipelineConfig = TrainingPipelineConfig()):
      TrainingPipelineSummary = {
    // URL dedup ahead of everything: recrawl copies must not even reach
    // the markup strip (one canonical-key window; keeper = min doc_id)
    val urlDeduped = cfg.urlDedupCol match {
      case None => docs0
      case Some(u) => docs0.join(
        graft.operators.TextClean.dedupByCanonicalUrl(docs0, "doc_id", u)
          .filter(col("is_keeper")).select(col("doc_id")), Seq("doc_id"))
    }
    // markup strip → blocklist → NFC: all pure maps / one broadcast
    // semi-join riding the first scan, before any statistic sees the text
    val stripped = if (!cfg.stripMarkup) urlDeduped
      else urlDeduped.withColumn("text",
        graft.operators.TextClean.stripMarkupCol(col("text")))
    val unblocked =
      if (cfg.blockedDomains.isEmpty) stripped
      else {
        import spark.implicits._
        graft.operators.TextClean.filterBlockedDomains(stripped,
          cfg.blockedDomains.toDF("domain"))
      }
    // canonicalization is a pure map riding the first scan — zero cost to
    // every ASCII row via the isNormalized fast path
    val docs = if (!cfg.normalizeNfc) unblocked
      else unblocked.withColumn("text", graft.functions.Text.nfc(col("text")))
    val inputDocs = docs.count()

    // Persisted: each stage frame feeds its count AND the next stage (and
    // the exact-dedup keep-list join reads quality twice) — without the
    // persists every summary count re-runs the whole upstream pipeline,
    // which at corpus scale is a full extra scan per stage. Materialized by
    // the counts, freed before returning.
    // both gates are map-side; they fold into one persisted stage frame
    val mapGated0 = cfg.maxRepetition match {
      case None => QualityFilter.filter(docs, cfg.quality)
      case Some(t) => QualityFilter.repetitionScored(
          QualityFilter.filter(docs, cfg.quality))
        .filter(col("repetition") <= t)
        .drop("n_shingles", "n_distinct", "repetition")
    }
    val mapGated = cfg.gopher match {
      case None => mapGated0
      case Some(g) => // still map-side; metric columns stay internal
        QualityFilter.gopherFilter(mapGated0, g)
          .select(mapGated0.columns.map(col).toIndexedSeq: _*)
    }
    val quality = mapGated
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the corpus-statistic gates read their input TWICE each (stats pass +
    // join side); persisted handles released in the outer finally
    val statGates = cfg.maxSpanDupFraction.isDefined ||
      cfg.minBigramCoverage.isDefined || cfg.maxHapaxFraction.isDefined ||
      cfg.perplexityQuantile.isDefined
    val statPersists = scala.collection.mutable.ListBuffer[DataFrame]()
    try {
      val afterQuality = quality.count()

      val deduped0 =
        if (!cfg.dedupExact) quality
        else quality.join(
          TextDedup.exact(quality).select(col("keep_id").as("doc_id")), Seq("doc_id"))
      // The corpus-statistic gates run on the EXACT-DEDUPED corpus: before
      // dedup, every copy of an exact-duplicate doc scores dup_fraction 1.0
      // and ALL copies drop — the content would vanish from the corpus
      // instead of keeping one canonical copy. (Near-dup SETS above the
      // span threshold still drop wholesale — that is the gate's contract;
      // use nearDupJaccard when keep-one retention is wanted.)
      val statBase = if (!statGates) deduped0 else {
        val p = deduped0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        statPersists += p
        p
      }
      val spanGated = cfg.maxSpanDupFraction match {
        case None => statBase
        case Some(t) => statBase.join(
          TextDedup.spanDupStats(statBase)
            .filter(coalesce(col("dup_fraction"), lit(0.0)) <= t) // short docs pass
            .select(col("doc_id")), Seq("doc_id"))
      }
      // both gates on → the span-gated frame also feeds two consumers
      val covBase = if (cfg.maxSpanDupFraction.isEmpty || cfg.minBigramCoverage.isEmpty)
        spanGated
      else {
        val p = spanGated.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        statPersists += p
        p
      }
      val statGated = cfg.minBigramCoverage match {
        case None => covBase
        case Some(t) => covBase.join(
          QualityFilter.bigramCoverage(covBase)
            .filter(coalesce(col("coverage"), lit(1.0)) >= t) // short docs pass
            .select(col("doc_id")), Seq("doc_id"))
      }
      // token-rarity gate: AFTER exact dedup like the other corpus-statistic
      // gates — duplicate copies make every token non-hapax, which would
      // mask exactly the docs this gate exists to drop. tokenRarity scans
      // its input twice (frequency pass + join side) → persist.
      val hapaxGated = cfg.maxHapaxFraction match {
        case None => statGated
        case Some(t) =>
          val p = statGated.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          statPersists += p
          p.join(
            QualityFilter.tokenRarity(p)
              .filter(col("n_hapax").cast("double") / col("n_tokens") <= t)
              .select(col("doc_id")), Seq("doc_id"))
      }
      // model-based gate last in the statistic family: the LM trains on the
      // corpus that survived the cheaper gates (gibberish already gone →
      // cleaner reference model). crossEntropy scans its input for model
      // counts AND scoring → persist; NULL-scored (short) docs pass.
      val ppxGated = cfg.perplexityQuantile match {
        case None => hapaxGated
        case Some(q) =>
          val p = hapaxGated.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          statPersists += p
          val scoredLm = graft.operators.NgramLm.crossEntropy(
            p, graft.operators.NgramLm.trainBigram(p))
          val cut = scoredLm.agg(expr(s"percentile(xent_nats, $q)").as("cutoff"))
          p.join(scoredLm.crossJoin(broadcast(cut))
              .filter(col("xent_nats").isNull || col("xent_nats") <= col("cutoff"))
              .select(col("doc_id")), Seq("doc_id"))
      }
      // label-consistency gate: the classifier trains on the corpus that
      // survived every cheaper gate (its label statistics are the cleanest
      // available); classify scans the same frame → persist. Runs AFTER the
      // perplexity gate so both model-based stages see identical inputs in
      // either-order configs.
      val nbGated = cfg.nbLabelCol match {
        case None => ppxGated
        case Some(lc) =>
          val p = ppxGated.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          statPersists += p
          val model = graft.operators.NaiveBayes.train(p, lc)
          p.join(graft.operators.NaiveBayes.classify(p, model)
              .select(col("doc_id"), col("predicted")), Seq("doc_id"))
            .filter(col("predicted") === col(lc))
            .drop("predicted")
      }
      val nearDeduped = cfg.nearDupJaccard match {
        case None => nbGated
        case Some(t) =>
          // near-dup clusters over the exact-deduped set; keep each
          // cluster's canonical doc — min id, or best (priority, id) when
          // a priority column is configured — and drop the rest
          val clustered = TextDedup.clusters(TextDedup.ngramJaccard(nbGated, t))
          val drop = cfg.nearDupPriorityCol match {
            case None => clustered.filter(col("doc_id") =!= col("cluster_id"))
              .select(col("doc_id"))
            case Some(pc) => TextDedup.clusterKeepersByPriority(clustered, nbGated, pc)
              .filter(!col("is_keeper")).select(col("doc_id"))
          }
          nbGated.join(drop, Seq("doc_id"), "left_anti")
      }
      // the scrub REWRITES text (keep-one, order-deterministic keeper) and
      // refreshes n_tokens, so every downstream stage — token budget,
      // packing — budgets the text that actually ships. Its input feeds
      // three scans (span inventory, re-assembly, metadata join) → persist.
      val dedupedPlan = cfg.scrubSpans match {
        case None => nearDeduped
        case Some(w) =>
          val p = nearDeduped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          statPersists += p
          p.drop("text").join(
            TextDedup.scrubDuplicatedSpansKeepOne(p, width = w)
              .select(col("doc_id"), col("text_scrubbed").as("text"),
                col("n_tokens_kept")),
            Seq("doc_id"))
            .withColumn("n_tokens", col("n_tokens_kept")).drop("n_tokens_kept")
      }
      val deduped = dedupedPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val afterDedup = deduped.count()

        val tempered = cfg.temperatureGroupCol match {
          case None => deduped
          case Some(g) => Sampling.temperatureSampleHalf(deduped, g, "doc_id")
        }
        val mixed = cfg.mix match {
          case None => tempered
          case Some(m) =>
            Sampling.mixtureSample(tempered, m.groupCol, m.ratesPct, "doc_id", m.defaultPct)
        }
        val budgeted = cfg.tokenBudget match {
          case None => mixed
          case Some(tb) => Sampling.tokenBudgetPerGroup(
              mixed, tb.groupCol, "n_tokens", tb.budgetTokens, "doc_id")
            .filter(col("keep")).drop("cum_tokens", "keep")
        }
        val sampled =
          if (cfg.samplePct >= 100) budgeted
          else Sampling.hashSample(budgeted, "doc_id", cfg.samplePct)

        val stamped = cfg.split match {
          case None => sampled
          case Some(sc) => Sampling.stratifiedSplit(sampled, "doc_id", sc.trainPct, sc.valPct)
        }
        catalog.write(cfg.corpusTable, stamped)
        val selected = catalog.read(cfg.corpusTable) // read back: one compute, two consumers
        val healthAnomalies = cfg.healthCheck.map(hc => runHealthCheck(hc, selected))
        val packInput =
          if (cfg.split.isDefined) selected.filter(col("split") === "train") else selected
        require(cfg.packByBpe.isEmpty || cfg.curriculumPhases.isEmpty,
          "packByBpe and curriculumPhases both replace the packing step — pick one")
        val packed = cfg.packByBpe match {
          case None => cfg.curriculumPhases match {
            case Some(phases) => Sampling.packSequencesCurriculum(
              packInput, col("n_tokens"), "doc_id", "n_tokens", phases,
              cfg.seqTokens, cfg.shards)
            case None => Sampling.packSequences(
              packInput, col("n_tokens"), "doc_id", cfg.seqTokens, cfg.shards)
          }
          case Some(steps) =>
            val merges = graft.operators.BpeVocab.learn(packInput, steps)
            // LEFT join: a doc whose every word the BPE vocab dropped
            // (empty / separator-tainted tokens) still packs — with 0
            // budgeted tokens — instead of silently vanishing from the
            // sequences while stamped 'train' in the corpus
            Sampling.packSequences(
              packInput.join(
                graft.operators.BpeVocab.encodedLength(packInput, merges),
                Seq("doc_id"), "left"),
              coalesce(col("n_bpe_symbols"), lit(0L)), "doc_id", cfg.seqTokens, cfg.shards)
        }
        catalog.write(cfg.sequencesTable, packed)

        val seqStats = catalog.read(cfg.sequencesTable).agg(
          count(lit(1)).as("n"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("tok"), // empty corpus → 0, not null
          countDistinct(concat_ws("|", col("shard"), col("seq_id"))).as("seqs")).head()
        // without a split the packed table covers the whole selection, so
        // its row count IS afterSample; with one, the corpus must be counted
        // itself (tokens/sequences still describe the packed train slice)
        val afterSample =
          if (cfg.split.isEmpty) seqStats.getLong(0) else selected.count()
        TrainingPipelineSummary(inputDocs, afterQuality, afterDedup, afterSample,
          seqStats.getLong(1), seqStats.getLong(2), healthAnomalies.flatten)
      } finally deduped.unpersist()
    } finally {
      quality.unpersist()
      statPersists.foreach(_.unpersist())
    }
  }

  /** Score this run's per-group corpus metrics against the robust fit of
    * the accumulated history, then append them to it. Metrics are held LONG
    * (docs, tokens) and unpivoted to (group_key, metric, value) rows so one
    * median/MAD fit keyed by (group_key, metric) covers both — identical
    * shape to [[graft.operators.Anomaly.robustStats]]'s gate queries.
    * History is key-cardinality × runs sized (tiny), so the fit broadcasts;
    * the only corpus-sized work is the one groupBy over the already-
    * committed selection. Returns None while history is still warming up. */
  private def runHealthCheck(hc: HealthCheckConfig, selected: DataFrame): Option[Long] = {
    // run sequence from the history CONTENT (max + 1), not the catalog
    // version counter — version numbers also move on compaction, and the
    // first write lands as v_0 (1-row agg over the tiny history table)
    val runSeq =
      if (!catalog.exists(hc.historyTable)) 1L
      else catalog.read(hc.historyTable)
        .agg(coalesce(max(col("run_seq")), lit(0L))).head().getLong(0) + 1L
    val metrics = selected
      .groupBy(col(hc.groupCol).cast("string").as("group_key"))
      .agg(count(lit(1)).as("docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("tokens"))
      .select(col("group_key"),
        explode(map(lit("docs"), col("docs"), lit("tokens"), col("tokens")))
          .as(Seq("metric", "value")))
      .withColumn("run_seq", lit(runSeq))
    val flagged =
      if (!catalog.exists(hc.historyTable)) None
      else {
        val history = catalog.read(hc.historyTable)
        val runs = history.select(countDistinct(col("run_seq"))).head().getLong(0)
        if (runs < hc.minHistoryRuns) None
        else {
          val fit = graft.operators.Anomaly.robustStats(
            history, Seq("group_key", "metric"), "value")
          val flags = graft.operators.Anomaly.flagAgainstRobustStats(
              metrics, fit, Seq("group_key", "metric"), "value", hc.k)
            .filter(col("is_anomaly"))
          catalog.write(s"${hc.historyTable}_flags", flags)
          Some(catalog.read(s"${hc.historyTable}_flags").count())
        }
      }
    if (catalog.exists(hc.historyTable)) catalog.append(hc.historyTable, metrics)
    else catalog.write(hc.historyTable, metrics)
    flagged
  }
}
