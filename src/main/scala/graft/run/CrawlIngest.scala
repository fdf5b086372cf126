package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.catalog.Catalog
import graft.io.Sources
import graft.operators.{QualityFilter, TextDedup}

/** The recurring-crawl ingest loop — the composition every round-3 piece
  * was built for, run per batch against a persistent corpus:
  *
  *   JSONL parse (+ quarantine sink) → quality + repetition gates →
  *   exact-incremental dedup (batch vs corpus content hashes) →
  *   near-dup check against the STORED LSH band index →
  *   file-level corpus append + band-index append
  *
  * Per-batch cost is O(batch): the corpus contributes one content-hash
  * column scan (exact dedup), one stored-index scan (near-dup bands), and
  * two manifest appends — it is never re-read in full, re-tokenized, or
  * rewritten. The band index stays current by appending the NEW documents'
  * bands each run, so the next batch's near-dup check sees everything
  * ingested so far.
  *
  * Input contract: JSONL with at least (doc_id, text) plus whatever else
  * `schema` declares; malformed lines land in the quarantine table instead
  * of failing the batch (a crawl always contains garbage).
  */
final case class CrawlIngestConfig(
    quality: QualityFilter.Thresholds = QualityFilter.Thresholds(),
    maxRepetition: Double = 0.5,
    nearDupJaccard: Double = 0.5,
    numHashes: Int = 16,
    numBands: Int = 8,
    corpusTable: String = "crawl_corpus",
    bandIndexTable: String = "crawl_lsh_bands",
    quarantineTable: String = "crawl_quarantine")

final case class CrawlIngestSummary(
    batchLines: Long, quarantined: Long, afterGates: Long,
    exactDups: Long, nearDups: Long, appended: Long, corpusDocs: Long)

final class CrawlIngest(spark: SparkSession, catalog: Catalog,
    cfg: CrawlIngestConfig = CrawlIngestConfig()) {

  /** Ingest one JSONL batch file/directory. Returns per-stage counts. */
  def ingest(jsonlPath: String, schema: StructType): CrawlIngestSummary = {
    val (clean, quarantine) = Sources.jsonlWithQuarantine(spark, jsonlPath, schema)
    val quarantined = quarantine.count()
    if (quarantined > 0) {
      if (catalog.exists(cfg.quarantineTable))
        catalog.append(cfg.quarantineTable, quarantine)
      else catalog.write(cfg.quarantineTable, quarantine)
    }
    val batchLines = clean.count() + quarantined

    // map-side gates; persisted because every downstream stage (and its
    // count) reads it
    val gated = QualityFilter.repetitionScored(QualityFilter.filter(clean, cfg.quality))
      .filter(col("repetition") <= cfg.maxRepetition)
      .drop("n_shingles", "n_distinct", "repetition")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val afterGates = gated.count()

      if (!catalog.exists(cfg.corpusTable)) {
        // first batch bootstraps the corpus: dedup within the batch only
        val keep = TextDedup.exact(gated).select(col("keep_id").as("doc_id"))
        val fresh = gated.join(keep, Seq("doc_id"))
        catalog.write(cfg.corpusTable, fresh)
        catalog.write(cfg.bandIndexTable,
          TextDedup.buildBandIndex(fresh, cfg.numHashes, cfg.numBands))
        val appended = catalog.read(cfg.corpusTable).count()
        return CrawlIngestSummary(batchLines, quarantined, afterGates,
          exactDups = afterGates - appended, nearDups = 0, appended, appended)
      }

      val corpus = catalog.read(cfg.corpusTable)
      // novel content only: one left-anti hash join against corpus md5s
      val novel = gated.join(
          TextDedup.exactIncremental(corpus, gated).select("doc_id"), Seq("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nNovel = novel.count()

        // near-dups against the STORED band index — zero corpus re-hashing
        val nearDupIds = TextDedup.minhashLshIndexed(
            corpus, catalog.read(cfg.bandIndexTable), novel,
            cfg.nearDupJaccard, cfg.numHashes, cfg.numBands)
          .select(col("batch_id").as("doc_id")).distinct()
        val fresh = novel.join(nearDupIds, Seq("doc_id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val appended = fresh.count()

          // two O(batch) manifest appends: the rows and their index bands
          catalog.append(cfg.corpusTable, fresh)
          catalog.append(cfg.bandIndexTable,
            TextDedup.buildBandIndex(fresh, cfg.numHashes, cfg.numBands))

          CrawlIngestSummary(batchLines, quarantined, afterGates,
            exactDups = afterGates - nNovel, nearDups = nNovel - appended,
            appended, catalog.read(cfg.corpusTable).count())
        } finally fresh.unpersist()
      } finally novel.unpersist()
    } finally gated.unpersist()
  }
}
