package graft

import java.nio.file.Files
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.catalog.Catalog
import graft.operators.QualityFilter
import graft.run.{CrawlIngest, CrawlIngestConfig}

/** The recurring-crawl loop end-to-end: quarantine, gates, exact-incremental
  * dedup, near-dup vs the STORED band index, O(batch) appends — and the
  * index update, proven by batch 3 catching a near-dup of a doc that only
  * entered the corpus in batch 2. */
class CrawlIngestSpec extends SparkSpec {

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def jsonlFile(lines: Seq[String]): String = {
    val f = Files.createTempFile("graft-crawl", ".jsonl")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }
  private def doc(id: Long, text: String) = s"""{"doc_id": $id, "text": "$text"}"""

  private val open = QualityFilter.Thresholds(
    minTokens = 1, minAlphaRatio = 0.0, minStopRatio = 0.0)

  test("three-batch crawl: dups skipped, index stays current, appends are O(batch)") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-crawl").toString)
    val ingest = new CrawlIngest(spark, cat, CrawlIngestConfig(
      quality = open, maxRepetition = 0.3))
    val textA = (1 to 32).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 32).map(i => s"beta$i").mkString(" ")
    val textE = (1 to 32).map(i => s"echo$i").mkString(" ")

    // batch 1 bootstraps the corpus + band index
    val s1 = ingest.ingest(jsonlFile(Seq(doc(1, textA), doc(2, textB))), schema)
    assert(s1.appended == 2 && s1.corpusDocs == 2 && s1.quarantined == 0)
    assert(cat.exists("crawl_lsh_bands"))

    // batch 2: exact dup of A, near-dup of B, novel E, boilerplate, garbage
    val nearB = (1 to 30).map(i => s"beta$i").mkString(" ") + " newtok1 newtok2"
    val looped = Seq.fill(12)("spam spam spam").mkString(" ")
    val s2 = ingest.ingest(jsonlFile(Seq(
      doc(10, textA),            // exact dup (different id, same content)
      doc(11, nearB),            // near-dup of corpus doc 2
      doc(12, textE),            // novel
      doc(13, looped),           // repetition-gated
      """{"doc_id": 14 "text"""  // malformed → quarantine
    )), schema)
    assert(s2.quarantined == 1, s2)
    assert(s2.afterGates == 3, s2)   // looped doc gated out
    assert(s2.exactDups == 1, s2)
    assert(s2.nearDups == 1, s2)
    assert(s2.appended == 1 && s2.corpusDocs == 3, s2)
    assert(cat.read("crawl_quarantine").count() == 1)

    // batch 3: a near-dup of E — which entered the corpus only in batch 2.
    // Catching it proves the band-index append kept the index current.
    val nearE = (1 to 30).map(i => s"echo$i").mkString(" ") + " extra1 extra2"
    val s3 = ingest.ingest(jsonlFile(Seq(doc(20, nearE))), schema)
    assert(s3.nearDups == 1 && s3.appended == 0 && s3.corpusDocs == 3, s3)

    // batch 4: two identical novel docs + two near-dups OF EACH OTHER (all
    // novel vs the corpus) — within-batch dedup must collapse both pairs,
    // keeping the smallest doc_id of each.
    val textF = (1 to 32).map(i => s"fox$i").mkString(" ")
    val nearF = (1 to 30).map(i => s"fox$i").mkString(" ") + " tail1 tail2"
    val textG = (1 to 32).map(i => s"golf$i").mkString(" ")
    val s4 = ingest.ingest(jsonlFile(Seq(
      doc(30, textG), doc(31, textG),   // identical twins within the batch
      doc(32, textF), doc(33, nearF)    // near-dups of each other
    )), schema)
    assert(s4.exactDups == 1, s4)
    assert(s4.nearDups == 1, s4)
    assert(s4.appended == 2 && s4.corpusDocs == 5, s4)

    // the corpus survived four ingests with manifest appends, not rewrites:
    // the current version carries a manifest referencing earlier files
    val ver = java.nio.file.Paths.get(cat.currentPath("crawl_corpus").get)
    assert(Files.exists(ver.resolve("_MANIFEST")),
      "corpus appends must be file-level (manifest), not rewrites")
    assert(rows(cat.read("crawl_corpus").select("doc_id").orderBy("doc_id"))
      .map(_.head) == Seq(1L, 2L, 12L, 30L, 32L))

    // the living postings index, grown batch-by-batch, is row-identical to a
    // from-scratch tokenization of the final corpus — the crawl never
    // re-tokenized anything, yet retrieval sees the whole corpus
    val stored = rows(cat.read("crawl_postings")
      .orderBy("term", "doc_id").select("term", "doc_id", "tf"))
    val scratch = rows(graft.operators.TextIndex
      .postings(cat.read("crawl_corpus"), "doc_id", "text")
      .orderBy("term", "doc_id").select("term", "doc_id", "tf"))
    assert(stored == scratch)
    val hits = rows(graft.operators.TextIndex.searchWeighted(
        cat.read("crawl_postings"), Seq("alpha3", "golf7"), k = 5)
      .select("doc_id", "rank").orderBy("rank"))
    assert(hits.map(_.head) == Seq(1L, 30L)) // one doc per term, rank by score

    // the living span inventory: batch-appended partials merged at read
    // time answer the corpus-wide duplicated-span query exactly as a full
    // re-tokenization would (doc-disjoint batches → counts add)
    val fromStats = rows(graft.operators.TextDedup
      .duplicatedSpansFromStats(cat.read("crawl_span_stats"))
      .orderBy("span_hash"))
    val fromCorpus = rows(graft.operators.TextDedup
      .duplicatedSpans(cat.read("crawl_corpus"))
      .orderBy("span_hash"))
    assert(fromStats == fromCorpus)
  }
}
