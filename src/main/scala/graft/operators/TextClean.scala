package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Map-side text hygiene for web-crawled corpora: markup stripping and PII
  * redaction — the first transforms a crawl pipeline applies, ahead of any
  * dedup/quality stage (tags and boilerplate would otherwise poison shingle
  * and token statistics; PII must not survive into a released training set).
  *
  * Everything here is a chain of codegen'd `regexp_replace` /
  * `regexp_extract_all` column expressions — zero shuffles, whole-stage
  * codegen, embarrassingly parallel at 100 TB. Patterns are deliberately
  * restricted to syntax Java regex and RE2 interpret identically (no
  * backreferences, no lookaround; `(?s)` dot-all and `\b` word boundaries
  * are common to both), so every op is DuckDB-oracle-replayable verbatim.
  */
object TextClean {

  /** Strip HTML/XML markup down to visible text: script/style blocks go
    * first (their CONTENT is not text — a tag-only strip would leak
    * JavaScript into the corpus), then comments, then tags, then the
    * common entities, then whitespace collapse+trim (tag removal leaves
    * runs of spaces that would corrupt whitespace tokenization). */
  def stripMarkupCol(c: Column): Column = {
    val noBlocks = regexp_replace(c, "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]*>", " ")
    val entities = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ")
    val decoded = entities.foldLeft(noTags) { case (col0, (ent, ch)) =>
      regexp_replace(col0, ent, ch)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** [[stripMarkupCol]] over a frame: adds `text_clean` + its length. */
  def stripMarkup(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("text_clean", stripMarkupCol(col(textCol)))
      .withColumn("clean_chars", length(col("text_clean")).cast("long"))

  val UrlPattern = "https?://[A-Za-z0-9.-]+(/[^ ]*)?"

  /** Extract every http(s) URL as its own row (doc_id, url, host,
    * domain): host = the authority part, domain = the last two
    * dot-labels (the registrable-domain approximation a blocklist keys
    * on — a real eTLD+1 needs the public-suffix list; two labels is the
    * standard engine-side stand-in and is exactly replayable in SQL).
    * One map-side explode of `regexp_extract_all`; volume is
    * URL-occurrence-shaped. The census/blocklist primitive of crawl
    * curation (domain-level spam/seo filtering à la RefinedWeb).
    * Known edge: a URL butted against sentence punctuation ("see x.com.")
    * keeps the trailing dot in its host, and the domain regex then
    * yields '' — prose-embedded URLs should be comma/period-tokenized
    * upstream if that matters for the census. */
  def extractUrls(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val url = explode(regexp_extract_all(col(textCol), lit(UrlPattern), lit(0)))
    val host = regexp_extract(col("url"), "^https?://([A-Za-z0-9.-]+)", 1)
    df.select(col(idCol).as("doc_id"), url.as("url"))
      .withColumn("host", host)
      // regex, not split+slice: both engines return '' for a single-label
      // host, so the two sides cannot diverge on the degenerate case
      .withColumn("domain",
        regexp_extract(col("host"), "([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$", 1))
  }

  /** Drop every document that links into a blocked domain — the
    * domain-blocklist gate. The blocklist is a (domain) frame, broadcast
    * into a left-anti join against the distinct (doc, domain) link set;
    * docs with no URLs survive (nothing to match). */
  /** The Cyrillic/Greek letters that render identically to Latin ones —
    * the homoglyph set spam uses to slip exact-match filters ("pаypal"
    * with U+0430). One translate() pair, shared by fold and census so
    * the two can never drift. */
  val ConfusableFrom = "аеорсху" + // а е о р с х у
    "АВЕКМНОРСТХ" + // АВЕКМНОРСТХ
    "οαΑΒΕΗΚΜΝΟΡΤΧ" // ο α ΑΒΕΗΚΜΝΟΡΤΧ
  val ConfusableTo = "aeopcxy" + "ABEKMHOPCTX" + "oa" + "ABEHKMNOPTX"

  /** Fold script-confusable homoglyphs to their Latin look-alikes and
    * census the damage: `text_folded` (what dedup/blocklists should key
    * on), `n_confusables` (how many characters changed), and
    * `is_spoofed` (any change at all — the mixed-script spoof flag).
    * A blocklist or exact-dedup pass that does NOT fold first treats
    * "pаypal" and "paypal" as different keys; that gap is precisely what
    * confusable substitution exploits. Pure map-side translate + length
    * arithmetic, zero shuffles; NFC-normalize upstream so composed and
    * decomposed spellings agree before the fold. */
  def foldConfusables(df: DataFrame, textCol: String = "text"): DataFrame = {
    val folded = translate(col(textCol), ConfusableFrom, ConfusableTo)
    // count changed positions by deleting the confusables: length drop =
    // occurrences (translate with an empty target deletes)
    val stripped = translate(col(textCol), ConfusableFrom, "")
    df.withColumn("text_folded", folded)
      .withColumn("n_confusables",
        (length(col(textCol)) - length(stripped)).cast("long"))
      .withColumn("is_spoofed", col("n_confusables") > 0L)
  }

  /** Canonical form of an http(s) URL for crawl-level dedup — the
    * WARC-key normalization: drop the fragment, lowercase scheme+host,
    * strip a leading `www.`, strip default ports (:80/:443), remove
    * tracking query params (utm_*, fbclid, gclid), and trim a trailing
    * slash. Path/query CASE is preserved (paths are case-significant;
    * only authority casing is not). Pure codegen'd regexp chain — and
    * deliberately free of replacement group references, which Java
    * (`$1`) and RE2 (`\1`) spell differently: the one
    * keep-the-separator rewrite (first query param is tracking) is done
    * with two constant-replacement passes instead. */
  def canonicalUrl(url: Column): Column = {
    val track = "(utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*"
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val host2 = regexp_replace(regexp_replace(host, "^www\\.", ""), ":(80|443)$", "")
    // tracking params: &-led anywhere; then a ?-led one followed by a
    // kept param (constant "?" replacement); then a ?-led one that WAS
    // the whole query string
    val noAmp = regexp_replace(rest, s"&$track", "")
    val noQMid = regexp_replace(noAmp, s"\\?$track&", "?")
    val noTrack = regexp_replace(noQMid, s"\\?$track$$", "")
    concat(scheme, lit("://"), host2, regexp_replace(noTrack, "/$", ""))
  }

  /** URL-keyed crawl dedup: canonicalize, then pick one keeper per
    * canonical URL (min id — recrawls of one page collapse to a single
    * kept capture, the CommonCrawl-style URL-level pass that runs BEFORE
    * any content dedup). One canonical-key-partitioned window (group
    * sizes are recrawl counts — bounded), map-side everything else.
    * Output: (doc_id, url_canon, keeper_id, n_dupes, is_keeper). */
  def dedupByCanonicalUrl(df: DataFrame, idCol: String = "doc_id",
      urlCol: String = "url"): DataFrame = {
    // A null or schemeless/unparseable URL has NO canonical identity: all
    // such rows would share one degenerate '://' key and silently collapse
    // to a single keeper (losing every URL-less doc but one). They pass
    // through as always-keepers instead — url_canon NULL, their own
    // per-doc key partitioning the window so each is its own group.
    val valid = col(urlCol).isNotNull &&
      col(urlCol).rlike("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__grp"))
    df.select(col(idCol).cast("long").as("doc_id"),
        when(valid, canonicalUrl(col(urlCol))).as("url_canon"))
      .withColumn("__grp", coalesce(col("url_canon"),
        concat(lit("\u0000invalid:"), col("doc_id"))))
      .withColumn("keeper_id", min(col("doc_id")).over(w))
      .withColumn("n_dupes", count(lit(1)).over(w))
      .withColumn("is_keeper", col("doc_id") === col("keeper_id"))
      .drop("__grp")
  }

  def filterBlockedDomains(df: DataFrame, blocklist: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val offenders = extractUrls(df, idCol, textCol)
      .join(broadcast(blocklist), Seq("domain"), "left_semi")
      .select(col("doc_id")).distinct()
    df.join(offenders.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_anti")
  }

  /** Domain-level quality census — the "domain trust" table crawl
    * prioritization and blocklist REVIEW read: per registrable domain, how
    * many documents link there and what the aggregate text quality of those
    * documents is. The aggregation is MICRO-AVERAGED from exact integer
    * numerators (Σ letters / Σ chars, Σ stopword hits / Σ tokens — one IEEE
    * division per ratio at the very end), never a mean of per-doc float
    * scores, whose summation order would differ across partitionings and
    * engines. A doc linking a domain k times counts once in the quality
    * sums (distinct doc attribution) and k times in `n_urls`.
    *
    * Scale: [[extractUrls]]' map-side explode → one (domain, doc) hash agg →
    * join to the map-side per-doc integer stats ([[QualityFilter.scored]])
    * on doc_id → one domain agg. Output is domain-cardinality-sized. */
  def domainQuality(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val links = extractUrls(df, idCol, textCol)
      .filter(col("domain") =!= "")
      .groupBy("domain", "doc_id").agg(count(lit(1)).as("n_urls"))
    val stats = QualityFilter.scored(df.select(col(idCol).as("doc_id"),
        col(textCol).as("__t")), "__t")
      .select(col("doc_id"), col("n_tokens"), col("n_chars"),
        col("n_letters"), col("n_stopwords"))
    links.join(stats, Seq("doc_id"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("n_urls").as("n_urls"),
        sum("n_tokens").as("n_tokens"), sum("n_chars").as("n_chars"),
        sum("n_letters").as("n_letters"), sum("n_stopwords").as("n_stopwords"))
      .select(col("domain"), col("n_docs"), col("n_urls"), col("n_tokens"),
        col("n_chars"), col("n_letters"), col("n_stopwords"),
        (col("n_letters").cast("double") / col("n_chars").cast("double"))
          .as("alpha_ratio"),
        (col("n_stopwords").cast("double") / col("n_tokens").cast("double"))
          .as("stop_ratio"))
  }

  /** C4-style line-level cleaning (Raffel et al. 2020, §2.2 — the public
    * recipe behind the C4 corpus, reused with variations by most web-scale
    * LLM corpora since). Line rules (a line survives iff ALL hold):
    *   - ends in terminal punctuation (`.` `!` `?` `"`);
    *   - has ≥ `minWordsPerLine` whitespace-separated words;
    *   - does not mention "javascript" (boilerplate "enable JavaScript"
    *     notices — matched case-insensitively).
    * Page rules (the whole document drops iff ANY holds):
    *   - contains "lorem ipsum" (case-insensitive) — template filler;
    *   - contains `{` — leaked code/JSON/CSS;
    *   - fewer than `minLines` surviving lines — too little prose to keep.
    * Survivors are rebuilt from their kept lines in original order, with
    * kept/dropped audit counts.
    *
    * Everything is ONE map-side projection — `split` + a codegen'd array
    * `filter` HOF + `array_join`; zero shuffles, embarrassingly parallel at
    * 100 TB (this is the first gate a crawl passes, ahead of any dedup, so
    * it must not cost a shuffle). Patterns are Java-regex/RE2-common so the
    * DuckDB oracle replays them verbatim. */
  def c4Clean(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      minWordsPerLine: Int = 5, minLines: Int = 3): DataFrame = {
    val lines = split(col("__text"), "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]$") &&
        size(split(trim(l), " +")) >= minWordsPerLine &&
        !lower(l).contains("javascript"))
    df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .withColumn("__kept", kept)
      .filter(!lower(col("__text")).contains("lorem ipsum") &&
        !col("__text").contains("{") &&
        size(col("__kept")) >= minLines)
      .select(col("doc_id"),
        array_join(col("__kept"), "\n").as("text_clean"),
        size(col("__kept")).cast("long").as("kept_lines"),
        (size(split(col("__text"), "\n")) - size(col("__kept")))
          .cast("long").as("dropped_lines"))
  }

  /** Structural-markup census — line-level counts of the code/markdown
    * shapes a web/document corpus carries (indented or `;`/`{`/`}`-
    * terminated code lines, markdown headings, pipe tables, list items):
    * the features a "prose vs code vs doc-markup" router or a
    * code-fraction quality gate consumes (prose models drop code-heavy
    * pages; code corpora route them the other way). One map-side
    * split + four codegen'd array-filter HOFs, zero shuffles; every
    * pattern is Java-regex/RE2-common for verbatim oracle replay. */
  def markupCensus(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val lines = split(col(textCol), "\n")
    def nMatching(pattern: String) =
      size(filter(lines, l => l.rlike(pattern))).cast("long")
    df.select(col(idCol).as("doc_id"),
        size(lines).cast("long").as("n_lines"),
        nMatching("^(    |\t)|[;{}]$").as("n_code_lines"),
        nMatching("^#{1,6} ").as("n_heading_lines"),
        nMatching("^\\|.*\\|$").as("n_table_lines"),
        nMatching("^[-*] ").as("n_list_lines"))
      .withColumn("code_frac",
        col("n_code_lines").cast("double") / col("n_lines").cast("double"))
  }

  /** Spark-SQL boolean: token `v` is a 13–19 digit run passing the Luhn
    * checksum (ISO/IEC 7812 — the card-number check digit). The fold runs
    * over the REVERSED digit string so position parity counts from the
    * right: Spark's lambda index is 0-based, so even indices are the plain
    * digits and odd indices double (9-cap via −9). */
  private def luhnSql(v: String): String =
    // try_cast, not cast: AND need not short-circuit in vectorized eval, and
    // an ANSI cast of a non-digit token would throw before the rlike guard
    s"$v rlike '^[0-9]{13,19}$$' AND " +
      s"aggregate(transform(split(reverse($v), ''), (c, i) -> " +
      "CASE WHEN i % 2 = 0 THEN coalesce(try_cast(c AS INT), 0) " +
      "WHEN coalesce(try_cast(c AS INT), 0) * 2 > 9 THEN coalesce(try_cast(c AS INT), 0) * 2 - 9 " +
      "ELSE coalesce(try_cast(c AS INT), 0) * 2 END), 0, (a, x) -> a + x) % 10 = 0"

  /** Redact payment-card numbers — digit runs that PASS the Luhn checksum —
    * to `<CC>`, leaving checksum-failing runs (order ids, tracking numbers,
    * timestamps) untouched; that distinction is what separates a usable
    * card-number scrub from one that destroys every long number in the
    * corpus. Tokenization is space-delimited (formatted `4111 1111 ...`
    * spacing should be pre-normalized upstream); audit columns count
    * candidate runs and actual redactions per doc.
    *
    * One map-side split → transform → rejoin HOF chain, zero shuffles; the
    * checksum itself is an integer fold both engines evaluate identically
    * (no lookaround regex anywhere, so RE2 oracles replay it verbatim). */
  def redactLuhn(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("__toks", split(col(textCol), " "))
      .withColumn("n_digit_runs",
        expr("size(filter(__toks, t -> t rlike '^[0-9]{13,19}$'))").cast("long"))
      .withColumn("n_cc",
        expr(s"size(filter(__toks, t -> ${luhnSql("t")}))").cast("long"))
      .withColumn("text_redacted",
        expr(s"array_join(transform(__toks, t -> IF(${luhnSql("t")}, '<CC>', t)), ' ')"))
      .drop("__toks")

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+[0-9]{7,15}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact emails / international-format phone numbers / IPv4 addresses to
    * typed placeholder tokens, and surface per-document match counts (the
    * release-hygiene audit columns: "how much PII did this shard carry").
    * The AUDITED companion to [[graft.functions.Text.redactPii]] — that one
    * is the aggressive blanket scrub (emails + every digit run); this one
    * identifies typed entities and reports what it found, the form a
    * release-review process consumes.
    * Order matters: emails redact FIRST, and the IP count is taken AFTER
    * email removal — a dotted host inside an already-redacted email must
    * not ALSO count as an IP. An address with a bare-IP host (`a@10.0.0.1`
    * — no alphabetic TLD) is not an email by pattern; its host still
    * redacts as an IP, so the sensitive part never survives. */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val noEmail = regexp_replace(t, EmailPattern, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhonePattern, "<PHONE>")
    val noIp = regexp_replace(noPhone, Ipv4Pattern, "<IP>")
    df.withColumn("n_emails", size(regexp_extract_all(t, lit(EmailPattern), lit(0))).cast("long"))
      .withColumn("n_phones", size(regexp_extract_all(noEmail, lit(PhonePattern), lit(0))).cast("long"))
      .withColumn("n_ips", size(regexp_extract_all(noPhone, lit(Ipv4Pattern), lit(0))).cast("long"))
      .withColumn("text_redacted", noIp)
  }
}
