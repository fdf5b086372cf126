package graft

import org.apache.spark.sql.functions._
import graft.operators.TextClean

/** Markup strip + PII redaction: script/style bodies vanish, entities
  * decode, whitespace collapses; redaction order prevents double counting. */
class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    TextClean.stripMarkup(Seq((0L, s)).toDF("doc_id", "text"))
      .select("text_clean").as[String].head()

  test("stripMarkup: tags go, script/style BODIES go, text survives") {
    assert(clean("<p>hello <b>world</b></p>") == "hello world")
    assert(clean("a<script>var x='<b>not text</b>';</script>b") == "a b")
    assert(clean("a<style type=\"x\">p { color: red }</style>b") == "a b")
    assert(clean("keep<!-- secret comment -->going") == "keep going")
  }

  test("stripMarkup: entities decode after tag removal; whitespace collapses") {
    assert(clean("x &amp; y &lt;z&gt; &quot;q&quot; &#39;a&#39;&nbsp;end")
      == "x & y <z> \"q\" 'a' end")
    assert(clean("  a\n\n<br/>\t b  ") == "a b")
    // decoded '<' must NOT re-trigger tag stripping (entities decode last)
    assert(clean("&lt;p&gt;literal&lt;/p&gt;") == "<p>literal</p>")
  }

  test("extractUrls: host/domain split; single-label hosts give empty domain") {
    val df = Seq(
      (1L, "go https://a.b.example.org/x?q=1 or http://plain.io now"),
      (2L, "bare http://localhost/admin here"),
      (3L, "no links at all")).toDF("doc_id", "text")
    val got = TextClean.extractUrls(df)
      .select("doc_id", "url", "host", "domain")
      .as[(Long, String, String, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, "http://plain.io", "plain.io", "plain.io"),
      (1L, "https://a.b.example.org/x?q=1", "a.b.example.org", "example.org"),
      (2L, "http://localhost/admin", "localhost", "")))
  }

  test("c4Clean: line rules drop bad lines, page rules drop bad docs") {
    val good = "This line has plenty of words and ends properly."
    val docs = Seq(
      // doc 1: title (no punct), a javascript notice, a short line — all
      // dropped; three good lines survive → doc kept
      (1L, Seq("A Title Without Punctuation", good,
        "Please enable JavaScript to continue.", "Too short.", good + "!",
        "Closing remark with a full stop at the end.").mkString("\n")),
      // doc 2: only two good lines → below minLines → dropped
      (2L, Seq(good, good).mkString("\n")),
      // doc 3: contains a brace → page-dropped despite good lines
      (3L, Seq(good, good, good, "config = { }").mkString("\n")),
      // doc 4: lorem ipsum (case-insensitive) → page-dropped
      (4L, Seq(good, good, good, "LOREM IPSUM dolor sit amet.").mkString("\n"))
    ).toDF("doc_id", "text")
    val got = TextClean.c4Clean(docs)
      .select("doc_id", "text_clean", "kept_lines", "dropped_lines")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, Seq(good, good + "!",
      "Closing remark with a full stop at the end.").mkString("\n"), 3L, 3L)))
  }

  test("c4Clean: terminal punctuation set is . ! ? \" and word count is whitespace-run based") {
    val docs = Seq(
      (1L, Seq("He said \"this is a quote line with words\"",
        "does this line with many words count?",
        "spaced   words   still   count   here   today.",
        "ends with comma not kept today,").mkString("\n"))).toDF("doc_id", "text")
    val got = TextClean.c4Clean(docs)
      .select("kept_lines", "dropped_lines").as[(Long, Long)].collect().toSeq
    assert(got == Seq((3L, 1L)))
  }

  test("markupCensus: each structural counter fires on its own line shape") {
    val text = Seq(
      "plain prose here",
      "# Title",
      "###### deep heading",
      "####### not a heading (7 hashes)",
      "    indented code",
      "\ttab code",
      "stmt();",
      "closing brace }",
      "| a | b |",
      "| unterminated table",
      "- item",
      "* star item",
      "-not a list").mkString("\n")
    val got = TextClean.markupCensus(Seq((1L, text)).toDF("doc_id", "text"))
      .select("n_lines", "n_code_lines", "n_heading_lines", "n_table_lines",
        "n_list_lines")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((13L, 4L, 2L, 1L, 2L)))
  }

  test("oovRate: tokens outside the vocab count, inside don't") {
    val docs = Seq((1L, "a b c zz"), (2L, "a a a")).toDF("doc_id", "text")
    val vocab = Seq("a", "b", "c").toDF("tok")
    val got = graft.operators.QualityFilter.oovRate(docs, vocab)
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 4L, 1L, 0.25), (2L, 3L, 0L, 0.0)))
  }

  test("redactLuhn: valid cards redact, checksum-failing runs survive") {
    val docs = Seq(
      // 4111111111111111 is the canonical Luhn-valid test PAN; +1 digit fails
      (1L, "pay 4111111111111111 not 4111111111111112 ok"),
      // too short (12) and too long (20) digit runs are not candidates
      (2L, "a 411111111111 b 41111111111111111111 c"),
      (3L, "plain text only")).toDF("doc_id", "text")
    val got = TextClean.redactLuhn(docs)
      .select("doc_id", "text_redacted", "n_digit_runs", "n_cc")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "pay <CC> not 4111111111111112 ok", 2L, 1L),
      (2L, "a 411111111111 b 41111111111111111111 c", 0L, 0L),
      (3L, "plain text only", 0L, 0L)))
  }

  test("readability: hand-computed counts on a two-sentence doc") {
    // "the cat sat. it ran away!" — 2 sentences, 6 words,
    // syllables: the(1) cat(1) sat.(1) it(1) ran(1) away!(2=a,ay) = 7,
    // distinct lowercased words = 6 (duplicate-free).
    val docs = Seq((1L, "The cat sat. the cat ran away!")).toDF("doc_id", "text")
    val r = graft.operators.QualityFilter.readability(docs)
      .select("n_sentences", "n_words", "n_syllables", "n_distinct_words", "ttr")
      .as[(Long, Long, Long, Long, Double)].head()
    // words: The cat sat. the cat ran away! → 7 words, distinct fold:
    // {the, cat, sat., ran, away!} = 5
    assert(r == ((2L, 7L, 8L, 5L, 5.0 / 7.0)))
  }

  test("filterBlockedDomains: offenders drop, URL-free docs survive") {
    val df = Seq(
      (1L, "see http://ads.bad.net/x"),
      (2L, "see https://fine.org/y"),
      (3L, "no urls")).toDF("doc_id", "text")
    val block = Seq("bad.net").toDF("domain")
    val kept = TextClean.filterBlockedDomains(df, block)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("redactPii: typed placeholders, audit counts, email-before-ip order") {
    val df = Seq(
      (0L, "mail a.b+c@ex-1.org and bob@10.0.0.1 now"),
      (1L, "call +4915712345678 twice +123456789"),
      (2L, "hosts 192.168.0.1 and 8.8.8.8"),
      (3L, "nothing to hide")).toDF("doc_id", "text")
    val got = TextClean.redactPii(df)
      .select("doc_id", "n_emails", "n_phones", "n_ips", "text_redacted")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    // bare-IP host is not an email by pattern — but its host (the
    // sensitive part) still redacts as an IP
    assert(got(0) == ((0L, 1L, 0L, 1L, "mail <EMAIL> and bob@<IP> now")))
    assert(got(1) == ((1L, 0L, 2L, 0L, "call <PHONE> twice <PHONE>")))
    assert(got(2) == ((2L, 0L, 0L, 2L, "hosts <IP> and <IP>")))
    assert(got(3) == ((3L, 0L, 0L, 0L, "nothing to hide")))
  }

  test("domainQuality: micro-averaged ratios from exact sums; k-link doc counts once") {
    val df = Seq(
      // both docs link a.com; doc 1 links it twice (n_urls 3, n_docs 2)
      (1L, "the fox https://a.com/x https://a.com/y jumps"),
      (2L, "zzz 123 https://a.com/z"),
      (3L, "no urls here at all")).toDF("doc_id", "text")
    val r = TextClean.domainQuality(df).collect()
      .map(x => x.getAs[String]("domain") -> x).toMap
    assert(r.keySet == Set("a.com"), "URL-free docs contribute no domain row")
    val a = r("a.com")
    assert(a.getAs[Long]("n_docs") == 2L && a.getAs[Long]("n_urls") == 3L)
    // exact integer sums over the two linking docs' full text
    val chars = "the fox https://a.com/x https://a.com/y jumps".length +
      "zzz 123 https://a.com/z".length
    assert(a.getAs[Long]("n_chars") == chars.toLong)
    assert(a.getAs[Double]("alpha_ratio") ==
      a.getAs[Long]("n_letters").toDouble / a.getAs[Long]("n_chars"))
  }

  test("canonicalUrl: authority casing, www, ports, fragments, tracking params, slash") {
    val cases = Seq(
      "HTTP://WWW.Example.COM:80/Path/A/" -> "http://example.com/Path/A",
      "https://example.com:443/x#frag" -> "https://example.com/x",
      // ?-led tracking param followed by a kept param
      "http://a.com/p?utm_source=f&id=2" -> "http://a.com/p?id=2",
      // tracking-only query string vanishes entirely
      "http://a.com/p?utm_a=1&utm_b=2&gclid=z" -> "http://a.com/p",
      // &-led tracking removed mid-query; kept params keep their order
      "http://a.com/p?id=2&fbclid=xyz&q=3" -> "http://a.com/p?id=2&q=3",
      // path case and non-default port are preserved; root slash trimmed
      "http://a.com:8080/" -> "http://a.com:8080",
      // utm-ish names that are NOT tracking params survive
      "http://a.com/p?utmx=1" -> "http://a.com/p?utmx=1")
    val got = cases.map(_._1).toDF("url")
      .select(TextClean.canonicalUrl(col("url"))).as[String].collect()
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalUrl($in) = $g, want $want") }
  }

  test("dedupByCanonicalUrl: recrawl variants collapse; keeper is min id") {
    val df = Seq(
      (5L, "http://www.A.com/x"), (3L, "http://a.com/x#top"),
      (9L, "HTTP://a.com/x?utm_source=s"), (7L, "http://b.com/y"))
      .toDF("doc_id", "url")
    val r = TextClean.dedupByCanonicalUrl(df)
      .select("doc_id", "url_canon", "keeper_id", "n_dupes", "is_keeper")
      .as[(Long, String, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(
      (3L, "http://a.com/x", 3L, 3L, true),
      (5L, "http://a.com/x", 3L, 3L, false),
      (7L, "http://b.com/y", 7L, 1L, true),
      (9L, "http://a.com/x", 3L, 3L, false)))
  }

  test("dedupByCanonicalUrl: null/unparseable URLs pass through as keepers") {
    // Before the fix every such row shared one degenerate canonical key
    // and all but the min id were silently dropped — data loss for any
    // doc lacking a well-formed scheme://host URL.
    val df = Seq(
      (1L, null.asInstanceOf[String]), (2L, "not a url"), (3L, "://nope"),
      (4L, "mailto:x@y.z"), (5L, "http://ok.com/a"), (6L, "http://ok.com/a"))
      .toDF("doc_id", "url")
    val r = TextClean.dedupByCanonicalUrl(df)
      .select("doc_id", "url_canon", "keeper_id", "n_dupes", "is_keeper")
      .as[(Long, Option[String], Long, Long, Boolean)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(
      (1L, None, 1L, 1L, true),
      (2L, None, 2L, 1L, true),
      (3L, None, 3L, 1L, true),
      (4L, None, 4L, 1L, true),
      (5L, Some("http://ok.com/a"), 5L, 2L, true),
      (6L, Some("http://ok.com/a"), 5L, 2L, false)))
  }
}
