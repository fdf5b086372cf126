package graft

import graft.operators.LangId

/** Trigram LID: argmax with fixed priority; segment census finds
  * code-switching that document-level LID would flatten. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("predict: marker-heavy texts classify to their language") {
    val docs = Seq(
      (1L, "the thing and the king are singing"),
      (2L, "le jour de la vie est que belle"),
      (3L, "der junge und die schule sind sich")).toDF("doc_id", "text")
    val got = LangId.predict(docs).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "en"), (2L, "fr"), (3L, "de")))
  }

  test("predict: sub-trigram text scores zero everywhere and falls to priority head") {
    val got = LangId.predict(Seq((1L, "ab")).toDF("doc_id", "text"))
      .select("pred_lang").as[String].head()
    assert(got == "en") // all-zero scores: the fixed priority order decides
  }

  test("codeSwitchCensus: mixed docs flag, monolingual docs don't, ties break by lang") {
    val en = "the thing and the king are singing"
    val fr = "le jour de la vie est que belle"
    val docs = Seq(
      (1L, s"$en. $en. $en."),   // monolingual
      (2L, s"$en. $fr. $fr."),   // majority fr
      (3L, s"$en. $fr.")         // 1-1 tie -> majority 'en' (lang asc)
    ).toDF("doc_id", "text")
    val got = LangId.codeSwitchCensus(docs)
      .select("doc_id", "n_segments", "n_langs", "majority_lang",
        "majority_frac", "is_code_switched")
      .as[(Long, Long, Long, String, Double, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, "en", 1.0, false),
      (2L, 3L, 2L, "fr", 2.0 / 3.0, true),
      (3L, 2L, 2L, "en", 0.5, true)))
  }
}
