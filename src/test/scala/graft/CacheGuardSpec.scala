package graft

import graft.operators.{CacheGuard, TextIndex, Trend}

class CacheGuardSpec extends SparkSpec {
  import spark.implicits._

  test("releaseAll unpersists operator-internal frames and is idempotent") {
    val docs = Seq((1L, "a b a c"), (2L, "b c d"), (3L, "a d d"))
      .toDF("doc_id", "text")
    TextIndex.tfIdfTopK(docs).count() // persists postings + dfreq
    val xy = Seq((1L, 10L), (2L, 30L), (3L, 20L), (4L, 40L)).toDF("x", "y")
    Trend.spearman(xy, "x", "y", "x", "y").count() // persists rank maps + base
    val released = CacheGuard.releaseAll(spark)
    assert(released >= 4, s"expected the four tracked frames, got $released")
    assert(CacheGuard.releaseAll(spark) == 0, "second release must find nothing")
    // operators still work after a release (fresh persists re-register)
    assert(TextIndex.tfIdfTopK(docs).count() > 0)
    assert(CacheGuard.releaseAll(spark) > 0)
  }
}
