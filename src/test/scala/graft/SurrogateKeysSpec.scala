package graft

import org.apache.spark.sql.functions._
import graft.ops.SurrogateKeys

/** W2: dense, deterministic IDENTITY replacement — both implementations. */
class SurrogateKeysSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(("c", 30), ("a", 10), ("b", 20)).toDF("k", "v")

  test("assign: dense 1..N in business-key order, plus offset") {
    val keyed = SurrogateKeys.assign(df, "id", 100L, "k")
    assert(rows(keyed.orderBy("id").select("id", "k")) ==
      Seq(Seq(101L, "a"), Seq(102L, "b"), Seq(103L, "c")))
  }

  test("assignScalable matches assign (distributed zipWithIndex path)") {
    val big = spark.range(1000).select((col("id") * 7 % 1000).as("k"))
    val a = rows(SurrogateKeys.assign(big, "sk", 0L, "k").orderBy("sk"))
    val b = rows(SurrogateKeys.assignScalable(big, "sk", 0L, "k").orderBy("sk"))
    assert(a == b)
  }

  test("maxKey: high-water mark, 0 on empty") {
    val keyed = SurrogateKeys.assign(df, "id", 5L, "k")
    assert(SurrogateKeys.maxKey(keyed, "id") == 8L)
    assert(SurrogateKeys.maxKey(keyed.limit(0), "id") == 0L)
  }

  test("determinism: same input → same keys across evaluations") {
    val keyed = SurrogateKeys.assign(df.repartition(3), "id", 0L, "k")
    assert(rows(keyed.orderBy("id")) == rows(keyed.orderBy("id")))
  }
}
