package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest, Prop}
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Schemas, Scd2Spec}
import graft.ops.Scd2Upsert

/** Property-based SCD2 invariants (SURVEY.md §5.4): for arbitrary source
  * batches and run sequences, every business key keeps exactly one open row,
  * validity intervals never invert, and surrogate keys stay dense+unique.
  * (Plain ScalaCheck runner — the scalatest bridge artifact isn't among the
  * pinned deps.) */
class Scd2PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val spec = Scd2Spec("dim_t", "tkey", "id", Seq("attr"))

  /** Batches with UNIQUE business keys — the pipeline contract: sources pass
    * C1 primary-key validation before any SCD2 run (validate_data.py:79-86),
    * so duplicate-keyed sources never reach the upsert. */
  private val batchGen: Gen[List[(Int, String)]] = for {
    n <- Gen.choose(1, 8)
    ids <- Gen.pick(n, 1 to 8)
    vals <- Gen.listOfN(n, Gen.stringOfN(5, Gen.alphaChar))
  } yield ids.toList.zip(vals)

  test("multi-run SCD2 maintains invariants for arbitrary batches") {
    val prop = Prop.forAllNoShrink(batchGen, batchGen) { (b1, b2) =>
      val d1 = Date.valueOf("2024-01-01")
      val d2 = Date.valueOf("2024-03-01")
      val dim1 = Scd2Upsert.initialLoad(b1.toDF("id", "attr"), spec, d1)
      val dim = Scd2Upsert.run(b2.toDF("id", "attr"), dim1, spec, d2).cache()
      try {
        val multiOpen = dim.filter(col("enddate") === lit(Schemas.HighDate))
          .groupBy("id").count().filter(col("count") > 1).count()
        val inverted = dim.filter(col("startdate") > col("enddate")).count()
        val keys = dim.select("tkey").collect().map(_.getLong(0)).sorted.toSeq
        Prop(multiOpen == 0L) :| "one open row per key" &&
          Prop(inverted == 0L) :| "intervals never invert" &&
          Prop(keys == (1L to keys.length)) :| s"keys dense 1..N, got $keys"
      } finally dim.unpersist()
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
