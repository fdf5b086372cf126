package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, c: String, p: Int = 10) =
    Sketches.hllDistinct(df, c, p).collect().head

  test("hll: large cardinality takes the raw branch within the published error") {
    // 20k distinct strings with duplicates: HLL std error at m=1024 is
    // ~3.25%; assert a generous 4× band (one fixed seed, not a tail draw)
    val n = 20000
    val df = (0 until 3 * n).map(i => s"key-${i % n}").toDF("v")
    val r = sketch(df, "v")
    assert(r.getAs[String]("branch") == "raw")
    val est = r.getAs[Double]("estimate")
    assert(math.abs(est - n) < 0.13 * n, s"estimate $est vs exact $n")
    assert(r.getAs[Long]("n_zero") == 0L, "20k keys must occupy all 1024 registers")
  }

  test("hll: small cardinality takes the linear-counting branch, near-exact") {
    val df = (0 until 5000).map(i => s"lang-${i % 7}").toDF("v")
    val r = sketch(df, "v")
    assert(r.getAs[String]("branch") == "linear")
    val est = r.getAs[Double]("estimate")
    // linear counting at V ≈ m is near-exact for tiny cardinalities
    assert(math.abs(est - 7.0) < 1.0, s"estimate $est vs exact 7")
    assert(r.getAs[Long]("n_occupied") <= 7L)
  }

  test("hll: deterministic under repartitioning and duplication") {
    val base = (0 until 2000).map(i => s"u$i").toDF("v")
    val a = sketch(base, "v")
    val b = sketch(base.repartition(7), "v")
    val c = sketch(base.union(base).repartition(3), "v") // multiset-insensitive
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq == c.toSeq)
  }

  test("hll: empty and all-null inputs estimate zero via linear counting") {
    val empty = Seq.empty[String].toDF("v")
    val r = sketch(empty, "v")
    assert(r.getAs[Long]("n_occupied") == 0L)
    assert(r.getAs[String]("branch") == "linear")
    assert(r.getAs[Double]("estimate") == 0.0)
    val nulls = Seq[Option[String]](None, None).toDF("v")
    assert(sketch(nulls, "v").toSeq == r.toSeq)
  }

  test("hll: register table is the documented pure function of the hash") {
    // one value, p=10: its register and rho are exactly derivable
    val v = "the"
    val h = graft.functions.Hashing.hash64Local(v)
    val j = h & 1023L
    val tail = h >>> 10
    val rho = if (tail == 0) 51L else java.lang.Long.numberOfTrailingZeros(tail) + 1L
    val r = sketch(Seq(v).toDF("v"), "v")
    assert(r.getAs[Long]("n_occupied") == 1L)
    assert(r.getAs[Long]("m_max") == rho)
    // denominator numerator: (m−1) empty registers at 2^51 + one at 2^(51−rho)
    assert(r.getAs[Long]("denom_num") == 1023L * (1L << 51) + (1L << (51 - rho)))
    assert(j >= 0 && j < 1024) // and the index stayed in range
  }
}
