package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for big-big equi-joins (SCALE.md).
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit salting
  * remains the tool when one side has pathological hot keys (a power-law
  * order key, a null-heavy FK) and the OTHER side is small enough per key to
  * replicate: the skewed side gets a random salt in [0, n), the build side is
  * exploded n× with every salt value, and the join key becomes (key, salt) —
  * splitting each hot key's row group across n tasks.
  */
object Skew {

  /** Salted inner equi-join on `key`: `skewed ⋈ build` where `build`'s rows
    * are replicated `salts`× . Row multiset equals the plain join. */
  def saltedJoin(skewed: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val salted = skewed.withColumn("__salt",
      pmod(spark_hash(skewed.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val replicated = build.withColumn("__salt", explode(lit((0 until salts).toArray)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Random-ish but deterministic per-row salt source: hash of all columns
    * (avoids rand(), which breaks retry/replay determinism at scale). */
  private def spark_hash(cols: Column*): Column = abs(hash(cols: _*))

  /** Top-N heavy-hitter keys with counts — the diagnostic used to decide
    * whether a join needs salting and with how many salts. */
  def heavyHitters(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key)).limit(topN)
}
