package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage by deletion-neighborhood blocking (the FastSS
  * device, Bocek et al. 2007): two strings within edit distance 1 MUST
  * share a member of {self} ∪ {one-char deletions}, so candidate pairs come
  * from an equi-join on the variant key and a cheap exact verify — never a
  * block² comparison over a coarse blocking key (a prefix/phonetic block of
  * m records costs m² comparisons; variant buckets only hold strings within
  * distance 2 of each other, so candidate volume tracks the TRUE near-match
  * density). The classic warehouse entity-resolution primitive: duplicate
  * customers/suppliers under typo'd names.
  *
  * == 100 TB shape ==
  * Variant generation is map-side (≤ len+1 rows per record, linear
  * blow-up); the self-join shuffles on the variant string; the verify is a
  * codegen'd `levenshtein` on the candidate pairs only. One distinct to
  * collapse multi-variant agreement. No driver state.
  */
object RecordLinkage {

  /** All pairs (id1 < id2) whose `keyCol` values are within Levenshtein
    * distance 1 (substitution, insertion, or deletion), found via
    * deletion-neighborhood blocking. Output: (id1, id2, key1, key2, dist). */
  def editNeighborPairs(records: DataFrame, idCol: String, keyCol: String): DataFrame = {
    // {self} ∪ {delete char i}: substitution-1 pairs share a deletion at the
    // differing position; insertion/deletion-1 pairs match the shorter
    // string itself against a deletion variant of the longer.
    // the join key is the 64-bit hash of the variant, not the string — the
    // shuffle carries fixed-width keys, and any hash-collision candidate is
    // killed by the exact levenshtein verify below
    val v = records.select(col(idCol).cast("long").as("id"), col(keyCol).as("key"))
      .select(col("id"), col("key"), explode(array_union(
        array(col("key")),
        expr("transform(sequence(1, length(key)), i -> concat(substring(key, 1, i-1), substring(key, i+1, length(key))))")
      )).as("variant"))
      .select(col("id"), col("key"), xxhash64(col("variant")).as("vh"))
    v.select(col("id").as("id1"), col("key").as("key1"), col("vh"))
      .join(v.select(col("id").as("id2"), col("key").as("key2"), col("vh")),
        Seq("vh"))
      .filter(col("id1") < col("id2"))
      // verify BEFORE the distinct: shared-variant candidates reach edit
      // distance 2 (and hash collisions anywhere), so the dedup only has to
      // hold the true near-matches, not the candidate volume
      .withColumn("dist", levenshtein(col("key1"), col("key2")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("id1"), col("id2"), col("key1"), col("key2"), col("dist"))
      .distinct()
  }
}
