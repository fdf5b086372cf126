package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T5-style span-corruption training-example construction (Raffel et al.
  * 2020, §3.1.4 — the denoising objective behind T5/UL2 pretraining): mask
  * spans of the document, replace each with a numbered sentinel in the
  * INPUT, and emit the masked content behind the matching sentinels as the
  * TARGET. This is objective construction — the layer above packing /
  * chunking (which arrange examples) where the examples themselves are
  * manufactured from the corpus.
  *
  * Determinism contract (the house device): the "random" span choice is
  * the doc-and-chunk identity hash, so reruns at any parallelism — and the
  * DuckDB oracle — pick the identical spans. Spans are the fixed
  * non-overlapping length-`spanLen` grid chunks of the whitespace token
  * array; a chunk is masked iff hash64(doc_id:chunk) % everyK = 0
  * (≈ 1/everyK corruption rate; T5's 15% ≈ everyK 7 at spanLen 3).
  *
  * Pure map-side: one split + a codegen'd HOF chain per row, zero
  * shuffles at any corpus size. Sentinel numbering is the running count of
  * masked chunks before each chunk — computed per chunk from the flag
  * prefix (O(chunks²) per doc, trivially small against the string work).
  */
object SpanCorruption {

  def corrupt(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", spanLen: Int = 3, everyK: Int = 5): DataFrame = {
    require(spanLen >= 1 && everyK >= 2)
    val L = spanLen
    val h = graft.functions.Hashing.hash64Expr(
      "concat(cast(doc_id as string), ':', cast(c as string))")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__toks"))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("__nc", expr(s"cast((n_tokens + $L - 1) div $L as int)"))
      .withColumn("__flags",
        expr(s"transform(sequence(0, __nc - 1), c -> $h % $everyK = 0)"))
      .withColumn("__sidx", expr(
        "transform(sequence(0, __nc - 1), c -> " +
          "size(filter(slice(__flags, 1, c), x -> x)))"))
      .withColumn("n_spans",
        expr("size(filter(__flags, x -> x))").cast("long"))
      .withColumn("input", expr(
        s"""array_join(transform(sequence(0, __nc - 1), c ->
            IF(element_at(__flags, c + 1),
               concat('<extra_id_', element_at(__sidx, c + 1), '>'),
               array_join(slice(__toks, c * $L + 1, $L), ' '))), ' ')"""))
      .withColumn("target", expr(
        s"""array_join(filter(transform(sequence(0, __nc - 1), c ->
            IF(element_at(__flags, c + 1),
               concat('<extra_id_', element_at(__sidx, c + 1), '> ',
                      array_join(slice(__toks, c * $L + 1, $L), ' ')),
               '')), p -> p != ''), ' ')"""))
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        col("input"), col("target"))
  }

  /** Needle-in-a-haystack example construction — the long-context
    * retrieval eval (and its training-data augmentation): splice one
    * uniquely-identifying "needle" sentence into each document at a
    * hash-deterministic token offset, and record WHERE it went and WHAT
    * it says, so the eval harness can ask for the value and score the
    * answer. The emitted `recovered_ok` column re-extracts the value
    * from the spliced text by regex — construction that self-checks its
    * own round trip (a splice that mangles the needle flips a hashed
    * boolean). Same determinism contract as [[corrupt]]/[[fim]]; pure
    * map-side. */
  def insertNeedle(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val hPos = graft.functions.Hashing.hash64Expr(
      "concat(cast(doc_id as string), ':npos')")
    val hVal = graft.functions.Hashing.hash64Expr(
      "concat(cast(doc_id as string), ':nval')")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__toks"))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("needle_pos", expr(s"$hPos % (n_tokens + 1)"))
      .withColumn("needle_value", expr(s"$hVal % 10000"))
      .withColumn("__needle", concat(lit("The magic number for document "),
        col("doc_id"), lit(" is "), col("needle_value"), lit(".")))
      .withColumn("output", concat(
        array_join(expr("slice(__toks, 1, cast(needle_pos as int))"), " "),
        when(col("needle_pos") > 0, lit(" ")).otherwise(lit("")),
        col("__needle"),
        when(col("needle_pos") < col("n_tokens"), lit(" ")).otherwise(lit("")),
        array_join(expr(
          "slice(__toks, cast(needle_pos as int) + 1, cast(n_tokens - needle_pos as int))"), " ")))
      .withColumn("recovered_ok",
        regexp_extract(col("output"),
          "The magic number for document \\d+ is (\\d+)\\.", 1)
          === col("needle_value").cast("string"))
      .select(col("doc_id"), col("n_tokens"), col("needle_pos"),
        col("needle_value"), col("output"), col("recovered_ok"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle"): split the token
    * stream at two points into prefix/middle/suffix and emit the PSM
    * rearrangement `<PRE> prefix <SUF> suffix <MID> middle`, applied to a
    * deterministic `rate10`/10 fraction of documents (the paper's
    * fim_rate; untransformed docs pass through verbatim, as the recipe
    * requires — FIM is applied to a fraction of the corpus, not all of
    * it).
    *
    * Same determinism contract as [[corrupt]]: the apply decision and
    * both cut points are doc-identity hashes (uniform over 0..n_tokens
    * inclusive — empty prefix/middle/suffix are legal and exercised), so
    * reruns at any parallelism and the oracle pick identical splits, and
    * prefix+middle+suffix always reassembles the document (spec-pinned).
    * Pure map-side, zero shuffles. */
  def fim(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", rate10: Int = 5): DataFrame = {
    require(rate10 >= 0 && rate10 <= 10)
    val hApply = graft.functions.Hashing.hash64Expr(
      "concat(cast(doc_id as string), ':fim')")
    val hCutA = graft.functions.Hashing.hash64Expr(
      "concat(cast(doc_id as string), ':cuta')")
    val hCutB = graft.functions.Hashing.hash64Expr(
      "concat(cast(doc_id as string), ':cutb')")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__toks"))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("fim_applied", expr(s"$hApply % 10 < $rate10"))
      .withColumn("cut_lo", expr(
        s"least($hCutA % (n_tokens + 1), $hCutB % (n_tokens + 1))"))
      .withColumn("cut_hi", expr(
        s"greatest($hCutA % (n_tokens + 1), $hCutB % (n_tokens + 1))"))
      .withColumn("output", when(!col("fim_applied"),
          array_join(col("__toks"), " "))
        .otherwise(concat(
          lit("<PRE> "),
          array_join(expr("slice(__toks, 1, cast(cut_lo as int))"), " "),
          lit(" <SUF> "),
          array_join(expr(
            "slice(__toks, cast(cut_hi as int) + 1, cast(n_tokens - cut_hi as int))"), " "),
          lit(" <MID> "),
          array_join(expr(
            "slice(__toks, cast(cut_lo as int) + 1, cast(cut_hi - cut_lo as int))"), " "))))
      .select(col("doc_id"), col("n_tokens"), col("fim_applied"),
        col("cut_lo"), col("cut_hi"), col("output"))
  }
}
