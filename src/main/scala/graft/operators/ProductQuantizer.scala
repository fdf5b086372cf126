package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.DotProductLong

/** Product quantization for ANN search (Jégou, Douze & Schmid 2011,
  * "Product Quantization for Nearest Neighbor Search"): split each D-dim
  * vector into `m` subvectors, learn a small k-means codebook per subspace,
  * and store each corpus vector as just `m` centroid ids. Asymmetric
  * distance computation (ADC) then scores a FULL-precision query against
  * the compressed corpus by summing per-subspace query×centroid dots —
  * the 100 TB ANN memory move: the scan reads m small ints per vector
  * instead of D floats (64-dim float → 4 codes here is a 64× payload cut),
  * while queries lose no precision at all.
  *
  * Everything inherits the repo's determinism contract:
  *  - codebooks come from [[KMeans.fit]] per subspace (hash-ranked seeds,
  *    integer-grid Lloyd) on SLICED embeddings — quantize∘slice ≡
  *    slice∘quantize, so an oracle can replay each fit on list slices;
  *  - codes are the codebook's cluster ids with the same (negscore, cid)
  *    tie-break as every assignment in [[KMeans]];
  *  - ADC sims are exact-integer dot/norm sums with one final IEEE
  *    sqrt+division — reruns and other engines rank identically.
  *
  * Plan shape: encoding is a pure MAP over the corpus scan (codebooks are
  * driver literals, zero joins); ADC is broadcast-queries × encoded-corpus
  * with a map-side score whose codebook lookups are literal maps — the
  * same "model as literals" move as [[KMeans.assign]]. No stage touches
  * anything corpus-proportional except the one scan.
  */
object ProductQuantizer {

  final case class PQModel(subDim: Int, books: Seq[KMeans.Model]) {
    def m: Int = books.size
  }

  /** Train one codebook per subspace on the sliced embedding column, as a
    * JOINT Lloyd loop: all m subspaces assign and re-center in the SAME
    * job, with the subspace id riding the aggregation key — (iters+1)
    * corpus scans total instead of m·(iters+1), and one model-sized
    * (m·ksub·subDim cells) collect per iteration. Per-subspace results are
    * bit-identical to independent [[KMeans.fit]] runs: seeds are the same
    * k (hash64(vec_id), vec_id)-ranked vectors for every subspace (the
    * rank ignores the vector payload), assignments use the same
    * (negscore, cid) argmin per slice, and means use the same
    * floor(s/n + 0.5) re-rounding. At real scale pass a hash-sampled
    * training frame ([[Sampling.hashSample]]); codebook quality needs a
    * sample, not the corpus. */
  def fit(emb: DataFrame, m: Int, ksub: Int = 8, iters: Int = 2, dim: Int = -1,
      idCol: String = "vec_id", embCol: String = "embedding"): PQModel = {
    val d = if (dim > 0) dim else VectorSearch.probeDim(emb, embCol)
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    jointFit(
      emb.filter(col(embCol).isNotNull)
        .select(col(idCol).as("vec_id"), VectorSearch.quantize(embCol).as("q")),
      m, d / m, ksub, iters)
  }

  /** The fused per-subspace Lloyd loop over a prepared (vec_id, q) frame of
    * full-dim quantized-integer vectors. */
  private def jointFit(preparedQ: DataFrame, m: Int, sub: Int, ksub: Int,
      iters: Int): PQModel = {
    val prepared = preparedQ.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Seeds: the ksub (hash64(vec_id), vec_id)-ranked vectors — the rank
      // is payload-independent, so every subspace's KMeans.seedsPrepared
      // would pick exactly these rows; slicing them gives identical seeds.
      val picked = prepared
        .withColumn("h", graft.functions.Hashing.hash64(col("vec_id").cast("string")))
        .orderBy(col("h"), col("vec_id"))
        .limit(ksub)
        .select(col("q")).collect()
      require(picked.nonEmpty, "pq fit: empty input frame")
      var books: Seq[KMeans.Model] = (0 until m).map { j =>
        KMeans.Model(picked.toSeq.zipWithIndex.map { case (r, i) =>
          i -> r.getSeq[Long](0).slice(j * sub, (j + 1) * sub).toArray
        })
      }
      for (_ <- 1 to iters) {
        // One job: every subspace's assignment is a map-side literal argmin
        // on its slice; cells aggregate on (subspace, cluster, pos).
        val cells = prepared
          .select(inline(array((0 until m).map { j =>
            val qj = slice(col("q"), j * sub + 1, sub)
            struct(lit(j).as("subspace"),
              KMeans.clusterExprOn(books(j), qj).as("cluster"), qj.as("qs"))
          }: _*)))
          .select(col("subspace"), col("cluster"),
            posexplode(col("qs")).as(Seq("pos", "v")))
          .groupBy(col("subspace"), col("cluster"), col("pos"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          // identical re-rounding to KMeans.update — the oracle replays it
          .withColumn("val", floor(col("s").cast("double") / col("n") + 0.5).cast("long"))
          .select(col("subspace"), col("cluster"), col("pos"), col("val"))
          .collect()
        books = (0 until m).map { j =>
          val rows = cells.filter(_.getInt(0) == j)
          KMeans.Model(rows.groupBy(_.getLong(1)).toSeq.sortBy(_._1).map { case (cid, rs) =>
            cid.toInt -> rs.sortBy(_.getInt(2)).map(_.getLong(3)).toArray
          })
        }
      }
      PQModel(sub, books)
    } finally prepared.unpersist()
  }

  /** Nearest-centroid id within subspace `j` of the quantized vector in
    * `qCol` — [[KMeans]]'s argmin-of-(cc − 2qc) with the identical
    * (negscore, cid) tie-break, on the slice. */
  private def codeExpr(model: PQModel, j: Int, qCol: String): Column = {
    val qs = slice(col(qCol), j * model.subDim + 1, model.subDim)
    array_min(array(model.books(j).centroids.map { case (cid, c) =>
      val cc = c.map(x => x * x).sum
      struct(
        (lit(cc) - DotProductLong(qs, typedlit(c.toSeq)) * 2).as("negscore"),
        lit(cid.toLong).as("cid"))
    }: _*)).getField("cid")
  }

  /** Corpus → (vec_id, codes array<bigint>): the stored PQ index payload.
    * Pure map over the scan; persist this (e.g. via the catalog) and ADC
    * never reads a raw vector again. */
  def encode(emb: DataFrame, model: PQModel,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    emb.filter(col(embCol).isNotNull)
      .select(col(idCol).as("vec_id"), VectorSearch.quantize(embCol).as("q"))
      .select(col("vec_id"),
        array((0 until model.m).map(codeExpr(model, _, "q")): _*).as("codes"))

  /** Corpus → (vec_id, bucket, codes): the stored IVF-PQ index payload —
    * [[encode]]'s codes plus the coarse-quantizer inverted-list id. Build
    * once (catalog table or localCheckpoint), probe many: every
    * [[ivfpqProbeTopK]] consumer then reads 1 small int + m small ints per
    * vector and never re-runs the per-row assignment argmins. */
  def encodeIvf(emb: DataFrame, coarse: KMeans.Model, model: PQModel,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    emb.filter(col(embCol).isNotNull)
      .select(col(idCol).as("vec_id"), VectorSearch.quantize(embCol).as("q"))
      .withColumn("bucket", KMeans.clusterExpr(coarse))
      .select(col("vec_id"), col("bucket"),
        array((0 until model.m).map(codeExpr(model, _, "q")): _*).as("codes"))

  /** Σⱼ dot(query-sliceⱼ, codebookⱼ[codeⱼ]) via literal-map lookups —
    * expects columns `qv` (quantized query) and `codes`. */
  private def adcDotSum(model: PQModel): Column =
    (0 until model.m).map { j =>
      val book = typedlit(model.books(j).centroids
        .map { case (cid, c) => cid.toLong -> c.toSeq }.toMap)
      DotProductLong(
        slice(col("qv"), j * model.subDim + 1, model.subDim),
        element_at(book, col("codes").getItem(j)))
    }.reduce(_ + _)

  /** Σⱼ |codebookⱼ[codeⱼ]|² — the reconstruction's exact squared norm. */
  private def adcNormSum(model: PQModel): Column =
    (0 until model.m).map { j =>
      val norms = typedlit(model.books(j).centroids
        .map { case (cid, c) => cid.toLong -> c.map(x => x * x).sum }.toMap)
      element_at(norms, col("codes").getItem(j))
    }.reduce(_ + _)

  /** ADC cosine top-k: full-precision queries against PQ codes.
    * sim ≈ Σⱼ dot(qⱼ, cb[codeⱼ]) / √(|q|² · Σⱼ |cb[codeⱼ]|²) — the
    * reconstruction never materializes; per-subspace dots and norms come
    * from literal-map lookups on the code. `encoded` defaults to
    * [[encode]] of `emb` but a persisted codes table slots in unchanged. */
  def adcTopK(emb: DataFrame, model: PQModel, queryPred: Column, k: Int,
      encoded: DataFrame = null,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    // Ad-hoc (no stored codes table): materialize the code scan ONCE before
    // the probe joins it — the per-row argmin encode is the expensive step,
    // and leaving it lazy re-runs it inside every consumer's pipeline
    // (measured 3.2 s → 0.7 s on the sf0.1 gate). This is the in-session
    // form of exactly what [[encode]]'s doc says to do at scale: the codes
    // ARE the index; build once, probe many.
    val codes = Option(encoded)
      .getOrElse(encode(emb, model, idCol, embCol).localCheckpoint())
      .select(col("vec_id").as("nid"), col("codes"))
    val qs = broadcast(emb.filter(col(embCol).isNotNull).filter(queryPred)
      .select(col(idCol).as("qid"), VectorSearch.quantize(embCol).as("qv"))
      .withColumn("qn", DotProductLong(col("qv"), col("qv"))))
    qs.join(codes, col("qid") =!= col("nid"))
      .withColumn("dp", adcDotSum(model))
      .withColumn("rn2", adcNormSum(model))
      .withColumn("sim", col("dp").cast("double") /
        sqrt(col("qn").cast("double") * col("rn2").cast("double")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** IVF-PQ (the billion-scale composite index): a coarse k-means quantizer
    * prunes the CANDIDATE SET (probe only the query's inverted list) while
    * PQ codes compress the PAYLOAD the probe reads — at 100 TB the scan
    * touches 1/k_coarse of the corpus at m ints per vector. Non-residual
    * variant (codes quantize the raw vectors, as FAISS `by_residual=false`):
    * the bucket only prunes, so the ADC arithmetic — and determinism
    * contract — is exactly [[adcTopK]]'s; residual encoding is the recall
    * upgrade that would add a (bucket, code) cross-dot literal table.
    * The probe is a broadcast EQUI-join on bucket id, not a nested loop. */
  def ivfpqProbeTopK(emb: DataFrame, coarse: KMeans.Model, model: PQModel,
      queryPred: Column, k: Int, nProbe: Int = 1, encoded: DataFrame = null,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val e = emb.filter(col(embCol).isNotNull)
      .select(col(idCol).as("vec_id"), VectorSearch.quantize(embCol).as("q"))
    // `encoded` slots in a persisted (vec_id, bucket, codes) index table
    // ([[encodeIvf]]); the ad-hoc path materializes the encode once for
    // the same reason [[adcTopK]] does
    val codes = Option(encoded)
      .getOrElse(encodeIvf(emb, coarse, model, idCol, embCol).localCheckpoint())
      .select(col("vec_id").as("nid"), col("bucket"), col("codes"))
    // Multi-probe (the standard IVF recall knob): each query fans out to
    // its nProbe NEAREST coarse buckets — nProbe=1 is exactly "its own
    // bucket". Sorting (negscore, cid) structs matches every assignment
    // tie-break in [[KMeans]]; the fan-out multiplies only the broadcast
    // query side, never the corpus.
    val entries = array(coarse.centroids.map { case (cid, c) =>
      val cc = c.map(x => x * x).sum
      struct(
        (lit(cc) - DotProductLong(col("q"), typedlit(c.toSeq)) * 2).as("negscore"),
        lit(cid.toLong).as("cid"))
    }: _*)
    val qs = broadcast(e.filter(queryPred)
      .withColumn("qn", DotProductLong(col("q"), col("q")))
      .withColumn("bucket",
        explode(transform(slice(sort_array(entries), 1, nProbe),
          s => s.getField("cid"))))
      .select(col("vec_id").as("qid"), col("q").as("qv"), col("qn"), col("bucket")))
    qs.join(codes, Seq("bucket")).filter(col("qid") =!= col("nid"))
      .withColumn("dp", adcDotSum(model))
      .withColumn("rn2", adcNormSum(model))
      .withColumn("sim", col("dp").cast("double") /
        sqrt(col("qn").cast("double") * col("rn2").cast("double")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** Quantized residual of each vector against its coarse centroid —
    * exact long subtraction; expects columns `q` and `bucket`. */
  private def residualExpr(coarse: KMeans.Model): Column = {
    val cents = typedlit(coarse.centroids
      .map { case (cid, c) => cid.toLong -> c.toSeq }.toMap)
    zip_with(col("q"), element_at(cents, col("bucket")), (a, b) => a - b)
  }

  /** Train PQ codebooks on coarse-quantizer RESIDUALS (the FAISS-default
    * `by_residual=true` form): residuals concentrate near zero, so the
    * same ksub centroids spend their resolution on the part of the vector
    * the coarse quantizer didn't explain — the recall upgrade over
    * [[fit]]. Residuals are exact integer differences scaled back to
    * floats for [[KMeans.fit]]; the /10⁴ → ×10⁴ double round-trip is
    * exact for |r| ≪ 2⁵¹, so quantize∘descale is the identity and an
    * oracle can replay the fits directly on integer residual lists. */
  def fitResidual(emb: DataFrame, coarse: KMeans.Model, m: Int, ksub: Int = 8,
      iters: Int = 2, dim: Int = -1,
      idCol: String = "vec_id", embCol: String = "embedding"): PQModel = {
    val d = if (dim > 0) dim else VectorSearch.probeDim(emb, embCol)
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    // Integer residuals feed jointFit directly: KMeans.fit would descale
    // them to floats and re-quantize, and quantize∘descale is the identity
    // for |r| ≪ 2⁵¹ — the fused loop sees the identical integer grid.
    val withR = emb.filter(col(embCol).isNotNull)
      .select(col(idCol).as("vec_id"), VectorSearch.quantize(embCol).as("q"))
      .withColumn("bucket", KMeans.clusterExpr(coarse))
      .select(col("vec_id"), residualExpr(coarse).as("q"))
    jointFit(withR, m, d / m, ksub, iters)
  }

  /** Residual codes: (vec_id, bucket, codes) — each code quantizes the
    * vector's residual slice against subspace `j`'s residual codebook. */
  def encodeResidual(emb: DataFrame, coarse: KMeans.Model, model: PQModel,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    emb.filter(col(embCol).isNotNull)
      .select(col(idCol).as("vec_id"), VectorSearch.quantize(embCol).as("q"))
      .withColumn("bucket", KMeans.clusterExpr(coarse))
      .withColumn("r", residualExpr(coarse))
      .select(col("vec_id"), col("bucket"),
        array((0 until model.m).map(codeExpr(model, _, "r")): _*).as("codes"))

  /** Residual IVF-PQ probe: recon(x) = coarse_centroid(bucket) + Σⱼ
    * bookⱼ[codeⱼ], so dot(q, recon) = dot(q, cb) + Σⱼ dot(q-sliceⱼ,
    * bookⱼ[codeⱼ]) and |recon|² = |cb|² + 2·Σⱼ dot(cb-sliceⱼ,
    * bookⱼ[codeⱼ]) + Σⱼ |bookⱼ[codeⱼ]|² — every term an exact integer
    * from literal-map lookups (the cross term dots two LITERAL lookups;
    * no reconstruction ever materializes). Same bucket equi-join shape as
    * [[ivfpqProbeTopK]]. */
  def ivfpqResidualProbeTopK(emb: DataFrame, coarse: KMeans.Model, model: PQModel,
      queryPred: Column, k: Int, encoded: DataFrame = null,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val e = emb.filter(col(embCol).isNotNull)
      .select(col(idCol).as("vec_id"), VectorSearch.quantize(embCol).as("q"))
      .withColumn("bucket", KMeans.clusterExpr(coarse))
    // same stored-index slot as [[ivfpqProbeTopK]]: (vec_id, bucket, codes)
    // from [[encodeResidual]]
    val codes = Option(encoded)
      .getOrElse(encodeResidual(emb, coarse, model, idCol, embCol).localCheckpoint())
      .withColumnRenamed("vec_id", "nid")
    val qs = broadcast(e.filter(queryPred)
      .select(col("vec_id").as("qid"), col("q").as("qv"), col("bucket"))
      .withColumn("qn", DotProductLong(col("qv"), col("qv"))))
    val cents = typedlit(coarse.centroids
      .map { case (cid, c) => cid.toLong -> c.toSeq }.toMap)
    val centNorms = typedlit(coarse.centroids
      .map { case (cid, c) => cid.toLong -> c.map(x => x * x).sum }.toMap)
    val crossSum = (0 until model.m).map { j =>
      val slices = typedlit(coarse.centroids.map { case (cid, c) =>
        cid.toLong -> c.slice(j * model.subDim, (j + 1) * model.subDim).toSeq
      }.toMap)
      val book = typedlit(model.books(j).centroids
        .map { case (cid, c) => cid.toLong -> c.toSeq }.toMap)
      DotProductLong(element_at(slices, col("bucket")),
        element_at(book, col("codes").getItem(j)))
    }.reduce(_ + _)
    qs.join(codes, Seq("bucket")).filter(col("qid") =!= col("nid"))
      .withColumn("dp",
        DotProductLong(col("qv"), element_at(cents, col("bucket"))) + adcDotSum(model))
      .withColumn("rn2",
        element_at(centNorms, col("bucket")) + lit(2L) * crossSum + adcNormSum(model))
      .withColumn("sim", col("dp").cast("double") /
        sqrt(col("qn").cast("double") * col("rn2").cast("double")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** Two-stage search (the production serving shape): a cheap PQ-ADC
    * SHORTLIST over the compressed corpus, then an EXACT cosine re-rank of
    * only the shortlist against full-precision vectors. The expensive full
    * vectors are read for Q·shortlist rows, not the corpus — at 100 TB
    * the re-rank side is a broadcast of the (tiny) shortlist against the
    * id-keyed vector table, ideally bucketed/sorted by vec_id so the
    * point lookups file-prune. Final ranks are exact where it matters
    * (the top k) while the scan cost stays PQ-sized. */
  def adcShortlistRerank(emb: DataFrame, model: PQModel, queryPred: Column,
      shortlist: Int, k: Int, encoded: DataFrame = null,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val sl = broadcast(
      adcTopK(emb, model, queryPred, shortlist, encoded, idCol, embCol)
        .select(col("qid"), col("nid")))
    val e = VectorSearch.prepared(emb, idCol, embCol)
    sl.join(e.select(col("vec_id").as("qid"), col("q").as("qv"), col("nn").as("qn")),
        Seq("qid"))
      .join(e.select(col("vec_id").as("nid"), col("q").as("cv"), col("nn").as("cn")),
        Seq("nid"))
      .withColumn("dp", VectorSearch.dot("qv", "cv"))
      .withColumn("sim", VectorSearch.cosine("dp", "qn", "cn"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** The model in persistable long-row form: (subspace, cluster, pos,
    * value) — m·ksub·subDim exact integer cells. */
  def modelDf(spark: org.apache.spark.sql.SparkSession, model: PQModel): DataFrame = {
    import spark.implicits._
    model.books.zipWithIndex.flatMap { case (b, j) =>
      b.centroids.flatMap { case (cid, c) =>
        c.zipWithIndex.map { case (v, pos) => (j.toLong, cid.toLong, pos.toLong, v) }
      }
    }.toDF("subspace", "cluster", "pos", "value")
  }

  def saveModel(cat: graft.catalog.Catalog, table: String,
      spark: org.apache.spark.sql.SparkSession, model: PQModel): Unit =
    cat.write(table, modelDf(spark, model))

  /** Model-sized collect (m·ksub·subDim rows), never corpus-sized. */
  def loadModel(cat: graft.catalog.Catalog, table: String): PQModel = {
    val cells = cat.read(table)
      .select(col("subspace"), col("cluster"), col("pos"), col("value")).collect()
    require(cells.nonEmpty, s"pq: stored model '$table' is empty")
    val books = cells.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (_, rows) =>
      KMeans.Model(rows.groupBy(_.getLong(1)).toSeq.sortBy(_._1).map { case (cid, cs) =>
        cid.toInt -> cs.sortBy(_.getLong(2)).map(_.getLong(3)).toArray
      })
    }
    val subDim = books.head.centroids.head._2.length
    PQModel(subDim, books)
  }
}
