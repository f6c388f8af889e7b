package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k. The query set is broadcast, so the
  *    corpus is scanned once with no shuffle of the corpus side; per-query top-k is
  *    a bounded window. Right when |queries| is small (the usual batch-scoring
  *    shape). This is the correctness baseline.
  *  - [[lshTopK]] — sign-LSH (random hyperplane) bucketing, multi-table for
  *    recall: corpus and queries hash to buckets, candidates meet in a bucket
  *    equi-join (queries broadcast, corpus in place), exact cosine scores in
  *    the scan pipeline, and the only exchange is the multi-table dedup on
  *    (query_id, neighbor_id, cosine) — 24 B/row, no vector ever shuffles. At
  *    100 TB each query touches ~|corpus|/2^planes per bucket instead of the
  *    whole corpus — the IVF-style scale path.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, neighbor_id, cosine, rank), rank 1..k, ties broken by
    * neighbor id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), V.l2normalize(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), V.l2normalize(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        V.dot(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer assigns every corpus vector to
    * its nearest of `centroids` cells; each query probes only its `nprobe`
    * nearest cells and re-ranks the candidates exactly. This is the
    * cluster-pruning scale path (FAISS-style IVF-Flat): per query it touches
    * ~`nprobe/centroids` of the corpus instead of all of it, and the cell
    * assignment is a plain 8-byte shuffle key, so the candidate join partitions
    * like any equi-join. `nprobe = centroids` probes everything — exact by
    * construction (the correctness configuration); production tunes
    * `nprobe << centroids` for the recall/cost trade.
    *
    * The quantizer here is a deterministic id-ordered sample of the corpus
    * (lowest `centroids` ids): k-means would place cells better but its
    * float-accumulation order makes centroids run-dependent, and the IVF
    * machinery — assignment, inverted cells, probe join, exact re-rank — is
    * identical either way. Swap the `cents` plan for trained centroids to
    * upgrade placement without touching the rest. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, dim: Int,
              centroids: Int = 16, nprobe: Int = 4,
              excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), V.l2normalize(col(vecCol)).as("cv"))
    // deterministic quantizer: the `centroids` lowest-id corpus vectors
    // (tiny driver collect — centroids × dim doubles)
    val cents2d: Array[Array[Double]] = c.orderBy(col("neighbor_id")).limit(centroids)
      .select(col("cv")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    // fail fast on a wrong `dim` (a silent mismatch would slice short
    // subvectors downstream and rank plausibly but wrongly)
    cents2d.foreach(v => require(v.length == dim,
      s"ivfTopK: corpus vector has ${v.length} elements, expected dim=$dim"))
    // a corpus smaller than `centroids` yields fewer cells than asked for;
    // probing every available cell is the graceful (and exact) degradation,
    // so clamp rather than trip the explicit-codebook path's strict require
    ivfTopK(corpus, queries, idCol, vecCol, k, cents2d,
      math.min(nprobe, cents2d.length), excludeSelf)
  }

  /** IVF against an EXPLICIT centroid matrix — the trained-quantizer path
    * the default overload's scaladoc promises: chain
    * [[Clustering.kmeansStep]]'s `(cluster, dim_idx, centroid)` rows (or any
    * externally trained codebook) in as `cents2d`. The machinery —
    * assignment, inverted cells, probe join, exact re-rank — is the default
    * path's, and full probe (`nprobe = cents2d.length`) remains exact by
    * construction under ANY placement; placement only moves the
    * partial-probe recall/cost curve (exercised in SimilaritySpec). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              cents2d: Array[Array[Double]], nprobe: Int,
              excludeSelf: Boolean): DataFrame = {
    require(cents2d.nonEmpty && nprobe >= 1 && nprobe <= cents2d.length,
      s"ivfTopK: ${cents2d.length} centroids, nprobe=$nprobe")
    val centroids = cents2d.length
    val c = corpus.select(col(idCol).as("neighbor_id"), V.l2normalize(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), V.l2normalize(col(vecCol)).as("qv"))
    // dots against all centroids in one pass (same compiled primitive as LSH)
    def withDots(df: DataFrame, vec: String): DataFrame =
      df.withColumn("_cd", V.planeDots(col(vec), cents2d))
    // corpus: cell = argmax-dot centroid (first max on ties — deterministic)
    val cells = withDots(c, "cv")
      .withColumn("cell", (array_position(col("_cd"), array_max(col("_cd"))) - 1).cast("int"))
      .drop("_cd")
    // queries: nprobe cells with the largest dots (sort (dot, idx) structs
    // descending by dot, idx ascending on ties — fully deterministic)
    val probes = withDots(q, "qv")
      .withColumn("cell",
        explode(slice(
          transform(
            array_sort(
              transform(sequence(lit(0), lit(centroids - 1)), i =>
                struct(element_at(col("_cd"), i + 1).as("d"), i.as("idx"))),
              (l, r) => when(l.getField("d") > r.getField("d"), -1)
                .when(l.getField("d") < r.getField("d"), 1)
                .otherwise(l.getField("idx") - r.getField("idx"))),
            z => z.getField("idx")),
          1, nprobe)))
      .drop("_cd")

    val candidates = cells
      .join(broadcast(probes), Seq("cell"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .select(col("query_id"), col("neighbor_id"), V.dot(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Approximate top-k via multi-table sign-LSH with exact re-ranking.
    * Recall rises with `tables`; candidate cost falls with `planesPerTable`. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, dim: Int,
              planesPerTable: Int = 10, tables: Int = 8, seed: Long = 42L,
              excludeSelf: Boolean = true, probes: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), V.l2normalize(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), V.l2normalize(col(vecCol)).as("qv"))
    // one flat hyperplane matrix for every table; all dots in one pass per row
    val planes2d = (0 until tables).toArray
      .flatMap(t => V.hyperplanes(dim, planesPerTable, seed + t))

    // letBind keeps the dots array a lambda leaf inside the buckets expression —
    // without it CollapseProject inlines the 48-dot tree into all 48 use sites.
    def banded(df: DataFrame, vec: String): DataFrame =
      df.withColumn("_buckets",
          V.letBind(V.planeDots(col(vec), planes2d))(
            dots => V.bucketsFromDots(dots, planesPerTable, tables)))
        .select(df.columns.toIndexedSeq.map(col) :+
          posexplode(col("_buckets")).as(Seq("table", "bucket")): _*)

    // Multi-probe on the QUERY side (Lv et al., VLDB 2007): each query also
    // visits, per table, the `probes` buckets reached by flipping its
    // least-confident sign bits. The expansion lands entirely on the
    // BROADCAST side — x(1+min(probes, planesPerTable)) tiny query rows, the
    // corpus side untouched — so recall rises without re-bucketing or growing
    // the big join input.
    val qSide =
      if (probes <= 0) banded(q, "qv")
      else q
        .withColumn("_tb",
          V.letBind(V.planeDots(col("qv"), planes2d))(dots =>
            V.probeBucketsFromDots(dots, planesPerTable, tables, probes)))
        .select(col("query_id"), col("qv"), explode(col("_tb")).as("tb"))
        .select(col("query_id"), col("qv"),
          col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    // Score BEFORE the multi-table dedup: the cosine is computed per bucket
    // hit inside the (map-side, broadcast-joined) pipeline, so the dedup
    // exchange carries (query_id, neighbor_id, cosine) — 24 B/row — instead
    // of both 256 B vectors per hit as a first(qv)/first(cv) aggregate would
    // (measured 43 MB → the vectors were ~90% of this operator's total
    // shuffle at sf1). Duplicate hits of one pair across tables compute
    // byte-identical cosines (same inputs, same compiled dot), so max() is
    // exact dedup; re-dotting a pair per extra table it collides in trades
    // cheap codegen'd FLOPs for the only exchange that scales with
    // tables × candidates. No vector ever crosses a shuffle in this operator.
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    banded(c, "cv")
      .join(broadcast(qSide), Seq("table", "bucket"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        V.dot(col("qv"), col("cv")).as("cosine"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cosine")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Product-quantization ANN with asymmetric distance computation (Jégou,
    * Douze & Schmid, "Product Quantization for Nearest Neighbor Search",
    * TPAMI 2011) — the MEMORY story for 100 TB ANN: every corpus vector is
    * compressed to `m` sub-codes (one byte each at `ks ≤ 256`), so the scan
    * side touches ~`m` bytes per vector instead of `4·dim` (8 vs 256 here,
    * a 32× scan-volume cut), and scoring is `m` table lookups instead of a
    * `dim`-wide dot product. Codebooks are one deterministic Lloyd step per
    * subspace ([[Clustering.kmeansStep]]'s exact arithmetic — the x02
    * chain), trained for ALL m subspaces in a single aggregation job, and
    * `trainRows > 0` bounds training to a deterministic id-ordered sample
    * (the standard PQ practice — at 100 TB training never full-scans;
    * callers can iterate steps for better placement, the machinery is
    * placement-agnostic). Ranking is by APPROXIMATE inner product
    * `q · x̂ = Σ_j q_j · c_{code_j(x)}` (ADC in its inner-product form; feed
    * l2-normalized vectors for the cosine contract). No re-ranking against
    * original vectors — at PQ's target scale they are not resident; compose
    * with [[ivfTopK]]'s cell pruning for the full IVFADC when the scan
    * itself must shrink too.
    *
    * Determinism: sub-assignment uses the kmeansStep argmax contract
    * (first-max ties), distance-table entries are `round(dot, 9)` decimals —
    * one quantization per (query, subspace, codeword), Q×m×ks sites,
    * corpus-independent — and per-pair scores are exact decimal sums of m
    * entries, so a DuckDB oracle reproduces the ranking bit-for-bit.
    *
    * Scale shape: training is ONE bounded aggregation (optionally over a
    * bounded id-ordered sample); encoding is a narrow
    * map against literal codebooks; queries (with their Q×m×ks tables)
    * broadcast; the only corpus-sized exchange is the per-query top-k
    * window over (query_id, neighbor_id, score) — s01's shape at a fraction
    * of the row width, no vector ever shuffles. */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, k: Int, dim: Int,
             m: Int = 8, ks: Int = 16,
             excludeSelf: Boolean = true, trainRows: Int = 0): DataFrame =
    ivfPqTopK(corpus, queries, idCol, vecCol, k, dim, m, ks,
      centroids = 1, nprobe = 1, excludeSelf = excludeSelf,
      trainRows = trainRows)

  /** IVF + PQ composed (the scan-AND-memory story): a coarse quantizer — the
    * [[ivfTopK]] deterministic id-ordered sample, over RAW vectors here —
    * assigns every corpus vector a cell; each query probes its `nprobe`
    * best cells and ADC-scores ONLY the codes living there. At
    * `nprobe = centroids` every cell is probed, so the output equals plain
    * [[pqTopK]] BIT-FOR-BIT (spec-pinned) — cell pruning is exact-by-
    * construction over the same approximation, exactly like s03 over s01;
    * partial probe trades recall for touching `~nprobe/centroids` of the
    * code table. `centroids = 1` degenerates to plain PQ-ADC (every vector
    * in the one cell — how [[pqTopK]] delegates here). This is the
    * non-residual IVFADC variant: codes come from GLOBAL per-subspace
    * codebooks; Jégou et al. §III's refinement (encode residuals
    * `x − coarse(x)` per cell) drops in by training the codebooks on
    * residuals — the machinery (cells, probes, tables, scan) is unchanged.
    *
    * Scale shape: s03's candidate pruning stacked on s04's 32× scan-volume
    * cut — the cell equi-join broadcasts the (query, cell, tables) side, the
    * corpus side stays in place, and the only corpus-sized exchange remains
    * the per-query top-k window. */
  /** RESIDUAL IVFADC (Jégou, Douze & Schmid, TPAMI 2011 §III — the
    * refinement the non-residual [[ivfPqTopK]] documents): every corpus
    * vector is PQ-encoded as the residual `r = x − coarse(x)` against its
    * cell centroid, with the m codebooks trained ON residuals. On clustered
    * corpora this is most of PQ's quality: the coarse quantizer absorbs the
    * between-cluster variance, so the `ks` codewords per subspace only have
    * to cover the (much smaller) within-cell spread.
    *
    * Scoring keeps the inner-product ADC form, which makes residuals almost
    * free on the query side: `q·x̂ = q·coarse(x) + q·r̂`, so the m distance
    * tables are built from the RAW query subvectors against the residual
    * codebooks — cell-independent, exactly s04's Q×m×ks table budget — and
    * the only per-cell addition is the scalar `q·centroid`, quantized once
    * per (query, probed cell) (Q×nprobe sites, model-bounded). The query is
    * never residualized (that is an artifact of the L2 formulation).
    *
    * Determinism: same exact-decimal contract as [[ivfPqTopK]] — residuals
    * are exact IEEE subtractions of identical doubles in both engines,
    * training sums them as decimals, table entries and the cell scalar are
    * round(·, 9) decimals, and each score is an exact (m+1)-term decimal
    * sum — so even PARTIAL probe is oracle-EXACT. Scale shape is s05's:
    * codes-only scan, broadcast (query, cell, tables) side, the top-k
    * window as the one corpus exchange; training is one bounded
    * aggregation over the residual relation (trainRows bounds it to an
    * id-ordered sample). */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, k: Int, dim: Int,
                        m: Int = 8, ks: Int = 16,
                        centroids: Int = 16, nprobe: Int = 4,
                        excludeSelf: Boolean = true,
                        trainRows: Int = 0): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"ivfPqResidualTopK: dim=$dim not divisible by m=$m")
    require(ks >= 1 && centroids >= 1 && nprobe >= 1 && nprobe <= centroids,
      s"ivfPqResidualTopK: ks=$ks centroids=$centroids nprobe=$nprobe")
    // a bound INSIDE the coarse prefix would make the offset-seed fetch
    // empty and silently fall back to the prefix's all-zero residuals,
    // collapsing every codebook to one codeword — fail fast instead
    require(trainRows <= 0 || trainRows > centroids,
      s"ivfPqResidualTopK: trainRows=$trainRows must exceed " +
        s"centroids=$centroids (the seed offset skips the coarse prefix, " +
        s"whose residuals are identically zero)")
    val ds = dim / m
    // coarse quantizer: the ivfTopK id-ordered sample over raw vectors
    val coarse: Array[Array[Double]] = corpus.orderBy(col(idCol))
      .limit(centroids).select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    coarse.foreach(c => require(c.length == dim,
      s"ivfPqResidualTopK: corpus vector has ${c.length} elements, " +
        s"expected dim=$dim"))
    val nCells = coarse.length
    val nProbeEff = math.min(nprobe, nCells)
    val coarseN2h: Array[Double] = coarse.map(c => c.map(x => x * x).sum / 2)
    val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
    def cellExpr(vec: Column): Column =
      if (nCells == 1) lit(0)
      else {
        val scores = transform(V.planeDots(vec, coarse),
          (d, i) => d - get(lit(coarseN2h), i))
        (array_position(scores, array_max(scores)) - 1).cast("int")
      }
    // residual against the assigned cell: exact IEEE double subtraction
    def residExpr(vec: Column, cell: Column): Column =
      zip_with(vec.cast("array<double>"), element_at(coarseLit, cell + 1),
        (a, b) => a - b)
    val resids = corpus.select(col(idCol).as("_id"),
        cellExpr(col(vecCol)).as("cell"), col(vecCol).as("_v"))
      .withColumn("_rv", residExpr(col("_v"), col("cell")))
    // --- train m residual codebooks in ONE aggregation (the ivfPqTopK
    // one-pass shape). Seeds are the ks lowest-id residuals AFTER the
    // coarse prefix: the coarse centroids are themselves the `centroids`
    // lowest-id vectors, so their own residuals are exactly zero — seeding
    // from them collapses every codebook to one codeword. Offsetting past
    // the prefix is the same deterministic id-order contract (and the
    // oracle's `OFFSET centroids`); if the corpus is no bigger than the
    // prefix, every residual is zero and the prefix seeds are as good as
    // any.
    val trainBase = if (trainRows > 0)
      resids.orderBy(col("_id")).limit(trainRows) else resids
    val offsetSeeds: Array[Array[Double]] = trainBase.orderBy(col("_id"))
      .offset(nCells).limit(ks).select(col("_rv")).collect()
      .map(_.getSeq[Double](0).toArray)
    val seedVecs: Array[Array[Double]] =
      if (offsetSeeds.nonEmpty) offsetSeeds
      else trainBase.orderBy(col("_id")).limit(ks).select(col("_rv"))
        .collect().map(_.getSeq[Double](0).toArray)
    val seeds: Array[Array[Array[Double]]] =
      (0 until m).toArray.map(j => seedVecs.map(_.slice(j * ds, (j + 1) * ds)))
    def assignExpr(sub: Column, cents: Array[Array[Double]]): Column = {
      val cn2h = cents.map(c => c.map(x => x * x).sum / 2)
      val scores = transform(V.planeDots(sub, cents),
        (d, i) => d - get(lit(cn2h), i))
      (array_position(scores, array_max(scores)) - 1).cast("long")
    }
    val trained = trainBase.select(explode(array((0 until m).map { j =>
        val sub = slice(col("_rv"), j * ds + 1, ds)
        struct(lit(j).as("j"), assignExpr(sub, seeds(j)).as("cluster"),
          sub.as("sv"))
      }: _*)).as("s"))
      .select(col("s.j").as("_j"), col("s.cluster").as("cluster"),
        posexplode(col("s.sv")).as(Seq("dim_idx", "v")))
      .groupBy(col("_j"), col("cluster"), col("dim_idx"))
      .agg(round(sum(col("v").cast("decimal(27,10)")).cast("double") /
        count(lit(1)), 6).as("centroid"))
      .collect()
    val codebooks: Array[Array[Array[Double]]] = {
      val byJ = trained.map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).groupBy(_._1)
      (0 until m).toArray.map { j =>
        byJ(j).groupBy(_._2).toArray.sortBy(_._1)
          .map(_._2.sortBy(_._3).map(_._4))
      }
    }
    // encode: nearest residual codeword per subspace (first-max contract)
    def codeExpr(rv: Column, j: Int): Column = {
      val cents = codebooks(j)
      val cn2h = cents.map(c => c.map(x => x * x).sum / 2)
      val scores = transform(V.planeDots(slice(rv, j * ds + 1, ds), cents),
        (d, i) => d - get(lit(cn2h), i))
      (array_position(scores, array_max(scores)) - 1).cast("int")
    }
    val coded = resids.select(col("_id").as("neighbor_id"), col("cell"),
      array((0 until m).map(j => codeExpr(col("_rv"), j)): _*).as("_codes"))
    // query side: nprobe best cells (ivfTopK contract), the per-cell scalar
    // round(q·centroid, 9), and the RAW-subvector ADC tables
    def probeExpr(vec: Column): Column =
      if (nCells == 1) array(lit(0))
      else {
        val dots = transform(V.planeDots(vec, coarse),
          (d, i) => d - get(lit(coarseN2h), i))
        slice(
          transform(
            array_sort(
              transform(sequence(lit(0), lit(nCells - 1)), i =>
                struct(element_at(dots, i + 1).as("d"), i.as("idx"))),
              (l, r) => when(l.getField("d") > r.getField("d"), -1)
                .when(l.getField("d") < r.getField("d"), 1)
                .otherwise(l.getField("idx") - r.getField("idx"))),
            z => z.getField("idx")),
          1, nProbeEff)
      }
    def tableExpr(vec: Column, j: Int): Column =
      transform(V.planeDots(slice(vec, j * ds + 1, ds), codebooks(j)),
        d => round(d, 9).cast("decimal(20,9)"))
    val qcScalar = round(element_at(V.planeDots(col("_qv"), coarse),
      col("cell") + 1), 9).cast("decimal(20,9)")
    val qTables = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        explode(probeExpr(col(vecCol))).as("cell"))
      .select(col("query_id"), col("cell"), qcScalar.as("_qc"),
        array((0 until m).map(j => tableExpr(col("_qv"), j)): _*).as("_dt"))
    val approx = (0 until m).map(j =>
        element_at(element_at(col("_dt"), j + 1),
          element_at(col("_codes"), j + 1) + 1))
      .reduce(_ + _) + col("_qc")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_adot").desc, col("neighbor_id"))
    coded.join(broadcast(qTables), Seq("cell"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id")
              else lit(true))
      .select(col("query_id"), col("neighbor_id"), approx.as("_adot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("_adot").cast("double"), 6).as("approx_dot"), col("rank"))
  }

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, k: Int, dim: Int,
                m: Int = 8, ks: Int = 16,
                centroids: Int = 16, nprobe: Int = 4,
                excludeSelf: Boolean = true, trainRows: Int = 0): DataFrame = {
    require(m >= 1 && dim % m == 0, s"pqTopK: dim=$dim not divisible by m=$m")
    require(ks >= 1, s"pqTopK: ks=$ks")
    require(centroids >= 1 && nprobe >= 1 && nprobe <= centroids,
      s"ivfPqTopK: centroids=$centroids nprobe=$nprobe")
    val ds = dim / m
    // --- coarse quantizer over RAW vectors: the ivfTopK id-ordered sample
    // (clamped like ivfTopK when the corpus is smaller than `centroids`)
    val coarse: Array[Array[Double]] =
      if (centroids == 1) Array.empty
      else corpus.orderBy(col(idCol)).limit(centroids)
        .select(col(vecCol)).collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    coarse.foreach(c => require(c.length == dim,
      s"ivfPqTopK: corpus vector has ${c.length} elements, expected dim=$dim"))
    val nCells = if (centroids == 1) 1 else coarse.length
    val nProbeEff = math.min(nprobe, nCells)
    val coarseN2h: Array[Double] = coarse.map(c => c.map(x => x * x).sum / 2)
    def cellExpr(vec: Column): Column =
      if (nCells == 1) lit(0)
      else {
        val scores = transform(V.planeDots(vec, coarse),
          (d, i) => d - get(lit(coarseN2h), i))
        (array_position(scores, array_max(scores)) - 1).cast("int")
      }
    // query side: the nProbeEff best cells by the same score, idx asc on
    // ties (the ivfTopK probe contract)
    def probeExpr(vec: Column): Column =
      if (nCells == 1) array(lit(0))
      else {
        val dots = transform(V.planeDots(vec, coarse),
          (d, i) => d - get(lit(coarseN2h), i))
        slice(
          transform(
            array_sort(
              transform(sequence(lit(0), lit(nCells - 1)), i =>
                struct(element_at(dots, i + 1).as("d"), i.as("idx"))),
              (l, r) => when(l.getField("d") > r.getField("d"), -1)
                .when(l.getField("d") < r.getField("d"), 1)
                .otherwise(l.getField("idx") - r.getField("idx"))),
            z => z.getField("idx")),
          1, nProbeEff)
      }
    // --- train: ALL m subspace codebooks in ONE aggregation job (bounded
    // output: m × ks × ds doubles). Each training row explodes into its m
    // (subspace, cluster, dim_idx, value) assignments against the per-
    // subspace seed matrices, and one groupBy computes every codeword —
    // exactly [[Clustering.kmeansStep]]'s arithmetic (argmax(a·c − |c|²/2)
    // assignment, first max on ties; count + exact-decimal mean rounded at
    // 6), so the codebooks are BIT-IDENTICAL to m per-subspace kmeansStep
    // jobs while the corpus is read once instead of 2m times (m seed
    // collects + m aggregations). Seeds per subspace are the ks lowest-id
    // subvectors — the slices of the ks lowest-id training vectors, fetched
    // in one TakeOrdered job.
    //
    // `trainRows > 0` bounds training to the `trainRows` lowest-id vectors
    // (the ivfTopK/kmeansStep deterministic id-ordered sample contract) —
    // the standard PQ practice: at 100 TB codebook training samples, never
    // full-scans; encoding/scoring still cover the whole corpus. 0 trains
    // on everything (the exact-oracle configuration).
    val trainBase = if (trainRows > 0)
      corpus.orderBy(col(idCol)).limit(trainRows) else corpus
    val seedVecs: Array[Array[Double]] = trainBase.orderBy(col(idCol)).limit(ks)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    seedVecs.foreach(v => require(v.length == dim,
      s"ivfPqTopK: corpus vector has ${v.length} elements, expected dim=$dim"))
    val seeds: Array[Array[Array[Double]]] =
      (0 until m).toArray.map(j => seedVecs.map(_.slice(j * ds, (j + 1) * ds)))
    def assignExpr(sub: Column, cents: Array[Array[Double]]): Column = {
      val cn2h = cents.map(c => c.map(x => x * x).sum / 2)
      val scores = transform(V.planeDots(sub, cents),
        (d, i) => d - get(lit(cn2h), i))
      (array_position(scores, array_max(scores)) - 1).cast("long")
    }
    val trained = trainBase.select(explode(array((0 until m).map { j =>
        val sub = slice(col(vecCol), j * ds + 1, ds)
        struct(lit(j).as("j"), assignExpr(sub, seeds(j)).as("cluster"),
          sub.as("sv"))
      }: _*)).as("s"))
      .select(col("s.j").as("_j"), col("s.cluster").as("cluster"),
        posexplode(col("s.sv")).as(Seq("dim_idx", "v")))
      .groupBy(col("_j"), col("cluster"), col("dim_idx"))
      .agg(round(sum(col("v").cast("decimal(27,10)")).cast("double") /
        count(lit(1)), 6).as("centroid"))
      .collect()
    // codebook j: trained codewords in cluster-id order (empty clusters —
    // possible under duplicate seeds — simply don't exist in either engine)
    val codebooks: Array[Array[Array[Double]]] = {
      val byJ = trained.map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).groupBy(_._1)
      (0 until m).toArray.map { j =>
        byJ(j).groupBy(_._2).toArray.sortBy(_._1)
          .map(_._2.sortBy(_._3).map(_._4))
      }
    }
    def subCol(vec: Column, j: Int): Column = slice(vec, j * ds + 1, ds)
    // nearest codeword by the kmeansStep contract: argmax(a·c − |c|²/2),
    // first max on ties; the code is the POSITION in the cluster-id-sorted
    // codebook (both engines order codewords identically)
    def codeExpr(vec: Column, j: Int): Column = {
      val cents = codebooks(j)
      val cn2h = cents.map(c => c.map(x => x * x).sum / 2)
      val scores = transform(V.planeDots(subCol(vec, j), cents),
        (d, i) => d - get(lit(cn2h), i))
      (array_position(scores, array_max(scores)) - 1).cast("int")
    }
    // query-side ADC table for subspace j: round(dot, 9) per codeword
    def tableExpr(vec: Column, j: Int): Column =
      transform(V.planeDots(subCol(vec, j), codebooks(j)),
        d => round(d, 9).cast("decimal(20,9)"))
    val coded = corpus.select(col(idCol).as("neighbor_id"),
      cellExpr(col(vecCol)).as("cell"),
      array((0 until m).map(j => codeExpr(col(vecCol), j)): _*).as("_codes"))
    val qTables = queries.select(col(idCol).as("query_id"),
        explode(probeExpr(col(vecCol))).as("cell"),
        array((0 until m).map(j => tableExpr(col(vecCol), j)): _*).as("_dt"))
    // per-pair approximate dot: a fixed m-term decimal addition tree (exact,
    // order-independent — matches the oracle's SUM over m rows)
    val approx = (0 until m).map(j =>
        element_at(element_at(col("_dt"), j + 1),
          element_at(col("_codes"), j + 1) + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_adot").desc, col("neighbor_id"))
    coded.join(broadcast(qTables), Seq("cell"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id")
              else lit(true))
      .select(col("query_id"), col("neighbor_id"), approx.as("_adot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("_adot").cast("double"), 6).as("approx_dot"), col("rank"))
  }
}
