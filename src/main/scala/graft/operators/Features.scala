package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Numeric feature engineering over grouped data — the scaling pass between a
  * curated corpus and model-ready features.
  *
  * Scale design: per-group statistics are a tiny aggregate (one row per group)
  * joined BACK to the fact table with a broadcast hash join, so the fact side
  * never shuffles — two scans, zero fact-side Exchange. The window-function
  * formulation computes the same thing in one scan but hash-shuffles every
  * fact row by group and holds whole groups per task; at 100 TB with skewed
  * groups that is strictly worse. All arithmetic is single IEEE double ops on
  * exactly-aggregated inputs, so results reproduce bit-for-bit on any engine.
  */
object Features {

  /** Append `<valueCol>_norm` = (x - min) / (max - min) within each group
    * (0 when the group is constant). min/max are order-independent exact
    * aggregates, and the normalization is two IEEE ops — deterministic under
    * any partitioning. */
  def minMaxNormalize(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    // null-SAFE join key: groupBy puts null-keyed rows in their own group, and
    // a plain equi-join would silently drop them (null = null is never true) —
    // a row-count loss the window formulation of the same stats doesn't have
    val stats = df.groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("graft_mn"), max(col(valueCol)).as("graft_mx"))
      .withColumnRenamed(groupCol, "graft_g")
    df.join(broadcast(stats), col(groupCol) <=> col("graft_g"))
      .withColumn(s"${valueCol}_norm",
        when(col("graft_mx") === col("graft_mn"), lit(0.0))
          .otherwise((col(valueCol) - col("graft_mn")) /
            (col("graft_mx") - col("graft_mn"))))
      .drop("graft_g", "graft_mn", "graft_mx")
  }

  /** Per-group z-score outlier detection: flag rows whose value sits more than
    * `zThreshold` standard deviations from their group's mean (population
    * stddev — the profiling convention).
    *
    * Determinism across engines is the design constraint: a naive
    * `avg`/`stddev` over doubles varies in the last ulp with accumulation
    * order, so the moments are computed as EXACT decimal sums (sum and sum of
    * squares — decimal(18,2) inputs, so decimal(38,4) squares stay exact),
    * cast to double once, and the mean/variance/z arithmetic is then a fixed
    * tree of IEEE ops on those exact inputs — bit-identical on Spark, DuckDB,
    * or anything else that follows IEEE 754. Same broadcast-stats shape as
    * [[minMaxNormalize]]: the fact side never shuffles. */
  def zScoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     zThreshold: Double): DataFrame = {
    require(zThreshold > 0, s"zThreshold must be positive: $zThreshold")
    val d = col(valueCol).cast("decimal(18,2)")
    val stats = df.groupBy(col(groupCol))
      .agg(count(col(valueCol)).as("graft_n"),
        count(d).as("graft_nd"),
        sum(d).cast("double").as("graft_s1"),
        sum(d * d).cast("double").as("graft_s2"))
      // non-ANSI Spark turns decimal overflow into NULL at two layers: a
      // value too wide for the cast NULLs out (count(d) < count(value) — the
      // row silently leaves the moments), and a too-large SUM NULLs whole
      // s1/s2 (the group silently declares itself outlier-free). Fail loud on
      // both (assert_true rides inside the mean expression so the optimizer
      // cannot prune it away).
      .withColumn("graft_mean",
        when(assert_true(col("graft_n") === col("graft_nd") &&
            (col("graft_n") === 0 ||
              (col("graft_s1").isNotNull && col("graft_s2").isNotNull)),
          lit(s"zScoreOutliers($valueCol): decimal overflow in group moments")).isNull,
          col("graft_s1") / col("graft_n")))
      .withColumn("graft_var",
        col("graft_s2") / col("graft_n") - col("graft_mean") * col("graft_mean"))
      .withColumnRenamed(groupCol, "graft_g")
    df.join(broadcast(stats), col(groupCol) <=> col("graft_g"))
      .where(col("graft_var") > 0.0 &&
        abs(col(valueCol) - col("graft_mean")) > lit(zThreshold) * sqrt(col("graft_var")))
      .withColumn("z", round((col(valueCol) - col("graft_mean")) / sqrt(col("graft_var")), 4))
      .drop("graft_g", "graft_n", "graft_nd", "graft_s1", "graft_s2",
        "graft_mean", "graft_var")
  }

  /** Top-`k` terms per group by a tf-idf-style score. `tf` is the term's
    * occurrence count in the group, `df` the number of distinct documents
    * containing it, and the score is `tf * N / df` — tf-weighted rarity, the
    * idf without log damping. The log is dropped deliberately: the score stays
    * a pure integer ratio (two IEEE ops) that reproduces bit-for-bit in ANSI
    * SQL, where `log`'s last ulp varies across libm implementations.
    *
    * Plan: one explode of the corpus feeds two partial-aggregated rollups
    * (tf by (group, term); df by term) that meet in a term-keyed shuffle
    * join; the per-group top-k is a window over group partitions (bounded:
    * one row per distinct (group, term)). The corpus text itself is never
    * shuffled — only (term, counts) pairs. */
  def tfidfTopTerms(df: DataFrame, groupCol: String, idCol: String,
                    textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val toks = df.select(col(groupCol), col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .where(col("term") =!= "")
    val tf = toks.groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(col(idCol), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("graft_n"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf").cast("double") * col("graft_n").cast("double")) /
          col("df").cast("double"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(groupCol), col("term"), col("tf"), col("df"),
        col("score"), col("rank").cast("long").as("rank"))
  }
}
