package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table reconciliation — "did the copy land intact?" An ingestion service
  * that republishes datasets every run (the reference re-extracts full result
  * sets per schedule) needs to answer this without eyeballing row counts; the
  * CTL manifest's SHA-256 covers one file, not a distributed table.
  *
  * Content is compared by an md5 row hash over caller-canonicalized columns
  * (cast doubles to DECIMAL first — engine-native double formatting is not
  * portable, decimal strings are).
  *
  * Scale design: [[diff]] is one sort-merge full-outer join on the key — the
  * inherent cost of a row-level answer, shuffling only (key, hash). For the
  * 100 TB fast path use [[bucketChecksums]] first: an order-independent
  * per-bucket checksum (sum of row hashes mod 2^62, grouped by key-hash
  * bucket) costs one partial-aggregated scan per side and compares N tiny
  * rows; recurse with [[diff]] restricted to the differing buckets only.
  */
object Reconcile {

  /** md5-derived 60-bit row hash of the given columns
    * ([[graft.functions.HashExpressions.md5Hash60]] over a pipe-join). Nulls
    * are encoded OUT of band: every field carries a null-flag prefix
    * (`0` for null, `1` + value otherwise), so no storable value can ever
    * collide with the null encoding — unlike any in-band sentinel — and the
    * scheme reproduces in plain ANSI SQL
    * (`CASE WHEN c IS NULL THEN '0' ELSE '1' || CAST(c AS VARCHAR) END`).
    * Remaining caveat (pre-existing): a value containing the `|` separator
    * can shift field boundaries; canonicalize such columns first. */
  def rowHash(cols: Seq[Column]): Column =
    graft.functions.HashExpressions.md5Hash60(concat_ws("|",
      cols.map(c => concat(when(c.isNull, lit("0")).otherwise(lit("1")),
        coalesce(c.cast("string"), lit("")))): _*))

  /** Row-level diff of `a` vs `b` on `keyCols`, comparing `compareCols`
    * content: one row per differing key with status `missing_in_b` /
    * `missing_in_a` / `mismatch`. Matching rows produce nothing, so output
    * size tracks the damage, not the table. `keyCols` must uniquely identify
    * rows on BOTH sides — duplicate keys multiply through the outer join and
    * the per-pair statuses stop meaning anything; check via the `n_rows` of
    * [[bucketChecksums]] (or a count-distinct probe) first when in doubt. */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty, "need key and compare columns")
    val ha = a.select(keyCols.map(col) :+ rowHash(compareCols.map(col)).as("graft_ha"): _*)
    val hb = b.select(keyCols.map(col) :+ rowHash(compareCols.map(col)).as("graft_hb"): _*)
    ha.join(hb, keyCols, "full_outer")
      .withColumn("status",
        when(col("graft_hb").isNull, lit("missing_in_b"))
          .when(col("graft_ha").isNull, lit("missing_in_a"))
          .when(col("graft_ha") =!= col("graft_hb"), lit("mismatch")))
      .where(col("status").isNotNull)
      .select(keyCols.map(col) :+ col("status"): _*)
  }

  /** Order-independent checksum per key-hash bucket: `sum(row_hash) mod 2^62`
    * over `buckets` buckets. Comparing two sides' checksums localizes damage
    * to buckets at the cost of one scan each — no join, no row transfer. */
  def bucketChecksums(df: DataFrame, keyCols: Seq[String],
                      compareCols: Seq[String], buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    df.select(
        pmod(rowHash(keyCols.map(col)), lit(buckets.toLong)).as("bucket"),
        rowHash((keyCols ++ compareCols).map(col)).as("graft_h"))
      .groupBy(col("bucket"))
      .agg(
        // sum in DECIMAL(38,0): a 64-bit sum would wrap silently at scale,
        // and the oracle's arbitrary-precision sum would then diverge
        pmod(sum(col("graft_h").cast("decimal(38,0)")), lit(1L << 62))
          .cast("long").as("checksum"),
        count(lit(1)).as("n_rows"))
  }
}
