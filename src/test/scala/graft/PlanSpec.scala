package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Plan-shape assertions for the scale-critical properties: filter/projection
  * pushdown, broadcast dimensions, fingerprint-keyed exchanges, and bucketed
  * co-located joins. These are the properties that decide whether a plan
  * survives a 100x scale-up — pinned here so a refactor cannot silently
  * regress them. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("q01: shipdate range filter and projection push into the parquet scan") {
    val p = plan("q01_filter_sort")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // unused wide columns must not reach the scan
    assert(!p.contains("l_tax") && !p.contains("l_suppkey"),
      s"projection not pruned:\n$p")
  }

  test("q04: dimension tables broadcast; no cartesian anywhere") {
    val p = plan("q04_join_multiway")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d01: dedup exchange is keyed by the xxhash64 fingerprint") {
    val p = plan("d01_dedup_exact")
    assert(p.contains("xxhash64"), p)
  }

  test("t10: passage-dedup exchanges are hash-led; chunk text never keys alone") {
    val p = plan("t10_passage_dedup")
    // both the owner aggregation and the join-back partition on
    // xxhash64(chunk) — the 8-byte key leads every chunk exchange
    assert(p.contains("hashpartitioning(xxhash64(chunk"), p)
  }

  test("o06: the might_contain filter sits on the fact scan, before any join") {
    val p = plan("o06_bloom_join")
    val filterAt = p.indexOf("might_contain")
    val joinAt = p.indexOf("HashJoin")
    assert(filterAt >= 0 && joinAt >= 0, p)
    // executedPlan prints operators top-down (join above its children), so
    // the pruning filter must appear BELOW (after) the join header
    assert(filterAt > joinAt, s"bloom filter not under the join:\n$p")
    assert(p.contains("bloom_filter_agg"), p)
  }

  test("x02: k-means assignment is map-only — one exchange total (the mean agg)") {
    val p = plan("x02_kmeans_step")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$p")
    assert(!p.contains("Join"), s"assignment must not join:\n$p")
  }

  test("s01: query side broadcasts — the corpus is never shuffled") {
    val p = plan("s01_ann_bruteforce")
    assert(p.contains("Broadcast"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("s03: IVF probe join broadcasts the query side; no cartesian") {
    val p = plan("s03_ann_ivf")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("o03: range join plans as an equi-join on the bin — no nested loop") {
    val p = plan("o03_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the equi key is the synthesized bin column
    assert(p.contains("graft_range_bin"), p)
  }

  test("c01: eval shingle side broadcasts — the corpus never shuffles to match") {
    val p = plan("c01_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d06: LSH verification is candidates-only — no cartesian/nested-loop, " +
       "vectors attach after the distinct") {
    val p = plan("d06_embedding_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the bucket self-join and pair-distinct run on ids; the vector payload
    // re-attaches by equi-join afterwards, so each distinct pair dots once
    assert(p.contains("HashAggregate"), p) // the pair distinct
    assert("(BroadcastHash|ShuffledHash|SortMerge)Join".r.findAllIn(p).nonEmpty, p)
  }

  test("probed s02: the multi-probe expansion stays on the broadcast query side") {
    // the scale contract of query-side probing — x(1+probes) lands on the
    // tiny broadcast relation; if the planner ever flipped the broadcast to
    // the corpus side (or fell back to sort-merge) the knob would silently
    // turn into a corpus blow-up
    val e = graft.sources.Lake.table(spark, sf0001, "embeddings")
    val q = e.filter(col("vec_id") < 8)
    val p = graft.operators.Similarity.lshTopK(e, q, "vec_id", "embedding",
      k = 5, dim = 64, probes = 3).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("probed d06: probe expansion keeps the candidates-only plan shape") {
    val e = graft.sources.Lake.table(spark, sf0001, "embeddings")
    val p = graft.operators.Dedup.embeddingNearDupPairs(e, "vec_id", "embedding",
      dim = 64, threshold = 0.45, planesPerTable = 0, tables = 24, probes = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p) // the pair distinct survives
  }

  test("o04: overlap counting has no a-x-b pair join and no global-order window") {
    val p = plan("o04_interval_overlap")
    // pair-free: the count comes from rank queries, not a join of a x b. The
    // ONLY join allowed is the broadcast of the <= parts+1-row offsets frame
    // (keyed by graft_rid) that ships the prefix-sum subtotals back.
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair join crept back into the count path:\n$p")
    val bhjKeys = "BroadcastHashJoin \\[([a-zA-Z_]+)".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(bhjKeys.subsetOf(Set("graft_rid")),
      s"broadcast join on a non-offset key (a-x-b pairing?): $bhjKeys\n$p")
    // the prefix-sum window is range-partitioned — a Window with an empty
    // partition spec would serialize the whole corpus into one task
    assert(p.contains("hashpartitioning(graft_rid"), p)
    assert(!p.contains("SinglePartition"), s"global-order window:\n$p")
  }

  test("t13: PPS prefix sum is range-partitioned; offsets arrive by broadcast only") {
    val p = plan("t13_weighted_sample")
    // the distributed prefix sum partitions by the quantile range id; a
    // Window with an empty partition spec would serialize the corpus
    assert(p.contains("hashpartitioning(graft_rid"), p)
    assert(!p.contains("SinglePartition"), s"global-order window:\n$p")
    // the only join allowed is the <= parts-row offsets broadcast
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    val bhjKeys = "BroadcastHashJoin \\[([a-zA-Z_]+)".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(bhjKeys.subsetOf(Set("graft_rid")), s"unexpected join keys: $bhjKeys\n$p")
  }

  test("o07: sweep pairs plan one exchange keyed by (bin, cell); no nested loop") {
    val p = plan("o07_interval_pairs")
    assert(p.contains("hashpartitioning(graft_bin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("m05: frame decode is a narrow map over the scan — no shuffle of payloads") {
    val p = plan("m05_video_frames")
    assert(!p.contains("Exchange"), s"payload crossed an exchange:\n$p")
  }

  test("m06: GIF frame decode is a narrow map over the scan — no shuffle of payloads") {
    val p = plan("m06_gif_frames")
    assert(!p.contains("Exchange"), s"payload crossed an exchange:\n$p")
  }

  test("t14: repetition battery is a narrow map over the scan — no exchange") {
    val p = plan("t14_ngram_repetition")
    assert(!p.contains("Exchange"), s"per-doc stats crossed an exchange:\n$p")
  }

  test("d10: dup detection shuffles the 8-byte gram hash, never the gram text") {
    val p = plan("d10_dup_spans")
    assert(p.contains("hashpartitioning(gh"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // no exchange is keyed by the gram string — only gh/doc_id key shuffles
    val keys = "hashpartitioning\\([a-zA-Z_]+".r.findAllIn(p).toSet
    assert(keys.subsetOf(Set("hashpartitioning(gh", "hashpartitioning(doc_id")), keys.toString)
  }

  test("t07: both stratum windows share ONE exchange (rank + count, same partitioning)") {
    val p = plan("t07_stratified_sample")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("t09: sequence packing is one window pass over one exchange") {
    val p = plan("t09_sequence_pack")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("bucketed co-located join: same-key bucketed tables join with no Exchange") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_custkey", "c_mktsegment")
    // drop catalog entries AND stale warehouse dirs from previous JVMs (the
    // in-memory catalog is fresh per session, the filesystem location is not)
    Seq("b_orders", "b_customer").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_custkey"), 8)
    Bucketing.writeBucketed(customer, "b_customer", Seq("c_custkey"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the join to resolve as sort-merge so the assertion is about
      // bucketing, not about one side being broadcast-small
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      // and it computes the right thing
      val expected = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(j.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned layout: a partition-column filter prunes directories at plan time") {
    val base = graft.util.Scratch.dir("graft-prune").toString
    graft.sources.Lake.table(spark, sf0001, "documents")
      .write.partitionBy("source").parquet(s"$base/docs")
    val pruned = spark.read.parquet(s"$base/docs").where(col("source") === "src3")
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("src3"), p)
    // the scan's selected partition count is 1 (visible in the FileSourceScan)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scan.toString.contains("PartitionFilters: [isnotnull(source"), scan.toString)
  }

  test("d09: corpus side never sort-merge joins — candidates and eval broadcast") {
    val p = plan("d09_cross_decontam")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("d11: pair join keys on cluster; at scale the vectors shuffle ONCE (reused)") {
    // toy scale: AQE broadcasts the small pair side — fine, but no exchange
    // to reuse; just pin the join key and no-cartesian
    val p = plan("d11_semdedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join [cluster"), s"pair join must key on cluster:\n$p")
    // scale regime (broadcast off): both self-join sides must read the SAME
    // cluster-keyed exchange — the quantized vectors cross the fabric once
    // (AQE decides exchange reuse at runtime; disable it to see the static
    // ReuseExchange rule — the property itself holds in both modes)
    val conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val ps = plan("d11_semdedup")
      assert(ps.contains("ReusedExchange"), s"vector exchange must be reused:\n$ps")
      val real = ps.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning(cluster") && !l.contains("ReusedExchange"))
      assert(real == 1, s"expected exactly one real cluster-keyed exchange:\n$ps")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", conf)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("t15: LM model join stays off the text — only tokens/ids cross exchanges") {
    val p = plan("t15_lm_perplexity")
    assert(!p.contains("CartesianProduct"), p)
    // the vocab scalar arrives by broadcast (one row), never via a shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // no exchange is keyed by the raw document text
    assert(!p.contains("hashpartitioning(text"), s"text must never key an exchange:\n$p")
  }
}
