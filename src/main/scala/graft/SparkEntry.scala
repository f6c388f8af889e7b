package graft

import graft.config.{DatasetConfig, SourceConfig, TransformConfig}
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.functions.{TextFunctions => T}
import graft.sources.Lake
import graft.transforms.Transforms
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per operator from SURVEY.md §2 (+ the
  * training-data extension operators), with a DuckDB-equivalent `oracleSql` for
  * every SQL-expressible one.
  *
  * Determinism across engines: aggregates over `double` columns are computed by
  * casting inputs to `DECIMAL(18,2)` (the money/quantity scale of the data),
  * summing exactly, and casting the final value to `double` — identical bits in
  * Spark and DuckDB regardless of accumulation order. Integer-ish outputs are cast
  * to BIGINT on both sides (Spark's `length`/`size`/`year` return INT, DuckDB's
  * return BIGINT).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Lake.table(s, dir, name)

  /** exact decimal cast for money/quantity doubles */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  /** order-independent exact sum of a double column, returned as double */
  private def sumd(c: Column): Column = sum(dec(c)).cast("double")
  private def bi(c: Column): Column = c.cast("long")

  /** Flagship query on sf=0.001 (driver smoke-checks rows>0): the multiway
    * star join with broadcast dimensions. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_join_multiway")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- reference query surface (SURVEY §2.2-§2.6: SQL-passthrough re-homed
    //      onto Catalyst + the two real ENGINE transform steps) ----

    // GetDailyTrades shape (reference GetDailyTrades.sql:4-16): projection +
    // range predicate + sort. Predicate and projection push into the scan.
    "q01_filter_sort" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), bi(col("l_linenumber")).as("l_linenumber"),
          col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_shipdate"))
        .filter(col("l_shipdate").between("1996-01-01", "1996-12-31"))
        .orderBy(col("l_shipdate").desc, col("l_orderkey"), col("l_linenumber"))),

    // TPC-H Q1 shape: grouped exact aggregation.
    "q02_agg_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumd(col("l_quantity")).as("sum_qty"),
          sumd(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    // join + aggregate by segment.
    "q03_join_agg" -> ((s, dir) => {
      val orders = t(s, dir, "orders"); val cust = t(s, dir, "customer")
      orders.join(cust, orders("o_custkey") === cust("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), sumd(col("o_totalprice")).as("revenue"))
    }),

    // multiway star join; dims broadcast explicitly (they are tiny at any SF —
    // region/nation are bounded, customer fits the 10MB-1GB broadcast budget
    // far past sf1000 only if bucketed; so customer joins hash, dims broadcast).
    "q04_join_multiway" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lineitems"))
    }),

    // window function: top-3 orders per customer (rank with deterministic ties).
    "q05_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), bi(col("rn")).as("rn"))
    }),

    "q06_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()),

    // set operations: INTERSECT / EXCEPT combined with a tag.
    "q07_setops" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(bi(col("c_nationkey")).as("nk"))
      val supp = t(s, dir, "supplier").select(bi(col("s_nationkey")).as("nk"))
      cust.intersect(supp).select(lit("both").as("tag"), col("nk"))
        .union(cust.except(supp).select(lit("cust_only").as("tag"), col("nk")))
    }),

    // semi/anti joins: per-nation customer counts with/without orders.
    "q08_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation"); val o = t(s, dir, "orders")
      val cn = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
      val tot = cn.groupBy("n_name").agg(count(lit(1)).as("n_customers"))
      val withO = cn.join(o, cn("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy("n_name").agg(count(lit(1)).as("with_orders"))
      val withoutO = cn.join(o, cn("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("n_name").agg(count(lit(1)).as("without_orders"))
      tot.join(withO, Seq("n_name"), "left").join(withoutO, Seq("n_name"), "left")
        .select(col("n_name"), col("n_customers"),
          coalesce(col("with_orders"), lit(0L)).as("with_orders"),
          coalesce(col("without_orders"), lit(0L)).as("without_orders"))
    }),

    // scalar function surface: string/math built-ins (all codegen'd).
    "q09_scalar_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        bi(length(col("p_name"))).as("name_len"),
        substring(col("p_type"), 1, 3).as("type_prefix"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        bi(col("p_size") % 5).as("size_mod"),
        bi(abs(col("p_size") - 25)).as("size_dist"),
        floor(col("p_retailprice")).cast("long").as("price_floor"))),

    // the ENGINE's real transform steps (DataCleansingStep.cs:24-63) run as a
    // config-driven chain — trim all strings + empty→null.
    "q10_cleansing" -> ((s, dir) => {
      val steps = Seq(TransformConfig("DataCleansing", config =
        Map("trimWhitespace" -> true, "removeEmptyStrings" -> true), order = 1))
      Transforms.applyAll(t(s, dir, "customer"), steps)
        .select(col("c_custkey"), col("c_name"), bi(col("c_nationkey")).as("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
    }),

    // README-documented extension steps: DateFormat + partial DataMasking.
    "q11_format_mask" -> ((s, dir) => {
      val steps = Seq(
        TransformConfig("DateFormat", order = 1,
          config = Map("columns" -> List("o_orderdate"), "format" -> "yyyy-MM-dd")),
        TransformConfig("DataMasking", order = 2,
          config = Map("columns" -> List("o_orderpriority"), "maskType" -> "partial",
            "keepLast" -> "4")))
      Transforms.applyAll(t(s, dir, "orders"), steps)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    }),

    "q12_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // grouped HAVING.
    "q13_having" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sumd(col("o_totalprice")).as("total_spent"))
        .filter(col("n_orders") >= 12)),

    // conditional aggregation (TPC-H Q14 shape), single-row result.
    "q14_conditional_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val p = t(s, dir, "part")
      val rev = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
      li.join(p, li("l_partkey") === p("p_partkey"))
        .agg(
          sum(when(col("p_type").like("PROMO%"), rev).otherwise(lit(0).cast("decimal(18,2)")))
            .cast("double").as("promo_revenue"),
          sum(rev).cast("double").as("total_revenue"),
          count(lit(1)).as("n_items"))
    }),

    // ROLLUP hierarchy totals.
    "q15_rollup" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), sumd(col("c_acctbal")).as("acctbal_sum"))
    }),

    // event-time batch analytics: day bucketing + per-type rollup.
    "q16_events_daily" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sumd(col("value")).as("value_sum"),
          bi(countDistinct(col("user_id"))).as("n_users"))),

    // semi-structured: JSON property extraction from the events props column.
    "q17_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))),

    // scalar subquery (uncorrelated) — kept exact with the sum*count trick.
    "q18_subquery" -> ((s, dir) => {
      Lake.registerAll(s, dir)
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders
              |WHERE o_totalprice * (SELECT count(*) FROM orders)
              |      > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              |         FROM orders)""".stripMargin)
    }),

    // correlated scalar subqueries (Catalyst decorrelates into aggregating joins).
    "q19_corr_subquery" -> ((s, dir) => {
      Lake.registerAll(s, dir)
      s.sql("""SELECT c_custkey, c_acctbal FROM customer c
              |WHERE c_acctbal * (SELECT count(*) FROM customer c2
              |                   WHERE c2.c_nationkey = c.c_nationkey)
              |      > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
              |         FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin)
    }),

    // the reference's canonical pipeline (SURVEY §7.2): parameterized raw-SQL
    // extraction (spark.sql named-parameter API = the reference's @named binding)
    // + DataCleansing + DataValidation chain.
    "q20_pipeline_trades" -> ((s, dir) => {
      Lake.registerAll(s, dir)
      val cfg = DatasetConfig(
        datasetId = "trades-daily-query",
        source = SourceConfig(`type` = "Parquet", extractionType = "Query",
          sqlText = """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
                      |  l_extendedprice, l_returnflag, l_shipdate FROM lineitem
                      |WHERE l_shipdate BETWEEN :StartDate AND :EndDate""".stripMargin,
          parameters = Map("StartDate" -> "1996-01-01", "EndDate" -> "1996-12-31")),
        transformations = Seq(
          TransformConfig("DataCleansing", order = 1,
            config = Map("trimWhitespace" -> true)),
          TransformConfig("DataValidation", order = 2,
            config = Map("requiredColumns" -> List("l_orderkey", "l_shipdate")))))
      val extracted = s.sql(cfg.source.sqlText, cfg.source.parameters)
      Transforms.applyAll(extracted, cfg.transformations)
        .withColumn("l_linenumber", bi(col("l_linenumber")))
    }),

    // full outer join of per-nation aggregates.
    "q21_outer_join" -> ((s, dir) => {
      val cA = t(s, dir, "customer").groupBy(bi(col("c_nationkey")).as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val sA = t(s, dir, "supplier").groupBy(bi(col("s_nationkey")).as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      cA.join(sA, Seq("nk"), "full_outer")
        .select(col("nk"), coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }),

    // CUBE over two dimensions.
    "q22_cube" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("revenue"))
    }),

    // GROUPING SETS via the SQL surface.
    "q23_grouping_sets" -> ((s, dir) => {
      Lake.registerAll(s, dir)
      s.sql("""SELECT r_name, n_name, count(*) AS n_customers
              |FROM customer
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY GROUPING SETS ((r_name), (n_name), ())""".stripMargin)
    }),

    // IN + NOT EXISTS subqueries (decorrelated into semi/anti joins).
    "q24_in_exists" -> ((s, dir) => {
      Lake.registerAll(s, dir)
      s.sql("""SELECT c_custkey FROM customer
              |WHERE c_custkey IN (SELECT o_custkey FROM orders
              |                    WHERE o_totalprice > 450000)
              |  AND NOT EXISTS (SELECT 1 FROM orders o2
              |                  WHERE o2.o_custkey = c_custkey
              |                    AND o2.o_orderstatus = 'F')""".stripMargin)
    }),

    // date/time function surface.
    "q25_date_funcs" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        bi(year(col("o_orderdate"))).as("yr"),
        bi(month(col("o_orderdate"))).as("mo"),
        bi(quarter(col("o_orderdate"))).as("qtr"),
        bi(dayofmonth(col("o_orderdate"))).as("dom"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        bi(datediff(to_date(col("o_orderdate")), lit("1995-01-01"))).as("days_since"),
        last_day(col("o_orderdate")).as("month_end"))),

    // string function surface.
    "q26_string_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        regexp_replace(col("p_type"), "A", "@").as("type_sub"),
        reverse(col("p_brand")).as("brand_rev"),
        split(col("p_brand"), "#").getItem(1).as("brand_num"),
        col("p_name").like("%5%").as("has_five"),
        bi(instr(col("p_name"), "a")).as("first_a"))),

    // generator/UNNEST: explode document words into a term-frequency table.
    "q27_explode_words" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))),

    // CASE bucketing.
    "q28_case_buckets" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 200000, "medium")
          .otherwise("large").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))),

    // window-function suite: rank/dense_rank/lag + running decimal sum.
    "q29_window_suite" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          bi(rank().over(w)).as("rnk"),
          bi(dense_rank().over(w)).as("drnk"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          sum(dec(col("o_totalprice"))).over(wRun).cast("double").as("running_spend"))
    }),

    // exact percentiles (linear interpolation — same definition as DuckDB's
    // quantile_cont, so values hash-match bit-for-bit).
    // exact percentile so the oracle compares bit-for-bit; exact per-group
    // percentile buffers each group's values, so at 100 TB with huge groups
    // the production swap is approx_percentile (t-digest, bounded state) —
    // same call shape, no plan change.
    "q34_percentiles" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          percentile(col("o_totalprice"), lit(0.5)).as("median_price"),
          percentile(col("o_totalprice"), lit(0.9)).as("p90_price"),
          count(lit(1)).as("n"))),

    // the documented 100 TB swap for q34, landed as a checked entry: bounded-
    // state approx_percentile (GK sketch, O(accuracy·log n) per group) with a
    // DRIVER-CHECKED guarantee. The sketch's hard promise is rank-space — the
    // returned value's rank interval [count(<v), count(<=v)] must intersect
    // the target rank ± n/accuracy — so the entry emits that bound check per
    // group (deterministically true, stated literally by the oracle), and
    // ApproxQuantileSpec pins value-space closeness against exact quantiles.
    "q43_approx_percentile" -> ((s, dir) => {
      val acc = 100
      val slack = lit(1.0) / acc * col("n") + lit(2.0)
      val o = t(s, dir, "orders").select(col("o_orderpriority"), col("o_totalprice"))
      val sk = o.groupBy(col("o_orderpriority")).agg(
        approx_percentile(col("o_totalprice"), lit(0.5), lit(acc)).as("p50"),
        approx_percentile(col("o_totalprice"), lit(0.9), lit(acc)).as("p90"),
        count(lit(1)).as("n"))
      o.join(broadcast(sk), "o_orderpriority")
        .groupBy(col("o_orderpriority"), col("n"))
        .agg(
          sum(when(col("o_totalprice") <= col("p50"), 1L).otherwise(0L)).as("rle50"),
          sum(when(col("o_totalprice") < col("p50"), 1L).otherwise(0L)).as("rlt50"),
          sum(when(col("o_totalprice") <= col("p90"), 1L).otherwise(0L)).as("rle90"),
          sum(when(col("o_totalprice") < col("p90"), 1L).otherwise(0L)).as("rlt90"))
        .select(col("o_orderpriority"), bi(col("n")).as("n"),
          (col("rle50") >= col("n") * 0.5 - slack &&
            col("rlt50") <= col("n") * 0.5 + slack).cast("int").as("p50_in_bound"),
          (col("rle90") >= col("n") * 0.9 - slack &&
            col("rlt90") <= col("n") * 0.9 + slack).cast("int").as("p90_in_bound"))
    }),

    // t11's adaptive per-language length cutoffs on the same bounded-state
    // sketch (the exact percent_rank pass buffers whole languages; the sketch
    // doesn't) — same driver-checked rank-bound shape as q43.
    "t12_approx_cutoffs" -> ((s, dir) => {
      val acc = 1000
      val slack = lit(1.0) / acc * col("n") + lit(2.0)
      val nWords = bi(length(col("text"))) -
        bi(length(regexp_replace(col("text"), " ", ""))) + lit(1L)
      val d = t(s, dir, "documents")
        .where(col("text").isNotNull && col("lang").isNotNull)
        .select(col("lang"), nWords.as("n_words"))
      val sk = d.groupBy(col("lang")).agg(
        approx_percentile(col("n_words"), lit(0.05), lit(acc)).as("lo"),
        approx_percentile(col("n_words"), lit(0.95), lit(acc)).as("hi"),
        count(lit(1)).as("n"))
      d.join(broadcast(sk), "lang")
        .groupBy(col("lang"), col("n"))
        .agg(
          sum(when(col("n_words") <= col("lo"), 1L).otherwise(0L)).as("rle_lo"),
          sum(when(col("n_words") < col("lo"), 1L).otherwise(0L)).as("rlt_lo"),
          sum(when(col("n_words") <= col("hi"), 1L).otherwise(0L)).as("rle_hi"),
          sum(when(col("n_words") < col("hi"), 1L).otherwise(0L)).as("rlt_hi"))
        .select(col("lang"), bi(col("n")).as("n"),
          (col("rle_lo") >= col("n") * 0.05 - slack &&
            col("rlt_lo") <= col("n") * 0.05 + slack).cast("int").as("lo_in_bound"),
          (col("rle_hi") >= col("n") * 0.95 - slack &&
            col("rlt_hi") <= col("n") * 0.95 + slack).cast("int").as("hi_in_bound"))
    }),

    // gaps-and-islands: per-user consecutive-activity-day streaks via the
    // classic day − dense_rank grouping key — the window composition every
    // retention/engagement pipeline ends up writing. Days are epoch-day ints
    // so the arithmetic is engine-neutral; the distinct, the window, and the
    // final aggregate all key on user_id-led keys.
    "q44_gaps_islands" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      t(s, dir, "events")
        .select(col("user_id"), expr("unix_date(CAST(ts AS DATE))").as("day"))
        .distinct()
        .withColumn("grp", col("day") - dense_rank().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(min(col("day")).as("streak_start_day"),
          bi(count(lit(1))).as("n_days"))
        .select(col("user_id"), col("streak_start_day"), col("n_days"))
    }),

    // sketch-backed distinct count (HLL++, fixed state, partial-aggregable —
    // the 100 TB swap for exact countDistinct's expand + wide shuffle) with a
    // DRIVER-CHECKED error bound: |approx − exact| within 4x the configured
    // relative standard deviation (deterministic for fixed data — HLL is
    // hash-based, not randomized), stated literally by the oracle like q43.
    "q45_approx_distinct" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact"),
          approx_count_distinct(col("user_id"), rsd = 0.02).as("approx"))
        .select(col("event_type"), bi(col("exact")).as("n_users"),
          (abs(col("approx") - col("exact")) <=
            greatest(col("exact") * 0.08, lit(8.0))).cast("int").as("in_bound"))),

    // PIVOT: market segments to columns, explicit value list (required at scale
    // — implicit pivot runs a distinct-collect on the driver first).
    "q35_pivot" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      val pivoted = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("o_orderpriority"))
        .pivot("c_mktsegment", segs)
        .agg(count(lit(1)))
      // empty cells are null from pivot-agg; the reference SQL idiom yields 0
      pivoted.select(col("o_orderpriority") +:
        segs.map(g => coalesce(col(g), lit(0L)).as(g)): _*)
    }),

    // UNPIVOT/melt: wide numeric attributes to (attr, val) rows.
    "q36_unpivot" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
          "attr", "val")),

    // ColumnMapping rename step through the config-driven chain (the
    // README-documented extension step, README.md:1693-1749).
    "q32_column_mapping" -> ((s, dir) => {
      val steps = Seq(TransformConfig("ColumnMapping", order = 1,
        config = Map("mappings" -> Map(
          "s_suppkey" -> "supplier_id", "s_name" -> "supplier_name",
          "s_acctbal" -> "balance"))))
      Transforms.applyAll(t(s, dir, "supplier"), steps)
        .select(col("supplier_id"), col("supplier_name"), col("balance"),
          bi(col("s_nationkey")).as("nation_id"))
    }),

    // null-sentinel compat mode (ParquetWriterService.cs:183-262 semantics,
    // SURVEY §7.4(1)): manufactured nulls (customers without orders) coerce to
    // the reference's numeric-zero sentinels.
    "q33_null_sentinels" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val agg = o.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sumd(col("o_totalprice")).as("total_spent"))
      val joined = c.select(col("c_custkey"))
        .join(agg, c("c_custkey") === agg("o_custkey"), "left")
        .select(col("c_custkey"), col("n_orders"), col("total_spent"))
      Transforms.applyAll(joined, Seq(TransformConfig("NullSentinels", order = 1)))
    }),

    // ---- JDBC extraction (SURVEY §2.1: the reference's actual job) ----

    // text-query extraction over a live RDBMS (embedded Derby stand-in): lake
    // customer rows round-trip through Spark's JDBC writer into Derby, then
    // extract back through the JDBC relation with a bound parameter — the
    // reference's raw-SQL path (SqlServerDataSource.cs:47-59). The oracle runs
    // the equivalent SELECT against the original parquet, closing the loop.
    "q30_jdbc_extract" -> ((s, dir) => {
      val url = graft.sources.JdbcHarness.ensureCustomer(s, dir)
      graft.sources.Jdbc.readQuery(s, url,
        """SELECT "c_custkey", "c_name", "c_acctbal" FROM customer
          |WHERE "c_acctbal" >= :MinBal""".stripMargin,
        Map("MinBal" -> 1000L))
    }),

    // stored-procedure extraction: CallableStatement against a Derby procedure
    // with an IN parameter and a dynamic result set — the reference's
    // StoredProcedure path (SqlServerDataSource.cs:20-73; Oracle REF CURSOR
    // flavor shares the reader with refCursorType set, OracleDataSource.cs:85-108).
    "q31_jdbc_proc" -> ((s, dir) => {
      val url = graft.sources.JdbcHarness.ensureCustomer(s, dir)
      graft.sources.Jdbc.readCallable(s, url, "TOP_CUSTOMERS", Map("minBal" -> 1000.0))
    }),

    // range-partitioned JDBC extraction: 4 concurrent range scans over the key
    // column — the shape that makes a 100 TB extract use the whole cluster
    // instead of one connection. Same rows as a single-stream read; JdbcSpec
    // asserts the 4-partition split.
    "q37_jdbc_partitioned" -> ((s, dir) => {
      val url = graft.sources.JdbcHarness.ensureCustomer(s, dir)
      val bounds = t(s, dir, "customer")
        .agg(min(col("c_custkey")), max(col("c_custkey"))).head()
      graft.sources.Jdbc.readTablePartitioned(s, url, "customer",
        "\"c_custkey\"", bounds.getAs[Number](0).longValue,
        bounds.getAs[Number](1).longValue, numPartitions = 4)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }),

    // ---- Structured Streaming surface (SURVEY §2.7 extension) ----

    // watermarked tumbling-window aggregation through the PRODUCTION streaming
    // path: Append mode to a parquet sink (bounded state, no driver
    // materialization). Emits exactly the watermark-closed windows — the batch
    // equivalent is GROUP BY hour restricted to windows whose end is at or
    // before max(ts) - 2h (the final watermark). The Complete+memory variant
    // stays in StreamingSpec as the equivalence harness only.
    "st01_stream_hourly" -> ((s, dir) => {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val out = graft.util.Scratch.dir(s"graft-st01-$run")
      graft.streaming.EventsStream.runAvailableNowToFiles(s, dir,
        graft.streaming.EventsStream.hourlyByType,
        s"$out/data", s"$out/ckpt")
    }),

    // hopping-window streaming aggregation (q40's stream twin): 1-hour
    // windows every 30 minutes through the production Append file sink —
    // only watermark-finalized windows emit (window end <= max(ts) - 2h).
    "st09_stream_hopping" -> ((s, dir) => {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val out = graft.util.Scratch.dir(s"graft-st09-$run")
      graft.streaming.EventsStream.runAvailableNowToFiles(s, dir,
        graft.streaming.EventsStream.hoppingByType,
        s"$out/data", s"$out/ckpt")
    }),

    // windowed drift monitor (v02's streaming form): per closed 1-hour
    // window, PSI of the window's event-type mix against the full-corpus
    // histogram. The reference is a K-row bounded driver seam compiled to
    // literals; per-window state is exactly K+2 longs in ONE stateful agg.
    "st10_stream_drift" -> ((s, dir) => {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val out = graft.util.Scratch.dir(s"graft-st10-$run")
      val ref = Lake.table(s, dir, "events").groupBy(col("event_type"))
        .agg(count(lit(1)).as("n")).orderBy(col("event_type"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      graft.streaming.EventsStream.runAvailableNowToFiles(s, dir,
        ev => graft.streaming.EventsStream.windowedDrift(ev, ref),
        s"$out/data", s"$out/ckpt")
    }),

    // stream-static enrichment: the events stream joined to the static
    // customer dimension, run through the production Append file sink. No
    // state store — every micro-batch joins against the dimension and emits,
    // so the result equals the batch join exactly.
    "st03_stream_enrich" -> ((s, dir) => {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val out = graft.util.Scratch.dir(s"graft-st03-$run")
      graft.streaming.EventsStream.runAvailableNowToFiles(s, dir,
        ev => graft.streaming.EventsStream.enrichWithStatic(
            ev, Lake.table(s, dir, "customer"), "user_id", "c_custkey")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("c_mktsegment"), bi(col("c_nationkey")).as("c_nationkey")),
        s"$out/data", s"$out/ckpt")
    }),

    // streaming exact dedup of an at-least-once source: the stream unioned
    // with itself simulates upstream redelivery; dropDuplicatesWithinWatermark
    // removes the duplicates with state bounded by the watermark delay. The
    // deduped stream equals the original events exactly.
    "st05_stream_dedup" -> ((s, dir) => {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val out = graft.util.Scratch.dir(s"graft-st05-$run")
      graft.streaming.EventsStream.runAvailableNowToFiles(s, dir,
        ev => graft.streaming.EventsStream.streamingDedup(ev.union(ev), "event_id")
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_timestamp(col("ts")).as("ts_s")),
        s"$out/data", s"$out/ckpt")
    }),

    // column profiling (data-quality report): one scan produces per-column
    // row/non-null/exact-distinct counts and min/max. Profiled columns are
    // exact-representation types (longs, strings) so the stringified min/max
    // compare byte-identically with the oracle.
    "p01_profile" -> ((s, dir) =>
      graft.operators.Profile.profile(
        t(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey"))),

    // high-watermark incremental extraction (CDC-shaped ingest): two runs — the
    // source first visible only up to a mid-range cutoff, then in full — land
    // exactly the whole table with no duplicates: run 2's cursor predicate
    // (ts beyond the persisted watermark) pushes into the scan and picks up
    // precisely the rows run 1 hadn't seen.
    "i01_incremental" -> ((s, dir) => {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val base = graft.util.Scratch.dir(s"graft-i01-$run")
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      val cut = (mm.getLong(0) + mm.getLong(1)) / 2
      val state = s"$base/watermark"; val dest = s"$base/data"
      graft.pipeline.Incremental.runIncrement(
        ev.filter(unix_micros(col("ts")) <= cut), "ts", state, dest)
      graft.pipeline.Incremental.runIncrement(ev, "ts", state, dest)
      graft.pipeline.Incremental.readAll(s, dest)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("ts_s"))
    }),

    // schema evolution across increments: an early increment without `lang`
    // and a later one with it read back as one table (mergeSchema unions the
    // file schemas; pre-drift rows surface the new column as null). The split
    // point is scale-relative (half of max doc_id, integer-floored the same
    // way in the oracle) so both increments are non-empty at every SF.
    "i02_schema_evolution" -> ((s, dir) => {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val base = graft.util.Scratch.dir(s"graft-i02-$run")
      val docs = t(s, dir, "documents")
      val cut = docs.agg(expr("max(doc_id) div 2").as("cut")).head().getLong(0)
      docs.where(col("doc_id") < cut).select(col("doc_id"), col("source"))
        .write.parquet(s"$base/data/inc_from=0")
      docs.where(col("doc_id") >= cut)
        .select(col("doc_id"), col("source"), col("lang"))
        .write.parquet(s"$base/data/inc_from=$cut")
      graft.pipeline.Incremental.readAllEvolved(s, s"$base/data")
        .select(col("doc_id"), col("source"), col("lang"))
    }),

    // the d12 dedup run as a CONTINUOUS pipeline over its materialized
    // state: three ingest batches (doc_id % 3 = 0, 1, 2, in order), each
    // deduped against the fingerprint INDEX built by the previous batches —
    // batch N+1 scans ~8 B/doc of index, never the raw history text — then
    // appended to it. Survivors = docs whose normalized text is unseen in
    // any earlier batch (in-batch dups all survive, the d12 contract).
    "i03_fingerprint_index" -> ((s, dir) => {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val base = graft.util.Scratch.dir(s"graft-i03-$run")
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val idx = s"$base/fpindex"
      (0L to 2L).map { b =>
        // expectedBatchRows = the ingest manifest's count (the CTL
        // contract): bounds the confirm broadcast with no eager HLL scan
        graft.operators.FingerprintIndex.step(
          docs.where(col("doc_id") % 3 === b), "text", idx, b,
          expectedHistoryRows = 1000000L, expectedBatchRows = 1000000L)
          .select(col("doc_id"), lit(b).as("batch"))
      }.reduce(_ unionAll _)
    }),

    // continuous ingestion with the reference's output contract: every
    // micro-batch commits one parquet file + CTL manifest (foreachBatch
    // bridging the stream onto the batch sink stack); batch-id file names make
    // replays idempotent. Output = everything landed, which equals the source.
    "st06_stream_ingest" -> ((s, dir) => {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val out = graft.util.Scratch.dir(s"graft-st06-$run")
      graft.streaming.EventsStream.runIngestStream(s, dir,
        ev => ev.select(col("event_id"), col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("ts_s")),
        s"$out/data", s"$out/ckpt")
    }),

    // streaming CDC upsert view: the events changelog folded into a
    // latest-state-per-key snapshot via foreachBatch (tombstones retained in
    // storage, filtered at serve time); versioned snapshot dirs make batch
    // replays idempotent. Batch-fold == one global pass (MergeBatchSpec), so
    // the window oracle applies.
    "st07_stream_upsert" -> ((s, dir) => {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val out = graft.util.Scratch.dir(s"graft-st07-$run")
      graft.streaming.UpsertView.runUpsertStream(s, dir, s"$out/snap", s"$out/ckpt")
    }),

    // stream-stream interval join (watermarks on both sides + time-range
    // condition = bounded join state): purchases x same-user clicks within
    // the preceding hour, through the production Append file sink. Inner
    // stream-stream joins emit on match, so bounded input equals the batch
    // interval join.
    "st04_stream_join" -> ((s, dir) => {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val out = graft.util.Scratch.dir(s"graft-st04-$run")
      graft.streaming.EventsStream.runAvailableNowToFiles(s, dir,
        ev => graft.streaming.EventsStream.purchaseClickJoin(ev)
          .select(col("purchase_id"), col("click_id"),
            (unix_timestamp(col("p_ts")) - unix_timestamp(col("c_ts"))).as("gap_s")),
        s"$out/data", s"$out/ckpt")
    }),

    // stream-stream LEFT OUTER interval join: unmatched purchases emit once
    // the watermark proves no qualifying click can still arrive. The output
    // keeps only purchases a full join-window below the final watermark
    // (max(ts) - 2h delay - 1h window), where the streaming result provably
    // equals the batch left join; newer rows finalize in the next run.
    "st08_stream_outer_join" -> ((s, dir) => {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val out = graft.util.Scratch.dir(s"graft-st08-$run")
      val emitted = graft.streaming.EventsStream.runAvailableNowToFiles(s, dir,
        ev => graft.streaming.EventsStream.purchaseClickLeftJoin(ev)
          .select(col("purchase_id"), col("p_ts"), col("click_id")),
        s"$out/data", s"$out/ckpt")
      val cutoff = t(s, dir, "events")
        .agg((max(col("ts")) - expr("INTERVAL 3 HOURS")).as("graft_cutoff"))
      emitted.crossJoin(broadcast(cutoff))
        .where(col("p_ts") < col("graft_cutoff"))
        .select(col("purchase_id"), col("click_id"))
    }),

    // gap-based sessionization (window-function formulation; the streaming
    // flatMapGroupsWithState twin is exercised in StreamingSpec).
    "st02_sessionize" -> ((s, dir) =>
      graft.streaming.EventsStream.sessionizeBatch(t(s, dir, "events"), gapMinutes = 30)
        .select(col("user_id"),
          unix_timestamp(col("session_start")).as("session_start_s"),
          unix_timestamp(col("session_end")).as("session_end_s"),
          col("n_events"), col("value_sum"))),

    // ---- training-data extension operators (SURVEY §7.1(7)) ----

    // AS-OF join: each purchase enriched with the user's latest click at or
    // before the purchase instant — one key-shuffle + one linear window pass
    // (operators.AsofJoin), never a per-key range explosion.
    "o01_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("click_id"))
      graft.operators.AsofJoin.lastAtOrBefore(
          purchases, clicks.withColumn("click_ts", col("ts")),
          Seq("user_id"), "ts",
          struct(col("click_id"), col("click_ts")), "_m")
        .select(col("purchase_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"),
          col("_m.click_id").as("click_id"),
          unix_timestamp(col("_m.click_ts")).as("click_ts_s"))
    }),

    // skew-salted join: lineitem (the skewable fact) salted over 8 buckets
    // against a replicated orders projection — result identical to the plain
    // equi-join (the oracle), but no single task ever owns a whole hot key.
    "o02_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), bi(col("l_linenumber")).as("l_linenumber"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      graft.operators.SkewJoin.saltedInnerJoin(
          li, o, Seq("l_orderkey" -> "o_orderkey"),
          salts = 8, saltBy = Seq("l_orderkey", "l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("o_orderpriority"))
    }),

    // exact dedup groups over document text.
    "d01_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")),

    // normalized-fingerprint dedup. The plan groups by the 8-byte xxhash64
    // fingerprint (the 100 TB shuffle key); the output keeps the oracle-able
    // columns — DuckDB reproduces the same groups via the normalized text.
    "d02_dedup_fingerprint" -> ((s, dir) =>
      Dedup.byFingerprint(t(s, dir, "documents"), "doc_id", "text")
        .select(col("keep_id"), col("dup_count"))),

    // MinHash+LSH near-dup pairs, exact-Jaccard verified.
    // 128x32 (4 rows/band) over the former 64x16: the splitmix64 hash family
    // is indexed by position, so the first 16 bands are the EXACT slices of
    // the 64-hash config and candidates only widen — sf0.01/sf0.1 results are
    // provably unchanged, while sf1 recall measured 250574/250600 at 64x16
    // (misses at jaccard 0.73-0.77, ~0.5%/pair band-miss odds) and
    // 250600/250600 EXACT at 128x32, for ~1.3x wall (RecallProbe RECALL_D03).
    "d03_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, numHashes = 128, bands = 32, threshold = 0.4)),

    // SimHash near-dup pairs (Hamming ≤ 3 on 64-bit signatures).
    // portable md5-derived token hashes make the full signature reproducible
    // in the oracle; chunks(4) > maxHamming(3) makes the banding exhaustive,
    // so output == all pairs at hamming <= 3, exactly.
    "d04_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, chunks = 4, portableHash = true)
        .select(col("id_a"), col("id_b"), bi(col("hamming")).as("hamming"))),

    // exact n-gram Jaccard pairs via inverted-index join.
    "d05_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, threshold = 0.4)),

    // embedding cosine near-dup pairs (sign-LSH candidates, exact verify).
    // This corpus has no true near-dups (max pairwise cosine ≈ 0.51), so the
    // demo threshold is 0.45 — a regime where sign-LSH needs a wide table
    // budget (collision prob/plane at cos≈0.46 is ~0.65). 24 four-plane tables
    // measure TOTAL recall on this corpus (14/14 qualifying pairs, seeded LSH →
    // stable), which makes the exact all-pairs oracle apply; output is the pair
    // ids — the cosine value stays internal because Spark normalizes in float32
    // while the oracle computes in float64, and the 6th decimal can differ. At
    // production thresholds (≥0.9, ~0.9 prob/plane) the same recall costs far
    // fewer, more selective tables.
    // planesPerTable = 0 auto-sizes planes to the corpus (max(4, log2(n/128)))
    // — identical to the recall-measured 4-plane config at sf0.01 AND sf0.1,
    // while a 10x corpus gets 8 planes and keeps candidate generation ~linear
    // (fixed 16-bucket tables measured x178 at data x10; see Dedup scaladoc
    // for the recall-vs-cost trade that buys).
    // probes = -1 ships the SCALE-CONDITIONAL auto-probe (Dedup scaladoc): 0
    // at the 4-plane floor — sf0.01/sf0.1, where candidates are measured
    // total and the r9-shipped fixed probes=2 paid 2.6x bench wall for
    // nothing — and 2 above it, the measured sf1 multi-probe trade (recall
    // 0.9425 at probes=0 → 0.986 at probes=2 for ~3x ONE side's candidate
    // generation). Probes only WIDEN the candidate set (exact-cosine verify
    // unchanged), so sf0.01/sf0.1 rows stay exact, while the sf1 campaign
    // pins recall ≥ 0.98 as a floor (tools/compare_oracle.py APPROX_RECALL)
    // so a future banding/plane/auto-rule change can't silently regress it.
    "d06_embedding_neardup" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.45, planesPerTable = 0, tables = 24, probes = -1)
        .select(col("id_a"), col("id_b"))),

    // near-dup CLUSTERS: pair list → connected components → canonical min-id
    // survivor per component (the unit of deletion — pairs alone can't drive
    // dedup when A~B~C). Pairs here are the exact n-gram Jaccard ones, so the
    // oracle can recompute them and resolve components with a recursive CTE.
    "d07_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, threshold = 0.4)
      graft.operators.Components.clusters(pairs, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("cluster_id"),
          bi(col("cluster_size")).as("cluster_size"))
    }),

    // end-to-end curation: near-dup clusters (d07) + quality scores (t01) →
    // ONE quality-ranked survivor per cluster (ties by lowest id). The unit of
    // deletion a dedup pass actually ships.
    "d08_quality_survivors" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.4)
      val clusters = graft.operators.Components.clusters(pairs, "id_a", "id_b")
      val scored = docs.select(col("doc_id"), T.qualityScore(col("text")).as("quality"))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("quality").desc, col("doc_id"))
      clusters.join(scored, clusters("id") === scored("doc_id"))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("cluster_id"), col("doc_id").as("survivor_id"),
          col("quality"), bi(col("cluster_size")).as("cluster_size"))
    }),

    // cross-corpus decontamination: corpus docs overlapping any eval-set doc
    // (same eval split as c01) by exact 3-gram Jaccard. Threshold 0.02 because
    // the synthetic corpus shares only scattered trigrams across docs (max
    // cross-eval jaccard ~0.029) — real corpora run ~0.8 on 8-13-grams. Eval
    // side broadcasts; recall is total by construction (any jaccard > 0 shares
    // a shingle), so the all-pairs oracle is exact.
    "d09_cross_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.crossJaccardFlags(docs, docs.where(col("doc_id") % 97 === 0),
        "doc_id", "text", shingleN = 3, threshold = 0.02)
        .select(col("id").as("doc_id"), col("n_eval_matches"), col("max_jaccard"))
    }),

    // ExactSubstr-style cross-doc verbatim span coverage (Lee et al. 2022):
    // per doc, the token fraction covered by 8-grams duplicated anywhere in
    // the corpus, overlaps counted once. Gram text never crosses an exchange.
    "d10_dup_spans" -> ((s, dir) =>
      Dedup.dupSpanCoverage(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", k = 8)),

    // GPT-style sequence packing: concatenate docs per source in doc_id order,
    // cut at a 512-token budget — each doc's pack id is floor(tokens-before /
    // 512). One window sum per source partition; exact integer arithmetic.
    "t09_sequence_pack" -> ((s, dir) => {
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          T.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          floor(col("cum_before") / 512L).cast("long").as("pack_id"),
          (col("cum_before") % 512L).as("pack_offset"))
    }),

    // exact brute-force cosine top-k (correctness baseline for ANN). The
    // oracle compares ranks, not scores: both engines compute cosine in double,
    // but accumulation-order differences in the last ulp would flake a
    // hash-compare on the score itself; neighbor identity + rank is exact.
    "s01_ann_bruteforce" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), bi(col("rank")).as("rank"))
    }),

    // sign-LSH ANN with exact re-rank. The verify-scale budget (2 planes × 16
    // tables) measures TOTAL top-5 recall on this corpus (40/40 result rows ==
    // brute force; seeded LSH → stable), so the exact brute-force oracle
    // applies — the LSH trick here parallels d05's inactive-prune oracle run.
    // Output is (query, neighbor, rank); the cosine stays internal (float32 vs
    // float64 normalization differs in the last decimal). Production raises
    // planesPerTable for selectivity and accepts <100% recall.
    "s02_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, dim = 64, planesPerTable = 2, tables = 16)
        .select(col("query_id"), col("neighbor_id"), bi(col("rank")).as("rank"))
    }),

    // IVF ANN: coarse-quantizer cells + probe join + exact re-rank. At verify
    // scale nprobe = centroids (full probe), so the result is exact by
    // construction and the brute-force oracle applies — what's under test is
    // the IVF machinery itself (assignment, inverted cells, probe join,
    // re-rank). Production tunes nprobe << centroids; SimilaritySpec measures
    // that recall/cost trade separately.
    "s03_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, dim = 64, centroids = 16, nprobe = 16)
        .select(col("query_id"), col("neighbor_id"), bi(col("rank")).as("rank"))
    }),

    // product-quantization ANN (Jégou et al. 2011, ADC): corpus compressed
    // to m=8 sub-codes from per-subspace kmeansStep codebooks (the x02
    // chain), queries score candidates by summing quantized distance-table
    // decimals — the whole approximation is deterministic, so the oracle
    // recomputes it exactly (no recall gate needed; recall vs exact is
    // RecallProbe/BENCH_ANALYSIS territory).
    "s04_ann_pq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.pqTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, dim = 64, m = 8, ks = 16)
        .select(col("query_id"), col("neighbor_id"), col("approx_dot"),
          bi(col("rank")).as("rank"))
    }),

    // IVF + PQ composed (non-residual IVFADC): the s03 coarse-cell pruning
    // stacked on s04's code compression — each query ADC-scores only the
    // codes in its nprobe best cells. Full probe == s04 bit-for-bit
    // (spec-pinned); this query ships partial probe (4/16), and the oracle
    // recomputes the same pruned approximation exactly.
    "s05_ann_ivfpq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 8), "vec_id",
        "embedding", k = 5, dim = 64, m = 8, ks = 16,
        centroids = 16, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("approx_dot"),
          bi(col("rank")).as("rank"))
    }),

    // residual IVFADC (Jégou §III): codes quantize x − coarse(x) with
    // codebooks TRAINED on residuals; scoring stays inner-product ADC —
    // q·x̂ = q·centroid (one quantized scalar per probed cell) + the s04
    // table sum — so the approximation is deterministic and the oracle is
    // exact even at partial probe. See Similarity.ivfPqResidualTopK.
    "s06_ann_ivfpq_residual" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfPqResidualTopK(e, e.filter(col("vec_id") < 8), "vec_id",
        "embedding", k = 5, dim = 64, m = 8, ks = 16,
        centroids = 16, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("approx_dot"),
          bi(col("rank")).as("rank"))
    }),

    // text analysis: language-ID + quality + token counts. (The xxhash64
    // fingerprint feature is exercised by d02's grouping and unit tests — it
    // has no DuckDB equivalent, so it stays out of the oracle-checked output.)
    // one compiled tokenStats pass feeds lang-profile hits, the token count
    // and the quality score's token components (bit-identical ratios,
    // TextStatsSpec); the two regex counters stay declarative
    "t01_text_features" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"), T.tokenStats(col("text")).as("_ts"))
        .select(
          col("doc_id"),
          T.langIdFromHits(col("_ts.profile_hits")).as("lang_pred"),
          bi(col("_ts.n_tokens")).as("n_tokens"),
          bi(T.bpeTokenCount(col("text"))).as("n_bpe_tokens"),
          round(
            least(col("_ts.n_tokens").cast("double") / 100.0, lit(1.0)) * 0.4 +
              least(when(col("_ts.n_tokens") === 0, 0.0)
                .otherwise(col("_ts.stop_hits").cast("double")
                  / col("_ts.n_tokens")) * 5.0, lit(1.0)) * 0.3 +
              greatest(lit(0.0),
                lit(1.0) - T.punctRatio(col("text")) * 4.0) * 0.2 +
              greatest(lit(0.0), lit(1.0) - T.upperRatio(col("text"))) * 0.1,
            6).as("quality"))),

    // deterministic content-keyed train/valid/test split (md5-bucketed; see
    // operators.DatasetSplit for why content-keyed beats rand() at 100 TB).
    "t03_train_split" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        graft.operators.DatasetSplit.assign(col("text"),
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)).as("split"))),

    // PII redaction: email / IPv4 / phone-run masking before anything else
    // touches the corpus. Pure regexp_replace chain in the Java∩RE2 subset, so
    // the DuckDB oracle applies the identical patterns.
    "t04_pii_redact" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"), T.redactPii(col("text")).as("clean_text"))),

    // repetition statistics (Gopher-style quality rules): duplicate-token,
    // top-token, and duplicate-bigram fractions. Ratios of the same integers
    // on both engines → bit-identical doubles, no rounding needed.
    "t05_repetition" -> ((s, dir) =>
      // one compiled tokenStats pass (the primitive stack re-tokenized the
      // doc three times and sorted it once); same integer ratios,
      // bit-identical doubles (TextStatsSpec)
      t(s, dir, "documents")
        .select(col("doc_id"), T.tokenStats(col("text")).as("_ts"))
        .select(
          col("doc_id"),
          when(col("_ts.n_tokens") === 0, 0.0)
            .otherwise(lit(1.0) - col("_ts.distinct_tokens").cast("double")
              / col("_ts.n_tokens").cast("double")).as("dup_token_frac"),
          when(col("_ts.n_tokens") === 0, 0.0)
            .otherwise(col("_ts.top_count").cast("double")
              / col("_ts.n_tokens").cast("double")).as("top_token_frac"),
          when(col("_ts.n_bigrams") === 0, 0.0)
            .otherwise(lit(1.0) - col("_ts.distinct_bigrams").cast("double")
              / col("_ts.n_bigrams").cast("double")).as("dup_bigram_frac"))),

    // the FULL Gopher char-fraction battery (top-{2,3,4}-gram / dup-{5..10}-
    // gram char fractions, overlaps counted once) — one compiled pass per doc,
    // O(len) per document; see functions.TextRepetition for the rule text.
    "t14_ngram_repetition" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextRepetition.ngramRepetition(col("text")).as("r"))
        .select(col("doc_id") +:
          graft.functions.TextRepetition.fieldNames.map(f => col(s"r.$f")): _*)),

    // SemDeDup (Abbas et al. 2023): nearest-centroid clustering, near-dup
    // pairs searched within clusters only, lowest-id survivor. Components are
    // quantized to integers up front, so every comparison downstream —
    // squared-L2 argmin, cosine ≥ eps, survivor rule — is bit-identical on
    // any engine (see operators.SemDedup scaladoc); the oracle recomputes the
    // whole pass exactly, no approx gate needed at any scale.
    // MOSS winnowing fingerprints (Schleimer et al. 2003): window-min k-gram
    // hashes, rightmost tie — the position-robust passage signature. Whole
    // selection compiles into the row; zero exchanges (WinnowingSpec).
    "t21_winnow_fingerprints" -> ((s, dir) =>
      graft.operators.Winnowing.fingerprints(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", k = 5, w = 4)),

    // passage-overlap pairs over the winnowed index: the fp-keyed exchange
    // carries ~2/(w+1) of d10's every-gram volume (SIZING d13 vs d10); the
    // maxDocFreq boilerplate prune is contractual and oracle-modeled.
    "d13_winnow_overlap" -> ((s, dir) =>
      graft.operators.Winnowing.overlapPairs(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", k = 16, w = 8, minShared = 8, maxDocFreq = 1000)),

    "d11_semdedup" -> ((s, dir) =>
      graft.operators.SemDedup.semDedup(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 16, eps = 0.45)
        .select(col("id").as("vec_id"), col("cluster"), col("kept"))),

    // Incremental dedup of a new ingest batch against the already-ingested
    // history: bloom-pruned (no false negatives) + exact confirm, output
    // EXACTLY the plain anti-join on the d02 normalized-text fingerprint.
    // History = even doc_ids, batch = ids % 3 == 0; ids % 6 == 0 model the
    // recrawl overlap (identical text already ingested) and must drop.
    "d12_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"))
      graft.operators.HistoryDedup.newAgainstHistory(
        docs.where(col("doc_id") % 3 === 0),
        docs.where(col("doc_id") % 2 === 0),
        "text", expectedHistoryRows = 1000000L)
        .select(col("doc_id"), col("n_chars"))
    }),

    // Language identification (Cavnar & Trenkle 1994 char n-gram signal,
    // multinomial NB scoring): the PRODUCER for the language column the
    // t08/t11/t18/t19 mix family consumes. Train on the labeled 4/5 of the
    // corpus (doc_id % 5 != 0), score the held-out unlabeled fifth; the
    // L×V-row model broadcasts and per-gram log-probs are quantized at 1e-9
    // — see operators.LangId.
    "t22_language_id" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      graft.operators.LangId.classify(
        docs.where(col("doc_id") % 5 =!= 0),
        docs.where(col("doc_id") % 5 === 0),
        "doc_id", "text", "lang")
    }),

    // HTML boilerplate removal (Kohlschütter et al., WSDM 2010): the crawl
    // pipeline's step upstream of every text operator. Pages are built
    // deterministically from the lake docs (nav + article + footer — the
    // canonical boilerplate sandwich); the densitometric block rules must
    // keep exactly the article text. Integer-exact, zero-exchange narrow
    // map — see operators.Boilerplate.
    "t23_boilerplate" -> ((s, dir) =>
      graft.operators.Boilerplate.extract(
        t(s, dir, "documents").select(col("doc_id"),
          concat(
            lit("<html><body><nav><a href=\"/\">home</a> " +
              "<a href=\"/a\">about</a> <a href=\"/c\">contact</a></nav><p>"),
            col("text"),
            lit("</p><div class=\"foot\"><a href=\"/t\">terms</a> " +
              "<a href=\"/p\">privacy</a> all rights reserved</div>" +
              "</body></html>")).as("html")),
        "doc_id", "html")),

    // bigram-LM quality scoring (CCNet's KenLM-perplexity filtering step):
    // the model is trained on the corpus in the same pass that scores it;
    // per-distinct-bigram log-probs quantized at 1e-9, per-doc mean summed as
    // exact decimals — see operators.Quality.lmScore.
    "t15_lm_perplexity" -> ((s, dir) =>
      graft.operators.Quality.lmScore(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text")),

    // interpolated Kneser-Ney trigram LM (Kneser & Ney 1995) — the
    // production form of t15's add-one bigram toy (CCNet's KenLM is KN at
    // heart): absolute discounting with continuation-count backoff, all
    // model relations TYPE-bounded aggregations of the distinct-trigram
    // relation — see operators.Quality.knTrigramScore.
    "t24_kn_trigram_lm" -> ((s, dir) =>
      graft.operators.Quality.knTrigramScore(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text")),

    // URL/domain rule filtering (RefinedWeb §3.1 / FineWeb blocklist
    // stage): deterministic per-doc URLs (host from source + id, TLD and
    // path planted by id residues), an exact-host blocklist RELATION
    // self-derived from the % 97 split ("previously flagged hosts"),
    // plus suffix/TLD/path literal rules. Broadcast blocklist join —
    // zero corpus shuffle (UrlFilterSpec pin). block_reason = first
    // matching rule (host → host_suffix → tld → path), null when kept.
    "t25_url_filter" -> ((s, dir) => {
      val urls = t(s, dir, "documents").select(col("doc_id"),
        concat(
          lit("https://www."), col("source"), lit("-"),
          (col("doc_id") % 50).cast("string"), lit("."),
          element_at(lit(Array("com", "org", "net", "xyz")),
            (col("doc_id") % 4 + 1).cast("int")),
          when(col("doc_id") % 11 === 0, lit("/private"))
            .otherwise(lit("/docs")),
          lit("/page-"), col("doc_id").cast("string")).as("url"))
      val blocked = graft.operators.UrlFilter.parse(
          urls.where(col("doc_id") % 97 === 0), "doc_id", "url")
        .select(col("host")).distinct()
      graft.operators.UrlFilter.flags(urls, "doc_id", "url",
        graft.operators.UrlFilter.Rules(
          blockedTlds = Seq("xyz"),
          blockedHostSuffixes = Seq("-22.net"),
          blockedPathPatterns = Seq("^/private(/|$)")),
        blockedHosts = Some(blocked))
        .select(col("doc_id"), col("host"), col("tld"),
          col("kept").cast("int").as("kept"), col("block_reason"))
    }),

    // DSIR importance weights (Xie et al. 2023): hashed unigram+bigram bag
    // features (portable md5 buckets), add-one-smoothed target-vs-raw bucket
    // models, per-doc log-likelihood ratio. Target split reuses d09's
    // deterministic doc_id % 97 convention; the model is EXACTLY B rows at
    // any corpus size — see operators.Dsir.
    "t16_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      graft.operators.Dsir.importanceWeights(
        docs, docs.where(col("doc_id") % 97 === 0), "doc_id", "text",
        buckets = 1024)
    }),

    // DSIR stage 2 (Xie et al. §3.2): Gumbel-top-k resampling over the t16
    // weights — k docs without replacement, probability ~ exp(log_w), noise
    // content-keyed through the portable md5 hash so the draw is exactly
    // reproducible (and idempotent under retry) in any engine.
    "t17_dsir_resample" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      graft.operators.Dsir.gumbelTopK(
        graft.operators.Dsir.importanceWeights(
          docs, docs.where(col("doc_id") % 97 === 0), "doc_id", "text",
          buckets = 1024).drop("n_grams"),
        "doc_id", "log_w", k = 100)
    }),

    // UniMax language mixing (Chung et al. 2023): budget spread as evenly as
    // possible over languages, each capped at epochCap epochs of its own
    // corpus — INTEGER closed form over the language histogram, then the
    // exact per-language md5-rank draw. Budget = 60% of the corpus (integer
    // div, the one bounded driver seam: a 1-value count).
    "t18_unimax_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val budget = docs.count() * 6 / 10
      graft.operators.LanguageMix.drawByQuota(
        docs, "lang", "doc_id",
        graft.operators.LanguageMix.unimaxQuotas(docs, "lang", budget,
          epochCap = 2))
    }),

    // mC4 exponent-scaled language sampling (alpha = 0.3): quotas from the
    // flattened language shares (pow quantized once per language), drawn
    // SHUFFLE-FREE by content-keyed hash threshold — membership exact and
    // append-stable, counts binomial around the quota by contract.
    "t19_temperature_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val budget = docs.count() / 2
      graft.operators.LanguageMix.drawByShare(
        docs, "lang", "doc_id",
        graft.operators.LanguageMix.temperatureQuotas(docs, "lang", budget,
          alpha = 0.3))
    }),

    // Gopher-style quality-rule battery: every stat is an exact integer ratio,
    // so flags AND the keep verdict reproduce bit-for-bit in the oracle.
    "t06_quality_filter" -> ((s, dir) =>
      graft.operators.Quality.flags(
        t(s, dir, "documents").select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), col("n_tokens"), col("mean_token_len"),
          col("symbol_ratio"), col("stopword_ratio"), col("dup_bigram_frac"),
          col("keep").cast("int").as("keep"))),

    // domain-level curation gate (FineWeb/Dolma pattern): per-SOURCE
    // dup-rate + stub-fraction signals, broadcast back to gate every doc.
    // One wide exchange carries (source, fingerprint, short-flag) only; the
    // doc side never shuffles. kept cast to int (t06's boolean convention).
    "t20_source_curation" -> ((s, dir) =>
      graft.operators.SourceCuration.curate(
        t(s, dir, "documents").select(col("doc_id"), col("text"), col("source")),
        "doc_id", "text", "source")
        .select(col("doc_id"), col("source"), col("src_dup_rate"),
          col("src_short_frac"), col("kept").cast("int").as("kept"))),

    // deterministic stratified sampling (domain mixing): exactly
    // ceil(0.25 * |stratum|) docs per source, chosen by md5-of-id rank —
    // content-keyed, so the identical row set falls out of any engine.
    "t07_stratified_sample" -> ((s, dir) =>
      graft.operators.Sampling.stratifiedExact(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", "doc_id", 0.25)),

    // benchmark-contamination sweep: corpus docs sharing a verbatim word
    // 3-gram with the (broadcast) eval split; n=3 because the synthetic corpus
    // vocabulary is tiny — real corpora use 8-13.
    "c01_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      graft.operators.Contamination.overlap(
        docs, docs.where(col("doc_id") % 97 === 0), "doc_id", "text", n = 3)
    }),

    // the crawl pipeline END TO END in one DataFrame chain: t23 boilerplate
    // extraction (the same planted-HTML sandwich) → t22 langid trained on
    // the labeled 4/5, gate on predicted 'en' → t06 quality rules → d02
    // normalized-fingerprint dedup (min-id survivor) → t16/t17 DSIR
    // importance-weight + Gumbel-top-k(100) resample (target = survivors
    // with doc_id % 13 == 0) → t09 packing at 512 tokens. Every stage is
    // individually oracle-gated; this row gates the COMPOSITION.
    "c02_crawl_pipeline" -> ((s, dir) => {
      val pages = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          concat(
            lit("<html><body><nav><a href=\"/\">home</a> " +
              "<a href=\"/a\">about</a> <a href=\"/c\">contact</a></nav><p>"),
            col("text"),
            lit("</p><div class=\"foot\"><a href=\"/t\">terms</a> " +
              "<a href=\"/p\">privacy</a> all rights reserved</div>" +
              "</body></html>")).as("html"))
      graft.operators.CrawlPipeline.curate(pages, "doc_id", "html",
        "lang", "source",
        labeledPred = col("doc_id") % 5 =!= 0, targetLangs = Seq("en"),
        dsirTargetPred = col("doc_id") % 13 === 0,
        sampleK = 100, packBudget = 512L,
        // the single-materialization seam: extraction (the most expensive
        // narrow stage) runs once into cache instead of once per consuming
        // pipeline — static plan 12 parquet-scan pipelines -> 1 scan + 6
        // cache reads; sf0.1 wall 11.1 -> 9.3 s honest (cache cleared per
        // run). Output bit-identical.
        persistExtracted = true)
    }),

    // c02 with the PRODUCTION quality gate composed in: CCNet's LM filter
    // (t24's self-trained interpolated Kneser-Ney trigram LM) keeps the
    // lowest-perplexity 80% of scored docs (head-fraction bucketing —
    // scale-robust where an absolute cutoff is not) IN ADDITION to the t06
    // rules. The (id, ppl) relation joins at the same id key as the
    // language gate, so the chain still co-locates text exactly twice.
    "c04_crawl_kn_gate" -> ((s, dir) => {
      val pages = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          concat(
            lit("<html><body><nav><a href=\"/\">home</a> " +
              "<a href=\"/a\">about</a> <a href=\"/c\">contact</a></nav><p>"),
            col("text"),
            lit("</p><div class=\"foot\"><a href=\"/t\">terms</a> " +
              "<a href=\"/p\">privacy</a> all rights reserved</div>" +
              "</body></html>")).as("html"))
      graft.operators.CrawlPipeline.curate(pages, "doc_id", "html",
        "lang", "source",
        labeledPred = col("doc_id") % 5 =!= 0, targetLangs = Seq("en"),
        dsirTargetPred = col("doc_id") % 13 === 0,
        sampleK = 100, packBudget = 512L,
        persistExtracted = true, knHeadFrac = Some(0.8))
    }),

    // the INCREMENTAL crawl pipeline — the production operating mode: three
    // ingest batches (doc_id % 3 = 0, 1, 2, processed in order), each t25
    // URL-gated (planted URLs + blocklist), curated through the full c02
    // chain, deduped against the FINGERPRINT INDEX of earlier batches'
    // extracted sets (~8 B/doc of history, never the raw text), landed as
    // one parquet + CTL manifest per batch, then appended to the index.
    "c03_incremental_crawl" -> ((s, dir) => {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val base = graft.util.Scratch.dir(s"graft-c03-$run")
      val pages = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          concat(
            lit("<html><body><nav><a href=\"/\">home</a> " +
              "<a href=\"/a\">about</a> <a href=\"/c\">contact</a></nav><p>"),
            col("text"),
            lit("</p><div class=\"foot\"><a href=\"/t\">terms</a> " +
              "<a href=\"/p\">privacy</a> all rights reserved</div>" +
              "</body></html>")).as("html"),
          concat(
            lit("https://www."), col("source"), lit("-"),
            (col("doc_id") % 50).cast("string"), lit("."),
            element_at(lit(Array("com", "org", "net", "xyz")),
              (col("doc_id") % 4 + 1).cast("int")),
            when(col("doc_id") % 11 === 0, lit("/private"))
              .otherwise(lit("/docs")),
            lit("/page-"), col("doc_id").cast("string")).as("url"))
      // the planted URL space has exactly lcm(20, 50, 4) = 100 distinct
      // hosts (source/id-residue construction), so the blocklist must be a
      // FIXED host-residue slice — a doc-residue split like % 97 covers
      // every host once ids outgrow the residue lattice (measured: it
      // blocked all 100 hosts at sf1, emptying the whole pipeline)
      // persisted: the blocklist RELATION is consumed once per batch (the
      // broadcast build) — without the persist each of the three increments
      // re-derives it from a full pages scan + URL parse + distinct
      val blocked = graft.operators.UrlFilter.parse(
          pages.where(col("doc_id") % 100 < 5), "doc_id", "url")
        .select(col("host")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val urlRules = graft.operators.UrlFilter.Rules(
        blockedTlds = Seq("xyz"),
        blockedHostSuffixes = Seq("-22.net"),
        blockedPathPatterns = Seq("^/private(/|$)"))
      (0L to 2L).map { b =>
        graft.operators.CrawlPipeline.curateIncrement(
          pages.where(col("doc_id") % 3 === b), "doc_id", "html", "url",
          "lang", "source", urlRules, Some(blocked),
          labeledPred = col("doc_id") % 5 =!= 0, targetLangs = Seq("en"),
          dsirTargetPred = col("doc_id") % 13 === 0,
          indexDir = s"$base/fpindex", batchId = b,
          expectedHistoryRows = 1000000L, sampleK = 40,
          expectedBatchRows = 1000000L,
          // blocklist manifest bound (the planted URL space is exactly 100
          // hosts): skips the per-increment plan-time HLL job — same
          // CTL-manifest seam as expectedBatchRows
          expectedHosts = 100L,
          outDir = Some(s"$base/out"))
          .withColumn("batch", lit(b))
      }.reduce(_ unionAll _)
    }),

    // point-in-interval range join via the binning rewrite (equi-join on bin,
    // exact BETWEEN on candidates — no BroadcastNestedLoop): March-1995
    // shipments against 4-day order windows, aggregated per order.
    "o03_range_join" -> ((s, dir) => {
      val pts = t(s, dir, "lineitem")
        .where(col("l_shipdate").between("1995-03-01", "1995-03-31"))
        .select(col("l_quantity"),
          datediff(col("l_shipdate"), lit("1970-01-01")).cast("long").as("pt_day"))
      val ivs = t(s, dir, "orders")
        .select(col("o_orderkey"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("lo_day"))
        .withColumn("hi_day", col("lo_day") + 3L)
      graft.operators.RangeJoin.pointInInterval(pts, "pt_day", ivs, "lo_day", "hi_day",
          binWidth = 4L)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_pts"), sumd(col("l_quantity")).as("sum_qty"))
    }),

    // Z-order (Morton) clustering key: 8-bit bucket ids for user and value
    // dimensions, bits interleaved — the sort key behind multi-dimensional
    // data skipping (operators.Layout.zOrder). Pure integer arithmetic, so the
    // oracle recomputes it exactly.
    "z01_zorder_key" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          (col("user_id") % 256).as("ub"),
          least(greatest(floor(col("value") / lit(2.0)).cast("long"), lit(0L)),
            lit(255L)).as("vb"))
        .select(col("event_id"),
          graft.operators.Layout.zValue(Seq(col("ub"), col("vb")), bits = 8)
            .as("zv"))),

    // interval-overlap COUNT: March-1995 order windows against all order
    // windows — "how many other orders were in flight while this one was".
    // Counting overlaps does not need the pair join at all: n(a) =
    // #{b_lo <= a_hi} - #{b_hi < a_lo}, two rank queries off one distributed
    // prefix sum (RangeJoin.intervalOverlapCount), so wall scales with DATA
    // even when genuine pair density grows quadratically with the corpus.
    // Self-overlap (every order is in both sides, keys unique) is the -1;
    // the >0 filter matches the oracle's inner-join semantics.
    "o04_interval_overlap" -> ((s, dir) => {
      def windows(df: DataFrame, key: String, lo: String, hi: String) = df
        .select(col("o_orderkey").as(key),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as(lo))
        .withColumn(hi, col(lo) + 3L)
      val marchA = windows(
        t(s, dir, "orders").where(col("o_orderdate").between("1995-03-01", "1995-03-31")),
        "a_key", "a_lo", "a_hi")
      val allB = windows(t(s, dir, "orders"), "b_key", "b_lo", "b_hi")
      graft.operators.RangeJoin.intervalOverlapCount(
          marchA, "a_key", "a_lo", "a_hi", allB, "b_lo", "b_hi")
        .select(col("a_key").as("o_orderkey"),
          (col("overlap_count") - 1L).as("n_concurrent"))
        .where(col("n_concurrent") > 0)
    }),

    // interval-overlap PAIR enumeration via the per-bin plane sweep
    // (RangeJoin.intervalOverlapSweep): candidates compared == pairs emitted,
    // so per-bin CPU is output-linear even when bin density grows — the
    // enumeration-path complement to o04's count path. salt=2 exercises the
    // cross-cell exactly-once tie-break under the oracle.
    "o07_interval_pairs" -> ((s, dir) => {
      def windows(df: DataFrame, key: String, lo: String, hi: String) = df
        .where(col("o_orderdate").between("1995-03-01", "1995-03-07"))
        .select(col("o_orderkey").as(key),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as(lo))
        .withColumn(hi, col(lo) + 3L)
      val a = windows(t(s, dir, "orders"), "a_key", "a_lo", "a_hi")
      val b = windows(t(s, dir, "orders"), "b_key", "b_lo", "b_hi")
      graft.operators.RangeJoin.intervalOverlapSweep(
          a, "a_lo", "a_hi", b, "b_lo", "b_hi", binWidth = 4L, salt = 2)
        .where(col("a_key") < col("b_key"))
        .select(col("a_key"), col("b_key"))
    }),

    // bottom-k (KMV) sketch per source — a custom TypedImperativeAggregate.
    // The k smallest distinct values are a pure function of the input set
    // (merge/insertion order cannot change them), so the custom UDAF is
    // exactly oracle-able; md5 keys keep the ordering portable.
    "p02_bottomk_sketch" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(graft.functions.SketchAggregates
          .bottomK(md5(col("doc_id").cast("string")), 4).as("sk"))
        .select(col("source"), explode(col("sk")).as("h"))),

    // deterministic weighted domain mixing: 2.3 epochs of src0, 0.4 of src1,
    // 1.0 elsewhere — copy counts from exact integer + hex-threshold ops, so
    // the oversampled mix reproduces exactly in SQL.
    "t08_weighted_mix" -> ((s, dir) =>
      graft.operators.Sampling.weightedMix(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", "doc_id", Map("src0" -> 2.3, "src1" -> 0.4))),

    // PPS systematic weighted sample: 50 docs proportional to text length,
    // exact integer boundary-crossing selection (no RNG, no transcendental
    // sort keys) over a DISTRIBUTED prefix sum — see Sampling.ppsSystematic.
    "t13_weighted_sample" -> ((s, dir) =>
      graft.operators.Sampling.ppsSystematic(
        t(s, dir, "documents")
          .select(col("doc_id"), length(col("text")).cast("long").as("w")),
        "doc_id", "w", k = 50)),

    // top-k per group as a heap AGGREGATE (map-side combine: k rows per group
    // per partition reach the shuffle) — the scale-safe twin of the window
    // formulation in q05, which must shuffle-and-sort every row.
    "o05_topk_per_group" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.SketchAggregates.topKRows(
          struct(col("l_quantity"), col("l_orderkey"),
            bi(col("l_linenumber")).as("l_linenumber")), 3).as("top"))
        .select(col("l_returnflag"), explode(col("top")).as("r"))
        .select(col("l_returnflag"), col("r.l_quantity"), col("r.l_orderkey"),
          col("r.l_linenumber"))),

    // token stats expressible identically in ANSI SQL (exact integer outputs).
    "t02_token_stats" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        bi(length(col("text"))).as("n_chars_actual"),
        (bi(length(col("text"))) - bi(length(regexp_replace(col("text"), " ", ""))) + lit(1L))
          .as("n_words"))),

    // multimodal: REAL image codec — synthetic PNGs (dims/pixels closed-form in
    // doc_id) encoded and decoded via javax.imageio inside the mapPartitions
    // batch; the oracle recomputes the expected features from the closed form,
    // so the lossless PNG round trip is exactly checked. The pack runs once
    // per JVM (Multimodal.materialize): the timed plan is parquet scan →
    // narrow decode map, the production shape — not fixture PNG *encoding*.
    "m01_media_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.materialize(s, s"$dir#image")(
          Multimodal.packSyntheticImages(t(s, dir, "documents"), "doc_id", "source"))).toDF()
        .select(col("media_id"), col("media_type"), col("width"), col("height"),
          col("channels"), col("mean_intensity"))),

    // multimodal: REAL audio codec — synthetic 16-bit mono PCM WAVs (rate,
    // sample count, and every sample closed-form in doc_id) encoded and
    // decoded via javax.sound.sampled; WAV is lossless, so the oracle
    // recomputes duration/RMS exactly from the closed form.
    "m04_audio_features" -> ((s, dir) =>
      Multimodal.extractAudioFeatures(
        Multimodal.materialize(s, s"$dir#audio")(
          Multimodal.packSyntheticAudio(t(s, dir, "documents"), "doc_id", "source"))).toDF()
        .select(col("media_id"), col("media_type"), col("sample_rate"),
          col("channels"), col("bits"), col("n_samples"),
          col("duration_sec"), col("rms"))),

    // multimodal: REAL video-style frame sampling — length-prefixed containers
    // of genuine PNG frames (frame f keyed by doc_id*1000+f, closed-form);
    // every stride-th frame is ImageIO-decoded, skipped frames cost a seek
    // not a decode. Frame features are exactly oracle-able like m01.
    "m05_video_frames" -> ((s, dir) =>
      Multimodal.extractSampledFrames(
        Multimodal.materialize(s, s"$dir#video")(
          Multimodal.packSyntheticVideo(t(s, dir, "documents"), "doc_id", "source")),
        stride = 2).toDF()
        .select(col("media_id"), col("frame_idx"), col("width"), col("height"),
          col("mean_intensity"))),

    // multimodal: PUBLIC video container — real multi-frame GIF89a written and
    // frame-sampled via the JDK ImageIO gif plugin. Frames are 8-bit gray over
    // an identity palette (GIF's indexed model is lossless there), every gray
    // sample closed-form in (doc_id, frame, x, y) so the oracle recomputes the
    // decoded mean intensity exactly. Complements m05's bespoke GFV1 framing.
    "m06_gif_frames" -> ((s, dir) =>
      Multimodal.extractGifFrames(
        Multimodal.materialize(s, s"$dir#gif")(
          Multimodal.packSyntheticGif(t(s, dir, "documents"), "doc_id", "source")),
        stride = 2).toDF()
        .select(col("media_id"), col("frame_idx"), col("width"), col("height"),
          col("mean_intensity"))),

    // multimodal metadata path (binary length + content hash — SQL-expressible).
    "m02_media_bytes" -> ((s, dir) =>
      Multimodal.packFromText(t(s, dir, "documents"), "doc_id", "text", "source")
        .select(col("media_id"), bi(length(col("payload"))).as("n_bytes"),
          sha2(col("payload"), 256).as("payload_sha"))),

    // multimodal frame-sampling explode shape.
    "m03_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.packFromText(t(s, dir, "documents"), "doc_id", "text", "source"),
        frameBytes = 64, stride = 2)
        .select(col("media_id"), bi(col("n_frames")).as("n_frames"),
          bi(col("frame_idx")).as("frame_idx"))),

    // CDC snapshot merge (MERGE INTO semantics): base orders + a deterministic
    // synthetic changelog — price-bump updates (key%7), deletes (key%13, seq 2
    // beats the update on key%91), and fresh-key inserts (key%11). One key
    // shuffle; see operators.Merge for the partition-overwrite scale story.
    "u01_cdc_merge" -> ((s, dir) => {
      val base = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      val upd = base.where(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
        .withColumn("op", lit("U")).withColumn("seq", lit(1L))
      val del = base.where(col("o_orderkey") % 13 === 0)
        .withColumn("op", lit("D")).withColumn("seq", lit(2L))
      val ins = base.where(col("o_orderkey") % 11 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
        .withColumn("op", lit("I")).withColumn("seq", lit(1L))
      graft.operators.Merge.snapshot(
        base, upd.unionByName(del).unionByName(ins), Seq("o_orderkey"), "seq", "op")
    }),

    // SCD2 dimension history over the SAME deterministic changelog as u01:
    // every version kept as a validity interval; deletes close intervals and
    // leave no current row (keys%91 get updated then deleted).
    "u02_scd2_history" -> ((s, dir) => {
      val base = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val upd = base.where(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
        .withColumn("op", lit("U")).withColumn("seq", lit(1L))
      val del = base.where(col("o_orderkey") % 13 === 0)
        .withColumn("op", lit("D")).withColumn("seq", lit(2L))
      val ins = base.where(col("o_orderkey") % 11 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
        .withColumn("op", lit("I")).withColumn("seq", lit(1L))
      graft.operators.Merge.scd2(
        base, upd.unionByName(del).unionByName(ins), Seq("o_orderkey"), "seq", "op")
    }),

    // ordered event funnel view → click → purchase: per-user first-completion
    // chain (stage k strictly after first stage k-1) + depth. All stages stack
    // behind one Exchange; see operators.Funnel.
    "e01_funnel" -> ((s, dir) =>
      graft.operators.Funnel.firstCompletion(
        t(s, dir, "events"), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), "event_id")),

    // per-group min-max feature scaling: tiny stats aggregate broadcast back
    // to the fact side — the fact table never shuffles (operators.Features).
    "f01_normalize" -> ((s, dir) =>
      graft.operators.Features.minMaxNormalize(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice")),
        "o_orderpriority", "o_totalprice")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          col("o_totalprice_norm"))),

    // top-5 terms per source by tf-idf-style rarity score (tf*N/df — integer
    // ratio, no libm log, so it reproduces exactly in the oracle).
    "x01_tfidf" -> ((s, dir) =>
      graft.operators.Features.tfidfTopTerms(
        t(s, dir, "documents"), "source", "doc_id", "text", k = 5)),

    // fixed-width histogram: one partial-aggregated scan; edges are exact
    // IEEE multiply-adds from the bucket id.
    "p03_histogram" -> ((s, dir) =>
      graft.operators.Profile.histogram(
        t(s, dir, "orders"), "o_totalprice", width = 50000.0)),

    // Space-Saving frequent items: language mix per source. capacity(64) >
    // distinct langs per source, so no counter ever evicts, every err is 0 and
    // the counts are EXACT — the plain GROUP BY oracle applies (the same
    // regime profiling uses it in: bounded-domain column, one pass,
    // map-side-merged state). ProfileSpec covers the eviction/bounds regime
    // the oracle can't.
    "p04_freq_items" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(graft.functions.SketchAggregates.spaceSaving(col("lang"), 64).as("items"))
        .select(col("source"), explode(col("items")).as("e"))
        .select(col("source"), col("e.item").as("lang"), col("e.cnt").as("cnt"))),

    // passage-level (CCNet-style) dedup: 4-word chunks, first global
    // occurrence survives, text reassembled. Hash-led chunk shuffle; see
    // operators.Dedup.passageDedup.
    "t10_passage_dedup" -> ((s, dir) =>
      Dedup.passageDedup(t(s, dir, "documents"), "doc_id", "text", chunkWords = 4)
        .select(col("id").as("doc_id"), col("n_chunks"), col("n_removed"),
          col("clean_text"))),

    // Bloom-pruned fact⋈dim join: the dim keys' Bloom filter broadcasts to the
    // fact scan and discards non-matching rows before the exchange; the real
    // join then removes the false positives, so the result is EXACTLY the
    // plain join (the oracle). See operators.BloomJoin.
    "o06_bloom_join" -> ((s, dir) => {
      val fact = t(s, dir, "lineitem").select(col("l_orderkey"),
        bi(col("l_linenumber")).as("l_linenumber"), col("l_extendedprice"))
      val dim = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 250000.0)
        .select(col("o_orderkey"), col("o_totalprice"))
      graft.operators.BloomJoin.prunedInnerJoin(
          fact, dim, "l_orderkey", "o_orderkey", expectedDimRows = 100000L)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("o_totalprice"))
    }),

    // per-group z-score outliers (exact-decimal moments → deterministic IEEE
    // z; see operators.Features.zScoreOutliers).
    "f02_outliers" -> ((s, dir) =>
      graft.operators.Features.zScoreOutliers(
        t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
        "event_type", "value", zThreshold = 2.5)
        .select(col("event_id"), col("event_type"), col("value"), col("z"))),

    // one deterministic k-means Lloyd iteration over the embeddings (8 seed
    // centroids = lowest vec_ids): map-only assignment, exact-decimal mean
    // update — the oracle recomputes the same centroids bit-for-bit. See
    // operators.Clustering.
    "x02_kmeans_step" -> ((s, dir) =>
      graft.operators.Clustering.kmeansStep(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 8)),

    // JL random projection 64 -> 16 dims (Achlioptas +-1 signs from md5
    // parity): a pure narrow map — the sign matrix is literals, zero
    // exchanges at any scale. Exact integer sums, one final IEEE division.
    "x03_random_projection" -> ((s, dir) =>
      graft.operators.Projection.randomProject(
        t(s, dir, "embeddings"), "vec_id", "embedding", dIn = 64, dOut = 16)),

    // per-language length-band filter: drop the shortest 5% and longest 5% of
    // docs within each language — the adaptive length cut of corpus curation
    // (a global cutoff over mixed languages removes the wrong docs; CJK runs
    // short, German long). percent_rank is pure rank arithmetic — exact in
    // any engine. The 100 TB path swaps the in-window rank for broadcast
    // approx-quantile cutoffs (q34's documented pattern); the window form
    // here is the exact-semantics contract that variant is judged against.
    "t11_length_band" -> ((s, dir) => {
      val nWords = bi(length(col("text"))) -
        bi(length(regexp_replace(col("text"), " ", ""))) + lit(1L)
      val w = Window.partitionBy(col("lang")).orderBy(col("n_words"))
      t(s, dir, "documents")
        // null text must not enter the window: Spark ranks NULLS FIRST,
        // DuckDB NULLS LAST — one null would shift every rank in its language
        .where(col("text").isNotNull)
        .select(col("doc_id"), col("lang"), nWords.as("n_words"))
        .withColumn("pr", percent_rank().over(w))
        .where(col("pr") >= 0.05 && col("pr") <= 0.95)
        .select(col("doc_id"), col("lang"), col("n_words"), round(col("pr"), 6).as("pr"))
    }),

    // nested/array surface (§2.6): per-order sorted quantity array consumed
    // with higher-order functions — size, element access, and an exact
    // decimal fold via `aggregate` — all back to scalars (engines format
    // arrays differently; their CONTENT is what is pinned here).
    "q38_array_funcs" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(dec(col("l_quantity")))).as("qs"))
        .select(
          col("l_orderkey"),
          bi(size(col("qs"))).as("n_items"),
          element_at(col("qs"), 1).cast("double").as("min_qty"),
          element_at(col("qs"), -1).cast("double").as("max_qty"),
          aggregate(col("qs"), lit(BigDecimal(0)).cast("decimal(18,2)"),
            (acc, x) => (acc + x).cast("decimal(18,2)")).cast("double").as("sum_qty"),
          bi(size(filter(col("qs"), _ > 25))).as("n_over_25"))),

    // LISTAGG surface (§2.6): ordered string aggregation per group —
    // listagg(expr, sep) WITHIN GROUP (ORDER BY ...) re-expressed as
    // sort_array(collect_list(struct)) + array_join so the concatenation
    // order is deterministic under any partitioning (a bare collect_list
    // would be partition-order-dependent and flake the hash compare).
    "q41_listagg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          array_join(transform(
            array_sort(collect_list(struct(bi(col("l_linenumber")).as("n")))),
            s0 => s0("n").cast("string")), ",").as("line_numbers"),
          count(lit(1)).as("n_lines"))),

    // time-RANGE window frame (§2.5): per-user rolling 7-day totals — the
    // rolling-feature op of a training pipeline. RANGE (not ROWS) frames
    // bound by the ORDER-BY VALUE, so ties and gaps behave identically in
    // any engine; the frame is [t - 7d, t] inclusive on epoch seconds.
    "q42_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
        .rangeBetween(-7L * 86400L, 0L)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"), col("value"))
        .withColumn("n_7d", count(lit(1)).over(w))
        .withColumn("sum_7d", sum(dec(col("value"))).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("ts_s"),
          col("n_7d"), col("sum_7d"))
    }),

    // batch hopping-window aggregation: 1-hour windows every 30 minutes, so
    // each event lands in exactly two windows (Spark's window() generator in
    // batch mode — the batch twin of st01's tumbling stream windows).
    "q40_hopping_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sumd(col("value")).as("value_sum"))
        .select(col("w.start").as("window_start"), col("n_events"),
          col("value_sum"))),

    // map surface (§2.6): per-order map from line number to quantity consumed
    // with element_at / map_keys / map lookup-with-default — outputs are
    // scalars (the oracle computes the same scalars relationally; engines'
    // map literals don't round-trip through parquet identically).
    "q39_map_funcs" -> ((s, dir) =>
      t(s, dir, "lineitem")
        // (order, linenumber) is NOT unique in this lake — pre-aggregate, or
        // map_from_entries throws under the default duplicate-key policy
        .groupBy(col("l_orderkey"), bi(col("l_linenumber")).as("k"))
        .agg(sum(dec(col("l_quantity"))).as("v"))
        .groupBy(col("l_orderkey"))
        .agg(map_from_entries(collect_list(struct(col("k"), col("v")))).as("m"))
        .select(
          col("l_orderkey"),
          bi(size(map_keys(col("m")))).as("n_lines"),
          element_at(col("m"), 1L).cast("double").as("qty_line1"),
          coalesce(element_at(col("m"), 99L).cast("double"), lit(-1.0))
            .as("qty_line99_or_default"),
          bi(array_max(map_keys(col("m")))).as("max_line"))),

    // time-series gap fill: daily counts of rare events (value > 195) per type
    // densified to the full day span x type universe with zero-filled gaps.
    // Raw events aggregate once; the spine join runs on aggregated rows.
    "e03_gap_fill" -> ((s, dir) =>
      graft.operators.TimeSeries.dailyDense(
        t(s, dir, "events").where(col("value") > 195), "ts", "event_type")),

    // weekly retention cohorts: distinct active users per (first-signup date,
    // week offset). Signup aggregate and activity join share the user-key
    // shuffle; the cohort rollup moves only deduplicated triples.
    "e02_retention" -> ((s, dir) =>
      graft.operators.Funnel.retentionCohorts(
        t(s, dir, "events"), "user_id", "ts", "event_type", "signup")),

    // table reconciliation: row-level diff of orders (unique key) vs a
    // deterministically damaged copy (price-bumped keys%1000, deleted
    // keys%997, extra keys%999 re-keyed high). Doubles canonicalize through
    // DECIMAL so the row hash is engine-portable; see operators.Reconcile for
    // the bucket-checksum fast path at 100 TB.
    "v01_reconcile" -> ((s, dir) => {
      def canon(df: DataFrame) = df.select(
        col("o_orderkey"), col("o_custkey"), dec(col("o_totalprice")).as("price"),
        col("o_orderstatus").as("status_c"), col("o_orderpriority").as("pri"))
      val a = canon(t(s, dir, "orders"))
      val b = canon(t(s, dir, "orders")).where(col("o_orderkey") % 997 =!= 0)
        .withColumn("price",
          when(col("o_orderkey") % 1000 === 0, col("price") + 1).otherwise(col("price")))
        .unionByName(canon(t(s, dir, "orders")).where(col("o_orderkey") % 999 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L)))
      graft.operators.Reconcile.diff(a, b,
        Seq("o_orderkey"), Seq("o_custkey", "price", "status_c", "pri"))
    }),

    // snapshot drift (PSI with add-one smoothing) between two halves of the
    // corpus over 50-char length bins: both snapshots collapse to B-row
    // histograms map-side (the corpus never shuffles), ln quantized once per
    // bin, PSI total an exact decimal sum of the quantized terms.
    "v02_drift_psi" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), expr("n_chars div 50").as("len_bin"))
      graft.operators.Drift.psi(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "len_bin")
    }),

    // first-order Markov transition matrix over per-user event sequences:
    // one user-key window shuffle, then K^2 map-side-combined pair counts;
    // p is an exact integer division, row-stochastic per from_type.
    "e04_transitions" -> ((s, dir) =>
      graft.operators.Funnel.transitions(
        t(s, dir, "events"), "user_id", "ts", "event_type", "event_id"))
  )

  /** Shared exact 3-gram-Jaccard pair CTE chain for the d03/d05/d07/d08
    * oracles, in inverted-index form. Exactness-preserving rewrite of the
    * original quadratic `a JOIN b ON a.doc_id < b.doc_id` + `list_intersect`
    * shape: any pair with jaccard > 0 shares at least one shingle, so joining
    * postings on the shingle enumerates a superset of every qualifying pair,
    * and the per-pair count of matched distinct shingles IS
    * `len(list_intersect(a.sh, b.sh))`. `hash(s)` is only a cheap equi-join
    * key — string equality stays in the join condition, so 64-bit collisions
    * cannot inflate the intersection. Near-linear in corpus size where the
    * old form was quadratic (sf1, 50k docs: DuckDB >900s -> ~140s).
    * AS MATERIALIZED is load-bearing under WITH RECURSIVE: without it DuckDB
    * inlines the chain at every reference (d07/d08's edges CTE reads jpairs
    * twice), re-running the expensive cand join per reference. */
  private val jaccardPairCtes: String =
    """docs AS MATERIALIZED (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(words) >= 3
      |         THEN list_transform(range(1, len(words) - 1),
      |                i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
      |         ELSE [] END) AS sh
      |  FROM (SELECT doc_id,
      |          list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS words
      |        FROM documents)
      |), nonempty AS MATERIALIZED (SELECT doc_id, len(sh) AS n_sh FROM docs WHERE len(sh) > 0),
      |inv AS MATERIALIZED (
      |  SELECT doc_id, hash(s) AS h, s
      |  FROM (SELECT doc_id, unnest(sh) AS s FROM docs WHERE len(sh) > 0)),
      |cand AS MATERIALIZED (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM inv a JOIN inv b ON a.h = b.h AND a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id),
      |jpairs AS MATERIALIZED (
      |  SELECT id_a, id_b,
      |    round(CAST(inter AS DOUBLE) / (la.n_sh + lb.n_sh - inter), 6) AS jaccard
      |  FROM cand
      |  JOIN nonempty la ON cand.id_a = la.doc_id
      |  JOIN nonempty lb ON cand.id_b = lb.doc_id
      |  WHERE CAST(inter AS DOUBLE) / (la.n_sh + lb.n_sh - inter) >= 0.4)""".stripMargin

  /** Generated DuckDB mirror of t14's nine Gopher repetition stats (see
    * [[graft.functions.TextRepetition]]): per n, grams by 1-based list slices,
    * the most frequent gram as a struct max over (count, charlen, gram), and
    * dup coverage as the once-per-char union of duplicated-gram windows. */
  private def t14OracleSql: String = {
    import graft.functions.TextRepetition.{dupNs, topNs}
    val allNs = topNs ++ dupNs
    val gs = allNs.map(n =>
      s"CASE WHEN m >= $n THEN list_transform(range(1, m-$n+2), i -> array_to_string(tk[i:i+${n - 1}], ' ')) END AS gs$n")
      .mkString(",\n    ")
    val best = topNs.map(n =>
      s"CASE WHEN m >= $n THEN list_max(list_transform(list_distinct(gs$n), x -> {'c': CAST(len(list_filter(gs$n, y -> y = x)) AS BIGINT), 'l': CAST(length(x) - ${n - 1} AS BIGINT), 'g': x})) END AS best$n")
    val starts = dupNs.map(n =>
      s"CASE WHEN m >= $n THEN list_filter(range(1, m-$n+2), i -> len(list_filter(gs$n, y -> y = gs$n[i])) > 1) END AS starts$n")
    val top = topNs.map(n =>
      s"CASE WHEN best$n IS NULL THEN 0.0 ELSE CAST(struct_extract(best$n, 'c') * struct_extract(best$n, 'l') AS DOUBLE) / total END AS top${n}_char_frac")
    val dup = dupNs.map(n =>
      s"CASE WHEN starts$n IS NULL THEN 0.0 ELSE CAST(COALESCE(list_sum(list_transform(range(1, m+1), j -> CASE WHEN len(list_filter(starts$n, s -> s <= j AND j <= s + ${n - 1})) > 0 THEN length(tk[j]) ELSE 0 END)), 0) AS DOUBLE) / total END AS dup${n}_char_frac")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '') AS tk
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, tk, len(tk) AS m,
       |    COALESCE(CAST(list_sum(list_transform(tk, t -> length(t))) AS BIGINT), 0) AS total
       |  FROM toks),
       |g AS (
       |  SELECT *,
       |    $gs
       |  FROM base),
       |b AS (
       |  SELECT *,
       |    ${(best ++ starts).mkString(",\n    ")}
       |  FROM g)
       |SELECT doc_id,
       |  ${(top ++ dup).mkString(",\n  ")}
       |FROM b""".stripMargin
  }

  /** DuckDB oracle SQL per SQL-expressible query; same column names and the same
    * exact-decimal aggregation so values hash identically. */
  def oracleSql: Map[String, String] = Map(
    "q01_filter_sort" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_partkey,
        |  l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-12-31'
        |ORDER BY l_shipdate DESC, l_orderkey, l_linenumber""".stripMargin,
    "q02_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_join_multiway" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q05_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q06_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q07_setops" ->
      """SELECT 'both' AS tag, nk FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |  INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
        |UNION ALL
        |SELECT 'cust_only' AS tag, nk FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |  EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)""".stripMargin,
    "q08_semi_anti" ->
      """SELECT n_name, count(*) AS n_customers,
        |  count(o.o_custkey) AS with_orders,
        |  count(*) - count(o.o_custkey) AS without_orders
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o ON c.c_custkey = o.o_custkey
        |GROUP BY n_name""".stripMargin,
    "q09_scalar_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_upper,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substring(p_type, 1, 3) AS type_prefix,
        |  p_brand || '#' || p_type AS brand_type,
        |  CAST(p_size % 5 AS BIGINT) AS size_mod,
        |  CAST(abs(p_size - 25) AS BIGINT) AS size_dist,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor
        |FROM part""".stripMargin,
    "q10_cleansing" ->
      """SELECT c_custkey,
        |  NULLIF(TRIM(c_name), '') AS c_name,
        |  CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  c_acctbal,
        |  NULLIF(TRIM(c_mktsegment), '') AS c_mktsegment
        |FROM customer""".stripMargin,
    "q11_format_mask" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  CASE WHEN o_orderpriority IS NOT NULL
        |       THEN '***' || right(o_orderpriority, 4) END AS o_orderpriority
        |FROM orders""".stripMargin,
    "q12_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q13_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 12""".stripMargin,
    "q14_conditional_agg" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "q15_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q16_events_daily" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY CAST(ts AS DATE), event_type""".stripMargin,
    "q17_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q18_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice * (SELECT count(*) FROM orders)
        |      > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         FROM orders)""".stripMargin,
    "q19_corr_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE c_acctbal * (SELECT count(*) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |      > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin,
    "q20_pipeline_trades" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_partkey,
        |  l_quantity, l_extendedprice, TRIM(l_returnflag) AS l_returnflag, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-12-31'""".stripMargin,
    "q21_outer_join" ->
      """SELECT COALESCE(c.nk, s.nk) AS nk, COALESCE(c.n_cust, 0) AS n_cust,
        |  COALESCE(s.n_supp, 0) AS n_supp
        |FROM (SELECT CAST(c_nationkey AS BIGINT) AS nk, count(*) AS n_cust
        |      FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT CAST(s_nationkey AS BIGINT) AS nk, count(*) AS n_supp
        |                 FROM supplier GROUP BY 1) s ON c.nk = s.nk""".stripMargin,
    "q22_cube" ->
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderpriority)""".stripMargin,
    "q23_grouping_sets" ->
      """SELECT r_name, n_name, count(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name), ())""".stripMargin,
    "q24_in_exists" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c_custkey
        |                    AND o2.o_orderstatus = 'F')""".stripMargin,
    "q25_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
        |    AS days_since,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders""".stripMargin,
    "q26_string_funcs" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  regexp_replace(p_type, 'A', '@', 'g') AS type_sub,
        |  reverse(p_brand) AS brand_rev,
        |  split_part(p_brand, '#', 2) AS brand_num,
        |  p_name LIKE '%5%' AS has_five,
        |  CAST(strpos(p_name, 'a') AS BIGINT) AS first_a
        |FROM part""".stripMargin,
    "q27_explode_words" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word""".stripMargin,
    "q28_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 200000 THEN 'medium'
        |            ELSE 'large' END AS bucket, count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "q29_window_suite" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  lag(o_orderkey, 1) OVER w AS prev_order,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    // salted join result == plain equi-join result, by construction.
    "o02_salted_join" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_extendedprice, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "q34_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS median_price,
        |  quantile_cont(o_totalprice, 0.9) AS p90_price,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    // q43/t12: the sketch's rank-error guarantee holds unconditionally, so
    // the oracle states the bound checks as literal truth; n pins that the
    // right rows fed the sketch.
    "q43_approx_percentile" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(1 AS INTEGER) AS p50_in_bound,
        |  CAST(1 AS INTEGER) AS p90_in_bound
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "t12_approx_cutoffs" ->
      """SELECT lang, count(*) AS n,
        |  CAST(1 AS INTEGER) AS lo_in_bound,
        |  CAST(1 AS INTEGER) AS hi_in_bound
        |FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        |GROUP BY lang""".stripMargin,
    // day - dense_rank is constant within a consecutive run and unique across
    // runs; both engines compute it over identical (user, day) sets.
    "q44_gaps_islands" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |    CAST(ts AS DATE) - DATE '1970-01-01' AS day
        |  FROM events),
        |g AS (
        |  SELECT user_id, day,
        |    day - dense_rank() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM d)
        |SELECT user_id, min(day) AS streak_start_day, count(*) AS n_days
        |FROM g GROUP BY user_id, grp""".stripMargin,
    "q45_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  CAST(1 AS INTEGER) AS in_bound
        |FROM events GROUP BY event_type""".stripMargin,
    // the oracle's global cumulative window equals the operator's distributed
    // range-cumsum + offsets; `//` and `div` both floor on non-negatives.
    "t13_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS w FROM documents),
        |c AS (
        |  SELECT doc_id, w,
        |    sum(w) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    (SELECT sum(w) FROM w) AS total
        |  FROM w)
        |SELECT doc_id FROM c
        |WHERE (cum * 50) // total > ((cum - w) * 50) // total""".stripMargin,
    "q35_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS "AUTOMOBILE",
        |  count(*) FILTER (c_mktsegment = 'BUILDING') AS "BUILDING",
        |  count(*) FILTER (c_mktsegment = 'FURNITURE') AS "FURNITURE",
        |  count(*) FILTER (c_mktsegment = 'HOUSEHOLD') AS "HOUSEHOLD",
        |  count(*) FILTER (c_mktsegment = 'MACHINERY') AS "MACHINERY"
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q36_unpivot" ->
      """SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part""".stripMargin,
    "q32_column_mapping" ->
      """SELECT s_suppkey AS supplier_id, s_name AS supplier_name,
        |  s_acctbal AS balance, CAST(s_nationkey AS BIGINT) AS nation_id
        |FROM supplier""".stripMargin,
    "q33_null_sentinels" ->
      """SELECT c_custkey, COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(total_spent, CAST(0 AS DOUBLE)) AS total_spent
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, count(*) AS n_orders,
        |             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |               AS total_spent
        |           FROM orders GROUP BY 1) o ON c_custkey = o_custkey""".stripMargin,
    "o01_asof_join" ->
      """WITH purchases AS (
        |  SELECT event_id AS purchase_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_id FROM events
        |  WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.purchase_id, p.user_id,
        |  CAST(floor(epoch(p.ts)) AS BIGINT) AS ts_s,
        |  c.click_id,
        |  CAST(floor(epoch(c.ts)) AS BIGINT) AS click_ts_s
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    // q30/q31 extract lake `customer` data back out of an embedded RDBMS; the
    // oracle is the same predicate on the original parquet table.
    "q30_jdbc_extract" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal >= 1000",
    "q31_jdbc_proc" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal >= 1000",
    "q37_jdbc_partitioned" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer",
    // Append-mode streaming emits exactly the watermark-closed windows:
    // window end <= max(ts) - 2h (the final watermark after AvailableNow's
    // no-data flush batch). The batch equivalent restricts to those windows.
    "st01_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
        |      <= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
        |GROUP BY 1, 2""".stripMargin,
    // q40's hop expansion (each event in the aligned 30-min bucket's window
    // and the one 30 min earlier) + st01's finalization cut, on 1-h windows.
    "st09_stream_hopping" ->
      """WITH x AS (
        |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start,
        |    event_type, value FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE,
        |    event_type, value FROM events)
        |SELECT window_start, event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM x
        |WHERE window_start + INTERVAL 1 HOUR
        |      <= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
        |GROUP BY 1, 2""".stripMargin,
    // st10: st01's finalization cut, then the v02 PSI construction per
    // window — integer counts, IEEE divisions, ln quantized at 1e-9, exact
    // decimal total. The other bin's count is n_events minus the known sum.
    "st10_stream_drift" ->
      """WITH ref AS (
        |  SELECT event_type, count(*) AS rn FROM events GROUP BY 1),
        |rt AS (
        |  SELECT CAST(sum(rn) AS BIGINT) AS refn, count(*) + 1 AS b FROM ref),
        |w AS (
        |  SELECT date_trunc('hour', ts) AS window_start, event_type
        |  FROM events
        |  WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
        |        <= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR),
        |cur AS (SELECT window_start, count(*) AS n_events FROM w GROUP BY 1),
        |counts AS (
        |  SELECT window_start, event_type, count(*) AS n FROM w GROUP BY 1, 2),
        |grid AS (
        |  SELECT c.window_start, c.n_events, r.rn, coalesce(k.n, 0) AS n
        |  FROM cur c CROSS JOIN ref r
        |  LEFT JOIN counts k ON k.window_start = c.window_start
        |                    AND k.event_type = r.event_type),
        |known AS (SELECT window_start, sum(n) AS kn FROM grid GROUP BY 1),
        |bins AS (
        |  SELECT window_start, n_events, rn, n FROM grid
        |  UNION ALL
        |  SELECT c.window_start, c.n_events, 0 AS rn,
        |    c.n_events - k.kn AS n
        |  FROM cur c JOIN known k USING (window_start)),
        |terms AS (
        |  SELECT window_start, n_events,
        |    round((rp - cp) * round(ln(rp / cp), 9), 9) AS term
        |  FROM (SELECT window_start, n_events,
        |          CAST(rn + 1 AS DOUBLE) / (refn + b) AS rp,
        |          CAST(n + 1 AS DOUBLE) / (n_events + b) AS cp
        |        FROM bins, rt))
        |SELECT window_start, n_events,
        |  CAST(sum(CAST(term AS DECIMAL(20,9))) AS DOUBLE) AS psi
        |FROM terms GROUP BY 1, 2""".stripMargin,
    "st05_stream_dedup" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |FROM events""".stripMargin,
    "st06_stream_ingest" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |FROM events""".stripMargin,
    "i01_incremental" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |FROM events""".stripMargin,
    // i03: a doc survives iff no doc in an EARLIER batch (batch = doc_id%3,
    // processed in order) shares its normalized text — the d12 anti-join
    // contract replayed over the materialized index.
    "i03_fingerprint_index" ->
      """SELECT b.doc_id, b.doc_id % 3 AS batch
        |FROM documents b
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents h
        |  WHERE h.doc_id % 3 < b.doc_id % 3
        |    AND regexp_replace(lower(trim(h.text)), '\s+', ' ', 'g') =
        |        regexp_replace(lower(trim(b.text)), '\s+', ' ', 'g'))""".stripMargin,
    // `div` (Spark) and `//` (DuckDB) both floor for non-negative operands;
    // plain `/` would be double division with engine-specific cast rounding.
    "i02_schema_evolution" ->
      """SELECT doc_id, source,
        |  CASE WHEN doc_id < (SELECT max(doc_id) // 2 FROM documents)
        |       THEN NULL ELSE lang END AS lang
        |FROM documents""".stripMargin,
    // global latest-per-user with delete-wins-on-tie, errors as deletes —
    // equal to the batch-folded snapshot because per-key max is associative.
    "st07_stream_upsert" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC,
        |      (event_type = 'error') DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "p01_profile" ->
      """SELECT 'c_custkey' AS col_name, count(*) AS n_rows,
        |  count(c_custkey) AS n_nonnull, count(DISTINCT c_custkey) AS n_distinct,
        |  CAST(min(c_custkey) AS VARCHAR) AS min_s, CAST(max(c_custkey) AS VARCHAR) AS max_s
        |FROM customer
        |UNION ALL
        |SELECT 'c_name', count(*), count(c_name), count(DISTINCT c_name),
        |  CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR) FROM customer
        |UNION ALL
        |SELECT 'c_mktsegment', count(*), count(c_mktsegment), count(DISTINCT c_mktsegment),
        |  CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR) FROM customer
        |UNION ALL
        |SELECT 'c_nationkey', count(*), count(c_nationkey), count(DISTINCT c_nationkey),
        |  CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR) FROM customer""".stripMargin,
    "st04_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |  CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT) AS gap_s
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts""".stripMargin,
    // batch left join under the same watermark-safe cutoff.
    "st08_stream_outer_join" ->
      """WITH mx AS (SELECT max(ts) - INTERVAL 3 HOUR AS cutoff FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
        |      FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts AS c_ts
        |      FROM events WHERE event_type = 'click')
        |SELECT p.purchase_id, c.click_id
        |FROM p CROSS JOIN mx LEFT JOIN c
        |  ON p.user_id = c.user_id
        | AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR AND c.c_ts <= p.p_ts
        |WHERE p.p_ts < mx.cutoff""".stripMargin,
    "st03_stream_enrich" ->
      """SELECT event_id, user_id, event_type, c_mktsegment,
        |  CAST(c_nationkey AS BIGINT) AS c_nationkey
        |FROM events JOIN customer ON user_id = c_custkey""".stripMargin,
    // The event_id tiebreak makes the two window clauses share ONE total
    // order. Without it the oracle itself is nondeterministic under
    // (user_id, ts) ties: DuckDB may sort the lag window and the running-sum
    // window with different tie orders, so a session-opening flag computed on
    // the first row of a tie run can land mid-run in the other window's
    // order, splitting the run across two sessions (run-to-run row counts
    // even differ). Ties never occur at sf0.01/sf0.1 but dominate the sf1
    // fixture (10 same-ts copies per event). The engine needs no tiebreak:
    // Spark evaluates both functions over the same sorted partition stream,
    // so tie runs stay whole whatever order the sort picks.
    "st02_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, value, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |flagged AS (
        |  SELECT user_id, value, event_id, ts_s,
        |    CASE WHEN lag(ts_s) OVER w IS NULL OR ts_s - lag(ts_s) OVER w > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |sessions AS (
        |  SELECT user_id, value, ts_s,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM flagged)
        |SELECT user_id, min(ts_s) AS session_start_s, max(ts_s) AS session_end_s,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM sessions GROUP BY user_id, session_id""".stripMargin,
    "d01_dedup_exact" ->
      "SELECT text, min(doc_id) AS keep_id, count(*) AS dup_count FROM documents GROUP BY text",
    // d02's Spark plan groups by xxhash64(normalized text); the oracle groups by
    // the normalized text itself — identical groups absent 64-bit collisions.
    "d02_dedup_fingerprint" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents
        |GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')""".stripMargin,
    // d03: every reported pair is exact-Jaccard-verified, so output ⊆ all-pairs
    // Jaccard >= 0.4; 16-band/4-row MinHash banding has empirically total recall
    // on this corpus at driver-gate scale (25/25 qualifying pairs at sf0.01),
    // making the exact-pairs oracle exact here. Analytically recall at pair
    // similarity s is 1-(1-s^4)^16 (~0.97 at s=0.67, ->1 above 0.85), so at
    // larger SFs the engine's output is a measured-recall SUBSET of this
    // oracle — see CORRECTNESS_sf1_full_r08.json notes.
    "d03_minhash_pairs" ->
      ("WITH " + jaccardPairCtes + "\nSELECT id_a, id_b, jaccard FROM jpairs"),
    // d05: at sf0.01 maxDocFreq (1000) exceeds the corpus (500 docs), so the
    // inverted-index prune is inactive and the output equals all-pairs exact
    // 3-gram Jaccard >= 0.4 (still true at sf1: max shingle docfreq 250).
    "d05_ngram_jaccard" ->
      ("WITH " + jaccardPairCtes + "\nSELECT id_a, id_b, jaccard FROM jpairs"),
    // d07: recompute d05's exact pair list, then resolve components with a
    // recursive reachability CTE (min reachable id = cluster id). Tractable
    // because near-dup components are tiny at verify scale.
    // d07's reachability CTE + t01's quality formula; survivor = row_number 1
    // by (quality DESC, doc_id).
    "d08_quality_survivors" ->
      ("WITH RECURSIVE " + jaccardPairCtes + ",\n" +
      """edges AS MATERIALIZED (
        |  SELECT id_a AS u, id_b AS v FROM jpairs
        |  UNION SELECT id_b, id_a FROM jpairs
        |), reach(u, v) AS (
        |  SELECT u, v FROM edges UNION SELECT u, u FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        |), labels AS (
        |  SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
        |sized AS (
        |  SELECT doc_id, cluster_id,
        |    count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |  FROM labels),
        |qf AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS toks,
        |    CAST(length(text) AS BIGINT) AS n_chars, text
        |  FROM documents),
        |qg AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in',
        |      'is','are','was','on','for','with','as','at','by','it','this','that')))
        |      AS DOUBLE) AS n_stop,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_letters,
        |    CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
        |    n_chars
        |  FROM qf),
        |quality AS (
        |  SELECT doc_id, round(
        |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4 +
        |    least((CASE WHEN n_tokens = 0 THEN 0.0 ELSE n_stop / n_tokens END) * 5.0, 1.0)
        |      * 0.3 +
        |    greatest(0.0, 1.0 - (CASE WHEN n_chars = 0 THEN 0.0
        |      ELSE CAST(n_punct AS DOUBLE) / n_chars END) * 4.0) * 0.2 +
        |    greatest(0.0, 1.0 - (CASE WHEN n_letters = 0 THEN 0.0
        |      ELSE CAST(n_upper AS DOUBLE) / n_letters END)) * 0.1,
        |    6) AS quality
        |  FROM qg)
        |SELECT cluster_id, doc_id AS survivor_id, quality, cluster_size FROM (
        |  SELECT s.cluster_id, s.doc_id, q.quality, s.cluster_size,
        |    row_number() OVER (PARTITION BY s.cluster_id
        |      ORDER BY q.quality DESC, s.doc_id) AS rn
        |  FROM sized s JOIN quality q ON s.doc_id = q.doc_id) t
        |WHERE rn = 1""".stripMargin),
    "t09_sequence_pack" ->
      """SELECT doc_id, source, n_tokens,
        |  CAST(floor(cum_before / 512.0) AS BIGINT) AS pack_id,
        |  cum_before % 512 AS pack_offset
        |FROM (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
        |  FROM (
        |    SELECT doc_id, source,
        |      CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        t -> t <> '')) AS BIGINT) AS n_tokens
        |    FROM documents))""".stripMargin,
    "d07_dedup_clusters" ->
      ("WITH RECURSIVE " + jaccardPairCtes + ",\n" +
      """edges AS MATERIALIZED (
        |  SELECT id_a AS u, id_b AS v FROM jpairs
        |  UNION SELECT id_b, id_a FROM jpairs
        |), reach(u, v) AS (
        |  SELECT u, v FROM edges UNION SELECT u, u FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        |), labels AS (
        |  SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM labels""".stripMargin),
    "s01_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.qv, c.embedding) /
        |      (sqrt(list_dot_product(q.qv, q.qv))
        |       * sqrt(list_dot_product(c.embedding, c.embedding))) AS cos
        |  FROM q JOIN embeddings c ON c.vec_id <> q.query_id)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    // d06: the 24-table LSH measures total recall on this corpus, so the exact
    // all-pairs cosine filter is the oracle (ids only; see the query comment).
    "d06_embedding_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.embedding, b.embedding) /
        |      (sqrt(list_dot_product(a.embedding, a.embedding))
        |       * sqrt(list_dot_product(b.embedding, b.embedding))) >= 0.45""".stripMargin,
    // s02: total top-5 recall at the verify-scale LSH budget → brute-force oracle.
    "s02_ann_lsh" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.qv, c.embedding) /
        |      (sqrt(list_dot_product(q.qv, q.qv))
        |       * sqrt(list_dot_product(c.embedding, c.embedding))) AS cos
        |  FROM q JOIN embeddings c ON c.vec_id <> q.query_id)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    // s03 probes every cell at verify scale → exact top-k, same oracle as s01.
    "s03_ann_ivf" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.qv, c.embedding) /
        |      (sqrt(list_dot_product(q.qv, q.qv))
        |       * sqrt(list_dot_product(c.embedding, c.embedding))) AS cos
        |  FROM q JOIN embeddings c ON c.vec_id <> q.query_id)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    "t04_pii_redact" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') AS clean_text
        |FROM documents""".stripMargin,
    "t05_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS tk,
        |    list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS words
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN len(tk) = 0 THEN 0.0
        |       ELSE 1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)
        |  END AS dup_token_frac,
        |  CASE WHEN len(tk) = 0 THEN 0.0
        |       ELSE CAST(list_max(list_transform(list_distinct(tk),
        |              t -> len(list_filter(tk, x -> x = t)))) AS DOUBLE) / len(tk)
        |  END AS top_token_frac,
        |  CASE WHEN len(words) < 2 THEN 0.0
        |       ELSE 1.0 - CAST(len(list_distinct(
        |              list_transform(range(1, len(words)),
        |                i -> words[i] || ' ' || words[i+1]) )) AS DOUBLE)
        |            / (len(words) - 1)
        |  END AS dup_bigram_frac
        |FROM toks""".stripMargin,
    // generated per-n mirror of the compiled TextRepetition pass: same token
    // def as t05, same (count, charlen, gram) max tie-break, same count-each-
    // char-once coverage union. O(m^2) list lambdas are fine at oracle scale;
    // the Spark side is the O(m) hash-map pass.
    "t14_ngram_repetition" -> t14OracleSql,
    // Exact mirror of operators.SemDedup: same 1e6 quantization, same
    // squared-L2 argmin (ties to lowest seed index), same cosine built from
    // IEEE-basic ops on exact-integer inputs — bit-identical by construction,
    // so this oracle holds EXACTLY at every scale (no approx gate).
    "d11_semdedup" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> round(CAST(x AS DOUBLE) * 1000000.0)) AS qv
        |  FROM embeddings),
        |qn AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS n2 FROM q),
        |seeds AS (
        |  SELECT qv AS sv, n2 AS sn2,
        |    row_number() OVER (ORDER BY vec_id) - 1 AS seed_idx
        |  FROM (SELECT vec_id, qv, n2 FROM qn ORDER BY vec_id LIMIT 16)),
        |assigned AS (
        |  SELECT vec_id, qv, n2, cluster FROM (
        |    SELECT e.vec_id, e.qv, e.n2, s.seed_idx AS cluster,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY e.n2 + s.sn2 - 2.0 * list_dot_product(e.qv, s.sv),
        |                 s.seed_idx) AS rn
        |    FROM qn e CROSS JOIN seeds s) WHERE rn = 1),
        |removed AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM assigned a JOIN assigned b
        |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  WHERE a.n2 > 0 AND b.n2 > 0
        |    AND list_dot_product(a.qv, b.qv) / (sqrt(a.n2) * sqrt(b.n2)) >= 0.45)
        |SELECT a.vec_id, a.cluster, r.vec_id IS NULL AS kept
        |FROM assigned a LEFT JOIN removed r ON a.vec_id = r.vec_id""".stripMargin,
    // d12: the bloom stage is lossless (no false negatives; false positives
    // die in the exact confirm join), so the oracle is the plain anti-join
    // on d02's normalized-text key.
    "d12_incremental_dedup" ->
      """SELECT b.doc_id, b.n_chars
        |FROM documents b
        |WHERE b.doc_id % 3 = 0
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents h
        |    WHERE h.doc_id % 2 = 0
        |      AND regexp_replace(lower(trim(h.text)), '\s+', ' ', 'g') =
        |          regexp_replace(lower(trim(b.text)), '\s+', ' ', 'g'))""".stripMargin,
    // same tokenization as t02/x01 (space-split, empties dropped); the model
    // log-prob is quantized at 1e-9 per DISTINCT bigram and the per-doc mean
    // sums exact decimals, so engine ln() disagreement is confined to
    // vocabulary²-many rounding calls, independent of corpus size.
    // t22: multinomial NB over char 3-grams of the d02-normalized text.
    // Counts are exact integers; each ln is rounded once at 1e-9 per MODEL
    // row (L×V + 2L sites, corpus-independent); per-doc sums run as exact
    // decimals; argmax ties break to the smallest language (rn ordering).
    "t22_language_id" ->
      """WITH lt AS (
        |  SELECT lang, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |  FROM documents WHERE doc_id % 5 <> 0),
        |ltg AS (SELECT lang, t FROM lt WHERE length(t) >= 3),
        |lg AS (
        |  SELECT lang, substr(t, CAST(i AS INT), 3) AS g
        |  FROM (SELECT lang, t, unnest(range(1, length(t) - 1)) AS i
        |        FROM ltg)),
        |counts AS (SELECT lang, g, count(*) AS c FROM lg GROUP BY 1, 2),
        |totals AS (SELECT lang, count(*) AS tot FROM lg GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT g) AS v FROM lg),
        |dpl AS (SELECT lang, count(*) AS nl FROM ltg GROUP BY 1),
        |nd AS (SELECT count(*) AS n FROM ltg),
        |stats AS (
        |  SELECT t.lang,
        |    CAST(round(ln(CAST(d.nl AS DOUBLE) / n.n), 9)
        |      AS DECIMAL(20,9)) AS prior,
        |    CAST(round(ln(1.0 / CAST(t.tot + v.v AS DOUBLE)), 9)
        |      AS DECIMAL(20,9)) AS miss
        |  FROM totals t JOIN dpl d ON t.lang = d.lang
        |  CROSS JOIN vocab v CROSS JOIN nd n),
        |model AS (
        |  SELECT c.lang, c.g,
        |    CAST(round(ln((c.c + 1.0) / CAST(t.tot + v.v AS DOUBLE)), 9)
        |      AS DECIMAL(20,9)) AS lp
        |  FROM counts c JOIN totals t ON c.lang = t.lang CROSS JOIN vocab v),
        |dg AS (
        |  SELECT doc_id, substr(t, CAST(i AS INT), 3) AS g
        |  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 1)) AS i
        |        FROM (SELECT doc_id,
        |                regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |              FROM documents WHERE doc_id % 5 = 0)
        |        WHERE length(t) >= 3)),
        |sums AS (
        |  SELECT dg.doc_id, s.lang, sum(coalesce(m.lp, s.miss)) AS gsum
        |  FROM dg CROSS JOIN stats s
        |  LEFT JOIN model m ON m.lang = s.lang AND m.g = dg.g
        |  GROUP BY 1, 2),
        |fin AS (
        |  SELECT s.doc_id, s.lang, st.prior + s.gsum AS sc,
        |    row_number() OVER (PARTITION BY s.doc_id
        |                       ORDER BY st.prior + s.gsum DESC, s.lang ASC)
        |      AS rn
        |  FROM sums s JOIN stats st ON s.lang = st.lang)
        |SELECT doc_id, lang AS lang_pred, round(CAST(sc AS DOUBLE), 6) AS score
        |FROM fin WHERE rn = 1""".stripMargin,
    // t23: the same page construction, block split, tag strip, anchor
    // extraction and integer density rules in SQL; per-block rows via
    // range-unnest (the t21 convention), reassembly via string_agg ORDER BY
    // block position. All comparisons integer-exact.
    "t23_boilerplate" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><body><nav><a href="/">home</a> <a href="/a">about</a> ' ||
        |    '<a href="/c">contact</a></nav><p>' || text ||
        |    '</p><div class="foot"><a href="/t">terms</a> ' ||
        |    '<a href="/p">privacy</a> all rights reserved</div>' ||
        |    '</body></html>' AS html
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, string_split_regex(html,
        |    '(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|hr|blockquote|pre|section|article|header|footer|nav|aside|main|form|html|body|head|title)[^>]*>')
        |    AS arr
        |  FROM h),
        |blk AS (
        |  SELECT doc_id, i, arr[i] AS raw
        |  FROM (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS i
        |        FROM b)),
        |st AS (
        |  SELECT doc_id, i,
        |    trim(regexp_replace(regexp_replace(raw, '(?s)<[^>]*>', ' ', 'g'),
        |                        '\s+', ' ', 'g')) AS txt,
        |    trim(regexp_replace(regexp_replace(
        |      coalesce(array_to_string(
        |        regexp_extract_all(raw, '(?is)<a[^>]*>(.*?)</a>', 1), ' '), ''),
        |      '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS ltxt
        |  FROM blk),
        |w AS (
        |  SELECT doc_id, i, txt,
        |    CASE WHEN txt = '' THEN 0
        |         ELSE len(string_split(txt, ' ')) END AS w,
        |    CAST(length(txt) AS BIGINT) AS c,
        |    CASE WHEN ltxt = '' THEN 0
        |         ELSE len(string_split(ltxt, ' ')) END AS lw
        |  FROM st),
        |k AS (
        |  SELECT doc_id, i, txt,
        |    (w >= 5 AND 3 * lw <= w
        |       AND w >= 7 * CAST(floor((c + 79) / 80.0) AS BIGINT)) AS kept
        |  FROM w WHERE w >= 1)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
        |    AS content_blocks,
        |  CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
        |    AS boiler_blocks,
        |  coalesce(string_agg(CASE WHEN kept THEN txt END, ' ' ORDER BY i),
        |           '') AS extracted_text
        |FROM k GROUP BY doc_id""".stripMargin,
    "t15_lm_perplexity" ->
      """WITH docs2 AS (
        |  SELECT doc_id, ws FROM (
        |    SELECT doc_id,
        |      list_filter(string_split(text, ' '), t -> t <> '') AS ws
        |    FROM documents)
        |  WHERE len(ws) >= 2),
        |bigrams AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM (
        |    SELECT doc_id, ws,
        |      unnest(generate_series(1, len(ws) - 1)) AS i
        |    FROM docs2)),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY 1, 2),
        |uni AS (SELECT w1, count(*) AS c1 FROM bigrams GROUP BY 1),
        |v AS (SELECT count(DISTINCT w) AS v
        |      FROM (SELECT unnest(ws) AS w FROM docs2)),
        |model AS (
        |  SELECT w1, w2,
        |    round(ln((c12 + 1.0) / CAST(c1 + v AS DOUBLE)), 9) AS lp
        |  FROM big JOIN uni USING (w1) CROSS JOIN v),
        |scored AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    round(CAST(sum(CAST(lp AS DECIMAL(20,9))) AS DOUBLE) / count(*), 6)
        |      AS avg_logprob
        |  FROM bigrams JOIN model USING (w1, w2) GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, avg_logprob, round(exp(-avg_logprob), 3) AS ppl
        |FROM scored""".stripMargin,
    // t25: the same URL construction, the same three anchored regexes
    // (Java∩RE2), the same rule precedence in a CASE.
    "t25_url_filter" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://www.' || source || '-' || CAST(doc_id % 50 AS VARCHAR)
        |    || '.' ||
        |    (CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |          WHEN 2 THEN 'net' ELSE 'xyz' END) ||
        |    (CASE WHEN doc_id % 11 = 0 THEN '/private' ELSE '/docs' END) ||
        |    '/page-' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    regexp_extract(lower(url), '^[a-z]+://([^/]+)', 1) AS host,
        |    regexp_extract(lower(url), '^[a-z]+://[^/]+(/.*)?$', 1) AS path
        |  FROM u),
        |p2 AS (
        |  SELECT doc_id, host, path,
        |    regexp_extract(host, '\.([a-z]+)$', 1) AS tld
        |  FROM p),
        |bl AS (SELECT DISTINCT host FROM p2 WHERE doc_id % 97 = 0),
        |f AS (
        |  SELECT p2.doc_id, p2.host, p2.tld,
        |    CASE WHEN p2.host = '' THEN 'unparseable'
        |         WHEN b.host IS NOT NULL THEN 'host'
        |         WHEN p2.host LIKE '%-22.net' THEN 'host_suffix'
        |         WHEN p2.tld = 'xyz' THEN 'tld'
        |         WHEN regexp_matches(p2.path, '^/private(/|$)') THEN 'path'
        |    END AS block_reason
        |  FROM p2 LEFT JOIN bl b ON b.host = p2.host)
        |SELECT doc_id, host, tld,
        |  CAST(block_reason IS NULL AS INT) AS kept, block_reason
        |FROM f""".stripMargin,
    // t24: the KN recursion evaluated with the IDENTICAL expression tree as
    // the engine (same parenthesization, same integer->double promotions,
    // D = 0.75 binary-exact), ln quantized once per distinct trigram.
    "t24_kn_trigram_lm" ->
      """WITH docs3 AS (
        |  SELECT doc_id, ws FROM (
        |    SELECT doc_id,
        |      list_filter(string_split(text, ' '), t -> t <> '') AS ws
        |    FROM documents)
        |  WHERE len(ws) >= 3),
        |tris AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3 FROM (
        |    SELECT doc_id, ws,
        |      unnest(generate_series(1, len(ws) - 2)) AS i
        |    FROM docs3)),
        |c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tris GROUP BY 1, 2, 3),
        |ctx AS (SELECT w1, w2, sum(c3) AS c2, count(*) AS n3
        |        FROM c3 GROUP BY 1, 2),
        |t2 AS (SELECT w2, w3, count(*) AS t23 FROM c3 GROUP BY 1, 2),
        |mid AS (SELECT w2, count(*) AS midc FROM c3 GROUP BY 1),
        |ty2 AS (SELECT w2, count(*) AS ty2 FROM t2 GROUP BY 1),
        |uni AS (SELECT w3, count(*) AS u FROM t2 GROUP BY 1),
        |tot AS (SELECT count(*) AS tt FROM t2),
        |model AS (
        |  SELECT c.w1, c.w2, c.w3,
        |    CAST(round(ln(
        |      (greatest(CAST(c.c3 AS DOUBLE) - 0.75, 0.0) +
        |       0.75 * x.n3 *
        |         ((greatest(CAST(b.t23 AS DOUBLE) - 0.75, 0.0) +
        |           0.75 * y.ty2 * (CAST(un.u AS DOUBLE) / t.tt)) / m.midc))
        |      / x.c2), 9) AS DECIMAL(20,9)) AS lp
        |  FROM c3 c
        |  JOIN ctx x ON x.w1 = c.w1 AND x.w2 = c.w2
        |  JOIN t2 b ON b.w2 = c.w2 AND b.w3 = c.w3
        |  JOIN mid m ON m.w2 = c.w2
        |  JOIN ty2 y ON y.w2 = c.w2
        |  JOIN uni un ON un.w3 = c.w3
        |  CROSS JOIN tot t),
        |scored AS (
        |  SELECT doc_id, count(*) AS n_trigrams,
        |    round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logprob
        |  FROM tris JOIN model USING (w1, w2, w3) GROUP BY doc_id)
        |SELECT doc_id, n_trigrams, avg_logprob,
        |  round(exp(-avg_logprob), 3) AS ppl
        |FROM scored""".stripMargin,
    // same tokenization as t15; gram buckets via the portable 60-bit md5 hash
    // (d04's oracle convention); per-DISTINCT-bucket log-ratio quantized at
    // 1e-9 (2B ln calls total, corpus-independent), per-doc integer-count x
    // quantized-ratio products summed as exact decimals, rounded at 6.
    "t16_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, ws FROM (
        |    SELECT doc_id,
        |      list_filter(string_split(text, ' '), t -> t <> '') AS ws
        |    FROM documents)
        |  WHERE len(ws) >= 1),
        |grams AS (
        |  SELECT doc_id, unnest(ws) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g FROM (
        |    SELECT doc_id, ws,
        |      unnest(generate_series(1, len(ws) - 1)) AS i
        |    FROM toks WHERE len(ws) >= 2)),
        |gb AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 1024 AS bucket
        |  FROM grams),
        |tgt AS (SELECT bucket, count(*) AS ct FROM gb
        |        WHERE doc_id % 97 = 0 GROUP BY 1),
        |raws AS (SELECT bucket, count(*) AS cr FROM gb GROUP BY 1),
        |nt AS (SELECT count(*) AS nt FROM gb WHERE doc_id % 97 = 0),
        |nr AS (SELECT count(*) AS nr FROM gb),
        |model AS (
        |  SELECT COALESCE(t.bucket, r.bucket) AS bucket,
        |    round(ln((COALESCE(ct, 0) + 1.0) / CAST(nt + 1024 AS DOUBLE)) -
        |          ln((COALESCE(cr, 0) + 1.0) / CAST(nr + 1024 AS DOUBLE)), 9)
        |      AS lr
        |  FROM tgt t FULL OUTER JOIN raws r ON t.bucket = r.bucket
        |  CROSS JOIN nt CROSS JOIN nr),
        |db AS (SELECT doc_id, bucket, count(*) AS c FROM gb GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |  round(CAST(sum(CAST(c AS DECIMAL(12,0)) *
        |                 CAST(lr AS DECIMAL(12,9))) AS DOUBLE), 6) AS log_w
        |FROM db JOIN model USING (bucket) GROUP BY doc_id""".stripMargin,
    // t16's weights CTE verbatim, then the Gumbel-top-k draw: u from the
    // md5 hash reduced mod 2^52 (+0.5, /2^52 — all exact IEEE steps, u
    // strictly inside (0,1)), key = round(log_w - ln(-ln(u)), 9), ties by
    // lowest id, keep the 100 largest.
    "t17_dsir_resample" ->
      """WITH toks AS (
        |  SELECT doc_id, ws FROM (
        |    SELECT doc_id,
        |      list_filter(string_split(text, ' '), t -> t <> '') AS ws
        |    FROM documents)
        |  WHERE len(ws) >= 1),
        |grams AS (
        |  SELECT doc_id, unnest(ws) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g FROM (
        |    SELECT doc_id, ws,
        |      unnest(generate_series(1, len(ws) - 1)) AS i
        |    FROM toks WHERE len(ws) >= 2)),
        |gb AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 1024 AS bucket
        |  FROM grams),
        |tgt AS (SELECT bucket, count(*) AS ct FROM gb
        |        WHERE doc_id % 97 = 0 GROUP BY 1),
        |raws AS (SELECT bucket, count(*) AS cr FROM gb GROUP BY 1),
        |nt AS (SELECT count(*) AS nt FROM gb WHERE doc_id % 97 = 0),
        |nr AS (SELECT count(*) AS nr FROM gb),
        |model AS (
        |  SELECT COALESCE(t.bucket, r.bucket) AS bucket,
        |    round(ln((COALESCE(ct, 0) + 1.0) / CAST(nt + 1024 AS DOUBLE)) -
        |          ln((COALESCE(cr, 0) + 1.0) / CAST(nr + 1024 AS DOUBLE)), 9)
        |      AS lr
        |  FROM tgt t FULL OUTER JOIN raws r ON t.bucket = r.bucket
        |  CROSS JOIN nt CROSS JOIN nr),
        |db AS (SELECT doc_id, bucket, count(*) AS c FROM gb GROUP BY 1, 2),
        |w AS (
        |  SELECT doc_id,
        |    round(CAST(sum(CAST(c AS DECIMAL(12,0)) *
        |                   CAST(lr AS DECIMAL(12,9))) AS DOUBLE), 6) AS log_w
        |  FROM db JOIN model USING (bucket) GROUP BY doc_id),
        |keyed AS (
        |  SELECT doc_id, log_w,
        |    round(log_w - ln(-ln(
        |      (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |         AS BIGINT) % 4503599627370496 + 0.5) / 4503599627370496.0)),
        |      9) AS key
        |  FROM w)
        |SELECT doc_id, log_w, key FROM keyed
        |ORDER BY key DESC, doc_id LIMIT 100""".stripMargin,
    // t18: the UniMax closed form is integer end to end (counts, prefix
    // sums, // division), so the oracle replays it exactly; the draw ranks
    // by the same 60-bit md5 integer both engines compute.
    "t18_unimax_mix" ->
      """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |tot AS (SELECT count(*) AS langs FROM counts),
        |bud AS (SELECT count(*) * 6 // 10 AS b FROM documents),
        |ord AS (SELECT lang, n,
        |         row_number() OVER (ORDER BY n, lang) AS i,
        |         sum(n) OVER (ORDER BY n, lang ROWS UNBOUNDED PRECEDING) AS s
        |        FROM counts),
        |flag AS (SELECT lang, n, i, s, langs, b,
        |          (2 * n * (langs - i + 1) <= b - 2 * (s - n)) AS capped
        |         FROM ord, tot, bud),
        |k AS (SELECT coalesce(max(CASE WHEN capped THEN i END), 0) AS ki,
        |             coalesce(max(CASE WHEN capped THEN s END), 0) AS ks
        |      FROM flag),
        |quotas AS (SELECT lang,
        |            CASE WHEN capped THEN 2 * n
        |                 ELSE (b - 2 * ks) // greatest(langs - ki, 1)
        |            END AS quota
        |           FROM flag, k),
        |ranked AS (SELECT doc_id, lang,
        |            row_number() OVER (PARTITION BY lang ORDER BY
        |              CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |                AS BIGINT), doc_id) AS r
        |           FROM documents)
        |SELECT doc_id, lang FROM ranked JOIN quotas USING (lang)
        |WHERE r <= quota""".stripMargin,
    // t19: pow is the single transcendental, quantized at 1e-9 per language
    // (L model-bounded rounding sites); the threshold draw's uniform is the
    // t17 exact-IEEE construction, so membership replays exactly.
    "t19_temperature_mix" ->
      """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |tot AS (SELECT sum(n) AS nt FROM counts),
        |bud AS (SELECT count(*) // 2 AS b FROM documents),
        |wts AS (SELECT lang, n,
        |         CAST(round(pow(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE), 0.3),
        |           9) AS DECIMAL(20,9)) AS w
        |        FROM counts, tot),
        |tw AS (SELECT sum(w) AS wt FROM wts),
        |quotas AS (SELECT lang, n,
        |            CAST(floor(CAST(b AS DOUBLE) *
        |              (CAST(w AS DOUBLE) / CAST(wt AS DOUBLE))) AS BIGINT)
        |              AS quota
        |           FROM wts, tw, bud)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN quotas q ON d.lang = q.lang
        |WHERE (CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)
        |         AS BIGINT) % 4503599627370496 + 0.5) / 4503599627370496.0
        |      < CAST(q.quota AS DOUBLE) / CAST(q.n AS DOUBLE)""".stripMargin,
    // identical stat constructions to t01/t05 (tokens from lower(trim(text)),
    // bigrams from lower(text)); all ratios are exact int/int divisions.
    // t21: row-based winnowing twin — per (doc, window), row_number over
    // (hash asc, pos desc) picks the rightmost minimum; DISTINCT collapses
    // overlapping windows. Hashes are the portable md5-60bit contract.
    "t21_winnow_fingerprints" ->
      """WITH n AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, s, CAST(length(s) - 4 AS BIGINT) AS m
        |  FROM n WHERE length(s) >= 5),
        |h AS (
        |  SELECT doc_id, m, i,
        |    CAST('0x' || substr(md5(substr(s, CAST(i AS INT), 5)), 1, 15)
        |      AS BIGINT) AS fp
        |  FROM (SELECT doc_id, s, m, unnest(range(1, m + 1)) AS i FROM g)),
        |t AS (
        |  SELECT doc_id, we, unnest(range(1, m - we + 2)) AS t
        |  FROM (SELECT doc_id, m, least(4, m) AS we FROM g)),
        |sel AS (
        |  SELECT doc_id, i, fp FROM (
        |    SELECT t.doc_id, t.t, h.i, h.fp,
        |      row_number() OVER (PARTITION BY t.doc_id, t.t
        |                         ORDER BY h.fp ASC, h.i DESC) AS rn
        |    FROM t JOIN h ON h.doc_id = t.doc_id
        |                 AND h.i BETWEEN t.t AND t.t + t.we - 1)
        |  WHERE rn = 1)
        |SELECT DISTINCT doc_id, i AS pos, fp FROM sel""".stripMargin,
    // d13: t21's selection, then distinct (doc, fp), the same <=1000-doc
    // prune, and pair counting — every step integer-exact.
    "d13_winnow_overlap" ->
      """WITH n AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, s, CAST(length(s) - 15 AS BIGINT) AS m
        |  FROM n WHERE length(s) >= 16),
        |h AS (
        |  SELECT doc_id, m, i,
        |    CAST('0x' || substr(md5(substr(s, CAST(i AS INT), 16)), 1, 15)
        |      AS BIGINT) AS fp
        |  FROM (SELECT doc_id, s, m, unnest(range(1, m + 1)) AS i FROM g)),
        |t AS (
        |  SELECT doc_id, we, unnest(range(1, m - we + 2)) AS t
        |  FROM (SELECT doc_id, m, least(8, m) AS we FROM g)),
        |sel AS (
        |  SELECT doc_id, i, fp FROM (
        |    SELECT t.doc_id, t.t, h.i, h.fp,
        |      row_number() OVER (PARTITION BY t.doc_id, t.t
        |                         ORDER BY h.fp ASC, h.i DESC) AS rn
        |    FROM t JOIN h ON h.doc_id = t.doc_id
        |                 AND h.i BETWEEN t.t AND t.t + t.we - 1)
        |  WHERE rn = 1),
        |fps AS (SELECT DISTINCT doc_id, fp FROM sel),
        |keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 1000),
        |j AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM fps a JOIN fps b USING (fp) JOIN keep USING (fp)
        |  WHERE a.doc_id < b.doc_id)
        |SELECT a_id, b_id, count(*) AS shared_fps
        |FROM j GROUP BY 1, 2 HAVING count(*) >= 8""".stripMargin,
    // t20: distinct normalized texts stand in for distinct fingerprints
    // (the d02 contract); each signal is one IEEE division of exact integer
    // counts, so the doubles and the threshold verdict match bit-for-bit.
    "t20_source_curation" ->
      """WITH fp AS (
        |  SELECT source, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    count(*) AS n,
        |    sum(CASE WHEN length(text) < 120 THEN 1 ELSE 0 END) AS n_short
        |  FROM documents GROUP BY 1, 2),
        |stats AS (
        |  SELECT source,
        |    CAST(sum(n) AS BIGINT) AS n_docs,
        |    CAST(sum(n) - count(*) AS BIGINT) AS n_dup,
        |    CAST(sum(n_short) AS BIGINT) AS n_short
        |  FROM fp GROUP BY 1)
        |SELECT d.doc_id, d.source,
        |  CAST(s.n_dup AS DOUBLE) / s.n_docs AS src_dup_rate,
        |  CAST(s.n_short AS DOUBLE) / s.n_docs AS src_short_frac,
        |  CAST(CAST(s.n_dup AS DOUBLE) / s.n_docs <= 0.02
        |    AND CAST(s.n_short AS DOUBLE) / s.n_docs <= 0.15
        |    AND length(d.text) >= 120 AS INT) AS kept
        |FROM documents d JOIN stats s USING (source)""".stripMargin,
    "t06_quality_filter" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS tk,
        |    list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS words,
        |    length(text) AS n_chars
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS BIGINT) AS n_tokens,
        |    CASE WHEN len(tk) = 0 THEN 0.0
        |         ELSE CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE) / len(tk)
        |    END AS mean_token_len,
        |    CASE WHEN n_chars = 0 THEN 0.0
        |         ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / n_chars
        |    END AS symbol_ratio,
        |    CASE WHEN len(tk) = 0 THEN 0.0
        |         ELSE CAST(len(list_filter(tk, t -> t IN ('the','a','an','and','or','of',
        |           'to','in','is','are','was','on','for','with','as','at','by','it',
        |           'this','that'))) AS DOUBLE) / len(tk)
        |    END AS stopword_ratio,
        |    CASE WHEN len(words) < 2 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct(
        |                list_transform(range(1, len(words)),
        |                  i -> words[i] || ' ' || words[i+1]) )) AS DOUBLE)
        |              / (len(words) - 1)
        |    END AS dup_bigram_frac
        |  FROM f)
        |SELECT doc_id, n_tokens, mean_token_len, symbol_ratio, stopword_ratio,
        |  dup_bigram_frac,
        |  CAST(n_tokens BETWEEN 5 AND 100000
        |    AND mean_token_len BETWEEN 2.0 AND 12.0
        |    AND symbol_ratio <= 0.20
        |    AND stopword_ratio >= 0.02
        |    AND dup_bigram_frac <= 0.60 AS INT) AS keep
        |FROM g""".stripMargin,
    "t07_stratified_sample" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents) s
        |WHERE rk <= ceil(n * 0.25)""".stripMargin,
    // the oracle recomputes the ENTIRE simhash signature from the portable
    // md5 token hashes (Charikar sign-vote per bit; bits 60-63 provably 0)
    // and compares all pairs — exact because 4-chunk pigeonhole banding is
    // exhaustive at hamming <= 3.
    "d04_simhash_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS w
        |  FROM documents),
        |hs AS (
        |  SELECT doc_id,
        |    list_transform(w, t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)) AS hs
        |  FROM toks WHERE len(w) > 0),
        |sigs AS (
        |  SELECT doc_id, CAST(list_sum(list_transform(range(0, 60),
        |    b -> CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) >= len(hs)
        |              THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END))
        |    AS BIGINT) AS sig
        |  FROM hs)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin,
    // same shingle construction as d03/d05, same inverted-index rewrite as
    // jaccardPairCtes but corpus x eval instead of self-join. Exact: the old
    // all-pairs form assigned j=0 to pairs sharing no shingle, which the
    // 0.02 threshold discarded anyway, so enumerating only shared-shingle
    // pairs loses nothing. The rounded-then-filtered j is kept verbatim.
    "d09_cross_decontam" ->
      """WITH docs AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(words) >= 3
        |         THEN list_transform(range(1, len(words) - 1),
        |                i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |         ELSE [] END) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS words
        |        FROM documents)
        |), nonempty AS (SELECT doc_id, len(sh) AS n_sh FROM docs WHERE len(sh) > 0),
        |inv AS (
        |  SELECT doc_id, hash(s) AS h, s
        |  FROM (SELECT doc_id, unnest(sh) AS s FROM docs WHERE len(sh) > 0)),
        |evinv AS (SELECT doc_id AS eval_id, h, s FROM inv WHERE doc_id % 97 = 0),
        |cand AS (
        |  SELECT c.doc_id, e.eval_id, count(*) AS inter
        |  FROM inv c JOIN evinv e ON c.h = e.h AND c.s = e.s AND c.doc_id <> e.eval_id
        |  GROUP BY c.doc_id, e.eval_id),
        |pairs AS (
        |  SELECT cand.doc_id, eval_id,
        |    round(CAST(inter AS DOUBLE) / (lc.n_sh + le.n_sh - inter), 6) AS j
        |  FROM cand
        |  JOIN nonempty lc ON cand.doc_id = lc.doc_id
        |  JOIN nonempty le ON cand.eval_id = le.doc_id)
        |SELECT doc_id, count(*) AS n_eval_matches, max(j) AS max_jaccard
        |FROM pairs WHERE j >= 0.02 GROUP BY doc_id""".stripMargin,
    // same token def as t14; the oracle groups duplicated grams by STRING where
    // Spark shuffles xxhash64(gram) — identical output absent hash collisions
    // (the d01/d02 fingerprint precedent). Fixed-length interval union:
    // sum(min(k, next-pos)) over per-doc sorted dup starts, + k for the last.
    "d10_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |base AS (SELECT doc_id, tk, len(tk) AS m FROM toks),
        |sh AS (
        |  SELECT doc_id, m, j AS pos, array_to_string(tk[j:j+7], ' ') AS gram
        |  FROM base, UNNEST(range(1, greatest(m-8+2, 1))) AS t(j)),
        |dup AS (SELECT gram FROM sh GROUP BY gram HAVING count(*) > 1),
        |starts AS (
        |  SELECT sh.doc_id, sh.pos,
        |    lead(sh.pos) OVER (PARTITION BY sh.doc_id ORDER BY sh.pos) AS nxt
        |  FROM sh JOIN dup USING (gram)),
        |cov AS (
        |  SELECT doc_id, count(*) AS n_dup_spans,
        |    CAST(sum(CASE WHEN nxt IS NULL THEN 8 ELSE least(8, nxt - pos) END) AS BIGINT) AS covered
        |  FROM starts GROUP BY doc_id)
        |SELECT b.doc_id, COALESCE(c.n_dup_spans, 0) AS n_dup_spans,
        |  COALESCE(c.covered, 0) AS covered_tokens,
        |  CASE WHEN b.m = 0 THEN 0.0 ELSE CAST(COALESCE(c.covered, 0) AS DOUBLE) / b.m END AS dup_span_frac
        |FROM base b LEFT JOIN cov c USING (doc_id)""".stripMargin,
    // gram construction identical to d05's (words from lower(text)); the oracle
    // joins on gram STRINGS where Spark joins on xxhash64(gram) — identical
    // output absent 64-bit collisions.
    "c01_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(CASE WHEN len(w) >= 3 THEN list_distinct(
        |      list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
        |    ELSE [] END) AS g
        |  FROM toks),
        |ev AS (SELECT doc_id AS eval_id, g FROM grams WHERE doc_id % 97 = 0)
        |SELECT c.doc_id, count(DISTINCT c.g) AS n_shared_grams
        |FROM grams c JOIN ev e ON c.g = e.g AND c.doc_id <> e.eval_id
        |GROUP BY c.doc_id""".stripMargin,
    // c02: the stage oracles composed verbatim — t23's block rules build
    // `ext`, t22's NB model (trained on ext's labeled 4/5) gates on
    // predicted 'en', t06's integer rules gate quality, d02's normalized
    // group keeps the min-id survivor, t16/t17's DSIR model + Gumbel draw
    // pick 100, t09's cumulative window packs them.
    "c02_crawl_pipeline" ->
      """WITH h AS (
        |  SELECT doc_id, lang, source,
        |    '<html><body><nav><a href="/">home</a> <a href="/a">about</a> ' ||
        |    '<a href="/c">contact</a></nav><p>' || text ||
        |    '</p><div class="foot"><a href="/t">terms</a> ' ||
        |    '<a href="/p">privacy</a> all rights reserved</div>' ||
        |    '</body></html>' AS html
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang, source, string_split_regex(html,
        |    '(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|hr|blockquote|pre|section|article|header|footer|nav|aside|main|form|html|body|head|title)[^>]*>')
        |    AS arr
        |  FROM h),
        |blk AS (
        |  SELECT doc_id, lang, source, i, arr[i] AS raw
        |  FROM (SELECT doc_id, lang, source, arr,
        |          unnest(range(1, len(arr) + 1)) AS i FROM b)),
        |stb AS (
        |  SELECT doc_id, lang, source, i,
        |    trim(regexp_replace(regexp_replace(raw, '(?s)<[^>]*>', ' ', 'g'),
        |                        '\s+', ' ', 'g')) AS txt,
        |    trim(regexp_replace(regexp_replace(
        |      coalesce(array_to_string(
        |        regexp_extract_all(raw, '(?is)<a[^>]*>(.*?)</a>', 1), ' '), ''),
        |      '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS ltxt
        |  FROM blk),
        |wb AS (
        |  SELECT doc_id, lang, source, i, txt,
        |    CASE WHEN txt = '' THEN 0
        |         ELSE len(string_split(txt, ' ')) END AS w,
        |    CAST(length(txt) AS BIGINT) AS c,
        |    CASE WHEN ltxt = '' THEN 0
        |         ELSE len(string_split(ltxt, ' ')) END AS lw
        |  FROM stb),
        |kb AS (
        |  SELECT doc_id, lang, source, i, txt,
        |    (w >= 5 AND 3 * lw <= w
        |       AND w >= 7 * CAST(floor((c + 79) / 80.0) AS BIGINT)) AS kept
        |  FROM wb WHERE w >= 1),
        |ext AS (
        |  SELECT doc_id, lang, source,
        |    coalesce(string_agg(CASE WHEN kept THEN txt END, ' ' ORDER BY i),
        |             '') AS et
        |  FROM kb GROUP BY doc_id, lang, source),
        |ltg AS (
        |  SELECT lang, t FROM (
        |    SELECT lang, regexp_replace(lower(trim(et)), '\s+', ' ', 'g') AS t
        |    FROM ext WHERE doc_id % 5 <> 0)
        |  WHERE length(t) >= 3),
        |lgr AS (
        |  SELECT lang, substr(t, CAST(i AS INT), 3) AS g
        |  FROM (SELECT lang, t, unnest(range(1, length(t) - 1)) AS i
        |        FROM ltg)),
        |lcnt AS (SELECT lang, g, count(*) AS c FROM lgr GROUP BY 1, 2),
        |ltot AS (SELECT lang, count(*) AS tot FROM lgr GROUP BY 1),
        |lvcb AS (SELECT count(DISTINCT g) AS v FROM lgr),
        |ldpl AS (SELECT lang, count(*) AS nl FROM ltg GROUP BY 1),
        |lnd AS (SELECT count(*) AS n FROM ltg),
        |lstats AS (
        |  SELECT t.lang,
        |    CAST(round(ln(CAST(d.nl AS DOUBLE) / n.n), 9)
        |      AS DECIMAL(20,9)) AS prior,
        |    CAST(round(ln(1.0 / CAST(t.tot + v.v AS DOUBLE)), 9)
        |      AS DECIMAL(20,9)) AS miss
        |  FROM ltot t JOIN ldpl d ON t.lang = d.lang
        |  CROSS JOIN lvcb v CROSS JOIN lnd n),
        |lmodel AS (
        |  SELECT c.lang, c.g,
        |    CAST(round(ln((c.c + 1.0) / CAST(t.tot + v.v AS DOUBLE)), 9)
        |      AS DECIMAL(20,9)) AS lp
        |  FROM lcnt c JOIN ltot t ON c.lang = t.lang CROSS JOIN lvcb v),
        |dg AS (
        |  SELECT doc_id, substr(t, CAST(i AS INT), 3) AS g
        |  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 1)) AS i
        |        FROM (SELECT doc_id,
        |                regexp_replace(lower(trim(et)), '\s+', ' ', 'g') AS t
        |              FROM ext)
        |        WHERE length(t) >= 3)),
        |lsum AS (
        |  SELECT dg.doc_id, s.lang, sum(coalesce(m.lp, s.miss)) AS gsum
        |  FROM dg CROSS JOIN lstats s
        |  LEFT JOIN lmodel m ON m.lang = s.lang AND m.g = dg.g
        |  GROUP BY 1, 2),
        |lfin AS (
        |  SELECT s.doc_id, s.lang,
        |    row_number() OVER (PARTITION BY s.doc_id
        |                       ORDER BY st.prior + s.gsum DESC, s.lang ASC)
        |      AS rn
        |  FROM lsum s JOIN lstats st ON s.lang = st.lang),
        |pred AS (SELECT doc_id, lang AS lang_pred FROM lfin WHERE rn = 1),
        |gated AS (
        |  SELECT e.doc_id, e.source, e.et, p.lang_pred
        |  FROM ext e JOIN pred p USING (doc_id)
        |  WHERE p.lang_pred IN ('en')),
        |qf AS (
        |  SELECT doc_id, source, et, lang_pred,
        |    list_filter(string_split_regex(lower(trim(et)), '\s+'),
        |      t -> t <> '') AS tk,
        |    list_filter(string_split_regex(lower(et), '\s+'),
        |      w -> w <> '') AS words,
        |    length(et) AS n_chars
        |  FROM gated),
        |qg AS (
        |  SELECT doc_id, source, et, lang_pred,
        |    CAST(len(tk) AS BIGINT) AS n_tokens,
        |    CASE WHEN len(tk) = 0 THEN 0.0
        |         ELSE CAST(list_sum(list_transform(tk, t -> length(t)))
        |           AS DOUBLE) / len(tk) END AS mean_token_len,
        |    CASE WHEN n_chars = 0 THEN 0.0
        |         ELSE CAST(len(regexp_extract_all(et, '[^A-Za-z0-9\s]'))
        |           AS DOUBLE) / n_chars END AS symbol_ratio,
        |    CASE WHEN len(tk) = 0 THEN 0.0
        |         ELSE CAST(len(list_filter(tk, t -> t IN ('the','a','an',
        |           'and','or','of','to','in','is','are','was','on','for',
        |           'with','as','at','by','it','this','that')))
        |           AS DOUBLE) / len(tk) END AS stopword_ratio,
        |    CASE WHEN len(words) < 2 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct(
        |                list_transform(range(1, len(words)),
        |                  i -> words[i] || ' ' || words[i+1]))) AS DOUBLE)
        |              / (len(words) - 1) END AS dup_bigram_frac
        |  FROM qf),
        |qkeep AS (
        |  SELECT doc_id, source, et, lang_pred FROM qg
        |  WHERE n_tokens BETWEEN 5 AND 100000
        |    AND mean_token_len BETWEEN 2.0 AND 12.0
        |    AND symbol_ratio <= 0.20 AND stopword_ratio >= 0.02
        |    AND dup_bigram_frac <= 0.60),
        |surv AS (
        |  SELECT doc_id, source, et, lang_pred FROM (
        |    SELECT doc_id, source, et, lang_pred,
        |      row_number() OVER (
        |        PARTITION BY regexp_replace(lower(trim(et)), '\s+', ' ', 'g')
        |        ORDER BY doc_id) AS rn
        |    FROM qkeep) WHERE rn = 1),
        |dtoks AS (
        |  SELECT doc_id, ws FROM (
        |    SELECT doc_id,
        |      list_filter(string_split(et, ' '), t -> t <> '') AS ws
        |    FROM surv)
        |  WHERE len(ws) >= 1),
        |dgrams AS (
        |  SELECT doc_id, unnest(ws) AS g FROM dtoks
        |  UNION ALL
        |  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g FROM (
        |    SELECT doc_id, ws,
        |      unnest(generate_series(1, len(ws) - 1)) AS i
        |    FROM dtoks WHERE len(ws) >= 2)),
        |dgb AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 1024 AS bucket
        |  FROM dgrams),
        |dtgt AS (SELECT bucket, count(*) AS ct FROM dgb
        |         WHERE doc_id % 13 = 0 GROUP BY 1),
        |draw AS (SELECT bucket, count(*) AS cr FROM dgb GROUP BY 1),
        |dnt AS (SELECT count(*) AS nt FROM dgb WHERE doc_id % 13 = 0),
        |dnr AS (SELECT count(*) AS nr FROM dgb),
        |dmodel AS (
        |  SELECT COALESCE(t.bucket, r.bucket) AS bucket,
        |    round(ln((COALESCE(ct, 0) + 1.0) / CAST(nt + 1024 AS DOUBLE)) -
        |          ln((COALESCE(cr, 0) + 1.0) / CAST(nr + 1024 AS DOUBLE)), 9)
        |      AS lr
        |  FROM dtgt t FULL OUTER JOIN draw r ON t.bucket = r.bucket
        |  CROSS JOIN dnt CROSS JOIN dnr),
        |ddb AS (SELECT doc_id, bucket, count(*) AS c FROM dgb GROUP BY 1, 2),
        |dw AS (
        |  SELECT doc_id,
        |    round(CAST(sum(CAST(c AS DECIMAL(12,0)) *
        |                   CAST(lr AS DECIMAL(12,9))) AS DOUBLE), 6) AS log_w
        |  FROM ddb JOIN dmodel USING (bucket) GROUP BY doc_id),
        |sel AS (
        |  SELECT doc_id, log_w FROM (
        |    SELECT doc_id, log_w,
        |      round(log_w - ln(-ln(
        |        (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |           AS BIGINT) % 4503599627370496 + 0.5)
        |        / 4503599627370496.0)), 9) AS key
        |    FROM dw)
        |  ORDER BY key DESC, doc_id LIMIT 100),
        |win AS (
        |  SELECT s.doc_id, s.source, s.lang_pred, sel.log_w,
        |    CAST(len(list_filter(string_split_regex(lower(trim(s.et)),
        |      '\s+'), t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM surv s JOIN sel USING (doc_id))
        |SELECT doc_id, source, lang_pred, log_w, n_tokens,
        |  CAST(floor(cum_before / 512.0) AS BIGINT) AS pack_id,
        |  cum_before % 512 AS pack_offset
        |FROM (
        |  SELECT doc_id, source, lang_pred, log_w, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
        |  FROM win)""".stripMargin,
    // c04: c02's oracle with the t24 KN CTEs spliced in over the extracted
    // relation and the ppl gate conjoined at the language-gate join.
    "c04_crawl_kn_gate" ->
      """WITH h AS (
        |  SELECT doc_id, lang, source,
        |    '<html><body><nav><a href="/">home</a> <a href="/a">about</a> ' ||
        |    '<a href="/c">contact</a></nav><p>' || text ||
        |    '</p><div class="foot"><a href="/t">terms</a> ' ||
        |    '<a href="/p">privacy</a> all rights reserved</div>' ||
        |    '</body></html>' AS html
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang, source, string_split_regex(html,
        |    '(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|hr|blockquote|pre|section|article|header|footer|nav|aside|main|form|html|body|head|title)[^>]*>')
        |    AS arr
        |  FROM h),
        |blk AS (
        |  SELECT doc_id, lang, source, i, arr[i] AS raw
        |  FROM (SELECT doc_id, lang, source, arr,
        |          unnest(range(1, len(arr) + 1)) AS i FROM b)),
        |stb AS (
        |  SELECT doc_id, lang, source, i,
        |    trim(regexp_replace(regexp_replace(raw, '(?s)<[^>]*>', ' ', 'g'),
        |                        '\s+', ' ', 'g')) AS txt,
        |    trim(regexp_replace(regexp_replace(
        |      coalesce(array_to_string(
        |        regexp_extract_all(raw, '(?is)<a[^>]*>(.*?)</a>', 1), ' '), ''),
        |      '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS ltxt
        |  FROM blk),
        |wb AS (
        |  SELECT doc_id, lang, source, i, txt,
        |    CASE WHEN txt = '' THEN 0
        |         ELSE len(string_split(txt, ' ')) END AS w,
        |    CAST(length(txt) AS BIGINT) AS c,
        |    CASE WHEN ltxt = '' THEN 0
        |         ELSE len(string_split(ltxt, ' ')) END AS lw
        |  FROM stb),
        |kb AS (
        |  SELECT doc_id, lang, source, i, txt,
        |    (w >= 5 AND 3 * lw <= w
        |       AND w >= 7 * CAST(floor((c + 79) / 80.0) AS BIGINT)) AS kept
        |  FROM wb WHERE w >= 1),
        |ext AS (
        |  SELECT doc_id, lang, source,
        |    coalesce(string_agg(CASE WHEN kept THEN txt END, ' ' ORDER BY i),
        |             '') AS et
        |  FROM kb GROUP BY doc_id, lang, source),
        |kdocs3 AS (
        |  SELECT doc_id, ws FROM (
        |    SELECT doc_id,
        |      list_filter(string_split(et, ' '), t -> t <> '') AS ws
        |    FROM ext)
        |  WHERE len(ws) >= 3),
        |ktris AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3 FROM (
        |    SELECT doc_id, ws,
        |      unnest(generate_series(1, len(ws) - 2)) AS i
        |    FROM kdocs3)),
        |kc3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM ktris GROUP BY 1, 2, 3),
        |kctx AS (SELECT w1, w2, sum(c3) AS c2, count(*) AS n3
        |         FROM kc3 GROUP BY 1, 2),
        |kt2 AS (SELECT w2, w3, count(*) AS t23 FROM kc3 GROUP BY 1, 2),
        |kmid AS (SELECT w2, count(*) AS midc FROM kc3 GROUP BY 1),
        |kty2 AS (SELECT w2, count(*) AS ty2 FROM kt2 GROUP BY 1),
        |kuni AS (SELECT w3, count(*) AS u FROM kt2 GROUP BY 1),
        |ktot AS (SELECT count(*) AS tt FROM kt2),
        |kmodel AS (
        |  SELECT c.w1, c.w2, c.w3,
        |    CAST(round(ln(
        |      (greatest(CAST(c.c3 AS DOUBLE) - 0.75, 0.0) +
        |       0.75 * x.n3 *
        |         ((greatest(CAST(b2.t23 AS DOUBLE) - 0.75, 0.0) +
        |           0.75 * y.ty2 * (CAST(un.u AS DOUBLE) / t.tt)) / m.midc))
        |      / x.c2), 9) AS DECIMAL(20,9)) AS lp
        |  FROM kc3 c
        |  JOIN kctx x ON x.w1 = c.w1 AND x.w2 = c.w2
        |  JOIN kt2 b2 ON b2.w2 = c.w2 AND b2.w3 = c.w3
        |  JOIN kmid m ON m.w2 = c.w2
        |  JOIN kty2 y ON y.w2 = c.w2
        |  JOIN kuni un ON un.w3 = c.w3
        |  CROSS JOIN ktot t),
        |knsc AS (
        |  SELECT doc_id,
        |    round(exp(-(round(CAST(sum(lp) AS DOUBLE) / count(*), 6))), 3)
        |      AS ppl
        |  FROM ktris JOIN kmodel USING (w1, w2, w3) GROUP BY doc_id),
        |kcut AS (
        |  SELECT min(ppl) AS cut FROM (
        |    SELECT ppl, sum(cnt) OVER (ORDER BY ppl) AS cum,
        |           sum(cnt) OVER () AS n
        |    FROM (SELECT ppl, count(*) AS cnt FROM knsc GROUP BY 1))
        |  WHERE cum >= greatest(1, CAST(floor(0.8 * n) AS BIGINT))),
        |ltg AS (
        |  SELECT lang, t FROM (
        |    SELECT lang, regexp_replace(lower(trim(et)), '\s+', ' ', 'g') AS t
        |    FROM ext WHERE doc_id % 5 <> 0)
        |  WHERE length(t) >= 3),
        |lgr AS (
        |  SELECT lang, substr(t, CAST(i AS INT), 3) AS g
        |  FROM (SELECT lang, t, unnest(range(1, length(t) - 1)) AS i
        |        FROM ltg)),
        |lcnt AS (SELECT lang, g, count(*) AS c FROM lgr GROUP BY 1, 2),
        |ltot AS (SELECT lang, count(*) AS tot FROM lgr GROUP BY 1),
        |lvcb AS (SELECT count(DISTINCT g) AS v FROM lgr),
        |ldpl AS (SELECT lang, count(*) AS nl FROM ltg GROUP BY 1),
        |lnd AS (SELECT count(*) AS n FROM ltg),
        |lstats AS (
        |  SELECT t.lang,
        |    CAST(round(ln(CAST(d.nl AS DOUBLE) / n.n), 9)
        |      AS DECIMAL(20,9)) AS prior,
        |    CAST(round(ln(1.0 / CAST(t.tot + v.v AS DOUBLE)), 9)
        |      AS DECIMAL(20,9)) AS miss
        |  FROM ltot t JOIN ldpl d ON t.lang = d.lang
        |  CROSS JOIN lvcb v CROSS JOIN lnd n),
        |lmodel AS (
        |  SELECT c.lang, c.g,
        |    CAST(round(ln((c.c + 1.0) / CAST(t.tot + v.v AS DOUBLE)), 9)
        |      AS DECIMAL(20,9)) AS lp
        |  FROM lcnt c JOIN ltot t ON c.lang = t.lang CROSS JOIN lvcb v),
        |dg AS (
        |  SELECT doc_id, substr(t, CAST(i AS INT), 3) AS g
        |  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 1)) AS i
        |        FROM (SELECT doc_id,
        |                regexp_replace(lower(trim(et)), '\s+', ' ', 'g') AS t
        |              FROM ext)
        |        WHERE length(t) >= 3)),
        |lsum AS (
        |  SELECT dg.doc_id, s.lang, sum(coalesce(m.lp, s.miss)) AS gsum
        |  FROM dg CROSS JOIN lstats s
        |  LEFT JOIN lmodel m ON m.lang = s.lang AND m.g = dg.g
        |  GROUP BY 1, 2),
        |lfin AS (
        |  SELECT s.doc_id, s.lang,
        |    row_number() OVER (PARTITION BY s.doc_id
        |                       ORDER BY st.prior + s.gsum DESC, s.lang ASC)
        |      AS rn
        |  FROM lsum s JOIN lstats st ON s.lang = st.lang),
        |pred AS (SELECT doc_id, lang AS lang_pred FROM lfin WHERE rn = 1),
        |gated AS (
        |  SELECT e.doc_id, e.source, e.et, p.lang_pred
        |  FROM ext e JOIN pred p USING (doc_id)
        |  JOIN knsc k USING (doc_id)
        |  WHERE p.lang_pred IN ('en')
        |    AND k.ppl <= (SELECT cut FROM kcut)),
        |qf AS (
        |  SELECT doc_id, source, et, lang_pred,
        |    list_filter(string_split_regex(lower(trim(et)), '\s+'),
        |      t -> t <> '') AS tk,
        |    list_filter(string_split_regex(lower(et), '\s+'),
        |      w -> w <> '') AS words,
        |    length(et) AS n_chars
        |  FROM gated),
        |qg AS (
        |  SELECT doc_id, source, et, lang_pred,
        |    CAST(len(tk) AS BIGINT) AS n_tokens,
        |    CASE WHEN len(tk) = 0 THEN 0.0
        |         ELSE CAST(list_sum(list_transform(tk, t -> length(t)))
        |           AS DOUBLE) / len(tk) END AS mean_token_len,
        |    CASE WHEN n_chars = 0 THEN 0.0
        |         ELSE CAST(len(regexp_extract_all(et, '[^A-Za-z0-9\s]'))
        |           AS DOUBLE) / n_chars END AS symbol_ratio,
        |    CASE WHEN len(tk) = 0 THEN 0.0
        |         ELSE CAST(len(list_filter(tk, t -> t IN ('the','a','an',
        |           'and','or','of','to','in','is','are','was','on','for',
        |           'with','as','at','by','it','this','that')))
        |           AS DOUBLE) / len(tk) END AS stopword_ratio,
        |    CASE WHEN len(words) < 2 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct(
        |                list_transform(range(1, len(words)),
        |                  i -> words[i] || ' ' || words[i+1]))) AS DOUBLE)
        |              / (len(words) - 1) END AS dup_bigram_frac
        |  FROM qf),
        |qkeep AS (
        |  SELECT doc_id, source, et, lang_pred FROM qg
        |  WHERE n_tokens BETWEEN 5 AND 100000
        |    AND mean_token_len BETWEEN 2.0 AND 12.0
        |    AND symbol_ratio <= 0.20 AND stopword_ratio >= 0.02
        |    AND dup_bigram_frac <= 0.60),
        |surv AS (
        |  SELECT doc_id, source, et, lang_pred FROM (
        |    SELECT doc_id, source, et, lang_pred,
        |      row_number() OVER (
        |        PARTITION BY regexp_replace(lower(trim(et)), '\s+', ' ', 'g')
        |        ORDER BY doc_id) AS rn
        |    FROM qkeep) WHERE rn = 1),
        |dtoks AS (
        |  SELECT doc_id, ws FROM (
        |    SELECT doc_id,
        |      list_filter(string_split(et, ' '), t -> t <> '') AS ws
        |    FROM surv)
        |  WHERE len(ws) >= 1),
        |dgrams AS (
        |  SELECT doc_id, unnest(ws) AS g FROM dtoks
        |  UNION ALL
        |  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g FROM (
        |    SELECT doc_id, ws,
        |      unnest(generate_series(1, len(ws) - 1)) AS i
        |    FROM dtoks WHERE len(ws) >= 2)),
        |dgb AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 1024 AS bucket
        |  FROM dgrams),
        |draw AS (SELECT bucket, count(*) AS cr,
        |           count(*) FILTER (WHERE doc_id % 13 = 0) AS ct
        |         FROM dgb GROUP BY 1),
        |dtot AS (SELECT count(*) AS nr,
        |           count(*) FILTER (WHERE doc_id % 13 = 0) AS nt
        |         FROM dgb),
        |dmodel AS (
        |  SELECT bucket,
        |    round(ln((ct + 1.0) / CAST(nt + 1024 AS DOUBLE)) -
        |          ln((cr + 1.0) / CAST(nr + 1024 AS DOUBLE)), 9) AS lr
        |  FROM draw CROSS JOIN dtot),
        |ddb AS (SELECT doc_id, bucket, count(*) AS c FROM dgb GROUP BY 1, 2),
        |dw AS (
        |  SELECT doc_id,
        |    round(CAST(sum(CAST(c AS DECIMAL(12,0)) *
        |                   CAST(lr AS DECIMAL(12,9))) AS DOUBLE), 6) AS log_w
        |  FROM ddb JOIN dmodel USING (bucket) GROUP BY doc_id),
        |sel AS (
        |  SELECT doc_id, log_w FROM (
        |    SELECT doc_id, log_w,
        |      round(log_w - ln(-ln(
        |        (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |           AS BIGINT) % 4503599627370496 + 0.5)
        |        / 4503599627370496.0)), 9) AS key
        |    FROM dw)
        |  ORDER BY key DESC, doc_id LIMIT 100),
        |win AS (
        |  SELECT s.doc_id, s.source, s.lang_pred, sel.log_w,
        |    CAST(len(list_filter(string_split_regex(lower(trim(s.et)),
        |      '\s+'), t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM surv s JOIN sel USING (doc_id))
        |SELECT doc_id, source, lang_pred, log_w, n_tokens,
        |  CAST(floor(cum_before / 512.0) AS BIGINT) AS pack_id,
        |  cum_before % 512 AS pack_offset
        |FROM (
        |  SELECT doc_id, source, lang_pred, log_w, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
        |  FROM win)""".stripMargin,
    // c03: the c02 chain replayed per batch (batch = doc_id % 3, processed
    // in order) behind the t25 URL gate, with the history rule — a doc
    // survives its batch only if no EARLIER batch's post-URL-gate extracted
    // set contains its normalized text (the i03 anti-join contract over the
    // materialized fingerprint index). Every model CTE gains `batch` as a
    // grouping/join key; selection and packing partition per batch.
    "c03_incremental_crawl" ->
      """WITH h AS (
        |  SELECT doc_id, lang, source, doc_id % 3 AS batch,
        |    '<html><body><nav><a href="/">home</a> <a href="/a">about</a> ' ||
        |    '<a href="/c">contact</a></nav><p>' || text ||
        |    '</p><div class="foot"><a href="/t">terms</a> ' ||
        |    '<a href="/p">privacy</a> all rights reserved</div>' ||
        |    '</body></html>' AS html,
        |    lower('https://www.' || source || '-' ||
        |    CAST(doc_id % 50 AS VARCHAR) || '.' ||
        |    (CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |          WHEN 2 THEN 'net' ELSE 'xyz' END) ||
        |    (CASE WHEN doc_id % 11 = 0 THEN '/private' ELSE '/docs' END) ||
        |    '/page-' || CAST(doc_id AS VARCHAR)) AS url
        |  FROM documents),
        |pp AS (
        |  SELECT doc_id,
        |    regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
        |    regexp_extract(url, '^[a-z]+://[^/]+(/.*)?$', 1) AS path
        |  FROM h),
        |pt AS (
        |  SELECT doc_id, host, path,
        |    regexp_extract(host, '\.([a-z]+)$', 1) AS tld
        |  FROM pp),
        |ubl AS (SELECT DISTINCT host FROM pt WHERE doc_id % 100 < 5),
        |adm AS (
        |  SELECT h.doc_id, h.lang, h.source, h.batch, h.html
        |  FROM h JOIN pt USING (doc_id) LEFT JOIN ubl ON pt.host = ubl.host
        |  WHERE pt.host <> '' AND ubl.host IS NULL
        |    AND NOT pt.host LIKE '%-22.net'
        |    AND pt.tld <> 'xyz'
        |    AND NOT regexp_matches(pt.path, '^/private(/|$)')),
        |b AS (
        |  SELECT doc_id, lang, source, batch, string_split_regex(html,
        |    '(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|hr|blockquote|pre|section|article|header|footer|nav|aside|main|form|html|body|head|title)[^>]*>')
        |    AS arr
        |  FROM adm),
        |blk AS (
        |  SELECT doc_id, lang, source, batch, i, arr[i] AS raw
        |  FROM (SELECT doc_id, lang, source, batch, arr,
        |          unnest(range(1, len(arr) + 1)) AS i FROM b)),
        |stb AS (
        |  SELECT doc_id, lang, source, batch, i,
        |    trim(regexp_replace(regexp_replace(raw, '(?s)<[^>]*>', ' ', 'g'),
        |                        '\s+', ' ', 'g')) AS txt,
        |    trim(regexp_replace(regexp_replace(
        |      coalesce(array_to_string(
        |        regexp_extract_all(raw, '(?is)<a[^>]*>(.*?)</a>', 1), ' '), ''),
        |      '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS ltxt
        |  FROM blk),
        |wb AS (
        |  SELECT doc_id, lang, source, batch, i, txt,
        |    CASE WHEN txt = '' THEN 0
        |         ELSE len(string_split(txt, ' ')) END AS w,
        |    CAST(length(txt) AS BIGINT) AS c,
        |    CASE WHEN ltxt = '' THEN 0
        |         ELSE len(string_split(ltxt, ' ')) END AS lw
        |  FROM stb),
        |kb AS (
        |  SELECT doc_id, lang, source, batch, i, txt,
        |    (w >= 5 AND 3 * lw <= w
        |       AND w >= 7 * CAST(floor((c + 79) / 80.0) AS BIGINT)) AS kept
        |  FROM wb WHERE w >= 1),
        |ext AS (
        |  SELECT doc_id, lang, source, batch,
        |    coalesce(string_agg(CASE WHEN kept THEN txt END, ' ' ORDER BY i),
        |             '') AS et
        |  FROM kb GROUP BY doc_id, lang, source, batch),
        |ltg AS (
        |  SELECT batch, lang, t FROM (
        |    SELECT batch, lang,
        |      regexp_replace(lower(trim(et)), '\s+', ' ', 'g') AS t
        |    FROM ext WHERE doc_id % 5 <> 0)
        |  WHERE length(t) >= 3),
        |lgr AS (
        |  SELECT batch, lang, substr(t, CAST(i AS INT), 3) AS g
        |  FROM (SELECT batch, lang, t, unnest(range(1, length(t) - 1)) AS i
        |        FROM ltg)),
        |lcnt AS (SELECT batch, lang, g, count(*) AS c FROM lgr GROUP BY 1, 2, 3),
        |ltot AS (SELECT batch, lang, count(*) AS tot FROM lgr GROUP BY 1, 2),
        |lvcb AS (SELECT batch, count(DISTINCT g) AS v FROM lgr GROUP BY 1),
        |ldpl AS (SELECT batch, lang, count(*) AS nl FROM ltg GROUP BY 1, 2),
        |lnd AS (SELECT batch, count(*) AS n FROM ltg GROUP BY 1),
        |lstats AS (
        |  SELECT t.batch, t.lang,
        |    CAST(round(ln(CAST(d.nl AS DOUBLE) / n.n), 9)
        |      AS DECIMAL(20,9)) AS prior,
        |    CAST(round(ln(1.0 / CAST(t.tot + v.v AS DOUBLE)), 9)
        |      AS DECIMAL(20,9)) AS miss
        |  FROM ltot t
        |  JOIN ldpl d ON t.batch = d.batch AND t.lang = d.lang
        |  JOIN lvcb v ON t.batch = v.batch
        |  JOIN lnd n ON t.batch = n.batch),
        |lmodel AS (
        |  SELECT c.batch, c.lang, c.g,
        |    CAST(round(ln((c.c + 1.0) / CAST(t.tot + v.v AS DOUBLE)), 9)
        |      AS DECIMAL(20,9)) AS lp
        |  FROM lcnt c
        |  JOIN ltot t ON c.batch = t.batch AND c.lang = t.lang
        |  JOIN lvcb v ON c.batch = v.batch),
        |dg AS (
        |  SELECT doc_id, batch, substr(t, CAST(i AS INT), 3) AS g
        |  FROM (SELECT doc_id, batch, t,
        |          unnest(range(1, length(t) - 1)) AS i
        |        FROM (SELECT doc_id, batch,
        |                regexp_replace(lower(trim(et)), '\s+', ' ', 'g') AS t
        |              FROM ext)
        |        WHERE length(t) >= 3)),
        |lsum AS (
        |  SELECT dg.doc_id, s.lang, sum(coalesce(m.lp, s.miss)) AS gsum
        |  FROM dg JOIN lstats s ON s.batch = dg.batch
        |  LEFT JOIN lmodel m ON m.batch = dg.batch AND m.lang = s.lang
        |    AND m.g = dg.g
        |  GROUP BY 1, 2),
        |lfin AS (
        |  SELECT s.doc_id, s.lang,
        |    row_number() OVER (PARTITION BY s.doc_id
        |                       ORDER BY st.prior + s.gsum DESC, s.lang ASC)
        |      AS rn
        |  FROM lsum s
        |  JOIN ext e ON e.doc_id = s.doc_id
        |  JOIN lstats st ON st.batch = e.batch AND st.lang = s.lang),
        |pred AS (SELECT doc_id, lang AS lang_pred FROM lfin WHERE rn = 1),
        |gated AS (
        |  SELECT e.doc_id, e.source, e.batch, e.et, p.lang_pred
        |  FROM ext e JOIN pred p USING (doc_id)
        |  WHERE p.lang_pred IN ('en')),
        |qf AS (
        |  SELECT doc_id, source, batch, et, lang_pred,
        |    list_filter(string_split_regex(lower(trim(et)), '\s+'),
        |      t -> t <> '') AS tk,
        |    list_filter(string_split_regex(lower(et), '\s+'),
        |      w -> w <> '') AS words,
        |    length(et) AS n_chars
        |  FROM gated),
        |qg AS (
        |  SELECT doc_id, source, batch, et, lang_pred,
        |    CAST(len(tk) AS BIGINT) AS n_tokens,
        |    CASE WHEN len(tk) = 0 THEN 0.0
        |         ELSE CAST(list_sum(list_transform(tk, t -> length(t)))
        |           AS DOUBLE) / len(tk) END AS mean_token_len,
        |    CASE WHEN n_chars = 0 THEN 0.0
        |         ELSE CAST(len(regexp_extract_all(et, '[^A-Za-z0-9\s]'))
        |           AS DOUBLE) / n_chars END AS symbol_ratio,
        |    CASE WHEN len(tk) = 0 THEN 0.0
        |         ELSE CAST(len(list_filter(tk, t -> t IN ('the','a','an',
        |           'and','or','of','to','in','is','are','was','on','for',
        |           'with','as','at','by','it','this','that')))
        |           AS DOUBLE) / len(tk) END AS stopword_ratio,
        |    CASE WHEN len(words) < 2 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct(
        |                list_transform(range(1, len(words)),
        |                  i -> words[i] || ' ' || words[i+1]))) AS DOUBLE)
        |              / (len(words) - 1) END AS dup_bigram_frac
        |  FROM qf),
        |qkeep AS (
        |  SELECT doc_id, source, batch, et, lang_pred FROM qg
        |  WHERE n_tokens BETWEEN 5 AND 100000
        |    AND mean_token_len BETWEEN 2.0 AND 12.0
        |    AND symbol_ratio <= 0.20 AND stopword_ratio >= 0.02
        |    AND dup_bigram_frac <= 0.60),
        |surv AS (
        |  SELECT doc_id, source, batch, et, lang_pred FROM (
        |    SELECT doc_id, source, batch, et, lang_pred,
        |      row_number() OVER (
        |        PARTITION BY batch,
        |          regexp_replace(lower(trim(et)), '\s+', ' ', 'g')
        |        ORDER BY doc_id) AS rn
        |    FROM qkeep q
        |    WHERE NOT EXISTS (
        |      SELECT 1 FROM ext hh
        |      WHERE hh.batch < q.batch
        |        AND regexp_replace(lower(trim(hh.et)), '\s+', ' ', 'g') =
        |            regexp_replace(lower(trim(q.et)), '\s+', ' ', 'g'))
        |  ) WHERE rn = 1),
        |dtoks AS (
        |  SELECT doc_id, batch, ws FROM (
        |    SELECT doc_id, batch,
        |      list_filter(string_split(et, ' '), t -> t <> '') AS ws
        |    FROM surv)
        |  WHERE len(ws) >= 1),
        |dgrams AS (
        |  SELECT doc_id, batch, unnest(ws) AS g FROM dtoks
        |  UNION ALL
        |  SELECT doc_id, batch, ws[i] || ' ' || ws[i + 1] AS g FROM (
        |    SELECT doc_id, batch, ws,
        |      unnest(generate_series(1, len(ws) - 1)) AS i
        |    FROM dtoks WHERE len(ws) >= 2)),
        |dgb AS (
        |  SELECT doc_id, batch,
        |    CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 1024 AS bucket
        |  FROM dgrams),
        |draw AS (SELECT batch, bucket, count(*) AS cr,
        |           count(*) FILTER (WHERE doc_id % 13 = 0) AS ct
        |         FROM dgb GROUP BY 1, 2),
        |dtot AS (SELECT batch, count(*) AS nr,
        |           count(*) FILTER (WHERE doc_id % 13 = 0) AS nt
        |         FROM dgb GROUP BY 1),
        |dmodel AS (
        |  SELECT r.batch, r.bucket,
        |    round(ln((ct + 1.0) / CAST(nt + 1024 AS DOUBLE)) -
        |          ln((cr + 1.0) / CAST(nr + 1024 AS DOUBLE)), 9) AS lr
        |  FROM draw r JOIN dtot USING (batch)),
        |ddb AS (SELECT doc_id, batch, bucket, count(*) AS c
        |        FROM dgb GROUP BY 1, 2, 3),
        |dw AS (
        |  SELECT doc_id, ddb.batch,
        |    round(CAST(sum(CAST(c AS DECIMAL(12,0)) *
        |                   CAST(lr AS DECIMAL(12,9))) AS DOUBLE), 6) AS log_w
        |  FROM ddb JOIN dmodel USING (batch, bucket) GROUP BY 1, 2),
        |sel AS (
        |  SELECT doc_id, log_w FROM (
        |    SELECT doc_id, log_w,
        |      row_number() OVER (PARTITION BY batch ORDER BY
        |        round(log_w - ln(-ln(
        |          (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |             AS BIGINT) % 4503599627370496 + 0.5)
        |          / 4503599627370496.0)), 9) DESC, doc_id) AS rn
        |    FROM dw)
        |  WHERE rn <= 40),
        |win AS (
        |  SELECT s.doc_id, s.source, s.batch, s.lang_pred, sel.log_w,
        |    CAST(len(list_filter(string_split_regex(lower(trim(s.et)),
        |      '\s+'), t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM surv s JOIN sel USING (doc_id))
        |SELECT doc_id, source, lang_pred, log_w, n_tokens,
        |  CAST(floor(cum_before / 512.0) AS BIGINT) AS pack_id,
        |  cum_before % 512 AS pack_offset, batch
        |FROM (
        |  SELECT doc_id, source, batch, lang_pred, log_w, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY batch, source
        |      ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
        |  FROM win)""".stripMargin,
    // identical integer bit arithmetic: col j of the Morton code owns bits 2i+j.
    "z01_zorder_key" ->
      """SELECT event_id,
        |  CAST(list_sum(list_transform(range(0, 8),
        |    i -> (((ub >> i) & 1) << (2*i)) + (((vb >> i) & 1) << (2*i + 1))))
        |    AS BIGINT) AS zv
        |FROM (SELECT event_id, user_id % 256 AS ub,
        |        least(greatest(CAST(floor(value / 2.0) AS BIGINT), 0), 255) AS vb
        |      FROM events)""".stripMargin,
    // thresholds are the 15-hex-digit images of frac(2.3) and frac(0.4) in the
    // 60-bit md5 space (computed with the same IEEE arithmetic as the Scala side)
    "t08_weighted_mix" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |    CASE WHEN source = 'src0' THEN 2 WHEN source = 'src1' THEN 0 ELSE 1 END
        |      + CASE WHEN source = 'src0'
        |               AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) < '4cccccccccccc00'
        |             THEN 1
        |             WHEN source = 'src1'
        |               AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) < '666666666666680'
        |             THEN 1
        |             ELSE 0 END AS n
        |  FROM documents)
        |SELECT doc_id, source, unnest(range(0, n)) AS epoch FROM b""".stripMargin,
    "o05_topk_per_group" ->
      """SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber FROM (
        |  SELECT l_returnflag, l_quantity, l_orderkey,
        |    CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity DESC, l_orderkey DESC, l_linenumber DESC) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3""".stripMargin,
    "p02_bottomk_sketch" ->
      """WITH h AS (SELECT source, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
        |SELECT source,
        |  unnest(list_slice(list_sort(list_distinct(list(h))), 1, 4)) AS h
        |FROM h GROUP BY source""".stripMargin,
    "o04_interval_overlap" ->
      """SELECT a.o_orderkey, count(*) AS n_concurrent
        |FROM orders a JOIN orders b
        |  ON CAST(a.o_orderdate AS DATE) <= CAST(b.o_orderdate AS DATE) + 3
        | AND CAST(b.o_orderdate AS DATE) <= CAST(a.o_orderdate AS DATE) + 3
        | AND a.o_orderkey <> b.o_orderkey
        |WHERE a.o_orderdate BETWEEN '1995-03-01' AND '1995-03-31'
        |GROUP BY a.o_orderkey""".stripMargin,
    "o07_interval_pairs" ->
      """SELECT a.o_orderkey AS a_key, b.o_orderkey AS b_key
        |FROM orders a JOIN orders b
        |  ON CAST(a.o_orderdate AS DATE) <= CAST(b.o_orderdate AS DATE) + 3
        | AND CAST(b.o_orderdate AS DATE) <= CAST(a.o_orderdate AS DATE) + 3
        | AND a.o_orderkey < b.o_orderkey
        |WHERE a.o_orderdate BETWEEN '1995-03-01' AND '1995-03-07'
        |  AND b.o_orderdate BETWEEN '1995-03-01' AND '1995-03-07'""".stripMargin,
    "o03_range_join" ->
      """SELECT o_orderkey, count(*) AS n_pts,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM orders o JOIN lineitem l
        |  ON CAST(l.l_shipdate AS DATE) BETWEEN CAST(o.o_orderdate AS DATE)
        |     AND CAST(o.o_orderdate AS DATE) + 3
        |WHERE l.l_shipdate BETWEEN '1995-03-01' AND '1995-03-31'
        |GROUP BY o_orderkey""".stripMargin,
    "t01_text_features" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS toks,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in',
        |      'is','are','was','on','for','with','as','at','by','it','this','that')))
        |      AS DOUBLE) AS n_stop,
        |    CAST(len(list_filter(toks, t -> t IN ('the','and','of','to','in','is','that',
        |      'it','was','for','with','as','his','they','at'))) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','un','una',
        |      'los','las','se','del','por','con','no'))) AS BIGINT) AS s_es,
        |    CAST(len(list_filter(toks, t -> t IN ('le','la','les','de','des','et','un',
        |      'une','du','est','que','pour','dans','qui','pas'))) AS BIGINT) AS s_fr,
        |    CAST(len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht',
        |      'ein','eine','mit','auf','für','den','von','zu','im'))) AS BIGINT) AS s_de,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT)
        |      AS n_bpe,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_letters,
        |    CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper
        |  FROM f)
        |SELECT doc_id,
        |  CASE WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'und'
        |       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
        |       WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
        |       WHEN s_fr >= s_de THEN 'fr'
        |       ELSE 'de' END AS lang_pred,
        |  n_tokens, n_bpe AS n_bpe_tokens,
        |  round(
        |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4 +
        |    least((CASE WHEN n_tokens = 0 THEN 0.0 ELSE n_stop / n_tokens END) * 5.0, 1.0)
        |      * 0.3 +
        |    greatest(0.0, 1.0 - (CASE WHEN n_chars = 0 THEN 0.0
        |      ELSE CAST(n_punct AS DOUBLE) / n_chars END) * 4.0) * 0.2 +
        |    greatest(0.0, 1.0 - (CASE WHEN n_letters = 0 THEN 0.0
        |      ELSE CAST(n_upper AS DOUBLE) / n_letters END)) * 0.1,
        |  6) AS quality
        |FROM g""".stripMargin,
    // m01's decoder is REAL (javax.imageio over genuine PNG bytes). The fixture
    // image is closed-form in doc_id — width = id%16+4, height = id%12+4,
    // sample(x,y,c) = (id*31 + x*7 + y*13 + c*5) % 256 — and PNG is lossless,
    // so the oracle recomputes the exact decoded features without a PNG decoder.
    // Division order (sum / pixels / 255) matches the Scala side bit-for-bit.
    "m01_media_features" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 16 + 4 AS INTEGER) AS width,
        |    CAST(doc_id % 12 + 4 AS INTEGER) AS height
        |  FROM documents),
        |s AS (
        |  SELECT media_id, width, height,
        |    list_sum(flatten(list_transform(range(0, height), y ->
        |      list_transform(range(0, width), x ->
        |        (media_id*31 + x*7 + y*13) % 256
        |        + (media_id*31 + x*7 + y*13 + 5) % 256
        |        + (media_id*31 + x*7 + y*13 + 10) % 256)))) AS total
        |  FROM d)
        |SELECT media_id, 'image' AS media_type, width, height,
        |  CAST(3 AS INTEGER) AS channels,
        |  CAST(total AS DOUBLE) / CAST(width*height*3 AS DOUBLE) / 255.0
        |    AS mean_intensity
        |FROM s""".stripMargin,
    // m04's decoder is REAL (javax.sound.sampled over genuine RIFF/WAVE
    // bytes). The fixture is closed-form in doc_id — n = id%256+64 samples,
    // rate by id%4, sample(i) = (id*31 + i*17) % 2003 - 1001 — and WAV PCM is
    // lossless, so the oracle recomputes the decoded features without an
    // audio decoder. Sum of squares is exact integer; the doubles are the
    // same two divisions + sqrt on both sides.
    "m04_audio_features" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 256 + 64 AS BIGINT) AS n_samples,
        |    CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 11025
        |         WHEN 2 THEN 16000 ELSE 22050 END AS INTEGER) AS sample_rate
        |  FROM documents),
        |s AS (
        |  SELECT media_id, n_samples, sample_rate,
        |    list_sum(list_transform(range(0, n_samples), i ->
        |      ((media_id*31 + i*17) % 2003 - 1001)
        |      * ((media_id*31 + i*17) % 2003 - 1001))) AS ss
        |  FROM d)
        |SELECT media_id, 'audio' AS media_type, sample_rate,
        |  CAST(1 AS INTEGER) AS channels, CAST(16 AS INTEGER) AS bits,
        |  n_samples,
        |  CAST(n_samples AS DOUBLE) / sample_rate AS duration_sec,
        |  sqrt(CAST(ss AS DOUBLE) / n_samples) AS rms
        |FROM s""".stripMargin,
    // m05: sampled frames decode REAL PNGs; frame key fk = media_id*1000 + f
    // makes width/height/pixels closed-form per frame, same argument as m01.
    "m05_video_frames" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, CAST(doc_id % 6 + 2 AS INTEGER) AS nf
        |  FROM documents),
        |f AS (
        |  SELECT media_id,
        |    CAST(unnest(list_filter(range(0, nf), i -> i % 2 = 0)) AS INTEGER)
        |      AS frame_idx
        |  FROM d),
        |g AS (
        |  SELECT media_id, frame_idx, media_id*1000 + frame_idx AS fk FROM f),
        |h AS (
        |  SELECT media_id, frame_idx,
        |    CAST(fk % 16 + 4 AS INTEGER) AS width,
        |    CAST(fk % 12 + 4 AS INTEGER) AS height, fk
        |  FROM g),
        |s AS (
        |  SELECT media_id, frame_idx, width, height,
        |    list_sum(flatten(list_transform(range(0, height), y ->
        |      list_transform(range(0, width), x ->
        |        (fk*31 + x*7 + y*13) % 256
        |        + (fk*31 + x*7 + y*13 + 5) % 256
        |        + (fk*31 + x*7 + y*13 + 10) % 256)))) AS total
        |  FROM h)
        |SELECT media_id, frame_idx, width, height,
        |  CAST(total AS DOUBLE) / CAST(width*height*3 AS DOUBLE) / 255.0
        |    AS mean_intensity
        |FROM s""".stripMargin,
    // m06: GIF frames are 8-bit gray (r=g=b), so the decoder's RGB-plane sum is
    // exactly 3x the gray sum; the oracle mirrors the same integers and the
    // same IEEE division order (3*S) / (w*h*3) / 255.
    "m06_gif_frames" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, CAST(doc_id % 6 + 2 AS INTEGER) AS nf,
        |    CAST(doc_id % 16 + 4 AS INTEGER) AS width,
        |    CAST(doc_id % 12 + 4 AS INTEGER) AS height
        |  FROM documents),
        |f AS (
        |  SELECT media_id, width, height,
        |    CAST(unnest(list_filter(range(0, nf), i -> i % 2 = 0)) AS INTEGER)
        |      AS frame_idx
        |  FROM d),
        |s AS (
        |  SELECT media_id, frame_idx, width, height,
        |    3 * list_sum(flatten(list_transform(range(0, height), y ->
        |      list_transform(range(0, width), x ->
        |        (media_id*31 + frame_idx*97 + x*7 + y*13) % 256)))) AS total
        |  FROM f)
        |SELECT media_id, frame_idx, width, height,
        |  CAST(total AS DOUBLE) / CAST(width*height*3 AS DOUBLE) / 255.0
        |    AS mean_intensity
        |FROM s""".stripMargin,
    "m03_frame_sample" ->
      """SELECT media_id, n_frames,
        |  unnest(list_filter(range(0, n_frames), i -> i % 2 = 0)) AS frame_idx
        |FROM (SELECT doc_id AS media_id,
        |        greatest(CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT), 1)
        |          AS n_frames
        |      FROM documents)""".stripMargin,
    "t03_train_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 0.8 THEN 'train'
        |       WHEN b < 0.9 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS DOUBLE)
        |          / 4294967296.0 AS b
        |      FROM documents)""".stripMargin,
    "t02_token_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_actual,
        |  CAST(length(text) AS BIGINT) - CAST(length(replace(text, ' ', '')) AS BIGINT) + 1
        |    AS n_words
        |FROM documents""".stripMargin,
    "m02_media_bytes" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS payload_sha
        |FROM documents""".stripMargin,
    // latest-wins merge reproduced with the same union + one-window plan; the
    // +1.0 price bump is a single IEEE double add, identical on both engines.
    "u01_cdc_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderpriority FROM orders),
        |chg AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_totalprice + 1.0 AS o_totalprice, o_orderpriority,
        |    'U' AS op, 1 AS seq FROM base WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderpriority, 'D', 2 FROM base WHERE o_orderkey % 13 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderpriority, 'I', 1 FROM base WHERE o_orderkey % 11 = 0),
        |u AS (
        |  SELECT *, 0 AS pri, 0 AS seq, '' AS op FROM base
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderpriority, 1 AS pri, seq, op FROM chg),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY pri DESC, seq DESC, (op = 'D') DESC) AS rn FROM u)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderpriority
        |FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin,
    "u02_scd2_history" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |chg AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 1.0 AS o_totalprice,
        |    'U' AS op, 1 AS seq FROM base WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, 'D', 2
        |  FROM base WHERE o_orderkey % 13 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice, 'I', 1
        |  FROM base WHERE o_orderkey % 11 = 0),
        |u AS (
        |  SELECT *, 0 AS seq, '' AS op FROM base
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, seq, op FROM chg),
        |v AS (
        |  SELECT *, lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq)
        |    AS valid_to
        |  FROM u)
        |SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(seq AS BIGINT) AS valid_from, CAST(valid_to AS BIGINT) AS valid_to,
        |  CAST(valid_to IS NULL AS INTEGER) AS is_current
        |FROM v WHERE op <> 'D'""".stripMargin,
    // identical running-conditional-min sequencing; strict > keeps same-instant
    // stage pairs from counting on both engines.
    "e01_funnel" ->
      """WITH w1 AS (
        |  SELECT user_id, ts, event_type, event_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS s0
        |  FROM events),
        |w2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > s0 THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS s1
        |  FROM w1),
        |w3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > s1 THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS s2
        |  FROM w2)
        |SELECT user_id, min(s0) AS first_view, min(s1) AS first_click,
        |  min(s2) AS first_purchase,
        |  CAST(min(s0) IS NOT NULL AS BIGINT) + CAST(min(s1) IS NOT NULL AS BIGINT)
        |    + CAST(min(s2) IS NOT NULL AS BIGINT) AS funnel_depth
        |FROM w3 GROUP BY user_id""".stripMargin,
    "f01_normalize" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CASE WHEN mx = mn THEN 0.0
        |       ELSE (o_totalprice - mn) / (mx - mn) END AS o_totalprice_norm
        |FROM (SELECT o_orderkey, o_orderpriority, o_totalprice,
        |        min(o_totalprice) OVER (PARTITION BY o_orderpriority) AS mn,
        |        max(o_totalprice) OVER (PARTITION BY o_orderpriority) AS mx
        |      FROM orders)""".stripMargin,
    // same whitespace tokenization as d05/c01; score is (tf*N)/df in double —
    // two exactly-rounded IEEE ops on integers, no log.
    "x01_tfidf" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT source, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (
        |  SELECT term, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT source, term, tf, df,
        |    (CAST(tf AS DOUBLE) * CAST(n AS DOUBLE)) / CAST(df AS DOUBLE)
        |      AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY score DESC, term) AS rn FROM scored)
        |SELECT source, term, tf, df, score, CAST(rn AS BIGINT) AS rank
        |FROM r WHERE rn <= 5""".stripMargin,
    "p03_histogram" ->
      """SELECT CAST(floor((o_totalprice - 0.0) / 50000.0) AS BIGINT) AS bucket,
        |  0.0 + CAST(floor((o_totalprice - 0.0) / 50000.0) AS DOUBLE) * 50000.0
        |    AS bucket_lo,
        |  count(*) AS n
        |FROM orders WHERE o_totalprice IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    // capacity > distinct langs per source → the sketch is exact (see p04 note).
    "p04_freq_items" ->
      """SELECT source, lang, count(*) AS cnt FROM documents
        |WHERE lang IS NOT NULL GROUP BY 1, 2""".stripMargin,
    // same chunking (non-overlapping 4-word windows, slice clipped at the
    // tail), same first-owner rule (min doc_id then pos), same reassembly.
    "t10_passage_dedup" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')
        |      AS words
        |  FROM documents WHERE text IS NOT NULL),
        |ch AS (
        |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
        |    list_aggregate(words[(i-1)*4+1 : i*4], 'string_agg', ' ') AS chunk
        |  FROM w, unnest(range(1, CAST(ceil(len(words)/4.0) AS BIGINT) + 1)) AS t(i)
        |  WHERE len(words) > 0),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY chunk
        |    ORDER BY doc_id, pos) AS rn
        |  FROM ch)
        |SELECT doc_id, count(*) AS n_chunks,
        |  count(*) FILTER (rn > 1) AS n_removed,
        |  coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (rn = 1), '')
        |    AS clean_text
        |FROM ranked GROUP BY doc_id""".stripMargin,
    // the Bloom filter only PRUNES; the join result is the plain inner join.
    "o06_bloom_join" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_extendedprice, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000.0""".stripMargin,
    // exact decimal moments, then the identical IEEE expression tree.
    "f02_outliers" ->
      """WITH stats AS (
        |  SELECT event_type,
        |    count(value) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
        |      AS DOUBLE) AS s2
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT event_type, s1 / n AS mean,
        |    s2 / n - (s1 / n) * (s1 / n) AS var
        |  FROM stats)
        |SELECT event_id, e.event_type, value,
        |  round((value - mean) / sqrt(var), 4) AS z
        |FROM events e JOIN m ON e.event_type IS NOT DISTINCT FROM m.event_type
        |WHERE var > 0.0 AND abs(value - mean) > 2.5 * sqrt(var)""".stripMargin,
    // same seeds, same monotone score (a·c - |c|²/2, ties to lowest cid),
    // same exact-decimal mean — the centroids must agree bit-for-bit. Seeds
    // are derived exactly as the operator does (k lowest vec_ids via ORDER BY
    // + LIMIT), not a hardcoded id predicate that assumes 0-based contiguity.
    // x03: parallel unnests zip value with ordinal; the sign is the parity
    // of md5's first hex digit — exactly Projection.sign's construction.
    // Sums are exact BIGINTs; the one division's divisor (1e6 * sqrt(16))
    // is binary-exact, so y matches Spark bit-for-bit.
    "x03_random_projection" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    unnest(embedding) AS x,
        |    unnest(range(1, len(embedding) + 1)) AS j
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, j,
        |    CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS qx
        |  FROM e),
        |ks AS (SELECT unnest(range(1, 17)) AS k),
        |s AS (
        |  SELECT vec_id, k,
        |    sum(CASE WHEN substr(md5(j || '_' || k), 1, 1)
        |               IN ('0','2','4','6','8','a','c','e')
        |             THEN qx ELSE -qx END) AS qsum
        |  FROM q CROSS JOIN ks GROUP BY 1, 2)
        |SELECT vec_id, CAST(k AS INT) AS k,
        |  CAST(qsum AS DOUBLE) / 4000000 AS y
        |FROM s""".stripMargin,
    // s05: s04's blocks + the coarse stage — cells/probes from the
    // id-ordered sample quantizer (rn = 1 / rn <= nprobe over the same
    // argmax score, ties to the lowest cell — the engine's first-max and
    // idx-asc-slice contracts), candidate pairs restricted to probed cells.
    "s05_ann_ivfpq" ->
      """WITH coarse AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ccell,
        |         CAST(embedding AS DOUBLE[]) AS ccv
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        ORDER BY vec_id LIMIT 16)),
        |cells AS (
        |  SELECT vec_id, ccell FROM (
        |    SELECT s.vec_id, c.ccell,
        |      row_number() OVER (PARTITION BY s.vec_id
        |        ORDER BY list_dot_product(CAST(s.embedding AS DOUBLE[]), c.ccv)
        |               - list_dot_product(c.ccv, c.ccv) / 2 DESC, c.ccell)
        |        AS rn
        |    FROM embeddings s CROSS JOIN coarse c)
        |  WHERE rn = 1),
        |qprobes AS (
        |  SELECT vec_id AS query_id, ccell FROM (
        |    SELECT s.vec_id, c.ccell,
        |      row_number() OVER (PARTITION BY s.vec_id
        |        ORDER BY list_dot_product(CAST(s.embedding AS DOUBLE[]), c.ccv)
        |               - list_dot_product(c.ccv, c.ccv) / 2 DESC, c.ccell)
        |        AS rn
        |    FROM embeddings s CROSS JOIN coarse c WHERE s.vec_id < 8)
        |  WHERE rn <= 4),
        |sub AS (
        |  SELECT vec_id, m,
        |    embedding[m * 8 + 1 : m * 8 + 8] AS svf,
        |    CAST(embedding[m * 8 + 1 : m * 8 + 8] AS DOUBLE[]) AS sv
        |  FROM embeddings, range(0, 8) t(m)),
        |seeds AS (
        |  SELECT m, row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1
        |           AS cl, sv
        |  FROM sub WHERE vec_id IN
        |    (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |assign AS (
        |  SELECT vec_id, m, cl FROM (
        |    SELECT s.vec_id, s.m, c.cl,
        |      row_number() OVER (PARTITION BY s.vec_id, s.m
        |        ORDER BY list_dot_product(s.sv, c.sv)
        |                 - list_dot_product(c.sv, c.sv) / 2 DESC, c.cl) AS rn
        |    FROM sub s JOIN seeds c USING (m))
        |  WHERE rn = 1),
        |cb AS (
        |  SELECT m, cl, list(centroid ORDER BY i) AS cv FROM (
        |    SELECT a.m, a.cl, i,
        |      round(CAST(sum(CAST(s.svf[i] AS DECIMAL(27,10))) AS DOUBLE)
        |        / count(*), 6) AS centroid
        |    FROM assign a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m,
        |         unnest(range(1, 9)) t(i)
        |    GROUP BY 1, 2, 3)
        |  GROUP BY 1, 2),
        |codes AS (
        |  SELECT vec_id, m, cl FROM (
        |    SELECT s.vec_id, s.m, c.cl,
        |      row_number() OVER (PARTITION BY s.vec_id, s.m
        |        ORDER BY list_dot_product(s.sv, c.cv)
        |                 - list_dot_product(c.cv, c.cv) / 2 DESC, c.cl) AS rn
        |    FROM sub s JOIN cb c USING (m))
        |  WHERE rn = 1),
        |dt AS (
        |  SELECT s.vec_id AS query_id, s.m, c.cl,
        |    CAST(round(list_dot_product(s.sv, c.cv), 9) AS DECIMAL(20,9)) AS e
        |  FROM sub s JOIN cb c USING (m) WHERE s.vec_id < 8),
        |sc AS (
        |  SELECT d.query_id, x.vec_id AS neighbor_id, sum(d.e) AS adot
        |  FROM codes x
        |  JOIN cells cl2 ON cl2.vec_id = x.vec_id
        |  JOIN qprobes p ON p.ccell = cl2.ccell
        |  JOIN dt d ON d.query_id = p.query_id AND d.m = x.m AND d.cl = x.cl
        |  WHERE x.vec_id <> d.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id,
        |  round(CAST(adot AS DOUBLE), 6) AS approx_dot,
        |  CAST(rank AS BIGINT) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY adot DESC, neighbor_id) AS rank FROM sc)
        |WHERE rank <= 5""".stripMargin,
    // s06: s05's coarse/cells/probes, then the residual pipeline — rv =
    // double(x) − ccv of the assigned cell (exact IEEE subtraction),
    // codebooks trained on residual subvectors with seeds OFFSET past the
    // coarse prefix (whose own residuals are identically zero), ADC tables
    // from the RAW query subvectors, plus one round(q·centroid, 9) scalar
    // per probed cell: score = qcd + Σ_m e, an exact (m+1)-term decimal sum.
    "s06_ann_ivfpq_residual" ->
      """WITH coarse AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ccell,
        |         CAST(embedding AS DOUBLE[]) AS ccv
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        ORDER BY vec_id LIMIT 16)),
        |cells AS (
        |  SELECT vec_id, ccell FROM (
        |    SELECT s.vec_id, c.ccell,
        |      row_number() OVER (PARTITION BY s.vec_id
        |        ORDER BY list_dot_product(CAST(s.embedding AS DOUBLE[]), c.ccv)
        |               - list_dot_product(c.ccv, c.ccv) / 2 DESC, c.ccell)
        |        AS rn
        |    FROM embeddings s CROSS JOIN coarse c)
        |  WHERE rn = 1),
        |qprobes AS (
        |  SELECT vec_id AS query_id, ccell FROM (
        |    SELECT s.vec_id, c.ccell,
        |      row_number() OVER (PARTITION BY s.vec_id
        |        ORDER BY list_dot_product(CAST(s.embedding AS DOUBLE[]), c.ccv)
        |               - list_dot_product(c.ccv, c.ccv) / 2 DESC, c.ccell)
        |        AS rn
        |    FROM embeddings s CROSS JOIN coarse c WHERE s.vec_id < 8)
        |  WHERE rn <= 4),
        |resid AS (
        |  SELECT e.vec_id, cl.ccell,
        |    list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) - c.ccv[i]) AS rv
        |  FROM embeddings e
        |  JOIN cells cl ON cl.vec_id = e.vec_id
        |  JOIN coarse c ON c.ccell = cl.ccell),
        |rsub AS (
        |  SELECT vec_id, m, rv[m * 8 + 1 : m * 8 + 8] AS sv
        |  FROM resid, range(0, 8) t(m)),
        |seeds AS (
        |  SELECT m, row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1
        |           AS cl, sv
        |  FROM rsub WHERE vec_id IN
        |    (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16 OFFSET 16)),
        |assign AS (
        |  SELECT vec_id, m, cl FROM (
        |    SELECT s.vec_id, s.m, c.cl,
        |      row_number() OVER (PARTITION BY s.vec_id, s.m
        |        ORDER BY list_dot_product(s.sv, c.sv)
        |                 - list_dot_product(c.sv, c.sv) / 2 DESC, c.cl) AS rn
        |    FROM rsub s JOIN seeds c USING (m))
        |  WHERE rn = 1),
        |cb AS (
        |  SELECT m, cl, list(centroid ORDER BY i) AS cv FROM (
        |    SELECT a.m, a.cl, i,
        |      round(CAST(sum(CAST(s.sv[i] AS DECIMAL(27,10))) AS DOUBLE)
        |        / count(*), 6) AS centroid
        |    FROM assign a JOIN rsub s ON s.vec_id = a.vec_id AND s.m = a.m,
        |         unnest(range(1, 9)) t(i)
        |    GROUP BY 1, 2, 3)
        |  GROUP BY 1, 2),
        |codes AS (
        |  SELECT vec_id, m, cl FROM (
        |    SELECT s.vec_id, s.m, c.cl,
        |      row_number() OVER (PARTITION BY s.vec_id, s.m
        |        ORDER BY list_dot_product(s.sv, c.cv)
        |                 - list_dot_product(c.cv, c.cv) / 2 DESC, c.cl) AS rn
        |    FROM rsub s JOIN cb c USING (m))
        |  WHERE rn = 1),
        |dt AS (
        |  SELECT q.vec_id AS query_id, c.m, c.cl,
        |    CAST(round(list_dot_product(
        |      CAST(q.embedding[c.m * 8 + 1 : c.m * 8 + 8] AS DOUBLE[]), c.cv),
        |      9) AS DECIMAL(20,9)) AS e
        |  FROM embeddings q CROSS JOIN cb c WHERE q.vec_id < 8),
        |qc AS (
        |  SELECT q.vec_id AS query_id, c.ccell,
        |    CAST(round(list_dot_product(CAST(q.embedding AS DOUBLE[]), c.ccv),
        |      9) AS DECIMAL(20,9)) AS qcd
        |  FROM embeddings q CROSS JOIN coarse c WHERE q.vec_id < 8),
        |sc AS (
        |  SELECT d.query_id, x.vec_id AS neighbor_id,
        |    max(q2.qcd) + sum(d.e) AS adot
        |  FROM codes x
        |  JOIN cells cl2 ON cl2.vec_id = x.vec_id
        |  JOIN qprobes p ON p.ccell = cl2.ccell
        |  JOIN dt d ON d.query_id = p.query_id AND d.m = x.m AND d.cl = x.cl
        |  JOIN qc q2 ON q2.query_id = p.query_id AND q2.ccell = cl2.ccell
        |  WHERE x.vec_id <> d.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id,
        |  round(CAST(adot AS DOUBLE), 6) AS approx_dot,
        |  CAST(rank AS BIGINT) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY adot DESC, neighbor_id) AS rank FROM sc)
        |WHERE rank <= 5""".stripMargin,
    // s04: per-subspace kmeansStep (the x02 oracle block generalized over
    // m), first-max assignment ties to the lowest cluster, ADC table
    // entries quantized at 1e-9 per (query, subspace, codeword), per-pair
    // scores as exact decimal sums of m entries.
    "s04_ann_pq" ->
      """WITH sub AS (
        |  SELECT vec_id, m,
        |    embedding[m * 8 + 1 : m * 8 + 8] AS svf,
        |    CAST(embedding[m * 8 + 1 : m * 8 + 8] AS DOUBLE[]) AS sv
        |  FROM embeddings, range(0, 8) t(m)),
        |seeds AS (
        |  SELECT m, row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1
        |           AS cl, sv
        |  FROM sub WHERE vec_id IN
        |    (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |assign AS (
        |  SELECT vec_id, m, cl FROM (
        |    SELECT s.vec_id, s.m, c.cl,
        |      row_number() OVER (PARTITION BY s.vec_id, s.m
        |        ORDER BY list_dot_product(s.sv, c.sv)
        |                 - list_dot_product(c.sv, c.sv) / 2 DESC, c.cl) AS rn
        |    FROM sub s JOIN seeds c USING (m))
        |  WHERE rn = 1),
        |cb AS (
        |  SELECT m, cl, list(centroid ORDER BY i) AS cv FROM (
        |    SELECT a.m, a.cl, i,
        |      round(CAST(sum(CAST(s.svf[i] AS DECIMAL(27,10))) AS DOUBLE)
        |        / count(*), 6) AS centroid
        |    FROM assign a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m,
        |         unnest(range(1, 9)) t(i)
        |    GROUP BY 1, 2, 3)
        |  GROUP BY 1, 2),
        |codes AS (
        |  SELECT vec_id, m, cl FROM (
        |    SELECT s.vec_id, s.m, c.cl,
        |      row_number() OVER (PARTITION BY s.vec_id, s.m
        |        ORDER BY list_dot_product(s.sv, c.cv)
        |                 - list_dot_product(c.cv, c.cv) / 2 DESC, c.cl) AS rn
        |    FROM sub s JOIN cb c USING (m))
        |  WHERE rn = 1),
        |dt AS (
        |  SELECT s.vec_id AS query_id, s.m, c.cl,
        |    CAST(round(list_dot_product(s.sv, c.cv), 9) AS DECIMAL(20,9)) AS e
        |  FROM sub s JOIN cb c USING (m) WHERE s.vec_id < 8),
        |sc AS (
        |  SELECT d.query_id, x.vec_id AS neighbor_id, sum(d.e) AS adot
        |  FROM codes x JOIN dt d ON d.m = x.m AND d.cl = x.cl
        |  WHERE x.vec_id <> d.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id,
        |  round(CAST(adot AS DOUBLE), 6) AS approx_dot,
        |  CAST(rank AS BIGINT) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY adot DESC, neighbor_id) AS rank FROM sc)
        |WHERE rank <= 5""".stripMargin,
    "x02_kmeans_step" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv,
        |    list_dot_product(CAST(embedding AS DOUBLE[]),
        |                     CAST(embedding AS DOUBLE[])) / 2 AS cn2h
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        ORDER BY vec_id LIMIT 8)),
        |scored AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv) - c.cn2h
        |      AS score
        |  FROM embeddings e CROSS JOIN cents c),
        |assign AS (
        |  SELECT vec_id, embedding, cid,
        |    row_number() OVER (PARTITION BY vec_id
        |                       ORDER BY score DESC, cid) AS rn
        |  FROM scored)
        |SELECT CAST(cid AS BIGINT) AS cluster,
        |  CAST(i - 1 AS BIGINT) AS dim_idx, count(*) AS n,
        |  round(CAST(sum(CAST(embedding[i] AS DECIMAL(27,10))) AS DOUBLE)
        |    / count(*), 6) AS centroid
        |FROM assign, unnest(range(1, len(embedding) + 1)) AS t(i)
        |WHERE rn = 1
        |GROUP BY 1, 2""".stripMargin,
    // percent_rank = (rank-1)/(n-1): rank arithmetic, engine-independent.
    "t11_length_band" ->
      """WITH x AS (
        |  SELECT doc_id, lang,
        |    CAST(length(text) AS BIGINT)
        |      - CAST(length(replace(text, ' ', '')) AS BIGINT) + 1 AS n_words
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (
        |  SELECT *, percent_rank() OVER (PARTITION BY lang ORDER BY n_words)
        |    AS pr FROM x)
        |SELECT doc_id, lang, n_words, round(pr, 6) AS pr
        |FROM r WHERE pr >= 0.05 AND pr <= 0.95""".stripMargin,
    "q42_range_frame" ->
      """SELECT event_id, user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |  count(*) OVER w AS n_7d,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_7d
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q41_listagg" ->
      """SELECT l_orderkey,
        |  string_agg(CAST(CAST(l_linenumber AS BIGINT) AS VARCHAR), ','
        |    ORDER BY l_linenumber) AS line_numbers,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY 1""".stripMargin,
    // every event belongs to the 30-min-aligned window starting at its bucket
    // and the one 30 minutes earlier — exactly Spark's hop expansion.
    "q40_hopping_window" ->
      """WITH x AS (
        |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, value
        |  FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value
        |  FROM events)
        |SELECT window_start, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM x GROUP BY 1""".stripMargin,
    // the oracle computes the same scalars relationally — no map type needed.
    "q39_map_funcs" ->
      """WITH per AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS k,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS v
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_orderkey,
        |  count(*) AS n_lines,
        |  CAST(max(CASE WHEN k = 1 THEN v END) AS DOUBLE) AS qty_line1,
        |  coalesce(CAST(max(CASE WHEN k = 99 THEN v END) AS DOUBLE), -1.0)
        |    AS qty_line99_or_default,
        |  max(k) AS max_line
        |FROM per GROUP BY 1""".stripMargin,
    "q38_array_funcs" ->
      """WITH g AS (
        |  SELECT l_orderkey,
        |    list_sort(list(CAST(l_quantity AS DECIMAL(18,2)))) AS qs
        |  FROM lineitem GROUP BY 1)
        |SELECT l_orderkey,
        |  CAST(len(qs) AS BIGINT) AS n_items,
        |  CAST(qs[1] AS DOUBLE) AS min_qty,
        |  CAST(qs[-1] AS DOUBLE) AS max_qty,
        |  CAST(list_reduce(list_prepend(CAST(0 AS DECIMAL(18,2)), qs),
        |    (a, x) -> a + x) AS DOUBLE) AS sum_qty,
        |  CAST(len(list_filter(qs, x -> x > 25)) AS BIGINT) AS n_over_25
        |FROM g""".stripMargin,
    "e03_gap_fill" ->
      """WITH counts AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
        |  FROM events WHERE value > 195 GROUP BY 1, 2),
        |spine AS (
        |  SELECT unnest(generate_series(min(day), max(day),
        |    INTERVAL 1 DAY))::DATE AS day FROM counts),
        |grid AS (
        |  SELECT s.day, g.event_type
        |  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM counts) g)
        |SELECT grid.day, grid.event_type, coalesce(c.n, 0) AS n
        |FROM grid LEFT JOIN counts c
        |  ON grid.day = c.day AND grid.event_type = c.event_type""".stripMargin,
    "e02_retention" ->
      """WITH s AS (
        |  SELECT user_id, min(ts) AS cohort_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |a AS (
        |  SELECT e.user_id, CAST(s.cohort_ts AS DATE) AS cohort_date,
        |    CAST(floor(datediff('day', CAST(s.cohort_ts AS DATE),
        |      CAST(e.ts AS DATE)) / 7.0) AS BIGINT) AS week_offset
        |  FROM events e JOIN s USING (user_id)
        |  WHERE e.ts >= s.cohort_ts)
        |SELECT cohort_date, week_offset, count(DISTINCT user_id) AS n_active
        |FROM a GROUP BY 1, 2""".stripMargin,
    // the oracle compares canonicalized tuples directly where Spark compares
    // their md5 row hashes — identical verdicts absent md5 collisions (the
    // same caveat d02 documents for xxhash64).
    "v01_reconcile" ->
      """WITH canon AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |    o_orderstatus AS status_c, o_orderpriority AS pri
        |  FROM orders),
        |b AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 1000 = 0 THEN price + 1 ELSE price END
        |      AS price,
        |    status_c, pri
        |  FROM canon WHERE o_orderkey % 997 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, price, status_c, pri
        |  FROM canon WHERE o_orderkey % 999 = 0),
        |j AS (
        |  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |    CASE WHEN b.o_orderkey IS NULL THEN 'missing_in_b'
        |         WHEN a.o_orderkey IS NULL THEN 'missing_in_a'
        |         WHEN a.o_custkey <> b.o_custkey OR a.price <> b.price
        |           OR a.status_c <> b.status_c OR a.pri <> b.pri
        |           THEN 'mismatch' END AS status
        |  FROM canon a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
        |SELECT o_orderkey, status FROM j WHERE status IS NOT NULL""".stripMargin,
    // v02: counts and smoothed denominators are integers, the probability
    // divisions single IEEE ops; ln is quantized at 1e-9 per bin (B bounded
    // rounding sites) and the PSI total is an exact decimal sum of the
    // quantized terms — every step replays bit-for-bit.
    "v02_drift_psi" ->
      """WITH ref AS (
        |  SELECT n_chars // 50 AS bin, count(*) AS n FROM documents
        |  WHERE doc_id % 2 = 0 GROUP BY 1),
        |cur AS (
        |  SELECT n_chars // 50 AS bin, count(*) AS n FROM documents
        |  WHERE doc_id % 2 = 1 GROUP BY 1),
        |bins AS (
        |  SELECT coalesce(r.bin, c.bin) AS bin,
        |    coalesce(r.n, 0) AS ref_n, coalesce(c.n, 0) AS cur_n
        |  FROM ref r FULL OUTER JOIN cur c ON r.bin = c.bin),
        |tot AS (
        |  SELECT CAST(sum(ref_n) AS BIGINT) AS nr,
        |    CAST(sum(cur_n) AS BIGINT) AS nc, count(*) AS b FROM bins),
        |p AS (
        |  SELECT bin, ref_n, cur_n,
        |    CAST(ref_n + 1 AS DOUBLE) / (nr + b) AS ref_p,
        |    CAST(cur_n + 1 AS DOUBLE) / (nc + b) AS cur_p
        |  FROM bins, tot),
        |terms AS (
        |  SELECT bin, ref_n, cur_n, ref_p, cur_p,
        |    round((ref_p - cur_p) * round(ln(ref_p / cur_p), 9), 9) AS psi_term
        |  FROM p),
        |s AS (SELECT sum(CAST(psi_term AS DECIMAL(20,9))) AS psi_dec FROM terms)
        |SELECT bin, ref_n, cur_n, ref_p, cur_p, psi_term,
        |  CAST(psi_dec AS DOUBLE) AS psi_total FROM terms, s""".stripMargin,
    // e04: the lag window orders by (ts, event_id) — the same total order
    // e01 already proved engine-portable; p is an exact integer division.
    "e04_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events),
        |c AS (
        |  SELECT prev AS from_type, event_type AS to_type, count(*) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n, CAST(c.n AS DOUBLE) / t.tot AS p
        |FROM c JOIN t USING (from_type)""".stripMargin
  )
}
