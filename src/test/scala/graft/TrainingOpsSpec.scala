package graft

import graft.operators.{Contamination, Quality, RangeJoin, Sampling}
import org.apache.spark.sql.functions._

/** Quality filter, stratified sampling, contamination, and range join —
  * semantics on planted synthetic inputs (the sf-lake queries are covered by
  * the Verify/oracle gate). */
class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("quality filter drops planted pathological docs, keeps natural text") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs on through the field"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"), // dup bigrams
      (3L, "@@ ## $$ %% ^^ && ** (( )) !! ~~ ?? ;; :: '' \"\" [[ ]]"), // symbols
      (4L, "ok"), // too short
      (5L, "a b c d e f g h i j k l m n o p q r s t u v w x y z aa bb") // no stopword signal? 'a' is one
    ).toDF("doc_id", "text")
    val kept = Quality.filterDocs(docs, "text").select("doc_id")
      .as[Long].collect().toSet
    assert(kept.contains(1L))
    assert(!kept.contains(2L), "repeated-bigram doc must fail dup_bigram rule")
    assert(!kept.contains(3L), "symbol-salad doc must fail symbol_ratio rule")
    assert(!kept.contains(4L), "2-token doc must fail min length rule")
    val flags = Quality.flags(docs, "text")
    assert(flags.columns.toSeq.takeRight(6) == Seq("n_tokens", "mean_token_len",
      "symbol_ratio", "stopword_ratio", "dup_bigram_frac", "keep"))
  }

  test("bigram-LM score matches a hand-computed add-one model; short docs drop") {
    val docs = Seq(
      (1L, "a b a b"),   // bigrams (a,b) (b,a) (a,b)
      (2L, "a b"),       // (a,b)
      (3L, "c"),         // single token → no bigram → excluded
      (4L, "b  a")       // double space: empty token filtered → (b,a)
    ).toDF("doc_id", "text")
    val got = Quality.lmScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // model: C(a,b)=3 C(b,a)=2; heads C(a)=3 C(b)=2; V={a,b}=2
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r(x: Double, s: Int) = BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpAB = r9(math.log(4.0 / 5.0))
    val lpBA = r9(math.log(3.0 / 4.0))
    def doc(lps: Seq[Double]) = {
      val avg = r(lps.sum / lps.length, 6)
      (lps.length.toLong, avg, r(math.exp(-avg), 3))
    }
    assert(got == Map(
      1L -> doc(Seq(lpAB, lpBA, lpAB)),
      2L -> doc(Seq(lpAB)),
      4L -> doc(Seq(lpBA))), s"got $got")
  }

  test("LM score: in-corpus text scores lower perplexity than outlier text") {
    val docs = (1L to 20L).map(i => (i, "the cat sat on the mat")) :+
      (99L, "zq xv qpj wkd zzz yyy")
    val scored = Quality.lmScore(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(scored(1L) < scored(99L),
      s"corpus-like doc must score below the outlier: $scored")
  }

  test("KN trigram LM separates trigram-violating text that the add-one " +
       "bigram model cannot see at all") {
    // Planted structure: every template is 's_i mid e_i' — all share the
    // middle word, so CROSSED chains 's_i mid e_j' (i != j) use only
    // high-frequency SEEN bigrams but rare trigrams. The bigram model is
    // blind to the crossing by construction; KN's trigram counts +
    // continuation backoff punish it.
    val rnd = new scala.util.Random(3)
    def triple(i: Int, j: Int) = s"s$i mid e$j"
    val high = (1L to 30L).map(id =>
      (id, Seq.fill(8)({ val i = rnd.nextInt(10); triple(i, i) }).mkString(" ")))
    val low = (101L to 110L).map(id =>
      (id, Seq.fill(8)({
        val i = rnd.nextInt(10)
        triple(i, (i + 1 + rnd.nextInt(9)) % 10)
      }).mkString(" ")))
    val docs = (high ++ low).toDF("doc_id", "text")
    def ratio(scored: Map[Long, Double]): Double = {
      val lo = low.map(d => scored(d._1)); val hi = high.map(d => scored(d._1))
      (lo.sum / lo.size) / (hi.sum / hi.size)
    }
    val kn = ratio(Quality.knTrigramScore(docs, "doc_id", "text")
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap)
    val bigram = ratio(Quality.lmScore(docs, "doc_id", "text")
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap)
    assert(kn > bigram,
      s"KN must separate crossed trigrams better: KN ratio $kn vs bigram $bigram")
    assert(kn > 1.5, s"KN low/high perplexity ratio only $kn")
  }

  test("KN trigram LM: deterministic across runs; no document text crosses " +
       "an exchange") {
    val docs = graft.sources.Lake.table(spark, sf0001, "documents")
      .select($"doc_id", $"text")
    val a = Quality.knTrigramScore(docs, "doc_id", "text")
      .collect().map(_.toString).sorted
    val b = Quality.knTrigramScore(docs, "doc_id", "text")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // every exchange carries words/counts/decimals — never the doc text
    val plan = Quality.knTrigramScore(docs, "doc_id", "text")
      .queryExecution.executedPlan
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] =
      (p match {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          Seq(s)
        case _ => Seq.empty
      }) ++ p.children.flatMap(shuffles)
    val textBearing = shuffles(plan).filter(_.child.output.exists(a =>
      a.name == "text" || a.dataType.catalogString.contains("text")))
    assert(textBearing.isEmpty,
      s"document text must not shuffle:\n${textBearing.mkString("\n")}")
  }

  test("stratified sample takes exactly ceil(f*n) per stratum, deterministically") {
    val df = (1L to 100L).map(i => (i, s"s${i % 3}")).toDF("id", "g")
    val s1 = Sampling.stratifiedExact(df, "g", "id", 0.3)
    val s2 = Sampling.stratifiedExact(df, "g", "id", 0.3)
    val counts = s1.groupBy("g").count().as[(String, Long)].collect().toMap
    // strata sizes: s0=33, s1=34, s2=33 -> ceil(.3*n) = 10, 11, 10
    assert(counts == Map("s0" -> 10L, "s1" -> 11L, "s2" -> 10L), counts.toString)
    assert(s1.collect().toSet == s2.collect().toSet, "selection must be deterministic")
    // per-stratum override
    val s3 = Sampling.stratifiedExact(df, "g", "id", 0.3, Map("s1" -> 1.0))
    assert(s3.where($"g" === "s1").count() == 34)
  }

  test("hash-threshold sample is deterministic and roughly proportional") {
    val df = (1L to 2000L).toDF("id")
    val a = Sampling.byHashThreshold(df, "id", 0.5).as[Long].collect().toSet
    val b = Sampling.byHashThreshold(df, "id", 0.5).as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size - 1000) < 120, s"got ${a.size}, expected ~1000")
    // monotone: a smaller threshold selects a subset
    val c = Sampling.byHashThreshold(df, "id", 0.25).as[Long].collect().toSet
    assert(c.subsetOf(a))
  }

  test("weighted mix oversamples by floor(w) + hash-chosen fraction, with epochs") {
    val df = (1L to 400L).map(i => (i, s"s${i % 2}")).toDF("id", "g")
    val mixed = Sampling.weightedMix(df, "g", "id", Map("s0" -> 3.0, "s1" -> 0.5))
    val counts = mixed.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts("s0") == 600L) // integer weight: exactly 3 copies of 200 rows
    assert(math.abs(counts.getOrElse("s1", 0L) - 100L) < 40, counts.toString)
    // epochs are 0..copies-1 per id
    val epochs = mixed.where($"g" === "s0").groupBy("id")
      .agg(sort_array(collect_list($"epoch")).as("es"))
      .select("es").as[Seq[Long]].collect()
    assert(epochs.forall(_ == Seq(0L, 1L, 2L)))
    // deterministic
    val again = Sampling.weightedMix(df, "g", "id", Map("s0" -> 3.0, "s1" -> 0.5))
      .collect().toSet
    assert(again == mixed.collect().toSet)
  }

  test("PPS systematic sample == single-pass reference; weight-proportional") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    // sparse, non-contiguous ids with varied weights (incl. zero-weight rows)
    val rows = (0 until 300).map(i => (i * 7L + rnd.nextInt(5), // gappy ids
      if (i % 41 == 0) 0L else 1L + rnd.nextInt(500).toLong)).distinctBy(_._1)
    val df = rows.toDF("id", "w")
    val k = 20
    val got = Sampling.ppsSystematic(df, "id", "w", k, parts = 7)
      .as[Long].collect().toSet
    // reference: driver-side global cumulative walk, same integer rule
    val total = rows.map(_._2).sum
    var cum = 0L
    val want = rows.sortBy(_._1).flatMap { case (id, w) =>
      val before = cum * k / total; cum += w
      if (cum * k / total > before) Some(id) else None
    }.toSet
    assert(got == want, s"got ${got.size}, want ${want.size}")
    assert(want.size == k, s"boundaries -> exactly $k here")
    // zero-weight rows can never be selected
    val zeros = rows.filter(_._2 == 0L).map(_._1).toSet
    assert(got.intersect(zeros).isEmpty)
    // selection is weight-biased: mean weight of the sample exceeds the
    // population mean (PPS by construction)
    val wById = rows.toMap
    assert(got.map(wById).sum.toDouble / got.size >
      total.toDouble / rows.size)
    // partition-count invariance: the distributed prefix sum is exact
    val other = Sampling.ppsSystematic(df, "id", "w", k, parts = 2)
      .as[Long].collect().toSet
    assert(other == got)
  }

  test("PPS stays correct on a severely sparse id space; guards reject bad ids") {
    val s = spark; import s.implicits._
    // ids concentrated at the far end of the range — the whole population
    // occupies a ~600-wide sliver of a [0, 4e12] key space (way under 1%).
    // The result must equal the global single-pass reference, AND the
    // count-based quantile ranges must stay balanced (arithmetic [0,max]/parts
    // ranges would put 200 of 203 rows into one range here).
    val rows = Seq(0L, 3L, 9L).map(id => (id, 10L)) ++
      (0 until 200).map(i => (4_000_000_000_000L + i * 3L, 1L + (i % 17).toLong))
    val df = rows.toDF("id", "w")
    val k = 15
    val got = Sampling.ppsSystematic(df, "id", "w", k, parts = 8)
      .as[Long].collect().toSet
    val total = rows.map(_._2).sum
    var cum = 0L
    val want = rows.sortBy(_._1).flatMap { case (id, w) =>
      val before = cum * k / total; cum += w
      if (cum * k / total > before) Some(id) else None
    }.toSet
    assert(got == want, s"got ${got.size}, want ${want.size}")
    // balanced ranges: no range holds more than 3x the even per-range share
    val bounds = Sampling.rangeBoundaries(df, "id", 8)
    assert(bounds.length >= 5, s"degenerate boundaries: ${bounds.toSeq}")
    val perRange = rows.groupBy { case (id, _) => bounds.count(_ <= id.toDouble) }
      .values.map(_.size)
    assert(perRange.max <= 3 * rows.size / 8,
      s"unbalanced ranges under sparse ids: ${perRange.toSeq.sorted.reverse}")
    // guards: empty input, null ids, negative ids all fail loudly
    intercept[IllegalArgumentException] {
      Sampling.ppsSystematic(Seq.empty[(Long, Long)].toDF("id", "w"), "id", "w", 5)
    }
    intercept[IllegalArgumentException] {
      Sampling.ppsSystematic(
        Seq((Some(1L), 2L), (None, 3L)).toDF("id", "w"), "id", "w", 5)
    }
    intercept[IllegalArgumentException] {
      Sampling.ppsSystematic(Seq((-4L, 2L), (7L, 3L)).toDF("id", "w"), "id", "w", 5)
    }
  }

  test("PPS prefix sum is row-accurate under duplicate ids (explicit ROWS frame)") {
    val s = spark; import s.implicits._
    // duplicate ids: the default RANGE window frame would give every peer the
    // full tied-group sum; the explicit ROWS frame keeps per-row prefix sums
    // so total-weight conservation still holds and results stay deterministic.
    val rows = Seq((1L, 5L), (1L, 5L), (2L, 5L), (2L, 5L), (3L, 5L), (3L, 5L))
    val df = rows.toDF("id", "w")
    val got = Sampling.ppsSystematic(df, "id", "w", k = 3, parts = 2)
      .as[Long].collect()
    // k=3 boundaries over total=30 -> every 10 weight units -> 3 selections
    assert(got.length == 3, got.mkString(","))
    val again = Sampling.ppsSystematic(df, "id", "w", k = 3, parts = 4)
      .as[Long].collect()
    assert(got.sorted.sameElements(again.sorted))
  }

  test("contamination finds planted verbatim n-gram overlap, excludes self") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally different words here nothing shared"),
      (3L, "prefix alpha beta gamma suffix tail"), // shares 'alpha beta gamma' with 1
      (4L, "beta gamma alpha scrambled so no trigram match")
    ).toDF("doc_id", "text")
    val eval = corpus.where($"doc_id" === 1L)
    val hits = Contamination.overlap(corpus, eval, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(hits.keySet == Set(3L), hits.toString)
    assert(hits(3L) == 1L) // exactly one shared distinct trigram
  }

  test("range join matches the naive theta join on a dense synthetic case") {
    val pts = (0L to 200L).toDF("p")
    val ivs = Seq((100L, 0L, 10L), (101L, 5L, 7L), (102L, 190L, 300L),
      (103L, 42L, 42L), (104L, 250L, 260L)).toDF("iv_id", "lo", "hi")
    val binned = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", binWidth = 8L)
      .select("p", "iv_id").as[(Long, Long)].collect().toSet
    val naive = pts.crossJoin(ivs).where($"p".between($"lo", $"hi"))
      .select("p", "iv_id").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(naive.nonEmpty && naive.size == 11 + 3 + 11 + 1) // sanity: known sizes
  }

  test("interval overlap join matches naive theta join, exactly once per pair") {
    val a = Seq((1L, 0L, 100L), (2L, 50L, 55L), (3L, 200L, 201L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 90L, 300L), (11L, 0L, 2L), (12L, 56L, 60L))
      .toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", binWidth = 8L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toList
    val naive = a.crossJoin(b)
      .where($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select("a_id", "b_id").as[(Long, Long)].collect().toList
    // sets equal AND no duplicate emissions despite many shared bins
    assert(got.sorted == naive.sorted, s"got $got vs $naive")
    assert(got.size == got.toSet.size, s"duplicate emissions: $got")
  }

  test("range join plan is an equi-join on the bin, not a nested loop") {
    val pts = (0L to 200L).toDF("p")
    val ivs = (0L until 50L).map(i => (i, i * 4, i * 4 + 6)).toDF("iv_id", "lo", "hi")
    val plan = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", binWidth = 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }
}
