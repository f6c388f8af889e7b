package graft

import graft.operators.{RangeJoin, Sampling}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized (seeded, reproducible) equivalence properties: each
  * rewrite-style operator must equal its naive formulation on arbitrary
  * inputs, not just the planted spec cases. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def intervals(rnd: Random, n: Int): List[(Long, Long)] =
    List.fill(n) {
      val lo = rnd.between(-100L, 300L)
      (lo, lo + rnd.between(0L, 60L))
    }

  test("binned point-in-interval join == naive theta join (random inputs)") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val w = Seq(1L, 3L, 7L, 64L)(rnd.nextInt(4))
      val pdf = List.fill(60)(rnd.between(-100L, 300L)).zipWithIndex
        .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
      val idf = intervals(rnd, 25).zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("iid", "lo", "hi")
      val got = RangeJoin.pointInInterval(pdf, "p", idf, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toList
      val want = pdf.crossJoin(idf).where($"p".between($"lo", $"hi"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toList
      assert(got == want, s"seed=$seed w=$w")
    }
  }

  test("binned interval overlap == naive theta join, exactly once (random inputs)") {
    for (seed <- 1 to 6) {
      val rnd = new Random(100 + seed)
      val w = Seq(2L, 5L, 32L)(rnd.nextInt(3))
      val adf = intervals(rnd, 20).zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("aid", "a_lo", "a_hi")
      val bdf = intervals(rnd, 20).zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("bid", "b_lo", "b_hi")
      val got = RangeJoin.intervalOverlap(adf, "a_lo", "a_hi", bdf, "b_lo", "b_hi", w)
        .select("aid", "bid").as[(Long, Long)].collect().toList
      val want = adf.crossJoin(bdf)
        .where($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
        .select("aid", "bid").as[(Long, Long)].collect().toList
      assert(got.sorted == want.sorted, s"seed=$seed w=$w")
      assert(got.size == got.toSet.size, s"seed=$seed duplicate emissions")
    }
  }

  test("sweep interval overlap == naive theta join, exactly once " +
       "(random inputs, salt 1 and 3)") {
    for (seed <- 1 to 6; salt <- Seq(1, 3)) {
      val rnd = new Random(700 + seed)
      val w = Seq(2L, 5L, 32L)(rnd.nextInt(3))
      val adf = intervals(rnd, 25).zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("aid", "a_lo", "a_hi")
      val bdf = intervals(rnd, 25).zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("bid", "b_lo", "b_hi")
      val got = RangeJoin.intervalOverlapSweep(
          adf, "a_lo", "a_hi", bdf, "b_lo", "b_hi", w, salt)
        .select("aid", "bid").as[(Long, Long)].collect().toList
      val want = adf.crossJoin(bdf)
        .where($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
        .select("aid", "bid").as[(Long, Long)].collect().toList
      assert(got.sorted == want.sorted, s"seed=$seed w=$w salt=$salt")
      assert(got.size == got.toSet.size,
        s"seed=$seed salt=$salt duplicate emissions")
    }
  }

  test("sweep interval overlap: heavy lo/hi ties never double-emit across salt cells") {
    // Many identical intervals (the tie-break stress case): every pair of
    // distinct rows with the same [lo, hi] overlaps, and the emitter-is-later
    // rule must pick exactly one emitter per pair in exactly one cell.
    val a = (1L to 30L).map(i => (i, 10L, 20L)).toDF("aid", "a_lo", "a_hi")
    val b = (1L to 30L).map(i => (i, 10L, 20L)).toDF("bid", "b_lo", "b_hi")
    for (salt <- Seq(1, 4)) {
      val got = RangeJoin.intervalOverlapSweep(
          a, "a_lo", "a_hi", b, "b_lo", "b_hi", 8L, salt)
        .select("aid", "bid").as[(Long, Long)].collect().toList
      assert(got.size == 900, s"salt=$salt size=${got.size}")
      assert(got.toSet.size == 900, s"salt=$salt duplicates")
    }
  }

  test("interval overlap count == naive theta-join count (random, incl ties)") {
    for (seed <- 1 to 6) {
      val rnd = new Random(900 + seed)
      // small value range forces heavy endpoint ties (the inclusivity edge)
      val adf = intervals(rnd, 40).zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("aid", "a_lo", "a_hi")
      val bdf = intervals(rnd, 40).zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("bid", "b_lo", "b_hi")
      val got = RangeJoin.intervalOverlapCount(
          adf, "aid", "a_lo", "a_hi", bdf, "b_lo", "b_hi", parts = 4)
        .as[(Long, Long)].collect().toMap
      val want = adf.crossJoin(bdf)
        .where($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
        .groupBy($"aid").agg(count(lit(1)))
        .as[(Long, Long)].collect().toMap
      val full = (0L until 40L).map(i => i -> want.getOrElse(i, 0L)).toMap
      assert(got == full, s"seed=$seed")
    }
  }

  test("interval overlap count: parts=1024 stays correct (broadcast offsets, " +
    "no codegen depth cliff)") {
    // Far more value ranges than rows: every range's offset must still land on
    // the right rows via the broadcast offsets join. A when()-chain offset
    // encoding (linear expression depth in `parts`) chokes here; the join is
    // O(1) depth at any `parts`.
    val rnd = new Random(4242)
    val adf = intervals(rnd, 60).zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("aid", "a_lo", "a_hi")
    val bdf = intervals(rnd, 60).zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlapCount(
        adf, "aid", "a_lo", "a_hi", bdf, "b_lo", "b_hi", parts = 1024)
      .as[(Long, Long)].collect().toMap
    val want = adf.crossJoin(bdf)
      .where($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .groupBy($"aid").agg(count(lit(1)))
      .as[(Long, Long)].collect().toMap
    assert(got == (0L until 60L).map(i => i -> want.getOrElse(i, 0L)).toMap)
  }

  test("interval overlap count: empty b side gives zero counts") {
    val adf = Seq((1L, 0L, 5L), (2L, 3L, 9L)).toDF("aid", "a_lo", "a_hi")
    val bdf = Seq.empty[(Long, Long, Long)].toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlapCount(
        adf, "aid", "a_lo", "a_hi", bdf, "b_lo", "b_hi")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }

  test("bottom_k == sort-distinct-take (random strings, random k)") {
    for (seed <- 1 to 8) {
      val rnd = new Random(200 + seed)
      val k = 1 + rnd.nextInt(12)
      val xs = List.fill(1 + rnd.nextInt(120))(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      val got = xs.toDF("v").repartition(5)
        .agg(graft.functions.SketchAggregates.bottomK($"v", k))
        .head().getSeq[String](0).toList
      assert(got == xs.distinct.sorted.take(k), s"seed=$seed k=$k")
    }
  }

  test("winnow_select == brute-force per-window argmin under HEAVY ties " +
       "(random small-range hash arrays) and on real-range hashes") {
    // small value ranges force the tie path the corpus never exercises
    // (60-bit hashes virtually never collide): the deque's pop-on->= must
    // implement exactly "rightmost minimal position per window"
    def brute(hs: IndexedSeq[Long], w: Int): Seq[(Int, Long)] = {
      val we = math.min(w, hs.length)
      (0 to hs.length - we).map { t =>
        val p = (t until t + we).maxBy(p => (-hs(p), p)) // min hash, max pos
        (p + 1, hs(p))
      }.distinct
    }
    for (seed <- 1 to 30) {
      val rnd = new Random(9000 + seed)
      val range = Seq(2L, 4L, 16L, 1L << 60)(rnd.nextInt(4))
      val w = 1 + rnd.nextInt(6)
      val hs = IndexedSeq.fill(1 + rnd.nextInt(40))(rnd.nextLong(range))
      val got = Seq(Tuple1(hs)).toDF("hs")
        .select(explode(graft.functions.HashExpressions
          .winnow_select(col("hs"), w)).as("s"))
        .select(col("s.p"), col("s.h"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(got == brute(hs, w), s"seed=$seed w=$w range=$range hs=$hs")
    }
  }

  test("source curation == plain-Scala fold (random corpora with planted " +
       "dup-heavy and stub-heavy sources)") {
    for (seed <- 1 to 6) {
      val rnd = new Random(7100 + seed)
      val nSrc = 2 + rnd.nextInt(5)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
      (1L to (20 + rnd.nextInt(60))).foreach { id =>
        val src = s"s${rnd.nextInt(nSrc)}"
        val text =
          if (buf.nonEmpty && rnd.nextInt(4) == 0) {
            // planted dup: an earlier text, sometimes case/space-mangled —
            // normalization-equal, so it must count as a duplicate
            val prev = buf(rnd.nextInt(buf.size))._2
            if (rnd.nextBoolean()) "  " + prev.trim.toUpperCase.toLowerCase + " "
            else prev
          }
          else if (rnd.nextInt(5) == 0)
            rnd.alphanumeric.take(10 + rnd.nextInt(30)).mkString // stub-ish
          else rnd.alphanumeric.take(61 + rnd.nextInt(200)).mkString
        buf += ((id, text, src))
      }
      val docs = buf.toSeq
      val got = graft.operators.SourceCuration.curate(
          docs.toDF("doc_id", "text", "source"), "doc_id", "text", "source",
          maxDupRate = 0.3, maxShortFrac = 0.4, minChars = 60)
        .collect()
        .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
        .toMap
      val bySrc = docs.groupBy(_._3)
      val stats = bySrc.view.mapValues { g =>
        val n = g.size
        val dup = n - g.map(_._2.trim.toLowerCase.replaceAll("\\s+", " ")).distinct.size
        val short = g.count(_._2.length < 60)
        (dup.toDouble / n, short.toDouble / n)
      }.toMap
      docs.foreach { case (id, text, src) =>
        val (dr, sf) = stats(src)
        val kept = dr <= 0.3 && sf <= 0.4 && text.length >= 60
        assert(got(id) == ((dr, sf, kept)), s"seed=$seed doc=$id")
      }
    }
  }

  test("merge snapshot == last-writer-wins reference fold (random changelogs)") {
    for (seed <- 1 to 6) {
      val rnd = new Random(400 + seed)
      val base = (1L to 20L).map(k => (k, rnd.nextInt(100))).toDF("k", "v")
      // random changelog: unique (k, seq) pairs, random ops
      val chg = rnd.shuffle((1L to 30L).toList).take(15).flatMap { k =>
        (1L to rnd.between(1L, 4L)).map(seq =>
          (k, rnd.nextInt(100), if (rnd.nextBoolean()) "U" else "D", seq))
      }
      val chgDf = chg.toDF("k", "v", "op", "seq")
      val got = graft.operators.Merge.snapshot(base, chgDf, Seq("k"), "seq", "op")
        .as[(Long, Int)].collect().toMap
      // reference fold: apply changes per key in seq order over the base map
      val want = chg.groupBy(_._1).foldLeft(
        base.as[(Long, Int)].collect().toMap) { case (acc, (k, changes)) =>
        val (_, v, op, _) = changes.maxBy(_._4)
        if (op == "D") acc - k else acc + (k -> v)
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("snapshotState: any batch chopping/order of a changelog folds to the " +
       "same served state (random changelogs)") {
    for (seed <- 1 to 6) {
      val rnd = new Random(600 + seed)
      val base = (1L to 20L).map(k => (k, rnd.nextInt(100))).toDF("k", "v")
      // unique (k, seq): the winner per key is a max over (seq, isDelete) —
      // associative + commutative, so ANY chopping into batches in ANY order
      // must serve the same rows
      val chg = rnd.shuffle((1L to 30L).toList).take(15).flatMap { k =>
        rnd.shuffle((1L to 5L).toList).take(rnd.between(1, 4)).map(seq =>
          (k, rnd.nextInt(100), if (rnd.nextBoolean()) "U" else "D", seq))
      }
      def fold(batches: Seq[Seq[(Long, Int, String, Long)]]): Map[Long, Int] = {
        val end = batches.filter(_.nonEmpty).foldLeft(base) { (acc, b) =>
          graft.operators.Merge.snapshotState(acc, b.toDF("k", "v", "op", "seq"),
            Seq("k"), "seq", "op")
        }
        graft.operators.Merge.serve(end).as[(Long, Int)].collect().toMap
      }
      val oneShot = fold(Seq(chg))
      val chopped = fold(chg.grouped(math.max(1, chg.size / 3)).toSeq)
      val reversed = fold(chg.grouped(math.max(1, chg.size / 3)).toSeq.reverse)
      assert(chopped == oneShot, s"seed=$seed chopped != one-shot")
      assert(reversed == oneShot, s"seed=$seed reversed != one-shot")
    }
  }

  test("reconcile diff reports exactly the injected damage (random damage sets)") {
    for (seed <- 1 to 6) {
      val rnd = new Random(500 + seed)
      val n = 40
      val rows = (1L to n).map(k => (k, rnd.nextInt(10).toString, rnd.nextInt(100)))
      val a = rows.toDF("k", "s", "v")
      val deleted = rnd.shuffle((1L to n).toList).take(rnd.nextInt(6)).toSet
      val mutated = rnd.shuffle((1L to n).toList).filterNot(deleted)
        .take(rnd.nextInt(6)).toSet
      val added = ((n + 1) to (n + rnd.nextInt(4))).map(_.toLong).toSet
      val b = rows.filterNot(r => deleted(r._1))
        .map(r => if (mutated(r._1)) (r._1, r._2, r._3 + 1000) else r)
        .++(added.map(k => (k, "x", 0))).toDF("k", "s", "v")
      val got = graft.operators.Reconcile.diff(a, b, Seq("k"), Seq("s", "v"))
        .as[(Long, String)].collect().toMap
      val want = deleted.map(_ -> "missing_in_b").toMap ++
        mutated.map(_ -> "mismatch").toMap ++ added.map(_ -> "missing_in_a").toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("multi-probe LSH invariants on random corpora: no false positives, " +
       "base pairs kept, monotone in probes") {
    // Not an equivalence (LSH is honestly approximate) but three invariants
    // that must hold on ARBITRARY inputs: (1) every emitted pair clears the
    // exact-cosine threshold (the verify step can't be bypassed by probe
    // candidates), (2) probing never loses a base pair (candidates only
    // widen), (3) recall is monotone in the probe count.
    import graft.operators.Dedup
    for (seed <- 1 to 4) {
      val rnd = new Random(900 + seed)
      val dim = 8
      val n = 60 + rnd.nextInt(60)
      val vecs = (0 until n).map { i =>
        (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
      }
      val df = vecs.toDF("vec_id", "embedding")
      val vf = graft.functions.VectorFunctions
      val nrm = df.select(col("vec_id"),
        vf.l2normalize(col("embedding")).as("v"))
      val exact = nrm.as("a").join(nrm.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          vf.dot(col("a.v"), col("b.v")).as("cos"))
        .filter(col("cos") >= 0.3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      def run(probes: Int): Set[(Long, Long)] =
        Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
          dim = dim, threshold = 0.3, planesPerTable = 5, tables = 3,
          seed = 7L * seed, probes = probes)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val bySteps = Seq(0, 1, 3).map(p => p -> run(p)).toMap
      bySteps.foreach { case (p, got) =>
        assert(got.subsetOf(exact), s"seed=$seed probes=$p emitted a below-threshold pair")
      }
      assert(bySteps(0).subsetOf(bySteps(1)), s"seed=$seed probes=1 lost a base pair")
      assert(bySteps(1).subsetOf(bySteps(3)), s"seed=$seed probes=3 lost a probes=1 pair")
    }
  }

  test("minhash banding monotonicity: longer signatures at equal band width " +
       "never lose pairs (random corpora x two bandings)") {
    // The positional splitmix64 minhash family makes a k2-hash signature's
    // first k1 entries IDENTICAL to the k1-hash signature (k1 < k2). With the
    // same rowsPerBand, the short config's bands are therefore a PREFIX of
    // the long config's bands, so the long config's candidate set — and,
    // since verification is exact Jaccard over the full shingle sets, its
    // output — is a superset. This is the invariant that made the r8 banding
    // upgrade (64x16 -> 128x32) safe to ship without re-running every scale:
    // here it is pinned on arbitrary corpora, not the shipped fixtures.
    import graft.operators.Dedup
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    var sawPairs = false
    for (seed <- 1 to 5) {
      val rnd = new Random(800 + seed)
      val rpb = Seq(2, 4)(rnd.nextInt(2))          // equal rowsPerBand
      val bShort = 4 + rnd.nextInt(8)              // short banding
      val bLong = bShort + 4 + rnd.nextInt(16)     // strictly more bands
      val base = (0 until 25 + rnd.nextInt(25)).map { i =>
        (i.toLong, List.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      // planted near-dups: copies with one word swapped, so true pairs exist
      val dups = base.take(8).map { case (id, text) =>
        val w = text.split(" "); w(rnd.nextInt(w.length)) = vocab(rnd.nextInt(vocab.size))
        (id + 10000L, w.mkString(" "))
      }
      val df = (base ++ dups).toDF("doc_id", "text")
      def pairs(k: Int, b: Int): Set[(Long, Long)] =
        Dedup.minhashPairs(df, "doc_id", "text", shingleN = 2,
          numHashes = k, bands = b, threshold = 0.3)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val short = pairs(rpb * bShort, bShort)
      val long = pairs(rpb * bLong, bLong)
      assert(short.subsetOf(long),
        s"seed=$seed rpb=$rpb ${rpb * bShort}x$bShort lost pairs vs " +
          s"${rpb * bLong}x$bLong: ${short -- long}")
      sawPairs ||= long.nonEmpty
    }
    assert(sawPairs, "fixture produced no pairs at any seed — property vacuous")
  }

  test("prefix-filtered ngram jaccard == naive all-pairs (random corpora, " +
       "boundary-prone thresholds)") {
    // Prefix + length filtering must be LOSSLESS for the threshold: the
    // operator's output on arbitrary corpora equals the naive all-pairs
    // jaccard filter. Thresholds include 0.5 and 0.7 — values whose t·|s|
    // products land exactly on integers (the float-ceil overshoot trap the
    // 1e-9 slack exists for) — and duplicate-dense corpora so boundary
    // overlaps actually occur.
    import graft.operators.Dedup
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum",
      "gold", "jade", "rust", "sage")
    var sawPairs = false
    for (seed <- 1 to 4; threshold <- Seq(0.4, 0.5, 0.7)) {
      val rnd = new Random(1300 + seed)
      val base = (0 until 20 + rnd.nextInt(20)).map { i =>
        (i.toLong, List.fill(4 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      // mutated copies at several edit distances -> pairs across the whole
      // jaccard range, including exactly-at-threshold overlaps
      val dups = base.take(10).zipWithIndex.map { case ((id, text), j) =>
        val w = text.split(" ").toBuffer
        (0 to j % 3).foreach(_ => w(rnd.nextInt(w.length)) = vocab(rnd.nextInt(vocab.size)))
        (id + 10000L, w.mkString(" "))
      }
      val df = (base ++ dups).toDF("doc_id", "text")
      val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", shingleN = 2,
        threshold = threshold, maxDocFreq = 1000000)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // naive oracle: all-pairs exact jaccard over the same shingle sets
      val tf = graft.functions.TextFunctions
      val hf = graft.functions.HashExpressions
      val sets = df.select(col("doc_id"),
        hf.hashed_sorted_set(tf.wordShingles(col("text"), 2)).as("sh"))
        .filter(size(col("sh")) > 0)
      val want = sets.as("a").join(sets.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .withColumn("inter",
          hf.sorted_intersect_count(col("a.sh"), col("b.sh")))
        .withColumn("j", col("inter").cast("double") /
          (size(col("a.sh")) + size(col("b.sh")) - col("inter")))
        .filter(col("j") >= threshold)
        .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)]
        .collect().toSet
      assert(got == want,
        s"seed=$seed t=$threshold missing=${want -- got} extra=${got -- want}")
      sawPairs ||= want.nonEmpty
    }
    assert(sawPairs, "fixture produced no pairs at any seed — property vacuous")
  }

  test("prefix-filtered cross-corpus decontam == naive cross join " +
       "(random corpora, boundary-prone thresholds)") {
    // crossJaccardFlags claims TOTAL recall at the threshold (its scaladoc's
    // exact-oracle contract); the prefix + length filters must not dent that
    // on arbitrary corpus/eval splits.
    import graft.operators.Dedup
    val vocab = Vector("one", "two", "three", "four", "five", "six", "seven")
    var sawFlags = false
    for (seed <- 1 to 3; threshold <- Seq(0.4, 0.5, 0.7)) {
      val rnd = new Random(1700 + seed)
      val mk = (n: Int, off: Long) => (0 until n).map { i =>
        (off + i, List.fill(4 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val corpus = (mk(25, 0L) ++ mk(8, 5000L).map { case (id, t) =>
        (id, t + " " + vocab(rnd.nextInt(vocab.size))) }).toDF("doc_id", "text")
      val evalDf = mk(10, 9000L).toDF("doc_id", "text")
        .union(corpus.limit(4))    // planted contamination incl. exact copies
      val got = Dedup.crossJaccardFlags(corpus, evalDf, "doc_id", "text",
        shingleN = 2, threshold = threshold)
        .select("id", "n_eval_matches").as[(Long, Long)].collect().toMap
      val tf = graft.functions.TextFunctions
      val hf = graft.functions.HashExpressions
      def sets(df: org.apache.spark.sql.DataFrame, as: String) =
        df.select(col("doc_id").as(as),
          hf.hashed_sorted_set(tf.wordShingles(col("text"), 2)).as(s"sh_$as"))
          .filter(size(col(s"sh_$as")) > 0)
      val want = sets(corpus, "c").crossJoin(sets(evalDf, "e"))
        .where(col("c") =!= col("e"))
        .withColumn("inter", hf.sorted_intersect_count(col("sh_c"), col("sh_e")))
        .withColumn("j", col("inter").cast("double") /
          (size(col("sh_c")) + size(col("sh_e")) - col("inter")))
        .filter(col("j") >= threshold)
        .groupBy(col("c")).agg(count(lit(1)))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"seed=$seed t=$threshold got=$got want=$want")
      sawFlags ||= want.nonEmpty
    }
    assert(sawFlags, "fixture planted no contamination — property vacuous")
  }

  test("semDedup invariants on random corpora: survivor rule == brute force, " +
       "explicit-centroid overload == seed path, salting output-invariant") {
    // The three quantization invariants the round-9 verdict asked to pin
    // (the LSH probe path got the same treatment in r8): on arbitrary
    // vectors — including zero rows and exact assignment near-ties —
    //  (a) assignment + survivor == a driver-side brute force of the
    //      documented contract (quantize at 1e6 half-away, squared-L2 argmin
    //      with lowest-index ties, removed iff ANY lower id in-cluster within
    //      eps, zero-norm rows never pair);
    //  (b) the explicit-centroid overload fed the SAME k lowest-id vectors
    //      equals the seed-path run;
    //  (c) random block salting never changes output.
    import graft.operators.SemDedup
    var sawRemoved = false
    for (seed <- 1 to 5) {
      val rnd = new Random(5200 + seed)
      val n = 20 + rnd.nextInt(20)
      val dim = 3
      val k = 2 + rnd.nextInt(3)
      val eps = Seq(0.7, 0.9)(rnd.nextInt(2))
      // coarse 0.25 grid makes exact argmin ties and >= eps boundaries
      // actually occur; every ~7th row is the zero vector
      val vecs: Seq[(Long, Array[Float])] = (0 until n).map { i =>
        val v = if (i % 7 == 3) Array.fill(dim)(0f)
        else Array.fill(dim)((rnd.nextInt(9) - 4) * 0.25f)
        (i.toLong, v)
      }
      val df = vecs.toDF("vec_id", "embedding")
      val tbr = 1 + rnd.nextInt(4)
      val mb = 1 + rnd.nextInt(6)
      def collectMap(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      val got = collectMap(SemDedup.semDedup(df, "vec_id", "embedding", k, eps))
      // (c) salted run
      val salted = collectMap(SemDedup.semDedup(df, "vec_id", "embedding", k,
        eps, targetBlockRows = tbr, maxBlocks = mb))
      assert(salted == got, s"seed=$seed salting changed output (tbr=$tbr mb=$mb)")
      // (b) explicit overload with the same k lowest-id vectors
      val seedVecs = vecs.sortBy(_._1).take(k)
        .map(_._2.map(_.toDouble)).toArray
      val explicit = collectMap(
        SemDedup.semDedup(df, "vec_id", "embedding", seedVecs, eps))
      assert(explicit == got, s"seed=$seed explicit overload diverged")
      // (a) brute force of the documented contract
      def q(v: Array[Float]): Array[Double] =
        v.map(x => math.copySign(math.floor(math.abs(x.toDouble * 1e6) + 0.5), x.toDouble))
      val qv = vecs.map { case (id, v) => id -> q(v) }.toMap
      val seeds = vecs.sortBy(_._1).take(k).map(x => qv(x._1))
      def dot(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      def cluster(id: Long): Int =
        seeds.zipWithIndex.minBy { case (s, i) =>
          (dot(qv(id), qv(id)) + dot(s, s) - 2 * dot(qv(id), s), i) }._2
      def near(a: Long, b: Long): Boolean = {
        val (n2a, n2b) = (dot(qv(a), qv(a)), dot(qv(b), qv(b)))
        n2a > 0 && n2b > 0 &&
          dot(qv(a), qv(b)) / (math.sqrt(n2a) * math.sqrt(n2b)) >= eps
      }
      val ids = vecs.map(_._1)
      val expect = ids.map { id =>
        val c = cluster(id)
        val removed = ids.exists(o => o < id && cluster(o) == c && near(o, id))
        id -> ((c.toLong, !removed))
      }.toMap
      assert(got == expect, s"seed=$seed k=$k eps=$eps")
      sawRemoved ||= expect.values.exists(!_._2)
    }
    assert(sawRemoved, "fixture removed nothing at any seed — property vacuous")
  }

  test("prefix-filtered ngram jaccard with small maxDocFreq == oracle " +
       "modeling the same prefix-df prune (random boilerplate corpora)") {
    // The composed miss condition (documented in Dedup.ngramJaccardPairs):
    // with the prune ON, a true pair survives iff the two PREFIXES share a
    // shingle whose prefix-document-frequency is <= maxDocFreq — a strictly
    // broader miss set than "shares nothing but stop-shingles overall",
    // because a rare shared shingle OUTSIDE both prefixes cannot rescue a
    // pair whose in-prefix shared shingles are all pruned. The equivalence
    // property above disables the prune; this one runs it hot against an
    // oracle that models exactly that rule.
    import graft.operators.Dedup
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum",
      "gold", "jade")
    val threshold = 0.4
    var sawPrunedMiss = false
    for (seed <- 1 to 5; mdf <- Seq(2L, 4L)) {
      val rnd = new Random(6100 + seed)
      // shared boilerplate head on most docs -> its shingles exceed mdf and
      // sit early in many prefixes; near-dup tails supply true pairs whose
      // rarer shingles may or may not make the prefix
      val boiler = Seq.fill(3)(vocab(rnd.nextInt(4))).mkString(" ")
      val base = (0 until 18).map { i =>
        val tail = List.fill(3 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
        (i.toLong,
          (if (i % 3 != 0) boiler + " " else "") + tail.mkString(" "))
      }
      val dups = base.take(8).map { case (id, text) =>
        val w = text.split(" ").toBuffer
        if (w.length > 1) w(rnd.nextInt(w.length)) = vocab(rnd.nextInt(vocab.size))
        (id + 10000L, w.mkString(" "))
      }
      val df = (base ++ dups).toDF("doc_id", "text")
      val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", shingleN = 2,
          threshold = threshold, maxDocFreq = mdf)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // oracle: same hashed sorted sets, prefix rule, prefix-df prune —
      // then exact jaccard on the FULL sets
      val hf = graft.functions.HashExpressions
      val tf = graft.functions.TextFunctions
      val sets: Map[Long, Vector[Long]] = df.select(col("doc_id"),
          hf.hashed_sorted_set(tf.wordShingles(col("text"), 2)).as("sh"))
        .filter(size(col("sh")) > 0)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
      def prefix(s: Vector[Long]): Vector[Long] =
        s.take(s.size - math.ceil(threshold * s.size - 1e-9).toInt + 1)
      val prefixes = sets.view.mapValues(prefix).toMap
      val dfc: Map[Long, Int] = prefixes.values.flatten
        .groupBy(identity).view.mapValues(_.size).toMap
      def jac(a: Vector[Long], b: Vector[Long]): Double = {
        val i = a.toSet.intersect(b.toSet).size
        i.toDouble / (a.size + b.size - i)
      }
      val ids = sets.keys.toSeq.sorted
      val want = (for {
        x <- ids; y <- ids if x < y
        shared = prefixes(x).toSet.intersect(prefixes(y).toSet)
        if shared.exists(sh => dfc(sh) <= mdf)
        if jac(sets(x), sets(y)) >= threshold
      } yield (x, y)).toSet
      assert(got == want,
        s"seed=$seed mdf=$mdf missing=${want -- got} extra=${got -- want}")
      // non-vacuity: the prune must actually drop a true pair somewhere
      val fullRecall = (for {
        x <- ids; y <- ids if x < y
        if jac(sets(x), sets(y)) >= threshold
      } yield (x, y)).toSet
      sawPrunedMiss ||= (fullRecall -- want).nonEmpty
    }
    assert(sawPrunedMiss,
      "prune never dropped a pair at any seed — property vacuous")
  }

  test("DSIR weights == plain-Scala recomputation (random corpora)") {
    // random corpora over a small vocab (guaranteeing bucket collisions),
    // random doc lengths including 0 and 1 tokens, random target subsets,
    // random bucket counts — the distributed pass must equal the sequential
    // definition bit-for-bit (quantize-at-9, exact-decimal sums, round-at-6)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (seed <- 1 to 5) {
      val rnd = new Random(900 + seed)
      val b = Seq(8, 16, 64)(rnd.nextInt(3))
      val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff", "gg", "hi")
      val docs = (0L until (8 + rnd.nextInt(20)).toLong).map { id =>
        id -> List.fill(rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val tmod = 2 + rnd.nextInt(3)
      val df = docs.toDF("doc_id", "text")
      val got = graft.operators.Dsir.importanceWeights(
          df, df.where(col("doc_id") % tmod === 0), "doc_id", "text", buckets = b)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

      def bucket(g: String): Long = java.lang.Long.parseLong(md5hex(g).take(15), 16) % b
      def grams(text: String): Seq[String] = {
        val ws = text.split(" ").filter(_.nonEmpty).toSeq
        ws ++ ws.zip(ws.drop(1)).map { case (x, y) => s"$x $y" }
      }
      val all = docs.map { case (id, t) => id -> grams(t).map(bucket) }
      val rawCounts = all.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tgtCounts = all.filter(_._1 % tmod == 0).flatMap(_._2)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nr = rawCounts.values.sum
      val nt = tgtCounts.values.sum
      def lr(bk: Long): BigDecimal = BigDecimal(
          math.log((tgtCounts.getOrElse(bk, 0L) + 1).toDouble / (nt + b)) -
            math.log((rawCounts.getOrElse(bk, 0L) + 1).toDouble / (nr + b)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      val want = all.filter(_._2.nonEmpty).map { case (id, bs) =>
        val w = bs.groupBy(identity).map { case (bk, c) => BigDecimal(c.size) * lr(bk) }.sum
        id -> ((bs.size.toLong, w.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }.toMap
      assert(got == want, s"seed=$seed b=$b tmod=$tmod")
    }
  }

  test("stratified sample: exact per-stratum size at random fractions") {
    for (seed <- 1 to 5) {
      val rnd = new Random(300 + seed)
      val n = 10 + rnd.nextInt(70)
      val f = Seq(0.1, 0.5, 0.9)(rnd.nextInt(3))
      val df = (1 to n).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g")
      val bySize = Sampling.stratifiedExact(df, "g", "id", f)
        .groupBy("g").count().as[(String, Long)].collect().toMap
      df.groupBy("g").count().as[(String, Long)].collect().foreach { case (g, cnt) =>
        assert(bySize.getOrElse(g, 0L) == math.ceil(cnt * f).toLong,
          s"seed=$seed stratum $g")
      }
    }
  }
}
