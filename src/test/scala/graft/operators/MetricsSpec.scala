package graft.operators

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Boundary/hand-computed fixtures for the round-7 eval-metric and
  * time-series operators (the oracle gate replays the same formulas, so
  * these specs pin the SEMANTICS against independent hand arithmetic —
  * the q124-q131 boundary-fixture pattern).
  */
class MetricsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("rocAuc: perfect separation → 1.0, all-tied → 0.5, mixed fixture " +
      "matches the brute-force pairwise count") {
    import spark.implicits._
    val perfect = Seq((true, 10L), (true, 20L), (false, 1L), (false, 2L))
      .toDF("y", "s")
    val r1 = Quality.rocAuc(perfect, col("y"), col("s")).collect()(0)
    assert(r1.getAs[Long]("n_pos") == 2L && r1.getAs[Long]("n_neg") == 2L)
    assert(r1.getAs[Long]("auc_num2") == 8L)
    assert(r1.getAs[Double]("auc") == 1.0)

    val tied = Seq((true, 5L), (true, 5L), (false, 5L), (false, 5L))
      .toDF("y", "s")
    assert(Quality.rocAuc(tied, col("y"), col("s"))
      .collect()(0).getAs[Double]("auc") == 0.5)

    // mixed with ties across classes: brute-force Σ [s⁺>s⁻] + ½[s⁺=s⁻]
    val rows = Seq((true, 3L), (true, 7L), (true, 5L), (false, 5L),
      (false, 2L), (false, 7L), (false, 1L))
    val mixed = rows.toDF("y", "s")
    val pos = rows.filter(_._1).map(_._2)
    val neg = rows.filterNot(_._1).map(_._2)
    val num2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val r3 = Quality.rocAuc(mixed, col("y"), col("s")).collect()(0)
    assert(r3.getAs[Long]("auc_num2") == num2)
    assert(r3.getAs[Double]("auc") ==
      num2.toDouble / (pos.size.toDouble * neg.size * 2.0))
  }

  test("calibrationBins: p = 1e6 lands in the top bin, bin edges floor, " +
      "exact Brier numerators") {
    import spark.implicits._
    val df = Seq(
      (true, 1000000L),  // boundary → bin 9 (not 10); perfect: sq err 0
      (false, 0L),       // bin 0, sq err 0
      (true, 550000L),   // bin 5, sq err (450000)^2
      (false, 550000L),  // bin 5, sq err (550000)^2
      (true, 99999L)     // bin 0 (floor), sq err (900001)^2
    ).toDF("y", "p")
    val out = Quality.calibrationBins(df, col("y"), col("p"), 10)
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 5L, 9L))
    val b0 = out(0)
    assert(b0.getAs[Long]("n") == 2L && b0.getAs[Long]("k") == 1L)
    assert(b0.getAs[Long]("sum_p_micro") == 99999L)
    assert(b0.getAs[Long]("brier_num_sum") == 900001L * 900001L)
    val b5 = out(1)
    assert(b5.getAs[Long]("brier_num_sum") ==
      450000L * 450000L + 550000L * 550000L)
    assert(b5.getAs[Double]("mean_p") == 1100000.0 / (2 * 1e6))
    val b9 = out(2)
    assert(b9.getAs[Long]("brier_num_sum") == 0L)
    assert(b9.getAs[Double]("rate") == 1.0)
  }

  test("cohensKappa: 1 on perfect agreement, 0 on independent marginals, " +
      "null when chance agreement is total") {
    import spark.implicits._
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    val r1 = Quality.cohensKappa(perfect, col("a"), col("b")).collect()(0)
    assert(r1.getAs[Long]("agree") == 3L && r1.getAs[Double]("kappa") == 1.0)

    // independence: agree = 2 of 4, E = 2·2 + 2·2 = 8, κ = (8−8)/(16−8) = 0
    val indep = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y"))
      .toDF("a", "b")
    val r2 = Quality.cohensKappa(indep, col("a"), col("b")).collect()(0)
    assert(r2.getAs[Long]("chance_num") == 8L)
    assert(r2.getAs[Double]("kappa") == 0.0)

    // degenerate single class: n² = E → κ undefined (NULL, not a throw)
    val mono = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Quality.cohensKappa(mono, col("a"), col("b"))
      .collect()(0).isNullAt(3))
  }

  test("keySkewReport: uniform counts → Gini 0; hand-computed skewed " +
      "fixture; entropy micro-identity") {
    import spark.implicits._
    val uniform = Seq("a", "a", "b", "b", "c", "c", "d", "d").toDF("k")
    val r1 = Quality.keySkewReport(uniform, col("k")).collect()(0)
    assert(r1.getAs[Long]("gini_num") == 0L && r1.getAs[Double]("gini") == 0.0)

    // counts a=1, b=7 (asc rank: a→1, b→2): six = 1 + 14 = 15,
    // gini_num = 30 − 3·8 = 6, den = 16; entropy per micro-log identity
    val skew = ("a" +: Seq.fill(7)("b")).toDF("k")
    val r2 = Quality.keySkewReport(skew, col("k")).collect()(0)
    assert(r2.getAs[Long]("n_keys") == 2L && r2.getAs[Long]("top1") == 7L)
    assert(r2.getAs[Long]("gini_num") == 6L && r2.getAs[Long]("gini_den") == 16L)
    assert(r2.getAs[Double]("gini") == 6.0 / 16.0)
    assert(r2.getAs[Double]("top1_share") == 7.0 / 8.0)
    val expEntropy = math.round(math.log(8.0) * 1e6).toDouble -
      (1L * math.round(math.log(1.0) * 1e6) +
        7L * math.round(math.log(7.0) * 1e6)).toDouble / 8L
    assert(r2.getAs[Double]("entropy_micro") == expEntropy)
  }

  test("hourlyAcf: alternating series — absent hours count as ZERO on the " +
      "dense grid; exact n-scaled numerators; lag-1 negative, lag-2 positive") {
    import spark.implicits._
    // events at h0×2, h2×2, h4×2; h1/h3 absent → counts [2,0,2,0,2]
    // n=5, S=6, cx = 5x−6 = [4,−6,4,−6,4]; den = 3·16 + 2·36 = 120
    // lag1: 4·−6 ×4 = −96; lag2: 16+36+16 = 68
    val ev = Seq(
      "2024-01-01 00:10:00", "2024-01-01 00:20:00",
      "2024-01-01 02:10:00", "2024-01-01 02:20:00",
      "2024-01-01 04:10:00", "2024-01-01 04:20:00"
    ).map(ts).toDF("ts")
    val out = Temporal.hourlyAcf(ev, "ts", 2).collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("lag") == 1L)
    assert(out(0).getAs[Long]("n_pairs") == 4L)
    assert(out(0).getAs[Long]("num_scaled") == -96L)
    assert(out(0).getAs[Long]("den_scaled") == 120L)
    assert(out(0).getAs[Double]("acf") == -96.0 / 120.0)
    assert(out(1).getAs[Long]("num_scaled") == 68L)
    assert(out(1).getAs[Double]("acf") == 68.0 / 120.0)
  }

  test("dailyCusum: gap day is a genuine zero, peak lands on it, final " +
      "cusum is exactly 0") {
    import spark.implicits._
    // days 1,2,4 with values 10,10,40 → s = [1e7,1e7,0,4e7] micro,
    // n=4, T=6e7; n·s−T = [−2e7,−2e7,−6e7,1e8];
    // prefix = [−2e7,−4e7,−1e8,0]; cusum/n = [−5e6,−1e7,−2.5e7,0]
    val df = Seq(
      ("2024-03-01 08:00:00", 10.0),
      ("2024-03-02 09:00:00", 10.0),
      ("2024-03-04 10:00:00", 40.0)
    ).map { case (t, v) => (ts(t), v) }.toDF("ts", "v")
    val out = Temporal.dailyCusum(df, "ts", "v").orderBy("day").collect()
    assert(out.length == 4)
    assert(out.map(_.getAs[Double]("cusum_micro")).toSeq ==
      Seq(-5e6, -1e7, -2.5e7, 0.0))
    assert(out.map(_.getAs[Boolean]("is_peak")).toSeq ==
      Seq(false, false, true, false))
    assert(out(2).getAs[Date]("day").toString == "2024-03-03")
  }

  test("modularity: two disjoint triangles under the true partition give " +
      "Q = 1/2 exactly; the everything-in-one partition gives Q = 0") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("a", "b")
    val goodPart = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("id", "c")
    val out = Graphs.modularity(edges, "a", "b", goodPart, "id", "c")
      .orderBy(col("community").asc_nulls_last).collect()
    assert(out.length == 3)
    // per community: e_c = 3, d_c = 6, q_scaled = 4·6·3 − 36 = 36
    assert(out(0).getAs[Long]("q_scaled") == 36L)
    assert(out(1).getAs[Long]("q_scaled") == 36L)
    val total = out(2)
    assert(total.isNullAt(0))
    assert(total.getAs[Long]("intra_edges") == 6L)
    assert(total.getAs[Long]("degree_sum") == 12L)
    assert(total.getAs[Double]("modularity") == 72.0 / 144.0)

    val onePart = (1L to 6L).map(i => (i, 0L)).toDF("id", "c")
    val all = Graphs.modularity(edges, "a", "b", onePart, "id", "c")
      .orderBy(col("community").asc_nulls_last).collect()
    assert(all.last.getAs[Double]("modularity") == 0.0)
  }

  test("knBigramLm: hand-computed Kneser-Ney on a 3-doc corpus; per-context " +
      "probability mass is exactly 1 when every successor is emitted") {
    import spark.implicits._
    // bigrams: "a b"×2, "a c"×1 → B = 2 types, c1(a) = 3,
    // N1+(a·) = 2, N1+(·b) = 1, N1+(·c) = 1, d = 3/4:
    //   P(b|a) = ((4·2−3)·2 + 3·2·1) / (4·2·3) = 16/24
    //   P(c|a) = ((4·1−3)·2 + 3·2·1) / 24     =  8/24
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val out = TextOps.knBigramLm(docs, "text", 10)
      .orderBy("w2").collect()
    assert(out.length == 2)
    val pb = out(0) // w2 = b
    assert(pb.getAs[Long]("p_num") == 16L && pb.getAs[Long]("p_den") == 24L)
    assert(pb.getAs[Double]("p_kn") == 16.0 / 24.0)
    val pc = out(1)
    assert(pc.getAs[Long]("p_num") == 8L && pc.getAs[Long]("p_den") == 24L)
    assert(out.map(r => r.getAs[Long]("p_num").toDouble /
      r.getAs[Long]("p_den")).sum == 1.0)
  }

  test("isotonicCalibration: PAV pools the violating pair exactly " +
      "(minimax closed form = hand PAV), monotone output, no-op on " +
      "already-monotone input") {
    import spark.implicits._
    // rates [.1, .5, .3, .7] equal weights → PAV pools bins 1,2 → .4
    val bins = Seq((0L, 1L, 10L), (1L, 5L, 10L), (2L, 3L, 10L),
      (3L, 7L, 10L)).toDF("bin", "k", "n")
    val out = Quality.isotonicCalibration(bins, "bin", "k", "n")
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Double]("iso_rate")).toSeq ==
      Seq(0.1, 0.4, 0.4, 0.7))
    assert(out.map(_.getAs[Double]("rate")).toSeq == Seq(0.1, 0.5, 0.3, 0.7))
    // weighted pooling: [.1(n=10), .5(n=30), .3(n=10)] → pool 1,2 →
    // (15+3)/40 = .45
    val wbins = Seq((0L, 1L, 10L), (1L, 15L, 30L), (2L, 3L, 10L))
      .toDF("bin", "k", "n")
    val wout = Quality.isotonicCalibration(wbins, "bin", "k", "n")
      .orderBy("bin").collect()
    assert(wout.map(_.getAs[Double]("iso_rate")).toSeq ==
      Seq(0.1, 0.45, 0.45))
    // already monotone → identity
    val mono = Seq((0L, 1L, 10L), (1L, 5L, 10L), (2L, 9L, 10L))
      .toDF("bin", "k", "n")
    val mout = Quality.isotonicCalibration(mono, "bin", "k", "n")
      .orderBy("bin").collect()
    assert(mout.map(r => r.getAs[Double]("iso_rate")).toSeq ==
      mout.map(r => r.getAs[Double]("rate")).toSeq)
  }

  test("copurchasePairs: duplicate lines collapse before pairing, support " +
      "counts baskets, confidence and lift hand-check") {
    import spark.implicits._
    // baskets: b1{1,2,3}, b2{1,2}, b3{1,2} (with a duplicated line), b4{3}
    val lines = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 2L), (4L, 3L)).toDF("bk", "it")
    val out = Analytics.copurchasePairs(lines, "bk", "it", 2L, 10)
      .collect()
    // only (1,2) reaches support 3; (1,3)/(2,3) have support 1
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("support") == 3L)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("n_baskets") == 4L)
    assert(r.getAs[Double]("confidence_ab") == 1.0)
    assert(r.getAs[Double]("lift") == 3.0 * 4.0 / 9.0)
  }

  test("rfmSegments: hand-computed recency/frequency/monetary and " +
      "strictly-below quintile codes; ties share a code") {
    import spark.implicits._
    val orders = Seq(
      (1L, "2024-01-10 00:00:00", 100.0),
      (1L, "2024-01-20 00:00:00", 50.0),
      (2L, "2024-01-05 00:00:00", 10.0),
      (3L, "2024-01-20 00:00:00", 10.0),
      (4L, "2024-01-15 00:00:00", 500.0),
      (5L, "2024-01-01 00:00:00", 20.0)
    ).map { case (c, t, v) => (c, ts(t), v) }.toDF("c", "ts", "v")
    val out = Analytics.rfmSegments(orders, "c", "ts", "v")
      .orderBy("c").collect()
    // max date = 01-20; r_days: c1=0, c2=15, c3=0, c4=5, c5=19
    assert(out.map(_.getAs[Long]("r_days")).toSeq == Seq(0L, 15L, 0L, 5L, 19L))
    assert(out.map(_.getAs[Long]("f")).toSeq == Seq(2L, 1L, 1L, 1L, 1L))
    assert(out.map(_.getAs[Long]("m_cents")).toSeq ==
      Seq(15000L, 1000L, 1000L, 50000L, 2000L))
    // r codes (n=5, strictly-below): r=0 → cb=0 → 1 (both c1, c3 SHARE),
    // r=5 → cb=2 → 3, r=15 → cb=3 → 4, r=19 → cb=4 → 5
    assert(out.map(_.getAs[Long]("r_days_code")).toSeq ==
      Seq(1L, 4L, 1L, 3L, 5L))
    // f: four 1s (cb=0 → 1), one 2 (cb=4 → 5)
    assert(out.map(_.getAs[Long]("f_code")).toSeq == Seq(5L, 1L, 1L, 1L, 1L))
    // m_cents asc: 1000×2 (code 1), 2000 (cb=2 → 3), 15000 (cb=3 → 4),
    // 50000 (cb=4 → 5)
    assert(out.map(_.getAs[Long]("m_cents_code")).toSeq ==
      Seq(4L, 1L, 1L, 5L, 3L))
  }

  test("kaplanMeier: at-risk accounting with censoring, micro-log exact " +
      "survival terms, event days only contribute, death-of-last hits the " +
      "sentinel") {
    import spark.implicits._
    def lnM(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val subj = Seq((1L, true), (2L, false), (3L, true), (3L, false))
      .toDF("dur", "ev")
    val out = Temporal.kaplanMeier(subj, "dur", "ev").orderBy("t").collect()
    assert(out.map(_.getAs[Long]("n_risk")).toSeq == Seq(4L, 3L, 2L))
    assert(out.map(_.getAs[Long]("d_event")).toSeq == Seq(1L, 0L, 1L))
    assert(out.map(_.getAs[Long]("d_censored")).toSeq == Seq(0L, 1L, 1L))
    val a = lnM(3) - lnM(4)
    val b = lnM(1) - lnM(2)
    assert(out.map(_.getAs[Long]("log_surv_micro")).toSeq ==
      Seq(a, a, a + b))
    // the last at-risk subject dying pushes survival to the -∞ sentinel
    val dead = Seq((1L, true)).toDF("dur", "ev")
    assert(Temporal.kaplanMeier(dead, "dur", "ev").collect()(0)
      .getAs[Long]("log_surv_micro") == -1000000000000L)
  }

  test("chiSquare: exact 0 under perfect independence, chi2 = n and " +
      "V = 1 under perfect 2x2 association") {
    import spark.implicits._
    val indep = (Seq.fill(25)(("x", "p")) ++ Seq.fill(25)(("x", "q")) ++
      Seq.fill(25)(("y", "p")) ++ Seq.fill(25)(("y", "q"))).toDF("a", "b")
    val r1 = Quality.chiSquare(indep, "a", "b").collect()(0)
    assert(r1.getAs[Long]("chi2_micro_sum") == 0L)
    assert(r1.getAs[Long]("dof") == 1L)
    assert(r1.getAs[Double]("cramers_v") == 0.0)

    val assoc = (Seq.fill(50)(("x", "p")) ++ Seq.fill(50)(("y", "q")))
      .toDF("a", "b")
    val r2 = Quality.chiSquare(assoc, "a", "b").collect()(0)
    assert(r2.getAs[Long]("n_cells") == 4L) // zero-observed cells included
    assert(r2.getAs[Long]("chi2_micro_sum") == 100L * 1000000L)
    assert(r2.getAs[Double]("cramers_v") == 1.0)
  }

  test("labelPropagation: frontier extends one hop per iteration with " +
      "frozen seeds; ties resolve to the lexicographically smallest label") {
    import spark.implicits._
    val nodes = (1L to 7L).map(i =>
      (i, if (i == 1L) "en" else if (i == 5L) "en" else if (i == 7L) "de"
        else null)).toDF("id", "seed")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (7L, 6L))
      .toDF("a", "b")
    val out = Graphs.labelPropagation(nodes, "id", "seed", edges, "a", "b",
      iters = 2).orderBy("id").collect()
    val labels = out.map(r => Option(r.getAs[String]("label")).orNull).toSeq
    // path 1-2-3-4: seed at 1 reaches 3 in two hops, 4 stays null;
    // 6 sees en (from 5) and de (from 7) with one vote each → "de"
    assert(labels == Seq("en", "en", "en", null, "en", "de", "de"))

    // one iteration reaches only the first hop
    val one = Graphs.labelPropagation(nodes, "id", "seed", edges, "a", "b",
      iters = 1).orderBy("id").collect()
      .map(r => Option(r.getAs[String]("label")).orNull).toSeq
    assert(one == Seq("en", "en", null, null, "en", "de", "de"))
  }

  test("ksTest: disjoint samples → D = 1, identical samples → D = 0, " +
      "hand-computed mixed case with smallest argmax score") {
    import spark.implicits._
    val disjoint = Seq((true, 1L), (true, 2L), (true, 3L),
      (false, 4L), (false, 5L), (false, 6L)).toDF("g", "v")
    val r1 = Quality.ksTest(disjoint, col("g"), col("v")).collect()(0)
    assert(r1.getAs[Double]("d") == 1.0)
    assert(r1.getAs[Long]("at_value") == 3L)

    val same = Seq((true, 1L), (true, 2L), (false, 1L), (false, 2L))
      .toDF("g", "v")
    val r2 = Quality.ksTest(same, col("g"), col("v")).collect()(0)
    assert(r2.getAs[Long]("d_num") == 0L)
    assert(r2.getAs[Long]("at_value") == 1L) // ties → smallest score

    // s1 = {1,3}, s2 = {2,3}: max dev at v=1 (|1·2 − 0·2| = 2), D = 1/2
    val mixed = Seq((true, 1L), (true, 3L), (false, 2L), (false, 3L))
      .toDF("g", "v")
    val r3 = Quality.ksTest(mixed, col("g"), col("v")).collect()(0)
    assert(r3.getAs[Long]("d_num") == 2L)
    assert(r3.getAs[Double]("d") == 0.5)
    assert(r3.getAs[Long]("at_value") == 1L)
  }

  test("seasonalityProfile: full 7x24 calendar spine with genuine zero " +
      "cells, exact micro means, weekday day-counting over the span") {
    import spark.implicits._
    // span 2024-01-01 (Mon) .. 2024-01-08 (Mon): Mondays appear twice,
    // every other weekday once; 3 events Monday@10, 1 event Tuesday@5
    val ev = Seq(
      "2024-01-01 10:15:00", "2024-01-01 10:45:00", "2024-01-08 10:30:00",
      "2024-01-02 05:00:00"
    ).map(ts).toDF("ts")
    val out = Analytics.seasonalityProfile(ev, "ts").collect()
      .map(r => (r.getAs[Long]("dow"), r.getAs[Long]("hod")) -> r).toMap
    assert(out.size == 7 * 24)
    // Spark dayofweek: Monday = 2, Tuesday = 3
    val mon10 = out((2L, 10L))
    assert(mon10.getAs[Long]("n_events") == 3L)
    assert(mon10.getAs[Long]("n_days") == 2L)
    assert(mon10.getAs[Long]("mean_micro") == 1500000L)
    // grand mean: 4 events / (8 days · 24 h) = floor((8e6+192)/384)
    assert(mon10.getAs[Long]("grand_mean_micro") == (4L * 2000000L + 192L) / 384L)
    val tue5 = out((3L, 5L))
    assert(tue5.getAs[Long]("n_events") == 1L && tue5.getAs[Long]("n_days") == 1L)
    assert(tue5.getAs[Long]("mean_micro") == 1000000L)
    // an untouched cell is a genuine zero with a negative deviation
    val mon0 = out((2L, 0L))
    assert(mon0.getAs[Long]("n_events") == 0L)
    assert(mon0.getAs[Long]("mean_micro") == 0L)
    assert(mon0.getAs[Long]("deviation_micro") ==
      -mon0.getAs[Long]("grand_mean_micro"))
  }

  test("entropyRate: 0 for a deterministic process; hand micro-log value " +
      "for a skewed row; total row carries the division") {
    import spark.implicits._
    def lnM(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val det = Seq(("A", "B", 5L), ("B", "A", 5L)).toDF("f", "t2", "n")
    val rows = Quality.entropyRate(det, "f", "n")
      .orderBy(col("state").asc_nulls_last).collect()
    assert(rows.map(_.getAs[Long]("h_micro_sum")).toSeq == Seq(0L, 0L, 0L))
    assert(rows.last.getAs[Double]("entropy_rate") == 0.0)

    // A → {A×2, B×1}: h = 2(lnµ3 − lnµ2) + (lnµ3 − lnµ1)
    val skew = Seq(("A", "A", 2L), ("A", "B", 1L)).toDF("f", "t2", "n")
    val out = Quality.entropyRate(skew, "f", "n")
      .orderBy(col("state").asc_nulls_last).collect()
    val expected = 2L * (lnM(3) - lnM(2)) + (lnM(3) - lnM(1))
    assert(out(0).getAs[Long]("h_micro_sum") == expected)
    assert(out(1).getAs[Long]("n_from") == 3L)
    assert(out(1).getAs[Double]("entropy_rate") ==
      expected.toDouble / (3L * 1000000.0))
  }

  test("hits: integer fixed point matches an exact scalar replica of the " +
      "recursion; the better-connected hub and authority rank higher") {
    import spark.implicits._
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("s", "d")
    val out = Graphs.hits(edges, "s", "d", iters = 2)
      .collect()
      .map(r => (r.getAs[String]("side"), r.getAs[Long]("id")) ->
        r.getAs[Long]("score_scaled")).toMap
    // exact scalar replica of the same truncating integer recursion
    val scale = 1000000000L
    val es = Seq((1L, 10L), (1L, 11L), (2L, 10L))
    var h = Map(1L -> scale / 2, 2L -> scale / 2)
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      val aRaw = es.groupBy(_._2).view.mapValues(_.map(e => h(e._1)).sum).toMap
      val aTot = aRaw.values.sum
      a = aRaw.view.mapValues(v => v * scale / aTot).toMap
      val hRaw = es.groupBy(_._1).view.mapValues(_.map(e => a(e._2)).sum).toMap
      val hTot = hRaw.values.sum
      h = hRaw.view.mapValues(v => v * scale / hTot).toMap
    }
    assert(out(("hub", 1L)) == h(1L) && out(("hub", 2L)) == h(2L))
    assert(out(("authority", 10L)) == a(10L) && out(("authority", 11L)) == a(11L))
    assert(out(("hub", 1L)) > out(("hub", 2L)))
    assert(out(("authority", 10L)) > out(("authority", 11L)))
  }

  test("hourlyFano: alternating series gives F = 1 for these counts, " +
      "metronomic series gives F = 0, shared grid supplies the zeros") {
    import spark.implicits._
    // span h0..h3 (B pins the bounds); A = [2,0,2,0], B = [1,1,1,1]
    val ev = Seq(
      ("A", "2024-01-01 00:10:00"), ("A", "2024-01-01 00:20:00"),
      ("A", "2024-01-01 02:10:00"), ("A", "2024-01-01 02:20:00"),
      ("B", "2024-01-01 00:30:00"), ("B", "2024-01-01 01:30:00"),
      ("B", "2024-01-01 02:30:00"), ("B", "2024-01-01 03:30:00")
    ).map { case (k, t) => (k, ts(t)) }.toDF("k", "ts")
    val rows = Temporal.hourlyFano(ev, "k", "ts").orderBy("k").collect()
    val a = rows(0)
    assert(a.getAs[Long]("n_hours") == 4L)
    assert(a.getAs[Long]("s") == 4L && a.getAs[Long]("sum_sq") == 8L)
    assert(a.getAs[Double]("fano") == (4.0 * 8 - 16) / 16.0) // = 1.0
    val b = rows(1)
    assert(b.getAs[Double]("fano") == 0.0)
  }

  test("crossCorrHourly: a 1-hour lead shows r = -1 at lag 0 and " +
      "positive correlation at ±1 for an alternating pair") {
    import spark.implicits._
    val ev = Seq(
      ("view", "2024-01-01 00:10:00"), ("purchase", "2024-01-01 01:10:00"),
      ("view", "2024-01-01 02:10:00"), ("purchase", "2024-01-01 03:10:00")
    ).map { case (k, t) => (k, ts(t)) }.toDF("event_type", "ts")
    val out = Temporal.crossCorrHourly(ev, "ts", "event_type",
        "view", "purchase", 1)
      .orderBy("lag").collect()
    assert(out.map(_.getAs[Long]("lag")).toSeq == Seq(-1L, 0L, 1L))
    // x = [1,0,1,0], y = [0,1,0,1]: ex = [2,-2,2,-2], ey = [-2,2,-2,2]
    assert(out(1).getAs[Long]("num_scaled") == -16L)
    assert(out(1).getAs[Double]("r") == -1.0)
    assert(out(0).getAs[Long]("num_scaled") == 12L)
    assert(out(2).getAs[Long]("num_scaled") == 12L)
    assert(out(2).getAs[Double]("r") == 12.0 / 16.0)
  }

  test("nearestCentroidConfusion: clean clusters give a diagonal matrix, " +
      "a point in the wrong cluster lands in the off-diagonal cell") {
    import spark.implicits._
    val embs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.1f), 0),
      (2L, Array(0.0f, 1.0f), 1),
      (3L, Array(0.1f, 1.0f), 1),
      (4L, Array(0.0f, 0.9f), 0) // labeled 0 but sits in cluster 1
    ).toDF("vec_id", "embedding", "label")
    val cells = Similarity.nearestCentroidConfusion(embs, "vec_id",
        "embedding", "label")
      .collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("predicted")) ->
        r.getAs[Long]("n")).toMap
    assert(cells((0L, 0L)) == 2L)
    assert(cells((1L, 1L)) == 2L)
    assert(cells((0L, 1L)) == 1L)
    assert(!cells.contains((1L, 0L)))
  }

  test("sessionFunnel: stage order is enforced WITHIN a session — " +
      "cross-session credit and out-of-order stages never count") {
    import spark.implicits._
    val ev = Seq(
      // u1 session 1: full ordered funnel → counts at every stage
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:05:00", 2L, "click"),
      (1L, "2024-01-01 10:10:00", 3L, "purchase"),
      // u1 session 2 (90-min gap): purchase BEFORE click/view → only the
      // view stage counts; the purchase must NOT inherit session 1's click
      (1L, "2024-01-01 12:00:00", 4L, "purchase"),
      (1L, "2024-01-01 12:01:00", 5L, "view"),
      // u2: click then view (out of order) → view counts, click doesn't
      (2L, "2024-01-01 10:00:00", 6L, "click"),
      (2L, "2024-01-01 10:01:00", 7L, "view")
    ).map { case (u, t, e, ty) => (u, ts(t), e, ty) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Temporal.sessionFunnel(ev, "user_id", "ts", "event_id",
      "view", "click", "purchase", "event_type", 30).collect()(0)
    assert(r.getAs[Long]("n_sessions") == 3L)
    assert(r.getAs[Long]("n_stage1") == 3L) // all three sessions saw a view
    assert(r.getAs[Long]("n_stage2") == 1L) // only u1/s1's click qualifies
    assert(r.getAs[Long]("n_stage3") == 1L) // only u1/s1 converts
  }

  test("weightedPageRank: equal weights coincide with the unweighted " +
      "operator; a heavier edge pulls measurably more rank") {
    import spark.implicits._
    val nodes = (1L to 4L).toDF("id")
    val edges = Seq((1L, 2L), (3L, 2L), (3L, 4L)).toDF("a", "b")
    val flat = edges.withColumn("w", lit(1000000L))
    val wpr = Graphs.weightedPageRank(nodes, "id", flat, "a", "b", "w",
        iters = 3).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_micro")).toMap
    val pr = Graphs.pageRank(nodes, "id", edges, "a", "b", iters = 3)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_micro")).toMap
    assert(wpr == pr)
    // tilt node 3's mass toward 4: rank(4) rises, rank(2) falls
    val tilted = Seq((1L, 2L, 1000000L), (3L, 2L, 100000L),
      (3L, 4L, 1000000L)).toDF("a", "b", "w")
    val tpr = Graphs.weightedPageRank(nodes, "id", tilted, "a", "b", "w",
        iters = 3).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_micro")).toMap
    assert(tpr(4L) > wpr(4L) && tpr(2L) < wpr(2L))
  }

  test("mmrRerank: diversification at low λ — the exact duplicate of the " +
      "first pick is deferred behind the orthogonal candidate; greedy " +
      "invariant recomputes from the output") {
    import spark.implicits._
    // q=0:[1,0]; 1 and 2 identical direction (sim = 1e6); 3 off-axis.
    // λ = 0.3 weighs redundancy enough that step 2 takes 3 over 2.
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.95f, 0.05f)),
      (2L, Array(0.95f, 0.05f)),
      (3L, Array(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(embs, "vec_id", "embedding",
      queryId = 0L, poolK = 3, selectK = 3, lambdaTenths = 3)
      .orderBy("step").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 3L, 2L))
    // step-1 argmax is the best relevance with min-id tie-break (1 over 2)
    assert(out(0).getAs[Long]("rel_micro") ==
      out.map(_.getAs[Long]("rel_micro")).max)
    assert(out(0).getAs[Long]("mmr_scaled") ==
      3L * out(0).getAs[Long]("rel_micro"))
    // the exact duplicate's step-3 score carries the full 1e6 penalty
    assert(out(2).getAs[Long]("mmr_scaled") ==
      3L * out(2).getAs[Long]("rel_micro") - 7L * 1000000L)
    // deterministic rerun
    val again = Similarity.mmrRerank(embs, "vec_id", "embedding",
      queryId = 0L, poolK = 3, selectK = 3, lambdaTenths = 3)
      .orderBy("step").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("targetEncode: exact integer shrinkage toward the global mean") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 4.0)).toDF("cat", "v")
    val out = Analytics.targetEncode(df, "cat", "v", 2L).collect()
    val m = out.map(r => r.getAs[String]("category") -> r).toMap
    // N=3, S=7·10⁶ → global mean 2333333 (floor)
    assert(out.forall(_.getAs[Long]("global_mean_micro") == 2333333L))
    // a: (3·10⁶ + 2·2333333) div 4; b: (4·10⁶ + 2·2333333) div 3
    assert(m("a").getAs[Long]("n") == 2L)
    assert(m("a").getAs[Long]("enc_micro") == (3000000L + 2 * 2333333L) / 4)
    assert(m("b").getAs[Long]("enc_micro") == (4000000L + 2 * 2333333L) / 3)
    // m = 0 degenerates to the exact per-category floor mean
    val raw = Analytics.targetEncode(df, "cat", "v", 0L).collect()
      .map(r => r.getAs[String]("category") -> r.getAs[Long]("enc_micro"))
      .toMap
    assert(raw("a") == 1500000L && raw("b") == 4000000L)
  }

  test("bradleyTerry: a dominance chain orders strengths; the " +
      "normalized micro sum is conserved; an even split ties") {
    import spark.implicits._
    // A beats B 3-0, B beats C 3-0, A beats C 3-0
    val wins = Seq(("A", "B", 3L), ("B", "C", 3L), ("A", "C", 3L))
      .toDF("a", "b", "w")
    val out = Analytics.bradleyTerry(wins, "a", "b", "w", iters = 3)
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    val s = out.map(r => r.getString(0) -> r.getAs[Long]("strength_micro"))
      .toMap
    assert(s("A") > s("B") && s("B") > s("C"))
    assert(out.map(r => r.getAs[Long]("wins")).toSeq == Seq(6L, 3L, 0L))
    assert(out.map(r => r.getAs[Long]("games")).toSeq == Seq(6L, 6L, 6L))
    // rescale pins the total to k·1e6 (within k units of truncation)
    val tot = s.values.sum
    assert(tot <= 3000000L && tot >= 3000000L - 3L)
    // a perfectly split rivalry converges to equal strengths
    val even = Seq(("A", "B", 2L), ("B", "A", 2L)).toDF("a", "b", "w")
    val e = Analytics.bradleyTerry(even, "a", "b", "w", iters = 3)
      .collect().map(r => r.getAs[Long]("strength_micro")).toSeq
    assert(e == Seq(1000000L, 1000000L))
  }
}
