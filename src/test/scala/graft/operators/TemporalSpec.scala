package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("rollingMedianAnomaly: exact even/odd medians, warm-up guard, " +
      "high and low flags") {
    import spark.implicits._
    // key a: counts 4,5,4,5,100 on five days; key b: 10,10,10,1 on four
    val counts = Seq(
      ("a", "2024-01-01", 4), ("a", "2024-01-02", 5), ("a", "2024-01-03", 4),
      ("a", "2024-01-04", 5), ("a", "2024-01-05", 100),
      ("b", "2024-01-01", 10), ("b", "2024-01-02", 10),
      ("b", "2024-01-03", 10), ("b", "2024-01-04", 1))
    val ev = counts.flatMap { case (k, d, n) =>
      (1 to n).map(_ => (k, ts(s"$d 12:00:00")))
    }.toDF("event_type", "ts")
    val out = Temporal.rollingMedianAnomaly(ev, "event_type", "ts", 7)
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getAs[Long]("cnt"), r.getAs[Long]("n_window"),
        r.getAs[Long]("median_x2"), r.getAs[Boolean]("is_anomaly")))
    val a = out.filter(_._1 == "a").map(t => (t._3, t._4, t._5, t._6))
    // odd window [4,4,5]: median×2 = 8; even window [4,4,5,5]: l[2]+l[3]=9
    assert(a.toSeq == Seq((4L, 1L, 8L, false), (5L, 2L, 9L, false),
      (4L, 3L, 8L, false), (5L, 4L, 9L, false), (100L, 5L, 10L, true)))
    val b = out.filter(_._1 == "b").map(t => (t._3, t._4, t._5, t._6))
    // low-side flag: 1 < 0.5·median(=10 via sorted [1,10,10,10] → 20/2)
    assert(b.toSeq == Seq((10L, 1L, 20L, false), (10L, 2L, 20L, false),
      (10L, 3L, 20L, false), (1L, 4L, 20L, true)))
    // warm-up: n_window < 4 never flags even when deviant
    assert(out.filter(_._4 < 4).forall(t => !t._6))
  }

  test("asofJoin attaches the latest right row at or before each left ts") {
    import spark.implicits._
    val quotes = Seq( // (key, ts, px)
      ("A", "2024-01-01 10:00:00", 100.0),
      ("A", "2024-01-01 10:05:00", 101.0),
      ("B", "2024-01-01 10:02:00", 50.0)
    ).map { case (k, t, p) => (k, ts(t), p) }.toDF("sym", "qts", "px")
    val trades = Seq( // (key, ts, qty)
      ("A", "2024-01-01 10:00:00", 1L), // equal ts → matched (>= semantics)
      ("A", "2024-01-01 10:04:59", 2L), // before second quote
      ("A", "2024-01-01 10:06:00", 3L), // after second quote
      ("B", "2024-01-01 10:01:00", 4L), // before any B quote → null
      ("C", "2024-01-01 10:00:00", 5L)  // key with no rights → null
    ).map { case (k, t, q) => (k, ts(t), q) }.toDF("sym", "tts", "qty")
    val out = Temporal.asofJoin(trades, quotes, "sym", "tts", "qts", Seq("px"))
      .collect().map(r => r.getAs[Long]("qty") ->
        Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double])).toMap
    assert(out == Map(1L -> Some(100.0), 2L -> Some(100.0), 3L -> Some(101.0),
      4L -> None, 5L -> None))
  }

  test("sessionize splits on gaps > the threshold, session ends gap after last") {
    import spark.implicits._
    val ev = Seq(
      ("u1", "2024-01-01 10:00:00", 1.0),
      ("u1", "2024-01-01 10:20:00", 2.0), // 20 min gap → same session
      ("u1", "2024-01-01 11:00:00", 3.0), // 40 min gap → new session
      ("u2", "2024-01-01 10:00:00", 4.0)
    ).map { case (k, t, v) => (k, ts(t), v) }.toDF("user_id", "ts", "value")
    val out = Temporal.sessionize(ev, "user_id", "ts", "30 minutes", col("value"))
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    val first = out(0)
    assert(first.getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
    assert(first.getAs[Timestamp]("session_end") == ts("2024-01-01 10:50:00"))
    assert(first.getAs[Long]("n_events") == 2L)
    assert(first.getAs[Double]("sum_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1L)
  }

  test("gapFillHourly: silent hours filled forward, NULL observations carried") {
    import spark.implicits._
    val df = Seq(
      ("A", ts("2024-01-01 10:10:00"), Option(1.0), 1L),
      ("A", ts("2024-01-01 10:40:00"), Option(2.0), 2L),  // same hour: later wins
      ("A", ts("2024-01-01 13:05:00"), Option.empty[Double], 3L), // NULL observed
      ("A", ts("2024-01-01 14:30:00"), Option(4.0), 4L),
      ("B", ts("2024-01-01 00:00:00"), Option(9.0), 5L))
      .toDF("k", "t", "v", "id")
    val out = Temporal.gapFillHourly(df, "k", "t", "v", "id")
      .collect().map(r => (r.getString(0),
          r.getAs[java.time.LocalDateTime](1).toString) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3))).toMap
    assert(out(("A", "2024-01-01T10:00")) == ((Some(2.0), true)))
    assert(out(("A", "2024-01-01T11:00")) == ((Some(2.0), false))) // filled
    assert(out(("A", "2024-01-01T12:00")) == ((Some(2.0), false)))
    // hour 13's observation is genuinely NULL: carried, NOT skipped back to 2.0
    assert(out(("A", "2024-01-01T13:00")) == ((None, true)))
    assert(out(("A", "2024-01-01T14:00")) == ((Some(4.0), true)))
    assert(out(("B", "2024-01-01T00:00")) == ((Some(9.0), true)))
    assert(out.count(_._1._1 == "A") == 5) // spine covers 10:00..14:00
  }

  test("transitionMatrix: adjacency within user only, probabilities sum to 1 " +
      "per from-state") {
    import spark.implicits._
    val ev = Seq(
      // user 1: view -> click -> view -> click   (v->c ×2, c->v ×1)
      (1L, "view", ts("2024-01-01 10:00:00"), 1L),
      (1L, "click", ts("2024-01-01 10:01:00"), 2L),
      (1L, "view", ts("2024-01-01 10:02:00"), 3L),
      (1L, "click", ts("2024-01-01 10:03:00"), 4L),
      // user 2: view -> buy; the cross-user (click, view) gap is NOT a pair
      (2L, "view", ts("2024-01-01 09:00:00"), 5L),
      (2L, "buy", ts("2024-01-01 09:05:00"), 6L))
      .toDF("user_id", "event_type", "t", "event_id")
    val out = Analytics.transitionMatrix(ev, "user_id", "event_type", "t", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p")))).toMap
    assert(out.size == 3)
    assert(out(("view", "click")) == ((2L, 2.0 / 3)))
    assert(out(("view", "buy")) == ((1L, 1.0 / 3)))
    assert(out(("click", "view")) == ((1L, 1.0)))
    // per-from probability mass is exactly 1
    val mass = out.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._2).sum)
    mass.foreach { case (_, m) => assert(math.abs(m - 1.0) < 1e-15) }
  }

  test("transitionMatrix: same-timestamp events order by the tie column") {
    import spark.implicits._
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq((1L, "a", t0, 2L), (1L, "b", t0, 1L), (1L, "c", t0, 3L))
      .toDF("user_id", "event_type", "t", "event_id")
    val out = Analytics.transitionMatrix(ev, "user_id", "event_type", "t", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("b", "a"), ("a", "c")))  // order is b(1), a(2), c(3)
  }

  test("linearAttribution: purchase value split equally over in-window " +
      "views, out-of-window and other-user views excluded") {
    import spark.implicits._
    val ev = Seq(
      // user 1: two views (hours 9, 10) then a 3.0 purchase at 11
      (1L, 1L, "view", ts("2024-01-05 09:00:00"), Option.empty[Double]),
      (2L, 1L, "view", ts("2024-01-05 10:00:00"), Option.empty[Double]),
      (3L, 1L, "purchase", ts("2024-01-05 11:00:00"), Some(3.0)),
      // user 1: a view 8 days earlier — outside the 7-day window
      (4L, 1L, "view", ts("2023-12-28 09:00:00"), Option.empty[Double]),
      // user 2's view must not absorb user 1's purchase
      (5L, 2L, "view", ts("2024-01-05 09:30:00"), Option.empty[Double])
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Analytics.linearAttribution(ev, "user_id", "ts", "event_type",
        "value", "view", "purchase", 7)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // 3.0 split over the two qualifying views -> 1.5e6 micro each
    assert(out == Map(9 -> 1500000L, 10 -> 1500000L))
  }

  test("ewmaTrailing: hand-computed fixed-point weights, per-key isolation, " +
      "and short-history denominators") {
    import spark.implicits._
    val ev = Seq(
      (1L, 7L, ts("2024-01-05 09:00:00"), 1.0),
      (2L, 7L, ts("2024-01-05 10:00:00"), 2.0),
      (3L, 7L, ts("2024-01-05 11:00:00"), 4.0),
      (4L, 8L, ts("2024-01-05 09:30:00"), 10.0) // other key: untouched
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Temporal.ewmaTrailing(ev, "user_id", "ts", "event_id",
        "value", depth = 2)
      .collect().map(r => r.getLong(2) -> r.getDouble(4)).toMap
    // depth=2, weights current=2, prev=1 (micro-quantized):
    //  e1: 2*1e6 / (2*1e6)                  = 1.0
    //  e2: (2*2e6 + 1e6) / (3*1e6)          = 5/3
    //  e3: (2*4e6 + 2e6) / (3*1e6)          = 10/3
    assert(out(1L) == 1.0)
    assert(out(2L) == 5e6 / 3e6)
    assert(out(3L) == 10e6 / 3e6)
    assert(out(4L) == 10.0)
  }

  test("ewmaTrailing is bit-identical across partitionings and converges " +
      "to the recursion within quantization error at full depth") {
    import spark.implicits._
    val rows = (1 to 100).map(i =>
      (i.toLong, (i % 2).toLong, ts(f"2024-01-05 ${9 + i / 60}%02d:${i % 60}%02d:00"),
        math.sin(i) * 100))
    val df = rows.toDF("event_id", "user_id", "ts", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      Temporal.ewmaTrailing(d, "user_id", "ts", "event_id", "value", depth = 24)
        .collect().map(r => r.getLong(2) -> r.getDouble(4)).toMap
    val a = run(df)
    val b = run(df.repartition(13))
    assert(a == b) // bit-identical, not approximately
    // reference recursion ewma_t = (x_t + ewma_{t-1}) / 2 per key; past the
    // warm-up the trailing form differs only by the 0.5^24 horizon tail and
    // the 1e-6 quantization — both far under 1e-4. Early rows legitimately
    // differ (the trailing form renormalizes over available lags; the
    // recursion double-weights the seed), so compare from index 24 on.
    rows.groupBy(_._2).foreach { case (_, es) =>
      var ref = Double.NaN
      es.sortBy(e => (e._3.getTime, e._1)).zipWithIndex.foreach { case (e, idx) =>
        ref = if (ref.isNaN) e._4 else (e._4 + ref) / 2.0
        if (idx >= 24) {
          assert(math.abs(a(e._1) - ref) < 1e-4,
            s"event ${e._1}: got ${a(e._1)} want ~$ref")
        }
      }
    }
  }

  test("holtLinear: hand-replayed dyadic recurrence — gap day carries " +
      "s = 0, trend goes negative with exact truncating division") {
    import spark.implicits._
    val rows = Seq(
      ("2024-01-01 00:00:00", 4.0),
      ("2024-01-01 12:00:00", 6.0), // day 1: s = 10e6
      ("2024-01-02 09:00:00", 20.0), // day 2: s = 20e6
      // day 3 missing → gap-filled s = 0
      ("2024-01-04 01:00:00", 8.0)) // day 4: s = 8e6
      .toDF("ts", "v")
      .select(col("ts").cast("timestamp").as("ts"), col("v"))
    val out = Temporal.holtLinear(rows, "ts", "v")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    // l1 = 10e6, b1 = 0
    // l2 = (20e6 + 10e6 + 0)/2 = 15e6; b2 = (15e6 − 10e6 + 0)/4 = 1.25e6
    // l3 = (0 + 15e6 + 1.25e6)/2 = 8125000
    //   b3 = (8125000 − 15e6 + 3·1250000)/4 = −3125000/4 = −781250
    // l4 = (8e6 + 8125000 − 781250)/2 = 7671875
    //   b4 = (7671875 − 8125000 − 2343750)/4 = −2796875/4 = −699218
    //   (truncation toward zero, NOT floor — pinned here)
    assert(out.toSeq == Seq(
      ("2024-01-01", 10000000L, 10000000L, 0L, 10000000L),
      ("2024-01-02", 20000000L, 15000000L, 1250000L, 16250000L),
      ("2024-01-03", 0L, 8125000L, -781250L, 7343750L),
      ("2024-01-04", 8000000L, 7671875L, -699218L, 6972657L)))
  }

  test("theilSen: outlier-robust exact median of pairwise slopes") {
    import spark.implicits._
    // y = 10,12,14,100,18 on five consecutive days: six of ten pairwise
    // slopes are exactly 2/day; the median ignores the 100 outlier
    val df = Seq(
      ("2024-01-01", 10.0), ("2024-01-02", 12.0), ("2024-01-03", 14.0),
      ("2024-01-04", 100.0), ("2024-01-05", 18.0)
    ).map { case (d, v) => (ts(s"$d 12:00:00"), v) }.toDF("t", "v")
    val r = Temporal.theilSen(df, "t", "v").collect().head
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("n_pairs") == 10L)
    // both middle slopes are 2e9 millimicro/day -> doubled 4e9
    assert(r.getAs[Long]("slope2x_millimicro") == 4000000000L)
    assert(r.getAs[Double]("slope_per_day") == 2.0)
  }

  test("theilSen: even pair count sums BOTH (distinct) middle slopes — " +
      "integral rank division regression") {
    import spark.implicits._
    // y = 10,13,14,20 on four consecutive days -> six pairwise slopes
    // (millimicro/day): 3e9, 2e9, 10e9 div 3 = 3333333333, 1e9, 3.5e9,
    // 6e9; sorted middle two are 3e9 and 3333333333 — DISTINCT, so a
    // float-division rank selector ((np+1)/2 = 3.5 never matching rank 3)
    // would double the upper-middle instead of summing both
    val df = Seq(
      ("2024-01-01", 10.0), ("2024-01-02", 13.0), ("2024-01-03", 14.0),
      ("2024-01-04", 20.0)
    ).map { case (d, v) => (ts(s"$d 12:00:00"), v) }.toDF("t", "v")
    val r = Temporal.theilSen(df, "t", "v").collect().head
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Long]("slope2x_millimicro") == 3000000000L + 3333333333L)
    assert(r.getAs[Double]("slope_per_day") == 6333333333.0 / 2.0 / 1e9)
  }

  test("pageHinkley: adaptive-mean drift statistic and alarm threshold") {
    import spark.implicits._
    val df = (1 to 6).map { i =>
      (ts(f"2024-01-0$i%d 12:00:00"), if (i <= 4) 10.0 else 20.0)
    }.toDF("t", "v")
    val out = Temporal.pageHinkley(df, "t", "v", 0L, 10000000L)
      .orderBy("day").collect()
      .map(r => (r.getAs[Long]("mean_micro"), r.getAs[Long]("m_micro"),
        r.getAs[Long]("ph_micro"), r.getAs[Boolean]("alarm")))
    // flat prefix: mean = x, deviations 0, no alarm
    assert(out.take(4).forall(_ == (10000000L, 0L, 0L, false)))
    // t5: mean 6e7 div 5 = 12e6, dev 8e6 -> ph 8e6, below lambda
    assert(out(4) == (12000000L, 8000000L, 8000000L, false))
    // t6: mean 8e7 div 6 = 13333333, dev 6666667, m 14666667 > lambda
    assert(out(5) == (13333333L, 14666667L, 14666667L, true))
  }

  test("holtWinters: rotating seasonal register matches a direct replay") {
    import spark.implicits._
    val vals = Seq(10.0, 20.0, 30.0, 12.0, 22.0, 32.0, 14.0, 24.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-${i + 1}%02d 12:00:00"), v)
    }.toDF("t", "v")
    val out = Temporal.holtWinters(df, "t", "v", period = 3)
      .orderBy("day").collect()
      .map(r => (r.getAs[Long]("level_micro"), r.getAs[Long]("trend_micro"),
        r.getAs[Long]("seasonal_micro"), r.getAs[Long]("forecast_next_micro")))
    // independent replay of the recurrence (micro grid, truncating /)
    val s = Array.fill(3)(0L)
    var head = 0
    var l = (vals.head * 1e6).toLong
    var b = 0L
    val exp = Seq.newBuilder[(Long, Long, Long, Long)]
    exp += ((l, b, 0L, l + b + s(head)))
    vals.drop(1).foreach { v =>
      val y = (v * 1e6).toLong
      val slot = s(head)
      val lp = l
      l = ((y - slot) + lp + b) / 2
      b = (l - lp + 3 * b) / 4
      val snew = (y - l + slot) / 2
      s(head) = snew
      head = (head + 1) % 3
      exp += ((l, b, snew, l + b + s(head)))
    }
    assert(out.toSeq == exp.result())
    // the register carries period-3 structure: slot written at t is the
    // one consumed at t+3 (forecast at t includes the NEXT slot)
    assert(out.length == 8)
  }

  test("forecastBacktest: predicted is yesterday's forecast_next, errors " +
      "are exact micro integers, holdout window honored") {
    import spark.implicits._
    val vals = Seq(10.0, 20.0, 30.0, 12.0, 22.0, 32.0, 14.0, 24.0, 34.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-${i + 1}%02d 12:00:00"), v)
    }.toDF("t", "v")
    val hw = Temporal.holtWinters(df, "t", "v", period = 3)
      .orderBy("day").collect()
      .map(r => (r.getAs[java.sql.Date]("day"),
        r.getAs[Long]("actual_micro"), r.getAs[Long]("forecast_next_micro")))
    graft.CacheScope.releaseAll()
    val out = Temporal.forecastBacktest(df, "t", "v", period = 3,
      holdoutDays = 4).orderBy("day").collect()
    graft.CacheScope.releaseAll()
    // last 4 days only (all have a prior-day forecast here)
    assert(out.length == 4)
    val byDay = hw.map(t3 => t3._1.toString -> t3).toMap
    out.foreach { r =>
      val day = r.getAs[java.sql.Date]("day")
      val prevDay = java.sql.Date.valueOf(day.toLocalDate.minusDays(1))
      val (_, actual, _) = byDay(day.toString)
      val (_, _, prevForecast) = byDay(prevDay.toString)
      assert(r.getAs[Long]("actual_micro") == actual)
      assert(r.getAs[Long]("predicted_micro") == prevForecast)
      assert(r.getAs[Long]("abs_err_micro") == math.abs(actual - prevForecast))
      val denom = math.abs(actual) + math.abs(prevForecast)
      val expSmape = if (denom > 0)
        (BigInt(2000000) * math.abs(actual - prevForecast) / denom).toLong
      else 0L
      assert(r.getAs[Long]("smape_micro") == expSmape)
    }
  }

  test("conformalInterval: qhat replays the calibration order statistic " +
      "and coverage counts the eval half exactly") {
    import spark.implicits._
    val vals = Seq(10.0, 20.0, 30.0, 12.0, 22.0, 32.0, 14.0, 24.0, 34.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-${i + 1}%02d 12:00:00"), v)
    }.toDF("t", "v")
    val bt = Temporal.forecastBacktest(df, "t", "v", period = 3,
        holdoutDays = 6).orderBy("day").collect()
      .map(_.getAs[Long]("abs_err_micro"))
    graft.CacheScope.releaseAll()
    assert(bt.length == 6)
    val out = Temporal.conformalInterval(df, "t", "v", period = 3,
      holdoutDays = 6, alphaPct = 10).collect().head
    graft.CacheScope.releaseAll()
    // n=6 -> nCal=3, k = min(3, ceil(4*0.9)) = 3 -> qhat = max of cal
    val cal = bt.take(3).sorted
    val qhat = cal(2)
    val eval = bt.drop(3)
    val covered = eval.count(_ <= qhat).toLong
    assert(out.getAs[Long]("n_cal") == 3L)
    assert(out.getAs[Long]("n_eval") == 3L)
    assert(out.getAs[Long]("qhat_micro") == qhat)
    assert(out.getAs[Long]("n_covered") == covered)
    assert(out.getAs[Long]("coverage_micro") == covered * 1000000L / 3L)
  }

  test("seasonalAnomalies: clean periodic signal never pages (z null); " +
      "a planted spike carries the max |z| and the flag matches |z|>3") {
    import spark.implicits._
    def mk(vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-${i + 1}%02d 12:00:00"), v)
    }.toDF("t", "v")
    val clean = Temporal.seasonalAnomalies(
      mk(Seq.fill(6)(Seq(10.0, 20.0, 30.0)).flatten), "t", "v", period = 3)
      .collect()
    graft.CacheScope.releaseAll()
    // pure signal: residuals identically 0 -> sd 0 -> z null, no flags
    assert(clean.nonEmpty)
    assert(clean.forall(r => r.isNullAt(r.fieldIndex("z"))))
    assert(clean.forall(!_.getAs[Boolean]("is_anomaly")))
    // spike day 10 (value 20 -> 200): max |z| lands on it; flags are
    // exactly the |z| > 3 rule
    val spiked = Seq.fill(6)(Seq(10.0, 20.0, 30.0)).flatten
      .updated(9, 200.0)
    val out = Temporal.seasonalAnomalies(mk(spiked), "t", "v", period = 3)
      .collect()
    graft.CacheScope.releaseAll()
    val withZ = out.filter(r => !r.isNullAt(r.fieldIndex("z")))
    assert(withZ.nonEmpty)
    val maxDay = withZ.maxBy(r => math.abs(r.getAs[Double]("z")))
      .getAs[java.sql.Date]("day").toString
    assert(maxDay == "2024-01-10")
    assert(out.forall { r =>
      val flagged = r.getAs[Boolean]("is_anomaly")
      val big = !r.isNullAt(r.fieldIndex("z")) &&
        math.abs(r.getAs[Double]("z")) > 3.0
      flagged == big
    })
  }

  test("markovEval: argmax predictor with lexicographic ties, held-out " +
      "accuracy per state, unseen states predict null") {
    import spark.implicits._
    // train (before Jan 16): u1 A,B,A,B ; u2 A,C
    // -> counts A->B:2, A->C:1, B->A:1 ; predictions A->B, B->A
    // test (after): u3 A,B,C -> A->B correct, B->C wrong
    //               u4 C,A   -> C->A: no training prediction, wrong
    def r(u: Long, ts0: String, seq: Seq[String]) =
      seq.zipWithIndex.map { case (t, i) =>
        (u, Timestamp.valueOf(s"$ts0 0$i:00:00"), t, i.toLong)
      }
    val df = (r(1L, "2024-01-10", Seq("A", "B", "A", "B")) ++
      r(2L, "2024-01-11", Seq("A", "C")) ++
      r(3L, "2024-01-20", Seq("A", "B", "C")) ++
      r(4L, "2024-01-21", Seq("C", "A")))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = Analytics.markovEval(df, "user_id", "event_type", "ts",
        "event_id", "2024-01-16 00:00:00")
      .collect()
      .map(x => x.getAs[String]("from_type") ->
        (Option(x.getAs[String]("predicted")), x.getAs[Long]("n_train"),
          x.getAs[Long]("n_test"), x.getAs[Long]("n_correct"),
          x.getAs[Double]("accuracy"))).toMap
    graft.CacheScope.releaseAll()
    assert(out("A") == ((Some("B"), 3L, 1L, 1L, 1.0)))
    assert(out("B") == ((Some("A"), 1L, 1L, 0L, 0.0)))
    assert(out("C") == ((None, 0L, 1L, 0L, 0.0)))
  }

  test("classicalDecompose: pure period-3 signal decomposes to exact " +
      "trend/seasonal with zero residual; edges null") {
    import spark.implicits._
    // 2024-01-01 anchor -> slots 0,1,2 repeating from day 1
    val vals = Seq(10.0, 20.0, 30.0, 10.0, 20.0, 30.0, 10.0, 20.0, 30.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-${i + 1}%02d 09:00:00"), v)
    }.toDF("t", "v")
    val out = Temporal.classicalDecompose(df, "t", "v", period = 3)
      .orderBy("day").collect()
    graft.CacheScope.releaseAll()
    assert(out.length == 9)
    // edges: half-window (1 day) each side has no trend/residual
    assert(out.head.isNullAt(out.head.fieldIndex("trend_micro")))
    assert(out.last.isNullAt(out.last.fieldIndex("residual_micro")))
    // interior: trend is the window mean 20, seasonal exactly the
    // planted offsets (slot of 2024-01-0d is (d-1) % 3), residual 0
    val bySlot = Map(0 -> -10000000L, 1 -> 0L, 2 -> 10000000L)
    out.zipWithIndex.drop(1).dropRight(1).foreach { case (r, i) =>
      assert(r.getAs[Long]("trend_micro") == 20000000L)
      assert(r.getAs[Long]("seasonal_micro") == bySlot(i % 3))
      assert(r.getAs[Long]("residual_micro") == 0L)
    }
    // seasonal indices center to zero across the period
    assert(out.slice(1, 4).map(_.getAs[Long]("seasonal_micro")).sum == 0L)
  }

  test("mannKendall: monotone series maxes S with z > 0, constant series " +
      "degenerates, hand-computed tie-corrected mixed case") {
    import spark.implicits._
    // strictly increasing, 6 days: S = 15, no ties, var18 = 6*5*17 = 510
    val up = (1 to 6).map(i => (ts(f"2024-02-$i%02d 08:00:00"), i.toDouble))
      .toDF("t", "v")
    val ru = Temporal.mannKendall(up, "t", "v").collect().head
    graft.CacheScope.releaseAll()
    assert(ru.getAs[Long]("n_days") == 6L)
    assert(ru.getAs[Long]("s_stat") == 15L)
    assert(ru.getAs[Long]("var18_num") == 510L)
    assert(ru.getAs[Double]("z") == 14.0 / math.sqrt(510.0 / 18.0))
    // constant: everything tied -> var18_num = 0 -> z null
    val const = (1 to 5).map(i => (ts(f"2024-02-$i%02d 08:00:00"), 7.0))
      .toDF("t", "v")
    val rc = Temporal.mannKendall(const, "t", "v").collect().head
    graft.CacheScope.releaseAll()
    assert(rc.getAs[Long]("s_stat") == 0L)
    assert(rc.getAs[Long]("var18_num") == 0L)
    assert(rc.isNullAt(rc.fieldIndex("z")))
    // mixed with one tie pair: values 1, 3, 3, 2
    // pairs: (1,3)+ (1,3)+ (1,2)+ (3,3)0 (3,2)- (3,2)- => S = 1
    // ties: one group of 2 -> tie_sum = 2*1*9 = 18
    // var18 = 4*3*13 - 18 = 138
    val mixed = Seq(1.0, 3.0, 3.0, 2.0).zipWithIndex.map { case (v, i) =>
      (ts(f"2024-02-${i + 1}%02d 08:00:00"), v)
    }.toDF("t", "v")
    val rm = Temporal.mannKendall(mixed, "t", "v").collect().head
    graft.CacheScope.releaseAll()
    assert(rm.getAs[Long]("s_stat") == 1L)
    assert(rm.getAs[Long]("var18_num") == 138L)
    assert(rm.getAs[Double]("z") == 0.0)
  }

  test("nelsonAalen: exact integer hazard increments and running sum") {
    import spark.implicits._
    val subjects = Seq((1L, true), (1L, false), (2L, true), (2L, true),
      (3L, false)).toDF("dur", "ev")
    val out = Temporal.nelsonAalen(subjects, "dur", "ev")
      .orderBy("t").collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d_event"), r.getAs[Long]("d_censored"),
        r.getAs[Long]("hazard_micro"), r.getAs[Long]("cum_hazard_micro")))
    // t=1: 1/5 -> 200000; t=2: 2/3 -> 666666 (truncating); t=3: 0
    assert(out.toSeq == Seq((1L, 5L, 1L, 1L, 200000L, 200000L),
      (2L, 3L, 2L, 0L, 666666L, 866666L),
      (3L, 1L, 0L, 1L, 0L, 866666L)))
  }

  test("logRankTest: exchangeable groups give O-E = 0; hand-computed z " +
      "on a separated fixture") {
    import spark.implicits._
    // identical survival experience in both groups
    val same = Seq(("a", 1L, true), ("a", 2L, false),
      ("b", 1L, true), ("b", 2L, false)).toDF("g", "dur", "ev")
    val r0 = Temporal.logRankTest(same, "g", "dur", "ev", "a", "b")
      .collect().head
    assert(r0.getAs[Long]("o_minus_e_micro") == 0L)
    assert(r0.getAs[Double]("z") == 0.0)
    // group a events at t=1 and t=2, group b censored at the same times:
    // E = 0.5 + 0.5, V = 0.25 + 0.25 -> z = 1/sqrt(0.5)
    val sep = Seq(("a", 1L, true), ("a", 2L, true),
      ("b", 1L, false), ("b", 2L, false)).toDF("g", "dur", "ev")
    val r1 = Temporal.logRankTest(sep, "g", "dur", "ev", "a", "b")
      .collect().head
    assert(r1.getAs[Long]("n_a") == 2L && r1.getAs[Long]("n_b") == 2L)
    assert(r1.getAs[Long]("events_a") == 2L && r1.getAs[Long]("events_b") == 0L)
    assert(r1.getAs[Long]("o_minus_e_micro") == 1000000L)
    assert(r1.getAs[Long]("var_micro") == 500000L)
    assert(r1.getAs[Double]("z") == 1.0 / math.sqrt(0.5))
  }

  test("grangerLag: consecutive-day pairs only, exact moments, and the " +
      "pinned closed-form solve vs an independent recomputation") {
    import spark.implicits._
    // 6 consecutive days + a 3-day gap + 2 more: 6 usable (t−1, t) pairs
    val days = Seq(1, 2, 3, 4, 5, 6, 10, 11)
    val vals = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 18.0, 20.0, 17.0)
    val mult = Seq(1, 2, 1, 3, 2, 1, 2, 2) // daily row counts = x
    val rows = days.zip(vals).zip(mult).flatMap { case ((d, v), m) =>
      // m rows on day d, each worth v/m so the day sum is exactly v
      Seq.fill(m)((Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), v / m))
    }
    val df = rows.toDF("ts", "value")
    val r = Temporal.grangerLag(df, "ts", "value").collect().head
    assert(r.getAs[Long]("n_days") == 6L) // day-10 pair excluded (gap)
    // independent recomputation in plain Scala, same pinned order
    val pairIdx = Seq(1, 2, 3, 4, 5, 7) // t with consecutive t−1
    val y = pairIdx.map(i => math.round(vals(i) / mult(i) * 1e6) * mult(i))
      .map(_.toDouble)
    val u = pairIdx.map(i =>
      math.round(vals(i - 1) / mult(i - 1) * 1e6) * mult(i - 1))
      .map(_.toDouble)
    val v = pairIdx.map(i => mult(i - 1).toDouble)
    val n = y.size.toDouble
    def s(a: Seq[Double]) = a.sum
    def sp(a: Seq[Double], b: Seq[Double]) = a.zip(b).map(t => t._1 * t._2).sum
    val (cyy, cuu, cvv) = (sp(y, y) - s(y) * s(y) / n,
      sp(u, u) - s(u) * s(u) / n, sp(v, v) - s(v) * s(v) / n)
    val (cyu, cyv, cuv) = (sp(y, u) - s(y) * s(u) / n,
      sp(y, v) - s(y) * s(v) / n, sp(u, v) - s(u) * s(v) / n)
    val det = cuu * cvv - cuv * cuv
    val b1 = (cvv * cyu - cuv * cyv) / det
    val b2 = (cuu * cyv - cuv * cyu) / det
    val rssU = cyy - b1 * cyu - b2 * cyv
    val rssR = cyy - cyu * cyu / cuu
    assert(r.getAs[Double]("b_y_lag") == b1)
    assert(r.getAs[Double]("b_x_lag") == b2)
    assert(r.getAs[Double]("f_granger") == (rssR - rssU) * (n - 3) / rssU)
  }

  test("forecastMase: sums replay the backtest grid; periodic series " +
      "has zero naive error and a null MASE") {
    import spark.implicits._
    // 42 consecutive days of a noisy-ish deterministic series
    val rows = (0 until 42).map { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      (Timestamp.valueOf(d.atTime(12, 0)), (10 + (i * 7) % 13).toDouble)
    }
    val df = rows.toDF("ts", "value")
    val r = Temporal.forecastMase(df, "ts", "value", 7, 28).collect().head
    // independent replay off the holtWinters grid
    val hw = Temporal.holtWinters(df, "ts", "value", 7).collect()
      .map(x => (x.getDate(0), x.getLong(1), x.getLong(5)))
      .sortBy(_._1.getTime)
    val maxT = hw.last._1.getTime
    val cut = maxT - 28L * 86400000L
    val scored = hw.indices.filter(i => i >= 7 && hw(i)._1.getTime > cut)
      .map { i =>
        val (d, y, _) = hw(i)
        (math.abs(y - hw(i - 1)._3), math.abs(y - hw(i - 7)._2))
      }
    assert(r.getAs[Long]("n_days") == scored.size.toLong)
    assert(r.getAs[Long]("sum_err_model_micro") == scored.map(_._1).sum)
    assert(r.getAs[Long]("sum_err_naive_micro") == scored.map(_._2).sum)
    assert(r.getAs[Long]("mase_micro") ==
      scored.map(_._1).sum * 1000000L / scored.map(_._2).sum)
    // exactly weekly-periodic series: seasonal-naive is perfect → null
    val periodic = (0 until 42).map { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      (Timestamp.valueOf(d.atTime(12, 0)), (1 + i % 7).toDouble)
    }.toDF("ts", "value")
    val p = Temporal.forecastMase(periodic, "ts", "value", 7, 28)
      .collect().head
    assert(p.getAs[Long]("sum_err_naive_micro") == 0L)
    assert(p.isNullAt(3))
  }

  test("durbinWatson: hand OLS residuals, exact sums, pinned DW; " +
      "perfect fit degenerates to null") {
    import spark.implicits._
    // days 0..3, y = [0, 2, 1, 3] units: b = 0.8, a = 0.3 →
    // e_micro = [−3e5, 9e5, −9e5, 3e5]
    val df = (1 to 4).map(d =>
        (Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"),
          Seq(0.0, 2.0, 1.0, 3.0)(d - 1)))
      .toDF("ts", "value")
    val r = Temporal.durbinWatson(df, "ts", "value").collect().head
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Long]("sum_abs_resid_micro") == 2400000L)
    // num = 1.2e6² + 1.8e6² + 1.2e6², den = 2·(3e5² + 9e5²)
    val num = (1200000L * 1200000L + 1800000L * 1800000L +
      1200000L * 1200000L).toDouble
    val den = (2L * (300000L * 300000L + 900000L * 900000L)).toDouble
    assert(r.getAs[Double]("dw") == num / den)
    // an exactly-linear series has zero residual mass → dw null
    val perfect = (1 to 5).map(d =>
        (Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), d * 2.0))
      .toDF("ts", "value")
    val p = Temporal.durbinWatson(perfect, "ts", "value").collect().head
    assert(p.getAs[Long]("sum_abs_resid_micro") == 0L && p.isNullAt(2))
  }

  test("grangerLag: degenerate designs return nulls, not garbage") {
    import spark.implicits._
    // constant x every day → cvv = cuv = 0 → singular normal equations
    val df = (1 to 5).map(d =>
        (Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), d * 2.0))
      .toDF("ts", "value")
    val r = Temporal.grangerLag(df, "ts", "value").collect().head
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    // too few pairs for the 3-parameter fit (n = 2 ≤ 3) → nulls
    val tiny = (1 to 3).map(d =>
        (Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), d * 3.0 + d % 2))
      .toDF("ts", "value")
    val t = Temporal.grangerLag(tiny, "ts", "value").collect().head
    assert(t.getAs[Long]("n_days") == 2L && t.isNullAt(3))
  }

  test("ljungBox: alternating series replays the hand ACF terms; " +
      "constant series nulls out") {
    import spark.implicits._
    // 8 hours alternating 1,2,1,2,... events per hour: cx = 8x−12 =
    // ∓4; r₁ = −112/128 = −0.875 (7 pairs), r₂ = 96/128 = 0.75 (6)
    val rows = (0 until 8).flatMap { h =>
      val n = if (h % 2 == 0) 1 else 2
      (0 until n).map(_ => Timestamp.valueOf(f"2024-01-01 $h%02d:30:00"))
    }
    val df = rows.toDF("ts")
    val r = Temporal.ljungBox(df, "ts", 2).collect().head
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("m") == 2L)
    // terms: r₁²/7 = 0.109375, r₂²/6 = 0.09375 → pico-rounded sum
    val t1 = math.round(-0.875 * -0.875 / 7.0 * 1e12)
    val t2 = math.round(0.75 * 0.75 / 6.0 * 1e12)
    assert(r.getAs[Long]("q_term_sum_pico") == t1 + t2)
    val q = 8.0 * 10.0 * (t1 + t2).toDouble / 1e12
    assert(r.getAs[Double]("lb_q") == q)
    // Wilson-Hilferty + A&S tail replayed with the same literals
    val z = (math.cbrt(q / 2.0) - (1.0 - 2.0 / 18.0)) / math.sqrt(2.0 / 18.0)
    val kk = 1.0 / (1.0 + 0.2316419 * math.abs(z))
    val poly = ((((1.330274429 * kk + -1.821255978) * kk + 1.781477937) * kk
      + -0.356563782) * kk + 0.319381530) * kk
    val tail = 0.3989422804014327 * math.exp(-0.5 * z * z) * poly
    val p = if (z >= 0) tail else 1.0 - tail
    assert(r.getAs[Long]("p_micro") == math.round(p * 1e6))
    // constant series: zero denominator → every acf null → q/p null
    val const = (0 until 6)
      .map(h => Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")).toDF("ts")
    val c = Temporal.ljungBox(const, "ts", 2).collect().head
    assert(c.isNullAt(2) && c.isNullAt(3) && c.isNullAt(4))
  }

  test("changepointSse: a clean level shift splits exactly at the break " +
      "with zero split SSE") {
    import spark.implicits._
    // days 1..6, revenue 0,0,0,10,10,10 — the optimum is t = 3
    val df = (1 to 6).map(d =>
        (Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"),
          if (d <= 3) 0.0 else 10.0))
      .toDF("ts", "value")
    val r = Temporal.changepointSse(df, "ts", "value").collect().head
    assert(r.getAs[Long]("n_days") == 6L)
    assert(r.getAs[java.sql.Date]("best_day").toString == "2024-01-03")
    assert(r.getAs[Long]("n_left") == 3L && r.getAs[Long]("n_right") == 3L)
    assert(r.getAs[Long]("mean_left_micro") == 0L)
    assert(r.getAs[Long]("mean_right_micro") == 10000000L)
    // SSE_total = Q − S²/n = 3e14 − 9e14/6 = 1.5e14 micro² = 150 units²
    assert(r.getAs[Double]("sse_total") == 150.0)
    assert(r.getAs[Double]("sse_split") == 0.0)
    assert(r.getAs[Double]("var_reduction") == 1.0)
    // constant series: every split has SSE 0 — tie-break lands on the
    // FIRST day and the reduction ratio stays null (0/0 guard)
    val const = (1 to 4).map(d =>
        (Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), 5.0))
      .toDF("ts", "value")
    val c = Temporal.changepointSse(const, "ts", "value").collect().head
    assert(c.getAs[java.sql.Date]("best_day").toString == "2024-01-01")
    assert(c.getAs[Double]("sse_total") == 0.0 && c.isNullAt(8))
  }

  test("seasonalStrength: a pure periodic signal scores exactly 1; a " +
      "constant series nulls both strengths") {
    import spark.implicits._
    // the classicalDecompose pure period-3 fixture: residual ≡ 0 on
    // the interior → Var(R) = 0 → both strengths exactly 1
    val vals = Seq(10.0, 20.0, 30.0, 10.0, 20.0, 30.0, 10.0, 20.0, 30.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-${i + 1}%02d 09:00:00"), v)
    }.toDF("t", "v")
    val r = Temporal.seasonalStrength(df, "t", "v", period = 3)
      .collect().head
    assert(r.getAs[Long]("n") == 7L) // 9 days minus the two MA edges
    assert(r.getAs[Double]("var_resid") == 0.0)
    assert(r.getAs[Double]("seasonal_strength") == 1.0)
    // the fixture's trend is CONSTANT (20 everywhere) → Var(T+R) = 0 →
    // trend strength undefined, not 1
    assert(r.isNullAt(5))
    // constant series: every component variance is 0 → strengths null
    val const = (1 to 9).map(d =>
        (ts(f"2024-01-$d%02d 09:00:00"), 5.0)).toDF("t", "v")
    val c = Temporal.seasonalStrength(const, "t", "v", period = 3)
      .collect().head
    assert(c.isNullAt(4) && c.isNullAt(5))
  }

  test("neweyWestSe: iid-ish alternating series has inflation < 1 " +
      "(negative lag-1 autocovariance); trending series inflates > 1") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // alternating high/low: strong NEGATIVE autocorrelation -> lrv < g0
    val alt = (1 to 20).map(d =>
      (ts(f"2024-01-$d%02d 09:00:00"), if (d % 2 == 0) 10.0 else 2.0))
      .toDF("t", "v")
    val a = Temporal.neweyWestSe(alt, "t", "v", 3).collect().head
    assert(a.getAs[Long]("n_days") == 20L)
    assert(a.getAs[Double]("mean") == 6.0)
    assert(a.getAs[Double]("inflation") < 1.0)
    assert(a.getAs[Double]("se_nw") < a.getAs[Double]("se_naive"))
    // slow 2-day steps: positive autocorrelation -> se_nw > se_naive
    val trend = (1 to 20).map(d =>
      (ts(f"2024-01-$d%02d 09:00:00"), ((d + 1) / 2).toDouble))
      .toDF("t", "v")
    val b = Temporal.neweyWestSe(trend, "t", "v", 3).collect().head
    assert(b.getAs[Double]("inflation") > 1.0)
  }

  test("runsTest: strict alternation maximizes runs (positive z); a " +
      "monotone ramp is one run (negative z); hand counts replay") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val alt = (1 to 21).map(d =>
      (ts(f"2024-01-$d%02d 09:00:00"), if (d % 2 == 0) 10.0 else 2.0))
      .toDF("t", "v")
    val a = Temporal.runsTest(alt, "t", "v").collect().head
    // 20 diffs alternate in sign: 20 runs of length 1
    assert(a.getAs[Long]("n_signs") == 20L)
    assert(a.getAs[Long]("n_pos") == 10L && a.getAs[Long]("n_neg") == 10L)
    assert(a.getAs[Long]("n_runs") == 20L)
    assert(a.getAs[Double]("z") > 3.0)
    assert(a.getAs[Long]("p_micro") < 50000L)
    val ramp = (1 to 21).map(d =>
      (ts(f"2024-01-$d%02d 09:00:00"), d.toDouble)).toDF("t", "v")
    val r = Temporal.runsTest(ramp, "t", "v").collect().head
    // all 20 diffs positive: n_neg = 0 -> degenerate, stats null
    assert(r.getAs[Long]("n_runs") == 1L)
    assert(r.isNullAt(5)) // z
    // mixed: down-up-down ramp gives a hand-countable 3 runs
    val mixed = Seq(5.0, 4.0, 3.0, 6.0, 9.0, 2.0, 1.0).zipWithIndex.map {
      case (v, i) => (ts(f"2024-02-${i + 1}%02d 09:00:00"), v)
    }.toDF("t", "v")
    val m = Temporal.runsTest(mixed, "t", "v").collect().head
    assert(m.getAs[Long]("n_signs") == 6L)
    assert(m.getAs[Long]("n_pos") == 2L && m.getAs[Long]("n_neg") == 4L)
    assert(m.getAs[Long]("n_runs") == 3L)
  }

  test("segmentedRegression: planted level jump and slope bend are " +
      "recovered exactly on noise-free segments") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // pre (Jan 1-10): y = 100 + 2*(x) with x in [-10, -1]
    // post (Jan 11-20): y = 150 + 5*x with x in [0, 9] (cut = Jan 11)
    val rows = (1 to 10).map { d =>
      val x = d - 11
      (ts(f"2024-01-$d%02d 09:00:00"), 100.0 + 2.0 * x)
    } ++ (11 to 20).map { d =>
      val x = d - 11
      (ts(f"2024-01-$d%02d 09:00:00"), 150.0 + 5.0 * x)
    }
    val out = Temporal.segmentedRegression(rows.toDF("t", "v"), "t", "v",
      "2024-01-11").collect().head
    assert(out.getAs[Long]("n_pre") == 10L)
    assert(out.getAs[Long]("n_post") == 10L)
    assert(math.abs(out.getAs[Double]("slope_pre") - 2.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("slope_post") - 5.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("level_pre_at_cut") - 100.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("level_post_at_cut") - 150.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("level_change") - 50.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("slope_change") - 3.0) < 1e-9)
  }

  test("rmst: hand-computed area under a two-step KM curve; tau clips") {
    import spark.implicits._
    // 4 subjects: events at day 2 (2 of 4 die) and day 5 (1 of 2 dies),
    // 1 censored at day 5. S = 1 on [0,2), 0.5 on [2,5), 0.25 after.
    val subj = Seq((2L, true), (2L, true), (5L, true), (5L, false))
      .toDF("dur", "ev")
    val out = Temporal.rmst(subj, "dur", "ev", tau = 10L).collect().head
    // exact: 2*1 + 3*0.5 + 5*0.25 = 4.75, via micro-rounded exp(ln) grid
    assert(out.getAs[Long]("tau") == 10L)
    assert(math.abs(out.getAs[Double]("rmst_days") - 4.75) < 1e-4)
    // tau inside the first interval: area = tau * 1.0 exactly
    val clipped = Temporal.rmst(subj, "dur", "ev", tau = 2L).collect().head
    assert(clipped.getAs[Long]("rmst_micro_days") == 2000000L)
  }

  test("hurstRs: a persistent ramp reads H near 1; rapid alternation " +
      "reads H well below a random walk") {
    import spark.implicits._
    def ts(i: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2020-01-01 09:00:00").getTime
        + i.toLong * 86400000L)
    // 256 days of pure trend: R/S grows ~linearly with window -> H ~ 1
    val ramp = (0 until 256).map(i => (ts(i), i.toDouble)).toDF("t", "v")
    val hr = Temporal.hurstRs(ramp, "t", "v").collect().head
    assert(hr.getAs[Long]("n_days") == 256L)
    assert(hr.getAs[Long]("n_windows") == 4L)
    assert(hr.getAs[Double]("hurst") > 0.9)
    // strict alternation: mean-reverting, H far below 0.5
    val alt = (0 until 256).map(i =>
      (ts(i), if (i % 2 == 0) 10.0 else 0.0)).toDF("t", "v")
    val ha = Temporal.hurstRs(alt, "t", "v").collect().head
    assert(ha.getAs[Double]("hurst") < 0.3)
  }

  test("periodogram: a pure period-16 cosine peaks at 16 with amplitude " +
      "A/2, and dwarfs the off-period candidates") {
    import spark.implicits._
    val days = (0 until 64).map { t =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(t.toLong)
      (s"$d 00:00:00", 100.0 * math.cos(2.0 * math.Pi * t / 16.0))
    }.toDF("t", "v").withColumn("t", to_timestamp(col("t")))
    val out = Temporal.periodogram(days, "t", "v", Seq(7, 16, 32))
      .collect().map(r => r.getAs[Long]("period") -> r).toMap
    assert(out(16L).getAs[Long]("n_days") == 64L)
    // phase-aligned full cycles: c_amp = A/2, s_amp ~ 0
    assert(math.abs(out(16L).getAs[Double]("c_amp") - 50.0) < 0.5)
    assert(math.abs(out(16L).getAs[Double]("s_amp")) < 0.5)
    val p16 = out(16L).getAs[Double]("power")
    assert(p16 > 2000.0)
    assert(p16 > 100.0 * out(7L).getAs[Double]("power"))
    assert(p16 > 100.0 * out(32L).getAs[Double]("power"))
  }
}
