package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/window operators the reference (and vanilla SQL) lack:
  * as-of joins and gap-based sessionization.
  */
object Temporal {

  /** As-of join: for every left row, attach the latest right row with
    * `rightTs <= leftTs` for the same key (time-series point-in-time
    * lookup; DuckDB's native `ASOF JOIN` is the oracle semantics).
    *
    * Implementation is the classic union + running-last-value window —
    * one shuffle on (key), no range explosion, no per-row binary search:
    *   tag sides → union → window ordered by (ts, side, tie) →
    *   `last(carry, ignoreNulls)` carries the most recent right ROW
    *   forward onto each left row. Rights sort before lefts at equal ts,
    *   so an exactly-simultaneous right row IS matched (ASOF `>=`).
    *
    * The carried payload is a single STRUCT of all right-side values (the
    * struct itself is null only on left rows), so a matched right row whose
    * value columns are genuinely NULL is still the row that wins — carrying
    * each value column separately with ignoreNulls would skip past it to an
    * older non-null value, diverging from ASOF semantics. A deterministic
    * tiebreak (hash of the right row's carried fields) orders multiple
    * right rows at the same (key, ts), so reruns pick the same winner
    * regardless of partitioning.
    *
    * `valueCols` are the right-side columns to carry; they must not
    * collide with left column names.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val carryType = StructType(valueCols.map(c =>
      right.schema(c).copy(nullable = true)).toArray)
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__carry", lit(null).cast(carryType))
    val r = right.withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))
      .withColumn("__tie", xxhash64((col(rightTs) +: valueCols.map(col)): _*))
      .withColumn("__carry", struct(valueCols.map(col): _*))
    val rPadded = leftCols.filterNot(c => c == key).foldLeft(r) {
      (df, c) => if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }
    val meta = Seq("__ts", "__side", "__tie", "__carry")
    val unioned = l.select((leftCols ++ meta).map(col).toIndexedSeq: _*)
      .unionByName(rPadded.select((leftCols ++ meta).map(col).toIndexedSeq: _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
    valueCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("__carry").getField(c))
    }.filter(col("__side") === 1).drop("__ts", "__side", "__tie", "__carry")
  }

  /** Gap-based sessionization: events for a key belong to one session
    * while consecutive gaps stay within `gap`; a session ends `gap` after
    * its last event. Uses Spark's built-in `session_window` (merging
    * session aggregation — works in batch and streaming). One shuffle on
    * the key.
    */
  def sessionize(df: DataFrame, key: String, tsCol: String, gap: String,
      measure: Column): DataFrame =
    df.groupBy(col(key), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(measure.cast("decimal(24,2)")).cast("double").as("sum_value"))
      .select(col(key), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Hourly gap-filling (time-series densification): for every key, the
    * filled hourly series from its first to its last observed hour,
    * carrying the last observation forward across silent hours — the op
    * a dashboard needs to chart a sensor that reports irregularly.
    *
    *   - per (key, hour), the LAST observation wins (keep-last by
    *     (ts, tieCol) — deterministic, the reference's D2 rule);
    *   - each observed hour then OWNS the gap up to (but excluding) the
    *     key's next observed hour: one `lead()` window per key plus an
    *     `explode(sequence(...))` generates the filled series directly,
    *     with the segment owner's observation as the carried value
    *     (LOCF) — only each key's own active range is ever expanded,
    *     never a global calendar cross-join;
    *   - `was_observed` distinguishes carried rows; a genuinely-NULL
    *     observed value is carried as the struct, same contract as
    *     [[asofJoin]].
    *
    * The raw input is scanned and shuffled once for the keep-last, then
    * one more window exchange on the key for lead() — no spine build, no
    * self-join, and the per-hour relation is referenced exactly once in
    * the plan (the build-spine / left-join / last(ignoreNulls) shape this
    * replaced referenced it twice and paid a groupBy + join + window).
    */
  def gapFillHourly(df: DataFrame, key: String, tsCol: String,
      valCol: String, tieCol: String): DataFrame = {
    // date_trunc yields an instant-flavored TIMESTAMP even over NTZ input;
    // cast back so the output keeps the repo's single timestamp flavor
    // (session is UTC, so the cast is a pure re-label)
    val hour = date_trunc("hour", col(tsCol)).cast("timestamp_ntz")
    val perHour = df
      .withColumn("__hour", hour)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key), col("__hour"))
          .orderBy(col(tsCol).desc, col(tieCol).desc)))
      .filter(col("__rn") === 1)
      .select(col(key), col("__hour"),
        struct(col(valCol).as("v")).as("__obs"))
    // Segment form instead of spine-join: each observed hour OWNS the gap
    // up to (but excluding) the user's next observed hour, so one lead()
    // window + one explode(sequence(...)) generates the filled series
    // directly — LOCF value = the segment owner's observation. Equivalent
    // to the build-spine / left-join / last(ignoreNulls) formulation but
    // with ONE window exchange instead of a groupBy + join + window (and
    // perHour referenced once, not twice). The last observed hour owns
    // just itself, so the series still ends at the user's max hour.
    val w = Window.partitionBy(col(key)).orderBy(col("__hour"))
    perHour
      .withColumn("__next", lead(col("__hour"), 1).over(w))
      .select(col(key), col("__obs"), col("__hour"),
        explode(sequence(col("__hour"),
          coalesce(col("__next") - expr("INTERVAL 1 HOUR"), col("__hour")),
          expr("INTERVAL 1 HOUR"))).as("__h"))
      .select(col(key), col("__h").as("hour"),
        col("__obs.v").as("value"),
        (col("__h") === col("__hour")).as("was_observed"))
  }

  /** Exponentially-weighted trailing average (EWMA, α = 1/2, horizon
    * `depth` ≤ 32): per key, ordered by (ts, tie), each row's smoothed
    * value over its last `depth` observations with weights 0.5^j
    * (j = 0 for the current row).
    *
    * Exactness scheme: the true EWMA recursion multiplies doubles whose
    * products depend on summation order; instead both engines compute
    *   num = Σ_j round(value·1e6) · 2^(depth-1-j)   (BIGINT, exact)
    *   den = Σ_j 2^(depth-1-j)                      (over PRESENT rows)
    * and emit `ewma = num / (den·1e6)` as ONE double division of two exact
    * integers — bit-identical across engines and partitionings. α = 1/2
    * makes every weight a power of two, so the fixed-point sum is exact;
    * |value| ≤ 8e9 keeps |num| < 2^53+ safely inside BIGINT for
    * depth ≤ 32.
    *
    * Scale shape: ONE window exchange on the key; the `depth` lag() calls
    * all share that window (one sort, one frame pass — not `depth`
    * shuffles), and the whole expression tree stays in whole-stage
    * codegen. A recursion-faithful implementation would need a
    * sequential per-key scan (mapGroups — no codegen, full group
    * materialization); the finite-horizon form loses < 0.5^depth of mass,
    * far below the 1e-6 quantization floor for depth ≥ 21.
    */
  def ewmaTrailing(df: DataFrame, key: String, tsCol: String, tieCol: String,
      valCol: String, depth: Int = 24): DataFrame = {
    require(depth >= 1 && depth <= 32, s"depth must be in [1, 32]: $depth")
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(tieCol))
    val vm = round(col(valCol) * 1e6).cast("long")
    val terms = (0 until depth).map { j =>
      val weight = 1L << (depth - 1 - j)
      val l = lag(vm, j).over(w)
      (when(l.isNotNull, l * weight).otherwise(lit(0L)),
        when(l.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    // den·1e6 un-scales the micro quantization in the same single
    // division (2^32·1e6 < 2^53 — still an exact long)
    df.select(col(key), col(tsCol), col(tieCol), col(valCol))
      .withColumn("ewma", num.cast("double") / (den * 1000000L).cast("double"))
  }

  /** Autocorrelation function of the hourly event-count series at lags
    * 1..`maxLag` — the seasonality audit (a daily cycle shows as a peak
    * at lag 24) that tells a pipeline whether "last hour" is a usable
    * forecast baseline.
    *
    * Exactness scheme: with hourly counts x_t (dense grid — absent hours
    * count 0, generated from one min/max aggregate via
    * explode(sequence)), n hours and S = Σx, both engines compute the
    * mean-centered products on the INTEGER grid scaled by n:
    *   num(k) = Σ_t (n·x_t − S)(n·x_{t+k} − S)   over the n−k pairs
    *   den    = Σ_t (n·x_t − S)²                 over all n
    * as DECIMAL(38,0) sums (n ≤ 10⁶ hours and x ≤ 10¹² rows/hour stay
    * far inside 38 digits), and `acf = num/den` is one final double
    * division. No floating point touches the data path.
    *
    * Scale shape: one shuffle to the hour grid (bounded by calendar
    * span, not corpus size), a self-join on hour+k over that grid
    * (equi-join, broadcast-sized both sides), one |lags|-row aggregate.
    */
  def hourlyAcf(df: DataFrame, tsCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    val hour = date_trunc("hour", col(tsCol)).cast("timestamp_ntz")
    val observed = df.filter(col(tsCol).isNotNull)
      .groupBy(hour.as("h")).agg(count(lit(1)).as("c"))
    // dense grid: absent hours are genuine zero counts, and the lag
    // alignment below must see them
    val bounds = observed.agg(min("h").as("lo"), max("h").as("hi"))
    val grid = bounds.select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("h"))
      .join(observed, Seq("h"), "left")
      .select(col("h"), coalesce(col("c"), lit(0L)).as("x"))
    val gridC = graft.CacheScope.register(grid)
    val tot = gridC.agg(count(lit(1)).as("n"), sum("x").as("s"))
    val centered = gridC.crossJoin(broadcast(tot))
      .select(col("h"), (col("n") * col("x") - col("s")).as("cx"),
        col("n"), col("s"))
    val den = centered
      .agg(sum((col("cx") * col("cx")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("den"))
    // one equi-join for ALL lags: each row (h, cx) fans out to maxLag
    // shifted copies (h − k, k, cx) that meet their lag-k partner at h
    val shifted = centered.select(
        explode(expr(s"sequence(1, $maxLag)")).as("k"),
        col("h"), col("cx").as("cx2"))
      .select(col("k").cast("long").as("lag"),
        (col("h") - expr("make_interval(0, 0, 0, 0, k)")).as("h"),
        col("cx2"))
    val pairs = centered.select(col("h"), col("cx"))
      .join(shifted, "h")
      .groupBy("lag")
      .agg(sum((col("cx") * col("cx2")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("num"),
        count(lit(1)).as("n_pairs"))
    pairs.crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        col("num").cast("long").as("num_scaled"),
        col("den").cast("long").as("den_scaled"),
        when(col("den") =!= 0,
          col("num").cast("double") / col("den").cast("double")).as("acf"))
      .orderBy("lag")
  }

  /** Strict IN-SESSION funnel: stage counts where each stage must occur
    * after the previous one WITHIN THE SAME SESSION (gap-split) — the
    * conversion question q124's global per-user funnel can't answer: a
    * view on Monday doesn't get credit for Friday's purchase.
    *
    * Mechanics: sessions split on inactivity > `gapMinutes` (cumulative
    * gap flags over the per-user order — q33's rule); within a session,
    * running windows carry the earliest stage-1 timestamp and the
    * earliest QUALIFYING stage-2 timestamp (one that saw a prior
    * stage-1), so a stage-3 event qualifies iff a qualifying stage-2
    * precedes it. All comparisons are exact timestamps with the tie
    * column making the order total; output is ONE row of session
    * counts.
    *
    * Scale shape: two window passes partitioned by (user) then (user,
    * session) — never global; one final aggregate.
    */
  def sessionFunnel(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, stage1: String, stage2: String, stage3: String,
      typeCol: String, gapMinutes: Int): DataFrame = {
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    val wUser = Window.partitionBy(userCol)
      .orderBy(col(tsCol), col(tieCol))
    val tagged = events
      .filter(col(tsCol).isNotNull &&
        col(typeCol).isin(stage1, stage2, stage3))
      .withColumn("__t", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__new", when(
        col("__t") - lag(col("__t"), 1).over(wUser) > gapMicros, 1L)
        .otherwise(lit(0L)))
      .withColumn("__sess", sum(col("__new")).over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wSess = Window.partitionBy(col(userCol), col("__sess"))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = tagged
      .withColumn("__rv",
        min(when(col(typeCol) === stage1, col("__t"))).over(wSess))
      .withColumn("__qc",
        when(col(typeCol) === stage2 && col("__rv").isNotNull, col("__t")))
      .withColumn("__rqc", min(col("__qc")).over(wSess))
    staged.groupBy(col(userCol), col("__sess"))
      .agg(
        max(when(col(typeCol) === stage1, 1L).otherwise(0L)).as("s1"),
        max(when(col("__qc").isNotNull, 1L).otherwise(0L)).as("s2"),
        max(when(col(typeCol) === stage3 && col("__rqc").isNotNull, 1L)
          .otherwise(0L)).as("s3"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("s1")).as("n_stage1"),
        sum(col("s2")).as("n_stage2"),
        sum(col("s3")).as("n_stage3"))
  }

  /** Fano factor (index of dispersion, var/mean) of each key's hourly
    * count series over the SHARED dense hour grid — the burstiness
    * audit: Poisson-like arrivals give F ≈ 1, batchy/bursty streams
    * F ≫ 1, metronomic ones F < 1. The scalar that decides whether a
    * per-hour capacity plan can assume smooth arrivals.
    *
    * Exactness: with n grid hours, per key S = Σx and Q = Σx²,
    *   fano = (n·Q − S²) / (n·S)
    * — exact BIGINT-through-DECIMAL numerator/denominator, ONE final
    * division (population variance / mean, algebraically cleared).
    * Absent (key, hour) cells are genuine zeros from the shared grid.
    *
    * Scale shape: one shuffle to the (key, hour) grid, one |keys|-row
    * aggregate; the spine is a 1-row bounds aggregate exploded.
    */
  def hourlyFano(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val ev = df.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
    val hour = date_trunc("hour", col(tsCol)).cast("timestamp_ntz")
    val counts = ev.groupBy(col(keyCol).as("k"), hour.as("h"))
      .agg(count(lit(1)).as("x"))
    val bounds = ev.agg(min(hour).as("lo"), max(hour).as("hi"))
    val nHours = bounds.select(
      (expr("timestampdiff(HOUR, lo, hi)") + 1L).cast("long").as("n"))
    // zero cells enter S as 0 and Q as 0 — only n needs the grid size,
    // so the dense grid itself never materializes
    counts.groupBy("k")
      .agg(sum("x").as("s"),
        sum((col("x") * col("x")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("q"))
      .crossJoin(broadcast(nHours))
      .select(col("k").as(keyCol), col("n").as("n_hours"),
        col("s"), col("q").cast("long").as("sum_sq"),
        ((col("n").cast("decimal(38,0)") * col("q") -
          (col("s") * col("s")).cast("decimal(38,0)")).cast("double") /
          (col("n") * col("s")).cast("double")).as("fano"))
  }

  /** Lead-lag cross-correlation between two event types' hourly count
    * series at lags −maxLag..maxLag — "do views LEAD purchases, and by
    * how many hours?": the peak lag is the conversion latency at the
    * aggregate level (q130 measures it per user; this is the
    * time-series face).
    *
    * Same exactness scheme as [[hourlyAcf]]: shared dense hour grid
    * (absent hours are zeros), n-scaled integer centering for both
    * series, DECIMAL numerators per lag, the two centered
    * sum-of-squares as scalars, and r = num/sqrt(denx·deny) as one
    * final IEEE sequence. Positive lag = y lags x by k hours.
    */
  def crossCorrHourly(df: DataFrame, tsCol: String, typeCol: String,
      typeX: String, typeY: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0: $maxLag")
    val hour = date_trunc("hour", col(tsCol)).cast("timestamp_ntz")
    val ev = df.filter(col(tsCol).isNotNull &&
      col(typeCol).isin(typeX, typeY))
    val observed = ev.groupBy(hour.as("h"))
      .agg(sum(when(col(typeCol) === typeX, 1L).otherwise(0L)).as("cx"),
        sum(when(col(typeCol) === typeY, 1L).otherwise(0L)).as("cy"))
    val bounds = observed.agg(min("h").as("lo"), max("h").as("hi"))
    val grid = bounds.select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("h"))
      .join(observed, Seq("h"), "left")
      .select(col("h"), coalesce(col("cx"), lit(0L)).as("x"),
        coalesce(col("cy"), lit(0L)).as("y"))
    val gridC = graft.CacheScope.register(grid)
    val tot = gridC.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("y").as("sy"))
    val centered = graft.CacheScope.register(
      gridC.crossJoin(broadcast(tot))
        .select(col("h"), (col("n") * col("x") - col("sx")).as("ex"),
          (col("n") * col("y") - col("sy")).as("ey")))
    val dens = centered.agg(
      sum((col("ex") * col("ex")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("denx"),
      sum((col("ey") * col("ey")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("deny"))
    // one equi-join for all lags: y-side rows fan out to each lag k,
    // shifted so the lag-k partner of hour t meets it at t
    val shifted = centered.select(
        explode(expr(s"sequence(${-maxLag}, $maxLag)")).as("k"),
        col("h"), col("ey").as("ey2"))
      .select(col("k").cast("long").as("lag"),
        (col("h") - expr("make_interval(0, 0, 0, 0, k)")).as("h"),
        col("ey2"))
    val pairs = centered.select(col("h"), col("ex"))
      .join(shifted, "h")
      .groupBy("lag")
      .agg(sum((col("ex") * col("ey2")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("num"),
        count(lit(1)).as("n_pairs"))
    pairs.crossJoin(broadcast(dens))
      .select(col("lag"), col("n_pairs"),
        col("num").cast("long").as("num_scaled"),
        when(col("denx") =!= 0 && col("deny") =!= 0,
          col("num").cast("double") /
            sqrt(col("denx").cast("double") * col("deny").cast("double")))
          .as("r"))
      .orderBy("lag")
  }

  /** Kaplan-Meier survival estimator over integer durations with right
    * censoring — time-to-event analytics (signup→conversion, doc
    * ingest→removal): per duration day, the at-risk count, events,
    * censored exits, and the LOG survival curve
    *   log S(t)·1e6 = Σ_{t'≤t, event day} lnµ(n_risk−d) − lnµ(n_risk)
    * on the exact micro-log grid (the q89 identity per factor), so the
    * curve is an integer prefix sum both engines replay bit-for-bit —
    * no floating-point product chain, no libm exp in the gate.
    *
    * When the last at-risk subject dies (n_risk = d), survival is 0:
    * the factor emits the −1e12 "−∞ micro" sentinel (both engines), and
    * every later prefix stays below any real value.
    *
    * Scale shape: one shuffle to the duration-day grid
    * (calendar-bounded), two windows + one broadcast total over THAT
    * GRID. Output: one row per distinct duration.
    */
  def kaplanMeier(subjects: DataFrame, durCol: String,
      eventCol: String): DataFrame = {
    def lnM(c: Column): Column = round(log(c.cast("double")) * 1e6).cast("long")
    val grid = subjects
      .filter(col(durCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(col(durCol).cast("long").as("t"))
      .agg(sum(when(col(eventCol), 1L).otherwise(0L)).as("d_event"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("d_censored"))
    val tot = grid.agg(sum(col("d_event") + col("d_censored")).as("n"))
    val wBefore = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wInc = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risked = grid.crossJoin(broadcast(tot))
      .select(col("t"), col("d_event"), col("d_censored"),
        (col("n") - coalesce(
          sum(col("d_event") + col("d_censored")).over(wBefore), lit(0L)))
          .as("n_risk"))
    val term = when(col("d_event") > 0,
      when(col("n_risk") - col("d_event") > 0,
        lnM(col("n_risk") - col("d_event")) - lnM(col("n_risk")))
        .otherwise(lit(-1000000000000L)))
      .otherwise(lit(0L))
    risked.select(col("t"), col("n_risk"), col("d_event"), col("d_censored"),
      sum(term).over(wInc).as("log_surv_micro"))
  }

  /** NELSON-AALEN cumulative hazard over (duration, event) subjects —
    * [[kaplanMeier]]'s sibling estimator: KM multiplies survival factors
    * (log-summed), NA sums the hazard increments d/n directly, the
    * better-behaved quantity for comparing risk ACROSS strata and the
    * standard input to proportional-hazards diagnostics. Same machinery:
    * one shuffle to the duration grid, risk sets by prefix subtraction,
    * and the per-time hazard on the exact integer grid —
    * hazard_micro = (d_event · 1e6) div n_risk, truncating division,
    * engine-replayable with no logs at all (exacter than KM's micro-ln
    * terms). Cumulative hazard is the running BIGINT sum.
    *
    * Returns (t, n_risk, d_event, d_censored, hazard_micro,
    * cum_hazard_micro) per distinct duration.
    */
  def nelsonAalen(subjects: DataFrame, durCol: String,
      eventCol: String): DataFrame = {
    val grid = subjects
      .filter(col(durCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(col(durCol).cast("long").as("t"))
      .agg(sum(when(col(eventCol), 1L).otherwise(0L)).as("d_event"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("d_censored"))
    val tot = grid.agg(sum(col("d_event") + col("d_censored")).as("n"))
    val wBefore = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wInc = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risked = grid.crossJoin(broadcast(tot))
      .select(col("t"), col("d_event"), col("d_censored"),
        (col("n") - coalesce(
          sum(col("d_event") + col("d_censored")).over(wBefore), lit(0L)))
          .as("n_risk"))
    risked
      .withColumn("hazard_micro",
        expr("(d_event * 1000000) div n_risk"))
      .select(col("t"), col("n_risk"), col("d_event"), col("d_censored"),
        col("hazard_micro"),
        sum(col("hazard_micro")).over(wInc).as("cum_hazard_micro"))
  }

  /** RESTRICTED MEAN SURVIVAL TIME — the area under [[kaplanMeier]]'s
    * curve up to horizon τ: "average days survived within the first τ",
    * the single-number summary regulators and product reviews actually
    * want from a survival curve (median survival is undefined when the
    * curve never crosses 0.5; hazard ratios assume proportionality).
    * RMST(τ) = ∫₀^τ S(t)dt = Σ step-intervals S(tᵢ)·(clip(tᵢ₊₁) −
    * clip(tᵢ)) plus the leading [0, t₁) interval at S = 1.
    *
    * Exactness: S(tᵢ) = exp(log_surv_micro/1e6) is ONE libm exp per
    * grid row, micro-rounded (both engines round the same libm exp of
    * the same micro-log — the q89/q309 budget); each interval's
    * contribution s_micro·days is exact BIGINT; the −∞ sentinel
    * (extinct curve) exps to 0 and contributes nothing. One extra lead
    * window over the duration grid.
    *
    * Output ONE row: (tau, n_intervals, rmst_micro_days, rmst_days).
    */
  def rmst(subjects: DataFrame, durCol: String, eventCol: String,
      tau: Long): DataFrame = {
    require(tau >= 1, s"tau must be >= 1: $tau")
    val km = kaplanMeier(subjects, durCol, eventCol)
    val w = Window.orderBy("t") // duration grid only (calendar-bounded)
    val sMicro = round(exp(col("log_surv_micro").cast("double") / lit(1e6))
      * 1e6).cast("long")
    val segs = km
      .withColumn("next_t", coalesce(lead("t", 1).over(w), lit(tau)))
      .select(col("t"), col("next_t"), sMicro.as("s_micro"))
      .withColumn("span",
        greatest(lit(0L),
          least(col("next_t"), lit(tau)) - least(col("t"), lit(tau))))
      .withColumn("contrib", col("s_micro") * col("span"))
    val head = km.agg(coalesce(min("t"), lit(tau)).as("t1"))
      .select((least(col("t1"), lit(tau)) * lit(1000000L)).as("head_micro"))
    segs.agg(count(lit(1)).cast("long").as("n_intervals"),
        coalesce(sum("contrib"), lit(0L)).cast("long").as("tail_micro"))
      .crossJoin(broadcast(head))
      .select(lit(tau).as("tau"), col("n_intervals"),
        (col("head_micro") + col("tail_micro")).as("rmst_micro_days"))
      .withColumn("rmst_days",
        col("rmst_micro_days").cast("double") / lit(1e6))
  }

  /** LOG-RANK TEST between two groups' survival experiences (Mantel
    * 1966) — the hypothesis test the [[kaplanMeier]]/[[nelsonAalen]]
    * curves feed: at every event time, compare group A's OBSERVED events
    * against the EXPECTED count were the groups exchangeable, and
    * normalize by the hypergeometric variance. The standard A/B answer
    * for time-to-event metrics ("does arm B convert FASTER?"), where a
    * means test on durations is wrong under censoring.
    *
    * Everything rides the exact integer grid: per event time t,
    *   e_micro  = (d_t · nA_t · 1e6) div n_t
    *   v_micro  = (d_t · nA_t · nB_t · (n_t − d_t) · 1e6)
    *              div (n_t · n_t · (n_t − 1))          [0 when n_t ≤ 1]
    * with all products in DECIMAL(38,0) (n⁴·1e6 stays inside 38 digits
    * to n ~ 10⁷ subjects); O−E and V are exact BIGINT sums and z is two
    * pinned IEEE ops. At-risk counts come from prefix windows over the
    * duration grid (calendar-bounded, the [[kaplanMeier]] shape).
    *
    * Returns one row: (n_a, n_b, events_a, events_b, o_minus_e_micro,
    * var_micro, z) — z > 0 means group A saw MORE events than expected.
    */
  def logRankTest(subjects: DataFrame, groupCol: String, durCol: String,
      eventCol: String, groupA: String, groupB: String): DataFrame = {
    val base = subjects.filter(col(durCol).isNotNull &&
        col(eventCol).isNotNull && col(groupCol).isin(groupA, groupB))
      .select((col(groupCol) === groupA).as("ga"),
        col(durCol).cast("long").as("t"), col(eventCol).as("ev"))
    val grid = base.groupBy("t").agg(
      sum(when(col("ga") && col("ev"), 1L).otherwise(0L)).as("da"),
      sum(when(!col("ga") && col("ev"), 1L).otherwise(0L)).as("db"),
      sum(when(col("ga"), 1L).otherwise(0L)).as("ta"),
      sum(when(col("ga"), 0L).otherwise(1L)).as("tb"))
    val tot = grid.agg(sum("ta").as("na"), sum("tb").as("nb"))
    val wBefore = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risked = grid.crossJoin(broadcast(tot))
      .select(col("t"), col("da"), col("db"), col("na"), col("nb"),
        (col("na") - coalesce(sum(col("ta")).over(wBefore), lit(0L)))
          .as("ra"),
        (col("nb") - coalesce(sum(col("tb")).over(wBefore), lit(0L)))
          .as("rb"))
    def d(c: Column) = c.cast("decimal(38,0)")
    val terms = risked
      .withColumn("d_t", col("da") + col("db"))
      .withColumn("n_t", col("ra") + col("rb"))
      .select(col("da"), col("db"), col("na"), col("nb"),
        expr("cast((cast(d_t as decimal(38,0)) * ra * 1000000)" +
          " div n_t as bigint)").as("e_micro"),
        when(col("n_t") > 1,
          expr("cast((cast(d_t as decimal(38,0)) * ra * rb * (n_t - d_t)" +
            " * 1000000) div (cast(n_t as decimal(38,0)) * n_t * (n_t - 1))" +
            " as bigint)")).otherwise(lit(0L)).as("v_micro"))
    terms.groupBy("na", "nb").agg(
        sum("da").as("events_a"), sum("db").as("events_b"),
        (sum(col("da")) * 1000000L - sum(col("e_micro")))
          .as("o_minus_e_micro"),
        sum("v_micro").as("var_micro"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        col("events_a"), col("events_b"), col("o_minus_e_micro"),
        col("var_micro"),
        when(col("var_micro") > 0,
          (col("o_minus_e_micro").cast("double") / lit(1e6))
            / sqrt(col("var_micro").cast("double") / lit(1e6))).as("z"))
  }

  /** CUSUM changepoint curve over a daily micro-integer measure: per
    * day, the running sum of mean-centered daily totals, scaled by n to
    * stay integer —
    *   cusum_d = Σ_{d'≤d} (n·S_{d'} − T)
    * with S_d the exact daily micro total, n the day count and T = ΣS.
    * The curve's extremum marks the most likely single changepoint
    * (classic CUSUM statistic); `is_peak` flags it. Dense day grid —
    * absent days are genuine zeros, which the running sum must see.
    *
    * Exactness: daily totals are BIGINT micro sums; the prefix sum rides
    * DECIMAL(38,0) (n·S ~ 10⁵·10¹⁸ exceeds the long); the peak test
    * compares exact decimals. No doubles anywhere.
    *
    * Scale shape: one shuffle to the day grid (calendar-bounded), one
    * global window over THAT GRID (≤ tens of thousands of rows at any
    * corpus scale — the q97 bounded-grid argument), one 1-row max
    * aggregate broadcast back.
    */
  def dailyCusum(df: DataFrame, tsCol: String, valCol: String): DataFrame = {
    val day = col(tsCol).cast("date")
    val observed = df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(day.as("d"))
      .agg(sum(round(col(valCol) * 1e6).cast("long")).as("s"))
    val bounds = observed.agg(min("d").as("lo"), max("d").as("hi"))
    val grid = bounds.select(explode(sequence(col("lo"), col("hi"))).as("d"))
      .join(observed, Seq("d"), "left")
      .select(col("d"), coalesce(col("s"), lit(0L)).as("s"))
    val tot = grid.agg(count(lit(1)).as("n"), sum("s").as("t"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = grid.crossJoin(broadcast(tot))
      .select(col("d"), col("n"),
        sum((col("n") * col("s") - col("t")).cast("decimal(38,0)")).over(w)
          .cast("decimal(38,0)").as("cusum_scaled"))
    val peak = curve.agg(max(abs(col("cusum_scaled"))).as("m"))
    // emit cusum/n (un-scales the n factor — one pinned division per
    // day; the exact decimal never leaves the plan, so no long overflow
    // at any scale), peak test on the EXACT decimals
    curve.crossJoin(broadcast(peak))
      .select(col("d").as("day"),
        (col("cusum_scaled").cast("double") / col("n").cast("double"))
          .as("cusum_micro"),
        (abs(col("cusum_scaled")) === col("m")).as("is_peak"))
  }

  /** Per-key daily volume anomalies against an EXACT trailing median —
    * the robust complement to z-score alerting ([[Quality]] q10): one
    * spike day cannot drag its own baseline the way it drags a mean.
    *
    * The trailing window is the last `window` OBSERVED days (rows, not
    * calendar — a key dark for a week resumes against its own history).
    * The median is exact via the sorted window list: median×2 =
    * l[(n+1)/2] + l[(n+2)/2] (1-based int division; equal middles when n
    * is odd), so even-n averaging never leaves the integers. Anomaly =
    * count outside [0.5, 1.5]× median, tested as 4·cnt vs (1|3)·median×2
    * — pure BIGINT comparisons, no doubles anywhere. Warm-up rows (fewer
    * than ceil(window/2) observations) report the median but never flag.
    *
    * Scale shape: one shuffle to the (key, day) grid (calendar×keys-
    * bounded, the q97 argument), then a per-key window whose collected
    * list is ≤ `window` longs — constant state per row, any corpus size.
    */
  def rollingMedianAnomaly(df: DataFrame, keyCol: String, tsCol: String,
      window: Int = 7): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val daily = df.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__k"), col(tsCol).cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("__k").orderBy("day")
      .rowsBetween(-(window - 1), Window.currentRow)
    val nw = size(col("__win"))
    daily
      .withColumn("__win", sort_array(collect_list(col("cnt")).over(w)))
      .select(col("__k").as(keyCol), col("day"), col("cnt"),
        nw.cast("long").as("n_window"),
        (element_at(col("__win"), ((nw + 1) / 2).cast("int")) +
         element_at(col("__win"), ((nw + 2) / 2).cast("int"))).as("median_x2"))
      .withColumn("is_anomaly",
        col("n_window") >= lit((window + 1) / 2) &&
          (col("cnt") * 4 > col("median_x2") * 3 ||
           col("cnt") * 4 < col("median_x2")))
  }

  /** HOLT LINEAR-TREND smoothing (double exponential) of a daily measure
    * — the level+trend forecaster between [[ewmaTrailing]] (level only,
    * lags any trend) and a seasonal model (q183 profiles seasonality
    * separately). Fixed dyadic gains α = 1/2, β = 1/4 on the integer
    * micro grid with truncating division, so the whole recurrence is
    * engine-exact:
    *
    *   l₁ = s₁, b₁ = 0
    *   lₜ = (sₜ + lₜ₋₁ + bₜ₋₁) / 2
    *   bₜ = (lₜ − lₜ₋₁ + 3·bₜ₋₁) / 4          (both / truncating)
    *
    * and the h-step-ahead forecast is lₜ + h·bₜ.
    *
    * Scale shape: the distributed work is ONE shuffle aggregating the
    * corpus to its day grid; the sequential fixed point then runs on
    * the driver over the CALENDAR-bounded series (≤ thousands of rows
    * at any corpus scale — the dailyCusum/markovStationary bounded-
    * domain argument; a per-key variant would ride a flatMapGroups over
    * the same bounded series per key). Missing days carry s = 0 via the
    * gap-filled grid, so the recurrence index is true calendar time.
    *
    * Returns (day, actual_micro, level_micro, trend_micro,
    * forecast_next_micro) per day, forecast_next = that day's l + b.
    */
  def holtLinear(df: DataFrame, tsCol: String, valCol: String): DataFrame = {
    val spark = df.sparkSession
    val day = col(tsCol).cast("date")
    val observed = df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(day.as("d"))
      .agg(sum(round(col(valCol) * 1e6).cast("long")).as("s"))
    val bounds = observed.agg(min("d").as("lo"), max("d").as("hi"))
    val grid = bounds.select(explode(sequence(col("lo"), col("hi"))).as("d"))
      .join(observed, Seq("d"), "left")
      .select(col("d"), coalesce(col("s"), lit(0L)).as("s"))
      .orderBy("d")
    val series = grid.collect().map(r =>
      (r.getDate(0), r.getLong(1))) // calendar-bounded driver rows
    require(series.nonEmpty, "holtLinear: empty input")
    val out = Array.newBuilder[(java.sql.Date, Long, Long, Long, Long)]
    var l = series.head._2
    var b = 0L
    out += ((series.head._1, series.head._2, l, b, l + b))
    series.drop(1).foreach { case (d, s) =>
      val lPrev = l
      l = (s + lPrev + b) / 2
      b = (l - lPrev + 3 * b) / 4
      out += ((d, s, l, b, l + b))
    }
    import spark.implicits._
    out.result().toSeq
      .toDF("day", "actual_micro", "level_micro", "trend_micro",
        "forecast_next_micro")
      .orderBy("day")
  }

  /** HOLT-WINTERS additive seasonal smoothing (triple exponential,
    * period-`period` seasonality) of a daily measure — the seasonal
    * member of the [[ewmaTrailing]] → [[holtLinear]] ladder: level +
    * trend + a rotating seasonal register, so a weekly-shaped metric
    * forecasts next-day without the 7-day lag a trend-only model pays.
    * Dyadic gains α = 1/2, β = 1/4, γ = 1/2 on the integer micro grid
    * with truncating division (engine-exact; DuckDB `//` and Scala `/`
    * both truncate toward zero):
    *
    *   t = 1:  l₁ = s₁, b₁ = 0, seasonal register all 0
    *   t ≥ 2:  lₜ = ((sₜ − seaₜ₋ₚ) + lₜ₋₁ + bₜ₋₁) / 2
    *           bₜ = (lₜ − lₜ₋₁ + 3·bₜ₋₁) / 4
    *           seaₜ = (sₜ − lₜ + seaₜ₋ₚ) / 2
    *
    * where seaₜ₋ₚ is the register head (written `period` days earlier).
    * Scale shape is [[holtLinear]]'s: one shuffle to the gap-filled
    * calendar day grid, then a driver recurrence over the
    * calendar-bounded series; the oracle replays the same recurrence as
    * a recursive CTE carrying the `period`-slot register as rotating
    * columns.
    *
    * Returns (day, actual_micro, level_micro, trend_micro,
    * seasonal_micro, forecast_next_micro) where forecast_next =
    * l + b + (the register slot the NEXT day will consume).
    */
  def holtWinters(df: DataFrame, tsCol: String, valCol: String,
      period: Int = 7): DataFrame = {
    require(period >= 2 && period <= 366, s"period out of range: $period")
    val spark = df.sparkSession
    val day = col(tsCol).cast("date")
    val observed = df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(day.as("d"))
      .agg(sum(round(col(valCol) * 1e6).cast("long")).as("s"))
    val bounds = observed.agg(min("d").as("lo"), max("d").as("hi"))
    val grid = bounds.select(explode(sequence(col("lo"), col("hi"))).as("d"))
      .join(observed, Seq("d"), "left")
      .select(col("d"), coalesce(col("s"), lit(0L)).as("s"))
      .orderBy("d")
    val series = grid.collect().map(r =>
      (r.getDate(0), r.getLong(1))) // calendar-bounded driver rows
    require(series.nonEmpty, "holtWinters: empty input")
    val sea = Array.fill(period)(0L) // rotating register, head = index 0
    var head = 0
    val out = Array.newBuilder[(java.sql.Date, Long, Long, Long, Long, Long)]
    var l = series.head._2
    var b = 0L
    // t = 1: register untouched; next day consumes the current head
    out += ((series.head._1, series.head._2, l, b, 0L, l + b + sea(head)))
    series.drop(1).foreach { case (d, s) =>
      val slot = sea(head)
      val lPrev = l
      l = ((s - slot) + lPrev + b) / 2
      b = (l - lPrev + 3 * b) / 4
      val snew = (s - l + slot) / 2
      sea(head) = snew
      head = (head + 1) % period
      out += ((d, s, l, b, snew, l + b + sea(head)))
    }
    import spark.implicits._
    out.result().toSeq
      .toDF("day", "actual_micro", "level_micro", "trend_micro",
        "seasonal_micro", "forecast_next_micro")
      .orderBy("day")
  }

  /** CLASSICAL ADDITIVE SEASONAL DECOMPOSITION of a daily measure
    * (trend + seasonal + residual — the moving-average construction STL
    * refines): trend = centered period-length moving average (defined
    * only where the full window exists), per-slot seasonal index = mean
    * of the detrended values in that day-of-period slot, centered so the
    * indices sum to ~0, residual = actual − trend − seasonal. All on the
    * exact integer micro grid with truncating division (`div` ≡ DuckDB
    * `//`), so both engines produce identical decompositions; day-of-
    * period is pure date arithmetic (datediff mod period — no engine
    * week-start conventions).
    *
    * Scale shape: one shuffle to the calendar-filled day grid (absent
    * days are true zeros, the [[holtWinters]] convention); the MA window
    * and the period-slot aggregate both live on that bounded grid.
    *
    * Returns per day: (day, actual_micro, trend_micro, seasonal_micro,
    * residual_micro) — trend/residual null on the half-window edges.
    */
  def classicalDecompose(df: DataFrame, tsCol: String, valCol: String,
      period: Int = 7): DataFrame = {
    require(period >= 2 && period % 2 == 1,
      s"classicalDecompose: odd period required (centered MA), got $period")
    val half = period / 2
    val day = col(tsCol).cast("date")
    val observed = df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(day.as("d"))
      .agg(sum(round(col(valCol) * 1e6).cast("long")).as("s"))
    val bounds = observed.agg(min("d").as("lo"), max("d").as("hi"))
    val grid = graft.CacheScope.register(
      bounds.select(explode(sequence(col("lo"), col("hi"))).as("d"))
        .join(observed, Seq("d"), "left")
        .select(col("d"), coalesce(col("s"), lit(0L)).as("s"),
          pmod(datediff(col("d"), lit("2024-01-01").cast("date")),
            lit(period)).as("slot")))
    val w = Window.orderBy(col("d")).rowsBetween(-half, half)
    val trended = graft.CacheScope.register(
      grid.withColumn("__win_n", count(lit(1)).over(w))
        .withColumn("trend_micro",
          when(col("__win_n") === period,
            expr(s"cast(sum(s) over (order by d rows between $half preceding" +
              s" and $half following) as bigint) div $period"))))
    val seasonalRaw = trended
      .filter(col("trend_micro").isNotNull)
      .groupBy("slot")
      .agg(expr("sum(s - trend_micro) div count(1)").as("sea_raw"))
    val adj = seasonalRaw.agg(
      expr(s"cast(sum(sea_raw) as bigint) div $period").as("sea_adj"))
    val seasonal = seasonalRaw.crossJoin(broadcast(adj))
      .select(col("slot"), (col("sea_raw") - col("sea_adj")).as("seasonal_micro"))
    trended
      .join(broadcast(seasonal), Seq("slot"), "left")
      .select(col("d").as("day"), col("s").as("actual_micro"),
        col("trend_micro"), col("seasonal_micro"),
        (col("s") - col("trend_micro") - col("seasonal_micro"))
          .as("residual_micro"))
      .orderBy("day")
  }

  /** SPLIT-CONFORMAL PREDICTION INTERVAL for the one-step-ahead
    * forecast (Vovk et al.; the distribution-free wrapper the
    * Holt-Winters point forecast needs to ship with error bars): the
    * first half of the [[forecastBacktest]] holdout calibrates
    * q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest |residual| (capped at n_cal),
    * and the second half measures empirical coverage of
    * forecast ± q̂ — if coverage ≈ 1−α, the interval is honest
    * regardless of the error distribution.
    *
    * Residuals are exact micro integers; the rank selection runs over
    * the ≤holdoutDays-row grid (bounded window); coverage is exact
    * counts + one truncating micro quotient.
    *
    * Returns one row: (n_cal, n_eval, qhat_micro, n_covered,
    * coverage_micro = covered·10⁶ div n_eval).
    */
  def conformalInterval(df: DataFrame, tsCol: String, valCol: String,
      period: Int, holdoutDays: Int, alphaPct: Int = 10): DataFrame = {
    require(alphaPct > 0 && alphaPct < 100, s"alphaPct in (0,100): $alphaPct")
    val bt = graft.CacheScope.register(
      forecastBacktest(df, tsCol, valCol, period, holdoutDays)
        .withColumn("__rn", row_number().over(Window.orderBy(col("day")))))
    val n = bt.count()
    require(n >= 4, s"conformalInterval: holdout too small ($n)")
    val nCal = n / 2
    // ceil((nCal+1)(1-alpha)) with integer arithmetic, capped at nCal
    val k = math.min(nCal,
      ((nCal + 1) * (100 - alphaPct) + 99) / 100)
    val qhat = bt.filter(col("__rn") <= nCal)
      .withColumn("__rk", row_number().over(Window.orderBy(
        col("abs_err_micro"), col("day"))))
      .filter(col("__rk") === k)
      .select(col("abs_err_micro").as("qhat_micro"))
    bt.filter(col("__rn") > nCal)
      .crossJoin(broadcast(qhat))
      .agg(lit(nCal).as("n_cal"), count(lit(1)).as("n_eval"),
        first(col("qhat_micro")).as("qhat_micro"),
        sum(when(col("abs_err_micro") <= col("qhat_micro"), 1L)
          .otherwise(0L)).as("n_covered"))
      .withColumn("coverage_micro",
        expr("(n_covered * 1000000) div n_eval"))
  }

  /** SEASONALITY-ADJUSTED ANOMALY FLAGS — z-scores on
    * [[classicalDecompose]]'s RESIDUALS instead of raw values: a Sunday
    * dip that recurs every Sunday is seasonal, not anomalous; the raw
    * z-rule (q10) pages on it, this one doesn't. Residual mean/variance
    * come from exact DECIMAL(38,0) micro moments; each day's z is one
    * pinned IEEE sequence, flagged at |z| > 3.
    *
    * Returns per decomposed day (trend defined): (day, actual_micro,
    * residual_micro, z, is_anomaly), ordered by day.
    */
  def seasonalAnomalies(df: DataFrame, tsCol: String, valCol: String,
      period: Int = 7): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val res = graft.CacheScope.register(
      classicalDecompose(df, tsCol, valCol, period)
        .filter(col("residual_micro").isNotNull))
    val mom = res.agg(count(lit(1)).as("n"),
      sum(dec(col("residual_micro"))).as("s"),
      sum(dec(col("residual_micro")) * dec(col("residual_micro"))).as("q"))
    val nD = col("n").cast("double")
    val sd = sqrt((nD * col("q").cast("double")
      - col("s").cast("double") * col("s").cast("double")) / (nD * nD))
    res.crossJoin(broadcast(mom))
      .withColumn("z",
        when(sd > 0,
          (col("residual_micro").cast("double")
            - col("s").cast("double") / nD) / sd))
      .select(col("day"), col("actual_micro"), col("residual_micro"),
        col("z"), coalesce(abs(col("z")) > 3.0, lit(false)).as("is_anomaly"))
      .orderBy("day")
  }

  /** MANN-KENDALL trend test over a daily measure — the significance
    * companion to [[theilSen]]'s slope (same pairwise machinery, same
    * calendar-bounded grid): S = Σ_{i<j} sign(s_j − s_i) counts
    * concordant-minus-discordant day pairs, Var(S) carries the exact
    * tie correction [n(n−1)(2n+5) − Σₜ t(t−1)(2t+5)] / 18 (Kendall
    * 1975), and the reported z applies the ±1 continuity correction.
    * Everything except the final z is exact BIGINT arithmetic (n ≤ a few
    * thousand days ⇒ n³ ≪ 2⁶³); z is ONE pinned (S∓1)/√(var18/18)
    * double sequence, null when the variance degenerates (all days
    * tied).
    *
    * Scale shape: one shuffle to the observed-day micro-sum grid, the
    * d² pair relation rides q237's broadcast-inequality join over that
    * bounded grid, the tie term is a value-grid aggregate — raw rows are
    * never pair-joined.
    *
    * Returns one row: (n_days, s_stat, var18_num, z).
    */
  def mannKendall(df: DataFrame, tsCol: String, valCol: String): DataFrame = {
    val daily = graft.CacheScope.register(
      df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
        .groupBy(col(tsCol).cast("date").as("d"))
        .agg(sum(round(col(valCol) * 1e6).cast("long")).as("s")))
    val sStat = daily.as("a").join(broadcast(daily.as("b")),
        col("a.d") < col("b.d"))
      .agg(coalesce(sum(signum(col("b.s") - col("a.s")).cast("long")),
        lit(0L)).as("s_stat"))
    val n = daily.agg(count(lit(1)).as("n_days"))
    val tieSum = daily.groupBy("s").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)),
        lit(0L)).as("tie_sum"))
    n.crossJoin(broadcast(sStat)).crossJoin(broadcast(tieSum))
      .select(col("n_days"), col("s_stat"),
        (col("n_days") * (col("n_days") - 1) * (col("n_days") * 2 + 5)
          - col("tie_sum")).as("var18_num"))
      .withColumn("z",
        when(col("var18_num") > 0,
          when(col("s_stat") > 0, (col("s_stat") - 1).cast("double"))
            .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double"))
            .otherwise(lit(0.0))
            / sqrt(col("var18_num").cast("double") / lit(18.0))))
  }

  /** ONE-STEP-AHEAD FORECAST BACKTEST of the Holt-Winters recurrence:
    * for every day in the trailing `holdoutDays` window, compare the
    * forecast the model issued the previous evening
    * (lag(forecast_next) = l + b + next seasonal slot, computed from
    * data strictly before the day) against the realized actual — the
    * honest walk-forward evaluation (no refit on future data, no
    * in-sample flattery) every forecasting deployment runs before
    * trusting a smoother. Errors stay on the exact integer micro grid:
    * abs_err = |a − f|, smape = (2·10⁶·|a − f|) div (|a| + |f|)
    * (∈ [0, 2·10⁶], the symmetric MAPE convention), both routed through
    * DECIMAL(38,0) so the ×2·10⁶ scaling cannot overflow at any daily
    * magnitude.
    *
    * Scale shape: inherits [[holtWinters]]' calendar-bounded day grid
    * (one shuffle to daily sums, driver recurrence over ≤ a few thousand
    * days); the lag window runs on that same bounded grid.
    *
    * Returns per holdout day: (day, actual_micro, predicted_micro,
    * abs_err_micro, smape_micro), ordered by day.
    */
  def forecastBacktest(df: DataFrame, tsCol: String, valCol: String,
      period: Int, holdoutDays: Int): DataFrame = {
    require(holdoutDays >= 1, s"holdoutDays must be positive: $holdoutDays")
    val hw = graft.CacheScope.register(holtWinters(df, tsCol, valCol, period))
    val maxD = hw.agg(max("day")).first().getDate(0)
    val lagged = hw.select(col("day"), col("actual_micro"),
      lag(col("forecast_next_micro"), 1)
        .over(Window.orderBy(col("day"))).as("predicted_micro"))
    lagged
      .filter(col("predicted_micro").isNotNull &&
        col("day") > date_sub(lit(maxD), holdoutDays))
      .withColumn("abs_err_micro",
        abs(col("actual_micro") - col("predicted_micro")))
      .withColumn("smape_micro",
        when(abs(col("actual_micro")) + abs(col("predicted_micro")) > 0,
          expr("cast(cast(2000000 as decimal(38,0)) * abs_err_micro as decimal(38,0))" +
            " div (abs(actual_micro) + abs(predicted_micro))").cast("long"))
          .otherwise(lit(0L)))
      .orderBy("day")
  }

  /** THEIL-SEN robust slope of a daily measure: the exact median of all
    * pairwise slopes over the day grid — a single outlier day drags an
    * OLS fit (q132) arbitrarily; the pairwise-slope median has a 29%
    * breakdown point (Sen 1968). Fully distributed, no driver state:
    * one shuffle aggregates the corpus to its OBSERVED day grid (micro
    * sums), the pair relation lives on that calendar-bounded grid only
    * (d·(d−1)/2 pairs for d observed days — the q97 bounded-grid
    * argument, never raw rows), and each slope is the exact truncating
    * quotient (Δy_micro · 1000) div Δdays routed through DECIMAL(38,0)
    * so the ×1000 sub-micro scaling can't overflow at any daily
    * magnitude. The even-count median is returned DOUBLED (sum of the
    * two middle slopes — [[dailyAnomalies]]' median_x2 convention) so
    * the result stays integral; the one float is the final pinned
    * division.
    *
    * Returns one row: (n_days, n_pairs, slope2x_millimicro,
    * slope_per_day) with slope_per_day = slope2x / 2 / 1e9 in value
    * units/day.
    */
  def theilSen(df: DataFrame, tsCol: String, valCol: String): DataFrame = {
    val daily = graft.CacheScope.register(
      df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
        .groupBy(col(tsCol).cast("date").as("d"))
        .agg(sum(round(col(valCol) * 1e6).cast("long")).as("s")))
    // calendar-bounded pair join: broadcast the right side so the
    // inequality condition plans as a BNLJ over the tiny day aggregate
    // (q134's shape), never a cartesian of raw relations. The pair
    // relation feeds the pair count, the median-rank denominator and
    // the rank window — register it so the d² join runs once.
    val slopes = graft.CacheScope.register(
      daily.as("a").join(broadcast(daily.as("b")),
          col("a.d") < col("b.d"))
        .select(expr(
          "cast((cast(b.s as decimal(38,0)) - a.s) * 1000 as decimal(38,0))" +
            " div datediff(b.d, a.d)").cast("long").as("sl")))
    // global window over the bounded pair grid (d² of CALENDAR days)
    val ranked = slopes.withColumn("rn",
      row_number().over(Window.orderBy(col("sl"))))
    // one pair-count aggregate reused for both the reported n_pairs and
    // the median-rank targets; rank selection uses INTEGRAL div so the
    // even-count lower-middle rank (np+1) div 2 actually matches (Column
    // `/` is float division: (np+1)/2 = x.5 for even np never equals rn,
    // which doubled the upper-middle slope instead of summing both)
    val nPairs = graft.CacheScope.register(
      slopes.agg(count(lit(1)).as("n_pairs")))
    val counts = daily.agg(count(lit(1)).as("n_days"))
      .crossJoin(broadcast(nPairs))
    counts.crossJoin(broadcast(
        ranked.crossJoin(broadcast(nPairs.select(col("n_pairs").as("np"))))
          .filter(col("rn") === expr("(np + 1) div 2") ||
            col("rn") === expr("(np + 2) div 2"))
          .agg(when(count(lit(1)) === 1, sum("sl") * 2)
            .otherwise(sum("sl")).as("slope2x_millimicro"))))
      .select(col("n_days"), col("n_pairs"), col("slope2x_millimicro"),
        (col("slope2x_millimicro").cast("double") / lit(2.0) / lit(1e9))
          .as("slope_per_day"))
  }

  /** PAGE-HINKLEY change detection over a daily measure: the classic
    * sequential drift statistic PHₜ = mₜ − min_{i≤t} mᵢ where
    * mₜ = Σ_{i≤t} (xᵢ − mean(x₁..xᵢ) − δ) — [[dailyCusum]] tracks drift
    * against a FIXED global mean (needs the whole series twice);
    * Page-Hinkley is the one-sided online form whose running mean adapts,
    * the standard streaming-drift monitor (Page 1954, Hinkley 1971).
    * Everything lives on the gap-filled calendar day grid in exact micro
    * integers with truncating division: running mean = cumsum div t,
    * deviations and their cumsum stay BIGINT, and the prefix-min window
    * completes the statistic — three windows over the bounded grid, no
    * driver state, no floats at all.
    *
    * `deltaMicro` is the drift dead-band, `lambdaMicro` the alarm
    * threshold (both in micro value units). Returns per day: (day,
    * x_micro, mean_micro, m_micro, ph_micro, alarm).
    */
  def pageHinkley(df: DataFrame, tsCol: String, valCol: String,
      deltaMicro: Long, lambdaMicro: Long): DataFrame = {
    val observed = df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(col(tsCol).cast("date").as("d"))
      .agg(sum(round(col(valCol) * 1e6).cast("long")).as("s"))
    val grid = observed.agg(min("d").as("lo"), max("d").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
      .join(observed, Seq("d"), "left")
      .select(col("d"), coalesce(col("s"), lit(0L)).as("x"))
    // calendar-bounded global windows (the holtLinear day-grid argument)
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("__t", count(lit(1)).over(w))
      .withColumn("mean_micro", expr("sum(x) over (order by d rows between" +
        " unbounded preceding and current row) div __t"))
      .withColumn("m_micro",
        sum(col("x") - col("mean_micro") - lit(deltaMicro)).over(w))
      .withColumn("ph_micro", col("m_micro") - min("m_micro").over(w))
      .select(col("d").as("day"), col("x").as("x_micro"), col("mean_micro"),
        col("m_micro"), col("ph_micro"),
        (col("ph_micro") > lambdaMicro).as("alarm"))
      .orderBy("day")
  }

  /** DURBIN-WATSON AUTOCORRELATION of the daily-trend OLS residuals —
    * the regression diagnostic that tells you whether q132's linear fit
    * left serial structure on the table (DW ≈ 2 none, → 0 positive,
    * → 4 negative autocorrelation): fit y_t = a + b·t in closed form
    * from exact DECIMAL moments over the observed-day grid, micro-round
    * each residual ONCE (the pinned convention — identical in any
    * engine), then DW = Σ(e_t − e_{t−1})² / Σe_t² from exact integer
    * sums of those pinned residuals. Consecutive means consecutive
    * OBSERVATIONS in time order (the classical definition), not
    * consecutive calendar days.
    *
    * Scale shape: one shuffle to the calendar-bounded day grid, one
    * single-row moment aggregate, one lag window over that grid. Raw
    * rows are scanned once.
    *
    * Returns one row: (n_days, sum_abs_resid_micro, dw) — dw null when
    * the fit or the residual mass degenerates (n < 3, constant day
    * index, or a perfect fit).
    */
  def durbinWatson(df: DataFrame, tsCol: String, valCol: String): DataFrame = {
    val daily = graft.CacheScope.register(
      df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
        .groupBy(col(tsCol).cast("date").as("d"))
        .agg(sum(round(col(valCol) * 1e6).cast("long")).as("y")))
    val withX = daily.crossJoin(broadcast(daily.agg(min("d").as("__lo"))))
      .select(col("d"), col("y"),
        datediff(col("d"), col("__lo")).cast("long").as("x"))
    def D(c: Column) = c.cast("decimal(38,0)")
    val m = withX.agg(
      count(lit(1)).as("n"),
      sum(D(col("x"))).cast("decimal(38,0)").as("sx"),
      sum(D(col("y"))).cast("decimal(38,0)").as("sy"),
      sum(D(col("x")) * D(col("x"))).cast("decimal(38,0)").as("sxx"),
      sum(D(col("x")) * D(col("y"))).cast("decimal(38,0)").as("sxy"))
    val nD = col("n").cast("double")
    val denomFit = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    // divisions live INSIDE when branches: ANSI mode raises on /0
    val fit = m
      .withColumn("__b", when(col("n") >= 3 && denomFit > 0,
        (nD * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) / denomFit))
      .withColumn("__a", when(col("__b").isNotNull,
        (col("sy").cast("double") - col("__b") * col("sx").cast("double"))
          / nD))
    val resid = withX.crossJoin(broadcast(fit.select("n", "__a", "__b")))
      .select(col("d"), col("n"),
        round(col("y").cast("double") -
          (col("__a") + col("__b") * col("x").cast("double")))
          .cast("long").as("e"))
    val w = Window.orderBy("d") // calendar-bounded day grid only
    val lagged = resid.withColumn("ep", lag("e", 1).over(w))
    lagged.agg(
        max("n").as("n_days"),
        coalesce(sum(abs(col("e"))), lit(0L)).cast("long")
          .as("sum_abs_resid_micro"),
        sum(D(col("e")) * D(col("e"))).cast("decimal(38,0)").as("__den"),
        sum(when(col("ep").isNotNull,
          D(col("e") - col("ep")) * D(col("e") - col("ep"))))
          .cast("decimal(38,0)").as("__num"))
      .select(col("n_days"), col("sum_abs_resid_micro"),
        when(col("__den").isNotNull && col("__den").cast("double") > 0,
          col("__num").cast("double") / col("__den").cast("double"))
          .as("dw"))
  }

  /** MASE FORECAST EVALUATION — Mean Absolute Scaled Error of the
    * Holt-Winters one-step backtest against the SEASONAL-NAIVE baseline
    * (ŷ_t = y_{t−period}): the scale-free score Hyndman & Koehler
    * proposed precisely because MAPE degenerates on near-zero days and
    * raw MAE is unit-bound. MASE < 1 ⇔ the smoother beats "same day
    * last week" — the first question any forecast deployment must
    * answer, which q263's per-day errors don't aggregate to. Error sums
    * are exact integer micro; the ratio is the exact floor quotient
    * (Σ|e_model|·10⁶) div Σ|e_naive| on the micro grid.
    *
    * Scale shape: inherits [[holtWinters]]' calendar-bounded day grid;
    * both lag windows and the final aggregate run on that bounded grid.
    *
    * Returns one row: (n_days, sum_err_model_micro, sum_err_naive_micro,
    * mase_micro) — mase_micro null when the naive error is zero.
    */
  def forecastMase(df: DataFrame, tsCol: String, valCol: String,
      period: Int, holdoutDays: Int): DataFrame = {
    require(holdoutDays >= 1, s"holdoutDays must be positive: $holdoutDays")
    val hw = graft.CacheScope.register(holtWinters(df, tsCol, valCol, period))
    val maxD = hw.agg(max("day")).first().getDate(0)
    val w = Window.orderBy("day") // calendar-bounded day grid only
    hw.select(col("day"), col("actual_micro"),
        lag("forecast_next_micro", 1).over(w).as("pred"),
        lag("actual_micro", period).over(w).as("naive"))
      .filter(col("pred").isNotNull && col("naive").isNotNull &&
        col("day") > date_sub(lit(maxD), holdoutDays))
      .agg(
        count(lit(1)).as("n_days"),
        sum(abs(col("actual_micro") - col("pred"))).cast("long")
          .as("sum_err_model_micro"),
        sum(abs(col("actual_micro") - col("naive"))).cast("long")
          .as("sum_err_naive_micro"))
      .withColumn("mase_micro",
        when(col("sum_err_naive_micro") > 0,
          expr("cast((cast(sum_err_model_micro as decimal(38,0)) * 1000000)" +
            " div sum_err_naive_micro as long)")))
  }

  /** GRANGER-STYLE LAG REGRESSION on the daily grid: does yesterday's
    * VOLUME (row count) predict today's value beyond yesterday's value?
    * Fits the unrestricted OLS  y_t = α + β₁·y_{t−1} + β₂·x_{t−1}  and
    * the restricted  y_t = α + β·y_{t−1}  in closed form from one pass
    * of exact centered moments, and reports the 1-restriction F test
    * F = (RSS_r − RSS_u)·(n−3)/RSS_u — the bivariate Granger-causality
    * building block (lag order 1). Only CONSECUTIVE calendar days form
    * (t−1, t) pairs; gap days contribute no pair (documented — no
    * imputation across holes).
    *
    * All nine raw moments (Σy, Σu, Σv, Σyy, Σuu, Σvv, Σyu, Σyv, Σuv
    * with u = y_{t−1} micro, v = x_{t−1} count) accumulate EXACTLY in
    * DECIMAL(38,0) from the micro grid (day sums ≤ ~10¹³ micro ⇒
    * squared-sum magnitudes ≤ ~10²⁹ over any calendar — headroom to
    * 10³⁸); the normal-equations solve is a fixed pinned sequence of
    * double ops from those exact integers, bit-identical across engines.
    *
    * Scale shape: one shuffle to the calendar-bounded daily grid, a lag
    * window over that grid (≤ a few thousand rows), one single-row
    * aggregate. Raw rows are scanned once.
    *
    * Returns one row: (n_days, b_y_lag, b_x_lag, f_granger) — b_x_lag is
    * in value-micro per event; all three null when the design
    * degenerates (n ≤ 3, singular normal equations, or RSS_u ≤ 0).
    */
  def grangerLag(df: DataFrame, tsCol: String, valCol: String): DataFrame = {
    val daily = df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(col(tsCol).cast("date").as("d"))
      .agg(sum(round(col(valCol) * 1e6).cast("long")).as("y"),
        count(lit(1)).as("x"))
    val w = Window.orderBy("d") // calendar-bounded daily grid only
    val lagged = daily
      .withColumn("pd", lag("d", 1).over(w))
      .withColumn("u", lag("y", 1).over(w))
      .withColumn("v", lag("x", 1).over(w))
      .filter(col("pd").isNotNull && datediff(col("d"), col("pd")) === 1)
    def D(c: Column) = c.cast("decimal(38,0)")
    val m = lagged.agg(
      count(lit(1)).as("n"),
      sum(D(col("y"))).cast("decimal(38,0)").as("sy"),
      sum(D(col("u"))).cast("decimal(38,0)").as("su"),
      sum(D(col("v"))).cast("decimal(38,0)").as("sv"),
      sum(D(col("y")) * D(col("y"))).cast("decimal(38,0)").as("syy"),
      sum(D(col("u")) * D(col("u"))).cast("decimal(38,0)").as("suu"),
      sum(D(col("v")) * D(col("v"))).cast("decimal(38,0)").as("svv"),
      sum(D(col("y")) * D(col("u"))).cast("decimal(38,0)").as("syu"),
      sum(D(col("y")) * D(col("v"))).cast("decimal(38,0)").as("syv"),
      sum(D(col("u")) * D(col("v"))).cast("decimal(38,0)").as("suv"))
    // pinned double sequence from exact integer moments; the oracle
    // mirrors this exact operation order
    def d2(n: String) = col(n).cast("double")
    val nD = col("n").cast("double")
    val cyy = d2("syy") - d2("sy") * d2("sy") / nD
    val cuu = d2("suu") - d2("su") * d2("su") / nD
    val cvv = d2("svv") - d2("sv") * d2("sv") / nD
    val cyu = d2("syu") - d2("sy") * d2("su") / nD
    val cyv = d2("syv") - d2("sy") * d2("sv") / nD
    val cuv = d2("suv") - d2("su") * d2("sv") / nD
    val det = cuu * cvv - cuv * cuv
    val b1 = (cvv * cyu - cuv * cyv) / det
    val b2 = (cuu * cyv - cuv * cyu) / det
    val rssU = cyy - b1 * cyu - b2 * cyv
    val rssR = cyy - cyu * cyu / cuu
    val ok = col("n") > 3 && det =!= 0.0 && cuu > 0 && rssU > 0
    m.select(col("n").as("n_days"),
      when(ok, b1).as("b_y_lag"),
      when(ok, b2).as("b_x_lag"),
      when(ok, (rssR - rssU) * (nD - 3) / rssU).as("f_granger"))
  }

  /** LJUNG-BOX PORTMANTEAU TEST on the hourly count series — "is there
    * ANY autocorrelation in the first m lags?", the one-number whiteness
    * gate q168's per-lag curve needs a reader for. Q = n(n+2)·Σ r²ₖ/(n−k)
    * with the same dense-grid, n-scaled-centering ACF as [[hourlyAcf]];
    * each lag's term r²ₖ/(n−k) is a pinned IEEE expression rounded to
    * the 10⁻¹² grid and summed as BIGINT (lag-order-free; n−k is
    * exactly the lag's pair count, so no global constant enters the
    * per-term math). The χ²ₘ p-value rides the Wilson–Hilferty cube-root
    * normal approximation through the A&S 26.2.17 tail polynomial (the
    * [[Quality.bhFdr]] determinism budget), rounded to the 10⁻⁶ grid.
    *
    * Scale shape: inherits [[hourlyAcf]]'s one-shuffle grid + single
    * lag-fan-out join; everything after is an m-row aggregate. Output
    * ONE row: (n, m, q_term_sum_pico, lb_q, p_micro).
    */
  def ljungBox(df: DataFrame, tsCol: String, maxLag: Int): DataFrame = {
    val acf = graft.CacheScope.register(hourlyAcf(df, tsCol, maxLag))
    val agg = acf.agg(
      max(col("n_pairs") + col("lag")).cast("long").as("n"),
      count(lit(1)).cast("long").as("m"),
      sum(when(col("acf").isNull, 1L).otherwise(0L)).as("__nulls"),
      sum(round(col("acf") * col("acf") /
        col("n_pairs").cast("double") * 1e12).cast("long"))
        .cast("long").as("q_term_sum_pico"))
    val nD = col("n").cast("double")
    val mD = col("m").cast("double")
    val q = nD * (nD + lit(2.0)) *
      col("q_term_sum_pico").cast("double") / lit(1e12)
    // Wilson–Hilferty: chi²_m upper tail ≈ Φ̄(z), z anchored at the
    // cube-root transform; A&S 26.2.17 gives the one-sided tail
    val z = (cbrt(q / mD) - (lit(1.0) - lit(2.0) / (lit(9.0) * mD))) /
      sqrt(lit(2.0) / (lit(9.0) * mD))
    val az = abs(z)
    val kk = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = ((((lit(1.330274429) * kk + lit(-1.821255978)) * kk
      + lit(1.781477937)) * kk + lit(-0.356563782)) * kk
      + lit(0.319381530)) * kk
    val tail = lit(0.3989422804014327) * exp(lit(-0.5) * az * az) * poly
    val p = when(z >= 0, tail).otherwise(lit(1.0) - tail)
    val ok = col("__nulls") === 0 && col("n") > col("m")
    agg.select(col("n"), col("m"),
      when(ok, col("q_term_sum_pico")).as("q_term_sum_pico"),
      when(ok, q).as("lb_q"),
      when(ok, round(p * 1e6).cast("long")).as("p_micro"))
  }

  /** SINGLE CHANGEPOINT by exact two-segment least squares on the daily
    * revenue grid — the ℓ₂ estimator (binary-segmentation step 1): pick
    * the split minimizing SSE(left) + SSE(right). q169's CUSUM flags the
    * extremum of a mean-shift statistic; this is the direct SSE argmin
    * with the variance-reduction ratio a segmentation loop would
    * threshold on.
    *
    * Mechanics: dense calendar day grid (absent days are true zeros —
    * the [[dailyCusum]] contract), prefix sums Sₜ and Qₜ as exact
    * DECIMAL(38,0) over one ordered window; each candidate split's SSE
    * is a pinned IEEE expression over those exact prefixes (micro² /
    * 10¹² → original units²), and the argmin tie-breaks on the earlier
    * day. The global window rides the CALENDAR-bounded grid (thousands
    * of rows at any corpus scale), never raw data.
    *
    * Output ONE row: (n_days, best_day, n_left, n_right,
    * mean_left_micro, mean_right_micro — truncating div on the micro
    * grid — sse_total, sse_split, var_reduction).
    */
  def changepointSse(df: DataFrame, tsCol: String,
      valCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    def dbl(c: Column) = c.cast("double")
    val day = col(tsCol).cast("date")
    val observed = df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(day.as("d"))
      .agg(sum(round(col(valCol) * 1e6).cast("long")).as("s"))
    val bounds = observed.agg(min("d").as("lo"), max("d").as("hi"))
    val grid = graft.CacheScope.register(
      bounds.select(explode(sequence(col("lo"), col("hi"))).as("d"))
        .join(observed, Seq("d"), "left")
        .select(col("d"), coalesce(col("s"), lit(0L)).as("s")))
    val tot = grid.agg(count(lit(1)).cast("long").as("n"),
      sum(dec(col("s"))).cast("decimal(38,0)").as("stot"),
      sum(dec(col("s")) * dec(col("s"))).cast("decimal(38,0)").as("qtot"))
    val w = Window.orderBy("d") // calendar-bounded day grid only
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = grid.crossJoin(broadcast(tot))
      .withColumn("t", count(lit(1)).over(w))
      .withColumn("st", sum(dec(col("s"))).over(w).cast("decimal(38,0)"))
      .withColumn("qt",
        sum(dec(col("s")) * dec(col("s"))).over(w).cast("decimal(38,0)"))
      .filter(col("t") < col("n"))
    val tD = col("t").cast("double")
    val rD = (col("n") - col("t")).cast("double")
    val sse = (dbl(col("qt")) - dbl(col("st")) * dbl(col("st")) / tD
      + (dbl(col("qtot")) - dbl(col("qt"))
        - (dbl(col("stot")) - dbl(col("st")))
          * (dbl(col("stot")) - dbl(col("st"))) / rD)) / lit(1e12)
    val scored = pre.withColumn("sse_split", sse)
    val best = scored
      .withColumn("__rn", row_number().over(
        Window.orderBy(col("sse_split").asc, col("d").asc)))
      .filter(col("__rn") === 1)
    val sseTotal = (dbl(col("qtot"))
      - dbl(col("stot")) * dbl(col("stot")) / col("n").cast("double")) /
      lit(1e12)
    best.select(col("n").as("n_days"), col("d").as("best_day"),
      col("t").cast("long").as("n_left"),
      (col("n") - col("t")).cast("long").as("n_right"),
      expr("cast(st div t as long)").as("mean_left_micro"),
      expr("cast((stot - st) div (n - t) as long)").as("mean_right_micro"),
      sseTotal.as("sse_total"), col("sse_split"),
      when(sseTotal > 0, lit(1.0) - col("sse_split") / sseTotal)
        .as("var_reduction"))
  }

  /** SEASONAL AND TREND STRENGTH (Hyndman & Athanasopoulos, FPP):
    * F_seasonal = max(0, 1 − Var(R)/Var(S+R)) and
    * F_trend = max(0, 1 − Var(R)/Var(T+R)) over [[classicalDecompose]]'s
    * exact-integer components — the two scalars that SUMMARIZE q268's
    * per-day decomposition table ("is there seasonality worth modeling,
    * and how strong?"), which is what a forecasting pipeline actually
    * branches on. Rows with an undefined centered-MA trend (the
    * half-period edges) are excluded — the classical convention.
    *
    * Exactness: each component is an integer micro value; population
    * variances ride exact DECIMAL(38,0) moments from ONE aggregate;
    * each strength is a pinned IEEE expression.
    *
    * Output ONE row: (n, var_resid, var_sea_resid, var_trend_resid,
    * seasonal_strength, trend_strength).
    */
  def seasonalStrength(df: DataFrame, tsCol: String, valCol: String,
      period: Int = 7): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    def dbl(c: Column) = c.cast("double")
    val base = classicalDecompose(df, tsCol, valCol, period)
      .filter(col("residual_micro").isNotNull)
      .select(col("residual_micro").as("r"),
        (col("seasonal_micro") + col("residual_micro")).as("sr"),
        (col("trend_micro") + col("residual_micro")).as("tr"))
    val m = base.agg(count(lit(1)).as("n"),
      sum(dec(col("r"))).cast("decimal(38,0)").as("s_r"),
      sum(dec(col("r")) * dec(col("r"))).cast("decimal(38,0)").as("q_r"),
      sum(dec(col("sr"))).cast("decimal(38,0)").as("s_sr"),
      sum(dec(col("sr")) * dec(col("sr"))).cast("decimal(38,0)").as("q_sr"),
      sum(dec(col("tr"))).cast("decimal(38,0)").as("s_tr"),
      sum(dec(col("tr")) * dec(col("tr"))).cast("decimal(38,0)").as("q_tr"))
    val nD = dbl(col("n"))
    def popVar(s: Column, q: Column) =
      (nD * dbl(q) - dbl(s) * dbl(s)) / (nD * nD) / lit(1e12)
    val vr = popVar(col("s_r"), col("q_r"))
    val vsr = popVar(col("s_sr"), col("q_sr"))
    val vtr = popVar(col("s_tr"), col("q_tr"))
    m.select(col("n"), vr.as("var_resid"), vsr.as("var_sea_resid"),
      vtr.as("var_trend_resid"),
      when(col("n") >= 2 && vsr > 0,
        greatest(lit(0.0), lit(1.0) - vr / vsr)).as("seasonal_strength"),
      when(col("n") >= 2 && vtr > 0,
        greatest(lit(0.0), lit(1.0) - vr / vtr)).as("trend_strength"))
  }

  /** HURST EXPONENT by rescaled-range (R/S) analysis — the long-memory
    * diagnostic of the daily series (Hurst 1951; Mandelbrot & Wallis
    * 1969): H ≈ 0.5 = random walk increments, H > 0.5 = persistent
    * trends, H < 0.5 = mean-reverting — the fractal complement to
    * [[ljungBox]]'s fixed-lag whiteness and q325's runs test. For each
    * dyadic window size m, the series splits into ⌊n/m⌋ full blocks;
    * per block R = range of the cumulative mean-deviation walk and
    * S = population std; H is the OLS slope of log₂(mean R/S) on
    * log₂(m) (exact integers 3..6 for the dyadic windows).
    *
    * Determinism: per-block R/S is a pinned IEEE chain over exact
    * integer block sums; each block's log₂(R/S) is micro-rounded and
    * summed as BIGINT (block-order-free — the chi2 scheme); the final
    * 4-point regression is pinned IEEE over those micro means.
    * Degenerate blocks (S = 0) drop from their window's mean.
    *
    * Scale shape: the (m, block) fan-out is Σ⌊n/m⌋ ≈ 0.23·n rows over
    * the CALENDAR-bounded day grid; windows partition by (m, block)
    * (≤ max(m) rows each); the regression grid is |windows| rows.
    *
    * Output ONE row: (n_days, n_windows, hurst, intercept_log2).
    */
  def hurstRs(df: DataFrame, tsCol: String, valCol: String,
      windows: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    require(windows.nonEmpty && windows.forall(m =>
      m >= 2 && (m & (m - 1)) == 0), s"dyadic windows only: $windows")
    def d(c: Column) = c.cast("decimal(38,0)")
    def dbl(c: Column) = c.cast("double")
    val day = col(tsCol).cast("date")
    val observed = df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(day.as("dy"))
      .agg(sum(round(col(valCol) * 1e6).cast("long")).cast("long").as("y"))
    val bounds = observed.agg(min("dy").as("lo"), max("dy").as("hi"))
    val grid = graft.CacheScope.register(
      bounds.select(col("lo"), explode(sequence(col("lo"), col("hi")))
          .as("dy"))
        .join(observed, Seq("dy"), "left")
        .select(datediff(col("dy"), col("lo")).cast("long").as("x"),
          coalesce(col("y"), lit(0L)).as("y")))
    val tot = grid.agg(count(lit(1)).cast("long").as("n"))
    val fan = grid
      .select(explode(array(windows.map(m => lit(m.toLong)): _*)).as("m"),
        col("x"), col("y"))
      .crossJoin(broadcast(tot))
      .withColumn("blk", expr("x div m"))
      .filter((col("blk") + 1) * col("m") <= col("n")) // full blocks only
    val wBlk = Window.partitionBy("m", "blk").orderBy("x")
    val withCum = fan
      .withColumn("cum", sum("y").over(wBlk))
      .withColumn("pos", row_number().over(wBlk).cast("long"))
    // cumulative deviation walk d_t = cum_t − t·mean, pinned IEEE over
    // the block's exact integer sums
    val mean = dbl(col("s")) / dbl(col("m"))
    val blockStats = withCum
      .join(withCum.groupBy("m", "blk")
        .agg(sum(d(col("y"))).cast("decimal(38,0)").as("s"),
          sum(d(col("y")) * d(col("y"))).cast("decimal(38,0)").as("q")),
        Seq("m", "blk"))
      .withColumn("dev", dbl(col("cum")) - dbl(col("pos")) * mean)
      .groupBy("m", "blk")
      .agg((max("dev") - min("dev")).as("r"),
        // clamp: FP residue can drive q/m − mean² epsilon-negative on a
        // near-constant block; sqrt would yield NaN, and Spark's
        // NaN-is-greatest ordering would sneak it past the sd > 0 guard
        // (DuckDB would instead error) — clamp to 0 so the block drops
        max(sqrt(greatest(lit(0.0),
          dbl(col("q")) / dbl(col("m")) - mean * mean))).as("sd"))
    // window means stay on the INTEGER micro grid (truncating div) and
    // lx = log2(m) is an exact Scala integer, so every regression moment
    // is an order-free BIGINT sum — only the final slope/intercept are
    // IEEE (a double sum over the 4-row grid would be partition-order
    // sensitive in its last bits)
    val lxExpr = windows.map(m =>
      (m.toLong, (31 - Integer.numberOfLeadingZeros(m)).toLong))
      .foldLeft(lit(null).cast("long")) { case (acc, (m, lx)) =>
        when(col("m") === m, lit(lx)).otherwise(acc)
      }
    val perWindow = blockStats
      .select(col("m"),
        when(col("sd") > 0,
          round(log(2.0, col("r") / col("sd")) * 1e6).cast("long"))
          .as("lrs"))
      .groupBy("m")
      .agg(count(col("lrs")).cast("long").as("nb"),
        sum("lrs").cast("long").as("lrs_sum"))
      .filter(col("nb") > 0)
      .select(lxExpr.as("lx"), expr("lrs_sum div nb").as("ly_micro"))
    val reg = perWindow.agg(count(lit(1)).cast("long").as("k"),
      sum("lx").cast("long").as("sx"),
      sum("ly_micro").cast("long").as("sy"),
      sum(col("lx") * col("lx")).cast("long").as("sxx"),
      sum(col("lx") * col("ly_micro")).cast("long").as("sxy"))
    val kD = col("k").cast("double")
    val varx = kD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val cov = kD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val slopeMicro = cov / varx
    reg.crossJoin(broadcast(tot))
      .select(col("n").as("n_days"), col("k").as("n_windows"),
        when(col("k") >= 2 && varx =!= 0.0, slopeMicro / lit(1e6))
          .as("hurst"),
        when(col("k") >= 2 && varx =!= 0.0,
          (col("sy").cast("double") - slopeMicro *
            col("sx").cast("double")) / kD / lit(1e6))
          .as("intercept_log2"))
  }

  /** SEGMENTED (interrupted-time-series) REGRESSION at a KNOWN cut
    * date — "what did the launch DO": [[changepointSse]] finds a break,
    * this quantifies a GIVEN one, the two-segment parameterization of
    * the standard ITS model: independent OLS fits on the pre and post
    * daily series, reporting the level change at the cut (post intercept
    * at the cut minus the pre fit's prediction there — the immediate
    * jump) and the slope change (the trend bend).
    *
    * Exact assembly: per-segment OLS moments (n, Σx, Σy, Σx², Σxy) as
    * DECIMAL(38,0) over the observed daily micro sums with x = epoch
    * day (the q132 moment machinery); slopes/intercepts/levels are one
    * pinned IEEE chain per segment. One grouped aggregate (2 rows),
    * broadcast assembly.
    *
    * Output ONE row: (n_pre, n_post, slope_pre, slope_post,
    * level_pre_at_cut, level_post_at_cut, level_change, slope_change)
    * in original units per day / original units.
    */
  def segmentedRegression(df: DataFrame, tsCol: String, valCol: String,
      cutDate: String): DataFrame = {
    def d(c: Column) = c.cast("decimal(38,0)")
    def dbl(c: Column) = c.cast("double")
    val day = col(tsCol).cast("date")
    val daily = df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(day.as("dy"))
      .agg(sum(round(col(valCol) * 1e6).cast("long")).cast("long").as("y"))
      .select(datediff(col("dy"), lit(cutDate).cast("date"))
        .cast("long").as("x"), col("y"))
    val m = daily
      .groupBy((col("x") >= 0).as("post"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(d(col("x"))).cast("decimal(38,0)").as("sx"),
        sum(d(col("y"))).cast("decimal(38,0)").as("sy"),
        sum(d(col("x")) * d(col("x"))).cast("decimal(38,0)").as("sxx"),
        sum(d(col("x")) * d(col("y"))).cast("decimal(38,0)").as("sxy"))
    def seg(post: Boolean, pfx: String) = m.filter(col("post") === post)
      .select(col("n").as(s"${pfx}n"), col("sx").as(s"${pfx}sx"),
        col("sy").as(s"${pfx}sy"), col("sxx").as(s"${pfx}sxx"),
        col("sxy").as(s"${pfx}sxy"))
    def fit(pfx: String): (Column, Column, Column) = {
      val n = dbl(col(s"${pfx}n")); val sx = dbl(col(s"${pfx}sx"))
      val sy = dbl(col(s"${pfx}sy")); val sxx = dbl(col(s"${pfx}sxx"))
      val sxy = dbl(col(s"${pfx}sxy"))
      val varx = n * sxx - sx * sx
      val slope = (n * sxy - sx * sy) / varx
      val intercept = (sy - slope * sx) / n // micro units at x = 0 (cut)
      (when(col(s"${pfx}n") >= 2 && varx =!= 0.0, slope / lit(1e6)),
        when(col(s"${pfx}n") >= 2 && varx =!= 0.0, intercept / lit(1e6)),
        varx)
    }
    val joined = seg(post = false, "a_").crossJoin(broadcast(
      seg(post = true, "b_")))
    val (slopeA, levelA, _) = fit("a_")
    val (slopeB, levelB, _) = fit("b_")
    joined.select(col("a_n").as("n_pre"), col("b_n").as("n_post"),
        slopeA.as("slope_pre"), slopeB.as("slope_post"),
        levelA.as("level_pre_at_cut"), levelB.as("level_post_at_cut"))
      .withColumn("level_change",
        col("level_post_at_cut") - col("level_pre_at_cut"))
      .withColumn("slope_change", col("slope_post") - col("slope_pre"))
  }

  /** NEWEY-WEST (HAC) STANDARD ERROR of the daily-series mean — the
    * error bar a time series actually deserves: the naive se = σ/√n
    * assumes independent days, but autocorrelated revenue (weekly
    * cycles, momentum) makes it optimistic by the long-run-variance
    * factor. Bartlett kernel: lrv = γ₀ + 2·Σ_{l≤L} (1 − l/(L+1))·γ_l.
    *
    * All-integer assembly: the dense day grid (absent days are true
    * zeros — the [[dailyCusum]] contract) is centered on the TRUNCATED
    * integer mean (dev = y − S div n, the pageRank div convention — the
    * sub-micro centering error is identical in both engines and keeps
    * every product within BIGINT·grid headroom at any corpus scale);
    * each lag's cross-product sum Σ dev_t·dev_{t+l} is an exact DECIMAL
    * off ONE lag-fan-out equi-join (the [[hourlyAcf]] shape), and the
    * kernel weights clear denominators: 2·Σ (L+1−l)·num_l stays exact
    * DECIMAL; the only IEEE steps are the final divisions and sqrts.
    *
    * Output ONE row: (n_days, max_lag, mean, se_naive, se_nw,
    * inflation) — inflation = se_nw/se_naive, the "how wrong was iid"
    * number.
    */
  def neweyWestSe(df: DataFrame, tsCol: String, valCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    def d(c: Column) = c.cast("decimal(38,0)")
    def dbl(c: Column) = c.cast("double")
    val day = col(tsCol).cast("date")
    val observed = df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(day.as("dy"))
      .agg(sum(round(col(valCol) * 1e6).cast("long")).cast("long").as("y"))
    val bounds = observed.agg(min("dy").as("lo"), max("dy").as("hi"))
    val grid = graft.CacheScope.register(
      bounds.select(explode(sequence(col("lo"), col("hi"))).as("dy"))
        .join(observed, Seq("dy"), "left")
        .select(col("dy"), coalesce(col("y"), lit(0L)).as("y")))
    val tot = grid.agg(count(lit(1)).cast("long").as("n"),
      sum(d(col("y"))).cast("decimal(38,0)").as("s"))
    val centered = graft.CacheScope.register(
      grid.crossJoin(broadcast(tot))
        .select(col("dy"), col("n"), col("s"),
          (col("y") - expr("cast(s div n as bigint)")).as("dev")))
    val g0 = centered.agg(
      sum((d(col("dev")) * d(col("dev"))).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("num0"),
      max("n").cast("long").as("n"),
      max("s").as("s"))
    // one equi-join for all lags (hourlyAcf's fan-out): row (d, dev)
    // ships maxLag shifted copies that meet their lag partner at d
    val lagJoin = centered.select(col("dy"), col("dev"))
      .join(centered.select(
          explode(expr(s"sequence(1, $maxLag)")).as("k"),
          col("dy"), col("dev").as("dev2"))
        .select(col("k").cast("long").as("lag"),
          date_sub(col("dy"), col("k")).as("dy"), col("dev2")), "dy")
      .groupBy("lag")
      .agg(sum((d(col("dev")) * d(col("dev2"))).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("numl"))
    // kernel-weighted, denominator-cleared: (L+1−l) are integer weights
    val wsum = lagJoin
      .agg(coalesce(sum((d(lit(maxLag + 1)) - d(col("lag"))) * col("numl"))
        .cast("decimal(38,0)"), d(lit(0))).as("numw"))
    g0.crossJoin(broadcast(wsum))
      .select(col("n").as("n_days"), lit(maxLag.toLong).as("max_lag"),
        // μ = S/n in original units; γ_l = num_l/n on the micro² grid
        (dbl(col("s")) / dbl(col("n")) / lit(1e6)).as("mean"),
        col("num0"), col("numw"))
      .withColumn("__g0",
        dbl(col("num0")) / dbl(col("n_days")) / lit(1e12))
      .withColumn("__lrv",
        (dbl(col("num0")) + lit(2.0) * dbl(col("numw"))
          / lit((maxLag + 1).toDouble)) / dbl(col("n_days")) / lit(1e12))
      .select(col("n_days"), col("max_lag"), col("mean"),
        when(col("n_days") >= 2 && col("__g0") > 0,
          sqrt(col("__g0") / dbl(col("n_days")))).as("se_naive"),
        when(col("n_days") >= 2 && col("__lrv") > 0,
          sqrt(col("__lrv") / dbl(col("n_days")))).as("se_nw"),
        when(col("n_days") >= 2 && col("__g0") > 0 && col("__lrv") > 0,
          sqrt(col("__lrv") / col("__g0"))).as("inflation"))
  }

  /** WALD-WOLFOWITZ RUNS TEST on the daily direction sequence — "is the
    * up/down pattern random?": too FEW runs = momentum/trend, too MANY =
    * mean-reversion; the nonparametric serial-dependence check beside
    * [[durbinWatson]]'s linear-residual one. Signs come from day-over-day
    * differences of the OBSERVED daily sums (zero diffs drop, the
    * standard convention); R = number of maximal same-sign runs.
    *
    * Exact integer machinery: both the diff and the run-boundary count
    * ride lag windows over the calendar-bounded day grid (thousands of
    * rows at any corpus scale — the [[changepointSse]] global-window
    * budget); μ_R and σ_R are closed-form in (n₊, n₋); z and the A&S
    * 26.2.17 two-sided p are the [[Quality.bhFdr]] determinism budget.
    *
    * Output ONE row: (n_signs, n_pos, n_neg, n_runs, mu_r, z, p_micro).
    */
  def runsTest(df: DataFrame, tsCol: String, valCol: String): DataFrame = {
    val day = col(tsCol).cast("date")
    val daily = df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(day.as("dy"))
      .agg(sum(round(col(valCol) * 1e6).cast("long")).cast("long").as("y"))
    val w = Window.orderBy("dy") // calendar-bounded grid only
    val signs = daily
      .withColumn("prev", lag("y", 1).over(w))
      .filter(col("prev").isNotNull && col("y") =!= col("prev"))
      .select(col("dy"), when(col("y") > col("prev"), 1L).otherwise(-1L)
        .as("sgn"))
    val w2 = Window.orderBy("dy")
    val runs = signs
      .withColumn("prevSgn", lag("sgn", 1).over(w2))
      .agg(count(lit(1)).cast("long").as("n_signs"),
        sum(when(col("sgn") === 1L, 1L).otherwise(0L)).cast("long")
          .as("n_pos"),
        sum(when(col("sgn") === -1L, 1L).otherwise(0L)).cast("long")
          .as("n_neg"),
        (sum(when(col("prevSgn").isNull ||
            col("sgn") =!= col("prevSgn"), 1L).otherwise(0L)))
          .cast("long").as("n_runs"))
    val n1 = col("n_pos").cast("double")
    val n2 = col("n_neg").cast("double")
    val nT = n1 + n2
    val muR = lit(2.0) * n1 * n2 / nT + lit(1.0)
    val varR = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - nT) /
      (nT * nT * (nT - lit(1.0)))
    val z = (col("n_runs").cast("double") - muR) / sqrt(varR)
    val az = abs(z)
    val kk = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = ((((lit(1.330274429) * kk + lit(-1.821255978)) * kk
      + lit(1.781477937)) * kk + lit(-0.356563782)) * kk
      + lit(0.319381530)) * kk
    val tail = lit(0.3989422804014327) * exp(lit(-0.5) * az * az) * poly
    val ok = col("n_pos") > 0 && col("n_neg") > 0 && varR > 0
    runs.select(col("n_signs"), col("n_pos"), col("n_neg"), col("n_runs"),
      when(ok, muR).as("mu_r"),
      when(ok, z).as("z"),
      when(ok, round(least(lit(1.0), lit(2.0) * tail) * 1e6).cast("long"))
        .as("p_micro"))
  }

  /** PERIODOGRAM at caller-chosen candidate periods — "WHICH cycle is in
    * this series": the DFT power of the mean-centered daily series at
    * period p, P(p) = C² + S² with C = Σ_t y'_t·cos(2πt/p), S = Σ_t
    * y'_t·sin(2πt/p). [[classicalDecompose]] ASSUMES a period; the
    * periodogram RANKS candidates, the step before it (Schuster 1898).
    *
    * Exactness: the calendar-day grid (missing days = 0) gives exact
    * micro sums y_t and total T; mean-centering stays integer via the
    * ×n trick (y'_t·n = n·y_t − T); cos/sin values are micro-rounded
    * BIGINTs (round(cos(2πt/p)·1e6) — the micro-log convention: both
    * engines round the same libm value of the same IEEE argument), so
    * C and S are order-free DECIMAL(38,0) sums and the final power is
    * one pinned IEEE expression: ((C/n/1e6/n)² + (S/..)²) in squared
    * mean-centered value units.
    *
    * Scale shape: the grid fans out ×|periods| through one explode into
    * a map-side-combined (period) aggregate — |periods| is a small
    * constant; no window, no join.
    *
    * Output per period: (period, n_days, c_amp, s_amp, power) — the
    * cosine/sine amplitudes per sample in mean-centered value units
    * (exact DECIMAL sums converted to double ONCE — the exactSum
    * convention) and their squared magnitude.
    */
  def periodogram(df: DataFrame, tsCol: String, valCol: String,
      periods: Seq[Int]): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2), s"bad: $periods")
    def d(c: Column) = c.cast("decimal(38,0)")
    def dbl(c: Column) = c.cast("double")
    val day = col(tsCol).cast("date")
    val observed = df.filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(day.as("dy"))
      .agg(sum(round(col(valCol) * 1e6).cast("long")).cast("long").as("y"))
    val bounds = observed.agg(min("dy").as("lo"), max("dy").as("hi"))
    val grid = graft.CacheScope.register(
      bounds.select(col("lo"), explode(sequence(col("lo"), col("hi")))
          .as("dy"))
        .join(observed, Seq("dy"), "left")
        .select(datediff(col("dy"), col("lo")).cast("long").as("x"),
          coalesce(col("y"), lit(0L)).as("y")))
    val tot = grid.agg(count(lit(1)).cast("long").as("n"),
      sum(d(col("y"))).cast("decimal(38,0)").as("t"))
    val twoPi = 2.0 * math.Pi // inject the SAME IEEE constant in the oracle
    val fan = grid.crossJoin(broadcast(tot))
      .select(col("x"), col("n"),
        (d(col("y")) * d(col("n")) - col("t")).as("yc"), // n·y − T, exact
        explode(array(periods.map(p => lit(p.toLong)): _*)).as("p"))
      .withColumn("cm", round(cos(lit(twoPi) * dbl(col("x")) / dbl(col("p")))
        * 1e6).cast("long"))
      .withColumn("sm", round(sin(lit(twoPi) * dbl(col("x")) / dbl(col("p")))
        * 1e6).cast("long"))
    fan.groupBy("p")
      .agg(max("n").cast("long").as("n_days"),
        sum(col("yc") * d(col("cm"))).cast("decimal(38,0)").as("__c"),
        sum(col("yc") * d(col("sm"))).cast("decimal(38,0)").as("__s"))
      .select(col("p").as("period"), col("n_days"), {
        val scale = dbl(col("n_days")) * dbl(col("n_days")) * lit(1e12)
        (dbl(col("__c")) / scale).as("c_amp")
      }, {
        val scale = dbl(col("n_days")) * dbl(col("n_days")) * lit(1e12)
        (dbl(col("__s")) / scale).as("s_amp")
      })
      .withColumn("power",
        col("c_amp") * col("c_amp") + col("s_amp") * col("s_amp"))
      .orderBy("period")
  }

}
