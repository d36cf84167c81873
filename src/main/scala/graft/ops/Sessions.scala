package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization — gap-based event grouping per key (SURVEY §2.8 ST5
  * extension / §2.10 event-time analytics).
  *
  * Batch form: the classic lag + cumulative-sum formulation — one shuffle
  * on the key, sessions assigned with two window passes over the same
  * (key, ts) sort order (Spark reuses the sort between them). Scales as a
  * sort-merge: no state, no driver involvement, any key cardinality.
  *
  * Streaming form: `flatMapGroupsWithState` with processing-time timeout —
  * the idiomatic custom-state path when sessions must close mid-stream.
  */
object Sessions {

  /** Assign gap-based sessions: a new session starts when the key's
    * previous event is more than `gapSeconds` older. Adds `session_id`
    * (0-based per key) to the input rows. */
  def assign(events: DataFrame, key: String, ts: String, gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(ts))
    events
      .withColumn("__prev_ts", lag(col(ts), 1).over(byKey))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_timestamp(col(ts)) - unix_timestamp(col("__prev_ts")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("__new_session")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__prev_ts", "__new_session")
  }

  /** Weekly cohort retention over an event stream: users are cohorted by
    * the epoch-week of their FIRST event; each (cohort_week, week_offset)
    * cell counts the distinct users of that cohort active `week_offset`
    * weeks later — the classic retention triangle. All date arithmetic
    * is integer epoch-day division (no timezones, no float), so the
    * result is engine-exact.
    *
    * Scale shape: one user-keyed aggregation for the first-event
    * relation (map-side combined), one equi-join back on the user key,
    * one distinct-count aggregation keyed by the (cohort, offset) cell —
    * the same plan at any user cardinality; nothing collects. */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val firsts = events
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("__first_date"))
    events.select(col(userCol), to_date(col(tsCol)).as("__d"))
      .join(firsts, Seq(userCol))
      .select(col(userCol),
        expr("datediff(__first_date, DATE'1970-01-01') div 7").as("cohort_week"),
        expr("datediff(__d, __first_date) div 7").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Per-session summary: bounds, event count, duration. */
  def summarize(events: DataFrame, key: String, ts: String, gapSeconds: Long): DataFrame =
    assign(events, key, ts, gapSeconds)
      .groupBy(col(key), col("session_id"))
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(ts))) - unix_timestamp(min(col(ts))))
          .as("duration_secs"))

  /** One closed session emitted by the streaming form. */
  case class Session(user_id: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, n_events: Long)

  /** Streaming state buffer (public: the state Encoder's generated code
    * instantiates it reflectively). */
  case class SessionState(start: Long, last: Long, n: Long)

  /** Sessionizer on the Spark 4 `transformWithState` API — the successor to
    * flatMapGroupsWithState: named state variables behind an explicit
    * handle, first-class timers (several can be live per key), and the
    * multi-column-family RocksDB state store. Sessions close when the
    * watermark drives an event-time timer past last-event + gap. A timer is
    * (re)registered per batch; stale timers are filtered in the expiry
    * callback against the current session tail. */
  class SessionProcessor(gapSeconds: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, java.sql.Timestamp), Session] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[Session] = {
      val sorted = rows.map(_._2.getTime).toList.sorted
      var closed = List.empty[Session]
      var cur = if (state.exists()) Some(state.get()) else None
      sorted.foreach { t =>
        cur match {
          // min/max merge: a late event from a later batch (above the
          // watermark, t < s.last) must extend the session, never pull its
          // tail backwards — otherwise an already-registered timer at
          // oldLast+gap would close it prematurely with a wrong end.
          case Some(s) if t - s.last <= gapSeconds * 1000 =>
            cur = Some(SessionState(
              math.min(s.start, t), math.max(s.last, t), s.n + 1))
          case Some(s) =>
            closed ::= Session(key,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        getHandle.registerTimer(s.last + gapSeconds * 1000)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      if (!state.exists()) return Iterator.empty
      val s = state.get()
      // Only the timer matching the current session tail closes it; earlier
      // timers from superseded batches are stale no-ops.
      if (expiredTimerInfo.getExpiryTimeInMs() >= s.last + gapSeconds * 1000) {
        state.clear()
        Iterator.single(Session(key,
          new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n))
      } else Iterator.empty
    }
  }

  /** Streaming sessionization via [[SessionProcessor]] — requires the
    * RocksDB state store provider (transformWithState needs multiple
    * column families; set
    * spark.sql.streaming.stateStore.providerClass=
    * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider). */
  def streamingSessionsTws(spark: SparkSession,
      events: Dataset[(Long, java.sql.Timestamp)], gapSeconds: Long): Dataset[Session] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.toDF("user_id", "ts")
      .withWatermark("ts", s"$gapSeconds seconds")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** One update from the per-type counter stream. */
  case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** MapState demo on the Spark 4 transformWithState API: per-user
    * per-event-type running counts held in a map column family — the
    * state-type surface beyond [[SessionProcessor]]'s single ValueState
    * (one RocksDB column family per state variable; per-entry point
    * lookups, no whole-map deserialization per key like the
    * flatMapGroupsWithState era). Emits the updated (type, n) pairs each
    * batch. */
  class TypeCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String), TypeCount] {
    import org.apache.spark.sql.streaming.{MapState, TimerValues, TTLConfig}

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("type_counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        timerValues: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { case (_, t) =>
        val cur = if (counts.containsKey(t)) counts.getValue(t) else 0L
        counts.updateValue(t, cur + 1L)
        touched += t
      }
      touched.iterator.map(t => TypeCount(key, t, counts.getValue(t)))
    }
  }

  /** Streaming per-user per-type counters via [[TypeCountProcessor]]
    * (requires the RocksDB state store provider, as transformWithState
    * always does). */
  def streamingTypeCounts(spark: SparkSession,
      events: Dataset[(Long, String)]): Dataset[TypeCount] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_._1)
      .transformWithState(new TypeCountProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Streaming sessionization with explicit state: sessions close when the
    * *watermark* passes last-event + gap (event-time timeout — deterministic
    * and replayable, unlike a wall-clock timeout, which in as-fast-as-
    * possible triggers also degenerates into a no-data-batch busy loop).
    * Exercises the `KeyValueGroupedDataset.flatMapGroupsWithState` path
    * (ST5). */
  def streamingSessions(spark: SparkSession, events: Dataset[(Long, java.sql.Timestamp)],
      gapSeconds: Long): Dataset[Session] = {
    import spark.implicits._
    events.toDF("user_id", "ts")
      .withWatermark("ts", s"$gapSeconds seconds")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(key,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n))
          } else {
            val sorted = rows.map(_._2.getTime).toList.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                // Same min/max merge as SessionProcessor: never move the
                // tail backwards on an out-of-order (late but above-
                // watermark) event.
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(SessionState(
                    math.min(s.start, t), math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed ::= Session(key,
                    new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }

  /** Robust per-group outlier detection by the median/MAD rule (the
    * log-analytics anomaly gate: unlike mean/stddev, one huge spike
    * cannot mask the others — breakdown point 50%). A row is an outlier
    * when |value − median| > k·MAD, evaluated EXACTLY: values go to
    * integer cents, the median to half-cents and the MAD to
    * quarter-cents (doubling before each `percentile` keeps the
    * interpolated midpoint integer-valued, hence exactly representable
    * and engine-portable), so the flag is an integer comparison —
    * `2·dev_half > k·mad_quarter` — with no float threshold anywhere.
    *
    * Scale shape: two grouped exact-percentile aggregations over the
    * group column plus broadcast joins of the group-sized stats back to
    * the stream — three narrow scans of the source, no corpus-sized
    * shuffle. Exact `percentile` buffers each GROUP's values, so use it
    * when per-group cardinality is bounded (log streams keyed by
    * sensor/type); the unbounded-group scale form is the histogram
    * sketch ([[graft.ops.Sketches]], `sketch_winsorize` precedent). */
  def robustOutliers(events: DataFrame, groupCol: String = "event_type",
      valueCol: String = "value", k: Int = 3): DataFrame = {
    val ev = events.withColumn("cents",
      expr(s"CAST(round($valueCol * 100, 0) AS LONG)"))
    val med = ev.groupBy(col(groupCol))
      .agg(expr("CAST(percentile(2 * cents, 0.5D) AS LONG)").as("med_half"))
    val dev = ev.join(broadcast(med), Seq(groupCol))
      .withColumn("dev_half", abs(expr("2 * cents - med_half")))
    val mad = dev.groupBy(col(groupCol))
      .agg(expr("CAST(percentile(2 * dev_half, 0.5D) AS LONG)")
        .as("mad_quarter"))
    dev.join(broadcast(mad), Seq(groupCol))
      .filter(expr(s"2 * dev_half > $k * mad_quarter"))
  }

  /** Per-group trimmed mean in exact cents: drop the lowest and highest
    * `num/den` fraction of each group BY RANK (deterministic
    * (cents, seqCol) order — a value-threshold trim would be ambiguous
    * on ties), average the interior. The robust central-tendency
    * companion to [[robustOutliers]]: outliers are EXCLUDED from the
    * estimate instead of flagged, which is what a per-source
    * quality-score or latency summary wants when single spikes must
    * not move the number.
    *
    * Cut arithmetic is integer — lo = (n·num) div den ranks dropped at
    * each end, keep lo < rank ≤ n − lo — and the only division is the
    * final one exact-long-sum / kept-count, so the oracle replays the
    * double bit-for-bit. One shuffle on the group, one per-group rank
    * window (never global), one combine-agg. */
  def trimmedMean(events: DataFrame, groupCol: String, valueCol: String,
      seqCol: String, num: Int = 1, den: Int = 10): DataFrame = {
    require(num >= 0 && den > 0 && 2 * num < den,
      "trim fraction must satisfy 0 <= num/den < 1/2")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__cents"), col(seqCol))
    val ranked = events
      .withColumn("__cents", expr(s"CAST(round($valueCol * 100, 0) AS LONG)"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .withColumn("__lo", expr(s"(__n * $num) div $den"))
    ranked
      .filter(col("__rn") > col("__lo") && col("__rn") <= col("__n") - col("__lo"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"), max(col("__n")).as("n_total"),
        sum(col("__cents")).as("__s"))
      .select(col(groupCol), col("n_total"), col("n_kept"),
        (col("__s") / col("n_kept")).as("trimmed_mean_cents"))
  }

  /** Half-life-decayed engagement: per (key, class), the
    * exponentially-decayed sum of cent values — recency-weighted
    * popularity / activity, the freshness signal a data-mix or
    * ranking pipeline feeds on (decayed source activity, decayed user
    * engagement, decayed URL popularity).
    *
    * Exactness: decay is quantized to WHOLE half-lives against the
    * stream's max timestamp (one-row broadcast): a row `b` half-lives
    * old contributes `(cents · unit) div 2^min(b, 40)` micro-units —
    * integer shift arithmetic only, so the oracle replays it
    * bit-exactly (the idiomatic float `0.5^(Δt/h)` is
    * order-dependent under summation and engine-divergent). The 2^40
    * cap floors contributions older than 40 half-lives to the same
    * negligible bucket instead of overflowing the shift.
    *
    * Scale shape: one scalar max-ts aggregation broadcast back
    * (one-row crossJoin), then a single map + combine-agg on the
    * (key, class) pair — no window, no per-key state; the output is
    * key-cardinality-sized. In streaming form the same arithmetic
    * merges incrementally: decayed sums age by a constant factor per
    * half-life, so a ledger of per-period sums re-weights on read
    * (the [[Sketches]] WAU/MAU ledger discipline). */
  def decayedCounts(events: DataFrame, halfLifeSeconds: Long,
      keyCols: Seq[String], tsCol: String = "ts",
      valueCol: String = "value", unit: Long = 1000000L): DataFrame = {
    require(halfLifeSeconds > 0, "halfLifeSeconds must be positive")
    val maxTs = events.agg(max(unix_timestamp(col(tsCol))).as("__tmax"))
    events.crossJoin(broadcast(maxTs))
      .withColumn("__cents",
        expr(s"CAST(round($valueCol * 100, 0) AS LONG)"))
      .withColumn("__hl", least(
        expr(s"(__tmax - unix_timestamp($tsCol)) div ${halfLifeSeconds}L"),
        lit(40L)))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(expr(s"(__cents * ${unit}L) div shiftleft(1L, CAST(__hl AS INT))"))
          .as("decayed_micro"))
  }

  /** Seasonal-naive forecast error per monitored series: the forecast
    * for each point is the value exactly `season` points earlier in its
    * group (lag-7 on daily series = "same weekday last week"), and the
    * readout is the point-wise absolute error — the standard residual
    * feed for pipeline-volume monitoring (a point whose seasonal
    * residual is huge is the anomaly; a run of them is drift, which
    * [[Sketches.cusumByGroup]] then accumulates).
    *
    * Points with no lag-`season` predecessor are dropped (no forecast
    * exists — emitting NULL would poison downstream integer arithmetic
    * and engines disagree on NULL ordering). All integer, one per-GROUP
    * lag window — groups parallelize, nothing global. */
  def seasonalNaiveError(df: DataFrame, groupCol: String, orderCol: String,
      valueCol: String, season: Int = 7): DataFrame = {
    require(season >= 1, "season must be at least 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
    df
      .withColumn("x", col(valueCol).cast("long"))
      .withColumn("forecast", lag(col("x"), season).over(w))
      .filter(col("forecast").isNotNull)
      .select(col(groupCol), col(orderCol), col("x"), col("forecast"),
        abs(col("x") - col("forecast")).as("abs_err"))
  }

  /** Per-entity inter-arrival gap statistics — exact order statistics
    * (min / median / p90 / max, seconds) over the successive-event gaps
    * of every key: the activity-cadence profile behind bot detection
    * (sub-second medians), churn scoring (exploding gaps), and session
    *-timeout calibration (the gap quantiles ARE the evidence for the
    * sessionize threshold). Keys with fewer than 2 events have no gaps
    * and are omitted.
    *
    * Exactness: median/p90 are values at ranks ⌈n/2⌉ / ⌈9n/10⌉ over the
    * (gap, seq)-total-ordered gap list — the [[trimmedMean]] /
    * robust-scale discipline. Two windows per key (event order for the
    * lag, gap order for the ranks) + one combine-agg; a key's events
    * must fit a partition sort, the usual exact-percentile posture. */
  def interArrivalStats(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", seqCol: String = "event_id"): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val byTime = W.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    val gaps = events
      .withColumn("__t", unix_timestamp(col(tsCol)))
      .withColumn("gap_s", col("__t") - lag(col("__t"), 1).over(byTime))
      .filter(col("gap_s").isNotNull)
    val byGap = W.partitionBy(col(keyCol)).orderBy(col("gap_s"), col(seqCol))
    gaps
      .withColumn("__rk", row_number().over(byGap))
      .withColumn("__n", count(lit(1)).over(W.partitionBy(col(keyCol))))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_s")).as("min_gap_s"),
        max(when(expr("__rk = (__n + 1) div 2"), col("gap_s")))
          .as("median_gap_s"),
        max(when(expr("__rk = (9 * __n + 9) div 10"), col("gap_s")))
          .as("p90_gap_s"),
        max(col("gap_s")).as("max_gap_s"))
  }

  /** Per-key Theil–Sen robust trend: the (lower-)median of all pairwise
    * slopes between a key's (ts, value) points, in integer micro
    * cents-per-second — the outlier-immune alternative to least-squares
    * for monitoring series (Theil 1950 / Sen 1968; breakdown point 29%).
    *
    * Exactness: slopes are quantized to micro units on computation
    * ((10¹² · Δcents) div Δµs — both engines' truncating integer
    * division), so the rank-median over the slope multiset is
    * engine-identical; the value at a rank of a multiset is
    * deterministic regardless of tie permutation. Same-timestamp pairs
    * carry no slope and are excluded.
    *
    * Scale: the pair build is a self-equi-join on the key (one shuffle);
    * pairs are Θ(n²) per key, so `maxPointsPerGroup` drops hotter keys
    * (capBuckets-style; they surface with n_pairs = 0) — at production
    * scale a bounded uniform sample per key is the standard estimator
    * and composes in front. */
  def theilSenSlope(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value",
      maxPointsPerGroup: Int = 100000): DataFrame = {
    val e = events.select(col(keyCol).as("k"),
      unix_micros(col(tsCol)).as("t"), graft.T.cents(col(valCol)).as("v"))
    val capped = Dedup.capBuckets(e, Seq("k"), maxPointsPerGroup)
    val a = capped.select(col("k"), col("t").as("ta"), col("v").as("va"))
    val b = capped.select(col("k"), col("t").as("tb"), col("v").as("vb"))
    val pr = a.join(b, Seq("k")).filter(col("ta") < col("tb"))
      .select(col("k"),
        expr("(1000000000000 * (vb - va)) div (tb - ta)").as("s"))
    val med = pr
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("s"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("k"))))
      .filter(col("__rn") === expr("(__n + 1) div 2"))
      .groupBy(col("k"))
      .agg(max(col("__n")).as("n_pairs"), max(col("s")).as("slope_micro"))
    e.groupBy(col("k")).agg(count(lit(1)).as("n_points"))
      .join(med, Seq("k"), "left")
      .select(col("k").as(keyCol), col("n_points"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("slope_micro"), lit(0L)).as("slope_micro"))
  }

  /** Per-key Mann–Kendall trend test (Mann 1945 / Kendall's τ; the
    * standard non-parametric "is this series trending" companion to
    * [[theilSenSlope]] — same pair relation, hypothesis test instead of
    * slope estimate):
    *
    *   S = Σ_{i<j} sgn(v_j − v_i)   (pairs ordered by t, strict)
    *   var18 = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)   (= 18·Var(S),
    *     tie-corrected over the value-tie groups g)
    *
    * and the two-sided normal-approximation significance at z_c
    * (micro): significant ⟺ 18·S²·10¹² > z_c²·var18 — an exact
    * cross-multiplied integer comparison, no square root, no float
    * (the UNCORRECTED z statistic; the ±1 continuity correction is
    * omitted and that is the operator's definition, so both engines
    * agree bit-for-bit). All-tied series have var18 = 0 and are never
    * significant.
    *
    * Scale: identical posture to [[theilSenSlope]] — the pair build is
    * a per-key self-equi-join (Θ(n²) per key), `maxPointsPerGroup`
    * drops hotter keys loudly via [[Dedup.capBuckets]]; monitoring
    * series are hours/days long, not corpus-sized.
    *
    * Precondition (ENFORCED in-plan, ADVICE r14): one observation per
    * (key, ts). The pair relation is strict in time (ta < tb), so a
    * duplicated timestamp would silently drop its pairs from S while
    * n_points (and hence var18) still counted both rows — a
    * miscalibrated test, not a defined variant. Callers with multiple
    * events per instant must pre-aggregate to a bucketed series first
    * (the `event_mann_kendall` registry query's daily-sum posture);
    * this operator raises with the offending key otherwise. */
  def mannKendall(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value",
      zCritMicro: Long = 1959964L,
      maxPointsPerGroup: Int = 100000): DataFrame = {
    require(zCritMicro > 0L, "zCritMicro must be positive")
    val dec = "DECIMAL(38,0)"
    val e = events.select(col(keyCol).as("k"),
      unix_micros(col(tsCol)).as("t"), graft.T.cents(col(valCol)).as("v"))
    val capped = Dedup.capBuckets(e, Seq("k"), maxPointsPerGroup)
      .localCheckpoint(false) // pairs (twice), n, and tie groups
    val a = capped.select(col("k"), col("t").as("ta"), col("v").as("va"))
    val b = capped.select(col("k"), col("t").as("tb"), col("v").as("vb"))
    val s = a.join(b, Seq("k")).filter(col("ta") < col("tb"))
      .groupBy(col("k"))
      // pure integer sign, not signum() — no double anywhere
      .agg(sum(when(col("vb") > col("va"), 1L)
        .when(col("vb") < col("va"), -1L).otherwise(0L)).as("s_stat"))
    val ties = capped.groupBy(col("k"), col("v"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col("k"))
      .agg(sum(expr("__t * (__t - 1) * (2 * __t + 5)")).as("__tie18"))
    capped.groupBy(col("k"))
      .agg(count(lit(1)).as("n_points"),
        countDistinct(col("t")).as("__nts"))
      // unique-timestamp precondition (scaladoc): loud, names the key
      .withColumn("n_points", when(col("__nts") < col("n_points"),
        raise_error(concat(lit("mannKendall: duplicate timestamps for key '"),
          col("k").cast("string"),
          lit("' — pre-aggregate to one value per (key, ts) first")))
          .cast("long"))
        .otherwise(col("n_points")))
      .drop("__nts")
      .join(s, Seq("k"), "left")
      .join(ties, Seq("k"), "left")
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("var18", expr(
        "n_points * (n_points - 1) * (2 * n_points + 5)")
        - coalesce(col("__tie18"), lit(0L)))
      .withColumn("trend",
        when(col("s_stat") > 0L, lit("increasing"))
          .when(col("s_stat") < 0L, lit("decreasing"))
          .otherwise(lit("none")))
      .withColumn("significant", expr(
        s"""CAST(18 AS $dec) * s_stat * s_stat * 1000000000000
           | > CAST($zCritMicro AS $dec) * $zCritMicro * var18""".stripMargin))
      .select(col("k").as(keyCol), col("n_points"), col("s_stat"),
        col("var18"), col("trend"), col("significant"))
  }

  /** Holt linear-trend exponential smoothing (Holt 1957 / the
    * double-exponential member of the ETS family) per group, with
    * α = 1/5, β = 1/10 as exact rationals:
    *
    *   l_t = ⌊(x_t·U + 4·(l + b)) / 5⌋      (l₀ = x₁·U, b₀ = 0)
    *   b_t = ⌊((l_t − l) + 9·b) / 10⌋
    *   forecast(h) = l_n + h·b_n
    *
    * in micro units U = 10⁶, plus the one-step-ahead sum of absolute
    * errors (the in-sample fit readout). Every division is floored via
    * the +k·BIG offset (numerators made positive first, so Spark's
    * truncating `div` and DuckDB's flooring `//` agree even when the
    * trend drives (l + b) negative); |l + b| < BIG/4 = 2.5·10¹⁴ micro
    * is the documented envelope (counts to ~10⁸/step — beyond it,
    * lower `unit`).
    *
    * The recursion is inherently sequential per series, so it runs as
    * ONE codegen'd `aggregate` fold over the sorted per-group value
    * array — the bounded-array pattern (monitoring series are
    * days/hours long, not corpus-sized): a map-side combine builds the
    * (order, value) array per group, the fold is pure expression work,
    * and nothing but group rows ever shuffles. The DuckDB oracle
    * replays the identical trajectory with a recursive CTE.
    *
    * `maxPointsPerGroup` is the hot-key guard (the [[theilSenSlope]]
    * pattern, VERDICT r12 item 4): a key holding more rows than any
    * real monitoring series should (a skew bug, an id collision) would
    * otherwise materialize ONE giant collect_list row. Hotter keys are
    * excluded from the fold and surface loudly with their true
    * n_points and all-zero level/trend/mae/forecasts — never a silent
    * drop, never an unbounded array. */
  def holtLinearForecast(series: DataFrame, groupCols: Seq[String],
      orderCol: String, valueCol: String, horizons: Int = 3,
      unit: Long = 1000000L, big: Long = 1000000000000000L,
      maxPointsPerGroup: Int = 100000): DataFrame = {
    require(horizons >= 1 && unit > 0 && big > 0,
      "need horizons >= 1 and positive unit/big")
    val gs = groupCols.map(col)
    val projected = series.select(
      (groupCols.map(col) :+ col(orderCol) :+ col(valueCol)): _*)
    val packed = Dedup.capBuckets(projected, groupCols, maxPointsPerGroup)
      .groupBy(gs: _*)
      .agg(transform(
        sort_array(collect_list(struct(col(orderCol).as("o"),
          col(valueCol).cast("long").as("x")))),
        s => s.getField("x")).as("__xs"))
    val lStep = s"(x * ${unit}L + 4L * (acc.l + acc.b) + 5L * ${big}L) " +
      s"div 5L - ${big}L"
    val folded = packed.withColumn("__st", expr(
      s"""aggregate(__xs,
         |  named_struct('n', 0L, 'l', 0L, 'b', 0L, 'sae', 0L),
         |  (acc, x) -> CASE WHEN acc.n = 0L
         |    THEN named_struct('n', 1L, 'l', x * ${unit}L, 'b', 0L,
         |      'sae', 0L)
         |    ELSE named_struct('n', acc.n + 1L,
         |      'l', $lStep,
         |      'b', ((($lStep) - acc.l) + 9L * acc.b + 10L * ${big}L)
         |        div 10L - ${big}L,
         |      'sae', acc.sae + abs(x * ${unit}L - (acc.l + acc.b)))
         |    END)""".stripMargin))
    val fcs = (1 to horizons).map(h =>
      expr(s"__st.l + ${h}L * __st.b").as(s"fc${h}_micro"))
    val stats = folded.select(gs ++ Seq(
      expr("__st.l").as("level_micro"),
      expr("__st.b").as("trend_micro"),
      expr(s"CASE WHEN __st.n > 1 THEN __st.sae div (__st.n - 1) " +
        "ELSE 0L END").as("mae_micro")) ++ fcs: _*)
    // n_points comes from the UNCAPPED relation so capped-out hot keys
    // surface (true count, zeroed stats) instead of vanishing
    val statCols = Seq("level_micro", "trend_micro", "mae_micro") ++
      (1 to horizons).map(h => s"fc${h}_micro")
    projected.groupBy(gs: _*).agg(count(lit(1)).as("n_points"))
      .join(stats, groupCols, "left")
      .select(gs ++ (col("n_points") +:
        statCols.map(c => coalesce(col(c), lit(0L)).as(c))): _*)
  }

  /** Per-group sample autocorrelation (ACF) of the event-count series at
    * lags 1..`maxLag` — the seasonality/burstiness readout that picks
    * the `season` for [[seasonalNaiveError]] and flags periodic bot
    * traffic (a strong r at lag 24 on an hourly grid IS the diurnal
    * cycle). Events bucket to a fixed `bucketSeconds` grid; the grid is
    * densified (missing buckets count 0 — the statistics are over time,
    * not over observed rows), and for the count series x₀..xₙ₋₁ with
    * S = Σx the standard estimator
    *
    *   r_k = Σ_{t<n−k} (x_t−x̄)(x_{t+k}−x̄) / Σ_t (x_t−x̄)²
    *
    * is computed exactly by multiplying through by n²: both sums use the
    * all-integer centered terms (n·x_t − S), so r_micro is one
    * sign-split integral division — bit-identical in both engines.
    * Products ride DECIMAL(38,0) (n·x up to ~10¹⁴ squared exceeds Long;
    * the [[graft.ops.Preference]] envelope discipline).
    *
    * Scale shape: one combine-agg to (group, bucket) counts, a
    * group-keyed dense-grid left join, then ONE group-partitioned
    * window pass computing every lag via `lead` — the lagged products
    * Σ_{t<n−k} c_t·c_{t+k} and the denominator Σc² come out of a
    * single aggregation (lead(c, k) is NULL past the series end, so
    * the sum's t < n−k bound falls out of null-skipping). The window
    * is over the densified TIME grid, never the corpus: grid length
    * per group is time-bounded (hours in a decade ≈ 87k); `maxGrid`
    * fails loudly in-plan (raise_error, the [[graft.ops.Intervals]]
    * discipline) if a timestamp outlier would explode it. (The
    * previous form localCheckpointed the grid and self-joined it per
    * lag — one materialization plus maxLag join passes where one
    * in-partition sorted scan suffices; r16 optimization, identical
    * values.) Non-negative timestamps are the envelope (bucket floor
    * vs trunc division). */
  def autocorrelation(events: DataFrame, maxLag: Int = 4,
      groupCol: String = "event_type", tsCol: String = "ts",
      bucketSeconds: Long = 3600L, maxGrid: Long = 200000L): DataFrame = {
    require(maxLag >= 1 && bucketSeconds > 0 && maxGrid >= 2,
      "need maxLag >= 1 and positive bucketSeconds/maxGrid")
    val dec = "DECIMAL(38,0)"
    val counts = events
      .select(col(groupCol).as("g"),
        expr(s"unix_timestamp($tsCol) div ${bucketSeconds}L").as("h"))
      .groupBy(col("g"), col("h"))
      .agg(count(lit(1)).as("x"))
    val span = counts.groupBy(col("g"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"),
        sum(col("x")).as("s"))
      .withColumn("n", expr(
        s"""CASE WHEN h1 - h0 + 1 > ${maxGrid}L THEN raise_error(concat(
           |  'autocorrelation: group ', CAST(g AS STRING), ' spans ',
           |  CAST(h1 - h0 + 1 AS STRING), ' buckets > maxGrid=$maxGrid —
           | a timestamp outlier would explode the densified grid; raise
           | maxGrid only deliberately'))
           |ELSE h1 - h0 + 1 END""".stripMargin))
    val dense = span
      .select(col("g"), col("n"), col("s"), col("h0"),
        explode(expr("sequence(h0, h1)")).as("h"))
      .join(counts, Seq("g", "h"), "left")
      .select(col("g"), col("n"), (col("h") - col("h0")).as("t"),
        expr(s"CAST(n AS $dec) * coalesce(x, 0L) - s").as("c"))
    val w = Window.partitionBy(col("g")).orderBy(col("t"))
    val led = (1 to maxLag).foldLeft(dense) { (df, k) =>
      df.withColumn(s"__c$k", lead(col("c"), k).over(w))
    }
    val aggCols = Seq(max(col("n")).as("n"),
      sum(expr(s"CAST(c * c AS $dec)")).as("d")) ++
      (1 to maxLag).map(k =>
        sum(expr(s"CAST(c * __c$k AS $dec)")).as(s"__num$k"))
    val agg = led.groupBy(col("g")).agg(aggCols.head, aggCols.tail: _*)
    val lagRows = (1 to maxLag).map(k =>
      struct(lit(k.toLong).as("lag"),
        coalesce(col(s"__num$k"), lit(0L).cast(dec)).as("num")))
    agg
      .select(col("g"), col("n"), col("d"),
        explode(array(lagRows: _*)).as("__l"))
      // a lag with no pair (grid shorter than the lag) emitted NO row in
      // the join form — preserve that row set exactly
      .filter(col("__l.lag") < col("n"))
      .select(col("g").as(groupCol), col("__l.lag").as("lag"), col("n"),
        expr("""CAST(CASE WHEN d = 0 THEN 0
               |  WHEN __l.num >= 0 THEN (__l.num * 1000000) div d
               |  ELSE -((-__l.num * 1000000) div d) END AS BIGINT)""".stripMargin)
          .as("acf_micro"))
  }

  /** Per-group Fano factor (index of dispersion) of the bucket-count
    * series — the burstiness scalar (Poisson arrivals ⇒ F ≈ 1;
    * F ≫ 1 = bursty/bot-like, F < 1 = regular/throttled; the companion
    * readout to [[autocorrelation]]'s periodicity). Over the SAME
    * densified grid (missing buckets count 0 — dispersion is over
    * time): with S = Σx, Q = Σx², n grid buckets,
    *
    *   F = var/mean = (n·Q − S²) / (n·S)
    *
    * — one multiplied-through sign-free integral division in micro
    * (numerator ≥ 0 by Cauchy–Schwarz, S > 0 whenever the group has an
    * event). Products ride DECIMAL(38,0); the same `maxGrid` loud
    * guard. The densified grid never materializes: missing buckets
    * contribute x = 0 to BOTH S and Q, so only the grid LENGTH
    * n = h1 − h0 + 1 enters the formula — two chained combine-aggs
    * over observed buckets, no explode, no join (r16 optimization of
    * the explode+join form; identical values). */
  def fanoFactor(events: DataFrame, groupCol: String = "event_type",
      tsCol: String = "ts", bucketSeconds: Long = 3600L,
      maxGrid: Long = 200000L): DataFrame = {
    require(bucketSeconds > 0 && maxGrid >= 2, "bad bucketSeconds/maxGrid")
    val dec = "DECIMAL(38,0)"
    val counts = events
      .select(col(groupCol).as("g"),
        expr(s"unix_timestamp($tsCol) div ${bucketSeconds}L").as("h"))
      .groupBy(col("g"), col("h"))
      .agg(count(lit(1)).as("x"))
    counts.groupBy(col("g"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"),
        sum(col("x")).as("s"),
        sum(expr(s"CAST(x AS $dec) * x")).as("q"))
      .withColumn("n", expr(
        s"""CASE WHEN h1 - h0 + 1 > ${maxGrid}L THEN raise_error(concat(
           |  'fanoFactor: group ', CAST(g AS STRING), ' spans ',
           |  CAST(h1 - h0 + 1 AS STRING), ' buckets > maxGrid=$maxGrid'))
           |ELSE h1 - h0 + 1 END""".stripMargin))
      .select(col("g").as(groupCol), col("n"), col("s").as("n_events"),
        expr(s"""CAST(CASE WHEN s = 0 THEN 0 ELSE
                |  (CAST(n AS $dec) * q - CAST(s AS $dec) * s) * 1000000
                |    div (CAST(n AS $dec) * s) END AS BIGINT)"""
          .stripMargin).as("fano_micro"))
  }

  /** Sign-split micro product (a·b)/10⁶ — every operand |·| ≤ ~10⁶ so
    * the Long product is safe; magnitude-then-sign keeps truncating and
    * flooring builds identical. Rendered for Spark (`div`) or DuckDB
    * (`//`) by [[pacfExprs]]' caller. */
  private[graft] def mulm(a: String, b: String, d: String): String =
    s"""(CASE WHEN (($a) >= 0) = (($b) >= 0)
       |  THEN (abs($a) * abs($b)) $d 1000000
       |  ELSE -((abs($a) * abs($b)) $d 1000000) END)""".stripMargin
       .replaceAll("\\s+", " ")

  /** Sign-split micro division (n·10⁶)/den, 0 on a zero denominator. */
  private[graft] def divm(n: String, den: String, d: String): String =
    s"""(CASE WHEN ($den) = 0 THEN 0
       |  WHEN (($n) >= 0) = (($den) >= 0)
       |  THEN (abs($n) * 1000000) $d abs($den)
       |  ELSE -((abs($n) * 1000000) $d abs($den)) END)""".stripMargin
       .replaceAll("\\s+", " ")

  /** The Durbin–Levinson closed forms for PACF lags 1..3 over micro ACF
    * columns r1, r2, r3 — shared verbatim (modulo the integral-divide
    * token) between the Spark plan and the DuckDB oracle:
    *   φ11 = r1
    *   φ22 = (r2 − r1²) / (1 − r1²)
    *   a21 = r1 − φ22·r1
    *   φ33 = (r3 − a21·r2 − φ22·r1) / (1 − a21·r1 − φ22·r2)
    * every product/division the sign-split micro kernel above — the
    * per-step quantization IS the definition. Returns the SQL for
    * (pacf1, pacf2, pacf3, a21-free). */
  private[graft] def pacfExprs(d: String): (String, String, String) = {
    val p22 = divm(s"r2 - ${mulm("r1", "r1", d)}",
      s"1000000 - ${mulm("r1", "r1", d)}", d)
    val a21 = s"(r1 - ${mulm("p22", "r1", d)})"
    val p33 = divm(
      s"r3 - ${mulm("a21", "r2", d)} - ${mulm("p22", "r1", d)}",
      s"1000000 - ${mulm("a21", "r1", d)} - ${mulm("p22", "r2", d)}", d)
    (p22, a21, p33)
  }

  /** Partial autocorrelation at lags 1..3 per group — the AR-order
    * readout that separates direct from inherited correlation (an AR(1)
    * process has PACF ≈ 0 past lag 1 even though its ACF decays slowly;
    * a spike at lag k says "this lag carries NEW signal" — the
    * Box–Jenkins identification step on the event stream). Computed by
    * the exact Durbin–Levinson closed forms over the
    * [[autocorrelation]] micro values ([[pacfExprs]]); lags whose ACF
    * row is missing (grid shorter than the lag) coalesce to 0.
    *
    * Scale shape: [[autocorrelation]]'s one combine-agg + lag join,
    * then a groups-sized pivot and pure per-row arithmetic. */
  def partialAutocorrelation(events: DataFrame,
      groupCol: String = "event_type", tsCol: String = "ts",
      bucketSeconds: Long = 3600L, maxGrid: Long = 200000L): DataFrame = {
    val acf = autocorrelation(events, maxLag = 3, groupCol, tsCol,
      bucketSeconds, maxGrid)
    val base = acf.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        coalesce(max(when(col("lag") === 1L, col("acf_micro"))), lit(0L))
          .as("r1"),
        coalesce(max(when(col("lag") === 2L, col("acf_micro"))), lit(0L))
          .as("r2"),
        coalesce(max(when(col("lag") === 3L, col("acf_micro"))), lit(0L))
          .as("r3"))
    val (p22, a21, p33) = pacfExprs("div")
    base
      .withColumn("p22", expr(p22))
      .withColumn("a21", expr(a21))
      .select(col(groupCol), col("n"), col("r1").as("pacf1_micro"),
        col("p22").as("pacf2_micro"), expr(p33).as("pacf3_micro"))
  }
}
