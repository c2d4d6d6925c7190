package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-funnel analytics over an arbitrary ordered stage list.
  *
  * The reference has no event analytics (its `events` are CRUD row
  * mutations); this is a pipeline extension in the [[Temporal]] spirit:
  * a declarative plan whose shuffle structure survives a 100× scale-up.
  * Generalizes the fixed view→click→purchase query shape to any stage
  * sequence.
  */
object Events {

  /** Ordered funnel: for each user, stage k's timestamp is the EARLIEST
    * event of stage k's type at-or-after the user's stage k−1 timestamp.
    * Returns one row per user who reached stage 1 with a `<stage>_ts`
    * column per stage (null once the funnel is abandoned) and `stage`,
    * the number of stages reached (≥ 1; later stages are null whenever
    * an earlier one is, by construction).
    *
    * Plan shape (pinned in PlanShapeSpec for the 3-stage instance): one
    * per-user min-reduction per stage, chained by equi-joins on the user
    * key — each reduction is map-side combinable with O(1) state per
    * user, so a whale user costs a scan, never a per-user
    * `collect_list` buffer or a ranking window.
    */
  def funnel(
      events: DataFrame,
      stages: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage required")
    require(stages.distinct.size == stages.size,
      s"duplicate stage names: ${stages.mkString(", ")}")
    val first = events.where(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"${stages.head}_ts"))
    val reached = stages.tail
      .scanLeft(first -> s"${stages.head}_ts") { case ((after, afterCol), typ) =>
        events.where(col(typeCol) === typ)
          .join(after, Seq(userCol))
          .where(col(tsCol) >= col(afterCol))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"${typ}_ts")) ->
          s"${typ}_ts"
      }
      .map { case (df, _) => df }
    val joined = reached.tail
      .foldLeft(reached.head)((acc, f) => acc.join(f, Seq(userCol), "left_outer"))
    val stageCount = stages.tail.foldLeft(lit(1)) { (acc, typ) =>
      acc + when(col(s"${typ}_ts").isNotNull, 1).otherwise(0)
    }
    joined.select(
      col(userCol) +: stages.map(t => col(s"${t}_ts")) :+ stageCount.as("stage"): _*)
  }

  /** Volume-anomaly detection: flag time windows whose event count sits
    * more than `sigmas` standard deviations above that event type's
    * per-window mean — the traffic-spike / ingest-stall monitor a
    * pipeline runs over its own event log. Returns
    * `(event_type, window_start, n, z)` for flagged windows only.
    *
    * Determinism: moments come from EXACT integer sums (`Σn`, `Σn²` over
    * long counts — partition-order-independent), and mean/variance/z are
    * fixed double expressions over those sums, so every engine computes
    * identical bits (the oracle replays the same formula). A type whose
    * windows all tie (variance 0) flags nothing.
    *
    * Scale: one shuffle for the (window, type) count (map-side
    * combinable), a per-type second-moment aggregate (rows = types ×
    * windows, already tiny), and a broadcast join back — nothing after
    * the first aggregate is proportional to the event count. */
  def anomalousWindows(
      events: DataFrame,
      ts: Column,
      eventType: Column,
      windowDur: String = "1 hour",
      sigmas: Double = 2.0): DataFrame = {
    val counts = events
      .groupBy(window(ts, windowDur).as("__w"), eventType.as("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = counts.groupBy(col("event_type"))
      .agg(count(lit(1)).as("__nw"), sum(col("n")).as("__s1"),
        sum(col("n") * col("n")).as("__s2"))
      .withColumn("__mean", col("__s1").cast("double") / col("__nw"))
      .withColumn("__var",
        (col("__s2").cast("double") - col("__s1").cast("double") * col("__s1") / col("__nw"))
          / col("__nw"))
      .select(col("event_type"), col("__mean"), col("__var"))
    counts.join(broadcast(stats), Seq("event_type"))
      .where(col("__var") > 0 &&
        col("n") > col("__mean") + lit(sigmas) * sqrt(col("__var")))
      .select(col("event_type"), col("__w.start").as("window_start"),
        col("n"), ((col("n") - col("__mean")) / sqrt(col("__var"))).as("z"))
  }

  /** Deterministic per-key event cap — the rate-limit / bot-throttle
    * pass of an event pipeline: within each `keys` group, keep the
    * first `k` rows by `order` (which must be a total order — include
    * a unique id — or the kept set is nondeterministic). Emits the
    * surviving rows with their 1-based `rn`.
    *
    * Scale: a ranking window PARTITIONED by the cap keys. That is the
    * safe kind of window — state is one group, and cap keys are by
    * construction fine-grained (user × day); the banned shape is the
    * partition-less global rank (PlanShapeSpec's hygiene sweep). A
    * whale key's cost is its own sort, bounded by one key-day. */
  def capPerKey(
      events: DataFrame,
      keys: Seq[Column],
      order: Seq[Column],
      k: Int): DataFrame = {
    require(k > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(order: _*)
    events.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .withColumn("rn", col("__rn").cast("int"))
      .drop("__rn")
  }

  /** Two-arm A/B conversion report with the two-proportion z statistic:
    * per arm, exposed-user and converted-user counts and the conversion
    * rate; plus lift (`rate_b − rate_a`) and
    * `z = lift / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))` with p̂ the pooled rate —
    * the standard large-sample significance test for proportions.
    *
    * `variant` must map each user to arm 0 or 1 as a pure function of
    * the USER (e.g. `user_id % 2` — a per-event expression would let one
    * user straddle arms); null-user events are excluded (they carry no
    * assignable identity). A user converts if ANY of their events
    * satisfies `converted`.
    *
    * Scale: one per-user max-reduction (map-side combinable, O(1) state
    * per user — a whale user costs a scan), then a 2-row arm aggregate
    * folded to one row: nothing after the first shuffle is proportional
    * to the event count. Every derived double divides/multiplies exact
    * integer counts in a fixed operation order, so the statistic is
    * partition-order-independent and oracle-exact (sqrt is
    * IEEE-correctly-rounded in any engine). */
  def abTest(
      events: DataFrame,
      variant: Column,
      converted: Column,
      userCol: String = "user_id"): DataFrame = {
    val perUser = events
      .where(col(userCol).isNotNull)
      .groupBy(col(userCol))
      .agg(max(when(converted, 1L).otherwise(0L)).as("__conv"))
      .select(variant.as("__v"), col("__conv"))
    val arms = perUser.groupBy(col("__v"))
      .agg(count(lit(1)).as("__n"), sum(col("__conv")).as("__c"))
    val wide = arms.agg(
      max(when(col("__v") === 0, col("__n"))).as("n_a"),
      max(when(col("__v") === 0, col("__c"))).as("conv_a"),
      max(when(col("__v") === 1, col("__n"))).as("n_b"),
      max(when(col("__v") === 1, col("__c"))).as("conv_b"))
    val ra = col("conv_a").cast("double") / col("n_a")
    val rb = col("conv_b").cast("double") / col("n_b")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    // degenerate experiments (pooled rate exactly 0 or 1) have zero
    // standard error: the statistic is undefined -> null, not a crash
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    wide.select(
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      ra.as("rate_a"), rb.as("rate_b"), (rb - ra).as("lift"),
      when(se =!= 0.0, (rb - ra) / se).as("z"))
  }

  /** Stationary distribution of the user-journey Markov chain: where
    * does a long random walk over the event-type transition graph spend
    * its time — the single-number-per-state summary behind "which state
    * dominates the product's steady state" dashboards.
    *
    * Scale shape: the transition COUNTING is the distributed part (one
    * per-user window + one (from, to) aggregation — both map-side
    * combinable, state bounded by the type vocabulary squared); the
    * matrix itself is model-bounded, so per the small-support-model
    * rule it is collected and the `iters` power iterations run as plain
    * driver arithmetic — never a join, never `iters` Spark jobs.
    *
    * Determinism contract (what makes the result oracle-exact): states
    * ordered by code point (ASCII-safe; supplementary-plane state names
    * would need code-point compare — the BPE-oracle caveat), uniform
    * start `1/n`, row with no outgoing transitions → uniform row, and
    * every double op in a fixed order: `P[i][j] = cnt/rowsum` (both
    * cast from exact longs), `x'[j] = fold_i(0.0, acc + x[i]·P[i][j])`
    * ascending in i. The oracle unrolls the same `iters` steps as
    * MATERIALIZED CTE list folds. */
  def stationaryDistribution(
      events: DataFrame,
      iters: Int = 12,
      userCol: String = "user_id"): DataFrame =
    stationaryFromCounts(transitionCounts(events, userCol), iters)

  /** The event-type transition-COUNT matrix `(from_type, to_type, n)` —
    * the distributed half of the Markov machinery, split out (r15) so a
    * session can fit the matrix once and serve every consumer
    * ([[stationaryFromCounts]], the argmax predictor, the share
    * matrix). One per-user lead window + one map-side-combinable
    * aggregate; output bounded by the type vocabulary squared. */
  def transitionCounts(events: DataFrame,
      userCol: String = "user_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("ts"), col("event_id"))
    events
      .where(col(userCol).isNotNull)
      .withColumn("__to", lead(col("event_type"), 1).over(w))
      .where(col("__to").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** [[stationaryDistribution]]'s driver half over a pre-computed
    * `(from_type, to_type, n)` counts frame (exact longs). Same
    * determinism contract as the scaladoc above — this IS the code path
    * stationaryDistribution always ran; only the counting moved. */
  def stationaryFromCounts(counts: DataFrame, iters: Int = 12): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val spark = counts.sparkSession
    val cells = counts.select(col("from_type"), col("to_type"), col("n"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val types = cells.keysIterator
      .flatMap { case (a, b) => Iterator(a, b) }.toSeq.distinct.sorted
    val n = types.length
    require(n > 0, "no transitions in the event log")
    val rowSums = types.map(f =>
      types.iterator.map(t => cells.getOrElse((f, t), 0L)).sum)
    val p = types.indices.map { i =>
      types.indices.map { j =>
        if (rowSums(i) == 0L) 1.0 / n.toDouble
        else cells.getOrElse((types(i), types(j)), 0L).toDouble /
          rowSums(i).toDouble
      }
    }
    var x: IndexedSeq[Double] = IndexedSeq.fill(n)(1.0 / n.toDouble)
    for (_ <- 0 until iters)
      x = (0 until n).map(j =>
        (0 until n).foldLeft(0.0)((acc, i) => acc + x(i) * p(i)(j)))
    import spark.implicits._
    types.zip(x).toDF("event_type", "prob")
  }

  /** Holt linear-trend forecast of the daily event volume — the
    * capacity-planning dual of [[anomalousWindows]] ("where is traffic
    * heading", not "where did it spike").
    *
    * Scale shape: ONE distributed day-count aggregation (map-side
    * combinable); the day series is model-bounded (one row per day), so
    * the smoothing recursion runs as driver arithmetic
    * (small-support-model rule).
    *
    * Determinism contract: the smoothing coefficients are pinned DYADIC
    * (α = 0.5, β = 0.25) — exactly representable doubles, so unlike a
    * general (α, β) the recursion has no literal-precision hazard; the
    * recursion `l ← α·y + (1−α)(l+b); b ← β·(l−l_prev) + (1−β)·b` runs
    * in one fixed operand order and the oracle replays it as a
    * `list_reduce` fold with the state packed as `[l, b]` (the new `l`
    * recomputed inline — pure expression, identical bits). Initial
    * state: `l₀ = y₀, b₀ = y₁ − y₀` (needs ≥ 2 days). */
  def holtForecast(events: DataFrame, horizon: Int = 7): DataFrame = {
    require(horizon > 0, "horizon must be positive")
    val spark = events.sparkSession
    // day INDEX by integer floor division so calendar gaps are explicit:
    // a zero-event day (the outage the forecast exists to see) must
    // contribute y = 0, not silently vanish from the series — and
    // `horizon` must mean calendar days, not observed days
    val byDay = events
      .select(expr("unix_micros(ts) DIV 86400000000").as("__d"))
      .groupBy(col("__d")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(byDay.nonEmpty, "empty event log")
    val (dMin, dMax) = (byDay.keys.min, byDay.keys.max)
    val ys = (dMin to dMax).map(d => byDay.getOrElse(d, 0L).toDouble)
    require(ys.length >= 2, s"need >= 2 days of data, got ${ys.length}")
    var l = ys(0)
    var b = ys(1) - ys(0)
    for (t <- 1 until ys.length) {
      val lPrev = l
      l = 0.5 * ys(t) + 0.5 * (lPrev + b)
      b = 0.25 * (l - lPrev) + 0.75 * b
    }
    import spark.implicits._
    (1 to horizon).map(h => (h, l + h.toDouble * b))
      .toDF("horizon", "forecast")
  }

  /** Holt–Winters additive seasonal forecast of the daily event volume
    * — the seasonality-aware extension of [[holtForecast]] that
    * [[dailyAcf]]'s lag-7 spike says the traffic needs (a trend-only
    * model forecasts Wednesday's volume for Sunday).
    *
    * Scale shape: identical to [[holtForecast]] — ONE distributed
    * day-count aggregation, then the recursion runs on the
    * span-bounded series as driver arithmetic.
    *
    * Determinism contract: dyadic coefficients (α = 0.5, β = γ = 0.25);
    * init `l₀ = mean(y₀..y₆)`, `b₀ = (mean(y₇..y₁₃) − mean(y₀..y₆))/7`,
    * `sᵢ = yᵢ − l₀` — every mean a left-fold sum then one division,
    * the exact operand order the oracle's `list_reduce` replays. The
    * seasonal state ROTATES (consume head, append tail) so the factor
    * due at step t is always the head — index-free, which is what
    * makes the oracle's list-fold formulation possible. Needs ≥ 2
    * seasons (14 days) of data. */
  def holtWintersForecast(events: DataFrame, horizon: Int = 7,
      period: Int = 7): DataFrame =
    holtWintersFromDayCounts(dayCounts(events), horizon, period)

  /** [[holtWintersForecast]] over a pre-aggregated `(d, y)` day-count
    * frame — the read side of the streaming day-count fold. */
  def holtWintersFromDayCounts(byDayDf: DataFrame, horizon: Int = 7,
      period: Int = 7): DataFrame = {
    require(horizon > 0, "horizon must be positive")
    require(period > 1, "period must be > 1")
    val spark = byDayDf.sparkSession
    import spark.implicits._
    val byDay = byDayDf.select(col("d"), col("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // SHORT-SPAN CONVENTION (both engines): a series shorter than two
    // seasons has no fittable seasonal state — return an EMPTY frame
    // ("no forecast yet"), never throw: a monitoring query must not
    // crash a session because the corpus is young. The oracle gates the
    // same way (its init CTE emits zero rows when len(y) < 2·period).
    if (byDay.isEmpty) return Seq.empty[(Int, Double)].toDF("horizon", "forecast")
    val (dMin, dMax) = (byDay.keys.min, byDay.keys.max)
    val ys = (dMin to dMax).map(d => byDay.getOrElse(d, 0L).toDouble)
    if (ys.length < 2 * period)
      return Seq.empty[(Int, Double)].toDF("horizon", "forecast")
    val mean1 = ys.take(period).foldLeft(0.0)(_ + _) / period.toDouble
    val mean2 = ys.slice(period, 2 * period).foldLeft(0.0)(_ + _) / period.toDouble
    var l = mean1
    var b = (mean2 - mean1) / period.toDouble
    var seasons = scala.collection.immutable.Queue(
      ys.take(period).map(_ - mean1): _*)
    for (t <- period until ys.length) {
      val (sUsed, rest) = seasons.dequeue
      val lPrev = l
      l = 0.5 * (ys(t) - sUsed) + 0.5 * (lPrev + b)
      b = 0.25 * (l - lPrev) + 0.75 * b
      seasons = rest.enqueue(0.25 * (ys(t) - l) + 0.75 * sUsed)
    }
    val sArr = seasons.toIndexedSeq
    (1 to horizon).map(h => (h, l + h.toDouble * b + sArr((h - 1) % period)))
      .toDF("horizon", "forecast")
  }

  /** Data-driven multi-touch attribution via Markov REMOVAL EFFECTS —
    * the principled alternative to `events_attribution`'s last-touch
    * rule: model user journeys (campaign views up to the first
    * purchase) as a first-order chain with absorbing `conv`/`drop`
    * states, and credit each channel by how much the conversion
    * probability falls when every transition INTO it is redirected to
    * `drop` (Anderl et al. 2014's removal-effect formulation).
    *
    * The reported statistic is the `iters`-step absorption probability
    * (mass on `conv` after a FIXED number of chain steps) — a defined,
    * engine-replayable quantity rather than a solve-to-convergence
    * (journeys absorb in a handful of steps; the oracle unrolls the
    * same `iters` matrix-vector products as list folds).
    *
    * Journey contract: per user, events ordered by (ts, event_id);
    * rows after the first purchase are cut; states are `c<k>` for
    * views carrying campaign `props.k` (other events and campaign-less
    * views are skipped), `conv` for the purchase, `drop` appended when
    * the journey ends unconverted; `start` precedes the first state.
    *
    * Scale shape — whale-user safe: the first-purchase cut is an
    * AGGREGATE + join (min (ts, event_id) over purchases per user),
    * never a running-sum window over each user's full history; with
    * `chunkSec > 0` the sequence scan itself runs segmented — lead
    * within (user, chunk) partitions plus a per-chunk-summary pass
    * whose per-user row count is bounded by the CALENDAR (span ÷
    * chunkSec), the [[asofJoin]] `chunkSec` discipline — so a 10⁷-event
    * bot cannot pin its whole history into one task's sort. The
    * transition table is bounded by the campaign vocabulary squared, so
    * (the [[stationaryDistribution]] rule) the per-removal iteration
    * runs as driver arithmetic — ascending-index folds, division only
    * at matrix build, the exact operand order the oracle's nested
    * `list_transform` replays. Chunked == unchunked is law-pinned in
    * EventsSpec. */
  /** Consecutive inter-event gaps per (non-null) user, in whole seconds
    * (`gap_s = Δunix_micros DIV 10⁶`) — the input of the bot-cadence
    * detector. Events are ordered by (ts, event_id).
    *
    * `chunkSec = 0` runs one `lag` window per user — fine when no single
    * user dominates. `chunkSec > 0` is the whale-user escape hatch (the
    * [[asofJoin]] `chunkSec` discipline): gaps WITHIN a `chunkSec`-wide
    * time chunk come from a lag over (user, chunk) partitions, and the
    * one gap ACROSS each pair of consecutive non-empty chunks comes from
    * a per-chunk min/max summary whose per-user row count is bounded by
    * the CALENDAR (span ÷ chunkSec) — a 10⁷-event bot (exactly the user
    * this detector exists to find) no longer sorts its whole history in
    * one task. Chunk ids are truncating-div buckets: monotone in ts
    * (pre-1970 included) and tied timestamps share a chunk, so the pair
    * decomposition is exact — chunked == unchunked is law-pinned in
    * EventsSpec. */
  def userGaps(events: DataFrame, chunkSec: Long = 0L,
      userCol: String = "user_id"): DataFrame = {
    val ev = events.where(col(userCol).isNotNull)
      .select(col(userCol), col("ts"), col("event_id"))
    // whole-second truncating DIV over (prev, cur) pair rows — the same
    // expression text as the oracle's `// 1000000`
    def gaps(pairs: DataFrame): DataFrame = pairs.select(col(userCol),
      expr("(unix_micros(__cur) - unix_micros(__prev)) DIV 1000000").as("gap_s"))
    if (chunkSec <= 0L) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(userCol)).orderBy(col("ts"), col("event_id"))
      gaps(ev.withColumn("__prev", lag(col("ts"), 1).over(w))
        .where(col("__prev").isNotNull)
        .select(col(userCol), col("__prev"), col("ts").as("__cur")))
    } else {
      val e2 = ev.withColumn("__chunk",
        expr(s"unix_micros(ts) DIV ${chunkSec * 1000000L}"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col(userCol), col("__chunk")).orderBy(col("ts"), col("event_id"))
      val within = e2.withColumn("__prev", lag(col("ts"), 1).over(wc))
        .where(col("__prev").isNotNull)
        .select(col(userCol), col("__prev"), col("ts").as("__cur"))
      val summ = e2.groupBy(col(userCol), col("__chunk"))
        .agg(min(col("ts")).as("__first"), max(col("ts")).as("__last"))
      val ws = org.apache.spark.sql.expressions.Window
        .partitionBy(col(userCol)).orderBy(col("__chunk"))
      val boundary = summ
        .withColumn("__prevLast", lag(col("__last"), 1).over(ws))
        .where(col("__prevLast").isNotNull)
        .select(col(userCol), col("__prevLast").as("__prev"),
          col("__first").as("__cur"))
      gaps(within.unionByName(boundary))
    }
  }

  def markovRemovalEffects(events: DataFrame, iters: Int = 16,
      userCol: String = "user_id", chunkSec: Long = 0L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = events.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("ts"), col("event_id"))
    val ev = events.where(col(userCol).isNotNull)
      .select(col(userCol), col("ts"), col("event_id"), col("event_type"),
        when(col("event_type") === "view",
          get_json_object(col("props"), "$.k").cast("long")).as("__camp"))
    // "no purchase strictly before this row" ⇔ (ts, event_id) ≤ the
    // user's FIRST purchase (the order is total: event_id tiebreak).
    // The first purchase is a partition-wide analytic min over the SAME
    // user partitioning the sequence window below already pays (r15):
    // the r14 form ran a separate aggregate + join-back, scanning the
    // event log twice per pass — min() skips the when()'s nulls, so the
    // window value equals the old groupBy-min for purchasing users and
    // stays null for the rest, row for row.
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(userCol))
    val kept = ev
      .withColumn("__fp", min(when(col("event_type") === "purchase",
        struct(col("ts"), col("event_id")))).over(wAll))
      .where((col("__fp").isNull ||
          struct(col("ts"), col("event_id")) <= col("__fp")) &&
        (col("event_type") === "purchase" ||
          (col("event_type") === "view" && col("__camp").isNotNull)))
      .select(col(userCol), col("ts"), col("event_id"),
        when(col("event_type") === "purchase", lit("conv"))
          .otherwise(concat(lit("c"), col("__camp").cast("string"))).as("state"))
    val trans = (if (chunkSec <= 0L) {
      // ONE window pass (r15): the union form consumed the `seq` window
      // subtree twice per materialization (main transitions + start
      // rows) — the start row is just the __ord == 1 row, so both
      // transition kinds explode out of a single pass. Same (f, t)
      // multiset: order is irrelevant to the downstream count.
      val seq = kept
        .withColumn("__ord", row_number().over(w))
        .withColumn("__nxt", lead(col("state"), 1).over(w))
      val mainT = struct(col("state").as("f"),
        coalesce(col("__nxt"),
          when(col("state") === "conv", lit(null).cast("string"))
            .otherwise(lit("drop"))).as("t"))
      val startT = struct(lit("start").as("f"), col("state").as("t"))
      seq
        .select(explode(when(col("__ord") === 1, array(mainT, startT))
          .otherwise(array(mainT))).as("__ft"))
        .select(col("__ft.f").as("f"), col("__ft.t").as("t"))
    } else {
      // Segmented sequence scan: a transition is either WITHIN a chunk
      // (lead over (user, chunk) — the whale's history splits across
      // chunks), ACROSS two consecutive non-empty chunks (last state of
      // one → first state of the next, from the per-chunk summary whose
      // per-user cardinality is calendar-bounded), the TERMINAL drop
      // (the last chunk's last state), or the START row (the first
      // chunk's first state). Chunk ids are truncating-div buckets —
      // monotone in ts even pre-1970, and ties stay in one chunk.
      val k2 = kept.withColumn("__chunk",
        expr(s"unix_micros(ts) DIV ${chunkSec * 1000000L}"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col(userCol), col("__chunk")).orderBy(col("ts"), col("event_id"))
      val within = k2.withColumn("__nxt", lead(col("state"), 1).over(wc))
        .where(col("__nxt").isNotNull)
        .select(col("state").as("f"), col("__nxt").as("t"))
      val summ = k2.groupBy(col(userCol), col("__chunk"))
        .agg(min_by(col("state"), struct(col("ts"), col("event_id"))).as("__cfirst"),
          max_by(col("state"), struct(col("ts"), col("event_id"))).as("__clast"))
      val ws = org.apache.spark.sql.expressions.Window
        .partitionBy(col(userCol)).orderBy(col("__chunk"))
      val s2 = summ
        .withColumn("__nfirst", lead(col("__cfirst"), 1).over(ws))
        .withColumn("__rk", row_number().over(ws))
      val boundary = s2.where(col("__nfirst").isNotNull)
        .select(col("__clast").as("f"), col("__nfirst").as("t"))
      val terminal = s2.where(col("__nfirst").isNull)
        .select(col("__clast").as("f"),
          when(col("__clast") === "conv", lit(null).cast("string"))
            .otherwise(lit("drop")).as("t"))
      val start = s2.where(col("__rk") === 1)
        .select(lit("start").as("f"), col("__cfirst").as("t"))
      within.unionByName(boundary).unionByName(terminal).unionByName(start)
    }).where(col("t").isNotNull)
    val cnt = trans.groupBy(col("f"), col("t")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    import spark.implicits._
    if (cnt.isEmpty)
      return Seq.empty[(String, Double, Double, Option[Double])]
        .toDF("channel", "conv_base", "conv_without", "removal_effect")
    val channels = cnt.keysIterator.flatMap { case (f, t) => Iterator(f, t) }
      .filterNot(Set("start", "conv", "drop")).toSeq.distinct.sorted
    val ss = (channels ++ Seq("start", "conv", "drop")).distinct.sorted
    val n = ss.length
    val idx = ss.zipWithIndex.toMap
    // dense count matrix ONCE; each removal is then an O(n²) exact-long
    // redirect + divide (the first cut rebuilt rows with an O(n) lookup
    // scan per CELL — n³ per removal, ~37 s at a 100-channel vocabulary)
    val cm = Array.tabulate(n, n)((i, j) => cnt.getOrElse((ss(i), ss(j)), 0L))
    val rowSums = Array.tabulate(n)(i => cm(i).sum)
    val idxDrop = idx("drop")
    def matrix(removed: Option[Int]): Array[Array[Double]] =
      Array.tabulate(n) { i =>
        if (ss(i) == "conv" || ss(i) == "drop" || rowSums(i) == 0L)
          Array.tabulate(n)(j => if (j == i) 1.0 else 0.0)
        else {
          // exact integer merge BEFORE the one division
          val cr = java.util.Arrays.copyOf(cm(i), n)
          removed.foreach { r => cr(idxDrop) += cr(r); cr(r) = 0L }
          Array.tabulate(n)(j => cr(j).toDouble / rowSums(i).toDouble)
        }
      }
    def convProb(p: Array[Array[Double]]): Double = {
      var x = Array.tabulate(n)(j => if (ss(j) == "start") 1.0 else 0.0)
      for (_ <- 0 until iters) {
        val nx = new Array[Double](n)
        var j = 0
        while (j < n) {
          var acc = 0.0 // ascending-i fold: the oracle's list_sum order
          var i = 0
          while (i < n) { acc += x(i) * p(i)(j); i += 1 }
          nx(j) = acc
          j += 1
        }
        x = nx
      }
      x(idx("conv"))
    }
    val base = convProb(matrix(None))
    channels.map { c =>
      val without = convProb(matrix(Some(idx(c))))
      // no conversions at all → the effect is undefined (NULL, never NaN)
      val eff = if (base > 0.0) Some((base - without) / base) else None
      (c, base, without, eff)
    }.toDF("channel", "conv_base", "conv_without", "removal_effect")
  }

  /** Seasonality-adjusted anomaly detection: one-step-ahead
    * Holt–Winters forecast errors, ranked — the anomaly model that
    * does NOT flag every Sunday on weekly-periodic traffic (a global-
    * mean z-score does; [[anomalousWindows]] keeps that role for
    * aperiodic series).
    *
    * Runs [[holtWintersForecast]]'s exact recursion collecting
    * `e_t = y_t − (l+b+s_head)` per step, then centers against the
    * error mean and reports the TOP-3 days by |e − μ| (quantized desc,
    * day-index tiebreak — always non-empty, so the contract is
    * exercised on calm corpora too) with `is_anomaly = |e − μ| > kσ`.
    * Every fold and the μ/σ reductions run in one fixed ascending
    * operand order the oracle's list folds replay bit-for-bit. */
  def holtWintersAnomalies(events: DataFrame, period: Int = 7,
      k: Double = 3.0): DataFrame =
    holtWintersAnomaliesFromDayCounts(dayCounts(events), period, k)

  /** [[holtWintersAnomalies]] over a `(d, y)` day-count frame. */
  def holtWintersAnomaliesFromDayCounts(byDayDf: DataFrame,
      period: Int = 7, k: Double = 3.0): DataFrame = {
    require(period > 1, "period must be > 1")
    val spark = byDayDf.sparkSession
    import spark.implicits._
    def empty = Seq.empty[(Int, Long, Long, Double, Double, Boolean)]
      .toDF("rank", "day_index", "n", "expected", "error", "is_anomaly")
    val byDay = byDayDf.select(col("d"), col("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same short-span empty-frame convention as [[holtWintersFromDayCounts]]
    if (byDay.isEmpty) return empty
    val (dMin, dMax) = (byDay.keys.min, byDay.keys.max)
    val ys = (dMin to dMax).map(d => byDay.getOrElse(d, 0L).toDouble)
    if (ys.length < 2 * period) return empty
    val mean1 = ys.take(period).foldLeft(0.0)(_ + _) / period.toDouble
    val mean2 = ys.slice(period, 2 * period).foldLeft(0.0)(_ + _) / period.toDouble
    var l = mean1
    var b = (mean2 - mean1) / period.toDouble
    var seasons = scala.collection.immutable.Queue(
      ys.take(period).map(_ - mean1): _*)
    val errs = scala.collection.mutable.ArrayBuffer[(Long, Double, Double)]()
    for (t <- period until ys.length) {
      val (sUsed, rest) = seasons.dequeue
      errs += ((dMin + t, ys(t), ys(t) - (l + b + sUsed)))
      val lPrev = l
      l = 0.5 * (ys(t) - sUsed) + 0.5 * (lPrev + b)
      b = 0.25 * (l - lPrev) + 0.75 * b
      seasons = rest.enqueue(0.25 * (ys(t) - l) + 0.75 * sUsed)
    }
    val n = errs.length.toDouble
    val mu = errs.foldLeft(0.0)(_ + _._3) / n
    val sigma = math.sqrt(
      errs.map(x => (x._3 - mu) * (x._3 - mu)).foldLeft(0.0)(_ + _) / n)
    val top = errs
      .map { case (d, y, e) =>
        (d, y.toLong, y - e, e, math.abs(e - mu) > k * sigma) }
      .sortBy { case (d, _, _, e, _) =>
        (-math.floor(math.abs(e - mu) * 10000.0 + 0.5), d) }
      .take(3)
      .zipWithIndex
      .map { case ((d, y, exp, e, flag), i) => (i + 1, d, y, exp, e, flag) }
    top.toSeq.toDF("rank", "day_index", "n", "expected", "error", "is_anomaly")
  }

  /** Kaplan–Meier survival curve of user retention — "what fraction of
    * users are still active t days after their first event", with the
    * censoring the naive ratio gets wrong: a user first seen 3 days
    * before the log ends has not churned, they just haven't had TIME to
    * (Kaplan & Meier 1958).
    *
    * Churn definition: observation end = the global latest per-user
    * activity; a user whose last event is ≥ `churnDays` before that end
    * CHURNED at duration `last − first` (whole days, floor); anyone
    * more recent is CENSORED at duration `end − first`. Users censored
    * exactly at an event time count as still at risk there (the
    * standard convention; documented because it decides `n_risk` on
    * tied days).
    *
    * Scale shape: one distributed per-user min/max pass, one
    * distributed (duration, churned) count — the collected frame is
    * bounded by the CALENDAR SPAN in days (≤ 2·span rows), never user
    * count, so the survival fold is driver arithmetic per the
    * small-support-model rule ([[holtForecast]]'s precedent).
    *
    * Determinism contract: durations are exact integer days; `n_risk`
    * and `n_churned` are exact suffix-sum integers; the survival
    * product folds `S ← S·(1 − d/n)` ascending in duration — one fixed
    * IEEE operand order the oracle replays as a DuckDB list fold, so
    * the doubles agree bit-for-bit before the final r4. */
  def survivalCurve(events: DataFrame, churnDays: Int = 7,
      userCol: String = "user_id"): DataFrame = {
    require(churnDays >= 0, "churnDays must be non-negative")
    val spark = events.sparkSession
    val perUser = events
      .where(col(userCol).isNotNull)
      .groupBy(col(userCol))
      .agg(min(col("ts")).as("__f"), max(col("ts")).as("__l"))
    val durations = perUser
      .crossJoin(broadcast(perUser.agg(max(col("__l")).as("__end"))))
      .select(
        when(col("__l") <= col("__end") - expr(s"INTERVAL $churnDays DAYS"), 1L)
          .otherwise(0L).as("churn"),
        expr(s"""CASE WHEN __l <= __end - INTERVAL $churnDays DAYS
                 THEN (unix_micros(__l) - unix_micros(__f)) DIV 86400000000
                 ELSE (unix_micros(__end) - unix_micros(__f)) DIV 86400000000
                 END""").as("t"))
      .groupBy(col("t"))
      .agg(sum(col("churn")).as("d"), count(lit(1)).as("c"))
    // bounded by distinct whole-day durations ≤ calendar span
    val byT = durations.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val totalUsers = byT.iterator.map(_._3).sum
    var atRisk = totalUsers
    var surv = 1.0
    val rows = byT.flatMap { case (t, d, c) =>
      val out = if (d > 0) {
        surv = surv * (1.0 - d.toDouble / atRisk.toDouble)
        Some((t, atRisk, d, surv))
      } else None
      atRisk -= c // both churned and censored at t leave the risk set
      out
    }
    import spark.implicits._
    rows.toSeq.toDF("t_days", "n_risk", "n_churned", "survival")
  }

  /** [[survivalCurve]] stratified by SIGNUP-MONTH cohort — the
    * retention-curve comparison every growth dashboard runs ("is the
    * March cohort churning faster than January's"). Same censoring
    * contract with ONE global observation end (the latest activity
    * anywhere — per-cohort ends would make late cohorts look
    * artificially loyal); risk sets, event counts, and the KM product
    * all per cohort, the product folding ascending within each cohort
    * (the oracle replays it as a per-cohort list fold). Collected frame
    * bounded by cohorts × calendar-span days. */
  def survivalCurveByCohort(events: DataFrame, churnDays: Int = 7,
      userCol: String = "user_id"): DataFrame = {
    require(churnDays >= 0, "churnDays must be non-negative")
    val spark = events.sparkSession
    val perUser = events
      .where(col(userCol).isNotNull)
      .groupBy(col(userCol))
      .agg(min(col("ts")).as("__f"), max(col("ts")).as("__l"))
    val durations = perUser
      .crossJoin(broadcast(perUser.agg(max(col("__l")).as("__end"))))
      .select(
        date_format(date_trunc("month", col("__f")), "yyyy-MM").as("cohort"),
        when(col("__l") <= col("__end") - expr(s"INTERVAL $churnDays DAYS"), 1L)
          .otherwise(0L).as("churn"),
        expr(s"""CASE WHEN __l <= __end - INTERVAL $churnDays DAYS
                 THEN (unix_micros(__l) - unix_micros(__f)) DIV 86400000000
                 ELSE (unix_micros(__end) - unix_micros(__f)) DIV 86400000000
                 END""").as("t"))
      .groupBy(col("cohort"), col("t"))
      .agg(sum(col("churn")).as("d"), count(lit(1)).as("c"))
    val byCohort = durations.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val rows = byCohort.toSeq.sortBy(_._1).flatMap { case (cohort, xs) =>
      val byT = xs.map(x => (x._2, x._3, x._4)).sortBy(_._1)
      var atRisk = byT.iterator.map(_._3).sum
      var surv = 1.0
      byT.flatMap { case (t, d, c) =>
        val out = if (d > 0) {
          surv = surv * (1.0 - d.toDouble / atRisk.toDouble)
          Some((cohort, t, atRisk, d, surv))
        } else None
        atRisk -= c
        out
      }
    }
    import spark.implicits._
    rows.toDF("cohort", "t_days", "n_risk", "n_churned", "survival")
  }

  /** Autocorrelation of the daily event-count series at lags 1..`maxLag`
    * — the periodicity detector (a weekly-traffic corpus shows the lag-7
    * spike) that tells a curator whether [[holtForecast]]'s trend-only
    * model is even admissible.
    *
    * Scale shape: ONE distributed day-count aggregation; gaps are
    * zero-filled over the calendar range (a quiet day is data, not a
    * missing row) via a range frame, so the lag pairing is an equi-join
    * on `d + lag = d2` — tiny frames, but the shape stays distributed
    * (no collect of the series). Per lag, Pearson r from five exact
    * BIGINT sums; doubles appear only in the final 7-row select, in one
    * fixed operand shape both engines share. Degenerate variance on
    * either margin → NULL acf (a constant series has no correlation,
    * not r = 1). */
  def dailyAcf(events: DataFrame, maxLag: Int = 7): DataFrame =
    dailyAcfFromDayCounts(dayCounts(events), maxLag)

  /** The per-day event-count frame `(d, y)` every daily-series operator
    * reduces over — `d` is the integer epoch-day (truncating `DIV`,
    * matching the oracles' `//`). This is also the streaming DAY-COUNT
    * FOLD's state shape ([[graft.streaming.EventStream.startDayCounts]]):
    * counts are a SUM monoid over fixed day keys, so batch and stream
    * folds commute and every `FromDayCounts` reader below serves
    * identically off either. */
  def dayCounts(events: DataFrame): DataFrame =
    events
      .select(expr("unix_micros(ts) DIV 86400000000").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("y"))

  /** [[dailyAcf]] over a pre-aggregated `(d, y)` day-count frame. */
  def dailyAcfFromDayCounts(byDay: DataFrame, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val spark = byDay.sparkSession
    val bounds = byDay.agg(min(col("d")), max(col("d"))).head()
    require(!bounds.isNullAt(0), "empty event log")
    val (dMin, dMax) = (bounds.getLong(0), bounds.getLong(1))
    val filled = spark.range(dMin, dMax + 1).toDF("d")
      .join(byDay, Seq("d"), "left")
      .select(col("d"), coalesce(col("y"), lit(0L)).as("y"))
    import spark.implicits._
    val lags = (1 to maxLag).map(_.toLong).toDF("lag")
    val paired = filled.select(col("d"), col("y").as("x"))
      .crossJoin(broadcast(lags))
      .join(filled.select(col("d").as("__d2"), col("y").as("z")),
        col("__d2") === col("d") + col("lag"))
    val sums = paired.groupBy(col("lag"))
      .agg(count(lit(1)).as("k"),
        sum(col("x")).as("sx"), sum(col("z")).as("sz"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("z") * col("z")).as("szz"),
        sum(col("x") * col("z")).as("sxz"))
    val kd = col("k").cast("double")
    val num = kd * col("sxz").cast("double") -
      col("sx").cast("double") * col("sz").cast("double")
    val vx = kd * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vz = kd * col("szz").cast("double") -
      col("sz").cast("double") * col("sz").cast("double")
    sums.select(col("lag").cast("int").as("lag"), col("k").as("n_pairs"),
      when(vx > 0.0 && vz > 0.0, num / sqrt(vx * vz))
        .otherwise(lit(null).cast("double")).as("acf"))
      .orderBy("lag")
  }

  /** CUSUM changepoint detection on the daily event-count series — the
    * level-shift locator ("traffic changed regime on day X") that
    * complements [[anomalousWindows]]'s single-day spikes (Page 1954).
    *
    * Exactness: the textbook statistic C_t = Σ_{i≤t}(y_i − ȳ) needs the
    * float mean; scaling by the day count m keeps everything integer:
    * C'_t = Σ_{i≤t}(m·y_i − S) = m·C_t with S = Σy — exact BIGINTs,
    * identical on both engines, argmax |C'_t| at the earliest tied day.
    * The reported shift magnitude (mean after − mean before) divides
    * exact sums only in the final 1-row select.
    *
    * Scale note: the cumulative sum runs a partition-less window over
    * the DAY frame — bounded by calendar span, never event count (the
    * corpus_quality_band allowlist argument). */
  def cusumChangepoint(events: DataFrame): DataFrame =
    cusumFromDayCounts(dayCounts(events))

  /** [[cusumChangepoint]] over a pre-aggregated `(d, y)` day-count
    * frame — the read side of the streaming day-count fold. */
  def cusumFromDayCounts(byDay: DataFrame): DataFrame = {
    val spark = byDay.sparkSession
    val bounds = byDay.agg(min(col("d")), max(col("d"))).head()
    require(!bounds.isNullAt(0), "empty event log")
    val (dMin, dMax) = (bounds.getLong(0), bounds.getLong(1))
    val series = spark.range(dMin, dMax + 1).toDF("d")
      .join(byDay, Seq("d"), "left")
      .select(col("d"), coalesce(col("y"), lit(0L)).as("y"))
    val totals = series.agg(count(lit(1)).as("m"), sum(col("y")).as("s"))
    val filled = series.crossJoin(broadcast(totals))
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy(col("d")).rowsBetween(W.unboundedPreceding, 0)
    val withCusum = filled
      .withColumn("__c", sum(col("m") * col("y") - col("s")).over(w))
      .withColumn("__yc", sum(col("y")).over(w))
      .withColumn("__nc", count(lit(1)).over(w))
    withCusum
      .orderBy(abs(col("__c")).desc, col("d").asc)
      .limit(1)
      .select(col("d").as("day_index"), col("__c").as("cusum_scaled"),
        col("m").as("n_days"),
        (col("__yc").cast("double") / col("__nc").cast("double"))
          .as("mean_before"),
        // changepoint on the LAST day (possible only when the series is
        // all-tied at 0) has no after-side: NULL, not a 0/0 NaN
        when(col("__nc") < col("m"),
          (col("s") - col("__yc")).cast("double")
            / (col("m") - col("__nc")).cast("double"))
          .otherwise(lit(null).cast("double")).as("mean_after"))
  }

  // ------------------------------------------------------------------
  // Count-Min sketch (Cormode–Muthukrishnan 2005)
  // ------------------------------------------------------------------

  /** Fixed (a, b) coefficients for the sketch's hash rows — classic
    * public LCG multipliers/increments. Literal model data shared with
    * the oracle's VALUES list, so both engines hash identically. */
  val CmHashes: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (214013L, 2531011L),
    (69069L, 362437L), (1664525L, 1013904223L))

  /** Hash-row modulus — 2³¹−1 (Mersenne prime). */
  val CmPrime: Long = 2147483647L

  /** Row-`(a, b)` cell index of `key`: `((a·key + b) mod p) mod w`,
    * non-negative for negative keys too (`pmod` both engines' twin).
    * The key is PRE-REDUCED mod p before the multiply ([[lcCell]]'s
    * discipline): `a·(key mod p) ≡ a·key (mod p)` so the cell is
    * unchanged, but the checked ANSI multiply stays under 2⁶² for ANY
    * 64-bit key — snowflake-style ids (~4.6e17) would otherwise
    * overflow `a·key` and kill the job. */
  def cmCell(key: Column, a: Long, b: Long, w: Int): Column =
    pmod(pmod(lit(a) * pmod(key, lit(CmPrime)) + lit(b), lit(CmPrime)),
      lit(w.toLong))

  /** Count-Min sketch of a keyed count frame (`key` BIGINT, `n` BIGINT):
    * one row per (hash row, cell) with the summed count of every key
    * hashing there. Deterministic — cells are SUMS, so unlike
    * Misra–Gries-style summaries the result is independent of partition
    * and merge order, which is what makes it oracle-checkable bit-exactly
    * AND mergeable: sketches of two shards (or two stream micro-batches)
    * combine by cell-wise addition, the commutative-monoid shape of
    * [[graft.operators.Corpus]]'s checksum manifest.
    *
    * Scale: the sketch is `depth × w` cells — O(1) state no matter how
    * many keys or events; the build is one map-side-combinable
    * aggregation over `depth` projections of the (already small) count
    * frame. Point-estimate error: `est − true ≤ εN` with
    * `ε = e/w` at probability `1 − e^(−depth)` — and `est ≥ true`
    * always (counts are non-negative), which the estimate queries
    * report as exact integers. */
  def cmSketch(counts: DataFrame, w: Int): DataFrame = {
    require(w > 0, "w must be positive")
    CmHashes.zipWithIndex.map { case ((a, b), r) =>
      counts.select(lit(r).as("row"),
        cmCell(col("key"), a, b, w).as("cell"), col("n"))
    }.reduce(_ unionByName _)
      .groupBy(col("row"), col("cell"))
      .agg(sum(col("n")).as("cell_n"))
  }

  // ------------------------------------------------------------------
  // Linear probabilistic counting (Whang et al. 1990) — the distinct
  // sketch that, unlike HLL++ (engine-internal hashing, not
  // replayable), is fully deterministic and oracle-checkable
  // ------------------------------------------------------------------

  /** Occupied-cell frame of a linear-counting distinct sketch: each
    * (group, key) marks cell `hash(key) mod k` using the first
    * [[CmHashes]] row; the sketch IS the distinct set of (group, cell)
    * rows — an OR-monoid (union across shards/batches = union of the
    * frames, then distinct), bounded by k cells per group. Input:
    * `grp`, `key` (BIGINT, pre-deduplicated or not — marking is
    * idempotent). */
  def lcCells(keyed: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    keyed.select(col("grp"), lcCell(col("key"), k).as("cell")).distinct()
  }

  /** LC cell index: affine → xor-fold → affine, mod k. An affine-only
    * hash (the [[cmCell]] shape) is a bijection mod p, so a CLUSTERED
    * key domain maps to a low-discrepancy (too-even) cell sequence —
    * fewer collisions than Poisson and a systematic LC overestimate
    * (measured: +31% at load 1.8 on keys from a 2000-value range). The
    * xor of the high halfword breaks the affinity; the second affine
    * pass spreads the fold. CM keeps its plain affine rows: its
    * `est ≥ true` contract is structural, and too-even hashing only
    * makes it MORE accurate. */
  def lcCell(key: Column, k: Int): Column = {
    val (a1, b1) = CmHashes.head
    val (a2, b2) = CmHashes(1)
    // pre-reduce mod p: LC keys can be 56-bit content hashes, and
    // a₁·key would overflow the checked long multiply past |key| ≈ 2³²
    val kr = pmod(key, lit(CmPrime))
    val h = pmod(lit(a1) * kr + lit(b1), lit(CmPrime))
    // shiftright == `h // 65536` in the oracle (h is non-negative mod p)
    val m = h.bitwiseXOR(shiftright(h, 16))
    pmod(pmod(lit(a2) * m + lit(b2), lit(CmPrime)), lit(k.toLong))
  }

  /** Linear-counting estimates per group from [[lcCells]]:
    * `est = −k·ln(z/k)` for `z` empty cells — NULL when the sketch is
    * saturated (z = 0; the estimator diverges, callers size k to the
    * expected cardinality). The ln stays inside the quantize-then-
    * compare discipline (callers round via r4). */
  def lcEstimates(cells: DataFrame, k: Int): DataFrame =
    cells.groupBy(col("grp"))
      .agg(count(lit(1)).as("occupied"))
      .withColumn("est",
        when(col("occupied") < k,
          lit(-k.toDouble) *
            log((lit(k.toDouble) - col("occupied").cast("double")) / lit(k.toDouble)))
          .otherwise(lit(null).cast("double")))

  // ------------------------------------------------------------------
  // Decimal-digit quantile histogram (a DDSketch-flavored fixed-bucket
  // family — Masson et al. 2019 motivates relative-error buckets; the
  // decimal variant keeps every boundary integer-expressible)
  // ------------------------------------------------------------------

  /** Fixed-boundary relative-error histogram of a positive value column:
    * quantize to 1e-2 (`q2 = floor(100·v + 0.5)`, the house quantization)
    * and bucket by `(decimal digit count, first two digits)` of q2 —
    * e.g. 1234 → (4, 12), covering [1200, 1300). Bucket boundaries are
    * DATA-INDEPENDENT, so unlike rank-based quantile sketches (GK, KLL,
    * t-digest — all merge-order sensitive) the histogram is
    * deterministic, bit-exact oracle-replayable, and merges across
    * shards/batches by `cnt` addition. State: ≤ 90 buckets per decade ×
    * 19 decades regardless of data. Relative bucket width ≤ 10% ⇒ a
    * quantile read from bucket midpoints carries ≤ ~5% relative error
    * plus the 1e-2 quantization. Domain: q2 ≥ 1 (zero/negative values
    * have no decimal-digit bucket — callers route them separately);
    * digit math is pure string/integer ops, portable cross-engine. */
  def ddHistogram(values: DataFrame): DataFrame =
    ddHistogramBy(values.withColumn("grp", lit("all"))).drop("grp")

  /** Per-group histogram: input carries `grp` beside `value`; buckets
    * are per (grp, digits, first2). */
  def ddHistogramBy(values: DataFrame): DataFrame = {
    val s = col("q2").cast("string")
    ddQuantizedBy(values)
      .groupBy(col("grp"), length(s).cast("long").as("digits"),
        substring(s, 1, 2).cast("long").as("first2"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The quantized positive-domain frame [[ddHistogram]] buckets —
    * exposed so verification twins measure the SAME population. The
    * upper bound is the long-headroom gate (the `Metric.validRecord`
    * discipline): `floor(100·v + 0.5)` must fit BIGINT, and under ANSI
    * arithmetic one `v ≥ ~9.2e16` row would otherwise kill the job on
    * BOTH engines (Spark overflow-checked cast, DuckDB checked CAST) —
    * a domain is validated, not crashed into. */
  def ddQuantized(values: DataFrame): DataFrame =
    ddQuantizedBy(values.withColumn("grp", lit("all"))).drop("grp")

  /** Grouped twin of [[ddQuantized]] (carries `grp`). */
  def ddQuantizedBy(values: DataFrame): DataFrame =
    values.where(col("value").isNotNull && col("value") > 0 &&
        col("value") < lit(9.0e16))
      .select(col("grp"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("q2"))
      .where(col("q2") >= 1)

  /** Quantile reads at integer percents from a [[ddHistogram]]: for each
    * p, the midpoint of the first bucket whose cumulative count reaches
    * rank `ceil(n·p/100)`. */
  def ddQuantiles(hist: DataFrame, percents: Seq[Int]): DataFrame =
    ddQuantilesBy(hist.withColumn("grp", lit("all")), percents)
      .drop("grp").orderBy("p")

  /** Grouped quantile reads — one (grp, p) row per group and percent.
    * The prefix-sum window is PARTITIONED by group and runs over the
    * bucket frame (≤ ~1700 rows per group by construction); the
    * group-total join is a broadcast of the per-group count frame
    * (groups are a dimension vocabulary, never data-proportional — the
    * caller's contract). */
  def ddQuantilesBy(hist: DataFrame, percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be integer percentages, got $percents")
    val spark = hist.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
      .orderBy(col("digits"), col("first2"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val mids = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("width",
        expr("CAST(concat('1', repeat('0', CAST(greatest(digits - 2, 0) AS INT))) AS BIGINT)"))
      // bucket midpoint in VALUE units — (lo + width/2) / 100, the same
      // double-op order the oracle restates
      .withColumn("mid",
        ((col("first2") * col("width")).cast("double") +
          col("width").cast("double") / lit(2.0)) / lit(100.0))
    val n = hist.groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
    mids.join(broadcast(n), Seq("grp")).crossJoin(broadcast(percents.toDF("p")))
      .where(col("cum") >= expr("(n * p + 99) div 100"))
      .groupBy(col("grp"), col("p"))
      .agg(max(col("n")).as("n"), min(col("mid")).as("est"))
      .orderBy("grp", "p")
  }

  /** Per-key point estimates against [[cmSketch]]: `n_true` (the input
    * count, for the error report) and `n_est = min` over the key's
    * `depth` cells. The sketch side is BROADCAST — it is depth×w rows by
    * construction — so the only shuffle is the key-grouped min, bounded
    * by the distinct-key count. */
  def cmEstimates(counts: DataFrame, w: Int): DataFrame = {
    val sk = cmSketch(counts, w)
    CmHashes.zipWithIndex.map { case ((a, b), r) =>
      counts.select(col("key"), col("n"), lit(r).as("row"),
        cmCell(col("key"), a, b, w).as("cell"))
    }.reduce(_ unionByName _)
      .join(broadcast(sk), Seq("row", "cell"))
      .groupBy(col("key"))
      .agg(max(col("n")).as("n_true"), min(col("cell_n")).as("n_est"))
  }
}
