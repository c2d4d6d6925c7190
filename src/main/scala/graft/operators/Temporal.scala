package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins over event streams — the point-in-time primitives a
  * feature-engineering pipeline needs and Spark lacks as built-ins.
  *
  * The reference engine has no temporal operators (its `events` are CRUD
  * row mutations, not a time axis); these are pipeline extensions in the
  * same spirit as [[Dedup]]/[[Corpus]]: declarative plans whose shuffle
  * structure survives a 100× scale-up.
  *
  *   - [[asofJoin]]: for every left row, the latest right row with
  *     `right.ts <= left.ts` in the same key group — the classic
  *     point-in-time ("as-of") join used to attach feature snapshots to
  *     training examples without future leakage.
  *   - [[rangeJoinBinned]]: left rows matched to right rows inside a
  *     bounded time window — executed as an equi-join on (key, time
  *     bucket) instead of an inequality join, which Spark would otherwise
  *     plan as a per-key cartesian.
  *
  * Scale notes: both operators shuffle each side exactly once on the join
  * key (+ bucket), never on time. `asofJoin` is one sort-merge pass per
  * key group (the union trick: no join at all — a single window over the
  * interleaved stream), so its cost is a sort, not |left|·|right|.
  * `rangeJoinBinned` bounds fan-out to 2 build-side copies per right row
  * for any window ≤ bucket width; skewed keys split across buckets
  * naturally.
  */
object Temporal {

  /** Point-in-time join: attach to each `left` row the nearest `right`
    * row in the same `key` group — `backward` (default): the most
    * recent with `right.ts <= left.ts`; `forward`: the earliest with
    * `right.ts >= left.ts` (next-event attribution, e.g. "time to the
    * following conversion"). Bounds inclusive; `null`s when no such
    * right row exists (left-outer as-of semantics).
    *
    * Right rows tied on `ts` are resolved to the one with the greatest
    * `tieBreak` value — the join is deterministic for any input.
    *
    * Implementation: tag and union the two sides, then one running
    * `last(_, ignoreNulls)` window per key ordered by
    * `(ts, tag, tieBreak)` (ts reversed for `forward`) — right rows
    * sort before left rows at equal `ts` (inclusive bound), later
    * tie-break values overwrite earlier ones. One shuffle on `key`, one
    * sort, zero joins; the 100 TB plan is a single sort-merge-shaped
    * pass with no candidate blow-up, unlike the naive
    * `left JOIN right ON key AND ts <= ts` + row_number plan (a per-key
    * cartesian).
    *
    * @param rightCols right columns to carry onto the matched row
    *                  (emitted as `asof_<name>`)
    * @param toleranceSec maximum |left.ts − right.ts| in seconds for a
    *                     match to count (feature-store staleness bound);
    *                     matches outside it become `null`s, preserving
    *                     left-outer cardinality
    * @param chunkSec skew escape hatch: 0 (default) runs one window per
    *                 key — a single whale key (e.g. a null user or a
    *                 default tenant holding half the events) serializes
    *                 through one task's sort. A positive value splits
    *                 each key's timeline into `chunkSec`-wide chunks,
    *                 windows within (key, chunk), and carries the last
    *                 match across chunk boundaries via a per-chunk
    *                 summary table (one row per key×chunk — bounded by
    *                 time span, not data). Same results for any value;
    *                 pick chunkSec so one chunk of the hottest key fits
    *                 a task. BOUND: each task sorts at most the rows of
    *                 one (key, chunk) group = the key's densest
    *                 chunkSec-wide slice of both sides — never the
    *                 key's full history (TemporalSpec pins this on a
    *                 50%-whale fixture: 4000-row whale, ≤292-row groups)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightCols: Seq[String],
      tieBreak: String,
      direction: String = "backward",
      toleranceSec: Long = Long.MaxValue,
      chunkSec: Long = 0L): DataFrame =
    asofJoinKeys(left, right, Seq(key), ts, rightCols, tieBreak, direction,
      toleranceSec, chunkSec)

  /** [[asofJoin]] on a COMPOSITE key (e.g. (entity, feature_group)) —
    * identical semantics, the window partitions on all key columns. */
  def asofJoinKeys(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String,
      rightCols: Seq[String],
      tieBreak: String,
      direction: String = "backward",
      toleranceSec: Long = Long.MaxValue,
      chunkSec: Long = 0L): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got $direction")
    require(toleranceSec >= 0, s"toleranceSec must be >= 0, got $toleranceSec")
    val carried = struct(
      (rightCols :+ tieBreak).distinct.map(col) :+ col(ts).as("__mts"): _*)
    // __tie keeps the tieBreak column's NATIVE type: casting (e.g. to
    // long) would truncate doubles and null out non-numeric columns,
    // silently breaking the greatest-tieBreak determinism contract. Left
    // rows carry a null tie — their relative order is irrelevant (tag
    // already sorts them after all right rows at equal ts, and their
    // __carry is null so last(ignoreNulls) skips them).
    val r = right.select(
      keys.map(col) ++ Seq(col(ts).as("__ts"), lit(0).as("__tag"),
        col(tieBreak).as("__tie"), carried.as("__carry")): _*)
    val l = left.withColumn("__ts", col(ts))
      .withColumn("__tag", lit(1))
      .withColumn("__tie", lit(null).cast(r.schema("__tie").dataType))
      .withColumn("__carry", lit(null).cast(r.schema("__carry").dataType))
    val tsOrd = if (direction == "backward") col("__ts").asc else col("__ts").desc
    val gapOk =
      abs(col(ts).cast("long") - col("__match.__mts").cast("long")) <= toleranceSec
    val u = l.unionByName(r, allowMissingColumns = true)
    val matched = if (chunkSec <= 0) {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(tsOrd, col("__tag").asc, col("__tie").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("__match", last(col("__carry"), ignoreNulls = true).over(w))
    } else {
      // Segmented scan: ONE full-row shuffle+sort (the per-chunk window),
      // then the cross-chunk carry from a map-side-combinable aggregate —
      // NOT a second window over the union (an earlier formulation
      // computed the per-chunk finals with a full-frame window and paid a
      // second complete shuffle+sort of the data; the plan pin in
      // TemporalSpec guards against regressing to that). A whale key's
      // sort is bounded by its densest chunk instead of its full history.
      val chunked = u.withColumn("__chunk",
        floor(unix_timestamp(col("__ts")) / chunkSec).cast("long"))
      val pcols = keys.map(col) :+ col("__chunk")
      val wIn = Window.partitionBy(pcols: _*)
        .orderBy(tsOrd, col("__tag").asc, col("__tie").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val inChunk = chunked
        .withColumn("__match_in", last(col("__carry"), ignoreNulls = true).over(wIn))
      // Per-chunk final carry: max_by whose key makes right rows outrank
      // all left rows (boolean first field), then mirrors the window
      // order among right rows — ts as EXACT unix_micros (negated for
      // forward: the window's "last" right row is min-ts there), tie in
      // its native type. A chunk with no right rows yields a null carry,
      // which the cross-chunk last(ignoreNulls) skips; the aggregate
      // also materializes the complete (key, chunk) axis, so every left
      // row's chunk has a summary row to join.
      val tsKey =
        if (direction == "backward") unix_micros(col("__ts"))
        else -unix_micros(col("__ts"))
      val chunkOrd =
        if (direction == "backward") col("__chunk").asc else col("__chunk").desc
      val wPrev = Window.partitionBy(keys.map(col): _*).orderBy(chunkOrd)
        .rowsBetween(Window.unboundedPreceding, -1)
      val summary = chunked
        .groupBy(pcols: _*)
        .agg(max_by(col("__carry"),
          struct((col("__tag") === 0).as("__r"), tsKey.as("__tk"),
            col("__tie").as("__tb"))).as("__chunk_final"))
        .withColumn("__carry_prev",
          last(col("__chunk_final"), ignoreNulls = true).over(wPrev))
        .select(
          keys.zipWithIndex.map { case (k, i) => col(k).as(s"__sk$i") } ++
            Seq(col("__chunk").as("__schunk"), col("__carry_prev")): _*)
      // null-safe equality: window partitioning groups null keys
      // together, so the carry join must too
      val cond = (keys.zipWithIndex
        .map { case (k, i) => inChunk(k) <=> summary(s"__sk$i") } :+
        (inChunk("__chunk") <=> summary("__schunk"))).reduce(_ && _)
      inChunk.join(summary, cond, "left")
        .withColumn("__match", coalesce(col("__match_in"), col("__carry_prev")))
        .drop("__chunk", "__match_in")
        .drop(summary.columns: _*)
    }
    matched
      .where(col("__tag") === 1)
      .withColumn("__match",
        when(col("__match").isNotNull && gapOk, col("__match")))
      .drop("__ts", "__tag", "__tie", "__carry")
      .withColumns(rightCols.map(c => s"asof_$c" -> col(s"__match.$c")).toMap)
      .drop("__match")
  }

  /** Windowed range join, binned: for each `left` row, all `right` rows
    * in the same `key` group with `left.ts - window < right.ts <=
    * left.ts - offset` (a look-back window ending at, by default
    * touching, the left timestamp), returned as left-outer pairs for the
    * caller to aggregate.
    *
    * Executed as an equi-join on `(key, bucket)` where bucket =
    * `floor(epochSec / windowSec)`: each right row registers a copy in
    * its own bucket and the next one — for any look-back ≤ the bucket
    * width those two copies cover every left bucket that can see it, so
    * fan-out is a constant 2× on the build side and the join is a plain
    * shuffled (or broadcast) hash join. The left side is never
    * replicated, which is what makes the left-outer cardinality exact.
    * The inequality pair stays a residual condition on co-located rows,
    * never the join key, so Catalyst never falls back to
    * BroadcastNestedLoopJoin.
    *
    * @param windowSec look-back span in seconds
    * @param offsetSec right edge of the window, seconds before `left.ts`
    *                  (0 = up to and excluding the left row's instant)
    * @param bucketSec bucket width (default = `windowSec`, the 2×-fan-out
    *                  sweet spot). A smaller bucket trades build fan-out
    *                  (`ceil(window/bucket)+1` copies per right row) for
    *                  a tighter per-bucket hash — worth it when the right
    *                  side is dense and the window long
    */
  def rangeJoinBinned(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      windowSec: Long,
      offsetSec: Long = 0L,
      bucketSec: Long = 0L): DataFrame = {
    require(offsetSec >= 0 && offsetSec < windowSec,
      s"offsetSec must be in [0, windowSec): got $offsetSec / $windowSec")
    val bsec = if (bucketSec <= 0) windowSec else bucketSec
    val nBack = (windowSec + bsec - 1) / bsec // buckets behind the own one
    require(nBack <= 64,
      s"window/bucket ratio $nBack explodes the probe side " +
        s"(${nBack + 1} copies per left row) — widen bucketSec")
    val bucket = (c: Column) => floor(unix_timestamp(c) / bsec).cast("long")
    // Fan out the BUILD side, not the probe: a right row in bucket b can
    // only match left rows in buckets [b, b + nBack], so it registers one
    // copy per such bucket. The left side keeps exactly ONE copy per row
    // (probing its own bucket), so the left-outer join emits exactly one
    // null-extended row iff the left row has no match anywhere in its
    // look-back window — pair cardinality is exact by construction, with
    // no post-filter. (The earlier probe-side fan-out needed a null-row
    // filter that let a phantom null row through when a left row's
    // matches all lived in a non-own bucket.) A given right row joins a
    // given left row through at most one copy (the copies differ in __b
    // and the left row has a single bucket), so no duplicate pairs.
    val build = right.select(
        col(key).as("__rk"), col(ts).as("__rts"),
        struct(right.columns.map(col): _*).as("__row"))
      .withColumn("__b",
        explode(sequence(bucket(col("__rts")), bucket(col("__rts")) + nBack)))
    val probe = left.withColumn("__lb", bucket(col(ts)))
    // null-safe key equality: null keys form a real group (anonymous
    // events), matching asofJoin's window-partitioning semantics and
    // intervalJoinBinned's declared contract — `===` would silently
    // null-extend every null-key left row even when null-key right rows
    // sit inside its window
    probe
      .join(build,
        probe(key) <=> build("__rk") && probe("__lb") === build("__b") &&
          build("__rts") > probe(ts) - expr(s"INTERVAL $windowSec SECONDS") &&
          build("__rts") <= probe(ts) - expr(s"INTERVAL $offsetSec SECONDS"),
        "left_outer")
      .drop("__lb", "__b", "__rk", "__rts")
      .withColumnRenamed("__row", "range_match")
  }

  /** Interval-overlap join, binned (the batch form of Flink's interval
    * join, which Spark has no built-in for): emit a pair for every
    * (left, right) row whose `[start, end]` intervals share at least one
    * instant — `l.start <= r.end && r.start <= l.end`, both bounds
    * inclusive — optionally restricted to equal `keys`. The matched
    * right row is attached whole as an `interval_match` struct; inner
    * join, each overlapping pair emitted EXACTLY once.
    *
    * Execution: both sides register one copy per `bucketSec`-wide time
    * bucket their interval touches, and the join is a plain equi-join on
    * `(keys, bucket)` with the overlap test as a residual — never an
    * inequality join, which Catalyst would plan as a (per-key) cartesian
    * BroadcastNestedLoopJoin. A pair overlapping across several shared
    * buckets is deduplicated for free by the first-common-bucket rule:
    * the copy pair only matches in bucket `max(bucket(l.start),
    * bucket(r.start))` — the earliest bucket both sides cover (overlap
    * guarantees it exists: `max(starts) <= min(ends)` and bucketing is
    * monotone) — so no post-hoc `distinct` shuffle is ever needed.
    *
    * Scale shape: shuffle keys are `(keys, bucket)` — narrow, and a hot
    * time range splits across buckets naturally (same argument as
    * [[rangeJoinBinned]]). Fan-out per row is `span/bucketSec + 1`
    * copies, statically capped via `maxSpanSec` (≤ 64 buckets) and
    * enforced per row: an interval longer than `maxSpanSec` (or with
    * `end < start`) fails the job rather than silently dropping pairs.
    * With `keys` empty the join runs on the time axis alone — sized for
    * the one-side-small case (incident windows × sessions), where AQE
    * broadcasts the small exploded side.
    *
    * @param keys       equality key columns present on both sides (empty
    *                   = pure time-axis join); null keys match null keys,
    *                   mirroring groupBy/window semantics
    * @param leftSpan   (start, end) timestamp column names on `left`
    * @param rightSpan  (start, end) timestamp column names on `right`
    * @param bucketSec  time-bucket width, seconds
    * @param maxSpanSec declared maximum interval length on EITHER side;
    *                   `ceil(maxSpanSec/bucketSec)` must be ≤ 64
    */
  def intervalJoinBinned(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftSpan: (String, String),
      rightSpan: (String, String),
      bucketSec: Long,
      maxSpanSec: Long): DataFrame = {
    val (ls, le) = leftSpan
    val (rs, re) = rightSpan
    require(bucketSec > 0, s"bucketSec must be > 0, got $bucketSec")
    val nMax = (maxSpanSec + bucketSec - 1) / bucketSec
    require(nMax >= 0 && nMax <= 64,
      s"maxSpanSec/bucketSec ratio $nMax explodes the copy fan-out " +
        s"(${nMax + 1} copies per row) — widen bucketSec")
    val bucket = (c: Column) => floor(unix_timestamp(c) / bucketSec).cast("long")
    // One copy per touched bucket; the assert_true guard (null when the
    // row is legal, throws otherwise) turns a contract violation into a
    // job failure instead of silently missing pairs — sequence(bs, be)
    // would otherwise COUNT DOWN for end < start and OOM for runaway
    // spans.
    def copies(s: Column, e: Column): Column = {
      val bs = bucket(s)
      val be = bucket(e)
      val ok = coalesce(
        assert_true(s <= e && be - bs <= nMax,
          concat(lit(s"interval breaks the contract (end >= start, span <= ${maxSpanSec}s): "),
            s.cast("string"), lit(" .. "), e.cast("string"))).cast("long"),
        lit(0L))
      explode(sequence(bs, be + ok))
    }
    val rKeys = keys.zipWithIndex.map { case (k, i) => col(k).as(s"__rk$i") }
    val build = right.select(
        rKeys ++ Seq(col(rs).as("__rs"), col(re).as("__re"),
          struct(right.columns.map(col): _*).as("__row")): _*)
      .withColumn("__b", copies(col("__rs"), col("__re")))
    val probe = left.withColumn("__lb", copies(col(ls), col(le)))
    val keyEq = keys.zipWithIndex.map { case (k, i) => probe(k) <=> build(s"__rk$i") }
    val cond = (keyEq ++ Seq(
      probe("__lb") === build("__b"),
      greatest(bucket(probe(ls)), bucket(build("__rs"))) === build("__b"),
      probe(ls) <= build("__re"),
      build("__rs") <= probe(le))).reduce(_ && _)
    probe.join(build, cond, "inner")
      .drop("__lb", "__b", "__rs", "__re")
      .drop(keys.indices.map(i => s"__rk$i"): _*)
      .withColumnRenamed("__row", "interval_match")
  }
}
