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
  * `rangeJoinBinned` bounds fan-out to 2 probe rows per left row for any
  * window ≤ bucket width; skewed keys split across buckets naturally.
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
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightCols: Seq[String],
      tieBreak: String,
      direction: String = "backward",
      toleranceSec: Long = Long.MaxValue): DataFrame =
    asofJoinKeys(left, right, Seq(key), ts, rightCols, tieBreak, direction,
      toleranceSec)

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
      toleranceSec: Long = Long.MaxValue): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got $direction")
    require(toleranceSec >= 0, s"toleranceSec must be >= 0, got $toleranceSec")
    val carried = struct(
      (rightCols :+ tieBreak).distinct.map(col) :+ col(ts).as("__mts"): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(ts).as("__ts"), lit(0).as("__tag"),
        col(tieBreak).cast("long").as("__tie"), carried.as("__carry")): _*)
    val l = left.withColumn("__ts", col(ts))
      .withColumn("__tag", lit(1))
      .withColumn("__tie", lit(Long.MaxValue))
      .withColumn("__carry", lit(null).cast(r.schema("__carry").dataType))
    val tsOrd = if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrd, col("__tag").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapOk =
      abs(col(ts).cast("long") - col("__match.__mts").cast("long")) <= toleranceSec
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__carry"), ignoreNulls = true).over(w))
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
    * `floor(epochSec / windowSec)`: each left row probes its own bucket
    * and the previous one — for any look-back ≤ the bucket width those
    * two buckets cover the window, so fan-out is a constant 2× on the
    * probe side and the join is a plain shuffled (or broadcast) hash
    * join. The inequality pair stays as a post-join filter on co-located
    * rows, never a join condition, so Catalyst never falls back to
    * BroadcastNestedLoopJoin.
    *
    * @param windowSec look-back span in seconds
    * @param offsetSec right edge of the window, seconds before `left.ts`
    *                  (0 = up to and excluding the left row's instant)
    * @param bucketSec bucket width (default = `windowSec`, the 2×-fan-out
    *                  sweet spot). A smaller bucket trades probe fan-out
    *                  (`ceil(window/bucket)+1` copies per left row) for a
    *                  tighter build-side hash — worth it when the right
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
    val probe = left
      .withColumn("__b",
        explode(sequence(bucket(col(ts)) - nBack, bucket(col(ts)))))
    val build = right.select(
      col(key).as("__rk"), col(ts).as("__rts"),
      bucket(col(ts)).as("__rb"),
      struct(right.columns.map(col): _*).as("__row"))
    probe
      .join(build,
        probe(key) === build("__rk") && probe("__b") === build("__rb") &&
          build("__rts") > probe(ts) - expr(s"INTERVAL $windowSec SECONDS") &&
          build("__rts") <= probe(ts) - expr(s"INTERVAL $offsetSec SECONDS"),
        "left_outer")
      // the 2× probe fan-out leaves one null-extended row per UNMATCHED
      // probe copy; keep a left row's null row only from its own bucket
      // so left-outer cardinality is exact
      .where(col("__rk").isNotNull || col("__b") === bucket(col(ts)))
      .drop("__b", "__rk", "__rb", "__rts")
      .withColumnRenamed("__row", "range_match")
  }
}
