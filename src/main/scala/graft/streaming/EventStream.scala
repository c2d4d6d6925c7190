package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming ingest of the `events` table.
  *
  * The reference has no streaming operators (SURVEY.md §2.2) — its only
  * periodic behavior is the 600 s snapshot thread (`src/main.rs:57-61`).
  * This module is the north-star extension: the same windowed aggregation
  * [[graft.Queries]] runs in batch (`events_window_agg`), executed as an
  * incremental streaming query with event-time watermarking, so batch and
  * stream share one semantic definition (verified equal in ScalaTest).
  *
  * Scale notes: the aggregation state is keyed by (window, event_type) —
  * bounded by the watermark horizon; at 100 TB/day the same plan shards
  * state across executors via the shuffle on the group key, and the
  * 10-minute watermark bounds state size regardless of input volume.
  */
object EventStream {

  /** Events schema as stored (ts arrives as int64 nanos — see
    * [[graft.Queries]] events note). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The shared transformation: hourly tumbling window per event type. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("value_sum"))

  /** Per-user sessionization via the built-in `session_window` operator —
    * events within `gap` of the session's end extend it; a gap of `gap`
    * or more closes it (half-open `[start, last_ts + gap)` windows).
    * Identical semantics in batch and streaming; in streaming, state per
    * open session is bounded by the watermark horizon and sharded by the
    * group key, the `mapGroupsWithState` state pattern without the
    * hand-rolled state machine. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("value_sum"))

  /** Open the events dir as a stream (file-source; at scale this is the
    * same code against Kafka — only the `format` changes). The testdata
    * layout is one FILE per table, and FileStreamSource wants a directory,
    * so stream the directory with a glob filter. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(rawSchema) // explicit BIGINT ts — no session config needed
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Run the streaming aggregation into an in-memory sink and return the
    * query handle (caller calls `processAllAvailable()` then reads the
    * `queryName` table). Update mode: windows re-emit as they refine. */
  def startToMemory(spark: SparkSession, dir: String, name: String): StreamingQuery =
    hourlyAgg(readEvents(spark, dir))
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream-static enrichment: attach a per-key dimension snapshot (the
    * batch-computed latest value per key — the serving-time feature
    * snapshot) to each arriving event. A stream-static left equi-join is
    * stateless (no watermark, no state store) and its per-batch cost is
    * independent of stream history — the streaming counterpart of
    * [[graft.operators.Temporal.asofJoin]] at snapshot granularity (the
    * union+window trick needs a total order, which an unbounded stream
    * cannot provide; production re-broadcasts the snapshot on the dim's
    * refresh cadence). */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** The dimension snapshot [[enrichWithDim]] expects: latest value per
    * key from a batch table (max_by reduction — no window); ties on `ts`
    * break deterministically by `tieBreak`. */
  def latestPerKey(batch: DataFrame, key: String, ts: String,
      tieBreak: String, valueCols: Seq[String]): DataFrame =
    batch.groupBy(col(key))
      .agg(max_by(struct(valueCols.map(col): _*),
        struct(col(ts), col(tieBreak))).as("__v"))
      .select(col(key) +: valueCols.map(c => col(s"__v.$c").as(s"dim_$c")): _*)

  /** Streaming sessionization into a memory sink. APPEND mode — the only
    * mode streaming session windows support: a session row is emitted
    * exactly once, when the watermark passes its end. Sessions still open
    * within the watermark horizon of the last event stay in state (they
    * would close on further input), so a drained bounded stream emits a
    * strict subset of the batch result — asserted in StreamingSpec. */
  def startSessionsToMemory(spark: SparkSession, dir: String, name: String): StreamingQuery =
    sessionAgg(readEvents(spark, dir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
}
