package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Date-partitioned event-log layout: the time axis's answer to
  * [[Records.snapshotById]]'s id axis.
  *
  * The reference has no event log (its `events` are CRUD mutations), but
  * any 100 TB analytics deployment of this engine appends events forever
  * and queries them by time window. Layout, not hints, makes that cheap:
  * `event_date` as a partition directory turns a date predicate into
  * STATIC pruning (non-matching days never become splits at planning
  * time), and ts-sorted rows inside each file turn the residual
  * timestamp predicate into row-group pruning via parquet min/max. A
  * 30-day scan of a 10-year log then reads 30 directories — the layout
  * does the work a time index would.
  *
  * All date arithmetic (the derived partition value AND the pruning
  * predicate) runs in the session time zone, so the mapping is
  * consistent by construction: the partition filter only PRUNES —
  * row-level correctness always comes from the `ts` predicate itself.
  */
object EventLog {

  /** Write `events` partitioned by calendar day of `ts`, `filesPerDay`
    * files per day, rows ts-sorted within each file. `filesPerDay`
    * scales write parallelism and file sizes: one file per day is right
    * when a day fits an executor; a 100 TB/year log wants enough files
    * that each stays near the row-group sweet spot (the spreader key is
    * a hash of `event_id`, so files within a day are balanced). */
  def snapshotByDay(events: DataFrame, path: String, filesPerDay: Int = 1): Unit = {
    require(filesPerDay > 0, s"filesPerDay must be positive, got $filesPerDay")
    events
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"),
        pmod(xxhash64(col("event_id")), lit(filesPerDay.toLong)))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").partitionBy("event_date").parquet(path)
  }

  /** Streaming append into the same day-partitioned layout: the
    * production shape of this store is a forever-running ingest, not a
    * batch snapshot. Exactly-once via the parquet sink's checkpoint +
    * file-manifest commit protocol; each micro-batch lands its rows
    * under the right `event_date=` directories, so [[timeRange]] reads
    * (and their static pruning) work identically over streamed and
    * snapshotted stores. Late events simply land in their own (older)
    * day directory — the layout is event-time-correct without any
    * watermark. Streaming appends accrete files per (batch × day);
    * periodic re-layout via [[snapshotByDay]] over [[open]] is the
    * compaction story, same as the record store's compactTo. */
  def appendStream(events: DataFrame, path: String, checkpoint: String): StreamingQuery =
    events
      .withColumn("event_date", to_date(col("ts")))
      .writeStream
      .partitionBy("event_date")
      .format("parquet")
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start(path)

  /** Open a [[snapshotByDay]] store as the canonical event frame (the
    * physical `event_date` column is dropped; use [[timeRange]] for
    * pruned window reads). */
  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("event_date")

  /** Pruned half-open time-window read: `from <= ts < until`. Constrains
    * BOTH the partition column (only the window's days survive planning
    * — `to_date` is monotone in ts, so the day range covers the window
    * in any session time zone) and `ts` itself (exact row filtering +
    * row-group pruning off the in-file sort). Plan shape pinned in
    * PlanShapeSpec: the scan's numFiles is the window's day count, not
    * the store's. */
  def timeRange(spark: SparkSession, path: String, from: String, until: String): DataFrame = {
    val lo = to_timestamp(lit(from))
    val hi = to_timestamp(lit(until))
    spark.read.parquet(path)
      .where(col("event_date").between(to_date(lo), to_date(hi)) &&
        col("ts") >= lo && col("ts") < hi)
      .drop("event_date")
  }
}
