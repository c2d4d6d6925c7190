package graft.streaming

import graft.operators.IvfIndex
import graft.types.Metric
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming INSERT path: the reference's `Insert` RPC
  * (`src/cores/database.rs:227-254` — validate dimension, assign to the
  * nearest centroid, append) re-expressed as a continuous micro-batch
  * pipeline over a record stream.
  *
  * Each micro-batch is validated (wrong-width vectors REJECTED — O20,
  * `database.rs:189-199`) and assigned against the broadcast centroids: a
  * map-only stream-static transform — no streaming state, no shuffle, so
  * ingest throughput scales with executor count and is unaffected by
  * index size. Appending to the `cluster_id`-partitioned store and
  * periodically rebuilding centroids (the batch analog of the reference's
  * adaptive per-insert splits, SURVEY.md §2 O9) happens in the sink job /
  * maintenance schedule, not per record.
  */
object VectorIngest {

  /** Record stream schema: the canonical record frame. */
  def recordSchema(dim: Int): StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("metadata", MapType(StringType, StringType), nullable = true)))

  /** Validate + assign one (possibly streaming) record frame against
    * fixed centroids. Works identically on batch and streaming inputs —
    * the transform is stateless. */
  def validateAndAssign(
      newRecords: DataFrame,
      centroids: DataFrame,
      metric: Metric,
      dim: Int): DataFrame =
    IvfIndex.assign(
      newRecords.where(Metric.validDimension(col("embedding"), dim)),
      centroids, metric)

  /** Open a directory of record parquet files as a stream. */
  def readRecords(spark: SparkSession, dir: String, dim: Int, glob: String = "*.parquet"): DataFrame =
    spark.readStream
      .schema(recordSchema(dim))
      .option("pathGlobFilter", glob)
      .parquet(dir)

  /** Stream-assign into a memory sink for inspection/testing; production
    * sinks use [[startToPartitionedStore]]. */
  def startToMemory(
      spark: SparkSession,
      dir: String,
      centroids: DataFrame,
      metric: Metric,
      dim: Int,
      name: String): StreamingQuery =
    validateAndAssign(readRecords(spark, dir, dim), centroids, metric, dim)
      .select(col("id"), col("cluster_id"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The PRODUCTION write path — the reference's insert RPC
    * (`src/cores/database.rs:227-254`: validate, assign, append) in
    * continuous form: each micro-batch is validated + assigned (map-only,
    * no state) and appended to the `cluster_id`-partitioned parquet store
    * ([[graft.operators.IvfIndex.writePartitioned]]'s layout), so probe
    * queries over the store keep their partition-pruning path while
    * ingest is running. The built-in parquet file sink gives exactly-once
    * appends via its commit log (`_spark_metadata`) — a failed batch
    * never double-writes. Periodic [[graft.operators.IvfIndex.refine]]
    * over the store is the maintenance half of the reference's adaptive
    * split (run it between ingest windows, not per record). */
  def startToPartitionedStore(
      spark: SparkSession,
      dir: String,
      centroids: DataFrame,
      metric: Metric,
      dim: Int,
      storePath: String,
      checkpointPath: String): StreamingQuery =
    validateAndAssign(readRecords(spark, dir, dim), centroids, metric, dim)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", storePath)
      .option("checkpointLocation", checkpointPath)
      .partitionBy("cluster_id")
      .trigger(Trigger.AvailableNow())
      .start()
}
