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

  /** Record stream schema: the canonical record frame. Width-independent
    * on purpose — a parquet schema cannot constrain array length, so
    * vector width is enforced at exactly ONE point, the
    * `Metric.validRecord` gate in [[validateAndAssign]] (a `dim`
    * parameter here would misleadingly imply read-time enforcement). */
  val recordSchema: StructType = StructType(Seq(
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
      // full ingest gate: dimension AND component domain — one corrupt
      // magnitude would otherwise long-overflow the exact-quantized
      // dashboards downstream (adversarial-data finding, r8)
      newRecords.where(Metric.validRecord(col("embedding"), dim)),
      centroids, metric)

  /** Open a directory of record parquet files as a stream. */
  def readRecords(spark: SparkSession, dir: String, dim: Int, glob: String = "*.parquet"): DataFrame =
    spark.readStream
      .schema(recordSchema)
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

  /** JSONL ingest with a QUARANTINE lane — the interchange-format edge
    * of the insert path: lines stream in as PERMISSIVE-parsed JSON,
    * [[graft.sources.Records.splitValidated]] (ONE definition with the
    * batch reader) routes insert-ready rows to the record store and
    * unparseable / wrong-dimension / null-id lines — raw, verbatim — to
    * a quarantine directory for triage, instead of failing the job or
    * silently dropping. `foreachBatch` + per-batch `batch_id` column:
    * the dual-sink write is idempotent under micro-batch replay (a
    * replayed batch overwrites its own partition, the standard
    * exactly-once recipe when one stream feeds two sinks — the built-in
    * file sink's commit log covers only single-sink jobs). */
  def startJsonlQuarantined(
      spark: SparkSession,
      dir: String,
      dim: Int,
      goodPath: String,
      quarantinePath: String,
      checkpointPath: String): StreamingQuery =
    spark.readStream
      .schema(graft.sources.Records.jsonlSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
      .writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // both lanes filter the SAME parsed frame — persist it once so
        // the dual-sink write parses each source file once, not twice
        val parsed = batch.persist()
        try {
          val (good, bad) = graft.sources.Records.splitValidated(parsed, dim)
          good.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(goodPath)
          bad.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(quarantinePath)
        } finally parsed.unpersist()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Ingest with AUTOMATED index maintenance — the reference's
    * insert→adaptive-split lifecycle (`src/cores/database.rs:227-254` →
    * `src/cores/index.rs:127-132`) as one callable production job,
    * instead of a refine the operator must remember to schedule.
    *
    * Each micro-batch is validated + assigned against the CURRENT
    * centroids and appended to the current version of the
    * `cluster_id`-partitioned store. The batch hook then checks the
    * density contract from a driver-side running size map (updated from
    * the batch's per-cluster counts — bounded by cluster count, never a
    * store rescan), and when any cluster exceeds `density` it runs
    * [[graft.operators.IvfIndex.refine]] to its fixed point, writes the
    * refined index as the NEXT store version directory, and swaps
    * centroids + store path for subsequent batches and readers — the
    * batch analog of the reference's per-insert adaptive split, amortized
    * to once per violation instead of once per record.
    *
    * Consistency note: the plain file-sink path
    * ([[startToPartitionedStore]]) gets exactly-once appends from the
    * sink's commit log; `foreachBatch` + rewrite is at-least-once on
    * batch retry (a retried batch may re-append). The versioned-directory
    * swap keeps refines atomic for readers — a version directory is
    * either fully written by [[graft.operators.IvfIndex.writePartitioned]]
    * or not yet current.
    */
  def startMaintained(
      spark: SparkSession,
      dir: String,
      initialCentroids: DataFrame,
      metric: Metric,
      dim: Int,
      storeBase: String,
      checkpointPath: String,
      density: Int,
      maxRefineRounds: Int = 16,
      maxStoreFiles: Int = 0): MaintainedIngest = {
    val state = new MaintainedIngest(spark, initialCentroids, metric, dim,
      storeBase, density, maxRefineRounds, maxStoreFiles)
    val query = readRecords(spark, dir, dim)
      .writeStream
      .foreachBatch((batch: DataFrame, _: Long) => state.processBatch(batch))
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
    state.attach(query)
    state
  }

  /** Streaming embedding-DRIFT monitor: per micro-batch, fold the
    * batch's exact integer Gram partials
    * ([[graft.functions.GramSumAgg]]) into a durable cumulative moment
    * state, refit the top principal component from the moments (driver
    * math — no second distributed pass), and record how far the
    * corpus's dominant direction has rotated from `baseline` (the
    * |cosine| of the current top loadings against it). The alert
    * condition "a new source is bending the embedding space" is then a
    * threshold on the newest row.
    *
    * Exactness law (pinned in StreamingSpec): the cumulative moments
    * are exact integer sums, so after any sequence of micro-batches
    * they EQUAL the single-pass batch moments over the union — the
    * streaming and batch fits are indistinguishable, not approximately
    * so.
    *
    * State layout: one row per processed batch under `stateDir`,
    * partitioned by `batch_id` (cumulative `n`/`s1`/`s2` plus the
    * fitted `cos_top`/`share_top`) — a self-describing audit trail
    * whose newest row is the current state. Each batch reads the
    * newest row with `batch_id < current` and dynamically overwrites
    * its own partition, so an at-least-once `foreachBatch` retry
    * recomputes identical content instead of double-counting. */
  def startDriftMonitor(
      spark: SparkSession,
      dir: String,
      dim: Int,
      baseline: Seq[Double],
      stateDir: String,
      checkpointPath: String,
      iters: Int = 24): StreamingQuery = {
    require(baseline.length == dim, "baseline loading width must match dim")
    readRecords(spark, dir, dim)
      .writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val g = batch
          .where(Metric.validRecord(col("embedding"), dim))
          .agg(graft.functions.GramSumAgg.gramSum(
            graft.operators.VectorOps.quantizeQ3(col("embedding"))).as("g"))
          .select(col("g.n"), col("g.s1"), col("g.s2")).head()
        if (!g.isNullAt(0)) { // empty batch: nothing to fold
          val bn = g.getLong(0)
          val bs1 = g.getSeq[Long](1)
          val bs2 = g.getSeq[Long](2)
          // a crashed FIRST write can leave stateDir existing but with
          // no committed parquet; an existence check alone would then
          // wedge every retry on "unable to infer schema" — treat any
          // unreadable state as absent instead
          val prior =
            try spark.read.parquet(stateDir)
              .where(col("batch_id") < batchId)
              .orderBy(col("batch_id").desc).limit(1)
              .select(col("n"), col("s1"), col("s2")).collect().headOption
            catch {
              case _: org.apache.spark.sql.AnalysisException => None
            }
          val n = prior.map(_.getLong(0)).getOrElse(0L) + bn
          val s1 = prior.map(_.getSeq[Long](1).zip(bs1).map(t => t._1 + t._2))
            .getOrElse(bs1)
          val s2 = prior.map(_.getSeq[Long](2).zip(bs2).map(t => t._1 + t._2))
            .getOrElse(bs2)
          val (xs, share) =
            graft.operators.VectorOps.pcaFromMoments(n, s1, s2, 1, iters).head
          val cos = math.abs(xs.zip(baseline)
            .foldLeft(0.0)((acc, t) => acc + t._1 * t._2))
          import spark.implicits._
          Seq((batchId, n, s1, s2, cos, share))
            .toDF("batch_id", "n", "s1", "s2", "cos_top", "share_top")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(stateDir)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}

/** Mutable driver-side state of a [[VectorIngest.startMaintained]] job:
  * the current centroids, store version, and per-cluster running sizes.
  * Micro-batches are processed sequentially by the streaming engine, so
  * `processBatch` never races itself; reader methods are volatile-safe. */
final class MaintainedIngest private[streaming] (
    spark: SparkSession,
    initialCentroids: DataFrame,
    metric: Metric,
    dim: Int,
    storeBase: String,
    density: Int,
    maxRefineRounds: Int,
    maxStoreFiles: Int = 0) {
  import org.apache.spark.sql.functions.{col, count, lit}

  @volatile private var vers = 0
  // per-cluster suppression state: cluster id -> its size when a refine
  // pass failed to split it (degenerate duplicate-spam cluster). A
  // single global max would also suppress OTHER clusters that later
  // violate density below that max, skipping productive splits.
  @volatile private var failedAt = Map.empty[Int, Long]
  @volatile private var cents = initialCentroids
  @volatile private var refines = 0
  @volatile private var compactions = 0
  private val sizes = scala.collection.mutable.HashMap.empty[Int, Long]
  // Exact per-cluster FILE counts for the small-file watch: refreshed
  // per batch by listing ONLY the cluster directories that batch
  // touched (bounded by touched clusters, never the store), fully
  // re-listed on restart and after each rewrite. File growth is
  // otherwise unbounded when density never trips (each micro-batch
  // appends up to tasks×clusters files) — the complementary
  // maintenance hazard to cluster density.
  private val clusterFiles = scala.collection.mutable.HashMap.empty[Int, Int]

  // Restart recovery: the store version, its centroids, and the running
  // sizes all have durable sources of truth (version directories, the
  // per-version centroids parquet, the store's partition column), so a
  // restarted job resumes from the latest refined state instead of
  // silently re-assigning against stale initial centroids or missing a
  // density violation that predates the restart.
  locally {
    val p = new org.apache.hadoop.fs.Path(storeBase)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ONE version-listing definition across the lifecycle tools
    val versions = graft.sources.Records.listVersions(fs, storeBase)
    if (versions.nonEmpty) {
      vers = versions.max
      if (fs.exists(new org.apache.hadoop.fs.Path(centroidsPath(vers))))
        cents = spark.read.parquet(centroidsPath(vers))
      spark.read.parquet(storePath)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
        .collect().foreach(r => sizes(r.getInt(0)) = r.getLong(1))
      relistFiles()
    }
  }

  private def fileSystem = new org.apache.hadoop.fs.Path(storeBase)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Data files in one cluster partition directory (0 if absent). */
  private def listClusterFiles(cluster: Int): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$storePath/cluster_id=$cluster")
    val fs = fileSystem
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(s => s.isFile && !s.getPath.getName.startsWith("_")
      && !s.getPath.getName.startsWith("."))
  }

  /** Full re-list of per-cluster file counts (restart / post-rewrite). */
  private def relistFiles(): Unit = {
    clusterFiles.clear()
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = fileSystem
    if (fs.exists(p))
      fs.listStatus(p).filter(s => s.isDirectory && s.getPath.getName.startsWith("cluster_id="))
        .foreach { d =>
          val c = d.getPath.getName.stripPrefix("cluster_id=").toInt
          clusterFiles(c) = fs.listStatus(d.getPath)
            .count(s => s.isFile && !s.getPath.getName.startsWith("_")
              && !s.getPath.getName.startsWith("."))
        }
  }

  private def centroidsPath(v: Int): String = s"$storeBase/centroids_v$v"

  private var query: StreamingQuery = _
  private[streaming] def attach(q: StreamingQuery): Unit = query = q

  /** The running stream (await it to drain an AvailableNow window). */
  def streamingQuery: StreamingQuery = query
  /** Current store version directory (readers open this). */
  def storePath: String = s"$storeBase/v$vers"
  /** Current index view over the store — probe with [[graft.operators.IvfIndex.query]]. */
  def model: IvfIndex.Model = IvfIndex.Model(cents, spark.read.parquet(storePath))
  /** How many automated refine passes have fired. */
  def refineCount: Int = refines
  /** How many automated small-file compactions have fired. */
  def compactionCount: Int = compactions
  /** Current data-file count across the store's cluster partitions. */
  def storeFileCount: Int = clusterFiles.values.sum

  private[streaming] def processBatch(batch: DataFrame): Unit = {
    val assigned = VectorIngest.validateAndAssign(batch, cents, metric, dim)
      .persist()
    val touched = try {
      assigned.write.mode("append").partitionBy("cluster_id").parquet(storePath)
      val batchCounts = assigned
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1))
      batchCounts.foreach { case (c, n) => sizes(c) = sizes.getOrElse(c, 0L) + n }
      batchCounts.map(_._1)
    } finally assigned.unpersist()
    touched.foreach(c => clusterFiles(c) = listClusterFiles(c))
    // failedAt: a violating cluster a refine pass could not split
    // (degenerate duplicate-spam cluster) must not re-fire a full-store
    // rewrite on every batch — suppress THAT cluster until its violation
    // grows, but let any other cluster's fresh violation trigger refine
    val violating = sizes.filter(_._2 > density)
    val actionable = violating.exists { case (c, n) =>
      failedAt.get(c).forall(n > _)
    }
    if (actionable) refineNow()
    else if (maxStoreFiles > 0 && storeFileCount > maxStoreFiles) compactNow()
  }

  /** Layout-only rewrite: same rows, same assignment, same centroids —
    * the NEXT version directory holds one consolidated file per cluster
    * (`repartition(cluster_id)` puts each cluster in exactly one task).
    * Fires automatically when the data-file count exceeds
    * `maxStoreFiles`; [[refineNow]] subsumes it (its rewrite also
    * resets the layout), so at most one rewrite runs per batch. */
  private def compactNow(): Unit = {
    val next = vers + 1
    val nextPath = s"$storeBase/v$next"
    spark.read.parquet(storePath)
      .repartition(col("cluster_id"))
      .write.mode("overwrite").partitionBy("cluster_id").parquet(nextPath)
    cents.write.mode("overwrite").parquet(centroidsPath(next))
    vers = next
    relistFiles()
    compactions += 1
  }

  private def refineNow(): Unit = {
    val initial = IvfIndex.Model(cents, spark.read.parquet(storePath))
    var m = initial
    var prev: IvfIndex.Model = null
    var rounds = 0
    while (!(m eq prev) && rounds < maxRefineRounds) {
      prev = m
      m = IvfIndex.refine(m, density, metric)
      rounds += 1
    }
    if (m eq initial) {
      // no cluster could be split (refine's fixed point is the input):
      // a rewrite would copy the store for nothing, every batch — record
      // the failed violation size and keep serving the current version
      failedAt = sizes.filter(_._2 > density).toMap
      return
    }
    failedAt = Map.empty
    val next = vers + 1
    val nextPath = s"$storeBase/v$next"
    IvfIndex.writePartitioned(m, nextPath)
    m.centroids.write.mode("overwrite").parquet(centroidsPath(next))
    val recovered = spark.read.parquet(centroidsPath(next))
    // re-seed the running sizes from the rewritten store's partition
    // column only (footer-cheap; bounded output by cluster count)
    val refinedCounts = spark.read.parquet(nextPath)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    sizes.clear()
    refinedCounts.foreach { case (c, n) => sizes(c) = n }
    // clusters STILL violating after a pass that reached its fixed point
    // (m eq prev, not the round cap) are exactly the unsplittable ones —
    // record them so the next batch doesn't burn a refine attempt
    // rediscovering that; a round-capped pass leaves them re-attemptable
    if (m eq prev) failedAt = sizes.filter(_._2 > density).toMap
    // subsequent batches assign against the PERSISTED centroids — a flat
    // parquet scan, not the refine loop's lineage
    cents = recovered
    vers = next
    relistFiles()
    refines += 1
  }
}
