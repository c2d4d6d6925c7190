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

  /** Open a directory of record parquet files as a stream. No `dim`
    * parameter on purpose — width is enforced at exactly ONE point, the
    * `Metric.validRecord` gate in [[validateAndAssign]] (same rationale
    * as [[recordSchema]]); a parameter here would misleadingly imply
    * read-time enforcement. */
  def readRecords(spark: SparkSession, dir: String, glob: String = "*.parquet"): DataFrame =
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
    validateAndAssign(readRecords(spark, dir), centroids, metric, dim)
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
    validateAndAssign(readRecords(spark, dir), centroids, metric, dim)
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
    val query = readRecords(spark, dir)
      .writeStream
      .foreachBatch((batch: DataFrame, _: Long) => state.processBatch(batch))
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
    state.attach(query)
    state
  }

  /** Query stream schema for [[startMipsServing]]: the batch MIPS
    * family's `(query_id, qvec)` shape. */
  val querySchema: StructType = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("qvec", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Streaming MIPS SERVING — the online half of the `ivf_mips_*`
    * family: query vectors stream in and every micro-batch is answered
    * against the STATIC norm-augmented index (augmented centroids +
    * original-embedding posting lists — built once per corpus version,
    * exactly the geometry the batch family probes). The per-batch
    * transform IS [[graft.operators.IvfIndex.queryMipsBatch]] — the
    * same operator the batch path runs, so stream == batch is by
    * construction (pinned in StreamingSpec, including across a restart
    * on the same checkpoint). No streaming state: the probe window is
    * bounded (|centroids| × |batch queries| rows), the rerank is the
    * two-phase bounded heap, throughput scales with executors, and the
    * index frames can be swapped between micro-batches (an index
    * refresh never restarts the serving job). Results land partitioned
    * by `batch_id` with dynamic overwrite, so an at-least-once
    * `foreachBatch` retry rewrites identical content instead of
    * duplicating answers. */
  def startMipsServing(
      spark: SparkSession,
      queryDir: String,
      augCentroids: DataFrame,
      assigned: DataFrame,
      resultPath: String,
      checkpointPath: String,
      k: Int = 5,
      probes: Int = 3): StreamingQuery =
    spark.readStream
      .schema(querySchema)
      .parquet(queryDir)
      .writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IvfIndex.queryMipsBatch(augCentroids, assigned, batch, k, probes)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(resultPath)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

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
    readRecords(spark, dir)
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
          // wedge every retry on "unable to infer schema". ONLY the two
          // no-state conditions map to None (the readNewestState
          // discipline) — any other analysis error (schema drift, a
          // misconfigured stateDir) must propagate: mapping it to None
          // would silently re-base the cumulative fold from the current
          // batch and break the streaming==batch moments law quietly
          val prior =
            try spark.read.parquet(stateDir)
              .where(col("batch_id") < batchId)
              .orderBy(col("batch_id").desc).limit(1)
              .select(col("n"), col("s1"), col("s2")).collect().headOption
            catch {
              case e: org.apache.spark.sql.AnalysisException
                  if e.getCondition == "PATH_NOT_FOUND" ||
                    e.getCondition == "UNABLE_TO_INFER_SCHEMA" => None
            }
          // zip would silently TRUNCATE on width mismatch — a monitor
          // restarted at a different dim than its state dir would mix
          // moments from two geometries into plausible-looking garbage
          prior.foreach { p =>
            require(p.getSeq[Long](1).length == bs1.length,
              s"drift state at $stateDir holds dim-${p.getSeq[Long](1).length} " +
                s"moments but the monitor is running at dim ${bs1.length}; " +
                "point it at a fresh stateDir or restart at the original dim")
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
  * `processBatch` never races itself. Reader methods (a monitoring or
  * serving thread) see a CONSISTENT view: centroids and store version
  * publish as one volatile pair — a reader can never pair refined
  * centroids with the previous store version (cluster ids that don't
  * exist in the data) — and the file-count watch reads a volatile
  * scalar, not the stream thread's working HashMap. */
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

  // (centroids, version) publish ATOMICALLY — one volatile read/write
  @volatile private var published: (DataFrame, Int) = (initialCentroids, 0)
  private def cents: DataFrame = published._1
  private def vers: Int = published._2
  // per-cluster suppression state: cluster id -> its size when a refine
  // pass failed to split it (degenerate duplicate-spam cluster). A
  // single global max would also suppress OTHER clusters that later
  // violate density below that max, skipping productive splits.
  @volatile private var failedAt = Map.empty[Int, Long]
  @volatile private var refines = 0
  @volatile private var compactions = 0
  @volatile private var fileCount = 0
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
      val v = versions.max
      // Refine/compact publish atomically (staged rename, data last),
      // so a listable version is complete — but the FIRST append into
      // v0 is the streaming engine's own parquet append, and a crash
      // there can leave the dir with only _temporary debris. Both
      // recovery reads therefore map exactly the two no-data analysis
      // errors to "empty"; anything else (schema drift, wrong dir)
      // still fails loudly.
      def orEmpty[T](read: => Seq[T]): Seq[T] =
        try read catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "PATH_NOT_FOUND" ||
                e.getCondition == "UNABLE_TO_INFER_SCHEMA" => Seq.empty
        }
      val c =
        if (fs.exists(new org.apache.hadoop.fs.Path(centroidsPath(v)))) {
          val rows = orEmpty(Seq(spark.read.parquet(centroidsPath(v))))
          rows.headOption.getOrElse(initialCentroids)
        } else initialCentroids
      published = (c, v)
      orEmpty(spark.read.parquet(storePath)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
        .collect().toSeq)
        .foreach(r => sizes(r.getInt(0)) = r.getLong(1))
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
    fileCount = clusterFiles.values.sum
  }

  private def centroidsPath(v: Int): String = s"$storeBase/centroids_v$v"

  private var query: StreamingQuery = _
  private[streaming] def attach(q: StreamingQuery): Unit = query = q

  /** The running stream (await it to drain an AvailableNow window). */
  def streamingQuery: StreamingQuery = query
  /** Current store version directory (readers open this). */
  def storePath: String = s"$storeBase/v$vers"
  /** Current index view over the store — probe with
    * [[graft.operators.IvfIndex.query]]. One volatile read: the
    * centroids and the store version are always from the SAME commit. */
  def model: IvfIndex.Model = {
    val (c, v) = published
    IvfIndex.Model(c, spark.read.parquet(s"$storeBase/v$v"))
  }
  /** How many automated refine passes have fired. */
  def refineCount: Int = refines
  /** How many automated small-file compactions have fired. */
  def compactionCount: Int = compactions
  /** Current data-file count across the store's cluster partitions
    * (volatile snapshot — safe against the stream thread's updates). */
  def storeFileCount: Int = fileCount

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
    fileCount = clusterFiles.values.sum
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

  /** Staged publish of the NEXT version (the [[graft.sources.Records]]
    * `restoreVersion` discipline): `write` fills hidden `.tmp` dirs,
    * then checked renames publish — centroids FIRST, data LAST — so the
    * version becomes listable (`listVersions` keys on `v\d+`) only with
    * its companion centroids already in place. A crash anywhere before
    * the final rename leaves only invisible staging debris, which the
    * next attempt deletes; a direct write to the listable path would
    * instead make a partial or centroid-less version the authoritative
    * newest version at restart. */
  private def publishVersion(next: Int)(write: (String, String) => Unit): Unit = {
    val fs = fileSystem
    val dtmp = new org.apache.hadoop.fs.Path(s"$storeBase/.v$next.tmp")
    val ctmp = new org.apache.hadoop.fs.Path(s"$storeBase/.centroids_v$next.tmp")
    fs.delete(dtmp, true) // stale staging from an earlier crash
    fs.delete(ctmp, true)
    write(dtmp.toString, ctmp.toString)
    // rename-into-existing-dir NESTS silently (posix mv semantics) —
    // delete any stale target from a crashed earlier attempt and fail
    // loudly if the rename itself reports false
    def publish(src: org.apache.hadoop.fs.Path, dstName: String): Unit = {
      val dst = new org.apache.hadoop.fs.Path(s"$storeBase/$dstName")
      fs.delete(dst, true)
      // soft-failed delete (dst still present) → the rename would nest
      require(!fs.exists(dst), s"delete $dst failed — refusing nested rename")
      require(fs.rename(src, dst), s"rename $src -> $dst failed")
    }
    publish(ctmp, s"centroids_v$next")
    publish(dtmp, s"v$next")
  }

  /** Layout-only rewrite: same rows, same assignment, same centroids —
    * the NEXT version directory holds one consolidated file per cluster
    * (`repartition(cluster_id)` puts each cluster in exactly one task).
    * Fires automatically when the data-file count exceeds
    * `maxStoreFiles`; [[refineNow]] subsumes it (its rewrite also
    * resets the layout), so at most one rewrite runs per batch. */
  private def compactNow(): Unit = {
    val next = vers + 1
    val snapshot = cents
    publishVersion(next) { (dataTmp, centTmp) =>
      spark.read.parquet(storePath)
        .repartition(col("cluster_id"))
        .write.mode("overwrite").partitionBy("cluster_id").parquet(dataTmp)
      snapshot.write.mode("overwrite").parquet(centTmp)
    }
    published = (snapshot, next)
    relistFiles()
    compactions += 1
  }

  private def refineNow(): Unit = {
    def truncate(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.PlanBridge.statsReset(df.localCheckpoint())
    var m = IvfIndex.Model(cents, spark.read.parquet(storePath))
    var rounds = 0
    var fixedPoint = false
    // per-round truncation — the buildBalanced discipline: each refine
    // round nests a union+join layer and the loop (plus the final
    // rewrite) actions the frame several times; raw, every action would
    // re-run the whole nested lineage from the parquet scan.
    // K-WAY splits (the buildBalanced operator), not binary refine: the
    // r13 duplicate-skew fixture showed binary 2-means peels background
    // off a duplicate-heavy ball a fringe at a time (farthest-point
    // seeds land on outliers; the tight ball drags both means), needing
    // rounds ∝ the co-resident population instead of log — a streaming
    // maintenance loop must restore density in O(log_maxWay) rounds of
    // the worst violation regardless of WHY the cluster is hot.
    while (!fixedPoint && rounds < maxRefineRounds) {
      IvfIndex.splitKWayKeepCache(m, density, metric, iters = 3,
          maxWay = IvfIndex.DefaultMaxWay) match {
        case None => fixedPoint = true
        case Some((refined, members)) =>
          m = IvfIndex.Model(refined.centroids, truncate(refined.assigned))
          members.unpersist() // checkpoint is materialized; cache done
          rounds += 1
      }
    }
    if (rounds == 0) {
      // no cluster could be split (refine's fixed point is the input):
      // a rewrite would copy the store for nothing, every batch — record
      // the failed violation size and keep serving the current version
      failedAt = sizes.filter(_._2 > density).toMap
      return
    }
    failedAt = Map.empty
    val next = vers + 1
    publishVersion(next) { (dataTmp, centTmp) =>
      m.assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(dataTmp)
      m.centroids.write.mode("overwrite").parquet(centTmp)
    }
    val recovered = spark.read.parquet(centroidsPath(next))
    // re-seed the running sizes from the rewritten store's partition
    // column only (footer-cheap; bounded output by cluster count)
    val refinedCounts = spark.read.parquet(s"$storeBase/v$next")
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    sizes.clear()
    refinedCounts.foreach { case (c, n) => sizes(c) = n }
    // clusters STILL violating after a pass that reached its fixed point
    // (not the round cap) are exactly the unsplittable ones — record
    // them so the next batch doesn't burn a refine attempt rediscovering
    // that; a round-capped pass leaves them re-attemptable
    if (fixedPoint) failedAt = sizes.filter(_._2 > density).toMap
    // subsequent batches assign against the PERSISTED centroids — a flat
    // parquet scan, not the refine loop's lineage — and centroids+version
    // publish as ONE volatile pair (reader consistency)
    published = (recovered, next)
    relistFiles()
    refines += 1
  }
}
