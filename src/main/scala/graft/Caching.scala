package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel

/** Scoped-persist helper shared by the operators that cache reusable
  * intermediates ([[operators.Dedup]]'s signature/candidate frames,
  * [[streaming.DocIngest.corpusIndex]], [[Queries]]' fixed-model
  * assignment).
  *
  * `DataFrame.storageLevel` resolves through the session's CacheManager
  * BY LOGICAL PLAN, so a fresh frame whose plan is already cached (a
  * second invocation of the same operator over the same input — every
  * repeated bench/serving query) reports the existing level and is NOT
  * re-persisted. That removes the `CacheManager: Asked to cache already
  * cached data` warning spam AND stops duplicate cache registrations
  * from accumulating over a long-lived session: each distinct plan is
  * registered once, reused thereafter, and reclaimable by one
  * `spark.catalog.clearCache()` (or targeted unpersist) when the caller
  * is done with the query family. Frames cleared that way simply
  * re-persist on next use.
  */
object Caching {

  /** Persist `df` at MEMORY_AND_DISK unless its plan is already cached
    * in this session; returns `df` for chaining. */
  def ensureCached(df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    df
  }

  /** Repartition `df` on `key` ONLY when its planned partition count is
    * below the session's parallelism floor — the conditional form of the
    * "single-file input → spread CPU work" repartition the CPU-heavy
    * text queries used to apply UNCONDITIONALLY. Unconditional was wrong
    * at scale: a 100 TB documents table arrives in thousands of splits,
    * and a blanket `repartition(doc_id)` is a full shuffle OF THE TEXT
    * COLUMN (banned — text moves through shuffle exactly never; only
    * hashes/ids do) that buys nothing the scan's own parallelism doesn't
    * already provide. Narrow inputs — a single-file local fixture, a
    * tiny micro-batch — still get spread so per-row CPU kernels
    * (tokenize, hash, quality) use every core.
    *
    * `df.rdd.getNumPartitions` plans the physical scan (file listing +
    * split arithmetic — no job, no data read) — the same number of
    * input tasks Spark would launch; `>= floor` means the scan is
    * already as parallel as the session can exploit, and the returned
    * frame is `df` itself (reference-equal), so the no-shuffle plan
    * shape is pinnable (PlanShapeSpec). */
  def spreadIfNarrow(df: DataFrame, key: Column): DataFrame =
    if (df.isStreaming)
      // a streaming plan has no resolvable partition count at build time
      // (`.rdd` throws); micro-batches are bounded by the trigger, so the
      // unconditional spread is a bounded per-batch cost, not a corpus
      // shuffle — foreachBatch sinks pass their (batch) frame here and
      // take the conditional path instead
      df.repartition(key)
    else {
      val floor = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= floor) df
      else df.repartition(floor, key)
    }
}
