package graft

import org.apache.spark.sql.DataFrame
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
}
