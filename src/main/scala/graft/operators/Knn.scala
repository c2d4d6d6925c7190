package graft.operators

import graft.types.Metric
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact k-nearest-neighbor search (reference `src/cores/index.rs:168-214`,
  * minus the IVF pruning which lives in [[IvfIndex]]).
  *
  * Semantics reproduced from the reference:
  *   - NaN / failed distances are skipped (`index.rs:189-193`);
  *   - candidates with `distance > radius` are dropped — strictly-greater
  *     exclusion, i.e. `<=` inclusive (`index.rs:197`); default radius ∞
  *     (`database.rs:35-42`);
  *   - the metadata filter gates BEFORE the top-k heap (`index.rs:197-199`);
  *   - results ascend by distance (`index.rs:213`), with `id` as a
  *     deterministic tiebreak (our addition, for reproducibility);
  *   - result shape is `(id, metadata, distance)` — vector excluded
  *     (`src/cores/index.rs:8-12,13-40`).
  *
  * Scale notes: `orderBy(distance).limit(k)` plans as
  * `TakeOrderedAndProject` — a bounded per-partition heap merged at the
  * driver, the distributed analog of the reference's size-k+1 BinaryHeap
  * (`index.rs:201-209`); no full sort, no full shuffle, driver traffic is
  * k rows per partition. The filter and radius predicates sit below the
  * top-k so Catalyst fuses scan→distance→filter→heap in one codegen stage.
  */
object Knn {

  /** Single-query search. `query` is a one-row frame with column `qvec`
    * (kept as a frame, not a collected literal, so the same code path works
    * when the query vector is itself the result of a computation). It is
    * broadcast — never a shuffle. */
  def search(
      records: DataFrame,
      query: DataFrame,
      k: Int,
      metric: Metric = Metric.Euclidean,
      radius: Double = Double.PositiveInfinity,
      filter: Column = lit(true)): DataFrame = {
    require(k > 0, "k must be positive") // reference database.rs:321-325
    val dist = metric.distance(col("embedding"), col("qvec"))
    records
      .crossJoin(broadcast(query))
      .withColumn("distance", dist)
      .where(!isnan(col("distance")) && col("distance") <= lit(radius))
      .where(filter)
      .orderBy(col("distance").asc, col("id").asc)
      .limit(k)
      .select(col("id"), col("metadata"), col("distance"))
  }

  /** Many-queries batch search: `queries(query_id, qvec)` × records, top-k
    * per query via a ranking window. The window shuffles on `query_id`,
    * which is the right partitioning at scale (each query's candidate set
    * lands on one executor); the candidate generation itself is a broadcast
    * of the (small) query set against the (huge) record table. */
  def searchBatch(
      records: DataFrame,
      queries: DataFrame,
      k: Int,
      metric: Metric = Metric.Euclidean,
      radius: Double = Double.PositiveInfinity,
      filter: Column = lit(true)): DataFrame = {
    require(k > 0, "k must be positive")
    val dist = metric.distance(col("embedding"), col("qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("distance").asc, col("id").asc)
    records
      .crossJoin(broadcast(queries))
      .withColumn("distance", dist)
      .where(!isnan(col("distance")) && col("distance") <= lit(radius))
      .where(filter)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= lit(k))
      .select(col("query_id"), col("id"), col("metadata"), col("distance"))
  }
}
