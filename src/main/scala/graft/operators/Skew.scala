package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-defeating join shapes.
  *
  * Spark's shuffle hash-partitions join keys, so ONE whale key (a bot
  * user with 10⁷ events, a boilerplate domain with 10⁸ pages) lands its
  * entire row set in a single task — the straggler that stalls a
  * 1000-executor stage behind one core. The escape ladder, cheapest
  * first:
  *
  *   1. `broadcast(dim)` — only when the dim side is truly small.
  *   2. AQE skew-join (`spark.sql.adaptive.skewJoin`) — splits oversized
  *      PARTITIONS at runtime, but only helps sort-merge joins and only
  *      when the skew is visible in partition sizes.
  *   3. SALTING ([[saltedEquiJoin]]) — splits oversized KEYS: exact,
  *      planner-independent, works for any equi-join where one side can
  *      be replicated `salts`-fold. This is the tool when the dim side
  *      is data-proportional (too big to broadcast) AND the fact side
  *      carries whale keys.
  *
  * The reference has no distributed-join surface (single-node serving,
  * `/root/reference/src/cores/database.rs`); this operator is
  * brief-driven 100 TB machinery.
  *
  * == AQE-vs-salting decision table ==
  *
  * When does AQE's skew-join (rung 2) actually save you, and when must
  * you salt (rung 3)? AQE splits a sort-merge join's shuffle PARTITION
  * only when that partition exceeds BOTH
  * `skewedPartitionFactor × median partition size` AND
  * `skewedPartitionThresholdInBytes` (default 256 MB) — and only for
  * sort-merge joins it can re-plan.
  *
  * | situation                                   | tool               |
  * |---------------------------------------------|--------------------|
  * | dim fits the broadcast threshold            | `broadcast(dim)` — no shuffle at all |
  * | whale partition > 256 MB, sort-merge join   | AQE skew-join (free, runtime) |
  * | whale key big enough to straggle but its    | SALT — AQE never   |
  * |   partition is below the byte threshold     |   sees it          |
  * | broadcast-ineligible dim + whale fact keys  | SALT — AQE's split |
  * |   (THE salting case)                        |   still sorts the whale once |
  * | skew on the BUILD side of a hash join       | SALT — AQE splits  |
  * |                                             |   stream side only |
  * | non-equi / as-of joins                      | chunkSec segmentation ([[Temporal]]) |
  *
  * The straggler arithmetic is row-count, not bytes: a 10⁷-row whale of
  * 20-byte rows is ~200 MB — under AQE's default byte threshold, yet
  * ~30× a 1000-task stage's fair share. [[skewProfile]] measures the
  * key histogram's head; [[recommendSalts]] turns the whale count into
  * a salt count (PlanShapeSpec pins a shape where AQE reports no skew
  * split while the salted plan spreads the whale).
  */
object Skew {

  /** Top-`topN` heaviest join keys with their row counts — the
    * measurement that decides the ladder rung. One narrow shuffle of
    * (key, partial count) pairs + a bounded TakeOrdered head; never the
    * rows themselves. NULL keys are excluded: they never match an
    * equi-join anyway (and would otherwise dominate many real logs). */
  def skewProfile(facts: DataFrame, key: String, topN: Int = 20): DataFrame =
    facts.where(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key).asc)
      .limit(topN)

  /** Salt count that caps the heaviest key at ~`targetRowsPerTask` rows
    * per task: `ceil(max key count / target)`, clamped to [1, maxSalts].
    * 1 means "don't salt" (no whale — the plain join is already
    * balanced; salting anyway would only replicate the dim). The
    * driver-side state is ONE scalar (the max group count — bounded,
    * rule 19a); at 100 TB the same number falls out of the shuffle-write
    * metrics of any previous run over the table. `maxSalts` bounds the
    * dim replication factor — the cost side of the trade. */
  def recommendSalts(
      facts: DataFrame,
      key: String,
      targetRowsPerTask: Long = 1000000L,
      maxSalts: Int = 256): Int = {
    require(targetRowsPerTask > 0,
      s"targetRowsPerTask must be positive, got $targetRowsPerTask")
    require(maxSalts >= 1, s"maxSalts must be >= 1, got $maxSalts")
    val row = facts.where(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).head()
    val maxN = if (row.isNullAt(0)) 0L else row.getLong(0)
    val want = (maxN + targetRowsPerTask - 1) / targetRowsPerTask
    math.max(1L, math.min(maxSalts.toLong, want)).toInt
  }

  /** Equi-join `facts ⋈ dim` on `key`, with each key's fact rows SPREAD
    * across `salts` shuffle partitions: the dim side is replicated once
    * per salt (explode over 0..salts−1 — its row count multiplies by
    * `salts`, the price of the spread), and each fact row routes to ONE
    * salt lane via `pmod(saltSource, salts)`.
    *
    * `saltSource` must be a DETERMINISTIC, roughly-uniform, NON-NULL
    * numeric column of the fact side (an event id, a row's content
    * hash — never `rand()`, which breaks retry/replay determinism and
    * the oracle). Every fact row meets exactly one replica of its key's
    * dim row, so the result is row-for-row EXACTLY the plain equi-join
    * (law-pinned in EventsSpec), while the whale key's rows now occupy
    * `salts` tasks instead of one.
    *
    * `joinType` passes through (`inner` and `left_outer` preserve the
    * equivalence: an unmatched fact row is unmatched in every lane
    * exactly once — it carries one salt — and dim-side rows without
    * facts are dropped by both shapes under `inner`). Right/full outer
    * would duplicate unmatched dim rows per salt lane and are refused. */
  def saltedEquiJoin(
      facts: DataFrame,
      dim: DataFrame,
      key: String,
      saltSource: Column,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"salting preserves inner/left_outer equivalence only, got $joinType")
    val dimS = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val factsS = facts.withColumn("__salt",
      pmod(saltSource, lit(salts.toLong)).cast("int"))
    factsS.join(dimS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
