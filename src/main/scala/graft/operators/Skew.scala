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
  */
object Skew {

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
