package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the similarity graphs the dedup family emits.
  *
  * The reference has no graph surface (its `duplicateGroups` analog is
  * the whole story); this family is brief-driven: once a pipeline holds
  * a verified near-duplicate pair list, link analysis over it answers
  * "which document is the CANONICAL one" better than the min-id
  * representative rule — a highly-connected hub inside a duplicate
  * family is the original; satellites are the scrapes. PageRank over
  * the pair graph is the standard formalization (Page et al. 1999).
  */
object Graph {

  /** Fixed-point scale for integer PageRank mass: ranks are BIGINT
    * multiples of 10⁻¹², so every arithmetic step is EXACT integer
    * math — order-independent sums, engine-portable, hash-comparable.
    * Headroom: total mass stays ≤ SCALE (mass only leaks to floors),
    * so `rank_q * 85` ≤ 8.5·10¹³ — far inside checked-long range even
    * before the per-degree split. */
  val RankScale: Long = 1000000000000L

  /** Damping numerator/denominator (d = 85/100 = the classic 0.85) as
    * exact integers — the fixed-point twin of the float damping. */
  val DampNum: Long = 85L
  val DampDen: Long = 100L

  /** PageRank over an UNDIRECTED pair list, in exact integer
    * fixed-point arithmetic.
    *
    * Numeric contract (what makes this oracle-exact): every quantity is
    * a BIGINT count of 10⁻¹²-quanta. Init `r₀ = SCALE div n`; teleport
    * `t = (15·SCALE) div (100·n)`; per iteration each node sends every
    * neighbor `(r·85) div (100·deg)` and receives `t + Σ incoming`.
    * Integral `div` truncates (all operands non-negative, so truncate =
    * floor); the discarded remainders mean total mass drifts slightly
    * BELOW SCALE — deterministic on both engines, unlike float sums
    * whose value depends on reduction order. The oracle unrolls the
    * same `iters` steps as chained CTEs with DuckDB's integer `//`.
    *
    * Scale shape: edges are bounded by the verified-duplicate subset
    * (the caller's pair list is the converged LSH result, memoized).
    * Each iteration is ONE shuffle: an equi-join of ranks onto edges
    * (both keyed by node) + a map-side-combinable sum — the standard
    * Pregel step, linear in |E| per round with no driver traffic
    * beyond the loop counter. Lineage is truncated per round
    * ([[Dedup.duplicateGroups]]'s discipline) so round k's plan scans
    * round k−1's materialized result, not the whole loop history.
    *
    * Isolated nodes cannot occur (every node of a pair list has
    * degree ≥ 1). Empty pair list → empty result (no 0-division on n:
    * guarded). */
  def pageRank(
      pairs: DataFrame,
      iters: Int = 8,
      srcCol: String = "doc_id_a",
      dstCol: String = "doc_id_b"): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    def truncate(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.PlanBridge.statsReset(df.localCheckpoint(eager = false))
    // one eager materialization of the (typically pipeline-backed) pair
    // list, then symmetric edges — same rationale as duplicateGroups
    val p = org.apache.spark.sql.graft.PlanBridge.statsReset(
      pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .localCheckpoint(eager = true))
    val edges = p.unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = deg.count()
    if (n == 0L)
      return pairs.sparkSession.emptyDataFrame
        .withColumn("doc_id", lit(null).cast("long"))
        .withColumn("rank_q", lit(null).cast("long"))
        .limit(0)
    val teleport = (15L * RankScale) / (100L * n)
    // edges pre-joined with the sender's degree ONCE (the degree never
    // changes); each round then only joins the current ranks on
    val edgesDeg = truncate(edges.join(deg, Seq("src")))
    var ranks = truncate(deg.select(col("src").as("node"),
      lit(RankScale / n).as("rank_q")))
    for (_ <- 0 until iters) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .selectExpr("dst", s"(rank_q * $DampNum) DIV ($DampDen * deg) AS c")
        .groupBy(col("dst")).agg(sum(col("c")).as("__in"))
      ranks = truncate(
        ranks.select(col("node"))
          .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            (lit(teleport) + coalesce(col("__in"), lit(0L))).as("rank_q")))
    }
    ranks.select(col("node").as("doc_id"), col("rank_q"))
  }

  /** Personalized PageRank: [[pageRank]] with the teleport mass pinned
    * to a SEED set — "how close is every document to the trusted ones,
    * through the duplicate graph" (Jeh & Widom 2003's topic-sensitive
    * variant in the same integer fixed point). Rank concentrates around
    * seeds instead of global degree: the trust-propagation selector for
    * picking which member of a scraped family descends from the curated
    * source.
    *
    * Same numeric contract as [[pageRank]]; differences: init mass
    * `SCALE div |seeds|` on seeds (0 elsewhere) and teleport
    * `(15·SCALE) div (100·|seeds|)` only to seeds. Seeds outside the
    * graph are ignored; no seed in the graph → empty result. */
  def personalizedPageRank(
      pairs: DataFrame,
      seeds: DataFrame, // one column "node"
      iters: Int = 8,
      srcCol: String = "doc_id_a",
      dstCol: String = "doc_id_b"): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    def truncate(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.PlanBridge.statsReset(df.localCheckpoint(eager = false))
    val p = org.apache.spark.sql.graft.PlanBridge.statsReset(
      pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .localCheckpoint(eager = true))
    val edges = p.unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("src").as("node"))
      .join(seeds.select(col("node")).distinct()
        .withColumn("__seed", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(false)).as("is_seed"))
    val nSeeds = nodes.where(col("is_seed")).count()
    if (nSeeds == 0L)
      return pairs.sparkSession.emptyDataFrame
        .withColumn("doc_id", lit(null).cast("long"))
        .withColumn("rank_q", lit(null).cast("long"))
        .limit(0)
    val teleport = (15L * RankScale) / (100L * nSeeds)
    val init = RankScale / nSeeds
    val edgesDeg = truncate(edges.join(deg, Seq("src")))
    val nodesT = truncate(nodes.select(col("node"),
      when(col("is_seed"), lit(teleport)).otherwise(lit(0L)).as("__t")))
    var ranks = truncate(nodes.select(col("node"),
      when(col("is_seed"), lit(init)).otherwise(lit(0L)).as("rank_q")))
    for (_ <- 0 until iters) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .selectExpr("dst", s"(rank_q * $DampNum) DIV ($DampDen * deg) AS c")
        .groupBy(col("dst")).agg(sum(col("c")).as("__in"))
      ranks = truncate(
        nodesT
          .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            (col("__t") + coalesce(col("__in"), lit(0L))).as("rank_q")))
    }
    ranks.select(col("node").as("doc_id"), col("rank_q"))
  }

  /** Triangle / wedge census of an undirected pair list — the global
    * clustering coefficient `3T/W` that meters LSH-family integrity:
    * genuine duplicate families are near-cliques (coefficient → 1); a
    * low value means chains of borderline pairs are BRIDGING unrelated
    * documents and the verify threshold needs raising.
    *
    * Exactness: each edge is stored once as `a < b`, so the ordered
    * triple join (`(a,b) ⋈ (b,c) ⋈ (a,c)` with `a < b < c` by
    * construction) counts every triangle exactly once — exact BIGINTs,
    * and the wedge count `Σ d(d−1)/2` divides an always-even integer
    * with integral `DIV`. One nullable double (the coefficient, NULL
    * when the graph has no wedges) in the final 1-row select.
    *
    * Scale shape: two equi-joins on the verified-pair graph (bounded by
    * the duplicate subset, eagerly materialized once); degree table via
    * one map-side-combinable count. */
  def triangleCensus(
      pairs: DataFrame,
      srcCol: String = "doc_id_a",
      dstCol: String = "doc_id_b"): DataFrame = {
    val p = org.apache.spark.sql.graft.PlanBridge.statsReset(
      pairs.select(col(srcCol).as("a"), col(dstCol).as("b"))
        .localCheckpoint(eager = true))
    val tri = p.as("e1")
      .join(p.as("e2"), col("e1.b") === col("e2.a"))
      .join(p.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
    val wedges = p.select(col("a").as("n")).unionByName(p.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .selectExpr("CAST(sum(d * (d - 1)) DIV 2 AS BIGINT) AS n_wedges")
    tri.crossJoin(wedges)
      .select(col("n_triangles"), col("n_wedges"),
        when(col("n_wedges") > 0L,
          (col("n_triangles") * lit(3L)).cast("double")
            / col("n_wedges").cast("double"))
          .otherwise(lit(null).cast("double")).as("global_cc"))
  }
}
