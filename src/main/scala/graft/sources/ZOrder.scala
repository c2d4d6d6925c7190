package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ordered (Morton-curve) file layout: multi-dimensional data skipping
  * for scans that filter on EITHER of two columns.
  *
  * [[EventLog.snapshotByDay]] solves the one-dimensional case — sort by
  * the axis you filter on and parquet min/max stats prune row groups.
  * But a second filter axis breaks it: rows sorted by `ts` scatter
  * `user_id` across the full range in every file, so a user-scoped scan
  * reads everything. Interleaving the bits of both columns' normalized
  * ranks (the Morton / Z-value) gives files that are RECTANGLES in
  * (x, y) space — each file's footer then carries tight min/max on BOTH
  * columns, and a predicate on either axis skips most files. This is the
  * layout trick behind Delta's OPTIMIZE ZORDER and Hudi's z-order
  * clustering, built here from plain Spark: a map-only z-value
  * expression, `repartitionByRange` on it, and ordinary parquet stats.
  *
  * Scale shape: one 4-value min/max aggregate (a bounded model → inlined
  * as literals, the SURVEY §11 rule-19a move), then a map-only z-value
  * and one range shuffle — the same cost as any global sort-and-write.
  * Nothing driver-side scales with data. The z-value is layout metadata
  * only: it never changes row content, and readers filter on the
  * original columns — a wrong z-value could only cost pruning
  * efficiency, never correctness.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i
    * (the classic Morton magic-number ladder, as Column arithmetic). */
  private def spread16(c: Column): Column = {
    val s0 = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 2))).bitwiseAND(lit(0x33333333L))
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Normalize `c` (numeric, as double) from [lo, hi] onto the 16-bit
    * grid. A constant column (hi == lo) maps to 0 — z-order degrades to
    * a plain sort on the other axis. */
  private def grid16(c: Column, lo: Double, hi: Double): Column = {
    val span = hi - lo
    if (span <= 0) lit(0L)
    else least(greatest(
      floor((c.cast("double") - lit(lo)) / lit(span) * lit(65535.0)).cast("long"),
      lit(0L)), lit(65535L))
  }

  /** The 32-bit Morton value of two numeric columns normalized over
    * [xLo, xHi] × [yLo, yHi]: x's bits at even positions, y's at odd. */
  def zValue(x: Column, y: Column, xLo: Double, xHi: Double,
      yLo: Double, yHi: Double): Column =
    spread16(grid16(x, xLo, xHi))
      .bitwiseOR(shiftleft(spread16(grid16(y, yLo, yHi)), 1))

  /** Write `df` into `nFiles` z-ordered parquet files on numeric columns
    * (`xCol`, `yCol`). The min/max frame is one tiny aggregate collected
    * to the driver (4 doubles — model-bounded state, inlined as
    * literals); the write is `repartitionByRange` on the z-value so file
    * boundaries follow the curve, plus a within-file sort so row groups
    * inherit the same locality. The z-value itself is dropped — the
    * layout is invisible to readers except through footer stats. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      nFiles: Int = 32): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val Array(xLo, xHi, yLo, yHi) =
      df.agg(min(col(xCol).cast("double")), max(col(xCol).cast("double")),
          min(col(yCol).cast("double")), max(col(yCol).cast("double")))
        .na.fill(0.0)
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
    val z = zValue(col(xCol), col(yCol), xLo, xHi, yLo, yHi)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Open a z-ordered store. Plain parquet — filters on either layout
    * column prune row groups via footer min/max; no special reader. */
  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
