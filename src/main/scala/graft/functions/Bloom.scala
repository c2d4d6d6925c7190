package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

/** Column wrappers over Spark's runtime-filter Bloom machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the codegen'd
  * expressions behind AQE's `InjectRuntimeFilter`), exposed for
  * set-membership PRE-FILTERS the optimizer cannot infer on its own.
  *
  * The 100 TB decontamination story: a benchmark/blocklist gram set can
  * be far too large to broadcast as raw 8-byte hashes (billions of
  * grams), but its Bloom filter is `numBits/8` bytes at a chosen
  * false-positive rate — broadcastable at any corpus size. Bloom
  * filters have NO false negatives, so `bloom-prefilter → exact verify`
  * is exactly equal to the exact join while shrinking the shuffled
  * probe side by (1 − fpp) of the non-matching rows.
  */
object Bloom {

  /** Aggregate a LongType column into one Bloom filter (binary).
    * `estimatedItems` sizes the hash count, `numBits` the filter;
    * fpp ≈ 0.6185^(numBits/estimatedItems). */
  def bloomAgg(items: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(items),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a Bloom filter built by [[bloomAgg]].
    * True = maybe present (verify exactly); false = definitely absent.
    * `might_contain` requires its filter operand to be a constant or a
    * scalar subquery (it is evaluated ONCE and broadcast into the
    * codegen'd probe), so the builder frame — one row, one binary
    * column, normally the [[bloomAgg]] aggregate — is attached as an
    * uncorrelated scalar subquery, exactly how AQE's own
    * `InjectRuntimeFilter` wires it. */
  def mightContain(item: Column, bloomFrame: DataFrame): Column = {
    val ds = bloomFrame.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(ds.queryExecution.analyzed),
      ColumnBridge.expression(item)))
  }
}
