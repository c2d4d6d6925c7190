package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the native kernels: users working in
  * `spark.sql(...)` get the same operators as the Column API.
  *
  *   - per session: `SqlFunctions.registerAll(spark)`
  *   - at deploy time: `--conf spark.sql.extensions=graft.GraftExtensions`
  */
object SqlFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got: $other")
  }

  /** SQL integer literals parse as INT; promote to the LONG literal the
    * bloom aggregate's type check requires. */
  private def longLit(e: Expression, what: String): Expression = e match {
    case Literal(v: Int, IntegerType) => Literal(v.toLong)
    case l @ Literal(_: Long, _) => l
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got: $other")
  }

  /** `perms` bound shared with [[graft.operators.Dedup.minhashSignature]]:
    * the Kirsch-Mitzenmacher derived hash `h1 + p·h2` over 56-bit halves
    * only stays inside a signed long for perms ≤ 16 — larger values
    * silently overflow and corrupt signatures. */
  private def permsLit(e: Expression): Int = {
    val p = intLit(e, "perms")
    require(p >= 1 && p <= 16,
      s"perms must be in [1, 16] (larger overflows the derived-hash long), got $p")
    p
  }

  /** (name, builder) for every SQL-exposed kernel. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_sq_euclidean" -> (es => NativeExprs.SqEuclideanExpr(es(0), es(1))),
    "graft_cosine_distance" -> (es => NativeExprs.CosineDistanceExpr(es(0), es(1))),
    "graft_dot" -> (es => NativeExprs.DotExpr(es(0), es(1))),
    "graft_simhash60" -> (es => NativeExprs.SimHash60Expr(es(0))),
    "graft_tokens" -> (es => NativeExprs.WhitespaceTokensExpr(es(0))),
    "graft_shingles" -> (es =>
      NativeExprs.ShinglesExpr(es(0), intLit(es(1), "shingle width"))),
    "graft_shingle_hashes" -> (es => NativeExprs.ShingleHashesExpr(es(0))),
    "graft_minhash_sig" -> (es =>
      NativeExprs.MinhashSigExpr(es(0), permsLit(es(1)))),
    "graft_minhash_sig_hashes" -> (es =>
      NativeExprs.MinhashSigHashesExpr(es(0), permsLit(es(1)))),
    "graft_md5_min_window" -> (es =>
      NativeExprs.Md5MinWindowExpr(es(0), intLit(es(1), "window"))),
    "graft_repetition_stats" -> (es => NativeExprs.RepetitionStatsExpr(es(0))),
    // token statistics bound to the library's language inventories
    "graft_token_stats" -> (es =>
      NativeExprs.TokenStatsExpr(es(0),
        graft.operators.TextOps.StopwordsByLang.map(_._2))),
    "graft_pq_codes" -> (es => NativeExprs.PqCodesExpr(es(0), es(1))),
    "graft_binary_codes" -> (es => NativeExprs.BinaryCodesExpr(es(0))),
    // aggregates: the analyzer wraps a raw AggregateFunction returned by a
    // registry builder into an AggregateExpression, same as the built-ins
    "graft_vector_mean" -> (es => VectorMeanAgg(es(0))),
    "graft_topk_pairs" -> (es =>
      TopKPairsAgg(es(0), es(1), intLit(es(2), "k"))),
    // the Bloom prefilter pair ([[Bloom]]): build with
    //   SELECT graft_bloom_agg(h, 1000000, 8000000) FROM bench
    // and probe with the builder as a scalar subquery —
    //   WHERE graft_might_contain((SELECT … FROM b), h)
    // (might_contain requires a constant/subquery filter operand)
    "graft_bloom_agg" -> (es =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(es(0), longLit(es(1), "estimatedItems"),
          longLit(es(2), "numBits"))),
    "graft_might_contain" -> (es =>
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(es(0), es(1))))

  /** Register every kernel as a temp function on the session. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
