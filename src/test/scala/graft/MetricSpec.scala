package graft

import graft.types.Metric
import org.apache.spark.sql.functions._

/** Distance goldens from the reference's own tests
  * (`/root/reference/src/types/metric.rs:60-75`). */
class MetricSpec extends SparkSpec {
  import spark.implicits._

  private def one(metric: Metric, a: Seq[Float], b: Seq[Float]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(metric.distance(col("a"), col("b")).as("d"))
      .head().getDouble(0)

  test("squared euclidean golden: ([1,2,3],[4,5,6]) = 27") {
    assert(one(Metric.Euclidean, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)) === 27.0)
  }

  test("cosine distance golden: ([1,2,3],[4,5,6]) rounds to 0") {
    val d = one(Metric.Cosine, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
    assert(math.round(d) === 0L && d > 0.02 && d < 0.03) // 1 - 0.97463
  }

  test("identical vectors: euclidean 0, cosine ~0") {
    assert(one(Metric.Euclidean, Seq(2f, 2f), Seq(2f, 2f)) === 0.0)
    assert(math.abs(one(Metric.Cosine, Seq(2f, 2f), Seq(2f, 2f))) < 1e-12)
  }

  test("dimension validation flags mismatched vectors") {
    val df = Seq((1L, Seq(1f, 2f)), (2L, Seq(1f, 2f, 3f))).toDF("id", "embedding")
    val ok = df.where(Metric.validDimension(col("embedding"), 2))
      .select("id").as[Long].collect()
    assert(ok.toSeq === Seq(1L))
  }
}
