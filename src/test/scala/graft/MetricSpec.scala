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

  test("validRecord: component-domain gate rejects overflow-scale, NaN, and Inf payloads") {
    // |x| beyond MaxAbsComponent would long-overflow the q3/q4
    // exact-quantized dashboards downstream — rejected at the ingest
    // door like a wrong dimension (adversarial-data finding, r8)
    val df = Seq(
      (1L, Seq(1f, -2f)),                          // normal
      (2L, Seq(100f, -100f)),                      // extreme but in-domain (the edge)
      (3L, Seq(101f, 0f)),                         // just past the bound: out
      (4L, Seq(Float.NaN, 0f)),                    // NaN: out
      (5L, Seq(Float.PositiveInfinity, 0f)),       // Inf: out
      (6L, Seq(0f, 0f)),                           // zero vector: in (Euclidean-legal)
      (7L, Seq(1f, 2f, 3f))                        // wrong dim: out
    ).toDF("id", "embedding")
    val ok = df.where(Metric.validRecord(col("embedding"), 2))
      .select("id").as[Long].collect().sorted
    assert(ok.toSeq === Seq(1L, 2L, 6L))
  }

  test("zero vectors are excluded from angular candidates but legal in Euclidean space") {
    import graft.operators.Dedup
    val blocked = Seq(
      (0, 1L, Seq(1f, 0f)), (0, 2L, Seq(1f, 0.01f)), (0, 3L, Seq(0f, 0f))
    ).toDF("block", "id", "embedding")
    // under ANSI, an unguarded 0/0 cosine would fail the job on row 3;
    // the norm gate drops it and keeps the true near-dup pair
    val pairs = Dedup.embeddingNearDup(blocked, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }
}
