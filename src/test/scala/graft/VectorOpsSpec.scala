package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization: values in [-127,127], reconstruction error <= scale/2, zero vector safe") {
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 50L).map(i => (i, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 4f))) :+
      (99L, Seq.fill(16)(0.0f)) // all-zero: scale 0 must not NaN
    val df = vecs.toDF("id", "embedding")
      .withColumn("scale", VectorOps.int8Scale(col("embedding")))
      .withColumn("q", VectorOps.quantizeInt8(col("embedding"), col("scale")))
      .withColumn("deq", VectorOps.dequantizeInt8(col("q"), col("scale")))
    val rows = df.select("id", "embedding", "scale", "q", "deq")
      .as[(Long, Seq[Float], Double, Seq[Int], Seq[Double])].collect()
    rows.foreach { case (id, v, scale, q, deq) =>
      assert(q.forall(x => x >= -127 && x <= 127), s"id=$id q out of range: $q")
      if (id == 99L) {
        assert(scale === 0.0 && q.forall(_ == 0) && deq.forall(_ == 0.0))
      } else {
        // round-half-up guarantees |x - q*scale| <= scale/2 (+ fp eps)
        v.zip(deq).foreach { case (x, d) =>
          assert(math.abs(x.toDouble - d) <= scale / 2 + 1e-9,
            s"id=$id err ${math.abs(x.toDouble - d)} > ${scale / 2}")
        }
      }
    }
  }

  test("kNN over int8-dequantized vectors recovers the exact top-10 almost entirely") {
    import graft.operators.Knn
    import graft.types.Metric
    val r = graft.sources.Records.fromEmbeddings(spark, "/root/testdata/sf0.001")
    val qv = r.where(col("id") === 0).select(col("embedding").as("qvec"))
    val exact = Knn.search(r, qv, 10, Metric.Euclidean)
      .select("id").as[Long].collect().toSet
    val deq = r
      .withColumn("__s", VectorOps.int8Scale(col("embedding")))
      .withColumn("embedding",
        VectorOps.dequantizeInt8(
          VectorOps.quantizeInt8(col("embedding"), col("__s")), col("__s"))
          .cast("array<float>"))
      .drop("__s")
    val approx = Knn.search(deq, qv, 10, Metric.Euclidean)
      .select("id").as[Long].collect().toSet
    // int8 scalar quantization perturbs each coordinate by <= scale/2;
    // on 64-dim data the top-10 should survive near-intact
    assert(exact.intersect(approx).size >= 8,
      s"recall ${exact.intersect(approx).size}/10 too low")
  }
}
