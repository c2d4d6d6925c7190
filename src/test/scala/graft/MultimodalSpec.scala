package graft

import graft.operators.Multimodal
import graft.operators.{IvfIndex, Knn}
import graft.types.Metric
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal plumbing: schema, batch shape, determinism, and reuse of the
  * vector engine over extracted features (decode itself is a stub). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(60).cache()
  private lazy val media = Multimodal.syntheticMedia(docs).cache()

  test("synthetic media matches the declared schema (names + types)") {
    assert(media.schema.simpleString === Multimodal.mediaSchema.simpleString)
    assert(media.count() === 60)
    assert(media.select("kind").distinct().count() === 3)
  }

  test("metadata-only filters never read the payload column") {
    // un-cached frame: the cache would pin all columns into the plan
    val fresh = Multimodal.syntheticMedia(
      spark.read.parquet(s"$sf0001/documents.parquet"))
    val plan = fresh.where(col("meta.width") > 32).select("media_id", "kind")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("content"), s"payload column not pruned:\n$plan")
  }

  test("feature extraction: fixed width, [0,1] range, deterministic") {
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.schema("features").dataType ===
      ArrayType(FloatType, containsNull = false))
    val rows = feats.select("media_id", "features").as[(Long, Seq[Float])].collect()
    assert(rows.length === 60)
    rows.foreach { case (id, f) =>
      assert(f.length === Multimodal.Codec.DeterministicFake.featureDim, s"media $id")
      assert(f.forall(x => x >= 0f && x <= 1f), s"media $id out of range")
    }
    val again = Multimodal.extractFeatures(media)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    rows.foreach { case (id, f) => assert(again(id) === f) }
  }

  test("extracted features feed the vector engine unchanged (kNN over media)") {
    val feats = Multimodal.extractFeatures(media)
      .select(col("media_id").as("id"), col("features").as("embedding"),
        map(lit("kind"), col("kind")).as("metadata"))
    val q = feats.where(col("id") === 0).select(col("embedding").as("qvec"))
    val got = Knn.search(feats, q, 5, Metric.Cosine).select("id").as[Long].collect()
    assert(got.length === 5)
    assert(got.head === 0L) // self is nearest
  }

  test("frame sampling: stride-2 over n_frames, payload stripes non-empty") {
    val frames = Multimodal.sampleFrames(media, stride = 2).cache()
    val counts = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val expected = media.where(col("kind") === "video")
      .select(col("media_id"), col("meta.n_frames")).as[(Long, Int)].collect().toMap
    assert(counts.keySet === expected.keySet)
    expected.foreach { case (id, nf) =>
      assert(counts(id) === (nf + 1) / 2, s"media $id: $nf frames, stride 2")
    }
    assert(frames.where(length(col("frame_bytes")) === 0).count() === 0)
  }

  test("thumbnail resize: 4x4 grid per image, byte values in range") {
    val grid = Multimodal.resizeGrid(media, thumbW = 4, thumbH = 4).cache()
    val nImages = media.where(col("kind") === "image" && length(col("content")) > 0).count()
    assert(grid.count() === nImages * 16)
    assert(grid.groupBy("media_id").count().where(col("count") =!= 16).count() === 0)
    assert(grid.where(col("value") < 0 || col("value") > 255).count() === 0)
    // deterministic in the payload: same media → same grid on recompute
    val a = grid.orderBy("media_id", "y", "x").collect()
    val b = Multimodal.resizeGrid(media, 4, 4).orderBy("media_id", "y", "x").collect()
    assert(a.sameElements(b))
  }
}
