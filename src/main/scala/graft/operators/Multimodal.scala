package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines.
  *
  * Media are opaque `binary` columns plus a typed metadata struct — the
  * 100 TB-scale layout: bytes stay columnar in Parquet, metadata prunes
  * without touching payloads (filter on `meta.kind`/`meta.width` never
  * reads `content`), and payload-heavy stages run iterator-to-iterator in
  * `mapPartitions` so one output batch is in flight per task regardless of
  * partition size.
  *
  * DECODE IS A STUB: real image/audio codecs are not in this container, so
  * [[Codec.DeterministicFake]] derives "decoded" samples from the payload
  * bytes. Every Spark-side contract — schema, partitioning, the
  * per-partition batch shape, feature vector width — is real and tested;
  * swapping in a JNI/javax.imageio codec changes only the [[Codec]]
  * implementation.
  */
object Multimodal {

  /** media frame: (media_id, kind, content, meta). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))), nullable = false)))

  /** Deterministic synthetic media derived from the documents table (the
    * container has no real media); payload = utf8 text bytes, metadata
    * derived from doc stats. Kind round-robins by doc_id. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      struct(
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 30 + 1).cast("int").as("n_frames")).as("meta"))

  /** Decoder contract: bytes → fixed-width float feature vector. */
  trait Codec extends Serializable {
    def featureDim: Int
    /** Decode + feature-extract one payload. Real impl: decode image,
      * resize to a thumbnail, mean-pool channels (or mel-spectrogram for
      * audio). */
    def decodeFeatures(kind: String, content: Array[Byte], meta: Row): Array[Float]
  }

  object Codec {
    /** STUB codec — stands in for the real decoder (???): features are
      * per-stripe byte statistics, deterministic in the payload, so the
      * pipeline is testable end-to-end without media libraries. */
    object DeterministicFake extends Codec {
      val featureDim = 8
      def decodeFeatures(kind: String, content: Array[Byte], meta: Row): Array[Float] = {
        val d = featureDim
        // Accumulate and divide in DOUBLE, cast to float once at the end:
        // IEEE double ops are engine-independent, so the oracle reproduces
        // the exact float value with CAST(sum/(cnt*255.0) AS REAL). A
        // float-precision division here would double-round differently.
        val sums = new Array[Double](d)
        val counts = new Array[Int](d)
        var i = 0
        while (i < content.length) {
          val b = i % d
          sums(b) += (content(i) & 0xff)
          counts(b) += 1
          i += 1
        }
        val out = new Array[Float](d)
        var j = 0
        while (j < d) {
          if (counts(j) > 0) out(j) = (sums(j) / (counts(j) * 255.0)).toFloat
          j += 1
        }
        out
      }
    }
  }

  /** Feature extraction over a media frame: `mapPartitions`, iterator in /
    * iterator out (never materializes a partition), emitting
    * (media_id, kind, features: array<float>). The output is a regular
    * embedding column — downstream [[Knn]]/[[IvfIndex]]/[[Dedup]] apply
    * unchanged, which is the point: multimodal similarity search reuses
    * the vector engine. */
  def extractFeatures(media: DataFrame, codec: Codec = Codec.DeterministicFake): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "kind", "content", "meta").mapPartitions { rows =>
      rows.map { r =>
        val feats = codec.decodeFeatures(
          r.getString(1), r.getAs[Array[Byte]](2), r.getStruct(3))
        Row(r.getLong(0), r.getString(1), feats.toSeq)
      }
    }(enc)
  }

  /** Thumbnail resize plumbing for image payloads: nearest-neighbor
    * downsample of the payload interpreted as a `meta.width × meta.height`
    * byte grid (the stub decode: one byte = one pixel) to a fixed
    * `thumbW × thumbH` grid, emitted as one row per thumbnail pixel —
    * sortable primitives, fully oracle-checkable. Pure expressions,
    * map-only; a real codec swaps the byte-grid interpretation for
    * decoded pixels and keeps the sampling arithmetic. Source index =
    * `(floor(y·H/thumbH)·W + floor(x·W/thumbW)) mod payload_len`
    * (the mod guards payloads shorter than W×H — stub payloads are text
    * bytes, not real rasters). */
  def resizeGrid(media: DataFrame, thumbW: Int = 4, thumbH: Int = 4): DataFrame = {
    val w = col("meta.width").cast("long")
    val h = col("meta.height").cast("long")
    val len = length(col("content")).cast("long")
    media
      .where(col("kind") === "image" && length(col("content")) > 0)
      .select(col("media_id"), col("content"), w.as("__w"), h.as("__h"), len.as("__len"),
        explode(sequence(lit(0), lit(thumbH - 1))).as("y"))
      .select(col("media_id"), col("content"), col("__w"), col("__h"), col("__len"), col("y"),
        explode(sequence(lit(0), lit(thumbW - 1))).as("x"))
      .withColumn("__src",
        pmod(floor(col("y") * col("__h") / thumbH) * col("__w") +
          floor(col("x") * col("__w") / thumbW), col("__len")))
      .select(col("media_id"), col("y").cast("int").as("y"), col("x").cast("int").as("x"),
        // 1-based substr over the binary payload; single byte → unsigned int
        conv(hex(col("content").substr(col("__src").cast("int") + 1, lit(1))), 16, 10)
          .cast("int").as("value"))
  }

  /** Frame sampling for video payloads: split the payload into
    * `meta.n_frames` stripes and keep every `stride`-th stripe — the
    * plumbing (explode → one row per sampled frame, frame_idx column) is
    * exactly what a real video pipeline produces. Pure expressions. */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    val n = col("meta.n_frames")
    val frameLen = greatest(floor(length(col("content")) / n), lit(1)).cast("int")
    media
      .where(col("kind") === "video")
      .select(col("media_id"), col("meta"), col("content"), frameLen.as("__flen"),
        explode(sequence(lit(0), n - 1, lit(stride))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        col("content").substr(col("frame_idx") * col("__flen") + 1, col("__flen"))
          .as("frame_bytes"))
  }
}
