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

  // ---- real codec goldens: hand-built containers with known answers ----

  test("PPM golden: 2x2 P6 with a comment decodes to the exact pixel set") {
    // pixels: (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
    val raster = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
    val bytes = "P6\n# golden fixture\n2 2\n255\n".getBytes("US-ASCII") ++
      raster.map(_.toByte)
    val (w, h, maxval, rgb) = Multimodal.Codec.parsePpm(bytes)
    assert((w, h, maxval) === (2, 2, 255))
    assert(rgb.toSeq === raster.toSeq)
    val f = Multimodal.Codec.imageFeatures(w, h, maxval, rgb)
    assert(f.length === 8)
    assert(f(0) === 2.0f && f(1) === 2.0f)
    // sums: r=510 g=510 b=510 over 4 px; luma = r+2g+b: 255, 510, 255, 1020
    assert(f(2) === (510 / (4 * 255.0)).toFloat)
    assert(f(3) === f(2) && f(4) === f(2))
    assert(f(5) === (2040 / (4 * 1020.0)).toFloat)
    assert(f(6) === 0.5f)           // two pixels with luma >= 510
    assert(f(7) === (765 / 1020.0).toFloat) // 1020 - 255
  }

  test("perceptualHash golden: 4x4 half-dark/half-bright raster sets " +
    "exactly the bright half's bits; identical rasters collide; a " +
    "one-pixel tweak moves few bits") {
    import org.apache.spark.sql.Row
    def ppm(w: Int, h: Int, lums: Seq[Int]): Array[Byte] = {
      // encode luminance L as gray (L/4, L/4, L/4)·(1,2,1) ≈ L: use
      // (v, v, v) with v = L/4 so r+2g+b = 4v — monotone in L
      val raster = lums.flatMap(l => Seq(l / 4, l / 4, l / 4)).map(_.toByte)
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ raster.toArray
    }
    def mediaRow(id: Long, bytes: Array[Byte]) =
      Row(id, "image", bytes, Row(4, 4, null, null))
    val schema = Multimodal.mediaSchema
    // left two columns dark (L=40), right two bright (L=800)
    val half = (0 until 16).map(i => if (i % 4 < 2) 40 else 800)
    val tweak = half.updated(0, 44) // one dark pixel slightly brighter
    val rows = Seq(
      mediaRow(1L, ppm(4, 4, half)), mediaRow(2L, ppm(4, 4, half)),
      mediaRow(3L, ppm(4, 4, tweak)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = Multimodal.perceptualHash(df, grid = 4)
      .select("media_id", "ahash").as[(Long, Long)].collect().toMap
    // grid 4 on a 4x4 raster: one block per pixel; mean is between the
    // two levels, so exactly the 8 bright pixels' bits set: columns 2,3
    // of every row → bits {2,3, 6,7, 10,11, 14,15}
    val wantBits = (0 until 16).filter(i => i % 4 >= 2)
      .map(1L << _).reduce(_ | _)
    assert(got(1L) === wantBits, s"got ${got(1L).toBinaryString}")
    assert(got(2L) === got(1L), "identical rasters must collide exactly")
    val hamming = java.lang.Long.bitCount(got(3L) ^ got(1L))
    assert(hamming <= 2, s"one-pixel tweak flipped $hamming bits")
  }

  test("BMP golden: 2x2 24-bit bottom-up BMP decodes to the same pixels as the PPM") {
    // same logical image as the PPM golden, but BGR, bottom-up, 4-byte
    // row padding (stride 8 for w=2)
    def row(px: Seq[(Int, Int, Int)]): Array[Byte] =
      (px.flatMap { case (r, g, b) => Seq(b, g, r) } ++ Seq(0, 0)).map(_.toByte).toArray
    val bottomRow = row(Seq((0, 0, 255), (255, 255, 255)))  // image row 1
    val topRow = row(Seq((255, 0, 0), (0, 255, 0)))         // image row 0
    val data = bottomRow ++ topRow // bottom-up: last image row first
    val header = new Array[Byte](54)
    def put16(o: Int, v: Int): Unit = { header(o) = v.toByte; header(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Int): Unit = {
      header(o) = v.toByte; header(o + 1) = (v >> 8).toByte
      header(o + 2) = (v >> 16).toByte; header(o + 3) = (v >> 24).toByte
    }
    header(0) = 'B'; header(1) = 'M'
    put32(2, 54 + data.length); put32(10, 54) // file size, data offset
    put32(14, 40); put32(18, 2); put32(22, 2) // BITMAPINFOHEADER, w, h (positive = bottom-up)
    put16(26, 1); put16(28, 24); put32(30, 0) // planes, bpp, BI_RGB
    val (w, h, rgb) = Multimodal.Codec.parseBmp(header ++ data)
    assert((w, h) === (2, 2))
    assert(rgb.toSeq === Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255))
    // identical features as the PPM golden — format-independent decode
    val ppm = Multimodal.Codec.imageFeatures(2, 2, 255,
      Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255))
    assert(Multimodal.Codec.imageFeatures(w, h, 255, rgb).toSeq === ppm.toSeq)
  }

  test("WAV golden: encode→parse roundtrip, extra chunk walked, known features") {
    val samples = Array[Short](0, 16384, -16384, 32767, -32768, 0)
    val bytes = Multimodal.Codec.encodeWavPcm16(samples, 8000)
    val (sr, got) = Multimodal.Codec.parseWav(bytes)
    assert(sr === 8000)
    assert(got.toSeq === samples.map(_.toInt).toSeq)
    val f = Multimodal.Codec.audioFeatures(sr, got)
    assert(f(0) === 6.0f && f(1) === 8000.0f)
    val sumAbs = 16384L + 16384 + 32767 + 32768
    assert(f(2) === (sumAbs / (6 * 32768.0)).toFloat)
    // sign flips at i=2 (+→−), i=3 (−→+), i=4 (+→−), i=5 (−→+): 4/6
    assert(f(3) === (4 / 6.0).toFloat)
    assert(f(4) === (32768 / 32768.0).toFloat)
    // thirds of 6: [0,2) [2,4) [4,6)
    assert(f(5) === (16384 / (2 * 32768.0)).toFloat)
    assert(f(6) === ((16384L + 32767) / (2 * 32768.0)).toFloat)
    assert(f(7) === (32768 / (2 * 32768.0)).toFloat)
    // an unknown chunk (odd-sized, word-aligned) before data is skipped
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val withJunk = bytes.take(36) ++ junk ++ bytes.drop(36)
    // fix up the RIFF size field
    val (sr2, got2) = Multimodal.Codec.parseWav(withJunk)
    assert(sr2 === 8000 && got2.toSeq === got.toSeq)
  }

  test("Real codec: stereo WAV keeps channel 0; unknown magic falls back to the fake") {
    // stereo: frames (L,R) = (100, -7), (-200, 9) → channel 0 = 100, -200
    val stereo = new Array[Byte](44 + 8)
    System.arraycopy(Multimodal.Codec.encodeWavPcm16(Array[Short](), 44100), 0, stereo, 0, 44)
    def put16(o: Int, v: Int): Unit = { stereo(o) = v.toByte; stereo(o + 1) = (v >> 8).toByte }
    put16(22, 2)           // channels = 2
    put16(32, 4)           // block align
    put16(40, 8)           // data size
    put16(4, 36 + 8)       // riff size
    put16(44, 100); put16(46, -7 & 0xffff); put16(48, -200 & 0xffff); put16(50, 9)
    val (_, ch0) = Multimodal.Codec.parseWav(stereo)
    assert(ch0.toSeq === Seq(100, -200))
    // unknown magic → DeterministicFake byte statistics
    val blob = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    val real = Multimodal.Codec.Real.decodeFeatures("image", blob, null)
    val fake = Multimodal.Codec.DeterministicFake.decodeFeatures("image", blob, null)
    assert(real.toSeq === fake.toSeq)
  }

  test("codecMedia roundtrip: decoded features equal direct computation from text bytes") {
    val m = Multimodal.codecMedia(docs).cache()
    assert(m.where(col("kind") === "image").count() > 0)
    assert(m.where(col("kind") === "audio").count() > 0)
    val feats = Multimodal.extractFeatures(m, Multimodal.Codec.Real)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    val src = docs.select("doc_id", "text", "n_chars")
      .as[(Long, String, Long)].collect().filter(_._2.nonEmpty)
    src.foreach { case (id, text, nc) =>
      // the payload projection: one byte per character, codepoint mod 256
      val b = text.codePoints().toArray.map(cp => (cp & 0xff).toByte)
      val want: Array[Float] =
        if (id % 2 == 0) {
          val w = (nc % 16 + 4).toInt; val h = (nc % 12 + 4).toInt
          val rgb = new Array[Int](w * h * 3)
          for (i <- 0 until w * h) {
            rgb(3 * i) = b(i % b.length) & 0xff
            rgb(3 * i + 1) = b((i + 1) % b.length) & 0xff
            rgb(3 * i + 2) = b((i + 2) % b.length) & 0xff
          }
          Multimodal.Codec.imageFeatures(w, h, 255, rgb)
        } else {
          val n = math.min(b.length, 2048)
          Multimodal.Codec.audioFeatures(8000,
            Array.tabulate(n)(i => ((b(i) & 0xff) - 128) * 256))
        }
      assert(feats(id).toSeq === want.toSeq, s"media_id=$id")
    }
  }
}
