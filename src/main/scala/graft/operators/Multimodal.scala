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
  * Two codecs ship:
  *   - [[Codec.Real]] — dependency-free pure-JVM decoders for one honest
  *     format per modality: binary PPM (P6) and 24-bit BI_RGB BMP for
  *     images, 16-bit PCM WAV for audio. Features are exact-integer
  *     statistics over the decoded pixels/samples, so an SQL oracle can
  *     reproduce them bit-for-bit.
  *   - [[Codec.DeterministicFake]] — the declared-opaque fallback for
  *     every other container format (JPEG/PNG/MP3/MP4 decoders are not
  *     in this sandbox): features are byte statistics of the payload,
  *     deterministic, so the pipeline stays testable end-to-end.
  * [[Codec.Real]] sniffs magic bytes and falls back to the fake, so a
  * mixed corpus (some rasters, some opaque blobs) flows through one
  * `extractFeatures` call.
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
    * container has no real media); payload = one byte per CHARACTER
    * (codepoint mod 256 — [[graft.functions.NativeExprs.codepointBytes]];
    * identical to the raw UTF-8 bytes on ASCII text, and character-
    * addressable in portable SQL where a UTF-8 byte stream is not),
    * metadata derived from doc stats. Kind round-robins by doc_id.
    * Null-text docs are dropped at construction: [[mediaSchema]] declares
    * `content` non-null (a media row without a payload is malformed at
    * ingest), and an unfiltered cast would smuggle a null binary into
    * the codec (NPE — adversarial-data finding, r8). */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.where(col("text").isNotNull).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      graft.functions.NativeExprs.codepointBytes(col("text")).as("content"),
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

    /** REAL pure-JVM codec: PPM (P6) / BMP (24-bit BI_RGB) image decode
      * and WAV (16-bit PCM) audio decode, magic-byte sniffed; anything
      * else falls back to [[DeterministicFake]] (the declared-opaque
      * formats). All features are exact-integer sums divided once in
      * DOUBLE and cast to float at the end — the same cross-engine-exact
      * arithmetic discipline as the rest of the library, so the DuckDB
      * oracle reproduces every value bit-for-bit.
      *
      * Image features (8): [w, h, meanR, meanG, meanB, meanLuma,
      * brightShare, lumaRange] where luma = r + 2g + b (integer), bright
      * = luma >= 2·maxval, means normalized by maxval (=255 for BMP).
      * Audio features (8): [nSamples, sampleRate, meanAbs, zeroCrossRate,
      * maxAbs, meanAbs of each third] normalized by 32768. */
    object Real extends Codec {
      val featureDim = 8
      // Magic bytes alone don't prove format: an opaque blob that merely
      // STARTS with "P6"/"BM"/"RIFF…WAVE" must not kill the job (the
      // mixed-corpus contract above). A sniffed payload whose body fails
      // the strict parse is therefore treated as opaque → fallback
      // features, while the parsers themselves stay loud for callers
      // that decode directly (MultimodalPropSpec pins both behaviors).
      def decodeFeatures(kind: String, content: Array[Byte], meta: Row): Array[Float] = {
        val c = content
        try {
          if (c.length >= 2 && c(0) == 'P' && c(1) == '6') {
            val (w, h, maxval, rgb) = parsePpm(c)
            imageFeatures(w, h, maxval, rgb)
          } else if (c.length >= 2 && c(0) == 'B' && c(1) == 'M') {
            val (w, h, rgb) = parseBmp(c)
            imageFeatures(w, h, 255, rgb)
          } else if (c.length >= 12 && c(0) == 'R' && c(1) == 'I' && c(2) == 'F' &&
              c(3) == 'F' && c(8) == 'W' && c(9) == 'A' && c(10) == 'V' && c(11) == 'E') {
            val (sr, samples) = parseWav(c)
            audioFeatures(sr, samples)
          } else DeterministicFake.decodeFeatures(kind, content, meta)
        } catch {
          case _: IllegalArgumentException =>
            DeterministicFake.decodeFeatures(kind, content, meta)
        }
      }
    }

    private[graft] def imageFeatures(
        w: Int, h: Int, maxval: Int, rgb: Array[Int]): Array[Float] = {
      val n = w * h
      var sr = 0L; var sg = 0L; var sb = 0L; var bright = 0L
      var minL = Long.MaxValue; var maxL = Long.MinValue
      var i = 0
      while (i < n) {
        val r = rgb(3 * i); val g = rgb(3 * i + 1); val b = rgb(3 * i + 2)
        sr += r; sg += g; sb += b
        val lum = r + 2L * g + b
        if (lum >= 2L * maxval) bright += 1
        if (lum < minL) minL = lum
        if (lum > maxL) maxL = lum
        i += 1
      }
      Array(
        w.toFloat, h.toFloat,
        (sr / (n * maxval.toDouble)).toFloat,
        (sg / (n * maxval.toDouble)).toFloat,
        (sb / (n * maxval.toDouble)).toFloat,
        ((sr + 2L * sg + sb) / (n * 4.0 * maxval)).toFloat,
        (bright / n.toDouble).toFloat,
        ((maxL - minL) / (4.0 * maxval)).toFloat)
    }

    private[graft] def audioFeatures(
        sampleRate: Int, samples: Array[Int]): Array[Float] = {
      val n = samples.length
      require(n > 0, "empty WAV data chunk")
      val t = n / 3
      var sumAbs = 0L; var maxAbs = 0L; var zc = 0L
      val segSum = new Array[Long](3); val segCnt = new Array[Long](3)
      var i = 0
      while (i < n) {
        val s = samples(i)
        val a = math.abs(s.toLong)
        sumAbs += a
        if (a > maxAbs) maxAbs = a
        if (i > 0 && (samples(i - 1) >= 0) != (s >= 0)) zc += 1
        val seg = if (i < t) 0 else if (i < 2 * t) 1 else 2
        segSum(seg) += a; segCnt(seg) += 1
        i += 1
      }
      def segMean(k: Int): Float =
        if (segCnt(k) > 0) (segSum(k) / (segCnt(k) * 32768.0)).toFloat else 0.0f
      Array(
        n.toFloat, sampleRate.toFloat,
        (sumAbs / (n * 32768.0)).toFloat,
        (zc / n.toDouble).toFloat,
        (maxAbs / 32768.0).toFloat,
        segMean(0), segMean(1), segMean(2))
    }

    /** Binary PPM (P6) parse: ASCII header (magic, width, height,
      * maxval; '#' comments) then one whitespace byte, then w·h RGB
      * triplets. Returns (w, h, maxval, rgb row-major). */
    private[graft] def parsePpm(bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
      var pos = 0
      def skipWs(): Unit = {
        var done = false
        while (!done && pos < bytes.length) {
          val c = bytes(pos)
          if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
          else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
          else done = true
        }
      }
      def token(): String = {
        skipWs(); val s = pos
        while (pos < bytes.length && !Character.isWhitespace(bytes(pos).toChar)) pos += 1
        new String(bytes, s, pos - s, java.nio.charset.StandardCharsets.US_ASCII)
      }
      require(token() == "P6", "not a binary PPM (P6) payload")
      def intToken(): Int = {
        val t = token()
        try t.toInt catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"bad PPM header token '$t'")
        }
      }
      val w = intToken(); val h = intToken(); val maxval = intToken()
      require(w > 0 && h > 0 && maxval > 0 && maxval <= 255,
        s"unsupported PPM header w=$w h=$h maxval=$maxval")
      pos += 1 // exactly one whitespace byte separates header and raster
      // raster size in LONG: w·h·3 on hostile headers overflows Int and
      // would wrap past the truncation require into garbage features
      val n = w.toLong * h * 3
      require(n <= Int.MaxValue && bytes.length >= pos + n, "truncated PPM raster")
      val rgb = new Array[Int](n.toInt)
      var i = 0
      while (i < n.toInt) { rgb(i) = bytes(pos + i) & 0xff; i += 1 }
      (w, h, maxval, rgb)
    }

    /** 24-bit uncompressed (BI_RGB) BMP parse: BITMAPINFOHEADER,
      * 4-byte-aligned BGR rows, bottom-up unless height is negative.
      * Returns (w, h, rgb row-major top-down). */
    private[graft] def parseBmp(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def i32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP payload")
      val dataOff = i32(10)
      // a negative/backwards data offset is hostile-header territory: it
      // would pass a naive length check and index bytes negatively
      require(dataOff >= 54, s"bad BMP data offset $dataOff")
      require(i32(14) >= 40, "BMP: BITMAPINFOHEADER required")
      val w = i32(18); val hRaw = i32(22)
      val bottomUp = hRaw > 0
      val h = if (hRaw == Int.MinValue) -1 else math.abs(hRaw)
      require(w > 0 && h > 0, s"bad BMP dims ${w}x$hRaw")
      require(u16(26) == 1 && u16(28) == 24 && i32(30) == 0,
        "only 24-bit uncompressed (BI_RGB) BMP supported")
      // stride and raster bounds in LONG — w·3 alone overflows Int past
      // ~715M columns, wrapping the stride negative
      val strideL = ((w.toLong * 3 + 3) / 4) * 4
      require(w.toLong * h * 3 <= Int.MaxValue, s"BMP raster too large ${w}x$h")
      require(bytes.length >= dataOff + strideL * h, "truncated BMP raster")
      val rowStride = strideL.toInt // ≤ bytes.length after the require
      val rgb = new Array[Int](w * h * 3)
      var row = 0
      while (row < h) {
        val srcRow = if (bottomUp) h - 1 - row else row
        val base = dataOff + srcRow * rowStride
        var x = 0
        while (x < w) {
          val o = 3 * (row * w + x)
          rgb(o) = bytes(base + 3 * x + 2) & 0xff     // R (BGR on disk)
          rgb(o + 1) = bytes(base + 3 * x + 1) & 0xff // G
          rgb(o + 2) = bytes(base + 3 * x) & 0xff     // B
          x += 1
        }
        row += 1
      }
      (w, h, rgb)
    }

    /** RIFF/WAVE parse, chunk-walking (word-aligned): requires a PCM
      * (format 1) 16-bit `fmt ` chunk before `data`; returns
      * (sampleRate, channel-0 samples as signed ints). */
    private[graft] def parseWav(bytes: Array[Byte]): (Int, Array[Int]) = {
      def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def i32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      require(bytes.length >= 12, "truncated RIFF header")
      var pos = 12
      var sampleRate = 0; var channels = 0; var haveFmt = false
      while (pos + 8 <= bytes.length) {
        val id = new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val sz = i32(pos + 4)
        require(sz >= 0 && pos + 8 + sz.toLong <= bytes.length, s"bad WAV chunk '$id' size $sz")
        if (id == "fmt ") {
          // the fields below span 16 bytes; a smaller declared chunk
          // would read past it (and possibly the buffer)
          require(sz >= 16, s"WAV fmt chunk too small ($sz)")
          require(u16(pos + 8) == 1, "only PCM (format 1) WAV supported")
          channels = u16(pos + 10)
          sampleRate = i32(pos + 12)
          require(u16(pos + 22) == 16, "only 16-bit PCM WAV supported")
          require(channels >= 1, "WAV with zero channels")
          haveFmt = true
        } else if (id == "data") {
          require(haveFmt, "WAV data chunk before fmt chunk")
          val frames = sz / (2 * channels)
          val out = new Array[Int](frames)
          var i = 0
          while (i < frames) {
            val o = pos + 8 + i * 2 * channels
            out(i) = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
            i += 1
          }
          return (sampleRate, out)
        }
        pos += 8 + sz + (sz & 1)
      }
      throw new IllegalArgumentException("WAV payload has no data chunk")
    }

    /** Encode a grayscale-from-bytes P6 PPM: pixel i's channels are the
      * source bytes at (i, i+1, i+2) mod len — channel-distinct, fully
      * SQL-reproducible, so an encode→decode roundtrip is oracle-gated. */
    private[graft] def encodePpm(w: Int, h: Int, src: Array[Byte]): Array[Byte] = {
      require(src.length > 0, "empty PPM source")
      val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val n = w * h
      val out = new Array[Byte](header.length + n * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      val len = src.length
      var i = 0
      while (i < n) {
        out(header.length + 3 * i) = src(i % len)
        out(header.length + 3 * i + 1) = src((i + 1) % len)
        out(header.length + 3 * i + 2) = src((i + 2) % len)
        i += 1
      }
      out
    }

    /** Canonical 44-byte-header mono 16-bit PCM WAV encode. */
    private[graft] def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = new Array[Byte](44 + dataLen)
      def putAscii(o: Int, s: String): Unit = {
        var i = 0; while (i < s.length) { out(o + i) = s.charAt(i).toByte; i += 1 }
      }
      def put32(o: Int, v: Int): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
        out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
      }
      def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
      putAscii(0, "RIFF"); put32(4, 36 + dataLen); putAscii(8, "WAVE")
      putAscii(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
      put32(24, sampleRate); put32(28, sampleRate * 2); put16(32, 2); put16(34, 16)
      putAscii(36, "data"); put32(40, dataLen)
      var i = 0
      while (i < samples.length) {
        put16(44 + 2 * i, samples(i) & 0xffff); i += 1
      }
      out
    }
  }

  /** Real-codec media fixture: encodes each document's payload bytes
    * (the codepoint-mod-256 projection, see [[syntheticMedia]]) into a
    * REAL container — even doc_id → P6 PPM (w = n_chars%16+4,
    * h = n_chars%12+4, channels = bytes at i/i+1/i+2 mod len), odd
    * doc_id → mono 16-bit PCM WAV at 8 kHz (sample i =
    * (byte_i − 128)·256, capped at `maxSamples`). Because the pixel/
    * sample derivation is pure integer arithmetic over the text bytes,
    * an SQL oracle can compute the decoded-feature answer DIRECTLY from
    * the documents table — gating the encoder AND decoder at once.
    * Map-only `mapPartitions`, iterator-to-iterator. */
  def codecMedia(docs: DataFrame, maxSamples: Int = 2048): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    docs.where(length(col("text")) > 0)
      .select(col("doc_id"),
        graft.functions.NativeExprs.codepointBytes(col("text")).as("b"),
        col("n_chars").cast("int").as("nc"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0); val b = r.getAs[Array[Byte]](1); val nc = r.getInt(2)
          if (id % 2 == 0) {
            val w = nc % 16 + 4; val h = nc % 12 + 4
            Row(id, "image", Codec.encodePpm(w, h, b), Row(w, h, null, null))
          } else {
            val n = math.min(b.length, maxSamples)
            val samples = new Array[Short](n)
            var i = 0
            while (i < n) { samples(i) = (((b(i) & 0xff) - 128) * 256).toShort; i += 1 }
            Row(id, "audio", Codec.encodeWavPcm16(samples, 8000), Row(null, null, 8000, null))
          }
        }
      }(enc)
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

  /** Perceptual AVERAGE-HASH (aHash) per decoded image: integer
    * luminance `r + 2g + b` per pixel, the raster split into
    * `grid × grid` blocks (pixel (x, y) → block (y·grid div h,
    * x·grid div w)), bit `by·grid + bx` set iff the block's mean
    * luminance is at or above the image's global mean. The comparison
    * is an EXACT integer cross-product (`blockSum·nTotal ≥
    * totalSum·nBlock` — no float means), so the hash is bit-identical
    * on any engine and the oracle replays it in SQL. Blocks with no
    * pixels (raster smaller than the grid) contribute 0 bits.
    *
    * This is the standard image near-dup key of a training-data
    * pipeline (identical hash ⇒ perceptually-identical raster;
    * re-encoded/slightly-edited copies agree on most bits): exact-hash
    * grouping is the O(n) dedup pass, banded-Hamming the near-dup pass
    * ([[Dedup.simhashPairs]]'s machinery applies unchanged — the hash
    * IS a 64-bit fingerprint column). grid = 8 is the standard 64-bit
    * aHash for real rasters; the synthetic fixtures go as small as
    * 4×4, so the oracle-gated query runs grid = 4 (every block
    * non-empty at w, h ≥ 4). Headroom: blockSum·n ≤ 1020·n² — exact
    * longs past 10⁸-pixel rasters.
    *
    * `mapPartitions` is the codec boundary (same argument as
    * [[extractFeatures]]); everything after the hash is plain
    * DataFrame algebra. */
  def perceptualHash(media: DataFrame, grid: Int = 8): DataFrame = {
    require(grid >= 1 && grid * grid <= 64, s"grid² must fit a long, got $grid")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.where(col("kind") === "image")
      .select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, _, rgb) = Codec.parsePpm(r.getAs[Array[Byte]](1))
          val nb = grid * grid
          val bSum = new Array[Long](nb)
          val bCnt = new Array[Long](nb)
          var tSum = 0L
          val n = w * h
          var i = 0
          while (i < n) {
            val lum = rgb(3 * i) + 2L * rgb(3 * i + 1) + rgb(3 * i + 2)
            val b = (i / w * grid / h) * grid + (i % w * grid / w)
            bSum(b) += lum; bCnt(b) += 1; tSum += lum
            i += 1
          }
          var hash = 0L
          var k = 0
          while (k < nb) {
            if (bCnt(k) > 0 && bSum(k) * n >= tSum * bCnt(k)) hash |= 1L << k
            k += 1
          }
          Row(r.getLong(0), w, h, hash)
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
