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

  test("ADC from LUTs equals distance-to-reconstruction (per-subspace regrouping only)") {
    val r = graft.sources.Records.fromEmbeddings(spark, "/root/testdata/sf0.001")
    val books = VectorOps.pqPack(
      r.where(col("id") < 16)
        .select(col("id").cast("int").as("code"), col("embedding"))
        .select(explode(sequence(lit(0), lit(3))).as("sub_idx"),
          col("code"), col("embedding"))
        .select(col("sub_idx"), col("code"),
          slice(col("embedding"), col("sub_idx") * 16 + 1, lit(16)).as("cvec")))
    val q = r.where(col("id") === 0).select(col("embedding").as("qvec"))
    val luts = q.crossJoin(broadcast(books))
      .select(VectorOps.pqLuts(col("qvec"), col("books")).as("luts"))
    // LUT shape: m books × |book| entries, every entry finite
    val lutRows = luts.as[Seq[Seq[Double]]].head()
    assert(lutRows.length === 4 && lutRows.forall(_.length === 16))
    assert(lutRows.flatten.forall(d => !d.isNaN && !d.isInfinite))
    // compare against reconstruct-then-distance on the same codes
    val qv = q.head().getSeq[Float](0)
    val check = r.crossJoin(broadcast(books)).crossJoin(broadcast(luts))
      .withColumn("codes", VectorOps.pqCodes(col("embedding"), col("books")))
      .withColumn("recon", VectorOps.pqReconstruct(col("codes"), col("books")))
      .select(col("id"),
        VectorOps.adcDistance(col("codes"), col("luts")).as("adc"),
        graft.functions.NativeExprs.sqEuclidean(
          typedlit(qv), col("recon")).as("flat"))
      .as[(Long, Double, Double)].collect()
    assert(check.length > 16)
    check.foreach { case (id, adc, flat) =>
      assert(math.abs(adc - flat) <= 1e-9 * math.max(1.0, flat),
        s"id=$id adc=$adc flat=$flat")
    }
  }

  test("PQ: codebook-source vectors reconstruct exactly; codes dense and in range") {
    val r = graft.sources.Records.fromEmbeddings(spark, "/root/testdata/sf0.001")
    val books = VectorOps.pqPack(
      r.where(col("id") < 16)
        .select(col("id").cast("int").as("code"), col("embedding"))
        .select(explode(sequence(lit(0), lit(3))).as("sub_idx"),
          col("code"), col("embedding"))
        .select(col("sub_idx"), col("code"),
          slice(col("embedding"), col("sub_idx") * 16 + 1, lit(16)).as("cvec")))
    val enc = r.crossJoin(broadcast(books))
      .withColumn("codes", VectorOps.pqCodes(col("embedding"), col("books")))
      .withColumn("recon", VectorOps.pqReconstruct(col("codes"), col("books")))
    val rows = enc.select("id", "embedding", "codes", "recon")
      .as[(Long, Seq[Float], Seq[Int], Seq[Float])].collect()
    assert(rows.length > 16)
    rows.foreach { case (id, v, codes, recon) =>
      assert(codes.length === 4 && recon.length === 64)
      assert(codes.forall(c => c >= 0 && c < 16), s"id=$id codes $codes")
      // a vector that IS a codebook source must encode to its own row in
      // every subspace and reconstruct bit-exactly (distance 0 argmin)
      if (id < 16) {
        assert(codes.forall(_ == id.toInt), s"id=$id codes $codes")
        assert(recon === v, s"id=$id reconstruction differs")
      }
    }
  }

  test("PQ trained codebooks: exact top-10 survives in ADC top-50; " +
    "reconstruction error well under the signal") {
    import graft.operators.Knn
    import graft.types.Metric
    // Near-uniform synthetic embeddings are PQ's worst case (distance
    // concentration): top-10-vs-top-10 recall is genuinely mediocre for
    // ANY tight code here, so the pinned contracts are the coarse ones a
    // production reranker relies on — the true neighborhood is contained
    // in a small ADC candidate set, and the code error is a fraction of
    // the signal energy. Measured: containment 10/10, error ratio 0.32.
    val r = graft.sources.Records.fromEmbeddings(spark, "/root/testdata/sf0.001")
    val books = VectorOps.pqPack(VectorOps.pqTrain(r, m = 8, dsub = 8, k = 64))
    val qv = r.where(col("id") === 0).select(col("embedding").as("qvec"))
    val exact = Knn.search(r, qv, 10, Metric.Euclidean)
      .select("id").as[Long].collect().toSet
    val adc = r.crossJoin(broadcast(books))
      .withColumn("recon",
        VectorOps.pqReconstruct(
          VectorOps.pqCodes(col("embedding"), col("books")), col("books"))
          .cast("array<float>"))
    val top50 = Knn.search(
        adc.withColumn("embedding", col("recon")).drop("books", "recon"),
        qv, 50, Metric.Euclidean)
      .select("id").as[Long].collect().toSet
    assert(exact.intersect(top50).size >= 9,
      s"containment ${exact.intersect(top50).size}/10 too low")
    val errs = adc.select(
        avg(graft.functions.NativeExprs.sqEuclidean(col("embedding"), col("recon"))).as("mse"),
        avg(graft.functions.NativeExprs.sqEuclidean(col("embedding"), array_repeat(lit(0.0f), 64))).as("norm2"))
      .head()
    val ratio = errs.getDouble(0) / errs.getDouble(1)
    assert(ratio < 0.45, s"reconstruction error ratio $ratio too high")
  }

  test("cosine distance equals half the squared L2 distance on normalized vectors") {
    import graft.types.Metric
    val rnd = new scala.util.Random(11)
    val rows = (0L until 200L)
      .map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "embedding")
    val n = rows.select(col("id"),
      VectorOps.l2Normalize(col("embedding")).as("nv"), col("embedding"))
    val both = n.crossJoin(
        n.where(col("id") === 0).select(col("nv").as("qn"), col("embedding").as("qr")))
      .select(
        (graft.functions.NativeExprs.sqEuclidean(col("nv"), col("qn")) / 2).as("halfL2"),
        Metric.Cosine.distance(col("embedding"), col("qr")).as("cosd"))
      .as[(Double, Double)].collect()
    both.foreach { case (h, c) =>
      assert(math.abs(h - c) < 1e-9, s"identity violated: $h vs $c")
    }
    // unit norms (within float-rounding slack)
    val norms = n.select(aggregate(transform(col("nv"),
        x => x * x), lit(0.0), (a, x) => a + x)).as[Double].collect()
    norms.foreach(x => assert(math.abs(x - 1.0) < 1e-12))
    // zero vector: normalizes to zeros, no NaN
    val z = Seq((1L, Seq.fill(4)(0f))).toDF("id", "embedding")
      .select(VectorOps.l2Normalize(col("embedding"))).as[Seq[Double]].head()
    assert(z === Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("householderReflect: orthogonal (norm/distance preserved), involutive") {
    val rnd = new scala.util.Random(42)
    def v64() = Seq.fill(64)(rnd.nextFloat() * 4 - 2)
    val df = (0 until 20).map(i => (i.toLong, v64(), v64())).toDF("id", "a", "b")
    def sq(c: org.apache.spark.sql.Column) =
      aggregate(transform(c, x => x * x), lit(0.0), (acc, x) => acc + x)
    val ra = VectorOps.householderReflect(col("a"))
    val rb = VectorOps.householderReflect(col("b"))
    val rows = df.select(
      sq(col("a").cast("array<double>")).as("na"), sq(ra).as("nra"),
      graft.functions.NativeExprs.sqEuclidean(col("a"), col("b")).as("d"),
      graft.functions.NativeExprs.sqEuclidean(ra, rb).as("rd"),
      graft.functions.NativeExprs.sqEuclidean(
        VectorOps.householderReflect(ra), col("a").cast("array<double>")).as("inv"))
      .as[(Double, Double, Double, Double, Double)].collect()
    rows.foreach { case (na, nra, d, rd, inv) =>
      assert(math.abs(na - nra) / na < 1e-12, s"norm not preserved: $na vs $nra")
      assert(math.abs(d - rd) / (d + 1e-30) < 1e-10, s"distance not preserved: $d vs $rd")
      assert(inv < 1e-20 * na, s"not involutive: residual $inv")
    }
    // the reflection genuinely moves vectors (it is not the identity)
    val moved = df.select(graft.functions.NativeExprs.sqEuclidean(
      ra, col("a").cast("array<double>"))).as[Double].collect()
    assert(moved.forall(_ > 0.0))
  }

  test("randomProject: deterministic in the seed, balanced signs, " +
    "JL distance preservation within the lemma's distortion band") {
    // sign matrix is a pure function of (seed, dIn, dOut)
    assert(VectorOps.rpSigns(7L, 64, 8) === VectorOps.rpSigns(7L, 64, 8))
    assert(VectorOps.rpSigns(7L, 64, 8) !== VectorOps.rpSigns(8L, 64, 8))
    // splitmix64 signs are roughly balanced (a constant-sign row would
    // make the projection a degenerate sum)
    val signs = VectorOps.rpSigns(7L, 64, 16)
    signs.foreach { row =>
      val pos = row.count(_ == 1)
      assert(pos > 16 && pos < 48, s"skewed sign row: $pos of 64 positive")
    }
    // JL sanity: mean squared-distance ratio across random pairs is near
    // 1 (unbiasedness), individual ratios stay within a wide band —
    // dOut=16 gives large per-pair variance, so bands are generous
    val rnd = new scala.util.Random(3)
    def v64() = Seq.fill(64)(rnd.nextFloat() * 2 - 1)
    val df = (0 until 64).map(i => (i.toLong, v64(), v64())).toDF("id", "a", "b")
    val ratios = df.select(
      (graft.functions.NativeExprs.sqEuclidean(
        VectorOps.randomProject(col("a"), signs),
        VectorOps.randomProject(col("b"), signs)) /
        graft.functions.NativeExprs.sqEuclidean(col("a"), col("b"))).as("r"))
      .as[Double].collect()
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3, s"distance ratio mean off: $mean")
    assert(ratios.forall(r => r > 0.05 && r < 5.0),
      s"pathological per-pair distortion: ${ratios.min} .. ${ratios.max}")
  }

  test("binaryCodes: popcount == positive-component count; scala-model bit " +
    "identity; ragged tail bits stay zero") {
    val rnd = new scala.util.Random(11)
    // widths straddling the word boundary: ragged, exact, multi-word
    val vecs = Seq(3, 63, 64, 65, 100, 128).zipWithIndex.map { case (d, i) =>
      (i.toLong, Seq.fill(d)((rnd.nextFloat() - 0.5f) * 2f))
    } :+ (99L, Seq.fill(64)(0.0f)) // all-zero → all bits clear
    val rows = vecs.toDF("id", "v")
      .select(col("id"), col("v"), VectorOps.binaryCodes(col("v")).as("c"))
      .as[(Long, Seq[Float], Seq[Long])].collect()
    rows.foreach { case (id, v, code) =>
      assert(code.length === (v.length + 63) / 64, s"id=$id word count")
      // scala model: same sign rule, same packing
      val model = Array.fill((v.length + 63) / 64)(0L)
      v.zipWithIndex.foreach { case (x, i) =>
        if (x > 0f) model(i / 64) |= (1L << (i % 64))
      }
      assert(code === model.toSeq, s"id=$id code mismatch")
      assert(code.map(java.lang.Long.bitCount).sum === v.count(_ > 0f),
        s"id=$id popcount != positive count")
    }
  }

  test("hammingDistance: zero on self, symmetric, equals sign-mismatch count") {
    val rnd = new scala.util.Random(12)
    val pairs = (0L until 40L).map(i =>
      (i, Seq.fill(64)((rnd.nextFloat() - 0.5f) * 2f),
        Seq.fill(64)((rnd.nextFloat() - 0.5f) * 2f)))
    val df = pairs.toDF("id", "a", "b")
      .withColumn("ca", VectorOps.binaryCodes(col("a")))
      .withColumn("cb", VectorOps.binaryCodes(col("b")))
    val rows = df.select(col("id"), col("a"), col("b"),
        VectorOps.hammingDistance(col("ca"), col("cb")).as("h"),
        VectorOps.hammingDistance(col("cb"), col("ca")).as("hs"),
        VectorOps.hammingDistance(col("ca"), col("ca")).as("h0"))
      .as[(Long, Seq[Float], Seq[Float], Long, Long, Long)].collect()
    rows.foreach { case (id, a, b, h, hs, h0) =>
      assert(h0 === 0L, s"id=$id self-distance")
      assert(h === hs, s"id=$id asymmetric")
      val mism = a.zip(b).count { case (x, y) => (x > 0f) != (y > 0f) }
      assert(h === mism.toLong, s"id=$id hamming $h != sign mismatches $mism")
    }
  }

  test("hammingDistance: ragged (mixed-width) codes yield NULL, never a partial sum") {
    // the documented equal-width precondition: zip_with pads the short
    // side with null and the fold propagates it — pinned so the SQL
    // twin's len(a)=len(b) guard stays aligned with engine behavior
    val df = Seq((1L, Seq(3L, 5L), Seq(3L))).toDF("id", "ca", "cb")
      .select(VectorOps.hammingDistance(col("ca"), col("cb")).as("h"))
    assert(df.collect().head.isNullAt(0),
      "ragged codes must surface as NULL, not a prefix distance")
  }

  test("GramSumAgg: exact moment sums match the brute-force model across " +
    "partitionings; symmetric; width mismatch fails loudly") {
    val rnd = new scala.util.Random(21)
    val vecs = (0L until 300L).map(i => (i, Seq.fill(6)(rnd.nextLong() % 1000L)))
    // brute-force sufficient statistics
    val d = 6
    val wantS1 = Array.fill(d)(0L)
    val wantS2 = Array.fill(d * d)(0L)
    vecs.foreach { case (_, q) =>
      for (i <- 0 until d; j <- 0 until d) wantS2(i * d + j) += q(i) * q(j)
      for (i <- 0 until d) wantS1(i) += q(i)
    }
    Seq(1, 3, 13).foreach { parts =>
      val g = vecs.toDF("id", "q").repartition(parts)
        .agg(graft.functions.GramSumAgg.gramSum(col("q")).as("g"))
        .select(col("g.n"), col("g.s1"), col("g.s2"))
        .as[(Long, Seq[Long], Seq[Long])].head()
      assert(g._1 === 300L)
      assert(g._2 === wantS1.toSeq, s"s1 differs at parts=$parts")
      assert(g._3 === wantS2.toSeq, s"s2 differs at parts=$parts")
    }
    // symmetry of the mirrored output
    val s2 = vecs.toDF("id", "q")
      .agg(graft.functions.GramSumAgg.gramSum(col("q")).as("g"))
      .select(col("g.s2")).as[Seq[Long]].head()
    for (i <- 0 until d; j <- 0 until d)
      assert(s2(i * d + j) === s2(j * d + i), s"asymmetric at ($i,$j)")
    val ragged = Seq((0L, Seq(1L, 2L)), (1L, Seq(1L, 2L, 3L))).toDF("id", "q")
    val e = intercept[org.apache.spark.SparkException] {
      ragged.coalesce(1)
        .agg(graft.functions.GramSumAgg.gramSum(col("q"))).collect()
    }
    assert(e.getMessage.contains("width mismatch") ||
      e.getCause.getMessage.contains("width mismatch"))
    // a null ELEMENT must fail loudly too, never unbox to a silent 0
    val withNull = spark.range(1)
      .select(array(lit(1L), lit(null).cast("long")).as("q"))
    val e2 = intercept[org.apache.spark.SparkException] {
      withNull.agg(graft.functions.GramSumAgg.gramSum(col("q"))).collect()
    }
    assert(e2.getMessage.contains("null vector element") ||
      e2.getCause.getMessage.contains("null vector element"))
  }

  test("pcaTop: unit loadings, share in (0,1], converged eigenpair, and a " +
    "planted dominant direction is recovered") {
    val rnd = new scala.util.Random(22)
    // planted model: strong variance along a fixed unit direction u,
    // small isotropic noise on 16 dims
    val dim = 16
    val uRaw = Array.fill(dim)(rnd.nextGaussian())
    val un = math.sqrt(uRaw.map(x => x * x).sum)
    val u = uRaw.map(_ / un)
    val data = (0L until 4000L).map { i =>
      val a = rnd.nextGaussian() * 3.0
      (i, (0 until dim).map(k => (a * u(k) + rnd.nextGaussian() * 0.2).toFloat))
    }
    val df = data.toDF("vec_id", "embedding")
    val (x, share) = VectorOps.pcaTop(df, "embedding", iters = 24)
    assert(math.abs(x.map(v => v * v).sum - 1.0) < 1e-9, "loadings not unit")
    assert(share > 0.0 && share <= 1.0, s"share out of range: $share")
    // planted direction dominates: |cos(x, u)| near 1, share near the
    // planted variance fraction 9/(9 + 0.04·16) ≈ 0.93
    val cos = math.abs(x.zip(u).map { case (a, b) => a * b }.sum)
    assert(cos > 0.99, s"planted direction missed: cos=$cos")
    assert(share > 0.85, s"planted share too low: $share")
    // eigenpair residual: C x ≈ λ x (recompute C the same exact way)
    val more = VectorOps.pcaTop(df, "embedding", iters = 60)._1
    val drift = x.zip(more).map { case (a, b) => math.abs(a - b) }.max
    assert(drift < 1e-8, s"not converged at 24 iters: max drift $drift")
  }

  test("pcaTopK: first component == pcaTop; components orthonormal; shares " +
    "non-increasing and recover a planted 2-direction spectrum") {
    val rnd = new scala.util.Random(23)
    val dim = 12
    // two orthogonal planted directions with variances 9 and 4
    val u1 = Array.tabulate(dim)(i => if (i < 6) 1.0 / math.sqrt(6.0) else 0.0)
    val u2 = Array.tabulate(dim)(i => if (i >= 6) 1.0 / math.sqrt(6.0) else 0.0)
    val data = (0L until 5000L).map { i =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 2.0
      (i, (0 until dim).map(k =>
        (a * u1(k) + b * u2(k) + rnd.nextGaussian() * 0.1).toFloat))
    }
    val df = data.toDF("vec_id", "embedding")
    val comps = VectorOps.pcaTopK(df, "embedding", k = 3, iters = 30)
    val (top, topShare) = VectorOps.pcaTop(df, "embedding", iters = 30)
    assert(comps.head._1 === top && comps.head._2 === topShare,
      "k=1 path diverged from the head of the k=3 path")
    // orthonormality across the deflated components
    for (m <- comps.indices) {
      val norm = comps(m)._1.map(v => v * v).sum
      assert(math.abs(norm - 1.0) < 1e-9, s"component $m not unit: $norm")
      for (l <- 0 until m) {
        val dot = comps(m)._1.zip(comps(l)._1).map { case (x, y) => x * y }.sum
        assert(math.abs(dot) < 1e-6, s"components $l,$m not orthogonal: $dot")
      }
    }
    val shares = comps.map(_._2)
    assert(shares === shares.sortBy(-_), s"shares increased: $shares")
    // spectrum: 9 / (9+4+0.01·12) ≈ 0.68, 4 / 13.12 ≈ 0.30, rest tiny
    assert(shares(0) > 0.6 && shares(0) < 0.75, s"share0 off: ${shares(0)}")
    assert(shares(1) > 0.25 && shares(1) < 0.35, s"share1 off: ${shares(1)}")
    assert(shares(2) < 0.01, s"noise share too big: ${shares(2)}")
    val cos1 = math.abs(comps(0)._1.zip(u1).map { case (a, b) => a * b }.sum)
    val cos2 = math.abs(comps(1)._1.zip(u2).map { case (a, b) => a * b }.sum)
    assert(cos1 > 0.99 && cos2 > 0.99, s"planted directions missed: $cos1, $cos2")
  }

  test("pcaProject: scores centered, variance ordered by component, and the " +
    "original columns survive") {
    val rnd = new scala.util.Random(24)
    val dim = 10
    val data = (0L until 3000L).map { i =>
      val a = rnd.nextGaussian() * 2.0
      (i, (0 until dim).map(k =>
        (if (k == 0) a else rnd.nextGaussian() * 0.3).toFloat))
    }
    val df = data.toDF("vec_id", "embedding")
    val got = VectorOps.pcaProject(df, "embedding", k = 2, iters = 24)
      .select("vec_id", "pc0", "pc1").as[(Long, Double, Double)].collect()
    assert(got.length === 3000)
    def stats(xs: Seq[Double]) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / xs.length)
    }
    val (m0, v0) = stats(got.map(_._2).toSeq)
    val (m1, v1) = stats(got.map(_._3).toSeq)
    // mean-centered projection: scores center near 0 (quantization only)
    assert(math.abs(m0) < 1e-2 && math.abs(m1) < 1e-2, s"not centered: $m0 $m1")
    // dominant direction carries the planted variance ~4, noise ~0.09
    assert(v0 > 3.0 && v0 < 5.0, s"pc0 variance off: $v0")
    assert(v1 < 0.5 && v0 > v1, s"variance not ordered: $v0 vs $v1")
  }

  test("binary funnel: Hamming shortlist at 4x k recovers most of the exact " +
    "top-10 (sign bits preserve angular neighborhoods)") {
    import graft.operators.Knn
    import graft.types.Metric
    val r = graft.sources.Records.fromEmbeddings(spark, "/root/testdata/sf0.001")
      .withColumn("bcode", VectorOps.binaryCodes(col("embedding")))
    val q = r.where(col("id") === 0)
      .select(col("embedding").as("qvec"),
        VectorOps.binaryCodes(col("embedding")).as("qcode"))
    val exact = Knn.search(r.drop("bcode"), q.select("qvec"), 10, Metric.Cosine)
      .select("id").as[Long].collect().toSet
    val funnel = Knn.searchHammingRerank(r, q, k = 10, shortlist = 40,
        metric = Metric.Cosine)
      .select("id").as[Long].collect().toSet
    assert(funnel.contains(0L), "query vector must be its own 0-distance hit")
    val recall = exact.intersect(funnel).size
    assert(recall >= 6, s"binary funnel recall too low: $recall/10")
  }

  test("binary funnel: null codes never fill shortlist slots (nulls would " +
    "sort FIRST ascending)") {
    import graft.operators.Knn
    val rnd = new scala.util.Random(33)
    val good = (0L until 100L).map(i =>
      (i, Option(Seq.fill(16)((rnd.nextFloat() - 0.5f) * 2f))))
    val nulls = (1000L until 1060L).map(i => (i, Option.empty[Seq[Float]]))
    val r = (good ++ nulls).toDF("id", "embedding")
      .withColumn("metadata", map(lit("k"), col("id").cast("string")))
      .withColumn("bcode", VectorOps.binaryCodes(col("embedding")))
    val q = good.take(1).toDF("id", "embedding")
      .select(col("embedding").as("qvec"),
        VectorOps.binaryCodes(col("embedding")).as("qcode"))
    val got = Knn.searchHammingRerank(r, q, k = 10, shortlist = 50)
      .select("id").as[Long].collect()
    assert(got.length === 10, s"null codes starved the shortlist: ${got.length}")
    assert(got.forall(_ < 1000L), "a null-embedding row surfaced")
  }

  test("adcDistance: sentinel / out-of-range / null codes yield NULL, " +
    "never an ANSI crash or a partial sum") {
    val df = Seq(
      (1L, Seq(0, 1)),            // valid
      (2L, Seq(-1, 1)),           // pqCodes sentinel
      (3L, Seq(0, 99)),           // out of range
      (4L, null.asInstanceOf[Seq[Int]]), // null array
      (5L, Seq(0))                // ragged (shorter than luts)
    ).toDF("id", "codes")
      .withColumn("luts", array(
        array(lit(1.0), lit(2.0)), array(lit(10.0), lit(20.0))))
    val got = df
      .select(col("id"), VectorOps.adcDistance(col("codes"), col("luts")).as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === Some(21.0))
    assert(got(2L) === None && got(3L) === None && got(4L) === None &&
      got(5L) === None)
  }

  test("greedyKCenters: hand-traced farthest-point walk with the quantized " +
    "tie-break, and radii never increase") {
    import graft.types.Metric
    // 1-D line (padded to 2-D): 0, 1, 10, 11, 100. From seed id0 the
    // walk is 100 → 11 → then a 1.0² TIE between ids 1 and 2 → id wins
    val pts = Seq(0L -> 0f, 1L -> 1f, 2L -> 10f, 3L -> 11f, 4L -> 100f)
      .map { case (id, x) => (id, Seq(x, 0f)) }
      .toDF("id", "embedding")
    val got = VectorOps.greedyKCenters(pts, k = 5, Metric.Euclidean)
      .as[(Int, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1, 0L, None), (2, 4L, Some(10000.0)), (3, 3L, Some(121.0)),
      (4, 1L, Some(1.0)), (5, 2L, Some(1.0))))
    // law: coverage radii are non-increasing (each selection can only
    // shrink the max-min distance), fuzzed on a random cloud
    val rnd = new scala.util.Random(11)
    val cloud = (0L until 200L)
      .map(i => (i, Seq.fill(4)(rnd.nextFloat() * 10f - 5f)))
      .toDF("id", "embedding")
    val radii = VectorOps.greedyKCenters(cloud, k = 10, Metric.Euclidean)
      .as[(Int, Long, Option[Double])].collect().sortBy(_._1)
      .flatMap(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      radii.mkString(","))
    // k = 1 is just the seed; empty input refuses
    assert(VectorOps.greedyKCenters(pts, k = 1, Metric.Euclidean)
      .as[(Int, Long, Option[Double])].collect().toSeq === Seq((1, 0L, None)))
    intercept[IllegalArgumentException] {
      VectorOps.greedyKCenters(pts.where(lit(false)), k = 2, Metric.Euclidean)
    }
  }
}
