package graft

import graft.operators.Multimodal.Codec
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure-JVM media codecs: container
  * encode→parse roundtrips must be lossless for ANY payload, and the
  * feature functions must be total over decoded values. Plain JVM
  * code — no Spark session needed. Deterministic: generators driven
  * by fixed seeds. */
class MultimodalPropSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  test("WAV: encode→parse roundtrip is lossless for arbitrary 16-bit sample arrays") {
    val gen = for {
      n <- Gen.chooseNum(1, 2000)
      sr <- Gen.oneOf(8000, 16000, 44100, 48000)
      samples <- Gen.listOfN(n,
        Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield (sr, samples.map(_.toShort).toArray)
    (1L to 20L).foreach { seed =>
      val (sr, samples) = sample(gen, seed)
      val (gotSr, got) = Codec.parseWav(Codec.encodeWavPcm16(samples, sr))
      assert(gotSr === sr, s"seed=$seed")
      assert(got.toSeq === samples.map(_.toInt).toSeq, s"seed=$seed")
      // features are total and finite over any decoded signal
      val f = Codec.audioFeatures(gotSr, got)
      assert(f.length === 8 && f.forall(v => !v.isNaN && !v.isInfinite), s"seed=$seed")
      // normalized magnitudes stay in [0, 1]
      assert(f(2) >= 0f && f(2) <= 1f && f(4) >= 0f && f(4) <= 1f, s"seed=$seed")
    }
  }

  test("PPM: encode→parse roundtrip recovers dims, maxval, and the exact raster") {
    val gen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 40)
      srcLen <- Gen.chooseNum(1, 500)
      src <- Gen.listOfN(srcLen, Gen.chooseNum(0, 255))
    } yield (w, h, src.map(_.toByte).toArray)
    (1L to 20L).foreach { seed =>
      val (w, h, src) = sample(gen, seed)
      val (gw, gh, maxval, rgb) = Codec.parsePpm(Codec.encodePpm(w, h, src))
      assert((gw, gh, maxval) === (w, h, 255), s"seed=$seed")
      val len = src.length
      (0 until w * h).foreach { i =>
        assert(rgb(3 * i) === (src(i % len) & 0xff), s"seed=$seed px=$i R")
        assert(rgb(3 * i + 1) === (src((i + 1) % len) & 0xff), s"seed=$seed px=$i G")
        assert(rgb(3 * i + 2) === (src((i + 2) % len) & 0xff), s"seed=$seed px=$i B")
      }
      val f = Codec.imageFeatures(gw, gh, maxval, rgb)
      assert(f.length === 8 && f.forall(v => !v.isNaN && !v.isInfinite), s"seed=$seed")
      // mean channels and shares are normalized into [0, 1]
      assert(f.drop(2).forall(v => v >= 0f && v <= 1f), s"seed=$seed: ${f.toSeq}")
    }
  }

  test("truncated or corrupted containers fail loudly, never return garbage") {
    val wav = Codec.encodeWavPcm16(Array[Short](1, 2, 3), 8000)
    intercept[IllegalArgumentException](Codec.parseWav(wav.take(20)))
    val ppm = Codec.encodePpm(4, 4, Array[Byte](1, 2, 3))
    intercept[IllegalArgumentException](Codec.parsePpm(ppm.take(ppm.length - 1)))
    intercept[IllegalArgumentException](Codec.parsePpm("P5\n2 2\n255\n1234".getBytes))
    // a fmt chunk claiming a non-PCM format is rejected
    val nonPcm = wav.clone(); nonPcm(20) = 3 // IEEE-float format tag
    intercept[IllegalArgumentException](Codec.parseWav(nonPcm))
  }
}
