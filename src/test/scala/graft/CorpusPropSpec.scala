package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property tests for the corpus-assembly operators: packing must satisfy
  * the running-sum identity for ANY (token counts, budget, shards), and
  * split assignment must be a pure function of content. Deterministic:
  * generators driven by fixed seeds. */
class CorpusPropSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  private val corpusGen: Gen[List[(Long, Int)]] = for {
    n <- Gen.chooseNum(1, 200)
    ids <- Gen.pick(n, 0L until 1000L)
    toks <- Gen.listOfN(n, Gen.chooseNum(0, 400))
  } yield ids.toList.zip(toks)

  test("pack: running-sum identity holds for arbitrary counts, budgets, shard counts") {
    (1L to 8L).foreach { seed =>
      val rows = sample(corpusGen, seed)
      val budget = sample(Gen.chooseNum(1, 600), seed * 31)
      val nShards = sample(Gen.chooseNum(1, 9), seed * 17)
      val df = rows.map { case (id, nt) => (id, nt) }.toDF("doc_id", "nt")
      val out = Corpus.pack(df, col("nt"), budget, nShards)
        .select("doc_id", "shard", "n_tokens", "pack_id", "tok_offset")
        .as[(Long, Long, Long, Long, Long)].collect()
      // pack drops non-positive token counts (zero-token docs would all
      // share one start position, unbounding a gather group) — the
      // identity is over the kept docs only
      assert(out.length === rows.count(_._2 >= 1))
      out.groupBy(_._2).foreach { case (shard, g) =>
        var cum = 0L
        g.sortBy(_._1).foreach { case (id, sh, nt, pid, off) =>
          assert(sh === id % nShards)
          assert(off >= 0 && off < budget, s"seed=$seed budget=$budget id=$id")
          assert(pid * budget + off === cum, s"seed=$seed budget=$budget id=$id")
          cum += nt
        }
      }
    }
  }

  test("chunk: coverage, stride, and tail-truncation hold for arbitrary (counts, budget, overlap)") {
    (1L to 8L).foreach { seed =>
      val rows = sample(corpusGen, seed)
      val budget = sample(Gen.chooseNum(1, 300), seed * 31)
      val overlap = sample(Gen.chooseNum(0, budget - 1), seed * 17)
      val step = (budget - overlap).toLong
      val df = rows.map { case (id, nt) => (id, nt) }.toDF("doc_id", "nt")
      val out = Corpus.chunk(df, col("nt"), budget, overlap)
        .select("doc_id", "chunk_idx", "chunk_start", "chunk_len")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      val kept = rows.filter(_._2 >= 1)
      assert(out.keySet === kept.map(_._1).toSet) // zero-token docs dropped
      kept.foreach { case (id, ntI) =>
        val n = ntI.toLong
        val chunks = out(id)
        assert(chunks.length === ((n - 1) / step + 1),
          s"seed=$seed budget=$budget overlap=$overlap n=$n")
        chunks.zipWithIndex.foreach { case ((_, idx, start, len), i) =>
          assert(idx === i && start === i * step)
          assert(len === math.min(budget.toLong, n - start) && len >= 1)
        }
        // exact coverage of [0, n): total new (non-overlapped) tokens
        val covered = chunks.map { case (_, _, s, l) => s + l }.max
        assert(covered === n, "chunks must end exactly at the document end")
      }
    }
  }

  test("chunkText: assignments equal chunk's, and the slices tile the token array (arbitrary corpora)") {
    (1L to 8L).foreach { seed =>
      val rows = sample(corpusGen, seed)
      val budget = sample(Gen.chooseNum(1, 300), seed * 31)
      val overlap = sample(Gen.chooseNum(0, budget - 1), seed * 17)
      // synthesize a document whose token i is "w<i>": the slice content
      // is then fully predicted by (chunk_start, chunk_len)
      val df = rows.map { case (id, nt) =>
        (id, (0 until nt).map(i => s"w$i").mkString(" "))
      }.toDF("doc_id", "text")
      val toks = split(col("text"), " ")
      // empty text tokenizes to [""] under the split convention — emulate
      // TextOps.tokens' nonempty result so counts match chunk's n >= 1 gate
      val out = Corpus.chunkText(df, toks, budget, overlap)
        .select("doc_id", "chunk_idx", "chunk_start", "chunk_len", "chunk_text")
        .as[(Long, Long, Long, Long, String)].collect()
      val assign = Corpus.chunk(df, size(toks), budget, overlap)
        .select("doc_id", "chunk_idx", "chunk_start", "chunk_len")
        .as[(Long, Long, Long, Long)].collect()
      assert(out.map(r => (r._1, r._2, r._3, r._4)).sorted === assign.sorted,
        s"seed=$seed: chunkText must assign exactly chunk's windows")
      out.foreach { case (id, _, start, len, txt) =>
        val nt = rows.find(_._1 == id).get._2
        val expected =
          if (nt == 0) "" // the one empty token
          else (start until start + len).map(i => s"w$i").mkString(" ")
        assert(txt === expected, s"seed=$seed id=$id start=$start len=$len")
      }
    }
  }

  test("assignSplit: bucket is a pure function of text, independent of corpus and percentages") {
    val texts = (0 until 60).map(i => s"content $i ${"x" * (i % 7)}")
    val full = Corpus.assignSplit(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      col("text"))
      .select("text", "bucket").as[(String, Long)].collect().toMap
    (1L to 4L).foreach { seed =>
      val subset = sample(Gen.someOf(texts), seed).toSeq
      val tr = sample(Gen.chooseNum(1, 98), seed * 13)
      val va = sample(Gen.chooseNum(0, 100 - tr - 1), seed * 7)
      val out = Corpus.assignSplit(
        subset.zipWithIndex.map { case (t, i) => (i.toLong + 500, t) }.toDF("doc_id", "text"),
        col("text"), trainPct = tr, valPct = va)
        .select("text", "bucket", "split").as[(String, Long, String)].collect()
      out.foreach { case (t, b, s) =>
        assert(b === full(t), "bucket must not depend on corpus membership or doc_id")
        val expected = if (b < tr) "train" else if (b < tr + va) "val" else "test"
        assert(s === expected)
      }
    }
  }

  test("deterministicShuffle: bijection + per-shard density for arbitrary ids and shard counts") {
    (1L to 6L).foreach { seed =>
      val ids = sample(Gen.pick(sample(Gen.chooseNum(1, 150), seed * 3),
        0L until 5000L), seed).toList
      val nShards = sample(Gen.chooseNum(1, 11), seed * 19)
      val out = Corpus.deterministicShuffle(
          ids.toDF("doc_id"), col("doc_id"), seed, nShards)
        .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
      assert(out.length === ids.length)
      assert(out.map(_._1).toSet === ids.toSet)
      out.groupBy(_._2).foreach { case (sh, g) =>
        assert(sh >= 0 && sh < nShards)
        assert(g.map(_._3).sorted.toSeq === (0L until g.length).toSeq,
          s"seed=$seed nShards=$nShards shard=$sh positions not dense")
      }
    }
  }

  test("temperatureMix: shares are valid distributions and sqrt-proportional for arbitrary mixes") {
    (1L to 5L).foreach { seed =>
      val nSrc = sample(Gen.chooseNum(2, 12), seed * 5)
      val sizes = sample(Gen.listOfN(nSrc, Gen.chooseNum(1, 5000)), seed * 11)
      val rows = sizes.zipWithIndex.flatMap { case (tok, i) =>
        Seq((i.toLong, s"s$i", tok.toLong))
      }
      val m = Corpus.temperatureMix(
          rows.toDF("doc_id", "source", "nt"), col("source"), col("nt"))
        .select("source", "n_tokens", "raw_share", "t_share")
        .as[(String, Long, Double, Double)].collect()
      assert(m.length === nSrc)
      // quantized shares sum to 1 within nSrc rounding steps
      assert(math.abs(m.map(_._3).sum - 1.0) <= nSrc * 1e-4)
      assert(math.abs(m.map(_._4).sum - 1.0) <= nSrc * 1e-4)
      // t_share ordering follows sqrt(n) ordering (monotone transform)
      val bySize = m.sortBy(_._2)
      assert(bySize.map(_._4).toSeq === bySize.map(_._4).sorted.toSeq,
        s"seed=$seed t_share must be monotone in n_tokens")
      // flattening: t_share ratio between extreme sources is compressed
      val (lo, hi) = (bySize.head, bySize.last)
      if (lo._2 < hi._2 && lo._3 > 0 && lo._4 > 0) {
        assert(hi._4 / lo._4 <= hi._3 / lo._3 * 1.01,
          s"seed=$seed temperature must compress the spread")
      }
    }
  }
}
