package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dedup operators over synthetic near-duplicates (the driver corpus has
  * no exact dups, so these build their own). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the cat sleeps near the warm fire in the old house"

  private lazy val docs = Seq(
    (0L, base),
    (1L, base),                                       // exact dup of 0
    (2L, base.replace("lazy", "sleepy")),             // near dup of 0
    (3L, "completely different text about spark sql engines and shuffles " +
      "partitions catalyst tungsten codegen joins aggregates windows"),
    (4L, base.replace("the old house", "a new barn")) // near dup of 0
  ).toDF("doc_id", "text").cache()

  test("exact dedup groups identical texts, keeps the min id") {
    val got = Dedup.exact(docs)
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toMap
    assert(got(0L) === 2L) // docs 0 and 1 collapse
    assert(got(2L) === 1L)
    assert(got.size === 4) // 4 distinct texts
  }

  test("minhash LSH finds near-duplicate pairs above the threshold") {
    val pairs = Dedup.minhashLsh(docs, shingleN = 3, perms = 16, bands = 4, threshold = 0.4)
      .select("doc_id_a", "doc_id_b", "jaccard").as[(Long, Long, Double)].collect()
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((0L, 1L))) // exact dup: jaccard 1.0
    assert(pairs.find(p => (p._1, p._2) == ((0L, 1L))).get._3 === 1.0)
    assert(pairSet.contains((0L, 2L)) || pairSet.contains((0L, 4L))) // near dups surface
    assert(!pairSet.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc never pairs
  }

  test("simhash: identical docs get identical hashes; near dups are close") {
    val h = Dedup.simhash(docs).select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(h(0L) === h(1L))
    assert(java.lang.Long.bitCount(h(0L) ^ h(2L)) <= 12) // one-word change
    assert(java.lang.Long.bitCount(h(0L) ^ h(3L)) > 12)  // different doc
  }

  test("simhash pairs: exact dup at hamming 0, unrelated doc excluded") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 12)
      .select("doc_id_a", "doc_id_b", "hamming").as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((0L, 1L)) === 0)
    assert(!m.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("embedding near-dup: only same-block pairs above threshold") {
    val emb = Seq(
      (1, 0L, Seq(1f, 0f, 0f)),
      (1, 1L, Seq(1f, 0.01f, 0f)),  // ~identical direction, same block
      (1, 2L, Seq(0f, 1f, 0f)),     // orthogonal, same block
      (2, 3L, Seq(1f, 0f, 0f))      // identical direction, DIFFERENT block
    ).toDF("block", "id", "embedding")
    val got = Dedup.embeddingNearDup(emb, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 1L))) // 0-3 blocked apart; 0-2 below threshold
  }

  test("maxBucket drops viral-duplicate buckets but keeps distinct near-dup pairs") {
    // 80 exact copies of one page (a viral boilerplate cluster: 3160
    // within-cluster pairs) + one distinct near-dup pair
    val viral = (100L until 180L).map(i => (i, base))
    val pairDocs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"))
    val corpus = (viral ++ pairDocs).toDF("doc_id", "text")
    val capped = Dedup.minhashLsh(corpus, shingleN = 3, perms = 16, bands = 4,
      threshold = 0.4, maxBucket = 10)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    // the viral family's buckets (80 > 10) are dropped — its m² pairs never
    // reach verification (exact dedup is the right tool for that family)...
    assert(!capped.exists(p => p._1 >= 100L && p._2 >= 100L))
    // ...while small-bucket near-dups still surface and verify
    assert(capped.contains((0L, 1L)))

    val cappedSim = Dedup.simhashPairs(corpus, maxHamming = 12, maxBucket = 10)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(!cappedSim.exists(p => p._1 >= 100L && p._2 >= 100L))
    assert(cappedSim.contains((0L, 1L)))
  }

  test("composed pipeline bounds a 10k-copy viral family via the default cap") {
    // 10,000 exact copies of one boilerplate page: uncapped, the band
    // self-join would emit ~10⁸ candidate pairs from this family alone.
    // The COMPOSED pipeline (duplicateGroups ∘ minhashLsh with
    // DefaultPipelineMaxBucket — the dedup_groups query shape) drops the
    // viral buckets (10000 > 1000) at candidate generation, so the run
    // completes in bucket-bounded time and the only verified component is
    // the small near-dup pair. (The viral family is exact-duplicate work:
    // Dedup.exact collapses it upstream.)
    val viral = (1000L until 11000L).map(i => (i, base))
    val pairDocs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"))
    val corpus = (viral ++ pairDocs).toDF("doc_id", "text")
    val groups = Dedup.duplicateGroups(
        Dedup.minhashLsh(corpus, shingleN = 3, perms = 16, bands = 4,
          threshold = 0.4, maxBucket = Dedup.DefaultPipelineMaxBucket))
      .as[(Long, Long)].collect().toMap
    assert(groups === Map(0L -> 0L, 1L -> 0L))
  }

  test("duplicateGroups: transitive chains merge, disjoint pairs stay apart, min id is rep") {
    import spark.implicits._
    // chain 1-2-3 (transitive: 1 and 3 never paired directly), pair 10-11,
    // self-contained clique 20-21-22
    val pairs = Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L),
      (20L, 21L), (20L, 22L), (21L, 22L)).toDF("doc_id_a", "doc_id_b")
    val groups = Dedup.duplicateGroups(pairs)
      .as[(Long, Long)].collect().toMap
    assert(groups === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("extendGroups law: incremental CC over a second signal equals from-scratch CC over the union") {
    // graphs chosen to exercise every composition case: a second-signal
    // edge merging two base components (1-2-3 with 10-11 via 3~10), a
    // second-signal-only component (50-51), a base component untouched
    // by signal 2 (20-21-22), and an extra edge INSIDE a base component
    // (1~3, a no-op after contraction)
    val p1 = Seq((2L, 1L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("doc_id_a", "doc_id_b")
    val p2 = Seq((3L, 10L), (50L, 51L), (1L, 3L))
      .toDF("doc_id_a", "doc_id_b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toMap
    val incremental = asMap(
      Dedup.extendGroups(Dedup.duplicateGroups(p1), p2))
    val scratch = asMap(
      Dedup.duplicateGroups(p1.unionByName(p2).distinct()))
    assert(incremental === scratch)
    assert(incremental(11L) === 1L) // merged across signals
    assert(incremental(51L) === 50L) // signal-2-only component
    assert(incremental(22L) === 20L) // untouched base component
    // layering a third empty signal is the identity
    val empty = Seq.empty[(Long, Long)].toDF("doc_id_a", "doc_id_b")
    assert(asMap(Dedup.extendGroups(Dedup.duplicateGroups(p1), empty)) ===
      asMap(Dedup.duplicateGroups(p1)))
    // CHAINING: a third signal extends the already-extended map —
    // production layering (MinHash ∪ SimHash ∪ semantic) — and still
    // equals from-scratch CC over the triple union. p3 bridges a
    // signal-2-only component into a base component and adds its own
    // fresh component.
    val p3 = Seq((51L, 20L), (70L, 71L)).toDF("doc_id_a", "doc_id_b")
    val chained = asMap(Dedup.extendGroups(
      Dedup.extendGroups(Dedup.duplicateGroups(p1), p2), p3))
    val flat = asMap(Dedup.duplicateGroups(
      p1.unionByName(p2).unionByName(p3).distinct()))
    assert(chained === flat)
    assert(chained(51L) === 20L && chained(22L) === 20L) // bridged across three signals
    assert(chained(71L) === 70L)
  }

  test("duplicateGroups: empty pair graph returns an empty map (no NPE on the null sum)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_id_a", "doc_id_b")
    assert(Dedup.duplicateGroups(empty).count() === 0L)
  }

  test("duplicateGroups accepts embeddingNearDup's id_a/id_b via the column params") {
    import spark.implicits._
    // two identical unit vectors in one block → one verified pair (5, 7)
    val blocked = Seq(
      (0, 5L, Array(1.0f, 0.0f)),
      (0, 7L, Array(1.0f, 0.0f)),
      (1, 9L, Array(0.0f, 1.0f))).toDF("block", "id", "embedding")
    val pairs = Dedup.embeddingNearDup(blocked, threshold = 0.99)
    val groups = Dedup.duplicateGroups(pairs, srcCol = "id_a", dstCol = "id_b")
      .as[(Long, Long)].collect().toMap
    assert(groups === Map(5L -> 5L, 7L -> 5L))
  }

  test("bestRepresentatives: max score wins the group, ties to the lowest id") {
    val groups = Seq(
      (10L, 10L), (11L, 10L), (12L, 10L), // group 10: scores 5, 9, 9 → 11 (tie 11<12)
      (20L, 20L), (21L, 20L))             // group 20: 21 outscores the min-id rep
      .toDF("doc_id", "rep_id")
    val scored = Seq((10L, 5L), (11L, 9L), (12L, 9L), (20L, 1L), (21L, 2L))
      .toDF("doc_id", "score")
    val got = Dedup.bestRepresentatives(groups, scored, "score")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((10L, 11L, 3L), (20L, 21L, 2L)))
  }

  test("simhash band layout covers all 60 bits with ±1-width contiguous bands") {
    for (bands <- Seq(1, 4, 9, 13, 60)) {
      val layout = Dedup.simhashBandLayout(bands)
      assert(layout.size === bands)
      assert(layout.map(_._2).sum === 60)
      assert(layout.map(_._2).max - layout.map(_._2).min <= 1)
      // contiguous, starting at 0
      assert(layout.head._1 === 0)
      layout.sliding(2).foreach {
        case Seq((o1, w1), (o2, _)) => assert(o2 === o1 + w1)
        case _ =>
      }
    }
  }

  test("substringSpans: cross-doc and within-doc repeated W-token regions, interval union") {
    val d = Seq(
      (1L, "x1 x2 s1 s2 s3 s4 y1"),            // shared span s1..s4 with doc 2
      (2L, "z1 s1 s2 s3 s4 z2 z3"),
      (3L, "u1 u2 u3"),                        // unique — never flagged
      (4L, "r1 r2 r3 m r1 r2 r3")              // WITHIN-doc repeat of r1 r2 r3
    ).toDF("doc_id", "text")
    val got = Dedup.substringSpans(d, windowTokens = 3)
      .select("doc_id", "n_tokens", "n_flagged", "span_starts", "covered_tokens")
      .as[(Long, Long, Long, Seq[Long], Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 7L, 2L, Seq(2L, 3L), 4L),  // windows @2,@3 → union [2,6) = s1..s4
      (2L, 7L, 2L, Seq(1L, 2L), 4L),  // same span, shifted
      (4L, 7L, 2L, Seq(0L, 4L), 6L))) // disjoint repeats: [0,3) ∪ [4,7)
  }

  test("substringScrub removes exactly the repeated regions; unflagged docs pass through") {
    val d = Seq(
      (1L, "x1 x2 s1 s2 s3 s4 y1"),
      (2L, "z1 s1 s2 s3 s4 z2 z3"),
      (3L, "u1 u2 u3"),
      (4L, "r1 r2 r3 m r1 r2 r3")
    ).toDF("doc_id", "text")
    val got = Dedup.substringScrub(d, windowTokens = 3)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "x1 x2 y1"),
      (2L, "z1 z2 z3"),
      (3L, "u1 u2 u3"),
      (4L, "m")))
  }

  test("threshold ladder: verified-pair counts are non-increasing in the threshold") {
    // near-dup family (high jaccard) + a weaker pair + unrelated docs
    val base = "the quick brown fox jumps over the lazy dog near the barn " +
      "while rain falls softly on the quiet village roofs tonight"
    val d = Seq(
      (1L, base),
      (2L, base + " again"),
      (3L, base.replace("quick", "slow").replace("rain", "snow")),
      (4L, "completely different text about spark catalyst optimizer rules"),
      (5L, "another unrelated document mentioning parquet row groups only")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(d, shingleN = 3, perms = 16, bands = 4,
      threshold = 0.0, maxBucket = 100)
    val thresholds = Seq(0.0, 0.3, 0.5, 0.7, 0.9)
    val counts = thresholds.map { t =>
      pairs.where(col("jaccard") >= t).count()
    }
    assert(counts.head > 0, "expected at least one candidate pair")
    counts.sliding(2).foreach { case Seq(a, b) => assert(a >= b) }
  }

  test("containmentPairs: catches A-inside-B that Jaccard-banded LSH misses") {
    val small = "crimson harbor lanterns drift beyond the silent jetty stones tonight"
    val filler = (1 to 120).map(i => s"w$i").mkString(" ") // unique wrapper bulk
    val d = Seq(
      (1L, small),                      // the quoted article
      (2L, filler + " " + small),       // wrapper page containing it whole
      (3L, "totally unrelated text about catalyst broadcast joins and shuffles"),
      (4L, "yet another page concerning parquet footers and row group stats")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, shingleN = 3, perms = 16,
        maxDf = 10, threshold = 0.8)
      .select("doc_id_a", "doc_id_b", "containment", "jaccard")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    val (_, _, c, j) = got.head
    assert(c === 1.0, s"expected full containment, got $c") // every shingle of 1 is in 2
    assert(j < 0.5, s"expected low jaccard, got $j")        // which is why LSH misses it
    // the Jaccard pipeline is structurally blind to this pair at its
    // own threshold — the gap containmentPairs exists to close
    val lsh = Dedup.minhashLsh(d, shingleN = 3, perms = 16, bands = 4, threshold = 0.5)
    assert(lsh.where(col("doc_id_a") === 1L && col("doc_id_b") === 2L).count() === 0)
  }

  test("containmentPairs: all-common-shingle docs produce no candidates (df cap)") {
    // six identical docs: every shingle has df 6 > maxDf 5 → no postings
    val d = (1L to 6L).map(i => (i, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairs(d, maxDf = 5).count() === 0)
    // raise the cap above the family size and the pairs appear, fully contained
    val pairs = Dedup.containmentPairs(d, maxDf = 6)
    assert(pairs.count() === 15 && // C(6,2)
      pairs.agg(min(col("containment")), max(col("containment")))
        .as[(Double, Double)].head() === ((1.0, 1.0)))
  }

  test("fingerprintPairs maxHamming=0 degenerates to the exact-hash " +
    "self-join — legal at bits=64, where one band would be maskless") {
    // negative (sign-bit-set) 64-bit fingerprints exercise the full-word
    // path the banded branch's arithmetic-shift masking exists for
    val fp = Seq(
      (1L, 0x8000000000000001L), (2L, 0x8000000000000001L),
      (3L, 0x8000000000000000L), // hamming 1 from the pair above: excluded
      (4L, 5L), (5L, 5L), (6L, 6L)).toDF("doc_id", "fp")
    val got = Dedup.fingerprintPairs(fp, "doc_id", "fp", bits = 64, maxHamming = 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 0), (4L, 5L, 0)))
    // and the hot-bucket cap applies to the degenerate branch too
    assert(Dedup.fingerprintPairs(fp, "doc_id", "fp", bits = 64,
      maxHamming = 0, maxBucket = 1).count() === 0)
  }
}
