package graft

import graft.functions.FilterDsl
import graft.operators.Knn
import graft.types.Metric
import org.apache.spark.sql.functions._

/** The reference's seeded deterministic query golden
  * (`/root/reference/src/cores/index.rs:368-410`): 1000 sequential vectors
  * `[i,…]` with metadata `number = 1000 + i`, queried with `[1.0,…]`. */
class KnnSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private lazy val records = (0 until 1000).map { i =>
    (i.toLong, Seq.fill(dim)(i.toFloat), Map("number" -> (1000 + i).toString))
  }.toDF("id", "embedding", "metadata").cache()

  private lazy val query = Seq(Tuple1(Seq.fill(dim)(1.0f))).toDF("qvec")

  test("k=10 returns the 10 nearest, ascending, nearest is i=1 (dist 0)") {
    val got = Knn.search(records, query, 10, Metric.Euclidean)
      .select("id", "distance").as[(Long, Double)].collect()
    assert(got.length === 10)
    assert(got.head === ((1L, 0.0)))
    // ascending by distance, id tiebreak: 1, 0, 2, 3, ..., 9
    assert(got.map(_._1).toSeq === Seq(1L, 0L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq)
  }

  test("filtered kNN: number > 1050 admits i=51 as nearest (index.rs:404-409)") {
    val f = FilterDsl.predicate(col("metadata"), "number > 1050")
    val got = Knn.search(records, query, 10, Metric.Euclidean, filter = f)
      .select("id").as[Long].collect()
    assert(got.head === 51L)
    assert(got.toSeq === (51L to 60L))
  }

  test("radius excludes strictly-greater distances (index.rs:197)") {
    // dist(i) = 8*(i-1)^2; radius 8 keeps exactly i=0,1,2
    val got = Knn.search(records, query, 100, Metric.Euclidean, radius = 8.0)
      .select("id").as[Long].collect()
    assert(got.toSet === Set(0L, 1L, 2L))
  }

  test("k must be positive (database.rs:321-325)") {
    assertThrows[IllegalArgumentException](
      Knn.search(records, query, 0, Metric.Euclidean))
  }

  test("result shape is (id, metadata, distance) — vector excluded (index.rs:8-12)") {
    val cols = Knn.search(records, query, 1, Metric.Euclidean).columns.toSeq
    assert(cols === Seq("id", "metadata", "distance"))
  }

  test("batch search returns k rows per query, partitioned correctly") {
    val queries = Seq(
      (100L, Seq.fill(dim)(100.0f)),
      (900L, Seq.fill(dim)(900.0f))).toDF("query_id", "qvec")
    val got = Knn.searchBatch(records, queries, 3, Metric.Euclidean)
      .select("query_id", "id").as[(Long, Long)].collect().groupBy(_._1)
    assert(got(100L).map(_._2).toSet === Set(99L, 100L, 101L))
    assert(got(900L).map(_._2).toSet === Set(899L, 900L, 901L))
  }

  test("sign-LSH: buckets partition the table; full-Hamming probe equals exact kNN") {
    import graft.operators.SignLsh
    // random vectors — the constant-vector fixture degenerates sign-LSH
    val rnd = new scala.util.Random(5)
    val rrecs = (0 until 500).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1), Map.empty[String, String]))
      .toDF("id", "embedding", "metadata").cache()
    val planes = SignLsh.planesFrom(rrecs, nbits = 4)
    val bucketed = SignLsh.bucketize(rrecs, planes)
    assert(bucketed.count() === 500) // total preserved
    assert(bucketed.select("bucket").distinct().count() <= 16)
    val q = rrecs.where(col("id") === 3).select(col("embedding").as("qvec"))
    // hamming = nbits probes every bucket ⇒ must equal brute force
    val all = SignLsh.query(rrecs, planes, q, 10, hamming = 4, Metric.Cosine)
      .select("id").as[Long].collect().toSeq
    val exact = Knn.search(rrecs, q, 10, Metric.Cosine)
      .select("id").as[Long].collect().toSeq
    assert(all === exact)
    // single-probe always finds the query's own record (same bucket)
    val own = SignLsh.query(rrecs, planes, q, 5, hamming = 0, Metric.Cosine)
      .select("id").as[Long].collect()
    assert(own.contains(3L))
    // batch twin at full Hamming equals brute-force searchBatch
    val qs = rrecs.where(col("id") < 3)
      .select(col("id").as("query_id"), col("embedding").as("qvec"))
    val gotB = SignLsh.queryBatch(rrecs, planes, qs, 5, hamming = 4, Metric.Cosine)
      .select("query_id", "id", "distance").as[(Long, Long, Double)].collect().toSet
    val wantB = Knn.searchBatch(rrecs, qs, 5, Metric.Cosine)
      .select("query_id", "id", "distance").as[(Long, Long, Double)].collect().toSet
    assert(gotB === wantB)
  }

  test("selfJoinNN: nearest-other per id, distance-then-id tiebreak, " +
    "singleton blocks yield no row, shared-both-blocks pairs collapse") {
    // Block 0: ids 1,2,3 on a line (1 at 0.0, 2 at 1.0, 3 at 3.0).
    // Id 2 also appears in block 1 (runner-up cluster) with id 4 at 1.0
    //   distance 0 — its true NN lives only in the runner-up block.
    // Ids 5,6 share BOTH blocks 2 and 3 (candidate pair emitted twice).
    // Id 7 is alone in block 4 → no output row.
    // Ids 8,9 in block 5 are equidistant twins of id 10 (both at dist 1)
    //   → id 10's NN must tie-break to the smaller id 8.
    val rows = Seq(
      (0, 1L, Seq(0f, 0f)), (0, 2L, Seq(1f, 0f)), (0, 3L, Seq(3f, 0f)),
      (1, 2L, Seq(1f, 0f)), (1, 4L, Seq(1f, 0f)),
      (2, 5L, Seq(9f, 0f)), (2, 6L, Seq(9f, 1f)),
      (3, 5L, Seq(9f, 0f)), (3, 6L, Seq(9f, 1f)),
      (4, 7L, Seq(5f, 5f)),
      (5, 8L, Seq(0f, 20f)), (5, 9L, Seq(2f, 20f)), (5, 10L, Seq(1f, 20f)))
      .toDF("block", "id", "embedding")
    val got = Knn.selfJoinNN(rows, Metric.Euclidean)
      .select("id", "nn_id", "distance").as[(Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 2L, 1.0), (2L, 4L, 0.0), (3L, 2L, 4.0), (4L, 2L, 0.0),
      (5L, 6L, 1.0), (6L, 5L, 1.0), (8L, 10L, 1.0), (9L, 10L, 1.0),
      (10L, 8L, 1.0)))
  }

  test("selfJoinNN plans no Window and a partial-aggregated min") {
    val rows = Seq((0, 1L, Seq(0f)), (0, 2L, Seq(1f)))
      .toDF("block", "id", "embedding")
    val p = Knn.selfJoinNN(rows, Metric.Euclidean)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      "per-id NN must reduce via min(struct), not a ranking window")
    assert(p.contains("partial_min") || p.contains("partial min") ||
      p.toLowerCase.contains("partialmerge") || p.contains("min("),
      s"expected an aggregate-based reduction in:\n$p")
  }

  test("rrfFuse: exact reciprocal-rank sums, both-arm docs rewarded, top-k cut") {
    val lex = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rank")
    val sem = Seq((12L, 1L), (13L, 2L)).toDF("id", "rank")
    val got = Knn.rrfFuse(Seq(lex, sem), k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    def s(r: Long) = 1.0 / (60 + r)
    // doc 12 appears in both arms: its score is the exact two-term sum
    val want = Seq(
      (12L, 2L, s(3) + s(1)),
      (10L, 1L, s(1)),
      (11L, 1L, s(2)),
      (13L, 1L, s(2)))
    // 11 and 13 tie exactly (same rank, single arm) — smaller id first
    assert(got.map(_._1) === Seq(12L, 10L, 11L, 13L))
    got.zip(want).foreach { case ((gi, gn, gs), (wi, wn, ws)) =>
      assert(gi === wi); assert(gn === wn); assert(gs === ws)
    }
    // top-k cut keeps the highest-scoring k
    val cut = Knn.rrfFuse(Seq(lex, sem), k = 2).as[(Long, Long, Double)]
      .collect().map(_._1).toSeq
    assert(cut === Seq(12L, 10L))
    // a single arm degenerates to the arm's own order
    val solo = Knn.rrfFuse(Seq(lex), k = 10).as[(Long, Long, Double)]
      .collect().map(_._1).toSeq
    assert(solo === Seq(10L, 11L, 12L))
  }

  test("searchPrefixRerank: full-prefix degenerates to exact search; " +
    "shortlist=n is exact at any prefix; plan is two bounded heaps, no join") {
    val dim = 8
    val rnd = new scala.util.Random(11)
    val recs = (0L until 200L).map { i =>
      (i, Array.fill(dim)(rnd.nextFloat()).toSeq, Map("i" -> i.toString))
    }.toDF("id", "embedding", "metadata")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = recs.where(col("id") === 0).select(col("embedding").as("qvec"))
    val exact = Knn.search(recs, q, 10).as[(Long, Map[String, String], Double)]
      .collect().toSeq.map(r => (r._1, r._3))
    // prefixDim = dim → the shortlist stage ranks on the true distance
    val full = Knn.searchPrefixRerank(recs, q, 10, prefixDim = dim, shortlist = 20)
      .as[(Long, Map[String, String], Double)].collect().toSeq.map(r => (r._1, r._3))
    assert(full === exact)
    // shortlist = n → nothing is pruned, any prefix gives the exact answer
    val allIn = Knn.searchPrefixRerank(recs, q, 10, prefixDim = 2, shortlist = 200)
      .as[(Long, Map[String, String], Double)].collect().toSeq.map(r => (r._1, r._3))
    assert(allIn === exact)
    val plan = Knn.searchPrefixRerank(recs, q, 10, prefixDim = 2, shortlist = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no bounded heap in:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"rerank must not join back to the store:\n$plan")
  }

  test("mmrRerank: lam=1 degenerates to plain top-k; diversity term " +
    "evicts a redundant near-duplicate; greedy objective hand-checked") {
    // 0 = query's nearest; 1 = near-duplicate of 0; 2, 3 = progressively
    // farther but mutually diverse points
    val recs = Seq(
      (0L, Seq(0.0f, 0.0f), Map.empty[String, String]),
      (1L, Seq(0.1f, 0.0f), Map.empty[String, String]),
      (2L, Seq(0.0f, 2.0f), Map.empty[String, String]),
      (3L, Seq(2.0f, 0.0f), Map.empty[String, String]))
      .toDF("id", "embedding", "metadata")
    val q = Seq(Tuple1(Seq(0.0f, 0.0f))).toDF("qvec")
    // lam=1: the diversity term is muted -> exact distance order
    val plain = Knn.mmrRerank(recs, q, k = 4, shortlist = 4,
      lam = 1.0, oneMinusLam = 0.0).as[(Int, Long, Double)].collect().toSeq
    assert(plain.map(_._2) === Seq(0L, 1L, 2L, 3L))
    // lam=0.5: after picking 0, candidate 1 (dq=0.01, 0.01 from 0) scores
    // 0.5*0.01-0.5*0.01 = 0; candidates 2/3 (dq=4, dist 4 from 0) score
    // 0.5*4-0.5*4 = 0 — exact tie -> smallest id (1) still wins rank 2;
    // at rank 3, candidate 2 (min dist to {0,1} = 4) scores 0 while 3
    // scores 2-0.5*min(4, 3.61..)=0.195 -> 2 wins; 3 last.
    val div = Knn.mmrRerank(recs, q, k = 4, shortlist = 4,
      lam = 0.5, oneMinusLam = 0.5).as[(Int, Long, Double)].collect().toSeq
    assert(div.map(_._2) === Seq(0L, 1L, 2L, 3L))
    assert(div.map(_._1) === Seq(1, 2, 3, 4))
    // the eviction case: B is a near-duplicate of the top pick A, C is
    // farther from the query but diverse. Plain ranking keeps B second;
    // MMR promotes C: score(B) = 0.5*1.01 - 0.5*0.01 = 0.5 while
    // score(C) = 0.5*2.25 - 0.5*3.25 = -0.5
    val dup = Seq(
      (10L, Seq(1.0f, 0.0f), Map.empty[String, String]),  // A
      (11L, Seq(1.0f, 0.1f), Map.empty[String, String]),  // B ~ A
      (12L, Seq(0.0f, 1.5f), Map.empty[String, String]))  // C diverse
      .toDF("id", "embedding", "metadata")
    val plainDup = Knn.mmrRerank(dup, q, k = 3, shortlist = 3,
      lam = 1.0, oneMinusLam = 0.0).as[(Int, Long, Double)].collect().toSeq
    assert(plainDup.map(_._2) === Seq(10L, 11L, 12L))
    val mmrDup = Knn.mmrRerank(dup, q, k = 3, shortlist = 3,
      lam = 0.5, oneMinusLam = 0.5).as[(Int, Long, Double)].collect().toSeq
    assert(mmrDup.map(_._2) === Seq(10L, 12L, 11L),
      s"diversity must evict the near-duplicate: $mmrDup")
  }

  test("searchHammingRerankSweep law: row-identical to searchHammingRerank " +
    "at every shortlist budget (prefix property of the total order)") {
    import graft.operators.VectorOps
    val store = records.withColumn("bcode", VectorOps.binaryCodes(col("embedding")))
    val q = query.withColumn("qcode", VectorOps.binaryCodes(col("qvec")))
    val budgets = Seq(10, 25, 100)
    val sweep = Knn.searchHammingRerankSweep(store, q, k = 10, budgets)
      .select("shortlist", "id", "distance").as[(Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    budgets.foreach { sl =>
      val direct = Knn.searchHammingRerank(store, q, k = 10, shortlist = sl)
        .select("id", "distance").as[(Long, Double)].collect().toSet
      assert(sweep(sl) === direct, s"shortlist=$sl")
    }
  }
}
