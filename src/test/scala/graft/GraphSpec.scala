package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(pairs: Seq[(Long, Long)], iters: Int = 8): Map[Long, Long] =
    Graph.pageRank(pairs.toDF("doc_id_a", "doc_id_b"), iters = iters)
      .as[(Long, Long)].collect().toMap

  /** Independent float power iteration with the same teleport/damping —
    * the continuous model the integer fixed point approximates. */
  private def floatPr(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nodes = edges.map(_._1).distinct.sorted
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => 0.85 * r(u) / deg(u) }.sum
      }
      r = nodes.map(v => v -> (0.15 / n + in.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRank star graph: hub dominates, satellites exactly equal, " +
    "and the fixed point tracks the float model") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val got = ranks(pairs)
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(Seq(2L, 3L, 4L, 5L).forall(s => got(1L) > got(s)),
      s"hub must out-rank every satellite: $got")
    // satellites are symmetric — EXACT integer equality, not tolerance
    assert(Seq(3L, 4L, 5L).forall(s => got(s) === got(2L)), got.toString)
    val want = floatPr(pairs, 8)
    got.foreach { case (v, q) =>
      assert(math.abs(q.toDouble / Graph.RankScale - want(v)) < 1e-9,
        s"node $v: fixed-point ${q.toDouble / Graph.RankScale} vs float ${want(v)}")
    }
  }

  test("pageRank ring: full symmetry means exactly equal ranks and near-full mass") {
    val got = ranks(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(got.values.toSet.size === 1, s"ring nodes must tie exactly: $got")
    val total = got.values.sum
    // truncating divs only ever LEAK mass, a bounded number of quanta
    assert(total <= Graph.RankScale, s"mass above SCALE: $total")
    assert(total >= Graph.RankScale - 1000L, s"leaked more than div-floor slack: $total")
  }

  test("pageRank: iters = 0 returns the uniform init; empty graph returns no rows") {
    val got0 = ranks(Seq((7L, 9L)), iters = 0)
    assert(got0 === Map(7L -> Graph.RankScale / 2, 9L -> Graph.RankScale / 2))
    val empty = Graph.pageRank(
      Seq.empty[(Long, Long)].toDF("doc_id_a", "doc_id_b"))
    assert(empty.count() === 0L)
  }

  private def pranks(pairs: Seq[(Long, Long)], seeds: Seq[Long],
      iters: Int = 8): Map[Long, Long] =
    Graph.personalizedPageRank(pairs.toDF("doc_id_a", "doc_id_b"),
        seeds.toDF("node"), iters = iters)
      .as[(Long, Long)].collect().toMap

  test("personalizedPageRank: mass stays in seed-reachable components, " +
    "decays with distance from the seed, and seeds-everywhere equals pageRank") {
    // two components; only {1,2,3} holds the seed → {8,9} gets ZERO mass
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L))
    val got = pranks(pairs, Seq(1L))
    assert(got(8L) === 0L && got(9L) === 0L, got.toString)
    // proximity ordering along the path from the seed
    assert(got(1L) > got(2L) && got(2L) > got(3L), got.toString)
    // seeding EVERY node degenerates to the global walk — exact equality
    val all = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(pranks(all, Seq(1L, 2L, 3L, 4L)) === ranks(all))
    // seeds outside the graph are ignored; none inside → empty result
    assert(pranks(pairs, Seq(1L, 77L)) === got)
    assert(Graph.personalizedPageRank(
      pairs.toDF("doc_id_a", "doc_id_b"), Seq(77L).toDF("node")).count() === 0L)
  }

  test("triangleCensus: hand-counted triangles, wedges, and coefficient; " +
    "triangle-free and empty graphs") {
    // triangle 1-2-3 plus pendant 3-4: T=1; degrees 2,2,3,1 →
    // wedges 1+1+3+0 = 5; cc = 3/5
    val got = Graph.triangleCensus(
        Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("doc_id_a", "doc_id_b"))
      .as[(Long, Long, Option[Double])].collect().head
    assert(got === ((1L, 5L, Some(0.6))))
    // 4-clique: T = 4, every degree 3 → wedges 4·3 = 12, cc = 1.0
    val clique = (for {a <- 1L to 4L; b <- (a + 1) to 4L} yield (a, b))
      .toDF("doc_id_a", "doc_id_b")
    assert(Graph.triangleCensus(clique)
      .as[(Long, Long, Option[Double])].collect().head === ((4L, 12L, Some(1.0))))
    // star: no triangles but wedges exist → cc = 0.0, not NULL
    val star = Graph.triangleCensus(
        Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_id_a", "doc_id_b"))
      .as[(Long, Long, Option[Double])].collect().head
    assert(star === ((0L, 3L, Some(0.0))))
    // single edge: no wedges → NULL coefficient (0/0 is undefined, not 0)
    val lone = Graph.triangleCensus(Seq((1L, 2L)).toDF("doc_id_a", "doc_id_b"))
      .as[(Long, Long, Option[Double])].collect().head
    assert(lone === ((0L, 0L, None)))
  }

  test("pageRank / personalizedPageRank: a self-loop pair is legal input " +
    "(mass conserved, no crash) even though the LSH emitters never " +
    "produce one") {
    // (5,5) alongside a normal edge: the symmetric-union gives node 5
    // two self-edge copies — degree 2 loops back to itself. Mass must
    // stay ≤ SCALE and every node keeps a row.
    val pairs = Seq((1L, 2L), (5L, 5L))
    val got = ranks(pairs)
    assert(got.keySet === Set(1L, 2L, 5L))
    assert(got.values.sum <= Graph.RankScale)
    assert(got.values.forall(_ >= 0L))
    // isolated self-loop component: node 5 receives only its own mass +
    // teleport; with seeds pinned elsewhere it must get EXACTLY zero
    val seeded = pranks(pairs, Seq(1L))
    assert(seeded(5L) === 0L, seeded.toString)
    // and seeding the self-loop node keeps all mass inside it
    val selfSeeded = pranks(pairs, Seq(5L))
    assert(selfSeeded(1L) === 0L && selfSeeded(2L) === 0L, selfSeeded.toString)
    assert(selfSeeded(5L) > 0L)
  }

  test("triangleCensus degree orientation: count matches a brute-force " +
    "census on a random graph, and a mid-id hub fans out nothing") {
    // random-ish deterministic graph: edges (a,b) with a<b from a fixed
    // congruential sequence — dense enough to hold many triangles
    val es = (for (i <- 0 until 220) yield {
      val a = (i * 37 + 11) % 25; val b = (i * 61 + 7) % 25
      if (a < b) Some((a.toLong, b.toLong)) else if (b < a) Some((b.toLong, a.toLong))
      else None
    }).flatten.distinct
    val adj = es.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val want = (for {
      i <- nodes; j <- nodes if j > i && adj((i, j))
      k <- nodes if k > j && adj((j, k)) && adj((i, k))
    } yield 1).size.toLong
    val got = Graph.triangleCensus(es.toDF("doc_id_a", "doc_id_b"))
      .as[(Long, Long, Option[Double])].collect().head
    assert(got._1 === want, s"degree-oriented count $got vs brute-force $want")
    // hub fixture: node 500 linked to 0..499 and 501..1000 — under id
    // orientation the hub keeps 500 outgoing edges (→ ~250k path rows);
    // degree orientation points every edge INTO the hub, so the path
    // join's intermediate is EMPTY. This is the per-node fan-out bound
    // that makes the census survive skewed graphs at 100 TB.
    val hub = ((0L until 500L).map(k => (k, 500L)) ++
      (501L to 1000L).map(k => (500L, k))).toDF("doc_id_a", "doc_id_b")
    val p = hub.select(col("doc_id_a").as("a"), col("doc_id_b").as("b"))
    val o = Graph.orientByDegree(p)
    val paths = o.as("e1").join(o.as("e2"), col("e1.dst") === col("e2.src"))
    assert(paths.count() === 0L,
      "degree orientation must eliminate the hub's wedge fan-out")
    // and the census itself still reports the star's truth
    val census = Graph.triangleCensus(hub)
      .as[(Long, Long, Option[Double])].collect().head
    assert(census._1 === 0L && census._2 === 1000L * 999L / 2)
  }

  test("pageRank path graph: interior node out-ranks endpoints (degree pull)") {
    // 1 - 2 - 3: node 2 has degree 2, the ends degree 1
    val got = ranks(Seq((1L, 2L), (2L, 3L)))
    assert(got(2L) > got(1L) && got(2L) > got(3L), got.toString)
    assert(got(1L) === got(3L), s"symmetric endpoints must tie exactly: $got")
    val want = floatPr(Seq((1L, 2L), (2L, 3L)), 8)
    got.foreach { case (v, q) =>
      assert(math.abs(q.toDouble / Graph.RankScale - want(v)) < 1e-9, s"node $v")
    }
  }
}
