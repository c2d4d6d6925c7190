package graft

import graft.operators.IvfIndex
import graft.types.Metric
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property tests for the index-maintenance pair: for ANY store geometry
  * and ANY fill floor, [[IvfIndex.mergeSmall]] must agree with the
  * driver-side restatement of its contract (membership preserved,
  * survivor centroids unchanged, donors to their true nearest survivor,
  * the all-donor and no-donor guards), and [[IvfIndex.maintenancePlan]]
  * must state exactly the action set the executor takes. Deterministic
  * seeded generators, the CrudPropSpec discipline. */
class IvfMaintPropSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  // arbitrary store: k centroids, n records (possibly 0 — the fully
  // drained store), an arbitrary floor that may be unreachable (all
  // clusters donors) or trivial (no donors)
  private val storeGen: Gen[(Int, Int, Long, Long)] = for {
    k <- Gen.chooseNum(1, 6)
    n <- Gen.chooseNum(0, 40)
    floor <- Gen.chooseNum(1L, 12L)
    vseed <- Gen.chooseNum(1L, 1000000L)
  } yield (k, n, floor, vseed)

  test("mergeSmall == driver restatement, for arbitrary stores and floors") {
    (1L to 12L).foreach { seed =>
      val (k, n, floor, vseed) = sample(storeGen, seed)
      val rnd = new scala.util.Random(vseed)
      val cents = (0 until k).map(i => (i, Seq.fill(dim)(rnd.nextFloat())))
      val rows = (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat()),
        Map("i" -> i.toString)))
      val cdf = cents.toDF("cluster_id", "centroid")
      val rdf = rows.toDF("id", "embedding", "metadata")
      val model = IvfIndex.Model(cdf, IvfIndex.assign(rdf, cdf, Metric.Euclidean))

      // driver-side truth
      def d2(a: Seq[Float], b: Seq[Float]): Double =
        a.zip(b).map { case (x, y) => val d = x.toDouble - y.toDouble; d * d }.sum
      def argmin(v: Seq[Float], cs: Seq[(Int, Seq[Float])]): Int =
        cs.minBy { case (ci, c) => (d2(c, v), ci) }._1
      val assignedTruth = rows.map { case (id, v, _) => id -> argmin(v, cents) }.toMap
      val sizes = assignedTruth.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bigEnough = cents.map(_._1).filter(c => sizes.getOrElse(c, 0L) >= floor)
      val survTruth: Set[Int] =
        if (bigEnough.nonEmpty) bigEnough.toSet
        else if (sizes.isEmpty) Set.empty // empty store: everything dissolves
        else Set(sizes.toSeq.minBy { case (c, s) => (-s, c) }._1)
      val wantAssign = rows.map { case (id, v, _) =>
        val c0 = assignedTruth(id)
        id -> (if (survTruth(c0)) c0
               else argmin(v, cents.filter(c => survTruth(c._1))))
      }.toMap

      val merged = IvfIndex.mergeSmall(model, floor, Metric.Euclidean)
      val gotCents = merged.centroids.select("cluster_id", "centroid")
        .as[(Int, Seq[Float])].collect().toMap
      val gotAssign = merged.assigned.select("id", "cluster_id")
        .as[(Long, Int)].collect().toMap

      assert(gotCents.keySet === survTruth, s"seed=$seed k=$k n=$n floor=$floor")
      gotCents.foreach { case (c, v) =>
        assert(v === cents(c)._2, s"seed=$seed centroid $c changed") }
      assert(gotAssign === wantAssign, s"seed=$seed k=$k n=$n floor=$floor")

      // no donors -> reference-equal input
      if (survTruth == cents.map(_._1).toSet)
        assert(IvfIndex.mergeSmall(model, floor, Metric.Euclidean) eq model)

      // the planner's merge set is exactly the dissolved set, and its
      // fills are the true census (density chosen so nothing splits)
      val plan = IvfIndex.maintenancePlan(model, density = 1000, minSize = floor)
        .select("cluster_id", "n", "action").as[(Int, Long, String)].collect()
      assert(plan.map(_._1).toSet === cents.map(_._1).toSet)
      plan.foreach { case (c, pn, action) =>
        assert(pn === sizes.getOrElse(c, 0L), s"seed=$seed plan fill $c")
        // the plan encodes the executor EXACTLY, including the
        // all-donor guard: merge iff mergeSmall dissolves this cluster
        assert((action == "merge") === !survTruth(c),
          s"seed=$seed plan action $c (fill $pn, floor $floor)")
      }
    }
  }
}
