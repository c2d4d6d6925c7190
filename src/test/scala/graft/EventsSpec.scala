package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel on an arbitrary 4-stage list matches the brute-force chain") {
    val rnd = new scala.util.Random(31)
    val stages = Seq("a", "b", "c", "d")
    val rows = (0 until 2000).map { i =>
      (i.toLong, rnd.nextInt(40).toLong, stages(rnd.nextInt(4)),
        new java.sql.Timestamp(1704100000000L + rnd.nextInt(100000) * 1000L))
    }
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.funnel(ev, stages)
      .select(col("user_id"), col("a_ts"), col("b_ts"), col("c_ts"),
        col("d_ts"), col("stage"))
      .as[(Long, Option[java.sql.Timestamp], Option[java.sql.Timestamp],
        Option[java.sql.Timestamp], Option[java.sql.Timestamp], Int)]
      .collect().map(r => r._1 -> r).toMap
    // brute force: stage k's ts = earliest stage-k event at-or-after k−1
    val byUser = rows.groupBy(_._2)
    val want = byUser.flatMap { case (u, evs) =>
      def stageTs(typ: String, after: Option[java.sql.Timestamp]): Option[java.sql.Timestamp] =
        after.flatMap { a =>
          val c = evs.filter(e => e._3 == typ && !e._4.before(a)).map(_._4)
          if (c.isEmpty) None else Some(c.min)
        }
      val t0 = { // users with no stage-a events don't appear at all
        val c = evs.filter(_._3 == "a").map(_._4)
        if (c.isEmpty) None else Some(c.min)
      }
      t0.map { a =>
        val b = stageTs("b", Some(a))
        val c = stageTs("c", b)
        val d = stageTs("d", c)
        u -> ((u, Some(a), b, c, d, 1 + Seq(b, c, d).count(_.isDefined)))
      }
    }
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("funnel: a stage event BEFORE the prior stage's time does not count") {
    val ev = Seq(
      (1L, 1L, "signup", ts("2024-01-01 10:00:00")),
      (2L, 1L, "activate", ts("2024-01-01 09:00:00")), // too early: ignored
      (3L, 2L, "signup", ts("2024-01-01 10:00:00")),
      (4L, 2L, "activate", ts("2024-01-01 10:00:00"))  // equal ts: counts
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.funnel(ev, Seq("signup", "activate"))
      .select("user_id", "stage").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 1, 2L -> 2))
  }

  test("funnel rejects an empty or duplicate stage list") {
    val ev = Seq((1L, 1L, "a", ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    intercept[IllegalArgumentException](Events.funnel(ev, Seq.empty))
    intercept[IllegalArgumentException](Events.funnel(ev, Seq("a", "b", "a")))
  }

  test("anomalousWindows flags exactly the windows above mean + kσ") {
    // type "a": 9 quiet hours of 10 events + one 100-event spike;
    // type "b": perfectly flat — variance 0, must flag nothing
    val rows =
      (0 until 9).flatMap(h => (0 until 10).map(i =>
        (s"a", ts(f"2024-01-01 0$h:00:${i % 60}%02.0f")))) ++
      (0 until 100).map(i => ("a", ts(f"2024-01-01 09:${i % 60}%02d:00"))) ++
      (0 until 5).flatMap(h => (0 until 7).map(i =>
        (s"b", ts(f"2024-01-01 0$h:10:${i % 60}%02.0f"))))
    val ev = rows.zipWithIndex
      .map { case ((t, w), i) => (i.toLong, t, w) }
      .toDF("event_id", "event_type", "ts")
    val got = Events.anomalousWindows(ev, col("ts"), col("event_type"))
      .select("event_type", "n", "z").as[(String, Long, Double)].collect().toSeq
    // only the spike hour: counts (10×9, 100); mean 19, var exact
    assert(got.map(_._1) === Seq("a"))
    assert(got.head._2 === 100L)
    val counts = Seq.fill(9)(10.0) :+ 100.0
    val mean = counts.sum / counts.length
    val v = (counts.map(c => c * c).sum - counts.sum * counts.sum / counts.length) / counts.length
    assert(math.abs(got.head._3 - (100 - mean) / math.sqrt(v)) < 1e-9)
    // lowering sigmas to 0 flags everything above the mean
    val loose = Events.anomalousWindows(ev, col("ts"), col("event_type"),
        sigmas = 0.0)
      .select("event_type").as[String].collect()
    assert(loose.count(_ == "a") === 1) // only the spike exceeds mean 19
    assert(!loose.contains("b"))        // flat series: variance 0, silent
  }

  test("abTest: hand-computed counts, rates, lift, and z; " +
    "null users excluded; repeat conversions count once") {
    // arm 0 (even ids): users 0,2,4,6 — 0 and 2 convert (2/4)
    // arm 1 (odd ids):  users 1,3    — 1 converts (1/2); user 1 purchases
    // TWICE (must count once); a null-user purchase must be ignored
    val ev = Seq(
      (Some(0L), "purchase"), (Some(0L), "view"), (Some(2L), "purchase"),
      (Some(4L), "view"), (Some(6L), "click"),
      (Some(1L), "purchase"), (Some(1L), "purchase"), (Some(3L), "view"),
      (None: Option[Long], "purchase"))
      .toDF("user_id", "event_type")
    val got = Events.abTest(ev, col("user_id") % 2,
        col("event_type") === "purchase")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)].head()
    val (na, ca, nb, cb, ra, rb, lift, z) = got
    assert((na, ca, nb, cb) === ((4L, 2L, 2L, 1L)))
    assert(ra === 0.5 && rb === 0.5 && lift === 0.0)
    assert(z === 0.0) // equal rates -> zero statistic, exactly
    // a real lift: arm 1 converts fully
    val ev2 = Seq(
      (1L, "purchase"), (3L, "purchase"), (0L, "view"), (2L, "view"),
      (4L, "purchase"), (6L, "view"))
      .toDF("user_id", "event_type")
    val g2 = Events.abTest(ev2, col("user_id") % 2,
        col("event_type") === "purchase")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)].head()
    // arms: a = {0,2,4,6} conv {4} -> 0.25; b = {1,3} conv both -> 1.0
    assert((g2._1, g2._2, g2._3, g2._4) === ((4L, 1L, 2L, 2L)))
    assert(g2._7 === 0.75)
    val pp = 3.0 / 6.0
    val want = 0.75 / math.sqrt(pp * (1.0 - pp) * (1.0 / 4 + 1.0 / 2))
    assert(math.abs(g2._8 - want) < 1e-12, s"z = ${g2._8}, want $want")
  }

  test("stationaryDistribution: valid distribution; hand-checked chains " +
    "(2-cycle stays uniform, absorbing state swallows the mass)") {
    def ev(rows: Seq[(Long, Long, String, Long)]) =
      rows.map { case (id, u, t, ms) => (id, u, t, new java.sql.Timestamp(ms)) }
        .toDF("event_id", "user_id", "event_type", "ts")

    // one user alternating a,b,a,b,... → P is the 2-cycle permutation;
    // from the uniform start every iterate is exactly (0.5, 0.5)
    val cyc = ev((0 until 10).map(i =>
      (i.toLong, 1L, if (i % 2 == 0) "a" else "b", 1704100000000L + i * 1000L)))
    val gc = Events.stationaryDistribution(cyc, iters = 7)
      .as[(String, Double)].collect().toMap
    assert(gc === Map("a" -> 0.5, "b" -> 0.5), s"2-cycle: $gc")

    // a→b once, then b→b forever: b is absorbing, mass drains to it
    val abs = ev(Seq((0L, 1L, "a", 0L), (1L, 1L, "b", 1000L)) ++
      (2 until 12).map(i => (i.toLong, 1L, "b", i * 1000L)))
    val ga = Events.stationaryDistribution(abs, iters = 30)
      .as[(String, Double)].collect().toMap
    assert(ga("b") > 0.999 && ga("a") < 0.001, s"absorbing: $ga")

    // real log: probabilities non-negative and sum to 1 (permutation-
    // free invariant of every row-stochastic iterate)
    val real = graft.streaming.EventStream.loadEvents(spark, "/root/testdata/sf0.001")
    val gr = Events.stationaryDistribution(real, iters = 12)
      .as[(String, Double)].collect()
    assert(gr.forall(_._2 >= 0.0), s"negative prob: ${gr.mkString(",")}")
    assert(math.abs(gr.map(_._2).sum - 1.0) < 1e-9,
      s"not a distribution: ${gr.map(_._2).sum}")
    // iterating further must not move the result materially (convergence)
    val gr2 = Events.stationaryDistribution(real, iters = 40)
      .as[(String, Double)].collect().toMap
    gr.foreach { case (t, p) =>
      assert(math.abs(p - gr2(t)) < 1e-6, s"$t not converged: $p vs ${gr2(t)}")
    }
  }

  test("holtForecast: exact on a linear series (10 + 3t events/day), " +
    "rejects < 2 days") {
    // day t gets 10 + 3t events; Holt with any (alpha, beta) is exact on
    // a noiseless linear trend, and the dyadic coefficients keep every
    // intermediate double exact, so equality is ==, not approx
    val dayMs = 86400000L
    val rows = (0 until 10).flatMap { t =>
      (0 until 10 + 3 * t).map { j =>
        ((t * 1000 + j).toLong, 1L, "view",
          new java.sql.Timestamp(1704067200000L + t * dayMs + j * 1000L))
      }
    }
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.holtForecast(ev, horizon = 5)
      .as[(Int, Double)].collect().toMap
    (1 to 5).foreach { h =>
      val want = (10 + 3 * 9).toDouble + 3.0 * h
      assert(got(h) === want, s"h=$h: ${got(h)} != $want")
    }
    val one = rows.filter(_._4.getTime < 1704067200000L + dayMs)
      .toDF("event_id", "user_id", "event_type", "ts")
    val e = intercept[IllegalArgumentException] {
      Events.holtForecast(one, horizon = 3)
    }
    assert(e.getMessage.contains(">= 2 days"))
  }

  test("holtForecast: a zero-event calendar day enters the series as y = 0 " +
    "instead of vanishing") {
    val dayMs = 86400000L
    // events on days 0 and 2 only; day 1 is an outage
    val rows = Seq(0, 2).flatMap { t =>
      (0 until 10).map { j =>
        ((t * 100 + j).toLong, 1L, "view",
          new java.sql.Timestamp(1704067200000L + t * dayMs + j * 1000L))
      }
    }
    val got = Events.holtForecast(rows.toDF("event_id", "user_id", "event_type", "ts"),
      horizon = 2).as[(Int, Double)].collect().toMap
    // replicate the recursion over the FILLED series [10, 0, 10]
    val ys = Seq(10.0, 0.0, 10.0)
    var l = ys(0); var b = ys(1) - ys(0)
    for (t <- 1 until ys.length) {
      val lp = l
      l = 0.5 * ys(t) + 0.5 * (lp + b)
      b = 0.25 * (l - lp) + 0.75 * b
    }
    (1 to 2).foreach(h => assert(got(h) === l + h.toDouble * b, s"h=$h"))
    // a gap-blind series [10, 10] would forecast a flat 10 — guard that
    assert(got(1) !== 10.0, "outage day was dropped from the series")
  }

  test("session boundary: events exactly gap apart merge; only > gap splits " +
      "(session_window == the lag-based twin on boundary-heavy fixtures)") {
    // user 1: gaps 1799 / 1800 / 1801 — sessions {e1,e2,e3} then {e4};
    // user 2: a lone event; user 3: two events one second apart
    val base = 1717405200L // 2024-06-03 09:00:00 UTC, seconds
    val rows = Seq(
      (1L, 0L), (1L, 1799L), (1L, 1799L + 1800L), (1L, 1799L + 1800L + 1801L),
      (2L, 50L), (3L, 0L), (3L, 1L))
    val df = rows.map { case (u, off) =>
      (u, new java.sql.Timestamp((base + off) * 1000L), 1.0)
    }.toDF("user_id", "ts", "value")
    val sw = graft.streaming.EventStream.sessionAgg(df)
      .select(col("user_id"), col("n_events")).as[(Long, Long)].collect().sorted
    assert(sw.toSeq === Seq((1L, 1L), (1L, 3L), (2L, 1L), (3L, 2L)),
      "exactly-gap must merge, gap+1 must split")
    // the lag-based formulation (the affinity/paths shape, strict >)
    // must produce identical session partitioning
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    val cum = w.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, org.apache.spark.sql.expressions.Window.currentRow)
    val lagBased = df
      .withColumn("__new", when(lag(col("ts"), 1).over(w).isNull ||
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
          > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(cum))
      .groupBy(col("user_id"), col("__sid")).agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events")).as[(Long, Long)].collect().sorted
    assert(lagBased.toSeq === sw.toSeq,
      "the two sessionization formulations must agree at the boundary")
  }

  // --- Count-Min sketch laws ---------------------------------------------

  private def cmCounts(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("key", "n")
  }

  test("cmSketch: estimates never undercount, one row per input key") {
    val rnd = new scala.util.Random(11)
    val counts = cmCounts((0 until 300).map(i =>
      (rnd.nextInt(5000).toLong - 1000L, 1L + rnd.nextInt(50))).toMap.toSeq)
    val est = graft.operators.Events.cmEstimates(counts, w = 32)
      .select("key", "n_true", "n_est")
      .as[(Long, Long, Long)].collect()
    assert(est.length === counts.count())
    assert(est.forall { case (_, t, e) => e >= t },
      "Count-Min never underestimates")
  }

  test("cmSketch: each hash row's cells sum to the total count") {
    val counts = cmCounts(Seq((1L, 5L), (2L, 7L), (-9L, 3L), (64L, 1L)))
    val rows = graft.operators.Events.cmSketch(counts, w = 8)
      .groupBy(col("row")).agg(sum(col("cell_n")).as("s"))
      .select("s").as[Long].collect()
    assert(rows.length === graft.operators.Events.CmHashes.length)
    assert(rows.forall(_ === 16L), "every row conserves the total mass")
  }

  test("cmSketch merges: sketch(a ++ b) == cellwise sum of the shard sketches") {
    val a = cmCounts(Seq((1L, 2L), (2L, 3L), (100L, 4L)))
    val b = cmCounts(Seq((1L, 10L), (7L, 1L)))
    val whole = graft.operators.Events.cmSketch(
      a.unionByName(b).groupBy("key").agg(sum(col("n")).as("n")), w = 16)
    val merged = graft.operators.Events.cmSketch(a, 16)
      .unionByName(graft.operators.Events.cmSketch(b, 16))
      .groupBy(col("row"), col("cell")).agg(sum(col("cell_n")).as("cell_n"))
    val k = (df: org.apache.spark.sql.DataFrame) =>
      df.select("row", "cell", "cell_n").as[(Int, Long, Long)].collect().sorted.toSeq
    assert(k(whole) === k(merged), "cell-wise addition IS the merge")
  }

  // --- linear-counting distinct sketch laws --------------------------------

  test("lcCells: OR-monoid merge, estimate tracks exact, saturation yields NULL") {
    import graft.operators.Events
    def keyed(rows: Seq[(String, Long)]) = rows.toDF("grp", "key")
    val rnd = new scala.util.Random(17)
    val a = keyed((0 until 700).map(_ => ("t", rnd.nextInt(2000).toLong)))
    val b = keyed((0 until 500).map(_ => ("t", rnd.nextInt(2000).toLong)))
    // merge law: union-then-sketch == sketch-then-union-then-distinct
    val whole = Events.lcCells(a.unionByName(b), k = 512)
    val merged = Events.lcCells(a, 512).unionByName(Events.lcCells(b, 512)).distinct()
    val cells = (df: org.apache.spark.sql.DataFrame) =>
      df.as[(String, Long)].collect().sorted.toSeq
    assert(cells(whole) === cells(merged), "occupied-cell union IS the merge")
    // accuracy: estimate within 15% of the true distinct count at this load
    val est = Events.lcEstimates(whole, 512).select("est").as[Double].head()
    val truth = a.unionByName(b).distinct().count().toDouble
    assert(math.abs(est - truth) / truth <= 0.15, s"est $est vs truth $truth")
    // saturation: more distinct keys than cells → every cell occupied → NULL
    val sat = Events.lcEstimates(
      Events.lcCells(keyed((0L until 4000L).map(i => ("s", i))), k = 8), k = 8)
    assert(sat.select("est").head().isNullAt(0), "saturated sketch must yield NULL")
  }

  // --- decimal-digit quantile histogram laws -------------------------------

  test("ddHistogram merges by count addition; quantile reads stay within the bucket bound") {
    def valsDf(seed: Int, n: Int) = {
      val r = new scala.util.Random(seed)
      (0 until n).map(_ => math.exp(r.nextGaussian() * 2 + 3)).toDF("value")
    }
    val a = valsDf(1, 800); val b = valsDf(2, 500)
    val whole = graft.operators.Events.ddHistogram(a.unionByName(b))
    val merged = graft.operators.Events.ddHistogram(a)
      .unionByName(graft.operators.Events.ddHistogram(b))
      .groupBy(col("digits"), col("first2")).agg(sum(col("cnt")).as("cnt"))
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("digits", "first2", "cnt").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(key(whole) === key(merged), "histograms merge by count addition")

    // quantile read: the estimate's bucket CONTAINS the true rank element,
    // so |est - exact| is at most half the bucket width (≤ 5% of lo) plus
    // the interpolation inside the exact leg — assert a 6% relative bound
    val est = graft.operators.Events.ddQuantiles(whole, Seq(50, 90, 99))
      .select("p", "est").as[(Int, Double)].collect().toMap
    val q2s = graft.operators.Events.ddQuantized(a.unionByName(b))
      .as[Long].collect().sorted
    for ((p, e) <- est) {
      val r = (q2s.length * p + 99) / 100
      val truth = q2s(r - 1).toDouble / 100.0
      assert(math.abs(e - truth) / truth <= 0.06,
        s"p$p: est $e vs rank-$r truth $truth")
    }
  }

  test("ddHistogram domain: nulls, zeros, negatives, sub-quantum and overflow values drop out") {
    // 1e18 would overflow the BIGINT quantization under ANSI arithmetic on
    // BOTH engines — the domain gate must drop it, not crash the job
    val df = Seq[Option[Double]](Some(12.34), Some(0.0), Some(-5.0), None,
        Some(0.001), Some(1.0e18))
      .toDF("value")
    val h = graft.operators.Events.ddHistogram(df)
      .as[(Long, Long, Long)].collect().toSeq
    assert(h === Seq((4L, 12L, 1L))) // only 12.34 → q2 = 1234 → (4, 12)
  }

  private val DayMs = 86400000L
  private def dayTs(day: Int, offsetMs: Long = 0L) =
    new java.sql.Timestamp(1704067200000L + day * DayMs + offsetMs) // 2024-01-01 + day

  /** (user, first-day, last-day) triples → a minimal event frame. */
  private def lifeEvents(lives: Seq[(Long, Int, Int)]) =
    lives.zipWithIndex.flatMap { case ((u, f, l), i) =>
      Seq((i * 2L, u, "view", dayTs(f)), (i * 2L + 1, u, "view", dayTs(l)))
    }.toDF("event_id", "user_id", "event_type", "ts")

  test("survivalCurve: hand-checked risk sets, KM product, and the " +
    "censored-at-event-time convention") {
    // end = day 30. churnDays = 7 → churned iff last ≤ day 23.
    //   A 0..10 churn t=10   B 2..12 churn t=10   C 0..23 churn t=23
    //   D 1..30 censored t=29   E 25..30 censored t=5
    //   F 7..30 censored t=23  ← censored EXACTLY at an event time:
    //                            still at risk there (n_risk = 3, not 2)
    val ev = lifeEvents(Seq((1L, 0, 10), (2L, 2, 12), (3L, 0, 23),
      (4L, 1, 30), (5L, 25, 30), (6L, 7, 30)))
    val got = Events.survivalCurve(ev, churnDays = 7)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (10L, 5L, 2L, 1.0 * (1.0 - 2.0 / 5.0)),
      (23L, 3L, 1L, (1.0 - 2.0 / 5.0) * (1.0 - 1.0 / 3.0))))
  }

  test("survivalCurve: everyone active at the end yields an empty curve, " +
    "not a crash; single churned user survives to 0 at their duration") {
    val allActive = lifeEvents(Seq((1L, 0, 30), (2L, 5, 30)))
    assert(Events.survivalCurve(allActive, churnDays = 7).count() === 0L)
    // one churned (0..3), one censored (0..30): S(3) = 1 − 1/2 = 0.5
    val one = lifeEvents(Seq((1L, 0, 3), (2L, 0, 30)))
    val got = Events.survivalCurve(one, churnDays = 7)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((3L, 2L, 1L, 0.5)))
  }

  test("survivalCurveByCohort: per-cohort risk sets with ONE global " +
    "observation end") {
    // end = day 40. Jan cohort: A churned t=5, B censored t=40;
    // Feb cohort: C churned t=2 (last day exactly at the cutoff), D
    // censored t=9 — each cohort's KM is independent (both 0.5 here)
    val ev = lifeEvents(Seq((1L, 0, 5), (2L, 0, 40), (3L, 31, 33), (4L, 31, 40)))
    val got = Events.survivalCurveByCohort(ev, churnDays = 7)
      .as[(String, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      ("2024-01", 5L, 2L, 1L, 0.5),
      ("2024-02", 2L, 2L, 1L, 0.5)))
  }

  test("survivalCurveByCohort: a single-user cohort — churned user gives " +
    "a one-step curve to 0.0; censored-only cohort gives no curve rows") {
    // end = day 40. Jan: lone user churned at t=5 → S(5) = 0.
    // Feb: lone user censored (active at end) → cohort emits nothing.
    val ev = lifeEvents(Seq((1L, 0, 5), (2L, 31, 40)))
    val got = Events.survivalCurveByCohort(ev, churnDays = 7)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("2024-01", 5L, 1L, 1L, 0.0)))
  }

  /** Day-count series → event frame (one event per count unit). */
  private def seriesEvents(counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (n, day) =>
      (0 until n).map(j => (day * 1000L + j, 1L, "view", dayTs(day, j * 1000L)))
    }.toDF("event_id", "user_id", "event_type", "ts")

  test("dailyAcf: period-2 series has acf(2) = 1 and acf(1) = −1; " +
    "all lags match an independent brute force") {
    val counts = Seq(3, 1, 3, 1, 3, 1, 3, 1)
    val got = Events.dailyAcf(seriesEvents(counts), maxLag = 7)
      .as[(Int, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(2)._2.get === 1.0)
    assert(got(1)._2.get === -1.0)
    // independent brute force with the same estimator
    def brute(lag: Int): Option[Double] = {
      val xs = counts.dropRight(lag).map(_.toDouble)
      val zs = counts.drop(lag).map(_.toDouble)
      val k = xs.length.toDouble
      val (sx, sz) = (xs.sum, zs.sum)
      val sxx = xs.map(x => x * x).sum; val szz = zs.map(z => z * z).sum
      val sxz = xs.zip(zs).map { case (x, z) => x * z }.sum
      val vx = k * sxx - sx * sx; val vz = k * szz - sz * sz
      if (vx > 0 && vz > 0) Some((k * sxz - sx * sz) / math.sqrt(vx * vz)) else None
    }
    (1 to 7).foreach { lag =>
      assert(got(lag)._1 === (counts.length - lag).toLong)
      (got(lag)._2, brute(lag)) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"lag $lag: $a vs $b")
        case (a, b) => assert(a === b, s"lag $lag: $a vs $b")
      }
    }
  }

  test("dailyAcf: a zero-event calendar day enters the series as 0, and a " +
    "constant series yields NULL acf at every lag") {
    // days 0,1,3 have events; day 2 is silent → series [2,2,0,2]
    val gap = Seq((1L, 1L, "view", dayTs(0)), (2L, 1L, "view", dayTs(0, 1000L)),
      (3L, 1L, "view", dayTs(1)), (4L, 1L, "view", dayTs(1, 1000L)),
      (5L, 1L, "view", dayTs(3)), (6L, 1L, "view", dayTs(3, 1000L)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val g = Events.dailyAcf(gap, maxLag = 2)
      .as[(Int, Long, Option[Double])].collect().map(r => r._1 -> r._3).toMap
    // series [2,2,0,2]: lag-1 pairs (2,2),(2,0),(0,2) → r = −1/2
    assert(math.abs(g(1).get - (-0.5)) < 1e-12, g.toString)
    val const = Events.dailyAcf(seriesEvents(Seq(4, 4, 4, 4, 4)), maxLag = 3)
      .as[(Int, Long, Option[Double])].collect()
    assert(const.forall(_._3.isEmpty), const.mkString(","))
  }

  test("holtWintersForecast: EXACT on a pure zero-mean seasonal pattern " +
    "(the model's fixed point), and the horizon picks the right phase") {
    // weekly pattern [12,8,10,11,9,10,10] (mean 10) for 3 full weeks:
    // l stays 10, b stays 0, seasons reproduce the pattern exactly —
    // dyadic coefficients make every step's arithmetic exact
    val pattern = Seq(12, 8, 10, 11, 9, 10, 10)
    val got = Events.holtWintersForecast(
        seriesEvents(Seq.fill(3)(pattern).flatten), horizon = 7)
      .as[(Int, Double)].collect().sortBy(_._1)
    assert(got === (1 to 7).map(h => (h, pattern(h - 1).toDouble)))
  }

  test("holtWintersForecast: seasonal + linear trend is tracked, and " +
    "< 2 full seasons of data is refused") {
    // y_t = (10 + t) + pattern: after 4 weeks the forecast should sit
    // near (10 + (27 + h)) + s — not exact (init b is week-mean based),
    // but within a unit after 21 smoothing steps
    val pattern = Seq(3, -3, 0, 2, -2, 0, 0)
    val ys = (0 until 28).map(t => 10 + t + pattern(t % 7))
    val got = Events.holtWintersForecast(seriesEvents(ys), horizon = 7)
      .as[(Int, Double)].collect().sortBy(_._1)
    got.foreach { case (h, f) =>
      // the α=0.5 level lags a ramp by a few units after 3 smoothing
      // weeks — sanity band, the exactness pin is the fixed-point test
      val want = 10.0 + (27 + h) + pattern((27 + h) % 7)
      assert(math.abs(f - want) < 5.0, s"h=$h: $f vs $want")
    }
    // the trend is recovered as positive drift across the horizon
    assert(got.last._2 > got.head._2 - 3.0, got.mkString(","))
    // SHORT-SPAN CONVENTION: fewer than two seasons of days → an EMPTY
    // frame on both engines ("no forecast yet"), never a throw — the
    // oracle's init CTE gates on len(y) >= 14 the same way
    assert(Events.holtWintersForecast(seriesEvents(Seq.fill(13)(5))).count() === 0L)
    assert(Events.holtWintersAnomalies(seriesEvents(Seq.fill(13)(5))).count() === 0L)
  }

  test("markovRemovalEffects: hand-computed chain — removing the only " +
    "converting channel is effect 1.0, a drop-only channel is 0.0; " +
    "journeys cut at the first purchase") {
    def row(id: Long, u: Long, t: String, sec: Int, k: Option[Long]) =
      (id, u, t, ts(f"2024-01-01 10:00:$sec%02d"),
        k.map(v => s"""{"k":$v}""").orNull)
    // u1, u2: view c1 → purchase; u3: view c2, no purchase.
    // u1 also has post-purchase views (must be CUT) and a click (skipped)
    val ev = Seq(
      row(1, 1, "view", 1, Some(1L)), row(2, 1, "click", 2, None),
      row(3, 1, "purchase", 3, None), row(4, 1, "view", 4, Some(2L)),
      row(5, 2, "view", 1, Some(1L)), row(6, 2, "purchase", 2, None),
      row(7, 3, "view", 1, Some(2L))
    ).toDF("event_id", "user_id", "event_type", "ts", "props")
    // chain: start→c1 (2/3), start→c2 (1/3), c1→conv (1), c2→drop (1)
    // base = 2/3; without c1 = 0 → effect 1; without c2 = 2/3 → effect 0
    val got = Events.markovRemovalEffects(ev)
      .as[(String, Double, Double, Option[Double])].collect().sortBy(_._1).toSeq
    val b = 2.0 / 3.0
    assert(got === Seq(("c1", b, 0.0, Some(1.0)), ("c2", b, b, Some(0.0))))
    // no conversions anywhere → base 0, effects NULL (never NaN)
    val noConv = Seq(row(1, 1, "view", 1, Some(5L)))
      .toDF("event_id", "user_id", "event_type", "ts", "props")
    val g2 = Events.markovRemovalEffects(noConv)
      .as[(String, Double, Double, Option[Double])].collect().toSeq
    assert(g2 === Seq(("c5", 0.0, 0.0, None)))
    // empty journey set → empty result
    assert(Events.markovRemovalEffects(
      Seq(row(1, 1, "click", 1, None))
        .toDF("event_id", "user_id", "event_type", "ts", "props")).count() === 0L)
  }

  test("markovRemovalEffects: every journey converts (drop unreachable) — " +
    "base = 1.0, removal effects still defined; lone-purchase journeys " +
    "(no channel touch) contribute start→conv") {
    def row(id: Long, u: Long, t: String, sec: Int, k: Option[Long]) =
      (id, u, t, ts(f"2024-01-01 10:00:$sec%02d"),
        k.map(v => s"""{"k":$v}""").orNull)
    // u1: c1 → purchase; u2: c1 → purchase — drop has NO inbound edges
    val allConv = Seq(
      row(1, 1, "view", 1, Some(1L)), row(2, 1, "purchase", 2, None),
      row(3, 2, "view", 1, Some(1L)), row(4, 2, "purchase", 2, None)
    ).toDF("event_id", "user_id", "event_type", "ts", "props")
    val got = Events.markovRemovalEffects(allConv)
      .as[(String, Double, Double, Option[Double])].collect().toSeq
    assert(got === Seq(("c1", 1.0, 0.0, Some(1.0))))
    // chunked path agrees on the degenerate chain too
    val chunked = Events.markovRemovalEffects(allConv, chunkSec = 3600L)
      .as[(String, Double, Double, Option[Double])].collect().toSeq
    assert(chunked === got)
    // a user who purchases with NO channel touches: start→conv directly;
    // removing the only channel then cannot zero the base
    val mixed = Seq(
      row(1, 1, "view", 1, Some(1L)), row(2, 1, "purchase", 2, None),
      row(3, 2, "purchase", 1, None)
    ).toDF("event_id", "user_id", "event_type", "ts", "props")
    val g2 = Events.markovRemovalEffects(mixed)
      .as[(String, Double, Double, Option[Double])].collect().toSeq
    assert(g2.length === 1)
    val (ch, base, without, eff) = g2.head
    assert(ch === "c1" && base === 1.0 && without === 0.5 && eff === Some(0.5))
  }

  test("Skew.saltedEquiJoin == plain equi-join: exact row multiset under " +
    "inner and left_outer, whale key spread across lanes, outer refusal") {
    import graft.operators.Skew
    val rnd = new scala.util.Random(59)
    // whale: key 7 carries 500 fact rows; 20 other keys sparse; key 99
    // has facts but NO dim row (exercises left_outer null lane)
    val facts = ((0 until 500).map(i => (7L, i.toLong, rnd.nextInt(100))) ++
      (0 until 200).map(i => ((rnd.nextInt(20) + 10).toLong, 1000L + i, rnd.nextInt(100))) ++
      (0 until 5).map(i => (99L, 2000L + i, i)))
      .toDF("k", "row_id", "v")
    val dim = (Seq(7L) ++ (10L until 30L) ++ Seq(50L) /* dim-only key */)
      .map(k => (k, s"d$k")).toDF("k", "attr")
    def bag(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("row_id"), col("v"),
        coalesce(col("attr"), lit("(none)")).as("attr"))
      .as[(Long, Long, Int, String)].collect().sorted.toSeq
    for (salts <- Seq(1, 4, 16)) {
      val inner = bag(Skew.saltedEquiJoin(facts, dim, "k", col("row_id"), salts))
      assert(inner === bag(facts.join(dim, Seq("k"))), s"inner salts=$salts")
      val lo = bag(Skew.saltedEquiJoin(facts, dim, "k", col("row_id"), salts,
        joinType = "left_outer"))
      assert(lo === bag(facts.join(dim, Seq("k"), "left_outer")),
        s"left_outer salts=$salts (unmatched facts appear exactly once)")
    }
    // the whale's rows really do split: 16 salts → 16 distinct lanes
    val lanes = facts.where(col("k") === 7L)
      .select(pmod(col("row_id"), lit(16L)).cast("int").as("salt"))
      .distinct().count()
    assert(lanes === 16L)
    intercept[IllegalArgumentException] {
      Skew.saltedEquiJoin(facts, dim, "k", col("row_id"), 4, joinType = "right_outer")
    }
  }

  test("userGaps / markovRemovalEffects chunked == unchunked: the " +
    "segmented whale-safe path is exact across chunk boundaries, " +
    "boundary ties, and a dominant whale user") {
    val rnd = new scala.util.Random(47)
    // 2000 events for the whale (user 1), sparse traffic for 20 others;
    // timestamps cluster around day boundaries (ties included) so the
    // chunk decomposition's boundary pairs are genuinely exercised
    val rows = (0 until 2600).map { i =>
      val u = if (i < 2000) 1L else (2L + rnd.nextInt(20)).toLong
      val day = rnd.nextInt(10)
      val ms: Long = rnd.nextInt(4) match {
        case 0 => 0L                            // exactly at a chunk edge
        case 1 => DayMs - 1L                    // last instant of the chunk
        case 2 => rnd.nextInt(5) * 1000L        // tied small offsets
        case _ => rnd.nextInt(86400000).toLong
      }
      val typ = rnd.nextInt(10) match {
        case 0 => "purchase"
        case 1 | 2 | 3 => "click"
        case _ => "view"
      }
      val props =
        if (typ == "view" && rnd.nextInt(4) > 0) s"""{"k":${rnd.nextInt(5)}}"""
        else null
      (i.toLong, u, typ, dayTs(day, ms), props)
    }
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts", "props")
    // gaps: multiset equality per user (the chunked union emits pair
    // rows in a different order; content must match exactly)
    def gapBag(chunkSec: Long) =
      Events.userGaps(ev, chunkSec = chunkSec)
        .groupBy(col("user_id"), col("gap_s")).agg(count(lit(1)).as("n"))
        .as[(Long, Long, Long)].collect().toSet
    assert(gapBag(86400L) === gapBag(0L))
    assert(gapBag(3600L) === gapBag(0L)) // chunk width must not matter
    // markov: the full report frame is identical
    def markov(chunkSec: Long) =
      Events.markovRemovalEffects(ev, chunkSec = chunkSec)
        .as[(String, Double, Double, Option[Double])].collect().sortBy(_._1).toSeq
    val unchunked = markov(0L)
    assert(unchunked.nonEmpty)
    assert(markov(86400L) === unchunked)
    assert(markov(3600L) === unchunked)
  }

  test("holtWintersAnomalies: a spike on periodic traffic is rank 1 and " +
    "flagged; the exact-fit fixture flags nothing (σ = 0, ties → earliest days)") {
    val pattern = Seq(12, 8, 10, 11, 9, 10, 10)
    // 4 weeks of the exact pattern, but day 24 (pattern value 11) bursts to 60
    val counts = Seq.fill(4)(pattern).flatten.updated(24, 60)
    val got = Events.holtWintersAnomalies(seriesEvents(counts))
      .as[(Int, Long, Long, Double, Double, Boolean)].collect().sortBy(_._1)
    val base = 1704067200000L / DayMs
    val top = got.head
    assert(top._2 === base + 24 && top._3 === 60L && top._6 === true, got.mkString(","))
    // pre-spike the model is at its fixed point → expected == pattern value
    assert(top._4 === 11.0, s"expected ${top._4}")
    // exact-fit fixture: every error is 0.0 → σ = 0, nothing flagged,
    // and the top-3 tie resolves to the three EARLIEST forecastable days
    val calm = Events.holtWintersAnomalies(seriesEvents(Seq.fill(3)(pattern).flatten))
      .as[(Int, Long, Long, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(calm.forall(!_._6), calm.mkString(","))
    assert(calm.map(_._2).toSeq === Seq(base + 7, base + 8, base + 9))
    assert(calm.forall(_._5 === 0.0))
  }

  test("cusumChangepoint: step series locates the last pre-shift day with " +
    "exact scaled statistic and both regime means") {
    // 5 days of 10 then 5 days of 30: m=10, S=200; C' bottoms at −500 on
    // day index 4 (the last low day); means 10 and 30
    val got = Events.cusumChangepoint(seriesEvents(Seq.fill(5)(10) ++ Seq.fill(5)(30)))
      .as[(Long, Long, Long, Double, Option[Double])].collect().head
    val base = 1704067200000L / DayMs // epoch-day of the fixture origin
    assert(got === ((base + 4L, -500L, 10L, 10.0, Some(30.0))))
  }

  test("cusumChangepoint: constant series ties at zero everywhere → earliest " +
    "day wins and the after-mean stays defined") {
    val got = Events.cusumChangepoint(seriesEvents(Seq(7, 7, 7, 7)))
      .as[(Long, Long, Long, Double, Option[Double])].collect().head
    val base = 1704067200000L / DayMs
    assert(got === ((base, 0L, 4L, 7.0, Some(7.0))))
  }
}
