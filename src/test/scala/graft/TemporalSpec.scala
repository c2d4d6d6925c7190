package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // crafted stream: user 1 has ties and interleavings, user 2 has a
  // left row BEFORE any right row (null match), user 3 is right-only
  private lazy val lefts = Seq(
    (100L, 1L, ts("2024-01-01 10:00:00")), // after r1/r2 tie at 09:59
    (101L, 1L, ts("2024-01-01 10:30:00")), // exactly ON r3's ts (inclusive)
    (102L, 2L, ts("2024-01-01 08:00:00")), // before user 2's only right row
    (103L, 2L, ts("2024-01-01 12:00:00"))
  ).toDF("event_id", "user_id", "ts")

  private lazy val rights = Seq(
    (10L, 1L, ts("2024-01-01 09:59:00"), 1.0), // tie on ts with 11
    (11L, 1L, ts("2024-01-01 09:59:00"), 2.0), // wins tie: greater id
    (12L, 1L, ts("2024-01-01 10:30:00"), 3.0), // equal ts to left 101: included
    (13L, 2L, ts("2024-01-01 09:00:00"), 4.0),
    (14L, 3L, ts("2024-01-01 00:00:00"), 5.0)  // key with no left rows
  ).toDF("rid", "user_id", "ts", "value")

  test("asofJoin: latest right <= left.ts per key, max-tieBreak on ties, null when none") {
    val got = Temporal.asofJoin(lefts, rights, "user_id", "ts", Seq("rid", "value"), "rid")
      .select("event_id", "asof_rid", "asof_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, r, v) => k -> ((r, v)) }.toMap
    assert(got(100L) === ((Some(11L), Some(2.0)))) // tie resolved to rid 11
    assert(got(101L) === ((Some(12L), Some(3.0)))) // equal-ts right included
    assert(got(102L) === ((None, None)))           // no prior right row
    assert(got(103L) === ((Some(13L), Some(4.0))))
    assert(got.size === 4) // left-outer: exactly one row per left row
  }

  test("asofJoin matches the brute-force subquery twin on random data") {
    val rnd = new scala.util.Random(7)
    val l = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
      .toDF("event_id", "user_id", "ts")
    val r = (0 until 300).map(i =>
      (i.toLong + 1000L, rnd.nextInt(5).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), rnd.nextDouble()))
      .toDF("rid", "user_id", "ts", "value")
    val got = Temporal.asofJoin(l, r, "user_id", "ts", Seq("rid"), "rid")
      .select("event_id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    val lRows = l.as[(Long, Long, java.sql.Timestamp)].collect()
    val rRows = r.as[(Long, Long, java.sql.Timestamp, Double)].collect()
    lRows.foreach { case (id, u, t) =>
      val cand = rRows.filter(x => x._2 == u && !x._3.after(t))
      val want = if (cand.isEmpty) None
        else Some(cand.maxBy(x => (x._3.getTime, x._1))._1)
      assert(got(id) === want, s"event $id")
    }
  }

  test("asofJoin forward: earliest right >= left.ts, brute-force twin on random data") {
    val rnd = new scala.util.Random(17)
    val l = (0 until 250).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
      .toDF("event_id", "user_id", "ts")
    val r = (0 until 250).map(i =>
      (i.toLong + 1000L, rnd.nextInt(5).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), rnd.nextDouble()))
      .toDF("rid", "user_id", "ts", "value")
    val got = Temporal.asofJoin(l, r, "user_id", "ts", Seq("rid"), "rid",
        direction = "forward")
      .select("event_id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    val lRows = l.as[(Long, Long, java.sql.Timestamp)].collect()
    val rRows = r.as[(Long, Long, java.sql.Timestamp, Double)].collect()
    lRows.foreach { case (id, u, t) =>
      val cand = rRows.filter(x => x._2 == u && !x._3.before(t))
      // earliest ts; ties to the greatest rid (the operator's contract)
      val want = if (cand.isEmpty) None
        else Some(cand.minBy(x => (x._3.getTime, -x._1))._1)
      assert(got(id) === want, s"event $id")
    }
  }

  test("asofJoinKeys: composite key partitions independently per key pair") {
    val l = Seq(
      (1L, 1L, "price", ts("2024-01-01 10:00:00")),
      (2L, 1L, "volume", ts("2024-01-01 10:00:00")))
      .toDF("event_id", "entity", "feature", "ts")
    val r = Seq(
      (10L, 1L, "price", ts("2024-01-01 09:00:00"), 1.5),
      (11L, 1L, "volume", ts("2024-01-01 09:30:00"), 99.0))
      .toDF("rid", "entity", "feature", "ts", "value")
    val got = Temporal.asofJoinKeys(l, r, Seq("entity", "feature"), "ts",
        Seq("value"), "rid")
      .select("event_id", "asof_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(got === Map(1L -> Some(1.5), 2L -> Some(99.0)))
  }

  test("asofJoin tolerance: stale matches become nulls, cardinality preserved") {
    val got = Temporal.asofJoin(lefts, rights, "user_id", "ts", Seq("rid"), "rid",
        toleranceSec = 60) // 1 minute: only equal-ts and 1-min-old matches survive
      .select("event_id", "asof_rid").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(100L) === Some(11L)) // 09:59 click vs 10:00 left: 60 s, inside
    assert(got(101L) === Some(12L)) // equal ts: gap 0
    assert(got(102L) === None)      // no match at all
    assert(got(103L) === None)      // 09:00 right vs 12:00 left: stale, nulled
    assert(got.size === 4)
  }

  test("asofJoin tolerance composes with the chunked skew path (identical results)") {
    // gapOk is applied AFTER the branch split, so the segmented scan must
    // null stale matches exactly like the single-window path — including
    // a match carried across a chunk boundary that tolerance then rejects
    val plain = Temporal.asofJoin(lefts, rights, "user_id", "ts", Seq("rid"), "rid",
        toleranceSec = 60)
      .select("event_id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    Seq(60L, 3600L, 86400L).foreach { cs =>
      val chunked = Temporal.asofJoin(lefts, rights, "user_id", "ts", Seq("rid"), "rid",
          toleranceSec = 60, chunkSec = cs)
        .select("event_id", "asof_rid").as[(Long, Option[Long])].collect().toMap
      assert(chunked === plain, s"chunkSec=$cs")
    }
  }

  test("asofJoin plan: zero joins — one window pass (no per-key cartesian)") {
    val plan = Temporal.asofJoin(lefts, rights, "user_id", "ts", Seq("rid"), "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of join must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected a window pass:\n$plan")
  }

  test("rangeJoinBinned matches the brute-force inequality join, incl. window edges") {
    val rnd = new scala.util.Random(11)
    // ts offsets chosen to land exactly on bucket edges sometimes
    val l = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(4).toLong,
        new java.sql.Timestamp(1704100000000L + rnd.nextInt(7200) * 1000L)))
      .toDF("event_id", "user_id", "ts")
    val r = (0 until 400).map(i =>
      (rnd.nextInt(4).toLong,
        new java.sql.Timestamp(1704100000000L + rnd.nextInt(7200) * 1000L), rnd.nextDouble()))
      .toDF("user_id", "ts", "value")
    val win = 600L
    val got = Temporal.rangeJoinBinned(l, r, "user_id", "ts", win)
      .groupBy("event_id")
      .agg(count(col("range_match")).as("n"))
      .as[(Long, Long)].collect().toMap
    val lRows = l.as[(Long, Long, java.sql.Timestamp)].collect()
    val rRows = r.as[(Long, java.sql.Timestamp, Double)].collect()
    lRows.foreach { case (id, u, t) =>
      val n = rRows.count(x => x._1 == u &&
        x._2.getTime > t.getTime - win * 1000 && x._2.getTime <= t.getTime)
      assert(got(id) === n, s"event $id")
      assert(got.size === lRows.length) // left-outer cardinality exact
    }
  }

  test("rangeJoinBinned honors a nonzero offset (look-back band excludes the recent edge)") {
    val rnd = new scala.util.Random(13)
    val l = (0 until 150).map(i =>
      (i.toLong, rnd.nextInt(3).toLong,
        new java.sql.Timestamp(1704100000000L + rnd.nextInt(7200) * 1000L)))
      .toDF("event_id", "user_id", "ts")
    val r = (0 until 300).map(_ =>
      (rnd.nextInt(3).toLong,
        new java.sql.Timestamp(1704100000000L + rnd.nextInt(7200) * 1000L), 1.0))
      .toDF("user_id", "ts", "value")
    val (win, off) = (600L, 120L)
    val got = Temporal.rangeJoinBinned(l, r, "user_id", "ts", win, off)
      .groupBy("event_id").agg(count(col("range_match")).as("n"))
      .as[(Long, Long)].collect().toMap
    val lRows = l.as[(Long, Long, java.sql.Timestamp)].collect()
    val rRows = r.as[(Long, java.sql.Timestamp, Double)].collect()
    lRows.foreach { case (id, u, t) =>
      val n = rRows.count(x => x._1 == u &&
        x._2.getTime > t.getTime - win * 1000 && x._2.getTime <= t.getTime - off * 1000)
      assert(got(id) === n, s"event $id")
    }
    assert(got.size === lRows.length)
  }

  test("rangeJoinBinned with a bucket narrower than the window still covers it") {
    val rnd = new scala.util.Random(29)
    val l = (0 until 120).map(i =>
      (i.toLong, rnd.nextInt(3).toLong,
        new java.sql.Timestamp(1704100000000L + rnd.nextInt(7200) * 1000L)))
      .toDF("event_id", "user_id", "ts")
    val r = (0 until 300).map(_ =>
      (rnd.nextInt(3).toLong,
        new java.sql.Timestamp(1704100000000L + rnd.nextInt(7200) * 1000L), 1.0))
      .toDF("user_id", "ts", "value")
    val win = 1500L
    val got = Temporal.rangeJoinBinned(l, r, "user_id", "ts", win, bucketSec = 600L)
      .groupBy("event_id").agg(count(col("range_match")).as("n"))
      .as[(Long, Long)].collect().toMap
    val lRows = l.as[(Long, Long, java.sql.Timestamp)].collect()
    val rRows = r.as[(Long, java.sql.Timestamp, Double)].collect()
    lRows.foreach { case (id, u, t) =>
      val n = rRows.count(x => x._1 == u &&
        x._2.getTime > t.getTime - win * 1000 && x._2.getTime <= t.getTime)
      assert(got(id) === n, s"event $id")
    }
    assert(got.size === lRows.length)
  }

  test("asofJoin tie-break keeps the column's native type (double, string)") {
    // two right rows tied on ts; tieBreak is a DOUBLE whose values only
    // differ in the fractional part — a cast to long would truncate both
    // to 0 and resolve the tie arbitrarily
    val l = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val rD = Seq(
      (1L, ts("2024-01-01 09:00:00"), 0.1, "lo"),
      (1L, ts("2024-01-01 09:00:00"), 0.9, "hi"))
      .toDF("user_id", "ts", "w", "name")
    val gotD = Temporal.asofJoin(l, rD, "user_id", "ts", Seq("name"), tieBreak = "w")
      .select("asof_name").as[String].collect()
    assert(gotD === Array("hi"))
    // string tie-break: a numeric cast would null both out and pick an
    // arbitrary row; native ordering resolves to the greatest string
    val rS = Seq(
      (1L, ts("2024-01-01 09:00:00"), "alpha"),
      (1L, ts("2024-01-01 09:00:00"), "zeta"))
      .toDF("user_id", "ts", "tag")
    val gotS = Temporal.asofJoin(l, rS, "user_id", "ts", Seq("tag"), tieBreak = "tag")
      .select("asof_tag").as[String].collect()
    assert(gotS === Array("zeta"))
  }

  test("asofJoin chunked (skew path) matches the single-window path, incl. null keys") {
    val rnd = new scala.util.Random(41)
    // whale key: user 0 holds ~half the rows; plus a null-key population
    // to prove the cross-chunk carry join is null-safe
    def key(): java.lang.Long =
      rnd.nextInt(4) match { case 0 | 1 => 0L; case 2 => 1L; case _ => null }
    val l = (0 until 400).map(i =>
      (i.toLong, key(), ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
      .toDF("event_id", "user_id", "ts")
    val r = (0 until 400).map(i =>
      (i.toLong + 1000L, key(), ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
      .toDF("rid", "user_id", "ts")
    for (dir <- Seq("backward", "forward");
         tol <- Seq(Long.MaxValue, 3600L)) { // tolerance composes with chunking
      val plain = Temporal.asofJoin(l, r, "user_id", "ts", Seq("rid"), "rid",
          direction = dir, toleranceSec = tol)
        .select("event_id", "asof_rid").as[(Long, Option[Long])].collect().toMap
      // 2-hour chunks: the whale key's day splits across ~12 partitions
      val chunked = Temporal.asofJoin(l, r, "user_id", "ts", Seq("rid"), "rid",
          direction = dir, toleranceSec = tol, chunkSec = 7200L)
        .select("event_id", "asof_rid").as[(Long, Option[Long])].collect().toMap
      assert(chunked === plain, s"direction=$dir tol=$tol")
      assert(chunked.size === 400)
    }
  }

  test("asofJoin chunked: whale key's per-task sort is bounded by its densest chunk, not its history") {
    // 50%-whale fixture: user 0 owns half of 4000 rows at a 25 s cadence
    // (~14 h of history); everyone else spreads over 100 keys. The
    // segmented path's window partitions on (key, chunk), so the whale's
    // sort groups hold ~chunkSec/cadence rows each — assert the ACTUAL
    // max group size the executor sorts, and that the whale's full
    // 4000-row history never lands in one group. Correctness vs the
    // single-window path is re-pinned on the same fixture.
    val n = 4000
    val half = n / 2
    val chunkSec = 3600L
    def whaleTs(i: Int) = ts("2024-01-01 00:00:00").toLocalDateTime
      .plusSeconds(i * 25L)
    def mk(idBase: Long) = (0 until n).map { i =>
      val k = if (i < half) 0L else 1L + i % 100
      (idBase + i, k, java.sql.Timestamp.valueOf(whaleTs(i)))
    }.toDF("event_id", "user_id", "ts")
    val l = mk(0L)
    val r = mk(100000L).withColumnRenamed("event_id", "rid")
    // the sort-group axis the segmented window actually partitions on
    val groupSizes = l.select(col("user_id"), col("ts"))
      .unionByName(r.select(col("user_id"), col("ts")))
      .groupBy(col("user_id"),
        floor(unix_timestamp(col("ts")) / chunkSec).as("chunk"))
      .count().as[(Long, Long, Long)].collect()
    val maxGroup = groupSizes.map(_._3).max
    val whaleTotal = groupSizes.filter(_._1 == 0L).map(_._3).sum
    assert(whaleTotal === 2L * half, "fixture: whale must own half of both sides")
    // 3600 s / 25 s cadence = 144 whale rows per side per chunk; the
    // bound is the densest chunk (+boundary slack), a ~13x reduction
    // from the 4000-row unchunked whale partition
    assert(maxGroup <= 2 * (chunkSec / 25) + 4,
      s"per-(key, chunk) sort group exceeded the chunk-density bound: $maxGroup")
    assert(maxGroup < whaleTotal / 4,
      s"chunking failed to break up the whale: maxGroup=$maxGroup of $whaleTotal")
    val plain = Temporal.asofJoin(l, r, "user_id", "ts", Seq("rid"), "rid")
      .select("event_id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    val chunked = Temporal.asofJoin(l, r, "user_id", "ts", Seq("rid"), "rid",
        chunkSec = chunkSec)
      .select("event_id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(chunked === plain)
    assert(chunked.size === n)
  }

  test("asofJoin chunked plan: ONE full-row sort; the carry comes from a partial aggregate") {
    val df = Temporal.asofJoin(lefts, rights, "user_id", "ts", Seq("rid"), "rid",
      chunkSec = 3600L)
    val plan = df.queryExecution.executedPlan.toString
    // exactly one sort of the full union (the per-chunk window); the
    // per-chunk finals must come from a map-side-combinable aggregate,
    // not a second full-frame window pass (which would re-shuffle and
    // re-sort all the data)
    val unionSorts = plan.linesIterator.count(l => l.contains("Sort [") && l.contains("__tag"))
    assert(unionSorts === 1,
      s"expected 1 full-row window sort, got $unionSorts:\n" +
        plan.linesIterator.filter(_.contains("Sort [")).mkString("\n"))
    assert(plan.contains("partial_max_by"),
      "chunk-final carry must be a partial (map-side) aggregate:\n" +
        plan.linesIterator.filter(_.contains("max_by")).mkString("\n"))
  }

  test("rangeJoinBinned pair-level: exactly one null row per unmatched left, none for matched") {
    // left row 1's only matches live in the PREVIOUS bucket (its own
    // bucket holds no right rows) — the old probe-side fan-out emitted a
    // phantom null row alongside the real pairs here; left row 2 has no
    // matches at all and must get exactly one null row
    val l = Seq(
      (1L, 7L, new java.sql.Timestamp(1704100205000L)), // bucket edge + 5 s
      (2L, 7L, new java.sql.Timestamp(1704103800000L)))
      .toDF("event_id", "user_id", "ts")
    val r = Seq(
      (7L, new java.sql.Timestamp(1704100190000L), 1.0), // 15 s before l1, prev bucket
      (7L, new java.sql.Timestamp(1704100100000L), 2.0)) // 105 s before l1, prev bucket
      .toDF("user_id", "ts", "value")
    val pairs = Temporal.rangeJoinBinned(l, r, "user_id", "ts", windowSec = 600L)
      .select(col("event_id"), col("range_match").isNull.as("noMatch"))
      .as[(Long, Boolean)].collect().toSeq.sorted
    assert(pairs === Seq((1L, false), (1L, false), (2L, true)))
  }

  test("rangeJoinBinned pair-level cardinality matches brute force on random data") {
    val rnd = new scala.util.Random(53)
    val l = (0 until 150).map(i =>
      (i.toLong, rnd.nextInt(3).toLong,
        new java.sql.Timestamp(1704100000000L + rnd.nextInt(7200) * 1000L)))
      .toDF("event_id", "user_id", "ts")
    val r = (0 until 300).map(_ =>
      (rnd.nextInt(3).toLong,
        new java.sql.Timestamp(1704100000000L + rnd.nextInt(7200) * 1000L), 1.0))
      .toDF("user_id", "ts", "value")
    val win = 600L
    // count(*) — unlike count(col) it does NOT skip nulls, so a phantom
    // null row for a matched left row would break this
    val got = Temporal.rangeJoinBinned(l, r, "user_id", "ts", win)
      .groupBy("event_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val lRows = l.as[(Long, Long, java.sql.Timestamp)].collect()
    val rRows = r.as[(Long, java.sql.Timestamp, Double)].collect()
    lRows.foreach { case (id, u, t) =>
      val n = rRows.count(x => x._1 == u &&
        x._2.getTime > t.getTime - win * 1000 && x._2.getTime <= t.getTime)
      assert(got(id) === math.max(n, 1L), s"event $id") // unmatched → 1 null row
    }
    assert(got.size === lRows.length)
  }

  test("rangeJoinBinned: null keys form a group (asofJoin/intervalJoin-consistent)") {
    // an anonymous (null-user) left event must see anonymous right rows
    // in its window — and must NOT see keyed rows, nor they it
    val l = Seq(
      (1L, Some(7L), new java.sql.Timestamp(1704100300000L)),
      (2L, None, new java.sql.Timestamp(1704100300000L)))
      .toDF("event_id", "user_id", "ts")
    val r = Seq(
      (Some(7L), new java.sql.Timestamp(1704100200000L), 1.0),
      (None, new java.sql.Timestamp(1704100210000L), 2.0),
      (None, new java.sql.Timestamp(1704100220000L), 3.0))
      .toDF("user_id", "ts", "value")
    val got = Temporal.rangeJoinBinned(l, r, "user_id", "ts", windowSec = 600L)
      .select(col("event_id"), col("range_match.value"))
      .as[(Long, Option[Double])].collect().toSeq.sorted
    assert(got === Seq((1L, Some(1.0)), (2L, Some(2.0)), (2L, Some(3.0))))
  }

  test("rangeJoinBinned plan: equi-join on (key, bucket), no nested-loop fallback") {
    val plan = Temporal.rangeJoinBinned(lefts, rights, "user_id", "ts", 600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }

  // ---- intervalJoinBinned ----

  private def ival(base: Long, startSec: Int, lenSec: Int): (java.sql.Timestamp, java.sql.Timestamp) =
    (new java.sql.Timestamp(base + startSec * 1000L),
      new java.sql.Timestamp(base + (startSec + lenSec) * 1000L))

  test("intervalJoinBinned: every overlapping pair exactly once, incl. multi-bucket spans") {
    val rnd = new scala.util.Random(71)
    val base = 1704100000000L
    // spans up to 30 min vs a 10-min bucket: intervals cross up to 4 buckets,
    // so first-common-bucket dedup is genuinely exercised
    val l = (0 until 120).map { i =>
      val (s, e) = ival(base, rnd.nextInt(7200), rnd.nextInt(1800))
      (i.toLong, rnd.nextInt(3).toLong, s, e)
    }.toDF("lid", "k", "ls", "le")
    val r = (0 until 120).map { i =>
      val (s, e) = ival(base, rnd.nextInt(7200), rnd.nextInt(1800))
      (i.toLong, rnd.nextInt(3).toLong, s, e)
    }.toDF("rid", "k", "rs", "re")
    val got = Temporal.intervalJoinBinned(l, r, Seq("k"),
        ("ls", "le"), ("rs", "re"), bucketSec = 600L, maxSpanSec = 1800L)
      .select(col("lid"), col("interval_match.rid"))
      .as[(Long, Long)].collect().sorted
    val lRows = l.as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)].collect()
    val rRows = r.as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)].collect()
    val want = (for {
      (lid, lk, ls, le) <- lRows
      (rid, rk, rs, re) <- rRows
      if lk == rk && ls.getTime <= re.getTime && rs.getTime <= le.getTime
    } yield (lid, rid)).sorted
    // sorted SEQUENCES (not sets): a pair emitted twice would fail here
    assert(got.toSeq === want.toSeq)
  }

  test("intervalJoinBinned keyless: pure time-axis overlap, brute-force twin") {
    val rnd = new scala.util.Random(72)
    val base = 1704100000000L
    val l = (0 until 60).map { i =>
      val (s, e) = ival(base, rnd.nextInt(3600), rnd.nextInt(900))
      (i.toLong, s, e)
    }.toDF("lid", "ls", "le")
    val r = (0 until 20).map { i =>
      val (s, e) = ival(base, rnd.nextInt(3600), rnd.nextInt(900))
      (i.toLong, s, e)
    }.toDF("rid", "rs", "re")
    val got = Temporal.intervalJoinBinned(l, r, Seq.empty,
        ("ls", "le"), ("rs", "re"), bucketSec = 300L, maxSpanSec = 900L)
      .select(col("lid"), col("interval_match.rid"))
      .as[(Long, Long)].collect().sorted
    val lRows = l.as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect()
    val rRows = r.as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect()
    val want = (for {
      (lid, ls, le) <- lRows
      (rid, rs, re) <- rRows
      if ls.getTime <= re.getTime && rs.getTime <= le.getTime
    } yield (lid, rid)).sorted
    assert(got.toSeq === want.toSeq)
  }

  test("intervalJoinBinned: null keys pair with null keys (groupBy semantics)") {
    val base = 1704100000000L
    val (s1, e1) = ival(base, 0, 600)
    val (s2, e2) = ival(base, 300, 600)
    val l = Seq((1L, null.asInstanceOf[java.lang.Long], s1, e1)).toDF("lid", "k", "ls", "le")
    val r = Seq((2L, null.asInstanceOf[java.lang.Long], s2, e2)).toDF("rid", "k", "rs", "re")
    val got = Temporal.intervalJoinBinned(l, r, Seq("k"),
        ("ls", "le"), ("rs", "re"), bucketSec = 600L, maxSpanSec = 600L)
      .select("lid").as[Long].collect()
    assert(got.toSeq === Seq(1L))
  }

  test("intervalJoinBinned: a row breaking the span contract fails loudly") {
    val base = 1704100000000L
    val (s1, e1) = ival(base, 0, 7200) // 2 h > maxSpanSec 1 h
    val l = Seq((1L, s1, e1)).toDF("lid", "ls", "le")
    val r = Seq((2L, s1, e1)).toDF("rid", "rs", "re")
    val ex = intercept[Exception] {
      Temporal.intervalJoinBinned(l, r, Seq.empty,
        ("ls", "le"), ("rs", "re"), bucketSec = 600L, maxSpanSec = 3600L).count()
    }
    assert(ex.getMessage != null)
    // inverted interval (end < start) fails the same guard instead of
    // silently producing a counting-down bucket sequence
    val inv = Seq((1L, e1, s1)).toDF("lid", "ls", "le")
    intercept[Exception] {
      Temporal.intervalJoinBinned(inv, r, Seq.empty,
        ("ls", "le"), ("rs", "re"), bucketSec = 600L, maxSpanSec = 3600L).count()
    }
  }

  test("intervalJoinBinned plan: equi-join on (key, bucket), no nested-loop fallback") {
    val base = 1704100000000L
    val (s1, e1) = ival(base, 0, 600)
    val l = Seq((1L, 1L, s1, e1)).toDF("lid", "k", "ls", "le")
    val r = Seq((2L, 1L, s1, e1)).toDF("rid", "k", "rs", "re")
    val plan = Temporal.intervalJoinBinned(l, r, Seq("k"),
        ("ls", "le"), ("rs", "re"), bucketSec = 600L, maxSpanSec = 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join must stay an equi-join:\n$plan")
  }
}
