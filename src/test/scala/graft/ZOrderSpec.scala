package graft

import graft.sources.ZOrder
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: interleave is order-preserving per axis and hits the corners") {
    val df = Seq((0.0, 0.0), (65535.0, 65535.0), (100.0, 200.0), (200.0, 200.0))
      .toDF("x", "y")
    val z = df.select(ZOrder.zValue(col("x"), col("y"), 0.0, 65535.0, 0.0, 65535.0))
      .as[Long].collect()
    assert(z(0) === 0L)
    assert(z(1) === (1L << 32) - 1)
    assert(z(2) < z(3)) // same y, larger x => larger z
  }

  test("z-ordered layout: per-file spans are tight on BOTH axes; ts-sort is not") {
    val events = EventStream.loadEvents(spark, sf0001)
      .withColumn("ts_us", unix_micros(col("ts")))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    ZOrder.writeZOrdered(events, s"$base/z", "ts_us", "user_id", nFiles = 16)
    // the 1-D control: same file count, sorted on ts only
    events.repartitionByRange(16, col("ts_us")).sortWithinPartitions(col("ts_us"))
      .write.mode("overwrite").parquet(s"$base/t")

    // roundtrip: layout never changes content
    val got = ZOrder.open(spark, s"$base/z").select("event_id").as[Long].collect().toSet
    val want = events.select("event_id").as[Long].collect().toSet
    assert(got === want)

    def meanSpan(path: String, c: String): Double = {
      val df = spark.read.parquet(path)
      val global = df.agg((max(col(c)) - min(col(c))).cast("double")).head().getDouble(0)
      val mean = df.groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).cast("double").as("span"))
        .agg(avg(col("span"))).head().getDouble(0)
      mean / global
    }
    // z-order: both axes localized (each file a rectangle on the curve)
    val zTs = meanSpan(s"$base/z", "ts_us")
    val zUser = meanSpan(s"$base/z", "user_id")
    assert(zTs < 0.5, s"z-order ts span fraction $zTs")
    assert(zUser < 0.5, s"z-order user span fraction $zUser")
    // ts-sort control: ts tight but user_id scattered across ~full range —
    // the single-axis layout cannot serve the second predicate
    val tUser = meanSpan(s"$base/t", "user_id")
    assert(tUser > 0.8, s"control user span fraction $tUser (expected ~1)")
    assert(zUser < tUser / 2,
      s"z-order should at least halve the user-axis span: $zUser vs $tUser")
  }
}
