package graft

import graft.operators.Crud
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property test for the batch MERGE: for ANY change batch, the result
  * must equal the sequential fold of the changes (in seq order) over the
  * base snapshot — the row-at-a-time semantics the reference implements
  * (`src/cores/database.rs:227-304`). Deterministic seeded generators. */
class CrudPropSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  // ids overlap the base range [0, 20) AND a fresh range so inserts,
  // re-deletes, and revivals all occur; several changes per id are likely
  private val batchGen: Gen[List[(Long, String, Int)]] = for {
    n <- Gen.chooseNum(0, 60)
    ids <- Gen.listOfN(n, Gen.chooseNum(0L, 29L))
    ops <- Gen.listOfN(n, Gen.oneOf("upsert", "delete"))
  } yield ids.zip(ops).zipWithIndex.map { case ((id, op), i) => (id, op, i + 1) }

  test("merge == sequential fold of the change batch, for arbitrary batches") {
    val base = (0L until 20L).map(i => (i, Seq(i.toFloat), Map("v" -> s"base$i")))
      .toDF("id", "embedding", "metadata")
    (1L to 10L).foreach { seed =>
      val batch = sample(batchGen, seed)
      val changes = batch.map { case (id, op, seq) =>
        (id, op, seq,
          if (op == "upsert") Some(Seq(id.toFloat)) else None,
          if (op == "upsert") Some(Map("v" -> s"c$seq")) else None)
      }.toDF("id", "op", "seq", "embedding", "metadata")
      val got = Crud.merge(base, changes)
        .select("id", "metadata").as[(Long, Map[String, String])]
        .collect().sortBy(_._1).toSeq
      // reference semantics: apply changes one at a time in seq order
      var state = (0L until 20L).map(i => i -> Map("v" -> s"base$i")).toMap
      batch.sortBy(_._3).foreach { case (id, op, seq) =>
        if (op == "delete") state -= id
        else state += id -> Map("v" -> s"c$seq")
      }
      val want = state.toSeq.sortBy(_._1)
      assert(got === want, s"seed=$seed batch=$batch")
    }
  }

  // arbitrary store pair: overlapping id ranges, random payload drift —
  // exercises every diff class (delete / insert / vector change /
  // metadata change / unchanged) in random mixes
  private val storePairGen: Gen[(List[(Long, Float, String)], List[(Long, Float, String)])] =
    for {
      aIds <- Gen.someOf(0L until 24L)
      bIds <- Gen.someOf(0L until 24L)
      drift <- Gen.listOfN(24, Gen.chooseNum(0, 3)) // 0 = identical payload
    } yield (
      aIds.toList.sorted.map(i => (i, i.toFloat, s"m$i")),
      bIds.toList.sorted.map { i =>
        drift(i.toInt) match {
          case 0 => (i, i.toFloat, s"m$i")             // unchanged
          case 1 => (i, i.toFloat + 100f, s"m$i")      // vector drift
          case 2 => (i, i.toFloat, s"m${i}x")          // metadata drift
          case _ => (i, i.toFloat + 100f, s"m${i}x")   // both
        }
      })

  test("diff round-trip law: merge(old, diff(old, new)) == new, for arbitrary store pairs") {
    (1L to 10L).foreach { seed =>
      val (aRows, bRows) = sample(storePairGen, seed)
      def mk(rows: List[(Long, Float, String)]) =
        rows.map { case (i, f, m) => (i, Seq(f), Map("v" -> m)) }
          .toDF("id", "embedding", "metadata")
      val (old, neu) = (mk(aRows), mk(bRows))
      val d = Crud.diff(old, neu)
      // the log is MINIMAL: ids identical in both stores never appear
      val loggedIds = d.select("id").as[Long].collect().toSet
      val identical = aRows.toSet.intersect(bRows.toSet).map(_._1)
      assert(loggedIds.intersect(identical).isEmpty,
        s"seed=$seed: unchanged ids in the log: ${loggedIds.intersect(identical)}")
      // replay reproduces the new store exactly
      val got = Crud.merge(old, d.withColumn("seq", lit(1)))
        .select(col("id"), col("embedding"),
          try_element_at(col("metadata"), lit("v")).as("v"))
        .as[(Long, Seq[Float], String)].collect().sortBy(_._1).toSeq
      val want = bRows.map { case (i, f, m) => (i, Seq(f), m) }
      assert(got === want, s"seed=$seed")
    }
  }
}
