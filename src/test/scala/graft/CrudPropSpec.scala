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
}
