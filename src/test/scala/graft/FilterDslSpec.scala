package graft

import graft.functions.FilterDsl
import graft.functions.FilterDsl.{Clause, Filters, Op, Value}
import org.apache.spark.sql.functions._
/** Filter DSL goldens from the reference's own tests
  * (`/root/reference/src/types/filter.rs:175-249`,
  * `src/types/record.rs:55-77`). */
class FilterDslSpec extends SparkSpec {
  import spark.implicits._

  // --- parsing goldens (filter.rs:180-209) ---

  test("parse: name CONTAINS Ada → And([name CONTAINS Text(Ada)])") {
    assert(FilterDsl.parse("name CONTAINS Ada") ===
      Filters.And(Vector(Clause("name", Op.Contains, Value.Text("Ada")))))
  }

  test("parse: gpa >= 3.0 OR age < 21 → Or with Numbers") {
    assert(FilterDsl.parse("gpa >= 3.0 OR age < 21") === Filters.Or(Vector(
      Clause("gpa", Op.Ge, Value.Num(3.0)),
      Clause("age", Op.Lt, Value.Num(21.0)))))
  }

  test("parse: mixing AND and OR is an error (filter.rs:43-46)") {
    assertThrows[IllegalArgumentException](
      FilterDsl.parse("a = 1 AND b = 2 OR c = 3"))
  }

  test("parse: empty string is match-all (Filters::None)") {
    assert(FilterDsl.parse("") === Filters.MatchAll)
  }

  test("parse: value keeps spaces after the first two tokens (splitn(3))") {
    assert(FilterDsl.parse("text CONTAINS hello big world") ===
      Filters.And(Vector(Clause("text", Op.Contains, Value.Text("hello big world")))))
  }

  test("parse: invalid operator rejected") {
    assertThrows[IllegalArgumentException](FilterDsl.parse("a ~= 3"))
  }

  // --- coercion goldens (record.rs:55-77) ---

  test("coercion: number has priority, then boolean, then quote-stripped text") {
    assert(Value.coerce("3.5") === Value.Num(3.5))
    assert(Value.coerce("true") === Value.Bool(true))
    assert(Value.coerce("false") === Value.Bool(false))
    assert(Value.coerce("TRUE") === Value.Text("TRUE")) // bool parse is case-sensitive
    assert(Value.coerce("'Ada'") === Value.Text("Ada"))
    assert(Value.coerce("\"Ada\"") === Value.Text("Ada"))
    assert(Value.coerce("1") === Value.Num(1.0)) // number wins over anything
    assert(Value.coerce("1e3") === Value.Num(1000.0))
    assert(Value.coerce(".5") === Value.Num(0.5))
  }

  // --- apply goldens (filter.rs:211-231) over the reference's metadata ---

  private val aliceMeta = Map(
    "name" -> "Alice", "age" -> "20", "gpa" -> "3.5", "active" -> "true")

  private def applies(dsl: String, meta: Map[String, String] = aliceMeta): Boolean =
    Seq(meta).toDF("metadata")
      .select(FilterDsl.predicate(col("metadata"), dsl).as("p"))
      .head().getBoolean(0)

  test("apply goldens (filter.rs:211-231)") {
    assert(applies("name CONTAINS Alice"))
    assert(!applies("name = Bob"))
    assert(applies("age >= 20 AND gpa < 4.0"))
    assert(!applies("age >= 20 AND gpa < 3.0"))
    assert(applies("active = true"))
  }

  test("missing key → false (filter.rs:76-79)") {
    assert(!applies("nope = 1"))
    // ...even under OR where the other clause matches
    assert(applies("nope = 1 OR age >= 20"))
  }

  test("type mismatch → false (filter.rs:85)") {
    assert(!applies("name > 1"))       // Number filter vs Text value
    assert(!applies("age = true"))     // Boolean filter vs Number value
    assert(!applies("active CONTAINS tr")) // CONTAINS is Text-only
    assert(!applies("age CONTAINS 2")) // CONTAINS on Number → false
    assert(!applies("active > false")) // inequality on Boolean → false
  }

  test("empty DSL matches everything") {
    assert(applies(""))
  }

  test("property: number-parsable values never compare as text (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val d = (rnd.nextDouble() - 0.5) * 2e6
      Value.coerce(d.toString) match {
        case Value.Num(v) => assert(v === d)
        case other        => fail(s"$d coerced to $other")
      }
    }
  }

  test("property: parse is total on well-formed single clauses (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    val ops = Seq("=", "!=", ">", ">=", "<", "<=", "CONTAINS")
    (1 to 200).foreach { _ =>
      val k = "k" + rnd.alphanumeric.take(5).mkString
      val op = ops(rnd.nextInt(ops.length))
      val v = "v" + rnd.alphanumeric.take(5).mkString
      FilterDsl.parse(s"$k $op $v") match {
        case Filters.And(cs) =>
          assert(cs.head.key === k && cs.head.op === Op.parse(op))
        case other => fail(other.toString)
      }
    }
  }
}
