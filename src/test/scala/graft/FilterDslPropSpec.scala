package graft

import graft.functions.FilterDsl
import graft.functions.FilterDsl.{Clause, Filters, Op, Value}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property tests for the filter DSL (SURVEY.md §5): the compiled Catalyst
  * predicate must agree with an INDEPENDENT reference evaluator of the
  * documented semantics (coercion priority, strict same-type comparison,
  * missing-key/type-mismatch → false) on generated filters × metadata
  * maps. Deterministic: ScalaCheck generators driven by fixed seeds. */
class FilterDslPropSpec extends SparkSpec {
  import spark.implicits._

  // --- reference evaluator (straight from reference semantics,
  //     src/types/filter.rs:75-117 + record.rs:55-77) -------------------

  private def evalClause(meta: Map[String, String], cl: Clause): Boolean =
    meta.get(cl.key) match {
      case None => false // missing key (filter.rs:76-79)
      case Some(rawStored) =>
        (Value.coerce(rawStored), cl.value) match {
          case (Value.Num(a), Value.Num(b)) => cl.op match {
            case Op.Eq => a == b
            case Op.Ne => a != b
            case Op.Gt => a > b
            case Op.Ge => a >= b
            case Op.Lt => a < b
            case Op.Le => a <= b
            case Op.Contains => false // filter.rs:109
          }
          case (Value.Bool(a), Value.Bool(b)) => cl.op match {
            case Op.Eq => a == b
            case Op.Ne => a != b
            case _ => false // filter.rs:116
          }
          case (Value.Text(a), Value.Text(b)) => cl.op match {
            case Op.Eq => a == b
            case Op.Ne => a != b
            case Op.Contains => a.contains(b)
            case _ => false // filter.rs:103
          }
          case _ => false // type mismatch (filter.rs:85)
        }
    }

  private def evalFilters(meta: Map[String, String], f: Filters): Boolean = f match {
    case Filters.MatchAll => true
    case Filters.And(cs)  => cs.forall(evalClause(meta, _))
    case Filters.Or(cs)   => cs.exists(evalClause(meta, _))
  }

  // --- generators -------------------------------------------------------

  private val keys = Gen.oneOf("label", "lang", "score", "flag", "absent_key")
  private val rawValues = Gen.oneOf(
    "3", "3.5", "-2", "1e2", "0.5", ".5", "+7", // numbers
    "true", "false",                            // booleans
    "en", "fr", "hello world", "truthy", "3a",  // texts (quote-free stored)
    "'fr'", "\"quoted text\"")                  // quoted (filter side strips)
  private val ops = Gen.oneOf("=", "!=", ">", ">=", "<", "<=", "CONTAINS")

  private val clause: Gen[String] = for {
    k <- keys; o <- ops; v <- rawValues
  } yield s"$k $o $v"

  private val dsl: Gen[String] = for {
    n <- Gen.choose(1, 4)
    cs <- Gen.listOfN(n, clause)
    joiner <- Gen.oneOf(" AND ", " OR ")
  } yield cs.mkString(joiner)

  private val storedValues = Gen.oneOf(
    "3", "3.5", "-2", "1e2", "100.0", "true", "false", "en", "fr",
    "hello world", "truthy", "3a")
  private val metaMap: Gen[Map[String, String]] = for {
    ks <- Gen.someOf("label", "lang", "score", "flag")
    vs <- Gen.listOfN(ks.size, storedValues)
  } yield ks.toList.zip(vs).toMap

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, rng.Seed(seed)).get

  // --- properties -------------------------------------------------------

  test("compiled predicate == reference evaluator over generated filters × maps") {
    val maps = (0 until 40).map(i => sample(metaMap, 1000 + i))
    val df = maps.zipWithIndex.map { case (m, i) => (i.toLong, m) }
      .toDF("row_id", "metadata").cache()
    var checked = 0
    (0 until 30).foreach { i =>
      val s = sample(dsl, 2000 + i)
      val parsed = FilterDsl.parse(s)
      val expected = maps.zipWithIndex.collect {
        case (m, idx) if evalFilters(m, parsed) => idx.toLong
      }.toSet
      val got = df.where(FilterDsl.predicate(col("metadata"), s))
        .select("row_id").as[Long].collect().toSet
      assert(got === expected, s"dsl: <$s>")
      checked += 1
    }
    assert(checked === 30)
  }

  test("mixing AND and OR always rejects (property)") {
    (0 until 20).foreach { i =>
      val a = sample(clause, 3000 + i)
      val b = sample(clause, 4000 + i)
      val c = sample(clause, 5000 + i)
      assertThrows[IllegalArgumentException](FilterDsl.parse(s"$a AND $b OR $c"))
      assertThrows[IllegalArgumentException](FilterDsl.parse(s"$a OR $b AND $c"))
    }
  }

  test("splitn(3) property: values keep their spaces, keys/ops never do") {
    (0 until 20).foreach { i =>
      val tail = sample(Gen.listOfN(3, Gen.alphaStr.suchThat(_.nonEmpty)), 6000 + i)
        .mkString(" ")
      val parsed = FilterDsl.parse(s"k CONTAINS $tail")
      parsed match {
        case Filters.And(Vector(Clause("k", Op.Contains, Value.Text(v)))) =>
          assert(v === tail)
        case other => fail(s"unexpected parse: $other")
      }
    }
  }
}
