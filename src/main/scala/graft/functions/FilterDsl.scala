package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's metadata-filter DSL, compiled to a Catalyst `Column`
  * predicate instead of interpreted per row.
  *
  * Grammar (reference `src/types/filter.rs:29-61,120-141`):
  *   - empty string → match-all (`Filters::None`, `filter.rs:20-27`);
  *   - clauses joined by " AND " or " OR "; mixing both is an error
  *     (`filter.rs:43-46`);
  *   - each clause is `key op value`, split on the FIRST TWO spaces only
  *     (`splitn(3, ' ')`, `filter.rs:129-132`) so values may contain spaces;
  *   - ops: `=  !=  >  >=  <  <=  CONTAINS` (`filter.rs:156-164`).
  *
  * Value coercion (reference `src/types/record.rs:55-77`): number parse
  * first (priority over boolean, `record.rs:57-58`), then `true`/`false`
  * (case-sensitive), else text with leading/trailing quotes stripped.
  *
  * Comparison semantics (reference `src/types/filter.rs:75-117`):
  * strictly same-type; a missing key or a type mismatch yields `false`,
  * never an error. Text supports = != CONTAINS; Number supports
  * = != > >= < <=; Boolean supports = != only; anything else → false.
  *
  * Our metadata encoding is `map<string,string>` (SURVEY.md §1.1), so the
  * stored side is re-coerced with the same priority at comparison time via
  * a regex type gate + cast. Divergence (documented): a reference record
  * whose metadata was *typed* Text("3") would mismatch a numeric filter,
  * while our string encoding coerces "3" to Number — unobservable for data
  * produced by this engine, where values are stringified from typed columns.
  *
  * Compiling to a `Column` keeps the predicate inside whole-stage codegen
  * and lets Catalyst push it into the Parquet scan — at 100 TB the filter
  * runs in the scan, not in a post-hoc UDF.
  */
object FilterDsl {

  sealed trait Op
  object Op {
    case object Eq       extends Op
    case object Ne       extends Op
    case object Gt       extends Op
    case object Ge       extends Op
    case object Lt       extends Op
    case object Le       extends Op
    case object Contains extends Op
    def parse(s: String): Op = s match {
      case "="        => Eq
      case "!="       => Ne
      case ">"        => Gt
      case ">="       => Ge
      case "<"        => Lt
      case "<="       => Le
      case "CONTAINS" => Contains
      case other => throw new IllegalArgumentException(s"Invalid filter operator: $other")
    }
  }

  sealed trait Value
  object Value {
    final case class Num(v: Double)      extends Value
    final case class Bool(v: Boolean)    extends Value
    final case class Text(v: String)     extends Value

    /** Matches plain decimal floats accepted by BOTH Rust `f64::from_str`
      * and Spark/DuckDB string→double casts. (Rust additionally accepts
      * inf/nan spellings; excluded — see class doc.) */
    private[graft] val NumberRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$".r

    def coerce(raw: String): Value = {
      if (NumberRe.matches(raw)) Num(raw.toDouble)
      else if (raw == "true") Bool(true)
      else if (raw == "false") Bool(false)
      else {
        val isQuote = (c: Char) => c == '"' || c == '\''
        Text(raw.dropWhile(isQuote).reverse.dropWhile(isQuote).reverse)
      }
    }
  }

  final case class Clause(key: String, op: Op, value: Value)

  sealed trait Filters
  object Filters {
    case object MatchAll                      extends Filters
    final case class And(cs: Vector[Clause]) extends Filters
    final case class Or(cs: Vector[Clause])  extends Filters
  }

  /** Parse the DSL. Throws IllegalArgumentException on mixed AND/OR or a
    * malformed clause, mirroring the reference's invalid-argument Status. */
  def parse(s: String): Filters = {
    if (s.isEmpty) return Filters.MatchAll
    val OR = " OR "
    val AND = " AND "
    def count(hay: String, needle: String): Int =
      hay.sliding(needle.length).count(_ == needle)
    val orCount = count(s, OR)
    val andCount = count(s, AND)
    if (orCount > 0 && andCount > 0)
      throw new IllegalArgumentException("Mixing AND and OR join operators is not supported")
    val join = if (orCount > 0) OR else AND
    val clauses = s.split(java.util.regex.Pattern.quote(join), -1).toVector.map(parseClause)
    if (orCount > 0) Filters.Or(clauses) else Filters.And(clauses)
  }

  private def parseClause(s: String): Clause = {
    if (s.isEmpty) throw new IllegalArgumentException("Filter string cannot be empty")
    val parts = s.split(" ", 3).map(_.trim)
    if (parts.length < 3)
      throw new IllegalArgumentException(s"Invalid filter clause: $s")
    Clause(parts(0), Op.parse(parts(1)), Value.coerce(parts(2)))
  }

  // ---- compilation to Catalyst ----

  private def isNumber(c: Column): Column =
    c.rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$")

  private def isBool(c: Column): Column = c === "true" || c === "false"

  private def compileClause(metadata: Column, cl: Clause): Column = {
    // Missing key → null → `false` after the <=> coalesce below
    // (reference `filter.rs:76-79`).
    val raw = try_element_at(metadata, lit(cl.key))
    val pred: Column = cl.value match {
      case Value.Num(n) =>
        // stored side must ALSO coerce to Number (type gate before cast;
        // the gate guarantees the ANSI cast cannot fail).
        val stored = when(isNumber(raw), raw.cast("double"))
        cl.op match {
          case Op.Eq => stored === lit(n)
          case Op.Ne => stored =!= lit(n)
          case Op.Gt => stored > lit(n)
          case Op.Ge => stored >= lit(n)
          case Op.Lt => stored < lit(n)
          case Op.Le => stored <= lit(n)
          case Op.Contains => lit(false) // filter.rs:109 catch-all
        }
      case Value.Bool(b) =>
        val stored = when(!isNumber(raw) && isBool(raw), raw === "true")
        cl.op match {
          case Op.Eq => stored === lit(b)
          case Op.Ne => stored =!= lit(b)
          case _     => lit(false) // filter.rs:116 catch-all
        }
      case Value.Text(t) =>
        val stored = when(!isNumber(raw) && !isBool(raw), raw)
        cl.op match {
          case Op.Eq       => stored === lit(t)
          case Op.Ne       => stored =!= lit(t)
          case Op.Contains => stored.contains(lit(t))
          case _           => lit(false) // filter.rs:103 catch-all
        }
    }
    // null (missing key / type mismatch) must behave as false, not null,
    // so OR-chains still admit rows matched by other clauses.
    coalesce(pred, lit(false))
  }

  /** Compile a parsed filter against a `map<string,string>` metadata column. */
  def compile(metadata: Column, f: Filters): Column = f match {
    case Filters.MatchAll => lit(true)
    case Filters.And(cs)  => cs.map(compileClause(metadata, _)).reduce(_ && _)
    case Filters.Or(cs)   => cs.map(compileClause(metadata, _)).reduce(_ || _)
  }

  /** Parse + compile in one step. */
  def predicate(metadata: Column, dsl: String): Column =
    compile(metadata, parse(dsl))
}
