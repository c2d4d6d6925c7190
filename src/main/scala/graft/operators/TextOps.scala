package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, n-gram shingling, language ID, quality
  * scoring, and document fingerprinting.
  *
  * These extend the reference's surface (it has none of them) per the
  * north-star brief; every function is a pure Catalyst expression — no
  * UDFs — so at 100 TB each is a map-only pass inside whole-stage codegen,
  * and each is reproducible 1:1 in the DuckDB oracle.
  *
  * Hashing convention: md5 (identical bytes→hex semantics in Spark and
  * DuckDB) so fingerprints are cross-engine verifiable; the fastest
  * non-verifiable alternative (xxhash64) is a drop-in swap for production.
  */
object TextOps {

  /** Lowercased whitespace tokenization. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    * array column. Callers must pass an attribute (e.g. via
    * `.withColumn("__toks", tokens(...))`), not the `tokens(...)`
    * expression itself: higher-order functions are interpreted, so an
    * inlined split() child re-executes on every `element_at` call —
    * measured 5-10× slowdowns. (Guarded: Spark's `sequence(0, -1)` yields
    * a DESCENDING sequence, not an empty one, so short docs take the
    * empty-array branch explicitly.) */
  def shinglesFromTokens(t: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(t) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*))
    when(size(t) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** Convenience form for tests/small frames — see [[shinglesFromTokens]]
    * for why hot paths should materialize the token column first. */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tokens(text), n)

  /** Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")

  /** Tiny per-language stopword inventories for the n-gram/stopword
    * language-ID heuristic. Deterministic; argmax with fixed precedence. */
  val StopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "is", "in", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "les", "des"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "ren", "you", "wo"))

  /** Language ID: per-language stopword hit count over the token bag;
    * highest count wins, ties break by list order above; all-zero → "und"
    * (undetermined). A real pipeline swaps in char-n-gram models; the
    * Spark plumbing (map-side scoring, no shuffle) is identical. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    // hit count including repeats: filter + size
    def hits(words: Seq[String]): Column =
      size(filter(t, tok => words.map(w => tok === lit(w)).reduce(_ || _)))
    val scored = StopwordsByLang.map { case (lang, words) => (lang, hits(words)) }
    val best = scored.tail.foldLeft(
      struct(lit(scored.head._1).as("lang"), scored.head._2.as("n"))) {
      case (acc, (lang, n)) =>
        when(n > acc.getField("n"), struct(lit(lang).as("lang"), n.as("n")))
          .otherwise(acc)
    }
    when(best.getField("n") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality score in [0,1]: linear blend of stopword ratio, mean token
    * length, and punctuation ratio, clamped. Deterministic arithmetic —
    * the shape of real quality classifiers, oracle-checkable. */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val nChars = length(text).cast("double")
    val punct = length(regexp_replace(lower(text), "[a-z0-9\\s]", "")).cast("double")
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val allStop = array(StopwordsByLang.flatMap(_._2).distinct.map(lit): _*)
    val stopHits = size(filter(t, tok => array_contains(allStop, tok))).cast("double")
    val stopRatio = when(nTok > 0, stopHits / nTok).otherwise(lit(0.0))
    val avgTokLen = when(nTok > 0,
      aggregate(t, lit(0.0), (acc, x) => acc + length(x).cast("double")) / nTok)
      .otherwise(lit(0.0))
    val raw = lit(0.2) + lit(0.5) * stopRatio + lit(0.05) * avgTokLen - punctRatio
    least(lit(1.0), greatest(lit(0.0), raw))
  }

  /** Rolling-hash document fingerprint: md5 over every `window`-char
    * sliding window, keep the lexicographic minimum (winnowing-style
    * content fingerprint — robust to local edits, unlike whole-doc md5). */
  def fingerprint(text: Column, window: Int = 8): Column =
    array_min(
      transform(
        sequence(lit(1), greatest(length(text) - (window - 1), lit(1))),
        i => md5(text.substr(i, lit(window)))))
}
