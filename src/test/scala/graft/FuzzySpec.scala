package graft

import graft.functions.NativeExprs
import graft.operators.Fuzzy
import org.apache.spark.sql.functions._

/** The fuzzy-match stack: the capped byte-level edit-distance kernel
  * (fuzzed against an uncapped full-DP reference and pinned to
  * DuckDB-probed golden values — the oracle's `levenshtein` is the
  * contract), the deletion-neighborhood generator, the SymSpell blocking
  * completeness property, and matchPairs against the brute-force
  * quadratic truth. */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  // --- reference: uncapped full-DP byte Levenshtein ---------------------

  private def refEd(a: Array[Byte], b: Array[Byte]): Int = {
    val m = a.length; val n = b.length
    val d = Array.ofDim[Int](m + 1, n + 1)
    for (i <- 0 to m) d(i)(0) = i
    for (j <- 0 to n) d(0)(j) = j
    for (i <- 1 to m; j <- 1 to n)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(m)(n)
  }
  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  // --- kernel: golden values probed against DuckDB levenshtein ----------

  test("editDistanceCapped matches DuckDB byte-level levenshtein goldens") {
    // (a, b, DuckDB levenshtein(a, b)) — probed 2026-08-15; byte
    // semantics: multibyte characters count per-byte.
    val golden = Seq(
      ("kitten", "sitting", 3), ("café", "cafe", 2), ("a😀b", "ab", 4),
      ("", "ab", 2), ("abc", "abc", 0), ("", "", 0),
      ("Customer#000000012", "Customer#000000013", 1),
      ("flaw", "lawn", 2), ("résumé", "resume", 4), ("Ünïcode", "Unicode", 4),
      ("ab", "ba", 2), ("abcdefgh", "abcdxfgh", 1), ("x", "xyzzy", 4))
    for ((a, b, want) <- golden) {
      assert(NativeExprs.editDistanceCapped(bytes(a), bytes(b), 10) === want,
        s"($a, $b)")
      assert(NativeExprs.editDistanceCapped(bytes(b), bytes(a), 10) === want,
        s"symmetry ($b, $a)")
    }
  }

  test("editDistanceCapped == min(full DP, cap+1) on fuzzed inputs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdeé#01😀"
    def randStr(): String =
      Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 0 until 2000) {
      val a = randStr(); val b = randStr(); val cap = rnd.nextInt(5)
      val want = math.min(refEd(bytes(a), bytes(b)), cap + 1)
      val got = NativeExprs.editDistanceCapped(bytes(a), bytes(b), cap)
      assert(got === want, s"a=$a b=$b cap=$cap")
    }
  }

  test("byteEditDistance expression propagates NULL") {
    val df = Seq((Some("ab"), Some("ac")), (None, Some("x")), (Some("x"), None))
      .toDF("a", "b")
      .select(NativeExprs.byteEditDistance(col("a"), col("b"), 2).as("d"))
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
      === Seq(1, null, null))
  }

  // --- deletion variants -------------------------------------------------

  private def vars(s: String, maxDel: Int, prefixLen: Int = 24): Seq[String] =
    Seq(Some(s)).toDF("s")
      .select(NativeExprs.deletionVariants(col("s"), maxDel, prefixLen).as("v"))
      .collect()(0).getSeq[String](0)

  test("deletionVariants: exact set for a small string") {
    assert(vars("abc", 1) === Seq("ab", "abc", "ac", "bc"))
    assert(vars("abc", 2).toSet ===
      Set("abc", "ab", "ac", "bc", "a", "b", "c"))
    assert(vars("", 2) === Seq(""))
    assert(vars("aa", 1) === Seq("a", "aa")) // duplicates collapse
  }

  test("deletionVariants: sorted, distinct, codepoint-deletions, prefix cap") {
    val v = vars("caféx", 2)
    assert(v === v.sorted && v.distinct === v)
    assert(v.contains("cafx") && v.contains("café") && v.contains("caf"))
    // prefix cap: keys come from the first prefixLen codepoints only
    assert(vars("abcdef", 1, prefixLen = 3) === Seq("ab", "abc", "ac", "bc"))
  }

  test("blocking completeness: pairs within byte distance 2 share a variant") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdé0"
    def randStr(n: Int): String =
      Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    def mutate(s: String): String = {
      val cps = s.toSeq.map(_.toString)
      rnd.nextInt(3) match {
        case 0 if cps.nonEmpty => // delete a codepoint
          val i = rnd.nextInt(cps.size); (cps.take(i) ++ cps.drop(i + 1)).mkString
        case 1 => // insert an ASCII char
          val i = rnd.nextInt(cps.size + 1)
          (cps.take(i) ++ Seq("x") ++ cps.drop(i)).mkString
        case _ if cps.nonEmpty => // substitute
          val i = rnd.nextInt(cps.size); cps.updated(i, "z").mkString
        case _ => s + "z"
      }
    }
    for (_ <- 0 until 300) {
      val a = randStr(3 + rnd.nextInt(15))
      var b = a
      val edits = 1 + rnd.nextInt(2)
      for (_ <- 0 until edits) b = mutate(b)
      val d = NativeExprs.editDistanceCapped(bytes(a), bytes(b), 2)
      if (d <= 2) // a codepoint edit on 'é' can cost more than 2 bytes
        assert(vars(a, 2).toSet.intersect(vars(b, 2).toSet).nonEmpty,
          s"no shared key: a=$a b=$b d=$d")
    }
  }

  // --- matchPairs vs brute force -----------------------------------------

  test("matchPairs equals the brute-force quadratic truth") {
    val names = Seq(
      (1L, "Customer#01"), (2L, "Customer#02"), (3L, "Custoner#01"),
      (4L, "Customer#01"), // exact duplicate of 1 → dist 0
      (5L, "Wholly Different Name"), (6L, null),
      (7L, "Customér#01"), // é: 2-byte substitution of 'e' → dist 2 to #1
      (8L, "Cstomer#01"), (9L, "xCustomer#01z")) // del-1 / dist-2 shapes
    val df = names.toDF("id", "s")
    val got = Fuzzy.matchPairs(df, maxDist = 2, prefixLen = 24)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    val base = names.filter(_._2 != null)
    val want = (for {
      (ia, sa) <- base; (ib, sb) <- base if ia < ib
      d = NativeExprs.editDistanceCapped(bytes(sa), bytes(sb), 2) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(want.exists(_._3 == 0) && want.exists(_._3 == 1) && want.exists(_._3 == 2))
    assert(got === want)
  }

  test("matchPairs maxBucket: hot deletion keys drop; cool pairs survive") {
    // 40 copies of one viral name (every variant-bucket of it has size
    // ≥ 40) plus one cool near-pair that shares no key with the flood
    val viral = (0L until 40L).map(i => (i, "Viral Boilerplate Co"))
    val cool = Seq((100L, "Quiet Name"), (101L, "Quiet Namq"))
    val df = (viral ++ cool).toDF("id", "s")
    val capped = Fuzzy.matchPairs(df, maxDist = 1, maxBucket = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped === Set((100L, 101L)),
      "the viral family must drop under the cap; the cool pair must survive")
    val uncapped = Fuzzy.matchPairs(df, maxDist = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size === 40 * 39 / 2 + 1, "uncapped keeps the full quadratic family")
  }
}
