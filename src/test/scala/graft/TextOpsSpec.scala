package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](text: String, c: org.apache.spark.sql.Column): T =
    Seq(Tuple1(text)).toDF("text").select(c.as("r")).head().getAs[T]("r")

  test("tokens: lowercased whitespace split") {
    assert(one[Seq[String]]("  The Quick  brown\tFox ", TextOps.tokens(col("text")))
      === Seq("the", "quick", "brown", "fox"))
  }

  test("token count") {
    assert(one[Int]("a b c", TextOps.tokenCount(col("text"))) === 3)
  }

  test("shingles: 3-grams, space-joined, multiset (duplicates kept)") {
    assert(one[Seq[String]]("a b c d", TextOps.shingles(col("text"), 3))
      === Seq("a b c", "b c d"))
    // repeated trigram stays — set semantics live on the hash level
    assert(one[Seq[String]]("a b a b a b", TextOps.shingles(col("text"), 3))
      === Seq("a b a", "b a b", "a b a", "b a b"))
  }

  test("shingleHashes: distinct shingles → distinct longs; jaccard matches strings") {
    val df = Seq((Seq("a b c", "b c d", "a b c"), Seq("b c d", "x y z")))
      .toDF("x", "y")
    val j = df.select(
      TextOps.jaccard(TextOps.shingleHashes(col("x")), TextOps.shingleHashes(col("y"))).as("j"))
      .head().getDouble(0)
    assert(j === 1.0 / 3.0) // |{bcd}| / |{abc,bcd,xyz}| — dup "a b c" collapses
  }

  test("shingles of a too-short doc are EMPTY (sequence(0,-1) regression)") {
    assert(one[Seq[String]]("a b", TextOps.shingles(col("text"), 3)) === Seq())
    assert(one[Seq[String]]("a", TextOps.shingles(col("text"), 3)) === Seq())
  }

  test("jaccard golden") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(TextOps.jaccard(col("x"), col("y")).as("j")).head().getDouble(0)
    assert(j === 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("langId: stopword-dominant language wins; no hits → und") {
    assert(one[String]("the cat of the house is big", TextOps.langId(col("text"))) === "en")
    assert(one[String]("el que la y un es", TextOps.langId(col("text"))) === "es")
    assert(one[String]("zzz qqq xxx", TextOps.langId(col("text"))) === "und")
  }

  test("langFromVotes: first-max-wins tie order, all-zero and NULL → und " +
    "(the r14 argmax rewrite pins the r13 fold's exact semantics)") {
    // the r13 foldLeft replaced the leader only on a STRICT improvement,
    // so a tie keeps the earlier StopwordsByLang entry; the r14
    // array_max + first-index form must reproduce that total order on
    // every vote shape, including the degenerate ones
    val langs = TextOps.StopwordsByLang.map(_._1) // en, es, fr, de, zh
    def lang(votes: Seq[Int]): String =
      Seq(Tuple1(votes)).toDF("v")
        .select(TextOps.langFromVotes(col("v")).as("l")).head().getString(0)
    assert(lang(Seq(2, 2, 1, 0, 0)) === "en")   // en/es tie → earlier (en)
    assert(lang(Seq(1, 3, 3, 3, 0)) === "es")   // 3-way tie → earliest (es)
    assert(lang(Seq(0, 0, 0, 0, 5)) === "zh")   // unique max anywhere
    assert(lang(Seq(0, 0, 0, 0, 0)) === "und")  // all-zero
    val nullLang = Seq(Tuple1(Option.empty[Seq[Int]])).toDF("v")
      .select(TextOps.langFromVotes(col("v")).as("l")).head().getString(0)
    assert(nullLang === "und") // NULL votes
    // exhaustive one-hot sanity: position i wins as langs(i)
    langs.indices.foreach { i =>
      val v = Seq.fill(langs.size)(0).updated(i, 1)
      assert(lang(v) === langs(i), s"one-hot $i")
    }
  }

  test("quality score is clamped to [0,1] and deterministic") {
    val s1 = one[Double]("the cat and the dog in the house", TextOps.qualityScore(col("text")))
    val s2 = one[Double]("the cat and the dog in the house", TextOps.qualityScore(col("text")))
    assert(s1 === s2)
    assert(s1 >= 0.0 && s1 <= 1.0)
    assert(one[Double]("!!! ??? ### $$$", TextOps.qualityScore(col("text"))) === 0.0)
  }

  test("fingerprint: deterministic, robust to a distant edit") {
    val a = one[String]("abcdefghijklmnop the stable prefix zone", TextOps.fingerprint(col("text")))
    val b = one[String]("abcdefghijklmnop the stable prefix zone", TextOps.fingerprint(col("text")))
    assert(a === b && a.length === 32)
  }

  test("scrubPii replaces emails, phones, IPv4s; leaves clean text alone") {
    val got = one[String](
      "write a.b+c@ex-mail.org or call +44 (0) 7700-900123, host 192.168.0.1 ok",
      TextOps.scrubPii(col("text")))
    assert(got === "write <EMAIL> or call <PHONE>, host <IP> ok")
    val clean = "no pii here just words and the number 42"
    assert(one[String](clean, TextOps.scrubPii(col("text"))) === clean)
  }

  test("repetitionStats matches the brute-force multiset twin, incl. edge cases") {
    import spark.implicits._
    val texts = Seq(
      "spam spam spam spam",                 // one token dominates, all 2-grams dup
      "a b c d e f",                         // no repetition at all
      "the cat sat on the mat the cat sat",  // partial phrase repeats
      "x",                                   // single token: no n-grams
      "a b a b a b a b")                     // alternating: heavy 2-gram dup
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("r", TextOps.repetitionStats(TextOps.tokens(col("text"))))
      .select($"doc_id", $"r.top_token_frac", $"r.dup_2gram_frac", $"r.dup_3gram_frac")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    texts.zipWithIndex.foreach { case (t, i) =>
      val tk = t.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        .trim.split("\\s+").toSeq
      def grams(n: Int) = if (tk.size < n) Seq.empty
        else tk.sliding(n).map(_.mkString(" ")).toSeq
      def dupFrac(g: Seq[String]) =
        if (g.isEmpty) 0.0 else (g.size - g.distinct.size).toDouble / g.size
      val topFrac = tk.groupBy(identity).values.map(_.size).max.toDouble / tk.size
      val (_, gTop, g2, g3) = got(i)
      assert(math.abs(gTop - topFrac) < 1e-9, s"doc $i top: $gTop vs $topFrac")
      assert(math.abs(g2 - dupFrac(grams(2))) < 1e-9, s"doc $i 2gram")
      assert(math.abs(g3 - dupFrac(grams(3))) < 1e-9, s"doc $i 3gram")
    }
  }

  test("bm25: non-matching docs absent, rare+frequent terms outrank " +
    "common-only, scores positive") {
    import spark.implicits._
    val docsDf = Seq(
      (1L, "apple banana banana"),       // rare apple + banana twice
      (2L, "banana cherry cherry cherry"), // common banana once
      (3L, "nothing relevant here"))     // no query term
      .toDF("doc_id", "text")
    val got = TextOps.bm25(docsDf, col("text"), Seq("apple", "banana"))
      .as[(Long, Double)].collect().sortBy(_._1).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got.values.forall(_ > 0))
    assert(got(1L) > got(2L),
      s"doc with the rare term must outrank: ${got(1L)} vs ${got(2L)}")
  }

  test("bm25: the r14 one-aggregate idf pass equals the explicit " +
    "per-term df computation (hand-derived idfs, positional order)") {
    // the r13 form derived per-term df by posexplode → groupBy(pos);
    // the r14 form computes |terms| fixed conditional sums in one
    // constant-width aggregate. Pin the scores against idfs derived by
    // hand from the same df counts so a positional mix-up (term i
    // getting term j's df) cannot survive.
    import spark.implicits._
    val docsDf = Seq(
      (1L, "apple banana banana"),
      (2L, "banana cherry cherry cherry"),
      (3L, "banana banana apple apple apple"))
      .toDF("doc_id", "text")
    val terms = Seq("apple", "banana", "cherry") // df: 2, 3, 1 over N=3
    val got = TextOps.bm25(docsDf, col("text"), terms)
      .as[(Long, Double)].collect().toMap
    val k1 = 1.2; val b = 0.75
    val n = 3.0; val dfs = Map("apple" -> 2.0, "banana" -> 3.0, "cherry" -> 1.0)
    val avgdl = (3 + 4 + 5) / 3.0
    def idf(t: String) = math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
    def contrib(t: String, tf: Double, dl: Double) =
      idf(t) * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    val exp = Map(
      1L -> (contrib("apple", 1, 3) + contrib("banana", 2, 3)),
      2L -> (contrib("banana", 1, 4) + contrib("cherry", 3, 4)),
      3L -> (contrib("apple", 3, 5) + contrib("banana", 2, 5)))
    exp.foreach { case (id, e) =>
      assert(math.abs(got(id) - e) < 1e-12, s"doc $id: ${got(id)} vs $e")
    }
  }

  test("charLmScore: corpus-typical text outranks gibberish; all-unseen doc sits at the floor") {
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick red fox runs over the lazy cat"),
      (3L, "a quick brown dog jumps over the lazy fox")).toDF("doc_id", "text")
    val model = TextOps.charLmModel(ref, col("text"))
    val probe = Seq(
      (10L, "the quick brown fox"),
      (11L, "zxv vwk wkz")) // every trigram absent from the reference
      .toDF("doc_id", "text")
    val got = TextOps.charLmScore(probe, model, col("text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(10L) > got(11L),
      s"familiar text must outrank gibberish: ${got(10L)} vs ${got(11L)}")
    val (n, v) = model.select(col("__n"), col("__v"))
      .as[(Long, Long)].head()
    assert(math.abs(got(11L) - math.log(1.0 / (n + v))) < 1e-12,
      s"all-unseen doc must sit exactly at the smoothing floor")
    // the fused kernel agrees with the explode+join formulation up to
    // float regrouping, including the unseen floor and short-doc absence
    val withShort = probe.unionByName(Seq((12L, "ab")).toDF("doc_id", "text"))
    val fused = TextOps.charLmScoreFused(withShort, model, col("text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val joined = TextOps.charLmScore(withShort, model, col("text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fused.keySet === joined.keySet && !fused.keySet.contains(12L))
    fused.foreach { case (id, (nt, s)) =>
      assert(nt === joined(id)._1)
      assert(math.abs(s - joined(id)._2) <= 1e-12 * math.max(1.0, math.abs(s)),
        s"doc $id: fused $s vs joined ${joined(id)._2}")
    }
  }

  test("bpeMergePairs: tf-weighted adjacent pair counts, duplicates within a token kept") {
    val docs = Seq(
      (1L, "aaa ab aaa x"),
      (2L, "ab cd x")).toDF("doc_id", "text")
    // vocab: aaa×2, ab×2, cd×1 (x is single-char → no pairs)
    // pairs: aa appears twice inside "aaa" → 2·tf(aaa)=4; ab → 2; cd → 1
    val got = TextOps.bpeMergePairs(docs, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("aa", 4L), ("ab", 2L), ("cd", 1L)))
    // ties break on pair ascending
    val tied = Seq((1L, "xy zw")).toDF("doc_id", "text")
    assert(TextOps.bpeMergePairs(tied, k = 10).as[(String, Long)].collect().toSeq
      === Seq(("xy", 1L), ("zw", 1L)))
  }

  /** Canonical symbol-level BPE apply (merge-all-occurrences leftmost,
    * rescan until none, per rank) — the independent reference the
    * string-replace kernel must equal; mirrors the oracle's recursive
    * CTE at the symbol level rather than the char level. */
  private def bpeRef(tok: String, merges: Seq[(String, String)]): String = {
    var syms = tok.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toSeq
    for ((a, b) <- merges) {
      var changed = true
      while (changed) {
        changed = false
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2; changed = true
          } else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
    }
    syms.mkString(" ")
  }

  test("bpeApply: pinned goldens incl. merge chains, rescan, and unicode") {
    def ap(t: String): String = one[String](t, TextOps.bpeApply(col("text")))
    assert(ap("the") === "the")          // t+h → th, th+e → the
    assert(ap("thththe") === "th th the") // leftmost chains collapse fully
    assert(ap("anding") === "and ing")   // an+d and in+g both fire
    assert(ap("xthey") === "x the y")    // merge inside a longer token
    assert(ap("aaa") === "a a a")        // no (a,a) merge in the list
    assert(ap("sort") === "s o r t")     // s,t not adjacent → untouched
    assert(ap("héllo") === "h é l l o")  // non-ASCII symbols pass through
    assert(ap("a𝄞b") === "a 𝄞 b") // supplementary plane
  }

  test("bpeApply: replace-fixpoint kernel == canonical symbol-level apply (fuzz)") {
    val rnd = new scala.util.Random(20260813L)
    val alpha = "theandingoust" // letters the merge list is dense over
    val toks = (1 to 300).map { _ =>
      val n = 1 + rnd.nextInt(12)
      (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    } :+ "ththth" :+ "ananan" :+ "ededed" :+ "inging"
    val got = toks.toDF("text").select(col("text"), TextOps.bpeApply(col("text")).as("seg"))
      .as[(String, String)].collect()
    for ((t, seg) <- got)
      assert(seg === bpeRef(t, TextOps.BpeMerges), s"token '$t'")
  }

  test("charDiversity: pinned counts incl. supplementary plane; == explode twin") {
    val docs = Seq((1L, "aab"), (2L, "😀😀😀"), (3L, "abcabc"), (4L, ""),
      (5L, "a𝄞a𝄞b")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), TextOps.charDiversity(col("text")).as("cd"))
      .select(col("doc_id"), col("cd.n_cp"), col("cd.n_distinct"),
        col("cd.sum_sq"), col("cd.max_n"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 3L, 2L, 5L, 2L),   // aa b → 2²+1²
      (2L, 3L, 1L, 9L, 3L),   // three identical CODE POINTS, not 6 chars
      (3L, 6L, 3L, 12L, 2L),
      (4L, 0L, 0L, 0L, 0L),
      (5L, 5L, 3L, 9L, 2L)))  // a×2, 𝄞×2, b×1
    // fuzz: kernel == the explode/groupBy formulation the oracle mirrors
    val fuzz = docStringsForDiversity.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val twin = fuzz.where(length(col("text")) > 0)
      .select(col("doc_id"), explode(TextOps.charNgrams(col("text"), 1)).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(sum(col("n")).as("n_cp"),
        count(lit(1)).as("n_distinct"),
        sum(col("n") * col("n")).as("sum_sq"), max(col("n")).as("max_n"))
    val kd = fuzz.select(col("doc_id"), TextOps.charDiversity(col("text")).as("cd"))
      .where(col("cd.n_cp") > 0)
      .select(col("doc_id"), col("cd.n_cp").as("n_cp"),
        col("cd.n_distinct").as("n_distinct"), col("cd.sum_sq").as("sum_sq"),
        col("cd.max_n").as("max_n"))
    assert(kd.except(twin).count() === 0 && twin.except(kd).count() === 0)
  }

  private lazy val docStringsForDiversity: Seq[String] = {
    val rnd = new scala.util.Random(99)
    // whole code points (no lone surrogates): BMP + supplementary mix
    val chars = Seq("a", "b", "c", "d", "e", "é", "😀", "𝄞", " ", "\t", "\n")
    (1 to 60).map(_ => (0 until rnd.nextInt(40))
      .map(_ => chars(rnd.nextInt(chars.length))).mkString)
  }

  test("bpeSegmentations / bpeFertility: vocab-level shapes") {
    val docs = Seq(
      (1L, "src0", "the the thing"),
      (2L, "src1", "sort the band")).toDF("doc_id", "source", "text")
    val seg = TextOps.bpeSegmentations(docs, k = 10)
      .as[(String, Long, String, Long)].collect().toSeq
    // tf order: the×3 first; ties (band, sort, thing ×1) break on token asc
    assert(seg === Seq(
      ("the", 3L, "the", 1L),
      ("band", 1L, "b and", 2L),
      ("sort", 1L, "s o r t", 4L),
      ("thing", 1L, "th ing", 2L)))
    val fert = TextOps.bpeFertility(docs)
      .orderBy("source").as[(String, Long, Long)].collect().toSeq
    // src0: the(1)+the(1)+thing(2)=4 subwords / 3 words
    // src1: sort(4)+the(1)+band(2)=7 subwords / 3 words
    assert(fert === Seq(("src0", 3L, 4L), ("src1", 3L, 7L)))
  }

  test("bpeTrain: hand-computed merge sequence on a tiny corpus") {
    // vocab: low×5, lowest×2, newest×6, widest×3 (the Sennrich running
    // example's shape). Initial pair counts:
    //   (l,o) 7, (o,w) 7, (e,s) 11, (s,t) 11, (w,e) 8(lowest2+newest6),
    //   (n,e) 6, (e,w) 6, (w,i) 3, (i,d) 3, (d,e) 3
    // step 1: tie (e,s)=(s,t)=11 → lexicographically smaller pair (e,s)
    // step 2: (es,t) 11
    // step 3: (w,est) 8 — lowest(2)+newest(6); (l,o)/(o,w) 7 lose
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lowest") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextOps.bpeTrain(docs, nMerges = 3, vocabCap = 100)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1, "e", "s", 11L),
      (2, "es", "t", 11L),
      (3, "w", "est", 8L)))
  }

  test("bpeTrain: merge frequencies are non-increasing and operands self-consistent") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the fox"),
      (2L, "pack my box with five dozen liquor jugs for the win"),
      (3L, "how vexingly quick daft zebras jump the quiz")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(docs, nMerges = 10, vocabCap = 100)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(merges.size === 10)
    // each merge's count can never exceed an earlier one (merging only
    // removes or preserves pair mass)
    merges.sliding(2).foreach { case Seq(a, b) =>
      assert(b._4 <= a._4, s"freq increased: $a -> $b")
    }
    // self-consistency: every operand is a single char or the product of
    // a strictly earlier merge — the bpeApply rank-order contract
    val products = scala.collection.mutable.Set.empty[String]
    merges.foreach { case (_, l, r, _) =>
      Seq(l, r).foreach { sym =>
        assert(sym.length == 1 || products.contains(sym),
          s"operand '$sym' is neither a char nor an earlier product")
      }
      products += l + r
    }
  }

  test("tfidfTopK: hand-computed scores, ubiquitous terms score zero, " +
    "k cuts per doc, token tiebreak") {
    // 4 docs; "common" in all (idf 0), "rare" only in doc 1
    val docs = Seq(
      (1L, "common rare rare alpha"),
      (2L, "common alpha beta"),
      (3L, "common beta"),
      (4L, "common")).toDF("doc_id", "text")
    val got = TextOps.tfidfTopK(docs, k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, Int, String, Long, Double)].collect().toSeq
    val ln2 = math.log(4.0 / 1.0) // rare: df 1
    val lnA = math.log(4.0 / 2.0) // alpha/beta: df 2
    // doc 1: rare tf=2 score 2·ln4 ; alpha ln2 ; common 0 (cut by k=2)
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(t => (t._2, t._3, t._4)) === Seq((1, "rare", 2L), (2, "alpha", 1L)))
    assert(math.abs(d1.head._5 - 2 * ln2) < 1e-9)
    // doc 2: alpha and beta tie exactly (same tf, same df) -> token asc
    val d2 = got.filter(_._1 == 2L)
    assert(d2.map(t => (t._2, t._3)) === Seq((1, "alpha"), (2, "beta")))
    assert(math.abs(d2.head._5 - lnA) < 1e-9)
    // doc 4: only the ubiquitous term -> one row, score exactly 0
    val d4 = got.filter(_._1 == 4L)
    assert(d4 === Seq((4L, 1, "common", 1L, 0.0)))
  }

  test("gopherFlags: each rule trips on its designed violation") {
    // a passing document: >=50 words of ordinary English shape with at
    // least two distinct Gopher stopwords
    val good = (("the cat sat with a dog and that was fine to see " * 5)
      + "be quick today").trim
    // rule violators, one per rule
    val fewWords = "the of short"                                  // ok_words
    val longWords = Array.fill(60)("pneumonoultramicroscopicx").mkString(" ") +
      " the of"                                                    // ok_mean_len
    val symbolic = ("the of " + Array.fill(60)("now... #tag word").mkString(" ")) // ok_symbol
    val bullets = (1 to 20).map(i => s"- the item $i of").mkString("\n") // ok_bullet
    val ellipses = (1 to 20).map(i => s"the line $i of trails...").mkString("\n") // ok_ellipsis
    val numeric = "the of " + Array.fill(60)("12345 67890").mkString(" ") // ok_alpha
    val noStops = Array.fill(60)("word token item").mkString(" ")  // ok_stop
    val docs = Seq(
      (0L, good), (1L, fewWords), (2L, longWords), (3L, symbolic),
      (4L, bullets), (5L, ellipses), (6L, numeric), (7L, noStops))
      .toDF("doc_id", "text")
    val got = docs
      .withColumn("__t", TextOps.tokens(col("text")))
      .select(col("doc_id"), TextOps.gopherFlags(col("text"), col("__t")).as("g"))
      .select(col("doc_id"), col("g.ok_words"), col("g.ok_mean_len"),
        col("g.ok_symbol"), col("g.ok_bullet"), col("g.ok_ellipsis"),
        col("g.ok_alpha"), col("g.ok_stop"), col("g.pass"))
      .orderBy("doc_id")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(0L)._9, s"good doc should pass: ${byId(0L)}")
    assert(!byId(1L)._2 && !byId(1L)._9, "fewWords must fail ok_words")
    assert(!byId(2L)._3 && !byId(2L)._9, "longWords must fail ok_mean_len")
    assert(!byId(3L)._4 && !byId(3L)._9, "symbolic must fail ok_symbol")
    assert(!byId(4L)._5 && !byId(4L)._9, "bullets must fail ok_bullet")
    assert(!byId(5L)._6 && !byId(5L)._9, "ellipses must fail ok_ellipsis")
    assert(!byId(6L)._7 && !byId(6L)._9, "numeric must fail ok_alpha")
    assert(!byId(7L)._8 && !byId(7L)._9, "noStops must fail ok_stop")
  }

  test("gopherFlags: counters are exact on a hand-computed doc") {
    // 2 lines; line 1 bullet-started, line 2 ellipsis-ended.
    // tokens: ["-", "the", "cat#", "runs", "fast..."] (5 words)
    val text = "- the cat# runs\nfast..."
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val g = docs
      .withColumn("__t", TextOps.tokens(col("text")))
      .select(TextOps.gopherFlags(col("text"), col("__t")).as("g"))
      .select(col("g.n_words"), col("g.symbol_ratio"), col("g.alpha_frac"),
        col("g.bullet_frac"), col("g.ellipsis_frac"), col("g.stop_hits"))
      .as[(Long, Double, Double, Double, Double, Long)].head()
    assert(g._1 === 5L)
    assert(g._2 === (1 + 1) / 5.0)       // one '#', one '...'
    assert(g._3 === 4 / 5.0)             // "-" has no alpha
    assert(g._4 === 0.5)                 // 1 of 2 lines bullet-started
    assert(g._5 === 0.5)                 // 1 of 2 lines ellipsis-ended
    assert(g._6 === 1L)                  // only "the"
  }

  test("collocations: planted adjacent pair tops the lift ranking with the " +
    "hand-computed value; minCount gates hapax pairs") {
    // 10 docs each containing "san francisco" once amid filler; "san"
    // and "francisco" never occur apart
    val filler = "the cat sat on the mat and the dog ran"
    val docs = (0L until 10L)
      .map(i => (i, s"$filler san francisco $filler"))
      .toDF("doc_id", "text")
    val got = TextOps.collocations(docs, minCount = 5L, k = 5)
      .as[(String, String, Long, Double)].collect()
    assert(got.head._1 === "san" && got.head._2 === "francisco",
      s"planted pair not top: ${got.head}")
    assert(got.head._3 === 10L)
    // hand computation: per doc 22 tokens, 21 bigrams; c(san)=c(francisco)=10
    val nt = 220.0; val nb = 210.0
    val wantLift = (10.0 * nt * nt) / (nb * 10.0 * 10.0)
    val r4 = (x: Double) => math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(got.head._4 === r4(wantLift), s"lift ${got.head._4} != $wantLift")
    // a pair occurring < minCount times never surfaces
    val one = docs.union(Seq((99L, "zzz qqq")).toDF("doc_id", "text"))
    val g2 = TextOps.collocations(one, minCount = 5L, k = 100)
      .as[(String, String, Long, Double)].collect()
    assert(!g2.exists(r => r._1 == "zzz"), "hapax pair leaked through gate")
  }

  test("codeSignals: verdict fires on code, stays off on prose, NULL on null") {
    val code = "int main() {\n    int x = f(1);\n    return x;\n}"
    val prose = "The quick brown fox jumps over the lazy dog. " +
      "It was the best of times, it was the worst of times."
    val rows = Seq((1L, code), (2L, prose), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.codeSignals(col("text")).as("c"))
      .select(col("doc_id"), col("c.n_lines"), col("c.n_sym"),
        col("c.n_indent"), col("c.n_stmt"), col("c.is_code"))
      .orderBy("doc_id").collect()
    // hand-count: 4 lines; symbols ( ) { ( ) ; ; } = 9 incl. '='; 2 indented;
    // lines ending ; { } = 4 (l1 '{', l2 ';', l3 ';', l4 '}')
    assert(rows(0).getLong(1) === 4L)
    assert(rows(0).getLong(2) === 9L)
    assert(rows(0).getLong(3) === 2L)
    assert(rows(0).getLong(4) === 4L)
    assert(rows(0).getLong(5) === 1L, "code doc must flag")
    assert(rows(1).getLong(5) === 0L, "prose must not flag")
    // empty text: one empty line, zero symbols → prose (n_sym > 0 gate)
    assert(rows(2).getLong(1) === 1L && rows(2).getLong(5) === 0L)
    assert(rows(3).isNullAt(5), "null text → NULL verdict")
  }

  test("nbCharGramModel + nbClassify: recovers planted char distributions; " +
    "priors break even-evidence ties; short docs absent") {
    // three "languages" with disjoint character inventories — any
    // correct trained classifier must recover them on unseen docs
    // equal docs-per-label and equal text lengths → equal priors AND
    // equal per-label gram mass N_l, so the all-unseen fallback below
    // is a genuine three-way tie
    val train = Seq(
      (1L, "aaab aaba abaa", "aa"), (2L, "aaaa baaa aaab", "aa"),
      (3L, "xxxy xyxx yxxx", "xx"), (4L, "xxxx xyxx xxxy", "xx"),
      (5L, "mmmn mnmm mmmm", "mm"), (6L, "mmmm nmmm mmnm", "mm"))
      .toDF("doc_id", "text", "lang")
    val model = TextOps.nbCharGramModel(train, col("text"), col("lang"))
    // model is bounded: every (label, tri) came from the train split
    assert(model.grams.select("label").distinct().count() === 3)
    val test = Seq(
      (10L, "aaba abab"), (11L, "xyxy xxxx"), (12L, "mnmn mmmm"),
      (13L, "zq")) // < 3 cp after any gram window at n=3? "zq" has len 2 → no grams
      .toDF("doc_id", "text")
    val out = TextOps.nbClassify(test, col("text"), model)
      .orderBy("doc_id").collect()
    assert(out.map(r => r.getLong(0) -> r.getString(1)).toSeq ===
      Seq(10L -> "aa", 11L -> "xx", 12L -> "mm"),
      "planted distributions must be recovered; gramless doc absent")
    // scores are exact integers (fixed-point), strictly negative
    assert(out.forall(_.getLong(2) < 0L))
    // unseen-everywhere grams: every label scores prior + m·floor, and
    // the fixture makes priors and floors identical across labels — a
    // genuine three-way tie that must resolve label-ascending
    val alien = Seq((20L, "qqqq")).toDF("doc_id", "text")
    val a = TextOps.nbClassify(alien, col("text"), model).head()
    assert(a.getString(1) === "aa",
      "all-floor three-way tie must resolve label-asc")
  }

  test("NB incremental law: model from merged counts == retraining on the " +
    "concatenated corpus, exactly") {
    val wave1 = Seq(
      (1L, "aaab aaba abaa", "aa"), (3L, "xxxy xyxx yxxx", "xx"),
      (5L, "mmmn mnmm mmmm", "mm")).toDF("doc_id", "text", "lang")
    val wave2 = Seq(
      (2L, "aaaa baaa aaab", "aa"), (4L, "xxxx xyxx xxxy", "xx"),
      (6L, "qqqa aqqq", "aa")).toDF("doc_id", "text", "lang")
    val merged = TextOps.nbModelFromCounts(TextOps.nbMergeCounts(
      TextOps.nbCharGramCounts(wave1, col("text"), col("lang")),
      TextOps.nbCharGramCounts(wave2, col("text"), col("lang"))))
    val retrained = TextOps.nbCharGramModel(
      wave1.unionByName(wave2), col("text"), col("lang"))
    def gset(m: TextOps.NbModel) = m.grams
      .as[(String, String, Long)].collect().toSet
    def lset(m: TextOps.NbModel) = m.labels
      .as[(String, Long, Long)].collect().toSet
    assert(gset(merged) === gset(retrained),
      "merged-count gram log-likelihoods must equal full retrain")
    assert(lset(merged) === lset(retrained),
      "merged-count priors/floors must equal full retrain")
  }

  test("nbClassifyTop2: same argmax as nbClassify, margin = exact gap, " +
    "NULL margin on a single-label model") {
    val train = Seq(
      (1L, "aaab aaba abaa", "aa"), (2L, "aaaa baaa aaab", "aa"),
      (3L, "xxxy xyxx yxxx", "xx"), (4L, "xxxx xyxx xxxy", "xx"))
      .toDF("doc_id", "text", "lang")
    val model = TextOps.nbCharGramModel(train, col("text"), col("lang"))
    val test = Seq((10L, "aaba abab"), (11L, "xyxy xxxx")).toDF("doc_id", "text")
    val t1 = TextOps.nbClassify(test, col("text"), model)
      .select("doc_id", "pred_label", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val t2rows = TextOps.nbClassifyTop2(test, col("text"), model)
      .orderBy("doc_id").collect()
    assert(t2rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet === t1,
      "top2's winner must equal nbClassify exactly")
    assert(t2rows.forall(r => !r.isNullAt(3) && r.getLong(3) > 0L),
      "two-label model on decisive docs: positive exact margin")
    // single-label model → no runner-up → NULL margin (the 'solo' band)
    val solo = TextOps.nbCharGramModel(
      train.where(col("lang") === "aa"), col("text"), col("lang"))
    val s = TextOps.nbClassifyTop2(test, col("text"), solo).orderBy("doc_id").collect()
    assert(s.forall(r => r.getString(1) === "aa" && r.isNullAt(3)))
  }
}
