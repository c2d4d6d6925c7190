package graft

import graft.operators.TextOps
import graft.streaming.DocIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-door lifecycle: the PRODUCTION composition of the maintained
  * streaming doors, exercised end-to-end against the same waves.
  *
  * Each door is pinned individually in StreamingSpec; what production
  * actually deploys is their composition — the corpus-index maintenance
  * door and the NB-counts maintenance door keep two on-disk stores
  * fresh, and the composed admission door SERVES from those stores
  * (index opened through the capped [[DocIngest.corpusIndexFromStore]]
  * entry point, classifier trained from [[DocIngest.nbCountsAt]]).
  * This spec runs all three doors across two waves each (wave 2 is a
  * RESTART on the same checkpoint for every door) and asserts the three
  * outcomes agree with the batch pipeline over the union:
  *
  *   1. the maintained index == a from-scratch [[DocIngest.corpusIndex]]
  *      over everything streamed into the corpus;
  *   2. the maintained counts == retraining on everything streamed into
  *      the training store, and the derived classifiers agree;
  *   3. the admitted set == the batch admission chain (quality →
  *      exact-dedup → near-dup vs the FINAL index → routing under the
  *      FINAL model) over the union of the arrival waves.
  *
  * Fixture discipline for (3): wave-1 arrivals' verdicts must be STABLE
  * under both store versions (their near-dup/routing outcomes don't
  * change when wave-2 corpus/training data lands), because the stream
  * gates wave 1 against the v1 stores while the batch twin replays
  * everything against the final stores. Wave-2 arrival 110 is the
  * converse probe: a near-dup of a wave-2 CORPUS doc, droppable only if
  * the admission door really serves the maintained (refreshed) index.
  */
class MaintainedLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and it " +
    "is a fine day in the old house of the hill it is warm and the fire is lit"
  private val base2 = "we sailed the long river at dawn and the water was " +
    "cold and clear and the boats were slow under the old stone bridge"
  private val novelEn = "it is the best of the days and the worst of the " +
    "days to be in a house of fire and it is a fine day in the hills"
  private val novelEs = "el la de que y en un es el la de que y en un es " +
    "el la de que y en un es la casa es grande y el sol es"

  private def labeled(rows: Seq[(Long, String, String)]): DataFrame = rows
    .toDF("doc_id", "text", "lang")
    .withColumn("source", lit("s"))
    .withColumn("n_chars", length(col("text")).cast("long"))

  test("maintained lifecycle: index + NB-counts + composed admission doors " +
    "across two waves with restarts; stores serve the admission door and " +
    "all three outcomes equal the batch pipeline over the union") {
    val root = java.nio.file.Files.createTempDirectory("graft_lifecycle")
    val corpusIn = s"$root/corpus_in"; val corpusStore = s"$root/corpus_store"
    val corpusCkpt = s"$root/corpus_ckpt"
    val trainIn = s"$root/train_in"; val trainStore = s"$root/train_store"
    val trainCkpt = s"$root/train_ckpt"
    val arriveIn = s"$root/arrive_in"; val admitStore = s"$root/admit_store"
    val admitCkpt = s"$root/admit_ckpt"

    // ---- phase 1: bootstrap the two stores from wave 1 ----
    val c1 = Seq((0L, base))
    val t1 = Seq((1L, base, "en"), (2L, novelEn, "en"), (3L, novelEs, "es"))
    c1.toDF("doc_id", "text").write.mode("append").parquet(corpusIn)
    DocIngest.startCorpusIndexMaintenance(spark, corpusIn, corpusStore, corpusCkpt)
      .awaitTermination()
    labeled(t1).write.mode("append").parquet(trainIn)
    DocIngest.startNbCountsMaintenance(spark, trainIn, trainStore, trainCkpt)
      .awaitTermination()

    // quality cut from the batch scorer: midpoint between the junk
    // arrival and the worst non-junk arrival (same discipline as the
    // composed-door spec — the gate must reproduce batch exactly)
    val a1 = Seq(
      (100L, base.replace("lazy", "sleepy")), // near-dup of corpus v1 → dropped
      (101L, novelEn),                        // admitted, routed en
      (103L, "zzz !!!! ???? ;;;; ...."))      // junk → quality gate drops
    val a2 = Seq(
      (109L, novelEn),                        // exact dup ACROSS restart → suppressed
      (110L, base2.replace("cold", "warm")),  // near-dup of corpus v2 ONLY
      (111L, novelEs))                        // admitted, routed es
    def qualityOf(df: DataFrame) = df
      .withColumn("__toks", TextOps.tokens(col("text")))
      .withColumn("__stats", TextOps.tokenStats(col("__toks")))
      .select(col("doc_id"),
        TextOps.qualityFromStats(col("text"), col("__toks"), col("__stats")).as("q"))
    val scores = qualityOf((a1 ++ a2).toDF("doc_id", "text"))
      .as[(Long, Double)].collect().toMap
    val others = scores.view.filterKeys(_ != 103L).values
    assert(scores(103L) < others.min, "junk fixture must score lowest")
    val cut = (scores(103L) + others.min) / 2

    // ---- phase 2: admission wave 1 SERVES from the maintained stores ----
    def openStores(): (DataFrame, DataFrame, TextOps.NbModel) = {
      val (b, h) = DocIngest.corpusIndexFromStore(spark, corpusStore)
      val model = TextOps.nbModelFromCounts(
        DocIngest.nbCountsAt(spark, trainStore).get)
      model.grams.cache(); model.labels.cache()
      (b, h, model)
    }
    val (b1, h1, model1) = openStores()
    a1.toDF("doc_id", "text").write.mode("append").parquet(arriveIn)
    DocIngest.startComposedAdmission(spark, arriveIn, b1, h1, model1,
      admitStore, admitCkpt, minQuality = cut, threshold = 0.4)
      .awaitTermination()

    // ---- phase 3: maintain both stores (restart on same checkpoints),
    // then admission wave 2 serves the REFRESHED stores on ITS restarted
    // checkpoint (exact-dedup state must survive) ----
    val c2 = Seq((10L, base2))
    val t2 = Seq((11L, novelEn.replace("hills", "valley"), "en"),
      (12L, novelEs.replace("grande", "bonita"), "es"))
    c2.toDF("doc_id", "text").write.mode("append").parquet(corpusIn)
    DocIngest.startCorpusIndexMaintenance(spark, corpusIn, corpusStore, corpusCkpt)
      .awaitTermination()
    labeled(t2).write.mode("append").parquet(trainIn)
    DocIngest.startNbCountsMaintenance(spark, trainIn, trainStore, trainCkpt)
      .awaitTermination()
    val (b2, h2, model2) = openStores()
    a2.toDF("doc_id", "text").write.mode("append").parquet(arriveIn)
    DocIngest.startComposedAdmission(spark, arriveIn, b2, h2, model2,
      admitStore, admitCkpt, minQuality = cut, threshold = 0.4)
      .awaitTermination()

    // ---- outcome 1: maintained index == from-scratch over the union ----
    val (fb, fh) = DocIngest.corpusIndex((c1 ++ c2).toDF("doc_id", "text"))
    def bandSet(df: DataFrame) = df
      .select(col("dup_of"), col("band_idx").cast("int"), col("band_hash"))
      .as[(Long, Int, String)].collect().toSet
    def hashSet(df: DataFrame) = df
      .as[(Long, Seq[Long])].collect().map { case (id, a) => (id, a.toList) }.toSet
    assert(bandSet(b2) === bandSet(fb),
      "maintained banded rows must equal the from-scratch index over the union")
    assert(hashSet(h2) === hashSet(fh),
      "maintained shingle identities must equal the from-scratch index")

    // ---- outcome 1b: store-census == rebuild-census (the law behind
    // dedup_store_stats) — the census is a PURE scan of the store's
    // banded table, so it must agree exactly with censusing a
    // from-scratch UNCAPPED banding of everything ever streamed; at
    // 100 TB only the scan is affordable, so this equality is what makes
    // the cheap census trustworthy ----
    def censusSet(df: DataFrame) = df
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect().toSet
    val storeCensus = graft.operators.Dedup.bandingCensus(
      spark.read.parquet(s"$corpusStore/banded"))
    val rebuildCensus = graft.operators.Dedup.bandingCensus(
      graft.operators.Dedup.bandedSignature(
        graft.operators.Dedup.minhashSignature(
          (c1 ++ c2).toDF("doc_id", "text"), 3, 16), 16, 4))
    assert(censusSet(storeCensus) === censusSet(rebuildCensus),
      "store census (pure scan) must equal the from-scratch banding census")

    // ---- outcome 2: maintained counts == retraining on the union ----
    val maintained = DocIngest.nbCountsAt(spark, trainStore).get
    val retrained = TextOps.nbCharGramCounts(
      labeled(t1 ++ t2), col("text"), col("lang"))
    assert(maintained.gramCounts.as[(String, String, Long)].collect().toSet ===
      retrained.gramCounts.as[(String, String, Long)].collect().toSet,
      "maintained gram counts must equal retraining on everything streamed")
    assert(maintained.docCounts.as[(String, Long)].collect().toSet ===
      retrained.docCounts.as[(String, Long)].collect().toSet)
    val probe = Seq((20L, novelEn), (21L, novelEs)).toDF("doc_id", "text")
    def classify(m: TextOps.NbModel) =
      TextOps.nbClassify(probe, col("text"), m)
        .select("doc_id", "pred_label").as[(Long, String)].collect().toSet
    assert(classify(TextOps.nbModelFromCounts(maintained)) ===
      classify(TextOps.nbModelFromCounts(retrained)),
      "derived classifiers must agree")

    // ---- outcome 3: admitted set == the batch chain over the union,
    // replayed against the FINAL stores ----
    val union = (a1 ++ a2).toDF("doc_id", "text")
    val gated = union.join(
      qualityOf(union).where(col("q") >= cut).select("doc_id"), Seq("doc_id"))
    val keepIds = gated.groupBy(sha2(col("text"), 256))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val exDeduped = gated.join(keepIds, Seq("doc_id"), "left_semi")
    val dupIds = DocIngest.matches(exDeduped, fb, fh, threshold = 0.4)
      .select("doc_id").distinct()
    val kept = exDeduped.join(dupIds, Seq("doc_id"), "left_anti")
    val batchRouted = kept
      .join(TextOps.nbClassify(kept, col("text"),
          TextOps.nbModelFromCounts(retrained))
        .select(col("doc_id"), col("pred_label")), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("pred_label"), lit("und")).as("pred_lang"))
      .as[(Long, String)].collect().toSet
    val routed = spark.read.parquet(admitStore)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toSet
    assert(routed === batchRouted,
      s"composed stream $routed must equal the batch chain $batchRouted")
    assert(routed === Set(101L -> "en", 111L -> "es"), s"got $routed")

    // the wave-2-only near-dup drop proves the admission door really
    // served the REFRESHED index: under the v1 stores doc 110 was clean
    assert(DocIngest.matches(Seq((110L, a2(1)._2)).toDF("doc_id", "text"),
        b1, h1, threshold = 0.4).isEmpty,
      "fixture 110 must be clean under the v1 index (else it proves nothing)")

    // version chains exist on both maintained stores (time travel)
    val gramVersions = new java.io.File(s"$trainStore/grams").listFiles()
      .map(_.getName).count(_.startsWith("v="))
    assert(gramVersions === 2, s"expected 2 count-store versions, got $gramVersions")
    // staged-publish layout: batch dirs at the top (each landed by ONE
    // atomic rename), band partitions nested beneath (pruning kept)
    val bandBatchDirs = new java.io.File(s"$corpusStore/banded").listFiles()
      .filter(_.getName.startsWith("batch_id="))
    assert(bandBatchDirs.length >= 2,
      s"expected >=2 index batches, got ${bandBatchDirs.length}")
    assert(bandBatchDirs.forall(
        _.listFiles().map(_.getName).exists(_.startsWith("band_idx="))),
      "each batch dir must be band_idx-partitioned beneath")
  }
}
