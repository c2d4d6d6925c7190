package graft.operators

import graft.functions.NativeExprs
import graft.types.Metric
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sign-LSH (random-hyperplane) bucketed ANN — the LSH alternative to the
  * IVF scale path ([[IvfIndex]]): each vector hashes to an `nbits`-bit
  * bucket by the SIGN of its dot product with `nbits` hyperplanes
  * (Charikar's SimHash for angular distance, applied to embeddings);
  * a query searches its own bucket plus all buckets within Hamming
  * distance `hamming` (standard multi-probe).
  *
  * Everything is declarative and map-only until the final top-k:
  * bucketing is one projection over broadcast plane vectors (no shuffle,
  * no index build — the advantage over IVF's k-means fit), and the probe
  * is a broadcast semi-join of a ≤ C(nbits, ≤hamming)-row bucket list
  * against the table. At 100 TB the bucketed table is written
  * `partitionBy("bucket")` exactly like the IVF posting lists, and the
  * probe prunes partitions.
  *
  * Hyperplanes are DIFFERENCES of dataset rows (`e_i − e_{i+nbits}`):
  * deterministic, oracle-reproducible in SQL, and zero-centered even when
  * raw components are not (a raw data row as a plane would put every
  * vector of an all-positive corpus on the same side). A production
  * deployment with a seeded Gaussian generator is a drop-in swap for
  * [[planesFrom]].
  */
object SignLsh {

  /** `nbits` hyperplanes from the first `2·nbits` rows of `records`
    * (ordered by `id`): plane i = e_i − e_{i+nbits}. Driver-held — tiny
    * (nbits × dim floats), like the centroid cache. */
  def planesFrom(records: DataFrame, nbits: Int): Seq[Seq[Float]] = {
    val rows = records.orderBy(col("id")).limit(2 * nbits)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0))
    require(rows.length == 2 * nbits, s"need ${2 * nbits} rows for $nbits planes")
    (0 until nbits).map(i => rows(i).zip(rows(i + nbits)).map { case (a, b) => a - b })
  }

  /** Bucket id of a vector column: bit i set iff dot(e, plane_i) > 0. */
  def bucketId(e: Column, planes: Seq[Seq[Float]]): Column =
    planes.zipWithIndex.map { case (h, i) =>
      val plane = typedlit(h)
      when(NativeExprs.dot(e, plane) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Records with their bucket column — write `partitionBy("bucket")` for
    * the pruned-scan layout. */
  def bucketize(records: DataFrame, planes: Seq[Seq[Float]]): DataFrame =
    records.withColumn("bucket", bucketId(col("embedding"), planes))

  /** All XOR masks with at most `hamming` of `nbits` bits set — the
    * multi-probe neighborhood. Constant-sized (derived from parameters,
    * not data): C(nbits, ≤hamming) masks, generated combinatorially —
    * never an enumeration of the 2^nbits bucket space, so wide codes
    * (nbits in the 30s-50s) stay cheap as long as the mask count itself
    * is small. nbits ≥ 63 would overflow the long bucket id. */
  private[operators] def probeMasks(nbits: Int, hamming: Int): Seq[Long] = {
    require(nbits > 0 && nbits < 63, s"nbits must be in [1, 62], got $nbits")
    (0 to math.min(hamming, nbits)).flatMap(h =>
      (0 until nbits).combinations(h).map(_.foldLeft(0L)((m, b) => m | (1L << b))))
  }

  /** Multi-probe bucketed ANN: top-`k` by `metric` among the records
    * whose bucket is within Hamming distance `hamming` of the query's
    * bucket. `query` is a 1-row (qvec) frame; `radius`/`filter` compose
    * like [[Knn.search]] / [[IvfIndex.query]]. */
  def query(
      records: DataFrame,
      planes: Seq[Seq[Float]],
      query: DataFrame,
      k: Int,
      hamming: Int = 1,
      metric: Metric = Metric.Cosine,
      radius: Double = Double.PositiveInfinity,
      filter: Column = lit(true)): DataFrame = {
    val masks = probeMasks(planes.length, hamming)
    // ≤ C(nbits, ≤hamming) probe buckets: qbucket ⊕ mask, built by
    // exploding a constant mask array over the 1-row query frame
    val probed = query
      .withColumn("__qb", bucketId(col("qvec"), planes))
      .select(explode(typedlit(masks)).as("__mask"), col("__qb"))
      .select((col("__qb").bitwiseXOR(col("__mask"))).as("bucket"))
    val candidates = bucketize(records, planes)
      .join(broadcast(probed), Seq("bucket"), "left_semi")
    Knn.search(candidates, query, k, metric, radius, filter)
  }

  /** Batch multi-probe ANN: every query pruned to its own Hamming
    * neighborhood — the LSH twin of [[IvfIndex.queryBatch]]. The probe
    * frame is |queries| × C(nbits, ≤hamming) rows (query_id, bucket,
    * qvec), broadcast against the bucketized table so each record meets
    * only the queries probing its bucket; per-query two-phase top-k via
    * [[Knn.topKPerQuery]] (no ranking window over the data). */
  def queryBatch(
      records: DataFrame,
      planes: Seq[Seq[Float]],
      queries: DataFrame,
      k: Int,
      hamming: Int = 1,
      metric: Metric = Metric.Cosine,
      radius: Double = Double.PositiveInfinity,
      filter: Column = lit(true)): DataFrame = {
    require(k > 0, "k must be positive")
    val masks = probeMasks(planes.length, hamming)
    val probed = queries
      .withColumn("__qb", bucketId(col("qvec"), planes))
      .select(col("query_id"), col("qvec"),
        explode(typedlit(masks)).as("__mask"), col("__qb"))
      .select(col("query_id"), col("qvec"),
        (col("__qb").bitwiseXOR(col("__mask"))).as("bucket"))
    val bucketed = bucketize(records, planes)
    val dist = metric.distance(col("embedding"), col("qvec"))
    val candidates = bucketed
      .join(broadcast(probed), Seq("bucket"))
      .withColumn("distance", dist)
      .where(!isnan(col("distance")) && col("distance") <= lit(radius))
      .where(filter)
      .select(col("query_id"), col("distance"), col("id"))
    Knn.topKPerQuery(candidates, records, k)
  }
}
