package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Record-store framing and snapshot source/sink.
  *
  * The reference's storage is a single collection of
  * `Record { vector, metadata }` keyed by RecordID
  * (reference `src/types/record.rs:110-114`, `src/cores/storage.rs:10-13`).
  * Spark-side the canonical frame is
  * `id: bigint, embedding: array<float>, metadata: map<string,string>`
  * (SURVEY.md §1.1-1.2). Deterministic ids replace the reference's UUIDv4
  * (`record.rs:17-20`) so results are oracle-reproducible.
  *
  * Snapshots (reference `src/cores/database.rs:174-187`, bincode + atomic
  * rename) map to Parquet write/read — Parquet's commit protocol already
  * gives the atomic-rename guarantee, and at 100 TB the snapshot is a
  * distributed columnar table instead of a single driver-memory blob.
  */
object Records {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** embeddings.parquet → record frame. `label` becomes the metadata map,
    * mirroring how the reference carries per-record key/value metadata. */
  def fromEmbeddings(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings").select(
      col("vec_id").as("id"),
      col("embedding"),
      map(lit("label"), col("label").cast("string")).as("metadata"))

  /** documents.parquet → record frame with text-ish metadata (no vector). */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents").select(
      col("doc_id").as("id"),
      col("text"),
      map(
        lit("lang"), col("lang"),
        lit("source"), col("source"),
        lit("n_chars"), col("n_chars").cast("string"),
        lit("text"), col("text")).as("metadata"))

  /** The canonical record row (reference `src/types/record.rs:110-114`)
    * for callers who want the compile-time-typed `Dataset[Record]` view.
    * Internals stay `DataFrame`-based — `Column` expressions keep Catalyst
    * optimizations and oracle parity (SURVEY.md §1.2) — but a typed facade
    * costs nothing and catches schema drift at compile time in user code. */
  final case class Record(
      id: Long,
      embedding: Seq[Float],
      metadata: Map[String, String])

  /** Typed view of the embeddings-backed record store. */
  def typed(spark: SparkSession, sfDir: String): Dataset[Record] = {
    import spark.implicits._
    fromEmbeddings(spark, sfDir).as[Record]
  }

  /** Snapshot sink (O17): atomic overwrite via Parquet commit protocol.
    * ⚠ EAGER — a write action, not a plan: the snapshot executes `df` and
    * hits disk before this returns (the reference's `Snapshot` RPC is the
    * same blocking call, `src/cores/database.rs:215-225`). */
  def snapshot(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Snapshot source (O18). */
  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
