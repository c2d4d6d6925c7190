package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CRUD re-expressed as batch snapshot→snapshot transforms.
  *
  * The reference mutates an in-memory HashMap under a write lock
  * (`src/cores/storage.rs:22-70`, `src/cores/database.rs:227-304`); the
  * Spark-native equivalent is an immutable DataFrame in, DataFrame out —
  * no locks, and each op is a narrow or single-shuffle plan that scales
  * linearly with partitions.
  */
object Crud {

  /** Insert (O8, reference `src/cores/database.rs:227-254`): batch append.
    * Ids are expected unique by construction (deterministic minting
    * replaces UUIDv4 — SURVEY.md §7.4). Pure union: no shuffle at all. */
  def insert(records: DataFrame, newRows: DataFrame): DataFrame =
    records.unionByName(newRows)

  /** Insert with dimension validation (O8 + O20, reference
    * `src/cores/database.rs:189-199`, call site 239): rows whose embedding
    * width ≠ `dim` are REJECTED — dropped from the append, the batch
    * analog of the reference's per-record error. Use [[invalidDim]] on the
    * same batch to observe what was rejected. */
  def insertValidated(records: DataFrame, newRows: DataFrame, dim: Int): DataFrame =
    records.unionByName(
      newRows.where(graft.types.Metric.validDimension(col("embedding"), dim)))

  /** The rejected complement of [[insertValidated]]. Null-safe negation:
    * a NULL embedding makes the validity predicate NULL, and a plain
    * `!pred` would drop the row from BOTH complements — the accepted ∪
    * rejected = batch contract must hold for hostile rows too. */
  def invalidDim(newRows: DataFrame, dim: Int): DataFrame =
    newRows.where(
      !coalesce(graft.types.Metric.validDimension(col("embedding"), dim),
        lit(false)))

  /** Point lookup (O7, reference `src/cores/storage.rs:33-41`). With the
    * table sorted/bucketed by id, Parquet min/max stats prune to one file. */
  def getById(records: DataFrame, id: Long): DataFrame =
    records.where(col("id") === lit(id))

  /** Delete (O12/O15, reference `src/cores/storage.rs:44-48`): anti-join.
    * No broadcast hint: the delete set is often tiny (AQE picks broadcast
    * on its own from runtime stats) but may legitimately be a large
    * predicate-derived id set — an unconditional hint would pin that case
    * onto the driver. */
  def delete(records: DataFrame, ids: DataFrame): DataFrame =
    records.join(ids, Seq("id"), "left_anti")

  /** Delete by predicate — the set-oriented generalization. Null-safe:
    * only rows where the predicate is TRUE are deleted. A plain
    * `where(!pred)` would also delete every row where the predicate is
    * NULL (e.g. a metadata-key lookup on rows lacking the key). */
  def deleteWhere(records: DataFrame, pred: Column): DataFrame =
    records.where(!coalesce(pred, lit(false)))

  /** Metadata update (O14, reference `src/cores/storage.rs:55-70`): the
    * ENTIRE metadata map is replaced (not merged); the vector is immutable
    * by policy (`storage.rs:52-54`). Left join + coalesce; join strategy
    * is left to AQE (see [[delete]] for why there is no broadcast hint). */
  def updateMetadata(records: DataFrame, updates: DataFrame): DataFrame = {
    // Narrow to (id, metadata): extra columns in the update frame would
    // duplicate record columns through the join (AMBIGUOUS_REFERENCE
    // downstream). The match MARKER — not coalesce — decides whether to
    // replace: coalesce can't distinguish "no update for this id" from
    // an explicit (id, null) update, which under replace-the-entire-map
    // semantics must actually null the map out.
    val u = updates.select(col("id"), col("metadata").as("__new_metadata"))
      .withColumn("__matched", lit(true))
    records
      .join(u, Seq("id"), "left_outer")
      .withColumn("metadata",
        when(col("__matched"), col("__new_metadata")).otherwise(col("metadata")))
      .drop("__new_metadata", "__matched")
  }

  /** Batch MERGE (upsert + delete): the reference's Insert/Update/Delete
    * RPC stream (`src/cores/database.rs:227-304`, row-at-a-time under a
    * write lock) applied as ONE batch between snapshots — the
    * change-log-merge shape a 100 TB store actually runs. `changes`
    * carries full rows plus `opCol` (`'upsert' | 'delete'`) and a
    * monotone `seqCol`; the LAST change per id wins (`max_by`
    * reduction — map-side-combinable, no window, no self-join).
    *
    * Plan: one shuffle of `changes` on id for the reduction, one
    * anti-join of `records` against the touched-id set (AQE broadcasts
    * it when the batch is small), then a narrow union. Nothing is
    * proportional to |records| except the anti-join scan itself. */
  def merge(records: DataFrame, changes: DataFrame,
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    // Only RECOGNIZED ops participate. A malformed log row (NULL or
    // unknown op) must neither insert its payload nor — the worse
    // failure — delete the record: unfiltered, its id joins the
    // touched-id anti-join set while `op =!= 'delete'` (NULL) drops the
    // row from the union, i.e. a NULL-op row silently acts as a delete.
    val clean = changes.where(col(opCol).isin("upsert", "delete"))
    val dataCols = changes.columns.filter(c => c != opCol && c != seqCol).toSeq
    val latest = clean
      .groupBy(col("id"))
      .agg(max_by(struct((dataCols.filter(_ != "id") :+ opCol).map(col): _*),
        col(seqCol)).as("__w"))
      .select((col("id") +: dataCols.filter(_ != "id").map(c => col(s"__w.$c")))
        :+ col(s"__w.$opCol"): _*)
    records
      .join(clean.select(col("id")).distinct(), Seq("id"), "left_anti")
      .unionByName(latest.where(col(opCol) =!= "delete").drop(opCol))
  }

  /** Count (O16, reference `src/cores/storage.rs:78-80`). */
  def count(records: DataFrame): Long = records.count()

  /** SCD2 version history: turn a change log (id, `opCol`, monotone
    * `seqCol`, payload…) into the slowly-changing-dimension interval
    * table — one row per (id, version) with `seq_from` (the change's own
    * seq), `seq_to` (the NEXT change's seq, null while current) and
    * `is_current` (last change for the id AND not a delete). Delete rows
    * close the previous interval and open a tombstone interval (op =
    * 'delete', is_current = false) so the full lifecycle — including
    * revivals — is reconstructable; [[merge]] is exactly "keep the
    * is_current rows".
    *
    * Plan: one shuffle of the LOG on id + a per-id window (lead). The
    * window partitions on id, so task skew is bounded by the hottest
    * id's change count — a change log's per-key cardinality is small by
    * construction (it is a log, not the store), unlike the store-sized
    * frames where this repo avoids per-key windows.
    *
    * Contract: `seqCol` must be UNIQUE per id (the same monotone-log
    * contract [[merge]] relies on — its `max_by` is equally arbitrary
    * on ties). Duplicate seqs would make the lead() interval order
    * nondeterministic; validate upstream if the log source can emit
    * them. */
  def history(changes: DataFrame,
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col(seqCol).asc)
    changes
      .withColumn("seq_from", col(seqCol))
      .withColumn("seq_to", lead(col(seqCol), 1).over(w))
      // null-safe op compare: is_current must be a BOOLEAN for every
      // row — a NULL op would otherwise make it NULL instead of true
      .withColumn("is_current",
        col("seq_to").isNull && !(col(opCol) <=> lit("delete")))
      .drop(seqCol)
  }

  /** Time travel: the store as of log position `atSeq` — [[merge]] with
    * the change log truncated to `seq <= atSeq`. Same single-reduction +
    * anti-join plan as merge; nothing reads log entries past the cutoff
    * (the filter sits under the shuffle). */
  def snapshotAt(records: DataFrame, changes: DataFrame, atSeq: Long,
      opCol: String = "op", seqCol: String = "seq"): DataFrame =
    merge(records, changes.where(col(seqCol) <= atSeq), opCol, seqCol)

  /** Snapshot DIFF — the inverse of [[merge]]: given two store versions,
    * derive the minimal change log that turns `oldStore` into `newStore`
    * (`op = 'upsert'` for inserts and changed rows carrying the NEW
    * payload, `op = 'delete'` for removed ids, unchanged rows omitted).
    * `merge(oldStore, diff(oldStore, newStore))` reproduces `newStore`
    * row-for-row — pinned in CrudSpec. The reference only replays change
    * streams forward (`src/cores/database.rs:227-304`); deriving the
    * stream from two snapshots is what lets a 100 TB pipeline ship
    * incremental downstream updates (reindex, replicate, invalidate)
    * instead of full rewrites.
    *
    * Plan: ONE full-outer shuffle join on id — the minimum for any diff —
    * then a narrow filter/project. With both snapshots written by the
    * same bucketed layout ([[graft.sources.Records.snapshotById]]) the
    * two sides arrive co-partitioned and the exchange is a local zip.
    * Map equality is order-insensitive: maps compare via key-sorted
    * entry arrays (Spark defines no ordering on raw MapType). */
  def diff(oldStore: DataFrame, newStore: DataFrame): DataFrame = {
    def canonical(df: DataFrame, tag: String): DataFrame =
      df.select(col("id"), struct(
        col("embedding"), col("metadata"),
        array_sort(map_entries(col("metadata"))).as("__meta_key")).as(tag))
    canonical(oldStore, "__old")
      .join(canonical(newStore, "__new"), Seq("id"), "full_outer")
      // null-SAFE inequality (`<=>` negated): with `=!=`, a null
      // embedding/metadata on exactly ONE side yields SQL NULL, the
      // filter drops the row, and a real null↔non-null change silently
      // never enters the log — violating the merge∘diff round-trip law
      .where(col("__old").isNull || col("__new").isNull ||
        !(col("__old.embedding") <=> col("__new.embedding")) ||
        !(col("__old.__meta_key") <=> col("__new.__meta_key")))
      .select(col("id"),
        when(col("__new").isNull, lit("delete")).otherwise(lit("upsert")).as("op"),
        col("__new.embedding").as("embedding"),
        col("__new.metadata").as("metadata"))
  }
}
