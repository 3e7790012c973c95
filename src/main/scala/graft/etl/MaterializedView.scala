package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Incrementally-maintained materialized view over a keyed,
  * latest-version-wins source — the piece that makes the reference's
  * daily full-view recompute (`sql/customer_360_views.sql` rebuilt per
  * run) survive 100 TB: a CDC batch refreshes ONLY the hash buckets it
  * touches instead of rescanning the base table.
  *
  * Two stores, both hive-partitioned by `__mv_bucket = pmod(xxhash64(
  * keys), nBuckets)`:
  *
  *   - STATE — the latest source row per key, BEFORE any view filter.
  *     State must be pre-filter: a key whose current winner fails the
  *     view's quality gate has no view row, and if the winner weren't
  *     retained an older resurfacing CDC row would wrongly win the next
  *     refresh. Latest-per-key is an associative reduction, so
  *     (state ∪ batch) → latest is exactly (full history) → latest —
  *     the base table is never needed again after the initial build.
  *   - VIEW — `derive(state)`, the published rows. `derive` must
  *     preserve the key columns unrenamed (the bucket is recomputed
  *     from them at write time; the view itself carries no lineage).
  *
  * Refresh path: the batch's bucket set is resolved driver-side
  * (≤ nBuckets values — metadata, not data), the state read is
  * partition-pruned to those buckets, winners are recomputed within
  * them, and exactly those bucket partitions are rewritten — untouched
  * buckets are never read or written. Because a refresh overwrites
  * partitions its own input was read from, the new state is
  * localCheckpointed before any write (same read-overwrite hazard as
  * the event sink's processed-id append: under cache eviction a lazy
  * plan would re-read partitions mid-overwrite).
  *
  * The view is SERVED through a [[GenerationStore]]: refreshed buckets
  * write to an immutable new generation directory and a single manifest
  * swaps atomically, so a concurrent reader (or a crash at any point in
  * the refresh) always sees a complete old-or-new state — never a
  * missing bucket. Dynamic partition overwrite can't serve this role
  * twice over: it only replaces partitions that receive NEW rows (a
  * bucket whose view rows all disappear — its last publishable customer
  * soft-deletes — would keep serving the stale partition forever), and
  * its delete-write window is visible to readers. State uses dynamic
  * overwrite — a touched state bucket always has winners and has no
  * concurrent readers (the refresh loop is the only consumer).
  *
  * Deletes fall out naturally: when a refresh makes a key's winner
  * soft-deleted, `derive` drops the row and the bucket rewrite
  * publishes the view WITHOUT it — no tombstone bookkeeping.
  *
  * `order` must be a TOTAL order (include a unique tiebreaker): rank-1
  * under ties is engine-arbitrary, and an incremental refresh that
  * resolves a tie differently from the initial build would silently
  * diverge from the full rebuild.
  */
final class MaterializedView(
    root: String,
    keys: Seq[String],
    order: Seq[Column],
    derive: DataFrame => DataFrame,
    nBuckets: Int = 64,
    writeTasksPerBucket: Int = 1,
    keepVersions: Int = 1) {

  require(writeTasksPerBucket >= 1,
    s"writeTasksPerBucket must be >= 1, got $writeTasksPerBucket")

  private val statePath = s"$root/state"
  private val viewPath = s"$root/view"
  private val bucketCol = "__mv_bucket"

  /** Atomic manifest-mediated publish of the served view (exposed to
    * the crash/concurrency specs). */
  private[graft] val store = new GenerationStore(viewPath, bucketCol, keepVersions)

  /** Test hook: runs between the view publish and the state overwrite —
    * the mirror crash window the publish-first ordering introduces. */
  private[graft] var onAfterPublish: () => Unit = () => ()

  /** Committed snapshot versions readable right now ([[viewAt]]),
    * bounded by `keepVersions`. */
  def viewVersions(spark: SparkSession): Seq[Long] = store.versions(spark)

  /** SNAPSHOT READ: the view exactly as committed version `v` served
    * it (None once aged past `keepVersions`) — the "what did the
    * dashboard say before last night's refresh" question answered
    * without restoring anything. */
  def viewAt(spark: SparkSession, v: Long): Option[DataFrame] =
    store.readVersion(spark, v)

  /** CDC OUT of the serving layer: the row-level changelog between two
    * retained snapshots — per view key, `insert` (new in `v2`),
    * `delete` (gone from `v2`), or `update` (any non-key value
    * changed, null-safe struct compare); unchanged rows are omitted.
    * This is the reverse direction of [[refresh]]: downstream
    * consumers (activation feeds, cache invalidation) subscribe to
    * what a refresh DID instead of re-diffing the whole view — the
    * join is key-partitioned, never a full-view collect. None unless
    * BOTH versions are still retained. Output: key columns (coalesced),
    * `change`, `old_row`, `new_row` structs (null on insert/delete
    * respectively). */
  def changesBetween(spark: SparkSession, v1: Long, v2: Long): Option[DataFrame] =
    for { a <- viewAt(spark, v1); b <- viewAt(spark, v2) } yield {
      val cols = a.columns.toSeq
      val left = a.select(keys.map(col) :+ struct(cols.map(col): _*).as("old_row"): _*)
      val right = b.select(keys.map(col) :+ struct(cols.map(col): _*).as("new_row"): _*)
      left.join(right, keys, "full_outer")
        .withColumn("change",
          when(col("old_row").isNull, "insert")
            .when(col("new_row").isNull, "delete")
            .when(!(col("old_row") <=> col("new_row")), "update"))
        .filter(col("change").isNotNull)
        .select(keys.map(col) ++ Seq(col("change"), col("old_row"), col("new_row")): _*)
    }

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn(bucketCol,
      pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong)))

  /** Cluster rows to their bucket before a `partitionBy(bucket)` write:
    * without it every shuffle task holds rows of every bucket and the
    * write emits up to tasks×buckets files — a small-file explosion that
    * compounds per refresh (and at 100 TB turns the lake into a metadata
    * problem).
    *
    * One task per bucket bounds the file count but also CAPS write
    * parallelism at nBuckets and makes one task sort/spill an entire
    * bucket — at the 100 TB scale this class targets that is ~1.5 TB
    * per task, a straight path to OOM/stragglers. `writeTasksPerBucket`
    * is the second lever: rows are clustered on (bucket, salt) so each
    * bucket is produced by at most that many tasks — per-bucket file
    * count stays bounded (≤ writeTasksPerBucket per write) while
    * per-task volume drops to bucket/writeTasksPerBucket. Size BOTH so
    * a task's share fits in executor memory; the salt is derived from
    * the keys (seeded differently from the bucket hash), so the layout
    * stays deterministic. */
  private def clustered(df: DataFrame): DataFrame =
    if (writeTasksPerBucket == 1) df.repartition(nBuckets, col(bucketCol))
    else df.repartition(nBuckets * writeTasksPerBucket, col(bucketCol),
      pmod(xxhash64(lit("__mv_salt") +: keys.map(col): _*),
        lit(writeTasksPerBucket.toLong)))

  /** Full initial build: every bucket of state and view. The state
    * write IS the dedup's materialization (no checkpoint pass — unlike
    * [[refresh]] there is no read-overwrite hazard on a fresh root);
    * the view derivation then re-reads the state it just wrote, which
    * is a COLUMN-PRUNED scan of freshly-written compressed parquet —
    * cheaper than holding a full-width block copy of the state in
    * executor memory for the one derive pass. */
  def build(source: DataFrame): Unit = graft.plans.MvRewrite.withRuleDisabled {
    clustered(Dedup.latestByKey(withBucket(source), keys, order))
      .write.mode("overwrite").partitionBy(bucketCol).parquet(statePath)
    val state = source.sparkSession.read.parquet(statePath)
    store.publish(
      clustered(withBucket(derive(state.drop(bucketCol)))),
      0L until nBuckets.toLong)
  }

  /** Incremental refresh from a CDC batch: recompute winners and view
    * rows for the batch's CHANGED buckets only; all other buckets
    * untouched. A bucket whose latest-version-wins fold leaves its
    * state byte-identical (every batch row lost to — or duplicated — an
    * already-stored winner) is skipped entirely: no state rewrite, no
    * re-derive, no publish. A fully-replayed CDC batch therefore
    * publishes NO new generation — the idempotence the reference's
    * activation path relies on when it replays batches by design
    * (`scripts/lambda_redshift_to_segment.py:97-135`).
    *
    * CRASH CONTRACT — publish BEFORE the state overwrite. The no-op
    * skip keys off the state fold, so the state write must be the LAST
    * durable step: a refresh that crashes anywhere (mid-publish, or
    * after the manifest swap but before the state write) leaves the
    * state OLD, and the documented recovery path — replay the crashed
    * batch — re-detects the change, re-publishes idempotently (same
    * content, fresh generation; the crashed orphan is GC'd at that
    * publish's start) and completes the state write. The r9 ordering
    * (state first) broke this: a crash between state write and swap
    * made the replay see "state unchanged" and skip the publish
    * forever. The trade is the mirror window — view published, state
    * not yet written — where a NON-replay batch would fold without the
    * crashed batch's rows; latest-version-wins makes any later replay
    * of the crashed batch (at-least-once delivery is the activation
    * contract) restore them, so convergence holds in either order.
    *
    * Change detection compares per-row JSON fingerprints of new vs old
    * state rather than `exceptAll` on raw rows: Spark set operations
    * reject MapType columns, and state schemas in the reference family
    * carry JSONB-style maps. `to_json` (nulls kept) is total over the
    * lake's types; same-schema equal rows serialize identically, and a
    * map whose physical entry order differs can only FALSELY REPORT a
    * change (a wasted republish), never hide one. The fold never drops
    * a key, so new-minus-old captures every insert and update; it runs
    * bucket-pruned — one pass over just the batch's buckets. */
  def refresh(batch: DataFrame): Unit = graft.plans.MvRewrite.withRuleDisabled {
    val spark = batch.sparkSession
    val b = withBucket(batch)
    // bucket ids are bounded metadata (≤ nBuckets longs) — this collect
    // is a catalog lookup for partition pruning, not a data scan
    val buckets = b.select(bucketCol).distinct().collect().map(_.getLong(0))
    if (buckets.isEmpty) return
    val oldState = spark.read.parquet(statePath)
      .filter(col(bucketCol).isin(buckets: _*))
    // sever lineage before overwriting its input (read-overwrite hazard)
    val (newState, release) = graft.Lineage.checkpointed(Dedup.latestByKey(
      oldState.unionByName(b.select(oldState.columns.map(col): _*)),
      keys, order))
    try {
      // resolved BEFORE any write, while oldState's input files are
      // still intact (newState is checkpointed; oldState is not)
      val changed = MaterializedView.changedBuckets(newState, oldState, bucketCol)
      if (changed.isEmpty) return
      val changedState = newState.filter(col(bucketCol).isin(changed: _*))
      // the view write reads only the checkpointed newState, never the
      // served generations — the publish is atomic per GenerationStore,
      // and it precedes the state write per the crash contract above
      store.publish(
        clustered(withBucket(derive(changedState.drop(bucketCol)))),
        changed.toIndexedSeq)
      onAfterPublish()
      clustered(changedState).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(bucketCol).parquet(statePath)
    } finally release()
  }

  /** The published view (all buckets; add key-derived bucket filters
    * upstream for pruned point reads), resolved through the
    * generation manifest — a concurrent refresh can never make a bucket
    * disappear from this read. A view never published or currently
    * EMPTY has no parquet files (a partitioned write of zero rows emits
    * none), so the schema is reconstructed by deriving over zero state
    * rows instead of failing schema inference. */
  def view(spark: SparkSession): DataFrame =
    store.read(spark).getOrElse(derive(state(spark).limit(0)))

  /** The latest-row-per-key state store. */
  def state(spark: SparkSession): DataFrame =
    spark.read.parquet(statePath).drop(bucketCol)
}

object MaterializedView {

  /** (bucket, row-JSON) projection used for map-safe change detection:
    * comparisons on the fingerprint columns (long, string) are always
    * legal regardless of the state schema. Columns are serialized in
    * sorted name order with nulls KEPT (`ignoreNullFields=false` — the
    * default drops null fields, and while same-schema rows would still
    * collide identically, keeping them makes the encoding injective per
    * schema by inspection). */
  private[graft] def fingerprints(state: DataFrame, bucketCol: String): DataFrame = {
    val dataCols = state.columns.filter(_ != bucketCol).sorted
    // cast: a store read back through partition-column type inference can
    // carry the bucket as int while the in-flight side computes a long —
    // the anti-join key types must line up exactly
    state.select(col(bucketCol).cast("long").as(bucketCol),
      to_json(struct(dataCols.map(col): _*),
        Map("ignoreNullFields" -> "false")).as("__mv_row_json"))
  }

  /** Buckets whose latest-per-key fold CHANGED anything: new-state rows
    * whose fingerprint is absent from the old state (the fold never
    * drops a key, so new-minus-old captures every insert and update).
    * A LEFT ANTI join, not `exceptAll`: fingerprints embed their key so
    * rows are unique per side and the two are equivalent — but
    * exceptAll plans a sum-of-counts aggregate plus a
    * Generate(ReplicateRows) whose generator is interpreted
    * (CodegenFallback), while the anti join stays whole-stage-codegen
    * (pinned by PlanAuditSpec's heavies audit). Bounded metadata out:
    * ≤ nBuckets longs. */
  private[graft] def changedBuckets(
      newState: DataFrame, oldState: DataFrame, bucketCol: String): Array[Long] =
    fingerprints(newState, bucketCol)
      .join(fingerprints(oldState, bucketCol),
        Seq(bucketCol, "__mv_row_json"), "left_anti")
      .select(bucketCol).distinct().collect().map(_.getLong(0))
}
