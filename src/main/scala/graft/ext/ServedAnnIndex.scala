package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.GenerationStore

/** An IVF index SERVED from the lake — the ANN operators
  * ([[Similarity]]) composed with the serving layer
  * ([[graft.etl.GenerationStore]]), closing the gap between "we can
  * compute IVF top-k over a frame" and "a production retrieval tier
  * keeps an index on disk, appends each ingest batch, and answers
  * queries while doing so":
  *
  *   - POSTINGS live in a generation store hive-partitioned by their
  *     centroid bucket, so one search's scan statically prunes to its
  *     `nprobe` probed bucket DIRECTORIES — the (k−nprobe)/k of the
  *     corpus a probe skips is skipped on DISK, the property the
  *     in-memory `ivfTopKQuantized` documents for externally-stored
  *     inverted lists, here made the index's own layout;
  *   - CENTROIDS ride the SAME store in one reserved bucket
  *     ([[ServedAnnIndex.CentroidBucket]], schema-shaped as posting
  *     rows), so one manifest versions both halves: a search that
  *     resolved centroids from version N can never score postings from
  *     version N±1 — the torn read that mis-probes (the bucket ranking
  *     and the bucket contents must come from the same index build);
  *   - every search resolves ONE archived manifest
  *     ([[GenerationStore.readBucketsAt]]) — concurrent `add`
  *     publishes move the live manifest, never the search's pinned
  *     version, and `keepVersions` plus the [[graft.etl.SnapshotCatalog]]
  *     pin hook give in-flight searches the same grace the view stack's
  *     readers get (a served index is a catalog member like any view:
  *     registering it pins index version and corpus-view version in one
  *     cross-view snapshot).
  *
  * Incremental contract (same doctrine as the screens'
  * `IncrementalIndexParitySpec`): centroids are FROZEN at [[build]];
  * [[add]] assigns each batch against the served centroid set and
  * rewrites only the touched buckets — per-batch cost is the batch's
  * buckets, never the index. Re-adding a vec_id is an idempotent
  * replay (same embedding ⇒ same rows after the merge dedup); a
  * re-EMBEDDED vec_id must arrive as delete + insert, like any
  * re-keyed row in the bucketed stores. Retraining centroids = a new
  * [[build]] (which publishes a complete new generation set
  * atomically — readers keep the old index until the swap).
  *
  * 100 TB posture: build is one assignment pass over the corpus plus a
  * bucket-clustered write; add is O(batch + touched buckets); search
  * reads k centroid rows + nprobe bucket directories. Nothing driver-
  * side exceeds the centroid table (k rows of metadata — the blessed
  * `probedCentroidIds` standing).
  */
final class ServedAnnIndex(
    root: String,
    nCentroids: Int,
    nAssign: Int = 1,
    keepVersions: Int = 2) {

  import ServedAnnIndex.CentroidBucket

  private val bucketCol = "__ivf_bucket"

  /** The manifest-protocol store — register it in a
    * [[graft.etl.SnapshotCatalog]] to pin index searches to the same
    * cycle as the corpus views they serve. */
  val store = new GenerationStore(s"$root/index", bucketCol, keepVersions)

  /** Committed index versions readable right now. */
  def versions(spark: SparkSession): Seq[Long] = store.versions(spark)

  private def postingShape(assigned: DataFrame): DataFrame =
    assigned.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding"), col("centroid_id").cast("long").as("centroid_id"))

  /** Train centroids (deterministic id-init, the replayable stand-in
    * the ANN differentials use), assign the corpus, publish postings +
    * centroid rows as one atomic generation set. Returns the committed
    * index version. */
  def build(vectors: DataFrame): Long = {
    val v = vectors.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val centroids = Similarity.trainCentroidsById(v, nCentroids)
    val postings = postingShape(
      Similarity.assignToCentroids(v, centroids, nAssign = nAssign))
    val centroidRows = centroids.select(
      col("centroid_id").as("vec_id"),
      col("centroid").as("embedding"),
      col("centroid_id"))
    // bucket ids are the centroid ids themselves (k rows of metadata)
    val bucketIds = centroids.select("centroid_id")
      .collect().map(_.getLong(0)).toSeq
    // centroid rows carry centroid_id = CentroidBucket, so one rule
    // places every row: bucket = its centroid_id
    val rows = postings
      .unionByName(centroidRows.withColumn("centroid_id", lit(CentroidBucket)))
      .withColumn(bucketCol, col("centroid_id"))
    // a REBUILD must fully replace the index: the store's publish
    // carries forward every unlisted bucket, so a retrain whose
    // centroid-id set differs from the previous build would otherwise
    // leave the old build's posting buckets live in the manifest (full
    // reads mixing two builds, GC retaining them forever). Advancing
    // the previous live bucket ids alongside the new ones publishes
    // them as EMPTY in the new generation — resolve treats a bucket
    // with no files as absent — so the swap is a complete replacement.
    val prevBuckets = store.manifest(v.sparkSession)
      .map(_.keySet).getOrElse(Set.empty[Long])
    store.publish(rows,
      (prevBuckets ++ bucketIds + CentroidBucket).toSeq.sorted)
  }

  /** The frozen centroid table exactly as version `v` serves it. */
  def centroidsAt(spark: SparkSession, v: Long): Option[DataFrame] =
    store.readBucketsAt(spark, v, Seq(CentroidBucket)).map(
      _.select(col("vec_id").as("centroid_id"), col("embedding").as("centroid")))

  /** Append an ingest batch: assign against the SERVED (frozen)
    * centroids, merge into only the touched buckets, publish — one
    * atomic manifest swap, untouched buckets never opened. Returns the
    * new committed version (or the current one for an empty batch). */
  def add(batch: DataFrame): Long = {
    val spark = batch.sparkSession
    val v = store.versions(spark).lastOption.getOrElse(
      throw new IllegalStateException(s"ServedAnnIndex at $root was never built"))
    val centroids = centroidsAt(spark, v).getOrElse(
      throw new IllegalStateException(s"index version $v lost its centroid bucket"))
    val assigned = postingShape(Similarity.assignToCentroids(
      batch.select(col("vec_id").cast("long").as("vec_id"), col("embedding")),
      centroids, nAssign = nAssign))
    // touched buckets: bounded by the centroid count — metadata
    val touched = assigned.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    if (touched.isEmpty) return v
    val existing = store.readBuckets(spark, touched)
      .map(_.select("vec_id", "embedding", "centroid_id"))
      .getOrElse(assigned.limit(0))
    val merged = existing.unionByName(assigned)
      .dropDuplicates("vec_id", "centroid_id")
    store.publish(merged.withColumn(bucketCol, col("centroid_id")), touched)
  }

  /** IVF top-k against the LIVE index version. None = never built. */
  def search(spark: SparkSession, query: Seq[Float], k: Int,
      nprobe: Int = 2): Option[DataFrame] =
    store.versions(spark).lastOption.flatMap(searchAt(spark, _, query, k, nprobe))

  /** IVF top-k against index version `v` — centroid ranking, bucket
    * pruning and candidate scoring all resolved from that ONE archived
    * manifest, so a publish landing mid-search changes nothing this
    * search reads. The candidate scan's file list holds only the
    * probed buckets (+ the centroid bucket) — pinned by spec. */
  def searchAt(spark: SparkSession, v: Long, query: Seq[Float], k: Int,
      nprobe: Int = 2): Option[DataFrame] =
    for {
      centroids <- centroidsAt(spark, v)
      probed = Similarity.probedCentroidIds(centroids, query, nprobe)
      postings <- store.readBucketsAt(spark, v, probed)
    } yield Similarity.ivfTopK(
      postings.select("vec_id", "embedding", "centroid_id"),
      centroids, query, k, nprobe)
}

object ServedAnnIndex {
  /** The reserved bucket holding the centroid rows — outside the
    * centroid-id space (ids are non-negative vec_ids). */
  val CentroidBucket: Long = -1L
}
