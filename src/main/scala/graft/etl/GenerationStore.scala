package graft.etl

import java.util.EnumSet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small atomically-replaced text files (manifests, high-water marks):
  * readers see the whole old or the whole new content, never a torn
  * write. THREE commit profiles, one per filesystem class — do NOT
  * collapse them back into one Hadoop path (the r14 races that forced
  * the split are spelled out at the branch below):
  *
  *   - LOCAL (`file` scheme): pure NIO — temp file + fsync + POSIX
  *     ATOMIC_MOVE. Hadoop's local FileContext is NOT usable here: its
  *     rename(OVERWRITE) is delete-then-rename (a missing-destination
  *     window), and it is LocalFs = ChecksumFs (hidden `.crc` sidecars
  *     that orphan across an atomic data move);
  *   - HDFS (any hflush-capable remote FS): FileContext temp write +
  *     hsync + rename(OVERWRITE), which IS atomic server-side there;
  *   - OBJECT STORES (no atomic rename at all): not this class —
  *     [[ScanCommit]] replaces the rename protocol entirely
  *     (immutable sequenced keys, highest-valid-wins). */
private[graft] object AtomicText {

  def read(path: Path, conf: Configuration): Option[String] = {
    val fc = FileContext.getFileContext(
      path.getFileSystem(conf).getUri, conf)
    if (!fc.util.exists(path)) None
    else {
      val in = fc.open(path)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  def write(path: Path, text: String, conf: Configuration): Unit = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val fs = path.getFileSystem(conf)
    // LOCAL profile, pure NIO end-to-end. Two Hadoop-local defects force
    // this (both caught by specs hammering the protocol):
    //   - FileContext.rename(OVERWRITE) delegates to the default
    //     delete-then-rename, leaving a window where the destination
    //     DOES NOT EXIST — a concurrent reader observes "never
    //     published" instead of old-or-new (SnapshotRaceSpec);
    //   - the "file" FileContext is LocalFs = ChecksumFs: every temp
    //     write plants a hidden .crc sidecar that an atomic data-file
    //     move must orphan — one leaked root file per commit, caught by
    //     the 200-cycle MaintenanceSoakSpec.
    // POSIX rename(2) via ATOMIC_MOVE replaces the destination in one
    // atomic step; force(true) persists data BEFORE the rename commits
    // the name (a machine crash can otherwise reorder the flush after
    // the rename and commit a torn marker). Temp naming keeps the
    // `.tmp-` infix so the store GC recognizes crash leftovers.
    if (fs.getScheme == "file") {
      val dst = java.nio.file.Paths.get(fs.makeQualified(path).toUri.getPath)
      java.nio.file.Files.createDirectories(dst.getParent)
      val tmp = dst.getParent.resolve(
        s"${path.getName}.tmp-${java.util.UUID.randomUUID()}")
      val ch = java.nio.channels.FileChannel.open(tmp,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        ch.write(java.nio.ByteBuffer.wrap(bytes))
        ch.force(true)
      } finally ch.close()
      java.nio.file.Files.move(tmp, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // a store written by a pre-NIO build may carry a checksum sidecar
      // for this name; stale, it would fail every checksummed read of
      // the fresh content — remove it
      java.nio.file.Files.deleteIfExists(
        dst.getParent.resolve(s".${path.getName}.crc"))
      ()
    } else {
      // remote profile: HDFS rename is atomic server-side (object
      // stores use ScanCommit instead of this rename protocol)
      val fc = FileContext.getFileContext(fs.getUri, conf)
      val tmp = new Path(path.getParent,
        s"${path.getName}.tmp-${java.util.UUID.randomUUID()}")
      val out = fc.create(tmp,
        EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
        Options.CreateOpts.createParent())
      try {
        out.write(bytes)
        // persist to disk before the rename commits the name
        try out.hsync()
        catch { case _: UnsupportedOperationException => out.hflush() }
      } finally out.close()
      fc.rename(tmp, path, Options.Rename.OVERWRITE)
    }
  }
}

/** Atomic publish protocol for a bucket-partitioned SERVED view — the
  * piece that closes the serving gap the plain delete-then-append
  * publish had (reference: the warehouse serves its views
  * transactionally — `sql/customer_360_views.sql` are Redshift views, a
  * reader never observes a half-refreshed state; our lake publish must
  * give the same guarantee).
  *
  * Layout and protocol:
  *
  *   - view data lives in immutable GENERATION directories
  *     `{root}/gen=N/{bucket}=K/…`; a publish writes the refreshed
  *     buckets' rows to a brand-new generation — never touching any
  *     directory a reader could currently hold;
  *   - a single small MANIFEST file (`{root}/_MANIFEST`, one
  *     `bucket:generation` line per bucket) names the live generation
  *     of every bucket. It is replaced ATOMICALLY through a pluggable
  *     [[CommitProtocol]] — [[RenameCommit]] (temp name +
  *     rename-with-overwrite, the atomic spelling on HDFS/POSIX) by
  *     default, [[ScanCommit]] (immutable sequenced keys + validated
  *     frames, highest-valid-wins — no atomic rename assumed) for
  *     object stores; the store protocol is identical under either;
  *   - readers resolve bucket paths THROUGH the manifest. A crash at
  *     any point before the swap leaves the old manifest intact — the
  *     reader serves the complete old state; after the swap it serves
  *     the complete new state. There is no instant at which a bucket
  *     is missing;
  *   - every committed swap also archives its manifest as
  *     `_MANIFEST.v{N}` (N = the swap's generation id), giving
  *     Iceberg-style SNAPSHOT READS: [[readVersion]] serves the exact
  *     state any retained version published. `keepVersions` bounds the
  *     history — generations referenced by the current manifest or the
  *     last `keepVersions` committed version manifests survive GC;
  *     everything older (plus crashed partial writes and manifest
  *     temps) is deleted at the START of the next publish, so
  *     in-flight readers always get at least one full refresh interval
  *     of grace.
  *
  * A bucket whose refreshed view rows are EMPTY still advances to the
  * new generation in the manifest (its generation dir simply has no
  * files for it), so "this bucket is now empty" publishes atomically
  * too — the failure mode dynamic partition overwrite can't express.
  *
  * All filesystem access goes through the Hadoop `FileSystem`/
  * `FileContext` the writers use — no `java.io.File` mutation of
  * served data.
  */
final class GenerationStore(
    val root: String,
    val bucketCol: String,
    val keepVersions: Int = 1,
    commit: CommitProtocol = RenameCommit) {

  require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")

  private val manifestName = "_MANIFEST"
  private val manifestPath = new Path(root, manifestName)
  private val versionRe = raw"_MANIFEST\.v(\d+)$$".r

  /** Test hook: runs after the new generation is fully written, before
    * the manifest swap — the widest crash window the protocol must
    * survive. */
  private[graft] var onBeforeSwap: () => Unit = () => ()

  /** Pin hooks: versions EXTERNALLY PINNED beyond the `keepVersions`
    * window — consulted at each publish's GC, which retains them (and
    * their generations) in addition to the rolling window. Installed by
    * [[SnapshotCatalog.register]] so the versions the catalog's
    * retained snapshots name can never be collected, no matter how many
    * uncommitted refreshes — crash replays included, each of which
    * publishes a fresh generation — land between two catalog commits.
    * Hooks COMPOSE across keys (a store can serve several catalogs) and
    * installation is IDEMPOTENT per key: re-registering the same
    * (catalog, name) — e.g. re-wiring after a restart in a long-lived
    * JVM — replaces that key's hook instead of stacking a duplicate
    * read per publish, and the concurrent-map write cannot drop a
    * sibling catalog's hook the way a read-modify-write on a shared
    * field could. Hooks must be cheap (a few small manifest reads) and
    * must not call back into this store's publish path. */
  private val pinHooks =
    new java.util.concurrent.ConcurrentHashMap[AnyRef, SparkSession => Set[Long]]()

  private[graft] def installPinHook(
      key: AnyRef, hook: SparkSession => Set[Long]): Unit = {
    pinHooks.put(key, hook)
    ()
  }

  private[graft] def pinnedVersions(spark: SparkSession): Set[Long] = {
    import scala.jdk.CollectionConverters._
    pinHooks.values.asScala.toSeq.flatMap(_(spark)).toSet
  }

  /** Test probe: how many distinct pin hooks are installed — the
    * idempotence contract (re-wiring replaces, never stacks) is about
    * this count, which set-valued `pinnedVersions` cannot reveal. */
  private[graft] def pinHookCount: Int = pinHooks.size()

  private def conf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  private def fs(spark: SparkSession): FileSystem =
    new Path(root).getFileSystem(conf(spark))

  private def genDir(gen: Long): String = s"$root/gen=$gen"
  private def versionPath(v: Long): Path = new Path(root, s"$manifestName.v$v")
  private val schemaVersionRe =
    (raw"${java.util.regex.Pattern.quote(MaterializedView.SchemaSidecar)}" +
      raw"\.v(\d+)$$").r
  private def schemaVersionPath(v: Long): Path =
    new Path(root, s"${MaterializedView.SchemaSidecar}.v$v")

  private def parse(text: String): Map[Long, Long] =
    text.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(b, g) = line.split(':')
      b.toLong -> g.toLong
    }.toMap

  /** The live (bucket → generation) map; None = never published. */
  private[graft] def manifest(spark: SparkSession): Option[Map[Long, Long]] =
    commit.read(manifestPath, conf(spark)).map(parse)

  /** The archived manifest of version `v`, if retained. */
  private[graft] def manifestAt(spark: SparkSession, v: Long): Option[Map[Long, Long]] =
    commit.read(versionPath(v), conf(spark)).map(parse)

  /** All version ids with an archived manifest on disk, ascending
    * (crashed partials included until the next publish GCs them).
    * Physical children resolve to logical files through the commit
    * protocol (a multi-key encoding counts once). */
  def versionsOnDisk(spark: SparkSession): Seq[Long] = {
    val f = fs(spark)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) Seq.empty
    else f.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .flatMap(commit.logicalName)
      .distinct
      .collect { case versionRe(v) => v.toLong }
      .sorted
  }

  /** COMMITTED snapshot versions readable right now, ascending: archived
    * versions no newer than the current manifest (a version file newer
    * than the manifest is a crashed partial swap, never committed). */
  def versions(spark: SparkSession): Seq[Long] = {
    val maxCommitted = manifest(spark).map(maxGen).getOrElse(Long.MinValue)
    versionsOnDisk(spark).filter(_ <= maxCommitted)
  }

  private def maxGen(m: Map[Long, Long]): Long = (m.values.toSet + 0L).max

  /** Publish `rows` (bucket column included, hive-partitioned by it) as
    * the new truth for exactly `buckets`; every other bucket keeps its
    * current generation. Crash-safe per the class protocol. Returns the
    * committed snapshot version id.
    *
    * SCHEMA-EVOLUTION CONTRACT (serve-forever stores WILL evolve):
    *
    *   - a PARTIAL publish (some live bucket is carried forward, not
    *     republished) may only ADD columns: every column the live
    *     schema serves must appear in `rows` with the same type, or the
    *     publish is REFUSED — a carried-forward bucket's files cannot
    *     grow the dropped/retyped column, so the mixed read would
    *     corrupt, not evolve. Added columns are fine: live reads
    *     null-fill them for older generations (the documented
    *     mergeSchema-lite policy — the scan runs under the NEWEST
    *     schema and parquet back-fills absent columns with null);
    *   - a FULL publish (every live bucket republished) may change the
    *     schema freely — nothing old is carried forward;
    *   - every publish archives its schema beside its manifest
    *     (`_graft_schema.json.v{N}`), and snapshot reads
    *     ([[readVersion]]/[[readBucketsAt]]) resolve under the schema
    *     ARCHIVED AT that version — an old pin reads bit-identically
    *     no matter what later publishes added (they can't see columns
    *     that postdate them, and a column added before them keeps its
    *     position). A PRE-archive version (store written before
    *     schemas were versioned) resolves by merged footer inference —
    *     never the live sidecar, which a later full publish may
    *     legally have retyped. */
  def publish(rows: DataFrame, buckets: Seq[Long]): Long = {
    require(buckets.nonEmpty, "publish needs at least one bucket")
    val spark = rows.sparkSession
    val current = manifest(spark).getOrElse(Map.empty)
    val newSchema = org.apache.spark.sql.types.StructType(
      rows.schema.filter(_.name != bucketCol))
    val carried = current.keySet -- buckets.toSet
    if (carried.nonEmpty) readSchema(liveSchemaJson(spark)).foreach { live =>
      val newTypes = newSchema.map(f => f.name -> f.dataType).toMap
      val broken = live.filterNot(f =>
        newTypes.get(f.name).exists(GenerationStore.sameTypeIgnoreNullability(_, f.dataType)))
      require(broken.isEmpty,
        s"schema evolution on a partial publish may only ADD columns: " +
          s"buckets ${carried.toSeq.sorted.take(8).mkString(",")}… are " +
          s"carried forward but still serve ${broken.map(f =>
            s"${f.name}:${f.dataType.simpleString}").mkString(", ")}; " +
          "republish ALL buckets to drop or retype columns")
    }
    gc(spark, current)
    val nextGen = maxGen(current) + 1
    rows.write.mode("overwrite").partitionBy(bucketCol).parquet(genDir(nextGen))
    // schema sidecars at the ROOT (never inside a generation — gc
    // sweeps those): readers resolve leaf bucket dirs directly, so the
    // served schema is the data columns WITHOUT the bucket partition
    // column. Written per publish THROUGH the commit protocol
    // (ScanCommit's gc treats unsequenced strays as temps), read by
    // [[resolve]] to skip the per-read footer-inference job. The
    // version-archived copy FIRST (crash leaves an orphan the next gc
    // sweeps), then the live one.
    commit.write(schemaVersionPath(nextGen), newSchema.json, conf(spark))
    commit.write(new Path(root, MaterializedView.SchemaSidecar),
      newSchema.json, conf(spark))
    onBeforeSwap()
    swap(spark, current ++ buckets.map(_ -> nextGen), nextGen)
    nextGen
  }

  private def liveSchemaJson(spark: SparkSession): Option[String] =
    commit.read(new Path(root, MaterializedView.SchemaSidecar), conf(spark))

  /** The schema version `v` committed under. A version that predates
    * per-version schema archives resolves with NO pinned schema —
    * parquet footer inference, which reads the truth out of the files
    * themselves. Falling back to the LIVE sidecar would be wrong, not
    * just slow: a later FULL publish may legally retype or drop
    * columns, and a pre-archive pin read under that newer schema would
    * corrupt or fail instead of serving bit-identically. */
  private def schemaJsonAt(spark: SparkSession, v: Long): Option[String] =
    commit.read(schemaVersionPath(v), conf(spark))

  private def readSchema(json: Option[String]): Option[org.apache.spark.sql.types.StructType] =
    json.map(org.apache.spark.sql.types.DataType.fromJson(_)
      .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** Read the served view through the manifest: the union of each live
    * bucket's generation directory. None = never published (caller owns
    * the empty-schema fallback) — also the answer when every live
    * bucket is empty, since an empty bucket writes no files. */
  def read(spark: SparkSession): Option[DataFrame] =
    manifest(spark).flatMap(resolve(spark, _, liveSchemaJson(spark)))

  /** Bucket-scoped manifest read: just `buckets`' live rows (the
    * carry-forward input of a key-scoped refresh — untouched buckets
    * are never opened). None = never published, or those buckets are
    * all currently empty. */
  private[graft] def readBuckets(spark: SparkSession, buckets: Seq[Long]): Option[DataFrame] = {
    val want = buckets.toSet
    manifest(spark).flatMap(m =>
      resolve(spark, m.filter { case (b, _) => want(b) }, liveSchemaJson(spark)))
  }

  /** SNAPSHOT READ: the complete state exactly as committed version `v`
    * served it. None once the version has aged past `keepVersions` (or
    * never existed) — time travel is bounded by the retention the store
    * was built with. */
  def readVersion(spark: SparkSession, v: Long): Option[DataFrame] =
    if (!versions(spark).contains(v)) None
    else manifestAt(spark, v).flatMap(
      resolve(spark, _, schemaJsonAt(spark, v)))

  /** Bucket-scoped SNAPSHOT read: just `buckets`' rows exactly as
    * version `v` served them — the probe path of a served index
    * ([[graft.ext.ServedAnnIndex]]): resolving every bucket of one
    * search from ONE archived manifest makes the multi-read sequence
    * (centroid bucket, then the probed posting buckets) immune to a
    * publish landing in between, and the resolved path list contains
    * ONLY the requested buckets' directories, so the scan statically
    * prunes to them. None = version aged/never existed, or those
    * buckets are all empty at `v`. */
  private[graft] def readBucketsAt(
      spark: SparkSession, v: Long, buckets: Seq[Long]): Option[DataFrame] = {
    val want = buckets.toSet
    if (!versions(spark).contains(v)) None
    else manifestAt(spark, v).flatMap(m =>
      resolve(spark, m.filter { case (b, _) => want(b) },
        schemaJsonAt(spark, v)))
  }

  /** Union the manifested bucket dirs under `schemaJson` — the schema
    * the caller's version committed with (live sidecar for live reads),
    * so a snapshot read never sees columns that postdate it. Absent
    * sidecar = footer inference, the pre-sidecar fallback. */
  private def resolve(
      spark: SparkSession,
      m: Map[Long, Long],
      schemaJson: Option[String]): Option[DataFrame] = {
    val f = fs(spark)
    val paths = m.toSeq.sortBy(_._1).flatMap { case (b, g) =>
      val p = new Path(s"${genDir(g)}/$bucketCol=$b")
      if (f.exists(p)) Some(p.toString) else None
    }
    if (paths.isEmpty) None
    else readSchema(schemaJson) match {
      case Some(schema) => Some(spark.read.schema(schema).parquet(paths: _*))
      // no pinned schema (a pre-archive version): merge ALL footers —
      // a pre-archive manifest can legally mix generations with and
      // without an added column, and single-footer inference would
      // silently drop the column for every row depending on which file
      // won; the footer union null-fills, matching the live policy
      case None =>
        Some(spark.read.option("mergeSchema", "true").parquet(paths: _*))
    }
  }

  /** Delete what nothing retained references: generation dirs outside
    * the current manifest and the last `keepVersions` committed version
    * manifests, version files outside that window (including crashed
    * partial swaps newer than the manifest), and protocol-internal
    * temps. Control-file deletes go through the commit protocol so a
    * multi-key encoding is removed whole. */
  private def gc(spark: SparkSession, live: Map[Long, Long]): Unit = {
    val f = fs(spark)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) return
    val committed = versionsOnDisk(spark).filter(_ <= maxGen(live))
    // the rolling window PLUS any externally pinned versions (catalog
    // snapshots): a pin outside the window extends retention instead of
    // losing to it; a pin naming a version that never committed (or is
    // already gone) is ignored rather than resurrecting anything
    val retained = committed.takeRight(keepVersions).toSet ++
      pinnedVersions(spark).filter(committed.contains)
    val liveGens = retained.toSeq
      .flatMap(v => manifestAt(spark, v).map(_.values.toSet).getOrElse(Set.empty))
      .toSet ++ live.values.toSet
    f.listStatus(rootPath).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("gen=")) {
        if (!liveGens.contains(n.drop(4).toLong)) f.delete(st.getPath, true)
      } else commit.logicalName(n) match {
        case None => f.delete(st.getPath, false) // protocol temp
        case Some(versionRe(v)) if !retained.contains(v.toLong) =>
          commit.delete(new Path(root, s"$manifestName.v$v"), conf(spark))
        case Some(schemaVersionRe(v)) if !retained.contains(v.toLong) =>
          commit.delete(schemaVersionPath(v.toLong), conf(spark))
        case _ => () // live manifest/sidecar / retained version / foreign
      }
    }
  }

  private def swap(spark: SparkSession, m: Map[Long, Long], version: Long): Unit = {
    val text = m.toSeq.sorted.map { case (b, g) => s"$b:$g" }.mkString("\n")
    // archive FIRST: a crash between the two writes leaves a version
    // file newer than the manifest — never read (versions() filters it),
    // GC'd at the next publish
    commit.write(versionPath(version), text, conf(spark))
    commit.write(manifestPath, text, conf(spark))
  }
}

object GenerationStore {

  /** Structural type equality with nullability masked at every level —
    * the evolution check's comparator. A refresh batch routinely
    * differs from the served files only in `containsNull`/`nullable`
    * flags (an in-memory Seq encodes `array<float>` as nullable-element
    * where parquet round-trips it non-null); that is not evolution,
    * and refusing it would break every streaming ingest whose encoder
    * disagrees with parquet about a flag that carries no data. */
  private[etl] def sameTypeIgnoreNullability(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (a, b) match {
      case (ArrayType(ae, _), ArrayType(be, _)) =>
        sameTypeIgnoreNullability(ae, be)
      case (MapType(ak, av, _), MapType(bk, bv, _)) =>
        sameTypeIgnoreNullability(ak, bk) && sameTypeIgnoreNullability(av, bv)
      case (StructType(af), StructType(bf)) =>
        af.length == bf.length && af.zip(bf).forall { case (x, y) =>
          x.name == y.name && sameTypeIgnoreNullability(x.dataType, y.dataType)
        }
      case _ => a == b
    }
  }
}
