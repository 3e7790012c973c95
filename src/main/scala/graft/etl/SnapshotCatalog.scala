package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CROSS-VIEW snapshot isolation for a set of served views — the
  * guarantee one [[GenerationStore]] gives per view, lifted to the view
  * SET. The reference serves customer_360 as one warehouse schema
  * (`sql/customer_360_views.sql:23-742`): a consumer joining
  * customer_profiles to customer_segments inside one Redshift query
  * reads one transactionally-consistent database snapshot. Our lake
  * views are each individually atomic, but a reader joining two of them
  * MID-REFRESH-CYCLE could still see view A post-refresh next to view B
  * pre-refresh — segments computed from deals that profiles does not
  * show yet. (The big table formats share this gap: single-table
  * commits are atomic, cross-table transactions are not.)
  *
  * Protocol — one more level of the same manifest discipline:
  *
  *   - each view keeps its own [[GenerationStore]] and refreshes
  *     exactly as before, archiving snapshot versions;
  *   - after a refresh CYCLE (every member view refreshed from the same
  *     CDC cut) the coordinator commits ONE catalog manifest naming
  *     each view's committed snapshot version — SELF-DESCRIBING
  *     `name:version:bucketCol:storeRoot` lines (the location fields
  *     percent-escaped), atomically replaced through the same
  *     [[CommitProtocol]] — so an INDEPENDENT PROCESS can resolve the
  *     pinned snapshot from the lake alone ([[SnapshotCatalog.open]]),
  *     the way any client that connects to the reference's warehouse
  *     can read its views;
  *   - readers resolve the catalog ONCE and read every view AT its
  *     pinned version ([[GenerationStore.readVersion]]) — all
  *     pre-cycle or all post-cycle, never a torn pair. A crash
  *     anywhere inside the cycle (even between two member publishes)
  *     leaves the catalog at the old snapshot, which names only
  *     versions that were committed and retained — still consistent;
  *   - every committed cycle ALSO archives its manifest as
  *     `_CATALOG.v{N}` (the same snapshot-history discipline the
  *     member stores already run with `_MANIFEST.v{N}`), so the
  *     previous cross-view-consistent snapshot stays ADDRESSABLE after
  *     the next cycle commits — [[SnapshotCatalog.open]] with
  *     `atCycle` serves a point-in-time catalog read the way the
  *     reference's warehouse can serve a point-in-time query.
  *     `keepCycles` bounds the history; the live manifest carries a
  *     `!cycle=N` header naming its own cycle id (a header line never
  *     parses as a member, so pre-history readers skip it). Archive is
  *     written BEFORE the live swap: a crash between the two leaves an
  *     archived cycle newer than the live header — never served
  *     ([[cycles]] filters it), GC'd at the next commit.
  *
  * Retention contract: a member store must be built with
  * `keepVersions >= 2` (in-flight readers of the PREVIOUS catalog
  * snapshot get a full cycle of grace after a commit, exactly as
  * [[GenerationStore]] documents), and registration additionally
  * installs the catalog's pins into the store's GC
  * ([[GenerationStore.installPinHook]]): every member version named by
  * the live manifest OR a retained archived cycle is kept THROUGH any
  * number of uncommitted member refreshes — including at-least-once
  * crash replays, each of which publishes a fresh generation — so a
  * committed catalog snapshot never ages out while its cycle is
  * retained; its pins release only when the cycle leaves the
  * `keepCycles` window. Pin installation is idempotent per
  * (catalog, name) — re-wiring after a restart replaces the hook
  * instead of stacking manifest reads onto every member publish.
  */
final class SnapshotCatalog(
    root: String,
    commit: CommitProtocol = RenameCommit,
    keepCycles: Int = 2,
    pinnedAt: Option[Long] = None) {

  require(keepCycles >= 1, s"keepCycles must be >= 1, got $keepCycles")

  import SnapshotCatalog.{encodeField, CycleHeader, ManifestLine}

  private val manifestName = "_CATALOG"
  private val manifestPath = new Path(root, manifestName)
  private val versionRe = raw"_CATALOG\.v(\d+)$$".r
  private def versionPath(c: Long): Path = new Path(root, s"$manifestName.v$c")

  // written under `synchronized`, read by unlocked readers — volatile
  // publishes the (immutable) map safely; registration is wiring-time,
  // so readers racing a register see a complete old or new map
  @volatile private var members: Map[String, GenerationStore] = Map.empty

  /** Bind a view name to its store. Registration is wiring, not IO —
    * plus one GC-side effect: the store's garbage collector is taught
    * to additionally retain whatever versions THIS catalog's retained
    * cycles pin for `name` (hooks compose across catalogs and are
    * idempotent per (catalog, name)). */
  def register(name: String, store: GenerationStore): this.type = synchronized {
    require(!name.contains(":") && !name.contains("\n") && !name.contains("\r") &&
      !name.startsWith("!"),
      s"view name must not contain ':', line breaks, or lead with '!': $name")
    require(store.keepVersions >= 2,
      s"catalog member '$name' needs keepVersions >= 2 (has " +
        s"${store.keepVersions}): in-flight readers of the previous " +
        "catalog snapshot need a cycle of grace after each commit")
    members += name -> store
    // keyed by (normalized root, keepCycles, name), NOT instance
    // identity: re-wiring the same catalog through a fresh handle each
    // cycle (a long-lived JVM's natural shape) must REPLACE the hook —
    // not stack one manifest-read pass per dead handle onto every
    // member publish, nor retain the dead handles through the store's
    // hook map. keepCycles stays IN the key so two same-root handles
    // with different retention windows COMPOSE (pins union — wider
    // retention wins) instead of the narrower one silently clobbering
    // the wider one's pins; root is Path-normalized so '/p' and '/p/'
    // dedupe.
    store.installPinHook(
      (new Path(root).toString, keepCycles, name),
      spark => pinsFor(spark, name))
    this
  }

  private def conf(spark: SparkSession) = spark.sparkContext.hadoopConfiguration

  private def splitLines(text: String): Seq[String] =
    text.linesIterator.filter(_.nonEmpty).toSeq

  /** The manifest lines this handle serves: the live manifest, or — on
    * an `atCycle` handle — the archived manifest of that committed
    * cycle (None once it ages past `keepCycles`, or if it never
    * committed: a crashed partial archive is not a snapshot). */
  private def manifestLines(spark: SparkSession): Option[Seq[String]] =
    pinnedAt match {
      case None =>
        commit.read(manifestPath, conf(spark)).map(splitLines)
      case Some(c) =>
        if (!cycles(spark).contains(c)) None
        else commit.read(versionPath(c), conf(spark)).map(splitLines)
    }

  private def headerCycle(lines: Seq[String]): Option[Long] =
    lines.collectFirst { case CycleHeader(c) => c.toLong }

  /** The live manifest's own cycle id; None = never committed (or a
    * pre-history manifest without the header, which counts as cycle 0:
    * its snapshot is live-readable but has no archived history). */
  def liveCycle(spark: SparkSession): Option[Long] =
    commit.read(manifestPath, conf(spark)).map(splitLines)
      .map(headerCycle(_).getOrElse(0L))

  private def archivedOnDisk(spark: SparkSession): Seq[Long] = {
    val rootPath = new Path(root)
    val f = rootPath.getFileSystem(conf(spark))
    if (!f.exists(rootPath)) Seq.empty
    else f.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .flatMap(commit.logicalName)
      .distinct
      .collect { case versionRe(c) => c.toLong }
      .sorted
  }

  /** COMMITTED cycle ids addressable as point-in-time snapshots,
    * ascending: archived manifests no newer than the live header
    * (newer = a crashed partial commit, never served), capped at the
    * last `keepCycles` — an older archive may still sit on disk until
    * the next commit's GC, but its member-version pins are already
    * released, so serving it could resolve to collected generations. */
  def cycles(spark: SparkSession): Seq[Long] = {
    val live = liveCycle(spark).getOrElse(Long.MinValue)
    archivedOnDisk(spark).filter(_ <= live).takeRight(keepCycles)
  }

  /** Every member version pinned by the live manifest or a retained
    * archived cycle — the store-GC hook body. A handful of small
    * manifest reads per member publish; never calls back into a
    * store's publish path. */
  private def pinsFor(spark: SparkSession, name: String): Set[Long] = {
    val texts = commit.read(manifestPath, conf(spark)).toSeq ++
      cycles(spark).flatMap(c => commit.read(versionPath(c), conf(spark)))
    texts.flatMap(splitLines(_).collectFirst {
      case ManifestLine(n, v, _) if n == name => v
    }).toSet
  }

  /** The (view → pinned snapshot version) map this handle serves —
    * live, or the archived cycle for an `atCycle` handle; None = never
    * committed / cycle aged out. Reading it ONCE and resolving every
    * view from the same map is what buys cross-view consistency.
    * Malformed or foreign lines are SKIPPED, not thrown: a reader
    * degrades to "that member is unpinned" (readAll then refuses whole)
    * instead of dying on a StringIndexOutOfBounds. */
  def snapshot(spark: SparkSession): Option[Map[String, Long]] =
    manifestLines(spark).map(_.flatMap {
      case ManifestLine(name, v, _) => Some(name -> v)
      case _ => None
    }.toMap)

  /** Atomically commit the catalog at each registered view's CURRENT
    * committed snapshot version — called once per refresh cycle, after
    * every member's refresh has published. Members that have never
    * published are an error: a catalog naming a view with no readable
    * version would serve torn emptiness, not a snapshot. Not available
    * on an `atCycle` handle (a point-in-time read, not a coordinator).
    * Also archives the manifest as `_CATALOG.v{N}` and GCs archives
    * beyond `keepCycles` (plus crashed partials). */
  def commitCycle(spark: SparkSession): Map[String, Long] = synchronized {
    require(pinnedAt.isEmpty,
      "an atCycle catalog handle is a point-in-time reader; commitCycle " +
        "belongs to the live coordinator")
    val versions = members.map { case (name, store) =>
      val vs = store.versions(spark)
      require(vs.nonEmpty, s"catalog member '$name' has never published")
      name -> vs.last
    }
    val committed = cycles(spark)
    gcArchives(spark, committed)
    // next id clears both the archived history and the live header (a
    // pre-history manifest counts as cycle 0; an archive lost out of
    // band must not make us reuse the live id)
    val next = (committed ++ liveCycle(spark).toSeq :+ 0L).max + 1
    val text = (s"!cycle=$next" +: versions.toSeq.sortBy(_._1)
      .map { case (n, v) =>
        val store = members(n)
        s"$n:$v:${encodeField(store.bucketCol)}:${encodeField(store.root)}"
      }).mkString("\n")
    // archive FIRST: a crash between the two writes leaves an archived
    // cycle newer than the live header — never served, GC'd next commit
    commit.write(versionPath(next), text, conf(spark))
    commit.write(manifestPath, text, conf(spark))
    versions
  }

  /** Delete archived cycles outside the retained window, crashed
    * partial archives (newer than the live header), and catalog-file
    * temps. Only `_CATALOG*`-named children are ever touched — a
    * member store sharing the directory is out of contract but must
    * not be collateral. */
  private def gcArchives(spark: SparkSession, committed: Seq[Long]): Unit = {
    val rootPath = new Path(root)
    val f = rootPath.getFileSystem(conf(spark))
    if (!f.exists(rootPath)) return
    val retained = committed.takeRight(keepCycles).toSet
    f.listStatus(rootPath).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(manifestName)) commit.logicalName(n) match {
        case None => f.delete(st.getPath, false) // protocol temp
        case Some(versionRe(c)) if !retained.contains(c.toLong) =>
          commit.delete(versionPath(c.toLong), conf(spark))
        case _ => () // live manifest / retained cycle
      }
    }
  }

  /** Read view `name` AT this handle's snapshot. None = catalog
    * never committed (or pinned cycle aged out), name unregistered or
    * unpinned, or the pinned version unreadable. */
  def readView(spark: SparkSession, name: String): Option[DataFrame] =
    for {
      snap <- snapshot(spark)
      v <- snap.get(name)
      store <- members.get(name)
      df <- store.readVersion(spark, v)
    } yield df

  /** Every registered view resolved from ONE catalog read — the
    * consistent join input set. None if the catalog has never committed
    * or any member's pinned version is unreadable (all-or-nothing: a
    * partial map would be exactly the torn read this class exists to
    * prevent). */
  def readAll(spark: SparkSession): Option[Map[String, DataFrame]] =
    snapshot(spark).flatMap { snap =>
      val resolved = members.keys.toSeq.sorted.map { name =>
        name -> snap.get(name).flatMap(v =>
          members(name).readVersion(spark, v))
      }
      if (resolved.exists(_._2.isEmpty)) None
      else Some(resolved.map { case (n, d) => n -> d.get }.toMap)
    }
}

object SnapshotCatalog {

  /** Percent-escape a manifest field so the line stays one-per-view and
    * colon-splittable whatever characters a store root carries
    * ('%' first, so decoding is unambiguous). */
  private def encodeField(s: String): String =
    s.replace("%", "%25").replace(":", "%3A")
      .replace("\n", "%0A").replace("\r", "%0D")

  private def decodeField(s: String): String =
    s.replace("%0D", "\r").replace("%0A", "\n")
      .replace("%3A", ":").replace("%25", "%")

  /** The manifest's own cycle id: `!cycle=N`. Leads with '!' and
    * carries no ':' so [[ManifestLine]] can never mistake it for a
    * member (and member names may not lead with '!'). */
  private val CycleHeader = raw"!cycle=(\d{1,18})".r

  /** One well-formed manifest line: `(name, version, location)` where
    * location = Some((bucketCol, storeRoot)) on self-describing (v2)
    * lines, None on bare `name:version` (v1) lines. Anything else —
    * foreign content, a non-numeric version, the cycle header — fails
    * the extractor instead of throwing at the reader. */
  private object ManifestLine {
    private val re = raw"([^:]+):(\d{1,18})(?::([^:]*):([^:]*))?".r
    def unapply(line: String): Option[(String, Long, Option[(String, String)])] =
      line match {
        case re(name, v, null, null) => Some((name, v.toLong, None))
        case re(name, v, bc, root) =>
          Some((name, v.toLong, Some((decodeField(bc), decodeField(root)))))
        case _ => None
      }
  }

  /** Open a committed catalog FROM THE LAKE ALONE — no `register`
    * wiring, no shared JVM with the writer: the self-describing
    * manifest names each member's store root and bucket column, so a
    * fresh SparkSession (another process, another machine) resolves the
    * exact pinned snapshot the coordinator committed.
    *
    * `atCycle = Some(N)` opens the ARCHIVED manifest of committed
    * cycle N instead of the live one — the point-in-time read: after
    * cycle N+1 commits, `open(root, atCycle = N)` still resolves the
    * exact cross-view-consistent frame set cycle N published, as long
    * as N is within the coordinator's `keepCycles` window (member
    * versions named by retained cycles are pin-retained in member GC).
    * Pass the COORDINATOR's `keepCycles` when it differs from the
    * default — the addressable window is the writer's retention, and a
    * reader with a narrower window would refuse retained cycles while
    * a wider one would list cycles whose member pins are already
    * released. None = no catalog manifest at `root`, or the cycle aged
    * out / never committed.
    *
    * A manifest whose lines predate the self-describing format (or
    * were corrupted out of it) cannot be resolved cross-process and
    * fails loudly rather than serving a partial member set. The member
    * stores are opened READ-ONLY in spirit (nothing stops a publish,
    * but an opened catalog is a reader's handle; `keepVersions` on the
    * handles never drives GC because only publishes GC; an `atCycle`
    * handle refuses `commitCycle` outright). `commit` applies to the
    * catalog AND the member handles: a deployment keeps one commit
    * profile per lake (the manifest records locations, not protocols)
    * — mixing profiles across members of one catalog is out of
    * contract. */
  def open(
      spark: SparkSession,
      root: String,
      commit: CommitProtocol = RenameCommit,
      atCycle: Option[Long] = None,
      keepCycles: Int = 2): Option[SnapshotCatalog] = {
    val catalog = new SnapshotCatalog(root, commit, keepCycles, pinnedAt = atCycle)
    catalog.manifestLines(spark).map { lines =>
      val parsed = lines.flatMap {
        case CycleHeader(_) => None
        case ManifestLine(name, _, Some((bucketCol, storeRoot))) =>
          Some(name -> (bucketCol, storeRoot))
        case other =>
          throw new IllegalArgumentException(
            s"catalog manifest at $root is not self-describing " +
              s"(line ${other.take(80)}): cannot resolve members cross-process")
      }
      parsed.foreach { case (name, (bucketCol, storeRoot)) =>
        catalog.register(name,
          new GenerationStore(storeRoot, bucketCol, keepVersions = 2, commit))
      }
      catalog
    }
  }
}
