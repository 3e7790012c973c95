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
  *     versions that were committed and retained — still consistent.
  *
  * Retention contract: a member store must be built with
  * `keepVersions >= 2` (in-flight readers of the PREVIOUS catalog
  * snapshot get a full cycle of grace after a commit, exactly as
  * [[GenerationStore]] documents), and registration additionally
  * installs the catalog's pin into the store's GC
  * ([[GenerationStore.pinnedVersions]]): the version the live catalog
  * names is retained THROUGH any number of uncommitted member
  * refreshes — including at-least-once crash replays, each of which
  * publishes a fresh generation — so a committed catalog never ages
  * out; its pins release only when the next `commitCycle` moves them.
  */
final class SnapshotCatalog(root: String, commit: CommitProtocol = RenameCommit) {

  import SnapshotCatalog.{encodeField, ManifestLine}

  private val manifestPath = new Path(root, "_CATALOG")

  // written under `synchronized`, read by unlocked readers — volatile
  // publishes the (immutable) map safely; registration is wiring-time,
  // so readers racing a register see a complete old or new map
  @volatile private var members: Map[String, GenerationStore] = Map.empty

  /** Bind a view name to its store. Registration is wiring, not IO —
    * plus one GC-side effect: the store's garbage collector is taught
    * to additionally retain whatever version THIS catalog currently
    * pins for `name` (hooks compose across catalogs). */
  def register(name: String, store: GenerationStore): this.type = synchronized {
    require(!name.contains(":") && !name.contains("\n") && !name.contains("\r"),
      s"view name must not contain ':' or line breaks: $name")
    require(store.keepVersions >= 2,
      s"catalog member '$name' needs keepVersions >= 2 (has " +
        s"${store.keepVersions}): in-flight readers of the previous " +
        "catalog snapshot need a cycle of grace after each commit")
    members += name -> store
    val previousPins = store.pinnedVersions
    store.pinnedVersions =
      spark => previousPins(spark) ++ snapshot(spark).flatMap(_.get(name))
    this
  }

  private def conf(spark: SparkSession) = spark.sparkContext.hadoopConfiguration

  private def manifestLines(spark: SparkSession): Option[Seq[String]] =
    commit.read(manifestPath, conf(spark))
      .map(_.linesIterator.filter(_.nonEmpty).toSeq)

  /** The live (view → pinned snapshot version) map; None = never
    * committed. Reading it ONCE and resolving every view from the same
    * map is what buys cross-view consistency. Malformed or foreign
    * lines are SKIPPED, not thrown: a reader degrades to "that member
    * is unpinned" (readAll then refuses whole) instead of dying on a
    * StringIndexOutOfBounds. */
  def snapshot(spark: SparkSession): Option[Map[String, Long]] =
    manifestLines(spark).map(_.flatMap {
      case ManifestLine(name, v, _) => Some(name -> v)
      case _ => None
    }.toMap)

  /** Atomically commit the catalog at each registered view's CURRENT
    * committed snapshot version — called once per refresh cycle, after
    * every member's refresh has published. Members that have never
    * published are an error: a catalog naming a view with no readable
    * version would serve torn emptiness, not a snapshot. */
  def commitCycle(spark: SparkSession): Map[String, Long] = synchronized {
    val versions = members.map { case (name, store) =>
      val vs = store.versions(spark)
      require(vs.nonEmpty, s"catalog member '$name' has never published")
      name -> vs.last
    }
    val text = versions.toSeq.sortBy(_._1)
      .map { case (n, v) =>
        val store = members(n)
        s"$n:$v:${encodeField(store.bucketCol)}:${encodeField(store.root)}"
      }.mkString("\n")
    commit.write(manifestPath, text, conf(spark))
    versions
  }

  /** Read view `name` AT the live catalog snapshot. None = catalog
    * never committed, name unregistered or unpinned, or the pinned
    * version unreadable. */
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

  /** One well-formed manifest line: `(name, version, location)` where
    * location = Some((bucketCol, storeRoot)) on self-describing (v2)
    * lines, None on bare `name:version` (v1) lines. Anything else —
    * foreign content, a non-numeric version — fails the extractor
    * instead of throwing at the reader. */
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
    * exact pinned snapshot the coordinator committed. None = no catalog
    * manifest at `root`. A manifest whose lines predate the
    * self-describing format (or were corrupted out of it) cannot be
    * resolved cross-process and fails loudly rather than serving a
    * partial member set. The member stores are opened READ-ONLY in
    * spirit (nothing stops a publish, but an opened catalog is a
    * reader's handle; `keepVersions` on the handles never drives GC
    * because only publishes GC). `commit` applies to the catalog AND
    * the member handles: a deployment keeps one commit profile per
    * lake (the manifest records locations, not protocols) — mixing
    * profiles across members of one catalog is out of contract. */
  def open(
      spark: SparkSession,
      root: String,
      commit: CommitProtocol = RenameCommit): Option[SnapshotCatalog] = {
    val catalog = new SnapshotCatalog(root, commit)
    catalog.manifestLines(spark).map { lines =>
      val parsed = lines.map {
        case ManifestLine(name, _, Some((bucketCol, storeRoot))) =>
          name -> (bucketCol, storeRoot)
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
