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
  *     each view's committed snapshot version (`name:version` lines,
  *     atomically replaced through the same [[CommitProtocol]]);
  *   - readers resolve the catalog ONCE and read every view AT its
  *     pinned version ([[GenerationStore.readVersion]]) — all
  *     pre-cycle or all post-cycle, never a torn pair. A crash
  *     anywhere inside the cycle (even between two member publishes)
  *     leaves the catalog at the old snapshot, which names only
  *     versions that were committed and retained — still consistent.
  *
  * Retention contract: a member store must be built with
  * `keepVersions >= 2`, because between catalog commits the live
  * catalog pins each store's PREVIOUS version while new refreshes
  * archive new ones — under `keepVersions = 1` the next publish's GC
  * would delete the very generation the catalog still serves.
  * (`require`d at registration; the grace window scales with
  * keepVersions exactly as [[GenerationStore]] documents.)
  */
final class SnapshotCatalog(root: String, commit: CommitProtocol = RenameCommit) {

  private val manifestPath = new Path(root, "_CATALOG")

  // written under `synchronized`, read by unlocked readers — volatile
  // publishes the (immutable) map safely; registration is wiring-time,
  // so readers racing a register see a complete old or new map
  @volatile private var members: Map[String, GenerationStore] = Map.empty

  /** Bind a view name to its store. Registration is wiring, not IO. */
  def register(name: String, store: GenerationStore): this.type = synchronized {
    require(!name.contains(":") && !name.contains("\n"),
      s"view name must not contain ':' or newline: $name")
    require(store.keepVersions >= 2,
      s"catalog member '$name' needs keepVersions >= 2 (has " +
        s"${store.keepVersions}): the live catalog pins the previous " +
        "version while the next refresh archives a new one")
    members += name -> store
    this
  }

  private def conf(spark: SparkSession) = spark.sparkContext.hadoopConfiguration

  /** The live (view → pinned snapshot version) map; None = never
    * committed. Reading it ONCE and resolving every view from the same
    * map is what buys cross-view consistency. */
  def snapshot(spark: SparkSession): Option[Map[String, Long]] =
    commit.read(manifestPath, conf(spark)).map(
      _.linesIterator.filter(_.nonEmpty).map { line =>
        val i = line.lastIndexOf(':')
        line.substring(0, i) -> line.substring(i + 1).toLong
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
      .map { case (n, v) => s"$n:$v" }.mkString("\n")
    commit.write(manifestPath, text, conf(spark))
    versions
  }

  /** Read view `name` AT the live catalog snapshot. None = catalog
    * never committed, name unregistered or unpinned, or the pinned
    * version aged past the store's retention (a reader that slept
    * through keepVersions refresh cycles — the documented grace
    * window). */
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
