package graft.etl

import java.util.EnumSet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *     of every bucket. It is replaced ATOMICALLY (write to a temp
  *     name, rename-with-overwrite — `FileContext.rename(OVERWRITE)`,
  *     the atomic spelling on HDFS/POSIX; on an S3-style store
  *     substitute a conditional PUT of the manifest key, the protocol
  *     is unchanged);
  *   - readers resolve bucket paths THROUGH the manifest. A crash at
  *     any point before the swap leaves the old manifest intact — the
  *     reader serves the complete old state; after the swap it serves
  *     the complete new state. There is no instant at which a bucket
  *     is missing;
  *   - generations referenced by no live bucket (crashed partial
  *     writes, generations retired by the PREVIOUS swap) are
  *     garbage-collected at the START of the next publish — one full
  *     refresh interval of grace for in-flight readers holding
  *     already-resolved paths.
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
/** Small atomically-replaced text files (manifests, high-water marks):
  * write to a temp name, rename-with-OVERWRITE — readers see the whole
  * old or the whole new content, never a torn write. FileContext is
  * used throughout: its local impl is the raw filesystem (no checksum
  * sidecars to desynchronize across the rename) and it is the API that
  * spells atomic overwrite-rename. */
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
    val fc = FileContext.getFileContext(
      path.getFileSystem(conf).getUri, conf)
    val tmp = new Path(path.getParent,
      s"${path.getName}.tmp-${java.util.UUID.randomUUID()}")
    val out = fc.create(tmp,
      EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fc.rename(tmp, path, Options.Rename.OVERWRITE)
  }
}

final class GenerationStore(root: String, bucketCol: String) {

  private val manifestName = "_MANIFEST"
  private val manifestPath = new Path(root, manifestName)

  /** Test hook: runs after the new generation is fully written, before
    * the manifest swap — the widest crash window the protocol must
    * survive. */
  private[graft] var onBeforeSwap: () => Unit = () => ()

  private def conf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  private def fs(spark: SparkSession): FileSystem =
    new Path(root).getFileSystem(conf(spark))

  private def genDir(gen: Long): String = s"$root/gen=$gen"

  /** The live (bucket → generation) map; None = never published. */
  private[graft] def manifest(spark: SparkSession): Option[Map[Long, Long]] =
    AtomicText.read(manifestPath, conf(spark)).map {
      _.linesIterator.filter(_.nonEmpty).map { line =>
        val Array(b, g) = line.split(':')
        b.toLong -> g.toLong
      }.toMap
    }

  /** Publish `rows` (bucket column included, hive-partitioned by it) as
    * the new truth for exactly `buckets`; every other bucket keeps its
    * current generation. Crash-safe per the class protocol. */
  def publish(rows: DataFrame, buckets: Seq[Long]): Unit = {
    if (buckets.isEmpty) return
    val spark = rows.sparkSession
    val current = manifest(spark).getOrElse(Map.empty)
    gc(spark, current)
    val nextGen = (current.values.toSet + 0L).max + 1
    rows.write.mode("overwrite").partitionBy(bucketCol).parquet(genDir(nextGen))
    onBeforeSwap()
    swap(spark, current ++ buckets.map(_ -> nextGen))
  }

  /** Read the served view through the manifest: the union of each live
    * bucket's generation directory. None = never published (caller owns
    * the empty-schema fallback) — also the answer when every live
    * bucket is empty, since an empty bucket writes no files. */
  def read(spark: SparkSession): Option[DataFrame] =
    manifest(spark).flatMap { m =>
      val f = fs(spark)
      val paths = m.toSeq.sortBy(_._1).flatMap { case (b, g) =>
        val p = new Path(s"${genDir(g)}/$bucketCol=$b")
        if (f.exists(p)) Some(p.toString) else None
      }
      if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
    }

  /** Delete generation dirs no live bucket references and stale manifest
    * temp files — crashed partials and generations retired by the
    * previous swap (their in-flight readers have had a full refresh
    * interval to finish). */
  private def gc(spark: SparkSession, live: Map[Long, Long]): Unit = {
    val f = fs(spark)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) return
    val liveGens = live.values.toSet
    f.listStatus(rootPath).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("gen=") && !liveGens.contains(n.drop(4).toLong))
        f.delete(st.getPath, true)
      else if (n.startsWith(s"$manifestName.tmp-"))
        f.delete(st.getPath, false)
    }
  }

  private def swap(spark: SparkSession, m: Map[Long, Long]): Unit =
    AtomicText.write(manifestPath,
      m.toSeq.sorted.map { case (b, g) => s"$b:$g" }.mkString("\n"),
      conf(spark))
}
