package graft.etl

import java.util.EnumSet
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}

/** How a [[GenerationStore]] durably replaces the content of a small
  * logical control file (the manifest and its version archives) such
  * that a concurrent reader — or one arriving after a crash at ANY
  * point — observes the complete old or the complete new content,
  * never a torn mixture. This is the ONE filesystem primitive the
  * serving contract rests on; everything else the store writes is
  * immutable generation data.
  *
  * Two shipped profiles:
  *   - [[RenameCommit]] — POSIX/HDFS: temp file + atomic
  *     rename-with-overwrite ([[AtomicText]]). One physical file per
  *     logical file.
  *   - [[ScanCommit]] — object-store profile: NO atomic rename (or
  *     overwrite) is assumed anywhere. Each commit writes a brand-new
  *     immutable sequenced key (`name.s<seq>`) carrying a length+CRC
  *     frame; readers list the name's keys and serve the
  *     HIGHEST-SEQUENCED VALID frame. A torn or half-copied key fails
  *     frame validation and is simply skipped — the previous key still
  *     serves. (On a real S3 a single PUT is already atomic; the frame
  *     additionally covers stores where even that is weak, and the
  *     fault-injection spec tears writes mid-copy to prove it.)
  *
  * The protocol also owns the NAMING of its physical keys:
  * [[logicalName]] maps a physical child of the store root back to the
  * logical file it encodes (None for protocol-internal temps), which is
  * what lets the store's GC and version listing treat a multi-key
  * encoding as one file.
  */
trait CommitProtocol {

  /** Atomically (in the reader-observable sense above) make `text` the
    * content of logical file `path`. */
  def write(path: Path, text: String, conf: Configuration): Unit

  /** The current complete content of logical file `path`, if any. */
  def read(path: Path, conf: Configuration): Option[String]

  /** Remove logical file `path` entirely (all physical keys). */
  def delete(path: Path, conf: Configuration): Unit

  /** Logical file encoded by physical child `fileName` of the store
    * root, or None if it is a protocol-internal temp (safe to GC). */
  def logicalName(fileName: String): Option[String]
}

/** POSIX/HDFS profile: the rename-based swap, one file per name. */
object RenameCommit extends CommitProtocol {
  override def write(path: Path, text: String, conf: Configuration): Unit =
    AtomicText.write(path, text, conf)
  override def read(path: Path, conf: Configuration): Option[String] =
    AtomicText.read(path, conf)
  override def delete(path: Path, conf: Configuration): Unit = {
    val fs = path.getFileSystem(conf)
    fs.delete(path, false)
    ()
  }
  override def logicalName(fileName: String): Option[String] =
    if (fileName.contains(".tmp-")) None else Some(fileName)
}

/** Object-store profile: immutable sequenced keys + validated frames,
  * highest-valid-wins. `keepKeys` bounds how many superseded keys a
  * name retains (in-flight readers of the previous key get one full
  * commit of grace, mirroring the generation GC's doctrine).
  *
  * Open for extension so the fault-injection spec can tear the key
  * write partway through ([[writeBytes]]) — production stores use it
  * as-is. */
class ScanCommit(keepKeys: Int = 2) extends CommitProtocol {

  require(keepKeys >= 1, s"keepKeys must be >= 1, got $keepKeys")

  private val seqRe = raw"(.*)\.s(\d+)$$".r
  private val header = "GRAFTC1"

  /** Raw byte write of one physical key — the NON-atomic step. The
    * spec's torn-write fake overrides this to fail midway, leaving a
    * partial key on disk. */
  protected def writeBytes(path: Path, bytes: Array[Byte], conf: Configuration): Unit = {
    val fc = FileContext.getFileContext(path.getFileSystem(conf).getUri, conf)
    val out = fc.create(path,
      EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(bytes) finally out.close()
  }

  private def frame(text: String): Array[Byte] = {
    val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val crc = new CRC32(); crc.update(body)
    (s"$header ${body.length} ${crc.getValue}\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)) ++ body
  }

  private def unframe(bytes: Array[Byte]): Option[String] = {
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 0) return None
    new String(bytes, 0, nl, "UTF-8").split(' ') match {
      case Array(`header`, len, crcS) =>
        val body = bytes.drop(nl + 1)
        if (body.length != len.toInt) None
        else {
          val crc = new CRC32(); crc.update(body)
          if (crc.getValue == crcS.toLong)
            Some(new String(body, java.nio.charset.StandardCharsets.UTF_8))
          else None
        }
      case _ => None
    }
  }

  /** All (seq, key) physical keys of `path`, ascending by seq. */
  private def keysOf(path: Path, conf: Configuration): Seq[(Long, Path)] = {
    val fs = path.getFileSystem(conf)
    val parent = path.getParent
    if (!fs.exists(parent)) Seq.empty
    else fs.listStatus(parent).toSeq.map(_.getPath).flatMap { p =>
      p.getName match {
        case seqRe(base, seq) if base == path.getName => Some(seq.toLong -> p)
        case _ => None
      }
    }.sortBy(_._1)
  }

  override def write(path: Path, text: String, conf: Configuration): Unit = {
    val fs = path.getFileSystem(conf)
    val existing = keysOf(path, conf)
    val next = existing.lastOption.map(_._1 + 1).getOrElse(1L)
    // the commit point: the new key becoming a complete valid frame.
    // A crash/tear before that leaves an invalid or absent key —
    // readers keep serving the previous one.
    writeBytes(new Path(path.getParent, s"${path.getName}.s$next"),
      frame(text), conf)
    // retention: drop all but the newest keepKeys superseded keys
    existing.dropRight(keepKeys - 1).foreach { case (_, p) => fs.delete(p, false) }
  }

  override def read(path: Path, conf: Configuration): Option[String] = {
    val fs = path.getFileSystem(conf)
    keysOf(path, conf).reverseIterator.flatMap { case (_, p) =>
      // A key listed a moment ago may be gone by open time: write()'s
      // retention deletes superseded keys immediately, so a concurrent
      // publisher races this reader by design. Any IO failure on one
      // key is treated exactly like an invalid frame — fall through to
      // the next older key — preserving complete-old-or-new.
      try {
        val in = fs.open(p)
        val bytes =
          try {
            val buf = new java.io.ByteArrayOutputStream()
            val chunk = new Array[Byte](8192)
            var n = in.read(chunk)
            while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
            buf.toByteArray
          } finally in.close()
        unframe(bytes)
      } catch {
        // deleted-after-list is the EXPECTED publisher race — silent
        case _: java.io.FileNotFoundException => None
        // any other IO failure still falls through (the older key keeps
        // complete-old-or-new intact) but is logged: a persistent storage
        // fault must be diagnosable, not masked as staleness
        case e: java.io.IOException =>
          System.err.println(
            s"graft ScanCommit.read: skipping $p after IO error: $e")
          None
      }
    }.nextOption()
  }

  override def delete(path: Path, conf: Configuration): Unit = {
    val fs = path.getFileSystem(conf)
    keysOf(path, conf).foreach { case (_, p) => fs.delete(p, false) }
  }

  override def logicalName(fileName: String): Option[String] =
    fileName match {
      case seqRe(base, _) => Some(base)
      case _ => None // unsequenced strays in this profile are temps
    }
}
