package graft.etl

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.{SharedSpark, SparkEntry}

/** The export writer against the REAL capstone output at sf0.001:
  * partition layout, shard-size bound, loss-free round trip (the
  * read-back manifest's checksums must equal checksums recomputed from
  * the in-memory frame — proving the write/read cycle dropped and
  * duplicated nothing), and idempotent re-export. */
class TrainingExportSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val SeqsPerShard = 4

  test("capstone sequences export loss-free into bounded (source, shard) partitions") {
    val seqs = SparkEntry.queries("corpus_training_tokens")(
      spark, "/root/testdata/sf0.001")
    val root = Files.createTempDirectory("graft_export").toString
    val mf = TrainingExport.exportSequences(seqs, root, SeqsPerShard).collect()
    assert(mf.nonEmpty)
    // every shard holds at most SeqsPerShard sequences
    assert(mf.forall(_.getLong(2) <= SeqsPerShard), mf.mkString("; "))
    // totals reconcile with the source frame
    val expTotal = seqs.agg(count(lit(1)), sum(col("n_tokens"))).head()
    assert(mf.map(_.getLong(2)).sum == expTotal.getLong(0))
    assert(mf.map(_.getLong(3)).sum == expTotal.getLong(1))
    // checksum parity: manifest-from-disk == manifest-from-frame
    val fromFrame = TrainingExport.manifest(
        seqs.withColumn("shard", (col("seq_id") / SeqsPerShard).cast("long")))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(5)).toMap
    mf.foreach { r =>
      assert(fromFrame((r.getString(0), r.getLong(1))) == r.getString(5),
        s"checksum drift in shard (${r.getString(0)}, ${r.getLong(1)})")
    }
    // partition layout on disk: source=... / shard=... directories
    val srcDirs = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(srcDirs.forall(_.startsWith("source=")), srcDirs.mkString(","))
    // idempotent re-export: same manifest
    val mf2 = TrainingExport.exportSequences(seqs, root, SeqsPerShard).collect()
    assert(mf2.map(_.toString).sorted.sameElements(mf.map(_.toString).sorted))
    seqs.unpersist()
  }
}
