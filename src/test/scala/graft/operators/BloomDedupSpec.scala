package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** [[BloomDedup]]: the bounded-memory approximate-membership dedup
  * state. Pins the four properties the design leans on — no false
  * negatives (structural), bitset ≡ position-set decisions (the packed
  * form must not drift from the auditable form), OR-merge algebra
  * (idempotent + commutative, the at-least-once and shard-parallel
  * guarantee), and the bounded-rows claim itself. */
class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def docs(n: Int, tag: String): DataFrame = {
    val s0 = spark
    import s0.implicits._
    (0 until n).map(i => (i.toLong, s"$tag text body number $i")).toDF("doc_id", "text")
  }

  test("no false negatives: every absorbed key is flagged on re-screen") {
    val history = docs(200, "alpha")
    val state = BloomDedup.buildBitset(history, col("text"))
    val scr = BloomDedup.screen(history, col("text"), state, Seq("doc_id"))
    assert(scr.count() == 200)
    assert(scr.filter(!col("flagged")).count() == 0,
      "a key the filter absorbed must always be flagged")
  }

  test("bitset screen decisions == position-set membership recomputation") {
    val history = docs(300, "beta")
    val batch = docs(120, "gamma").unionByName(
      docs(300, "beta").filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000))
    val state = BloomDedup.buildBitset(history, col("text"))
    val viaBitset = BloomDedup.screen(batch, col("text"), state, Seq("doc_id"))
      .select("doc_id", "n_probes_set", "flagged").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap

    // independent replay off the position STRINGS (the auditable form)
    val hp = BloomDedup.positionsOf(history, col("text"))
    val viaPositions = batch
      .select(col("doc_id"), explode(BloomDedup.probePositions(col("text"))).as("pos"))
      .join(hp, Seq("pos"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    viaBitset.foreach { case (id, (nSet, flagged)) =>
      assert(nSet == viaPositions.getOrElse(id, 0L),
        s"packed and position-set hit counts drifted for $id")
      assert(flagged == (nSet == BloomDedup.DefaultK.toLong))
    }
    // replayed keys (ids >= 1000) must all be flagged
    assert(viaBitset.filter(_._1 >= 1000).values.forall(_._2))
  }

  test("OR-merge is idempotent and commutative; incremental == one-shot") {
    val a = BloomDedup.buildBitset(docs(100, "a"), col("text"))
    val b = BloomDedup.buildBitset(docs(100, "b"), col("text"))
    def rows(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(BloomDedup.mergeBitsets(a, a)) == rows(a), "merge(a,a) must equal a")
    assert(rows(BloomDedup.mergeBitsets(a, b)) == rows(BloomDedup.mergeBitsets(b, a)))
    val oneShot = BloomDedup.buildBitset(
      docs(100, "a").unionByName(docs(100, "b")), col("text"))
    assert(rows(BloomDedup.mergeBitsets(a, b)) == rows(oneShot),
      "shard-parallel build must equal the one-shot build")
  }

  test("state stays bounded: <= Words rows however many keys are absorbed") {
    val big = BloomDedup.buildBitset(docs(5000, "bulk"), col("text"))
    val n = big.count()
    assert(n <= BloomDedup.Words, s"bitset must stay <= ${BloomDedup.Words} rows, got $n")
    // 5000 keys x 2 probes into 4096 positions: the filter is saturated
    // enough that the bound is binding, not vacuous
    assert(n == BloomDedup.Words, "fixture should fill every word")
  }

  test("append-log state: load folds appends; compact preserves the fold") {
    val root = java.nio.file.Files.createTempDirectory("graft_bloom_state").toString
    val path = s"$root/state"
    val a = BloomDedup.buildBitset(docs(80, "s1"), col("text"))
    val b = BloomDedup.buildBitset(docs(80, "s2"), col("text"))
    BloomDedup.State.append(a, path)
    BloomDedup.State.append(b, path)
    // a replayed append must change nothing (OR-idempotent fold)
    BloomDedup.State.append(b, path)
    def rows(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val folded = rows(BloomDedup.State.load(spark, path))
    assert(folded == rows(BloomDedup.mergeBitsets(a, b)))
    BloomDedup.State.compact(spark, path)
    assert(rows(BloomDedup.State.load(spark, path)) == folded,
      "compact must preserve the folded state")
    val files = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"compact must fold the log to one file, got $files")
  }
}
