package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** Hand-countable fixtures for the three operators whose DuckDB oracles
  * re-derive similar arithmetic (a bug symmetric across both engines
  * couldn't self-confirm there):
  *
  *   - `j14_session_overlap` — interval-overlap join: known session
  *     layouts including a pair sharing TWO hour buckets, which the
  *     bucket-ownership rule must emit exactly once;
  *   - `emb_semdedup` — a 20-vector corpus where the duplicate group,
  *     its component id and its sole survivor are known in closed form;
  *   - `stats_key_skew` — four keys with multiplicities 1,1,2,6 and
  *     every output value computed by hand.
  */
class OverlapSkewSemDedupSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SharedSpark.spark
  private var dir: String = _

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-03-01 $hhmm:00")

  override def beforeAll(): Unit = {
    val spark0 = spark
    import spark0.implicits._
    dir = Files.createTempDirectory("ovl_lake").toString

    // sessions (gap 30 min, end = last event + 30 min):
    //   u1: 10:00,10:10      -> [10:00, 10:40)
    //   u2: 10:20            -> [10:20, 10:50)   overlap u1∩u2 = 20 min
    //   u3: 12:00            -> [12:00, 12:30)   overlaps nobody
    //   u4: 13:00..15:00/20' -> [13:00, 15:30)
    //   u5: 13:10            -> [13:10, 13:40)   overlap u4∩u5 = 30 min, 1 shared bucket
    //   u6: 13:50,14:10      -> [13:50, 14:40)   overlap u4∩u6 = 50 min, 2 shared buckets
    val events = Seq(
      (1L, "10:00"), (1L, "10:10"),
      (2L, "10:20"),
      (3L, "12:00"),
      (4L, "13:00"), (4L, "13:20"), (4L, "13:40"), (4L, "14:00"),
      (4L, "14:20"), (4L, "14:40"), (4L, "15:00"),
      (5L, "13:10"),
      (6L, "13:50"), (6L, "14:10"))
    events.zipWithIndex
      .map { case ((u, t), i) => (i.toLong, ts(t), u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    // 16 orthogonal basis "anchors" (each its own centroid bucket) plus
    // four near-copies of e_2 with distinct off-axis noise: all five land
    // in bucket 2, pairwise cosine far above 0.35, and the keep-pick must
    // choose the LEAST centroid-similar member (vec 19, eps = 0.5).
    def basis(i: Int): Array[Float] = Array.tabulate(16)(j => if (j == i) 1f else 0f)
    def near2(eps: Float): Array[Float] =
      Array.tabulate(16)(j => if (j == 2) 1f else if (j == 5) eps else 0f)
    val emb = (0 until 16).map(i => (i.toLong, basis(i).toSeq, 0)) ++ Seq(
      (16L, near2(0.1f).toSeq, 0), (17L, near2(0.2f).toSeq, 0),
      (18L, near2(0.3f).toSeq, 0), (19L, near2(0.5f).toSeq, 0))
    emb.toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>"), $"label")
      .write.parquet(s"$dir/embeddings.parquet")

    // per-key order multiplicities 1,1,2,6 over keys 1..4
    val orders = Seq((1L, 1), (2L, 1), (3L, 2), (4L, 6))
      .flatMap { case (k, n) => (1 to n).map(i => (k * 100 + i, k)) }
    orders.toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
  }

  test("j14: overlap pairs, durations, and exactly-once cross-bucket emission") {
    val rows = SparkEntry.queries("j14_session_overlap")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val min_us = 60L * 1000000
    assert(rows == Map(
      (1L, 2L) -> ((1L, 20 * min_us)),
      (4L, 5L) -> ((1L, 30 * min_us)),
      (4L, 6L) -> ((1L, 50 * min_us))), rows.toString)
  }

  test("semdedup: one duplicate group, survivor = least centroid-similar") {
    val rows = SparkEntry.queries("emb_semdedup")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(4))))
      .toMap
    val grouped = Set(2L, 16L, 17L, 18L, 19L)
    // the e_2 anchor joins its near-copies' component (cos ≥ 0.89 to all)
    grouped.foreach { v => assert(rows(v)._1 == 2L, s"vec $v group ${rows(v)._1}") }
    assert(rows.filter { case (_, (g, _)) => g == 2L }.count(_._2._2) == 1)
    assert(rows(19L)._2, "vec 19 (largest eps, lowest c_sim) must survive")
    (0L until 16L).filterNot(_ == 2L).foreach { v =>
      assert(rows(v) == ((v, true)), s"anchor $v must be its own surviving group")
    }
  }

  test("skew stats: every field hand-computed") {
    val r = SparkEntry.queries("stats_key_skew")(spark, dir).collect().head
    assert(r.getLong(0) == 4L, "n_keys")
    assert(r.getLong(1) == 10L, "total_rows")
    assert(r.getLong(2) == 6L, "max_cnt")
    assert(r.getLong(3) == 4L, "top1_key")
    assert(r.getLong(4) == 1L, "p50: ceil(0.5*4)=2 -> cume 2 at cnt 1")
    assert(r.getLong(5) == 6L, "p90: ceil(3.6)=4 -> cnt 6")
    assert(r.getLong(6) == 6L, "p99")
    assert(r.getDouble(7) == 2.4, "skew = 6*4/10")
  }
}
