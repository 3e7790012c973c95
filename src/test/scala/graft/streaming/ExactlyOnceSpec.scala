package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.sinks.EventSink

/** ST2's crash-window contract, end to end: deliverStream (foreachBatch)
  * + deliverBatchIdempotent under a mid-batch crash and a
  * restart-from-checkpoint replay.
  *
  *   - crash AFTER transport+state-append (before the checkpoint
  *     commit): the replayed batch must re-send NOTHING — the
  *     processed-ID anti-join absorbs the replay;
  *   - crash BETWEEN transport and state append: the replay re-sends
  *     exactly that batch once more (documented at-least-once window),
  *     and a further replay is clean.
  */
class ExactlyOnceSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def run(
      in: MemoryStream[(Long, String)],
      checkpoint: String,
      statePath: String,
      crashAfterAppend: Option[AtomicBoolean],
      crashBeforeAppend: Option[AtomicBoolean]): Unit = {
    val df = in.toDF().toDF("event_id", "payload")
    val q = Streams.deliverStream(df, checkpoint) { (batch, _) =>
      crashBeforeAppend.filter(_.get()).foreach { flag =>
        // transport succeeds, then we die before the state append
        EventSink.deliver(batch, "payload", b => b.foreach(ExactlyOnceSpec.sent.add))
        flag.set(false)
        throw new RuntimeException("injected crash BEFORE state append")
      }
      EventSink.deliverBatchIdempotent(
        batch, "event_id", "payload", statePath,
        b => b.foreach(ExactlyOnceSpec.sent.add))
      crashAfterAppend.filter(_.get()).foreach { flag =>
        flag.set(false)
        throw new RuntimeException("injected crash AFTER state append")
      }
    }
    try q.processAllAvailable()
    catch { case _: Exception => () } // the injected crash kills the query
    finally q.stop()
  }

  test("replay after a crash PAST the state append re-sends nothing") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    ExactlyOnceSpec.sent.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_eo1").toString
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "p1"), (2L, "p2"))
    val crash = new AtomicBoolean(true)
    run(in, s"$dir/ckpt", s"$dir/state", Some(crash), None)
    assert(!crash.get(), "the injected crash must have fired")
    val afterCrash = ExactlyOnceSpec.sent.toArray(Array.empty[String]).toSeq
    assert(afterCrash.sorted == Seq("p1", "p2"))
    // restart from the same checkpoint: the uncommitted batch replays,
    // the anti-join finds both ids in state → zero duplicate emission
    run(in, s"$dir/ckpt", s"$dir/state", None, None)
    val afterReplay = ExactlyOnceSpec.sent.toArray(Array.empty[String]).toSeq
    assert(afterReplay.sorted == Seq("p1", "p2"),
      s"replay duplicated delivery: $afterReplay")
    // and the stream keeps flowing normally afterwards
    in.addData((3L, "p3"))
    run(in, s"$dir/ckpt", s"$dir/state", None, None)
    val afterMore = ExactlyOnceSpec.sent.toArray(Array.empty[String]).toSeq
    assert(afterMore.sorted == Seq("p1", "p2", "p3"))
  }

  test("crash BETWEEN transport and append duplicates only the interrupted batch, once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    ExactlyOnceSpec.sent.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_eo2").toString
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "p1"), (2L, "p2"))
    val crash = new AtomicBoolean(true)
    run(in, s"$dir/ckpt", s"$dir/state", None, Some(crash))
    assert(!crash.get(), "the injected crash must have fired")
    // transport saw the batch once, but no state was appended
    assert(ExactlyOnceSpec.sent.size == 2)
    // replay: at-least-once window — the batch is re-sent exactly once
    // more, and THIS run appends state
    run(in, s"$dir/ckpt", s"$dir/state", None, None)
    val afterReplay = ExactlyOnceSpec.sent.toArray(Array.empty[String]).toSeq
    assert(afterReplay.sorted == Seq("p1", "p1", "p2", "p2"))
    // a third run replays nothing: duplicates were bounded to the one
    // interrupted batch
    run(in, s"$dir/ckpt", s"$dir/state", None, None)
    assert(ExactlyOnceSpec.sent.size == 4)
  }
}

object ExactlyOnceSpec {
  // static: transport closures serialize even in local mode
  val sent = new ConcurrentLinkedQueue[String]()
}
