package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.activation.Activation
import graft.functions.Cleansing
import graft.sinks.EventSink
import graft.streaming.Streams
import graft.views.Customer360

/** The reference's operational loop as ONE running system
  * (`scripts/lambda_redshift_to_segment.py:137-209` reads
  * `marketing.validated_vehicle_sales` incrementally and ships Segment
  * events): a CDC stream of deal rows maintains the validated-sales
  * AggregateView through `Streams.maintainFacts`, and after each
  * micro-batch the activation side reads the PUBLISHED view
  * incrementally (`Activation.nextBatch` against the processed-ID
  * state), shapes Segment track events and delivers them idempotently
  * (`EventSink.deliverBatchIdempotent`). Pinned:
  *
  *   - streamed view == batch full rebuild over everything delivered;
  *   - the union of incrementally emitted events == the batch
  *     pipeline's one-shot event set over the final state, with zero
  *     duplicate deliveries;
  *   - one injected CDC replay (at-least-once delivery) publishes no
  *     generation and emits no event.
  *
  * CDC slices are CUSTNO-partitioned: a customer's deals all arrive in
  * one batch, so already-shipped events' purchase sequences never shift
  * afterwards — the regime in which the reference's "processed deals
  * are never re-sent" contract keeps shipped payloads equal to the
  * final-state batch pipeline's. Cross-batch VERSION updates of a deal
  * ride inside their customer's batch (the fold picks the winner).
  */
class ActivationLoopSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def events(view: DataFrame, dimState: DataFrame,
      processed: DataFrame): DataFrame = {
    val feed = Activation.feedFromValidatedSales(view,
      Customer360.marketableContactsOfLatest(dimState))
    Activation.toSegmentTrackEvents(Activation.cleanAndValidate(
      Activation.nextBatch(feed, processed,
        lit("1990-01-01").cast("timestamp"), lit("2030-01-01").cast("timestamp"),
        limit = 1000000)))
  }

  test("CDC stream → validated-sales view → incremental activation, exactly-once") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("graft_actloop").toString
    val statePath = s"$root/processed"

    val dims = DomainQueries.customerMaster(spark, dir)
      .filter(Cleansing.notSoftDeleted(col("isdeleted"), col("deletedataflag")))
      .select(Customer360.MarketableContactCols.map(col): _*)
    val facts = DomainQueries.vehicleSales(spark, dir)
      .filter(col("custno").isNotNull && col("vin").isNotNull &&
        col("contractdate").isNotNull)
      .select(Customer360.ValidatedSalesSourceCols.map(col): _*)
      .persist()
    val custL = col("custno").cast("long")
    val slice1 = custL % 7 === 0
    val slice2 = custL % 7 === 1

    val av = DomainQueries.validatedSalesAggregateView(s"$root/av")
    av.build(dims, facts.filter(!slice1 && !slice2))

    // transport records into a STATIC queue: closures are serialized
    // even in local mode, so a captured local would collect into a copy
    val sent = ActivationLoopSpec.sent
    sent.clear()
    val transport: EventSink.Transport =
      batch => batch.foreach(ActivationLoopSpec.sent.add)
    def processed(): DataFrame = EventSink.ProcessedIds.load(
      spark, statePath, "deal_number", org.apache.spark.sql.types.StringType)
    def runActivation(): Long = EventSink.deliverBatchIdempotent(
      events(av.view(spark), av.dims(spark), processed()),
      "deal_number", "event_json", statePath, transport)

    // nightly run 0: ship everything the built view already serves
    val sent0 = runActivation()
    assert(sent0 > 0, "built view produced no activation events")

    // CDC stream of full fact rows, keyed by dealno through a
    // stream-static join (a version-update pair rides as two rows)
    val in = MemoryStream[String]
    val cdc = in.toDF().toDF("__deal_key")
      .join(facts, col("__deal_key") === col("dealno")).drop("__deal_key")
    val q = Streams.maintainFacts(cdc, av, s"$root/ckpt")
    val deals1 = facts.filter(slice1).select("dealno")
      .distinct().collect().map(_.getString(0)).toSeq
    val deals2 = facts.filter(slice2).select("dealno")
      .distinct().collect().map(_.getString(0)).toSeq
    assert(deals1.nonEmpty && deals2.nonEmpty, "CDC slices must be non-empty")
    try {
      in.addData(deals1: _*)
      q.processAllAvailable()
      val sent1 = runActivation()
      assert(sent1 > 0, "batch-1 customers produced no activation events")
      in.addData(deals2: _*)
      q.processAllAvailable()
      runActivation()
    } finally q.stop()

    // injected at-least-once replay: the CDC batch folds byte-identical
    // (no generation) and every deal is already processed (no event)
    val gens = av.viewVersions(spark)
    val before = sent.size()
    av.refreshFacts(facts.filter(slice2))
    val replaySent = runActivation()
    assert(av.viewVersions(spark) == gens, "replayed CDC batch published a generation")
    assert(replaySent == 0 && sent.size() == before,
      s"replay re-delivered events: $replaySent new, ${sent.size() - before} recorded")

    // streamed view == batch full rebuild over everything delivered
    val full = DomainQueries.validatedSalesAggregateView(s"$root/full")
    full.build(dims, facts)
    val fullView = full.view(spark)
    assert(av.view(spark).exceptAll(fullView).isEmpty &&
      fullView.exceptAll(av.view(spark)).isEmpty,
      "streamed view diverged from the full rebuild")

    // the union of incremental deliveries == the batch pipeline's
    // one-shot event set over the final state, duplicate-free
    val streamed = {
      import scala.jdk.CollectionConverters._
      sent.iterator().asScala.toSeq
    }
    assert(streamed.size == streamed.distinct.size, "duplicate event delivered")
    val batchEvents = events(fullView, full.dims(spark),
      spark.emptyDataFrame.withColumn("deal_number", lit(null).cast("string")).limit(0))
      .select("event_json").collect().map(_.getString(0)).toSet
    assert(streamed.toSet == batchEvents,
      s"streamed event set != batch pipeline's (${streamed.size} vs ${batchEvents.size}; " +
        s"missing=${(batchEvents -- streamed.toSet).take(1)}, " +
        s"extra=${(streamed.toSet -- batchEvents).take(1)})")
    facts.unpersist()
  }
}

object ActivationLoopSpec {
  val sent = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
