package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.activation.Activation
import graft.etl.SnapshotCatalog
import graft.functions.Cleansing
import graft.operators.Dedup
import graft.sinks.EventSink
import graft.streaming.Streams
import graft.views.Customer360

/** The reference's operational loop as ONE running system
  * (`scripts/lambda_redshift_to_segment.py:137-209` reads
  * `marketing.validated_vehicle_sales` incrementally and ships Segment
  * events): a CDC stream of deal rows maintains the validated-sales
  * AggregateView through `Streams.maintainCycle` — which also keeps a
  * marketable-contacts view fresh and commits ONE SnapshotCatalog cycle
  * per micro-batch — and after each batch the activation side resolves
  * BOTH views from the catalog pin (`Activation.feedFromCatalog`, the
  * warehouse-snapshot read the reference's lambda gets for free), reads
  * the feed incrementally (`Activation.nextBatch` against the
  * processed-ID state), shapes Segment track events and delivers them
  * idempotently (`EventSink.deliverBatchIdempotent`). Pinned:
  *
  *   - streamed view == batch full rebuild over everything delivered;
  *   - the union of incrementally emitted events == the batch
  *     pipeline's one-shot event set over the final state, with zero
  *     duplicate deliveries;
  *   - one injected CDC replay (at-least-once delivery) publishes no
  *     generation and emits no event;
  *   - a deal insert and its customer's OPT-OUT landing in the same
  *     CDC cut can never half-apply into a shipped event: mid-cycle
  *     the catalog still pins the pre-cycle pair (the LIVE view pair
  *     provably carries the leaking feed row right then), post-cycle
  *     the marketability gate suppresses it — no consistent snapshot
  *     emits the event, so activation never does.
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

  private val dimOrder = Seq(col("lastupdated").desc, col("dateadded").desc,
    col("sourcerowid").desc)
  private val factOrder = Seq(col("rowlastupdatedutc").desc, col("vin").desc)

  private def loopDims(): DataFrame =
    DomainQueries.customerMaster(spark, dir)
      .filter(Cleansing.notSoftDeleted(col("isdeleted"), col("deletedataflag")))
      .select(Customer360.MarketableContactCols.map(col): _*)

  private def loopFacts(): DataFrame =
    DomainQueries.vehicleSales(spark, dir)
      .filter(col("custno").isNotNull && col("vin").isNotNull &&
        col("contractdate").isNotNull)
      .select(Customer360.ValidatedSalesSourceCols.map(col): _*)

  private def events(validated: DataFrame, contacts: DataFrame,
      processed: DataFrame): DataFrame = {
    val feed = Activation.feedFromValidatedSales(validated, contacts)
    Activation.toSegmentTrackEvents(Activation.cleanAndValidate(
      Activation.nextBatch(feed, processed,
        lit("1990-01-01").cast("timestamp"), lit("2030-01-01").cast("timestamp"),
        limit = 1000000)))
  }

  /** One activation run off the CATALOG PIN: resolve both views from a
    * single catalog read, ship unprocessed deals idempotently. */
  private def runActivation(catalog: SnapshotCatalog, statePath: String,
      transport: EventSink.Transport): Long = {
    val views = catalog.readAll(spark).get
    val processed = EventSink.ProcessedIds.load(
      spark, statePath, "deal_number", org.apache.spark.sql.types.StringType)
    EventSink.deliverBatchIdempotent(
      events(views("validated_sales"), views("marketable_contacts"), processed),
      "deal_number", "event_json", statePath, transport)
  }

  test("CDC stream → catalog-pinned views → incremental activation, exactly-once") {
    val s0 = spark
    import s0.implicits._
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("graft_actloop").toString
    val statePath = s"$root/processed"

    val dims = loopDims()
    val facts = loopFacts().persist()
    val custL = col("custno").cast("long")
    val slice1 = custL % 7 === 0
    val slice2 = custL % 7 === 1

    val av = DomainQueries.validatedSalesAggregateView(s"$root/av", keepVersions = 2)
    av.build(dims, facts.filter(!slice1 && !slice2))
    val contactsMv = DomainQueries.marketableContactsView(s"$root/contacts")
    contactsMv.build(dims)
    val catalog = new SnapshotCatalog(s"$root/catalog")
      .register("validated_sales", av.store)
      .register("marketable_contacts", contactsMv.store)
    catalog.commitCycle(spark)

    // transport records into a STATIC queue: closures are serialized
    // even in local mode, so a captured local would collect into a copy
    val sent = ActivationLoopSpec.sent
    sent.clear()
    val transport: EventSink.Transport =
      batch => batch.foreach(ActivationLoopSpec.sent.add)

    // nightly run 0: ship everything the built view already serves
    val sent0 = runActivation(catalog, statePath, transport)
    assert(sent0 > 0, "built view produced no activation events")

    // CDC stream of full fact rows, keyed by dealno through a
    // stream-static join (a version-update pair rides as two rows);
    // each micro-batch refreshes the view AND commits a catalog cycle
    val in = MemoryStream[String]
    val cdc = in.toDF().toDF("__deal_key")
      .join(facts, col("__deal_key") === col("dealno")).drop("__deal_key")
    val q = Streams.maintainCycle(cdc, catalog, s"$root/ckpt")(
      batch => av.refreshFacts(batch))
    val deals1 = facts.filter(slice1).select("dealno")
      .distinct().collect().map(_.getString(0)).toSeq
    val deals2 = facts.filter(slice2).select("dealno")
      .distinct().collect().map(_.getString(0)).toSeq
    assert(deals1.nonEmpty && deals2.nonEmpty, "CDC slices must be non-empty")
    try {
      in.addData(deals1: _*)
      q.processAllAvailable()
      val sent1 = runActivation(catalog, statePath, transport)
      assert(sent1 > 0, "batch-1 customers produced no activation events")
      in.addData(deals2: _*)
      q.processAllAvailable()
      runActivation(catalog, statePath, transport)
    } finally q.stop()

    // injected at-least-once replay: the CDC batch folds byte-identical
    // (no generation) and every deal is already processed (no event)
    val gens = av.viewVersions(spark)
    val before = sent.size()
    av.refreshFacts(facts.filter(slice2))
    val replaySent = runActivation(catalog, statePath, transport)
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
    val batchEvents = events(fullView,
      Customer360.marketableContactsOfLatest(full.dims(spark)),
      spark.emptyDataFrame.withColumn("deal_number", lit(null).cast("string")).limit(0))
      .select("event_json").collect().map(_.getString(0)).toSet
    assert(streamed.toSet == batchEvents,
      s"streamed event set != batch pipeline's (${streamed.size} vs ${batchEvents.size}; " +
        s"missing=${(batchEvents -- streamed.toSet).take(1)}, " +
        s"extra=${(streamed.toSet -- batchEvents).take(1)})")
    facts.unpersist()
  }

  test("a mid-cycle opt-out never leaks an event from a torn view pair") {
    val root = Files.createTempDirectory("graft_actloop_optout").toString
    val statePath = s"$root/processed"
    val dims = loopDims()
    val facts = loopFacts().persist()

    // pick a customer X with >= 2 deals in the final validated view:
    // one deal ships in run 0, the other arrives in the SAME CDC cut as
    // X's opt-out — the half-applied combination under test
    val contacts0 = Customer360.marketableContactsOfLatest(
      Dedup.latestByKey(dims, Seq("custno"), dimOrder))
    val validated0 = Customer360.validatedSalesOfLatest(
      Dedup.latestByKey(facts, Seq("dealno"), factOrder), contacts0)
    val x = validated0.groupBy("custno").count().filter(col("count") >= 2)
      .orderBy("custno").limit(1).collect()(0).get(0).toString
    val d1 = validated0.filter(col("custno") === x)
      .orderBy(col("deal_number").desc).limit(1)
      .collect()(0).getAs[String]("deal_number")

    val av = DomainQueries.validatedSalesAggregateView(s"$root/av", keepVersions = 2)
    av.build(dims, facts.filter(col("dealno") =!= d1))
    val contactsMv = DomainQueries.marketableContactsView(s"$root/contacts")
    contactsMv.build(dims)
    val catalog = new SnapshotCatalog(s"$root/catalog")
      .register("validated_sales", av.store)
      .register("marketable_contacts", contactsMv.store)
    catalog.commitCycle(spark)

    val sent = ActivationLoopSpec.sent
    sent.clear()
    val transport: EventSink.Transport =
      batch => batch.foreach(ActivationLoopSpec.sent.add)
    def sentFor(deal: String): Int = {
      import scala.jdk.CollectionConverters._
      sent.iterator().asScala.count(_.contains(s""""deal_number":"$deal""""))
    }

    // run 0: X is compliant, X's OTHER deal(s) ship
    assert(runActivation(catalog, statePath, transport) > 0)
    assert(sentFor(d1) == 0, "the held-out deal must not have shipped yet")

    // the CDC cut: X's new deal D1 plus X's opt-out, one cycle. The
    // opt-out is a new master version (later lastupdated, blockemail
    // set) — the validated view's marketability gate drops X once the
    // dim side absorbs it.
    val optOut = dims.filter(col("custno") === x)
      .withColumn("blockemail", lit(true))
      .withColumn("lastupdated", col("lastupdated") + expr("INTERVAL 1 DAY"))

    // TORN WINDOW: the fact refresh has applied, the dim/contact
    // refreshes have not. The LIVE view pair right now carries the
    // leaking feed row — D1 visible, opt-out invisible — which no
    // consistent snapshot (pre- or post-cycle) contains:
    av.refreshFacts(facts.filter(col("dealno") === d1))
    val liveLeak = Activation.feedFromValidatedSales(av.view(spark),
      Customer360.marketableContactsOfLatest(av.dims(spark)))
      .filter(col("deal_number") === d1).count()
    assert(liveLeak == 1,
      "the live view pair should expose the torn feed row (the window under test)")
    // ...but catalog-pinned activation still resolves the pre-cycle
    // pair and ships nothing
    val tornSent = runActivation(catalog, statePath, transport)
    assert(tornSent == 0 && sentFor(d1) == 0,
      s"mid-cycle activation leaked: $tornSent events, d1 shipped ${sentFor(d1)}x")

    // cycle completes: dim side + contacts view absorb the opt-out,
    // one catalog commit pins the consistent post-cycle pair — in
    // which the marketability gate has dropped X entirely
    av.refreshDims(optOut)
    contactsMv.refresh(optOut)
    catalog.commitCycle(spark)
    val postSent = runActivation(catalog, statePath, transport)
    assert(postSent == 0 && sentFor(d1) == 0,
      s"opt-out customer's deal shipped after the cycle: $postSent, ${sentFor(d1)}x")
    assert(Activation.feedFromCatalog(catalog, spark).get
      .filter(col("deal_number") === d1).count() == 0,
      "the pinned post-cycle feed must not carry the opted-out customer's deal")
    assert(catalog.readAll(spark).get("validated_sales")
      .filter(col("custno") === x).count() == 0,
      "the pinned validated view must have dropped the opted-out customer")

    // a view NAME not registered in the catalog skips the run (None),
    // the same "no consistent feed" outcome as an uncommitted catalog —
    // not a NoSuchElementException
    assert(Activation.feedFromCatalog(catalog, spark,
      validatedView = "no_such_view").isEmpty,
      "an unregistered view name must skip the run, not throw")
    facts.unpersist()
  }
}

object ActivationLoopSpec {
  val sent = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
