package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** The layout advisor must rediscover, from plans alone, the layout
  * decisions this repo made by hand: the order key earns lineitem's
  * bucketing (every orders⋈lineitem join), the customer key earns
  * orders', and the events table's hot filter columns are its
  * type/time predicates. Runs over the relational + domain workload —
  * plan building only, no data read.
  */
class LayoutAdvisorSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val advice = {
    val names = (graft.queries.RelationalQueries.all ++ graft.queries.DomainQueries.all)
      .map(_.name).toSet
    LayoutAdvisor.analyze(spark, dir,
      SparkEntry.queries.filter { case (n, _) => names(n) })
  }

  test("join-key recommendations match the hand-made layout decisions") {
    val byTable = advice.map(a => a.table -> a).toMap
    assert(byTable.contains("lineitem") && byTable.contains("orders"), advice.map(_.table).toString)
    assert(byTable("lineitem").bucketBy.contains("l_orderkey"),
      s"lineitem: ${byTable("lineitem").uses.take(5)}")
    assert(byTable("orders").bucketBy.exists(Set("o_custkey", "o_orderkey")),
      s"orders: ${byTable("orders").uses.take(5)}")
  }

  test("events' z-order candidates are its hot predicate columns") {
    val ev = advice.find(_.table == "events").getOrElse(fail(advice.map(_.table).toString))
    assert(ev.zOrderBy.nonEmpty)
    assert(ev.zOrderBy.toSet.subsetOf(Set("event_type", "ts", "value", "user_id")),
      s"events z-order candidates: ${ev.zOrderBy}; uses: ${ev.uses.take(6)}")
  }

  test("counts are attributed, not fabricated: every use cites a real column") {
    val cols = Map(
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"),
      "events" -> Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    for (a <- advice if cols.contains(a.table); u <- a.uses)
      assert(cols(a.table)(u.column), s"${a.table}: unknown column ${u.column}")
    assert(advice.flatMap(_.uses).forall(u => u.joins + u.filters + u.groups > 0))
  }
}
