package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedFrames, SharedSpark, SparkEntry}

/** Results must be BIT-IDENTICAL under a different cluster shape.
  *
  * The whole engine claims determinism-by-construction (hash sampling,
  * two-phase prefix sums, exactly-once pair emission, exact-integer
  * iterative loops) — but every one of those claims has a classic
  * failure mode that only shows up when the PARALLELISM changes:
  * collect_list order, per-partition heap merge order, first/limit
  * nondeterminism, float reduction order, partition-count-dependent
  * hashing. The DuckDB differential runs at ONE fixed shape (32
  * shuffle partitions, default input splits), so it cannot catch a
  * query that is deterministic per-shape but shape-DEPENDENT — which
  * on a real cluster means "results change when the cluster scales".
  *
  * This spec reruns one representative query per risky family at 7
  * shuffle partitions and 64 KB input splits (different scan split
  * count AND different shuffle fan-in), with the session memos cleared
  * so shared stages genuinely rebuild under the new shape, and asserts
  * full-result equality against the default shape.
  */
class ParallelismInvarianceSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** One query per determinism-risk family, PLUS the full top-10 bench
    * heavies (r12, after the r11 `GraftSqlShim.freeze` fix proved
    * partitioning-sensitive plans can silently corrupt under
    * re-planning — every heavy runs under both shapes, not a subset). */
  private val queries = Seq(
    "a3_brands_by_recency",   // custom Aggregator: distinct + order-by-other buffer
    "a10_topk_per_group",     // packed-heap Aggregator, per-partition merge order
    "mix_fixed_sample",       // hash-ranked fixed-size sample (TakeOrdered ties)
    "mix_pack_emit",          // two-phase prefix sums + packed-sequence rebuild
    "w11_scalable_ranks",     // range-partitioned rank family + broadcast offsets
    "dedup_minhash_lsh",      // banded LSH pair emission
    "corpus_bpe_merges",      // iterative argmax loop (deterministic tie-break)
    "j14_session_overlap",    // owned-bucket exactly-once pair emission
    "graph_lpa_communities",  // synchronous iterative label propagation
    "emb_kmeans_lloyd",       // exact-replay distributed Lloyd rounds
    // remaining top-10 bench heavies (the four above are already in)
    "mv_segments_refresh",    // build + CDC refresh, fold/flag/publish pipeline
    "mv_profiles_refresh",    // MaterializedView refresh path
    "mv_validated_refresh",   // r13: AggregateView + purchase-sequence window
    "id_incremental_components", // pointer-jumped CC + shared-edge memos
    "dedup_ngram_jaccard",    // shingle inverted-index pair join
    "a26_hll_rollup",         // mergeable HLL sketch rollup
    "emb_semdedup",           // centroid-bucketed semantic dedup
    "graph_copurchase_triangles") // degree-oriented wedge join

  private def runAll(): Map[String, Seq[String]] =
    queries.map { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val rows = df.collect().map(_.toString).sorted.toSeq
      df.unpersist()
      n -> rows
    }.toMap

  test("representative queries are invariant to shuffle fan-in and scan split size") {
    val keys = Seq("spark.sql.shuffle.partitions", "spark.sql.files.maxPartitionBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    SharedFrames.releaseAll()
    val base = runAll()
    assert(base.values.forall(_.nonEmpty), "vacuous baseline")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      SharedFrames.releaseAll() // memoized shared stages rebuild under the new shape
      val alt = runAll()
      for (n <- queries)
        assert(base(n) == alt(n),
          s"$n is cluster-shape-DEPENDENT: ${base(n).size} vs ${alt(n).size} rows, " +
            s"first diff: ${base(n).zip(alt(n)).find(p => p._1 != p._2)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      SharedFrames.releaseAll()
    }
  }
}
