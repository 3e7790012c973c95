package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so graft's native
  * Catalyst expressions get a Column API without requiring every
  * session to pre-register SQL functions. Signatures expose only
  * public types. Deliberately outside the `graft` package, since
  * `private[sql]` access is scoped to this package (its spark-core
  * twin is `org.apache.spark.GraftCoreShim`).
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unique-per-instance session id (`classic.SparkSession.sessionUUID`)
    * — unlike `System.identityHashCode`, two sessions can never share
    * it, so session-scoped caches keyed on it cannot cross wires. */
  def sessionUUID(s: SparkSession): String =
    s.asInstanceOf[classic.SparkSession].sessionUUID
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Decompose a sort Column (`col.desc`, `col.asc_nulls_last`, …) into
    * `(child, descending, nullsLast)`; a direction-less Column reports
    * as ascending/nulls-first (what `orderBy` defaults it to). Needed
    * because `expression` wraps the node lazily — the connect-style
    * `internal.SortOrder` never surfaces as a Catalyst SortOrder until
    * analysis, so direction checks must read the node itself. */
  def sortOrderOf(c: Column): (Expression, Boolean, Boolean) = c.node match {
    case s: internal.SortOrder =>
      (expression(Column(s.child)),
        s.sortDirection == internal.SortOrder.Descending,
        s.nullOrdering == internal.SortOrder.NullsLast)
    case _ => (expression(c), false, false)
  }

  /** Execute a hand-built logical plan (test harness for optimizer
    * rules applied outside a session's rule pipeline). */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Pin a DataFrame to ONE physical RDD instance (lazy — no job runs
    * here, nothing is cached). Needed when a plan's output is
    * NONDETERMINISTIC-per-execution and MULTIPLE downstream branches
    * must observe the SAME instance: `repartitionByRange` samples its
    * range bounds per physical-plan instantiation (the sample seed
    * involves the RDD id), so two branches that each re-plan the same
    * range exchange can disagree about which partition a row landed in
    * — silently corrupting anything joined on `spark_partition_id()`.
    * Freezing through the executed RDD makes both branches (and any
    * lost-partition recompute — the bounds live in the one partitioner
    * object) read identical partitioning by construction. Rows are
    * copied out of the shuffle reader's reused buffers. */
  def freeze(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    spark.internalCreateDataFrame(
      ds.queryExecution.toRdd.map(_.copy()), ds.schema)
  }

  /** The materialized RDD behind a (local)checkpointed Dataset — its
    * `LogicalRDD` leaf. Lets `graft.Lineage` release exactly the
    * checkpoint's storage blocks, never an RDD some other job happened
    * to register concurrently (the hazard of diffing
    * `sc.getPersistentRDDs` around the checkpoint call). None when the
    * plan isn't a materialized leaf — callers treat that as "nothing
    * safe to release". */
  def leafRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed match {
      case r: execution.LogicalRDD => Some(r.rdd)
      case _ => None
    }

  /** Re-stamp an eagerly (local)checkpointed Dataset with the MEASURED
    * size of its stored blocks as its statistics. `Dataset.checkpoint`
    * carries the ORIGIN plan's optimizer ESTIMATE into the LogicalRDD
    * leaf, and for the session-shared memo frames (string-heavy,
    * post-dedup) that estimate runs 10-20× over the materialized bytes
    * — large enough to flip every broadcast-eligible join over a memo
    * to a sort-merge join (`autoBroadcastJoinThreshold` compares plan
    * stats, not reality). The cached-relation path never had this
    * problem because `InMemoryRelation` reports its actual buffer
    * bytes; this restores the same property for checkpoint leaves.
    * UnsafeRow block bytes track serialized row size, so the number is
    * honest at any scale: a frame too big to broadcast measures too
    * big to broadcast. No-op when the frame isn't a materialized leaf
    * or its blocks report zero size. */
  def withMeasuredStats(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    ds.queryExecution.analyzed match {
      case lr: execution.LogicalRDD =>
        val bytes = spark.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => i.memSize + i.diskSize)
          .getOrElse(0L)
        if (bytes <= 0L) df
        else {
          // merge the measured size INTO the origin stats (keeping the
          // rowCount/column histograms Dataset.localCheckpoint carried
          // over) and keep the origin constraints — replacing both with
          // minimal values lost non-null inference and column stats at
          // every checkpoint leaf (r15 ADVICE finding). The fields are
          // constructor-private on LogicalRDD, hence the reflective read.
          def priv[T](name: String): Option[T] = try {
            val f = lr.getClass.getDeclaredField(name)
            f.setAccessible(true)
            Option(f.get(lr)).flatMap {
              case o: Option[_] => o.map(_.asInstanceOf[T])
              case _ => None
            }
          } catch { case scala.util.control.NonFatal(_) => None }
          val originStats =
            priv[catalyst.plans.logical.Statistics]("originStats")
          val originConstraints =
            priv[catalyst.expressions.ExpressionSet]("originConstraints")
          val stats = originStats
            .map(_.copy(sizeInBytes = BigInt(bytes)))
            .getOrElse(catalyst.plans.logical.Statistics(
              sizeInBytes = BigInt(bytes)))
          classic.Dataset.ofRows(spark, execution.LogicalRDD(
            lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
            lr.isStreaming, lr.stream)(spark, Some(stats), originConstraints))
        }
      case _ => df
    }
  }
}
