package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup-by-window — the reference's signature pattern
  * (`sql/customer_360_views.sql:71-74,262-265,535-538`):
  * `ROW_NUMBER() OVER (PARTITION BY key ORDER BY version DESC) = 1`.
  *
  * Scale notes (100 TB): the window is a single hash-partition exchange
  * on the key; AQE skew-join/partition-coalescing handles hot keys.
  * For the pure "latest row per key" case `latestByKey` avoids
  * materializing the rank column. Callers must pass a TOTAL order
  * (include a unique tiebreaker) or ties pick an arbitrary row.
  */
object Dedup {

  /** Keep exactly one row per key group, the first under `order`.
    * W1/W2 in SURVEY §2.5. */
  def latestByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** [[latestByKey]] fused with a cluster-by-`clusterCol` exchange:
    * ONE shuffle serves both the per-key window and a downstream
    * `partitionBy(clusterCol)` write. Requires `clusterCol` to be
    * functionally determined by `keys` (the materialized-view bucket
    * contract: bucket = hash(keys), or — facts side — every version of
    * a key carries the same bucket value): the window partitions by
    * `(clusterCol, keys)`, which then groups exactly like `(keys)`,
    * and hash-partitioning on `clusterCol` alone already satisfies
    * that window's clustered distribution, so Spark plans no second
    * exchange (verified: 1 Exchange in the executed plan). At 100 TB
    * this halves the shuffled bytes of every state materialization. */
  def latestByKeyClustered(df: DataFrame, keys: Seq[String], order: Seq[Column],
      clusterCol: String, numPartitions: Int): DataFrame = {
    val w = Window.partitionBy((clusterCol +: keys).map(col): _*).orderBy(order: _*)
    df.repartition(numPartitions, col(clusterCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Sequence-number a group: 1-based position under `order` within
    * each key partition (W3: purchase sequence,
    * `customer_360_views.sql:350-353`). */
  def sequenceNumber(df: DataFrame, keys: Seq[String], order: Seq[Column],
                     as: String = "seq"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(as, row_number().over(w))
  }

  /** Exact duplicate removal by content hash, keeping the smallest id —
    * north-star exact dedup over `documents`. Single shuffle on the
    * hash; no full-row comparisons. */
  def exactByHash(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    latestByKey(
      df.withColumn("__h", md5(col(contentCol))),
      Seq("__h"), Seq(col(idCol).asc)
    ).drop("__h")
  }
}
