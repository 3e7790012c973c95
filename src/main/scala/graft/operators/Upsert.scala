package graft.operators

import org.apache.spark.sql.DataFrame

/** Idempotent upsert — the reference's staging-table delete+insert
  * (`scripts/glue_vehicle_sales_etl.py:277-288,368-377`, keyed
  * `(dealno,custno,vin,rowlastupdatedutc)`) re-expressed in-engine:
  *
  *   upserted = (target ANTI-JOIN staging ON keys) UNION ALL staging
  *
  * Scale notes: the anti-join shuffles both sides on the key; when the
  * daily staging batch is small relative to the target Spark/AQE
  * broadcasts it, so the target is scanned once with no wide exchange.
  * Never materializes a NOT-IN list on the driver (the reference's
  * Lambda did — an O(n) SQL-string antipattern we deliberately drop).
  * Applying the same staging batch twice is a no-op (see
  * UpsertSpec scalacheck property) — INCLUDING rows whose key columns
  * contain NULL: the anti-join matches null-safely (`<=>`), because a
  * plain equi-anti-join never matches NULL keys and would re-append
  * such rows on every run (try_cast'd timestamps make NULL keys a
  * routine occurrence, not a corner case).
  */
object Upsert {

  def upsert(target: DataFrame, staging: DataFrame, keys: Seq[String]): DataFrame = {
    val stagingKeys = staging.select(keys.head, keys.tail: _*).distinct()
    val cond = keys.map(k => target(k) <=> stagingKeys(k)).reduce(_ && _)
    target
      .join(stagingKeys, cond, "left_anti")
      .unionByName(staging)
  }
}
