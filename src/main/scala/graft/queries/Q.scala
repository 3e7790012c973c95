package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A registered engine query: the Spark-first implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle for the driver's
  * differential correctness gate (CORRECTNESS_r{N}.json).
  *
  * Determinism rules every Q must follow so the hash compare is stable:
  *   - a total ORDER BY on both sides (ties broken by a unique key);
  *   - no raw float aggregation: sums go through DECIMAL(18,2) (testdata
  *     money/value columns are 2-dp) or integer quantization, then cast
  *     to DOUBLE, so results are exact and order-independent;
  *   - identical column names and pinned result types on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
