package graft.operators

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** U1: `ARRAY_AGG(DISTINCT value ORDER BY sortKey DESC, value ASC)` as a
  * typed [[Aggregator]] — the reference leans on Redshift's
  * ARRAY_AGG(DISTINCT … ORDER BY …) with engine-defined tie semantics
  * (`sql/customer_360_views.sql:407-408`); we pin the order explicitly:
  * by max(sortKey) per distinct value DESC, then value ASC.
  *
  * The buffer is a Map(value → max sortKey): per-value max is kept
  * map-side, so merged state is bounded by the distinct-value count,
  * never the row count — the same partial-aggregation shape Spark's own
  * `collect_set` uses. This is the typed-UDAF counterpart of the pure
  * expression combo in RelationalQueries.a3
  * (`array_sort(collect_list(struct(...)))`); prefer the expression when
  * codegen matters (Aggregators run as ObjectHashAggregate, outside
  * whole-stage codegen), and this form when composing typed Datasets.
  */
object ArrayAggDistinctOrdered {

  private def enc[T: TypeTag]: Encoder[T] = ExpressionEncoder[T]()

  /** (value, sortKey) in; distinct values out, ordered by
    * (max sortKey DESC, value ASC). */
  val agg: Aggregator[(String, Long), Map[String, Long], Seq[String]] =
    new Aggregator[(String, Long), Map[String, Long], Seq[String]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(b: Map[String, Long], a: (String, Long)): Map[String, Long] =
        if (a._1 == null) b
        else b.updatedWith(a._1) {
          case Some(k) => Some(math.max(k, a._2))
          case None    => Some(a._2)
        }
      def merge(l: Map[String, Long], r: Map[String, Long]): Map[String, Long] =
        r.foldLeft(l) { case (acc, (v, k)) =>
          acc.updatedWith(v) {
            case Some(k0) => Some(math.max(k0, k))
            case None     => Some(k)
          }
        }
      def finish(b: Map[String, Long]): Seq[String] =
        // explicit reverse ordering, not -k: negating Long.MinValue
        // overflows back to Long.MinValue and would mis-sort it first
        b.toSeq.sortBy { case (v, k) => (k, v) }(
          Ordering.Tuple2(Ordering.Long.reverse, Ordering.String)).map(_._1)
      def bufferEncoder: Encoder[Map[String, Long]] = enc[Map[String, Long]]
      def outputEncoder: Encoder[Seq[String]] = enc[Seq[String]]
    }

  /** Column form, e.g.
    * `df.groupBy("k").agg(distinctOrdered(col("v"), col("ts")))`.
    * A NULL sortKey ranks as the smallest key (the row still counts) —
    * the tuple encoder's long field is non-nullable, so nulls must be
    * mapped BEFORE the aggregator or they crash the job. */
  lazy val distinctOrdered: (Column, Column) => Column = {
    val fn = udaf(agg, Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
    (value, sortKey) =>
      fn(value, org.apache.spark.sql.functions.coalesce(
        sortKey.cast("long"),
        org.apache.spark.sql.functions.lit(Long.MinValue)))
  }
}
