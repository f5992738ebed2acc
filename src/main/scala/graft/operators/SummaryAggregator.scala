package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator for the run-summary counters (SURVEY §2.7 A1 /
  * §2.9): phase/status pairs → counter map, merged distributively
  * (map-side partial aggregation like any built-in agg).
  * The reference accumulates these in a driver-side object
  * (etl/utils/run_summary.py:10-47); here the ledger can be a
  * distributed Dataset and the counters still come out in one pass.
  */
object SummaryAggregator extends Aggregator[(String, String), Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(acc: Map[String, Long], row: (String, String)): Map[String, Long] = {
    val key = s"${row._1}/${row._2}"
    acc.updated(key, acc.getOrElse(key, 0L) + 1L)
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  override def finish(acc: Map[String, Long]): Map[String, Long] = acc

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    implicitly[Encoder[Map[String, Long]]](org.apache.spark.sql.Encoders.kryo[Map[String, Long]])

  /** One-pass distributed summary over (phase, status) pairs. */
  def summarize(pairs: Dataset[(String, String)]): Map[String, Long] =
    pairs.select(SummaryAggregator.toColumn).head()
}
