package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A6/X8 as a typed custom aggregate (the UDAF surface the reference
  * lacked, SURVEY.md §2.12): a 64-slot codon histogram accumulated
  * map-side per partition and merged associatively — the idiomatic
  * `Aggregator[IN, BUF, OUT]` shape, registrable for SQL via
  * `spark.udf.register("codon_hist", udaf(CodonAggregator))`.
  *
  * The buffer is a plain Map (64 keys max), so partial aggregation
  * keeps shuffle traffic at O(64) per partition regardless of input
  * rows — the same partial+final contract built-in aggregates get.
  */
object CodonAggregator extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], dna: String): Map[String, Long] =
    if (dna == null) buf
    else Dna.codonCounts(dna).foldLeft(buf) { case (b, (codon, n)) =>
      b.updated(codon, b.getOrElse(codon, 0L) + n)
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (m, (codon, n)) =>
      m.updated(codon, m.getOrElse(codon, 0L) + n)
    }

  override def finish(m: Map[String, Long]): Map[String, Long] = m

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
