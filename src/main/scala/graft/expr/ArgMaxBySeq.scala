package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF replicating the marasa state-at-seq semantic (SURVEY §2.D
  * `agg_udaf_argmax`, §4.3): the payload carried by the largest seq in the
  * group. Merge is associative/commutative, so Catalyst runs it as partial
  * + final aggregation — map-side combine at any parallelism. */
case class SeqPayload(seq: Long, payload: String)

object ArgMaxBySeq extends Aggregator[SeqPayload, SeqPayload, String] {
  def zero: SeqPayload = SeqPayload(Long.MinValue, null)
  def reduce(b: SeqPayload, a: SeqPayload): SeqPayload = if (a.seq > b.seq) a else b
  def merge(x: SeqPayload, y: SeqPayload): SeqPayload = if (x.seq >= y.seq) x else y
  def finish(r: SeqPayload): String = r.payload
  def bufferEncoder: Encoder[SeqPayload] = Encoders.product[SeqPayload]
  def outputEncoder: Encoder[String] = Encoders.STRING
}
