package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Partial-aggregated per-key quota selection (q83).
  *
  * The naive per-source cap is a `row_number() OVER (PARTITION BY
  * source ORDER BY hash)` — a full shuffle-and-sort of EVERY row of a
  * heavy source onto one reducer, exactly the shape that dies on a
  * 100 TB corpus with a hot domain. This Aggregator keeps the quota
  * selection in MAP-SIDE PARTIAL AGGREGATION: each task retains at
  * most `cap` (hash, id) survivors per source plus a running count,
  * merge keeps the `cap` smallest of the union, and the shuffle
  * carries ≤ cap rows per (source, map task) instead of the source's
  * full row set. Selection is a set function of the input (the cap
  * smallest hashes) — merge-order-independent, so the result is
  * deterministic and the window twin is its oracle.
  *
  * State stays ≤ cap+1 entries; `sorted` on ≤ 2·cap elements per
  * merge. For caps beyond ~10⁵ swap the buffer for a bounded heap —
  * same contract. */
final case class QuotaState(n: Long, top: Seq[(String, Long)])

class QuotaAggregator(cap: Int)
    extends Aggregator[(String, Long), QuotaState, QuotaState] {

  private def trim(xs: Seq[(String, Long)]): Seq[(String, Long)] =
    xs.sorted.take(cap)

  override def zero: QuotaState = QuotaState(0L, Vector.empty)

  override def reduce(b: QuotaState, a: (String, Long)): QuotaState =
    QuotaState(b.n + 1, trim(b.top :+ a))

  override def merge(b1: QuotaState, b2: QuotaState): QuotaState =
    QuotaState(b1.n + b2.n, trim(b1.top ++ b2.top))

  override def finish(r: QuotaState): QuotaState = r

  override def bufferEncoder: Encoder[QuotaState] = ExpressionEncoder()

  override def outputEncoder: Encoder[QuotaState] = ExpressionEncoder()
}
