package graft.functions

import graft.ops.DomainDoc
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded ASCENDING top-k by (rank_key, doc_id) as a typed `Aggregator` —
  * the string-keyed sibling of [[TopKAggregator]] (which ranks by score
  * desc). Built for [[graft.ops.Url.domainQuotaSample]]'s hash-order
  * sampling rank: a per-domain `row_number` window puts a megadomain's
  * ENTIRE row set through one task's sort (the round-14 VERDICT
  * straggler), while this aggregator's partial (map-side) buffers are
  * already capped at k entries — the shuffle carries ≤ k·tasks rows per
  * domain no matter how many pages the head domain has, and the merge
  * tree is the engine's own two-phase aggregation.
  *
  * The common-case reduce is O(1): once the buffer is full, a row sorting
  * AFTER the current k-th is dropped without re-sorting — at crawl scale
  * almost every row of a megadomain takes this path. */
class RankTopKAggregator(k: Int)
    extends Aggregator[DomainDoc, Seq[DomainDoc], Seq[DomainDoc]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  private val ord: Ordering[DomainDoc] =
    Ordering.by((e: DomainDoc) => (e.rank_key, e.doc_id))

  override def zero: Seq[DomainDoc] = Seq.empty

  override def reduce(buf: Seq[DomainDoc], e: DomainDoc): Seq[DomainDoc] =
    if (buf.length >= k && ord.lteq(buf(buf.length - 1), e)) buf
    else (buf :+ e).sorted(ord).take(k)

  override def merge(a: Seq[DomainDoc], b: Seq[DomainDoc]): Seq[DomainDoc] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[DomainDoc]): Seq[DomainDoc] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[DomainDoc]] =
    ExpressionEncoder[Seq[DomainDoc]]()

  override def outputEncoder: Encoder[Seq[DomainDoc]] =
    ExpressionEncoder[Seq[DomainDoc]]()
}
