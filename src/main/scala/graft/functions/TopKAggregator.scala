package graft.functions

import graft.ops.ScoredPair
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator` — the engine-native alternative to
  * the `mapPartitions` heap in Similarity.localTopK. Because an Aggregator
  * participates in Spark's two-phase aggregation, the partial (map-side)
  * buffers are already capped at k entries, so the shuffle carries
  * ≤ k·partitions·keys rows and the merge tree is handled by the engine —
  * no imperative partition loop, works in any groupBy (batch or streaming).
  *
  * Buffer is a sorted Seq (best-first under sim desc, id asc — the same
  * total order every ANN query ranks by); k is small (top-k search), so the
  * O(k log k) re-sort per merge is noise next to the dot products upstream.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredPair, Seq[ScoredPair], Seq[ScoredPair]] {

  private val best: Ordering[ScoredPair] =
    Ordering.by((e: ScoredPair) => (-e.sim, e.neighbor_id))

  override def zero: Seq[ScoredPair] = Seq.empty

  override def reduce(buf: Seq[ScoredPair], e: ScoredPair): Seq[ScoredPair] =
    merge(buf, Seq(e))

  override def merge(a: Seq[ScoredPair], b: Seq[ScoredPair]): Seq[ScoredPair] =
    (a ++ b).sorted(best).take(k)

  override def finish(r: Seq[ScoredPair]): Seq[ScoredPair] = r.sorted(best)

  override def bufferEncoder: Encoder[Seq[ScoredPair]] =
    ExpressionEncoder[Seq[ScoredPair]]()

  override def outputEncoder: Encoder[Seq[ScoredPair]] =
    ExpressionEncoder[Seq[ScoredPair]]()
}
