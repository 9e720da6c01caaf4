package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate: keeps the k best (score desc, id asc) pairs in
  * the aggregation buffer. Because Spark runs Aggregators with partial
  * (map-side) aggregation, each input partition contributes at most k rows
  * to the shuffle — the standard distributed top-k trick, here for ANN
  * ranking where the window-function formulation shuffles every scored
  * candidate.
  */
final case class Scored(sim: Double, id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[Scored, List[Scored], List[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.id < b.id)

  override def zero: List[Scored] = Nil

  override def reduce(buf: List[Scored], in: Scored): List[Scored] =
    merge(buf, List(in))

  override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: List[Scored]): List[Scored] = r

  override def bufferEncoder: Encoder[List[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[List[Scored]] = ExpressionEncoder()
}
