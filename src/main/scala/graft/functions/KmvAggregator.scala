package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch: the buffer holds the k
  * smallest DISTINCT hash values seen; the estimate is (k−1)·M / h_k (the
  * hashes are uniform on [0, M)), or the exact distinct count while fewer
  * than k were observed. O(k) memory, mergeable — each input partition
  * contributes at most k values to the shuffle. With the shared-arithmetic
  * [[SimHashTokenHash]] mixing as the hash, the whole sketch is replayable
  * in plain SQL (the q19 DuckDB oracle does exactly that).
  */
class KmvAggregator(k: Int) extends Aggregator[Long, List[Long], Double] {
  require(k >= 2, "k must be at least 2")

  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], h: Long): List[Long] = merge(buf, List(h))

  override def merge(a: List[Long], b: List[Long]): List[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(r: List[Long]): Double =
    if (r.length < k) r.length.toDouble
    else ((k - 1).toDouble * SimHashTokenHash.M.toDouble) / r.last.toDouble

  override def bufferEncoder: Encoder[List[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}
