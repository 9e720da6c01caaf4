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
  *
  * The buffer is a SORTED primitive array: per-row reduce() is an O(1)
  * reject once the sketch is warm (most hashes exceed the current k-th
  * minimum) and an O(log k) binary search + one arraycopy otherwise — the
  * 100 TB profiling path can't afford the allocate-dedup-sort-per-row of
  * a naive list buffer. merge() runs once per partition pair, so its
  * simple concat-dedup-sort form is off the hot path.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2, "k must be at least 2")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val n = buf.length
    if (n >= k && h >= buf(n - 1)) buf // warm-path reject, no allocation
    else {
      val i = java.util.Arrays.binarySearch(buf, h)
      if (i >= 0) buf // already present
      else {
        val ins = -i - 1
        val outLen = math.min(n + 1, k)
        val out = new Array[Long](outLen)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(r: Array[Long]): Double =
    if (r.length < k) r.length.toDouble
    else ((k - 1).toDouble * SimHashTokenHash.M.toDouble) / r(r.length - 1).toDouble

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}
