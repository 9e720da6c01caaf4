package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One ranked candidate: exact DECIMAL(38,18) score (the lexical serving
  * fold's type — order-independent by construction), the doc id as the
  * total tie-break, and one opaque payload column (n_hit for BM25,
  * n_occ for phrase) that rides along unexamined.
  */
final case class RankedDoc(score: BigDecimal, docId: Long, payload: Long)

/** Aggregation buffer: `docs` sorted ASCENDING by rank quality (worst
  * first), `n` its size. Worst-first is what makes the per-row reject
  * test O(1) — `docs.head` is the current k-th — and the tracked size
  * avoids an O(k) `lengthCompare` on that same hot path (r10 verdict:
  * the immutable-List buffer invited O(k) work per accepted row; the
  * saturated-buffer REJECT is the per-row common case and is now
  * constant-time, while the O(k) prefix rebuild is paid only when a
  * genuinely better candidate inserts — amortized O(1) per row for
  * k up to the 1000-class rerank shortlists).
  */
final case class RankBuf(n: Int, docs: List[RankedDoc])

/** Bounded top-k rank aggregate for lexical serving — the distributed
  * replacement for `row_number() over (partitionBy(query_id) orderBy
  * score desc, doc_id asc)`: that window sorts ONE query's ENTIRE
  * candidate set in a single task (at 100 TB a query holding one mid-df
  * term is a single-task sort of 10⁸⁺ rows). This Aggregator runs with
  * partial (map-side) aggregation, so each input partition contributes at
  * most k rows per query to the shuffle and the final merge per query
  * sees ≤ partitions×k rows — rank cost tracks partitions×k, not
  * candidates (the v4 [[TopKAggregator]] trick, upgraded to the serving
  * contract: exact decimal scores, payload column, total (score desc,
  * doc_id asc) order so the emitted list position IS row_number).
  *
  * reduce() short-circuits: once the buffer holds k rows, an input that
  * does not beat the current k-th is dropped in O(1) (head peek on the
  * worst-first buffer, size tracked — see [[RankBuf]]); insertion of a
  * better candidate costs O(k) but is the vanishing case once the
  * buffer saturates.
  */
class TopKRankAggregator(k: Int)
    extends Aggregator[RankedDoc, RankBuf, List[RankedDoc]] {

  private def better(a: RankedDoc, b: RankedDoc): Boolean = {
    val c = a.score.compare(b.score)
    c > 0 || (c == 0 && a.docId < b.docId)
  }

  override def zero: RankBuf = RankBuf(0, Nil)

  override def reduce(buf: RankBuf, in: RankedDoc): RankBuf =
    if (buf.n >= k && !better(in, buf.docs.head)) buf // O(1) reject
    else insert(buf, in)

  private def insert(buf: RankBuf, in: RankedDoc): RankBuf = {
    // ascending (worst-first): prefix = the entries `in` beats
    val (pre, post) = buf.docs.span(e => better(in, e))
    val r = pre ::: in :: post
    if (buf.n >= k) RankBuf(k, r.tail) else RankBuf(buf.n + 1, r)
  }

  override def merge(a: RankBuf, b: RankBuf): RankBuf = {
    // both sides ascending; take the k BEST = merge descending from the
    // reversed lists, truncate at k, restore ascending order
    val out = List.newBuilder[RankedDoc]
    var (x, y, n) = (a.docs.reverse, b.docs.reverse, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    val merged = out.result()
    RankBuf(merged.size, merged.reverse)
  }

  override def finish(r: RankBuf): List[RankedDoc] = r.docs.reverse

  override def bufferEncoder: Encoder[RankBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[List[RankedDoc]] = ExpressionEncoder()
}

/** One ranked ANN candidate: DOUBLE cosine score (the vector family's
  * native score type — unlike the lexical fold there is no decimal
  * summation stage, and a decimal cast would RE-ROUND the score the
  * window used to order by), id as the total tie-break.
  */
final case class RankedDocD(score: Double, docId: Long)

/** Worst-first sized buffer for the double twin — same O(1)-reject
  * argument as [[RankBuf]].
  */
final case class RankBufD(n: Int, docs: List[RankedDocD])

/** [[TopKRankAggregator]]'s double-score twin for the ANN serving paths
  * (queryIvfIndex's probed-list rank, queryIvfPqIndex's quantized
  * shortlist): same bounded-heap distribution argument — map-side ≤k
  * rows per (partition, query), final merge ≤ partitions×k — with the
  * comparison EXACTLY matching Spark's DoubleType sort order
  * (SQLOrderingUtil.compareDoubles: `a == b` first, so -0.0 == 0.0;
  * java.lang.Double.compare otherwise, so NaN ranks greatest), which is
  * what makes the emitted list position bit-identical to the
  * `row_number over (orderBy sim desc, id asc)` it replaces — pinned by
  * DedupSimilaritySpec's persisted-vs-in-memory equality.
  */
class TopKRankAggregatorD(k: Int)
    extends Aggregator[RankedDocD, RankBufD, List[RankedDocD]] {

  private def cmpD(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  private def better(a: RankedDocD, b: RankedDocD): Boolean = {
    val c = cmpD(a.score, b.score)
    c > 0 || (c == 0 && a.docId < b.docId)
  }

  override def zero: RankBufD = RankBufD(0, Nil)

  override def reduce(buf: RankBufD, in: RankedDocD): RankBufD =
    if (buf.n >= k && !better(in, buf.docs.head)) buf // O(1) reject
    else insert(buf, in)

  private def insert(buf: RankBufD, in: RankedDocD): RankBufD = {
    val (pre, post) = buf.docs.span(e => better(in, e))
    val r = pre ::: in :: post
    if (buf.n >= k) RankBufD(k, r.tail) else RankBufD(buf.n + 1, r)
  }

  override def merge(a: RankBufD, b: RankBufD): RankBufD = {
    val out = List.newBuilder[RankedDocD]
    var (x, y, n) = (a.docs.reverse, b.docs.reverse, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    val merged = out.result()
    RankBufD(merged.size, merged.reverse)
  }

  override def finish(r: RankBufD): List[RankedDocD] = r.docs.reverse

  override def bufferEncoder: Encoder[RankBufD] = ExpressionEncoder()
  override def outputEncoder: Encoder[List[RankedDocD]] = ExpressionEncoder()
}
