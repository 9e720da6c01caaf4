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
  * does not beat the current k-th is dropped in O(1) — the common case
  * once the buffer saturates, so per-row cost is O(1) amortized, O(k)
  * only while a better candidate inserts.
  */
class TopKRankAggregator(k: Int)
    extends Aggregator[RankedDoc, List[RankedDoc], List[RankedDoc]] {

  private def better(a: RankedDoc, b: RankedDoc): Boolean = {
    val c = a.score.compare(b.score)
    c > 0 || (c == 0 && a.docId < b.docId)
  }

  override def zero: List[RankedDoc] = Nil

  override def reduce(buf: List[RankedDoc], in: RankedDoc): List[RankedDoc] =
    if (buf.lengthCompare(k) >= 0 && better(buf.last, in)) buf
    else insert(buf, in)

  private def insert(buf: List[RankedDoc], in: RankedDoc): List[RankedDoc] = {
    val (pre, post) = buf.span(better(_, in))
    (pre ::: in :: post).take(k)
  }

  override def merge(a: List[RankedDoc], b: List[RankedDoc]): List[RankedDoc] = {
    // both sides are sorted; classic merge, truncated at k
    val out = List.newBuilder[RankedDoc]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(r: List[RankedDoc]): List[RankedDoc] = r

  override def bufferEncoder: Encoder[List[RankedDoc]] = ExpressionEncoder()
  override def outputEncoder: Encoder[List[RankedDoc]] = ExpressionEncoder()
}

/** One ranked ANN candidate: DOUBLE cosine score (the vector family's
  * native score type — unlike the lexical fold there is no decimal
  * summation stage, and a decimal cast would RE-ROUND the score the
  * window used to order by), id as the total tie-break.
  */
final case class RankedDocD(score: Double, docId: Long)

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
    extends Aggregator[RankedDocD, List[RankedDocD], List[RankedDocD]] {

  private def cmpD(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  private def better(a: RankedDocD, b: RankedDocD): Boolean = {
    val c = cmpD(a.score, b.score)
    c > 0 || (c == 0 && a.docId < b.docId)
  }

  override def zero: List[RankedDocD] = Nil

  override def reduce(buf: List[RankedDocD], in: RankedDocD): List[RankedDocD] =
    if (buf.lengthCompare(k) >= 0 && better(buf.last, in)) buf
    else insert(buf, in)

  private def insert(buf: List[RankedDocD], in: RankedDocD): List[RankedDocD] = {
    val (pre, post) = buf.span(better(_, in))
    (pre ::: in :: post).take(k)
  }

  override def merge(a: List[RankedDocD], b: List[RankedDocD]): List[RankedDocD] = {
    val out = List.newBuilder[RankedDocD]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(r: List[RankedDocD]): List[RankedDocD] = r

  override def bufferEncoder: Encoder[List[RankedDocD]] = ExpressionEncoder()
  override def outputEncoder: Encoder[List[RankedDocD]] = ExpressionEncoder()
}
