package graft

import graft.operators.Dedup

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val shared = "the quick brown fox jumps over the lazy dog today"

  test("a shared 8-gram span is struck from every document carrying it") {
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three $shared four five"),
      (3L, "completely unrelated text with no repeats at all here"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap

    // the 10-token shared passage contains 3 distinct 8-grams; their
    // union covers all 10 shared positions in both docs
    assert(out(1L)._2 == 10, s"doc 1 dup positions: ${out(1L)}")
    assert(out(2L)._2 == 10, s"doc 2 dup positions: ${out(2L)}")
    assert(out(1L)._3 == "alpha beta gamma delta")
    assert(out(2L)._3 == "one two three four five")
    // unique doc and sub-k doc come through untouched
    assert(out(3L)._2 == 0 &&
      out(3L)._3 == "completely unrelated text with no repeats at all here")
    assert(out(4L) == ((2L, 0L, "tiny doc")))
  }

  test("a span repeated only WITHIN one doc is not cross-doc duplicated") {
    val p = "a b c d e f g h"
    val docs = Seq(
      (1L, s"$p x y $p"),
      (2L, "totally different words in this second document body")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", k = 8)
      .filter($"doc_id" === 1L).collect()(0)
    assert(out.getLong(2) == 0, s"within-doc repeat wrongly struck: $out")
  }

  test("overlapping shared spans cover the union of their positions") {
    // doc1/doc2 share tokens 0..9 (an 11-token overlap window), doc2/doc3
    // share a different span; coverage must be per-pairwise-dup union
    val s1 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val s2 = "v1 v2 v3 v4 v5 v6 v7 v8"
    val docs = Seq(
      (1L, s"$s1 endone"),
      (2L, s"$s1 mid $s2"),
      (3L, s"$s2 endthree")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 10)
    assert(out(2L).getLong(2) == 18, s"doc2: ${out(2L)}")
    assert(out(2L).getString(3) == "mid")
    assert(out(3L).getLong(2) == 8)
    assert(out(3L).getString(3) == "endthree")
  }
}
