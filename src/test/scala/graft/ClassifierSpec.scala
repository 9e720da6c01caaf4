package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

/** Learning behavior of the in-engine logistic classifier (d43). The
  * oracle hash-checks the arithmetic replay; this spec pins that the
  * fixed-step training actually LEARNS: on a separable vocabulary the
  * positive-class voice dominates the top ranks, duplicates tie, and
  * more iterations do not un-learn a separable problem.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // separable: class-t docs speak alpha/beta, class-f docs gamma/delta;
  // two cross-voiced docs carry the opposite vocabulary
  private lazy val corpus = Seq(
    (1L, true, "alpha beta alpha beta alpha"),
    (2L, true, "beta alpha beta beta alpha"),
    (3L, true, "alpha alpha beta beta"),
    (4L, false, "gamma delta gamma delta"),
    (5L, false, "delta gamma delta delta"),
    (6L, false, "gamma gamma delta"),
    (7L, false, "alpha beta alpha beta"),  // negative doc in positive voice
    (8L, true, "gamma delta gamma"),       // positive doc in negative voice
    (9L, false, "alpha beta alpha beta")   // exact duplicate of 7
  ).toDF("doc_id", "is_en", "text")

  private def ranked(iters: Int) =
    Classifier.logisticQualityTopK(corpus, col("is_en"), buckets = 16,
        iters = iters, lr = 0.5, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank"))
      .toMap

  test("classifier ranks by VOICE, not by label: cross-voiced docs follow their vocabulary") {
    val r = ranked(3)
    val positiveVoice = Seq(1L, 2L, 3L, 7L, 9L).map(r)
    val negativeVoice = Seq(4L, 5L, 6L, 8L).map(r)
    assert(positiveVoice.max < negativeVoice.min,
      s"positive-voiced docs must outrank negative-voiced docs: $r")
  }

  test("exact duplicates tie bit-exactly and break on doc_id") {
    val r = ranked(3)
    assert(r(9L) == r(7L) + 1, s"duplicates must be rank-adjacent: $r")
  }

  test("zero iterations rank purely by tie-break; training changes that") {
    // with w = 0 every score is 0.0 → rank == doc_id order
    val r0 = ranked(0)
    assert(r0.toSeq.sortBy(_._2).map(_._1) == (1L to 9L),
      s"untrained ranks must be id order: $r0")
    val r3 = ranked(3)
    assert(r3 != r0, "training must move the ranking")
  }

  test("testdata corpus: deterministic dense ranking (honesty: inseparable)") {
    // the synthetic testdata gives every language the SAME ~31-token
    // near-uniform vocabulary, so lang='en' is lexically INSEPARABLE by
    // construction (measured: top-50 en fraction ≈ the base rate — the
    // same vocabulary caveat as the BM25 stop-word probe). What must
    // still hold: a dense 1..k ranking, reproducible run to run.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run() = Classifier.logisticQualityTopK(docs, col("lang") === "en",
        buckets = 16, iters = 3, lr = 0.5, k = 50)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")))
      .toSeq.sortBy(_._2)
    val a = run()
    assert(a.map(_._2) == (1L to 50L))
    assert(a == run(), "ranking must be reproducible across runs")
  }
}
