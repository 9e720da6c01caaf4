package graft

import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("clean: trims tails, filters low quality, keeps one doc per dup cluster") {
    val base = "the quick brown fox jumps over the lazy dog and then rests"
    val corpus = Seq(
      (1L, base),                                   // keeper
      (2L, base),                                   // exact dup of 1 → dropped
      (3L, base.replace("lazy", "sleepy")),         // near dup of 1 → dropped
      (4L, "completely different content about the spark engine and its joins"),
      (5L, "x"),                                    // below p5 length tail
      (6L, Seq.fill(400)("word").mkString(" ")))    // above p95 length tail
      .toDF("doc_id", "text")

    val cleaned = CorpusPipeline.clean(corpus,
      cfg = CorpusPipeline.Config(minQuality = 0.2))
    val kept = cleaned.select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(4L))
    assert(!kept.contains(2L) && !kept.contains(3L)) // dup cluster collapsed
    assert(!kept.contains(5L) && !kept.contains(6L)) // length tails trimmed
  }

  test("minhash-verified pair stage reproduces the exact pair stage") {
    val base = "the quick brown fox jumps over the lazy dog and then rests"
    val corpus = Seq(
      (1L, base), (2L, base),
      (3L, base.replace("lazy", "sleepy")),
      (4L, "completely different content about the spark engine and its joins"),
      (5L, "another unrelated document describing window functions at length"))
      .toDF("doc_id", "text")
    val exact = CorpusPipeline.clean(corpus,
        cfg = CorpusPipeline.Config(minQuality = 0.0, lengthLoQ = 0.0, lengthHiQ = 1.0))
      .select("doc_id").as[Long].collect().toSet
    val mh = CorpusPipeline.clean(corpus,
        cfg = CorpusPipeline.Config(minQuality = 0.0, lengthLoQ = 0.0,
          lengthHiQ = 1.0, minhashPairs = true))
      .select("doc_id").as[Long].collect().toSet
    assert(exact == mh)
    assert(exact == Set(1L, 4L, 5L)) // dup cluster {1,2,3} collapsed to 1
  }

  test("clean preserves the input schema") {
    val corpus = Seq((1L, "some reasonable document text here", "en"))
      .toDF("doc_id", "text", "lang")
    val cleaned = CorpusPipeline.clean(corpus,
      cfg = CorpusPipeline.Config(minQuality = 0.0, lengthLoQ = 0.0, lengthHiQ = 1.0))
    assert(cleaned.columns.toSeq == Seq("doc_id", "text", "lang"))
    assert(cleaned.count() == 1)
  }

  test("benchmark decontamination stage drops overlapping docs first") {
    val wide = CorpusPipeline.Config(minQuality = 0.0, lengthLoQ = 0.0,
      lengthHiQ = 1.0)
    val bench = Seq(
      (900L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta leaked benchmark copy"),
      (2L, "a perfectly ordinary training document with original words"))
      .toDF("doc_id", "text")
    // without a benchmark both docs survive the wide-open config
    assert(CorpusPipeline.clean(corpus, cfg = wide).count() == 2)
    val cleaned = CorpusPipeline.clean(corpus, cfg = wide,
      benchmark = Some(bench))
    assert(cleaned.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }
}
