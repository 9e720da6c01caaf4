package graft

import graft.operators.Percentiles
import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  // 40 copies of each count 1..25: every percentile falls INSIDE a run of
  // equal values, so exact interpolation and the approx sketch (which
  // returns an actual data value) must produce identical bounds.
  private lazy val blocks = (1 to 25).flatMap(v => Seq.fill(40)(v))
    .zipWithIndex.map { case (v, i) => (i.toLong, v.toLong) }
    .toDF("id", "n")

  test("exact and approx band bounds agree on block-duplicated data") {
    val e = Percentiles.bandBounds(blocks, col("n"), 0.05, 0.95, exact = true)
      .as[(Double, Double)].head()
    val a = Percentiles.bandBounds(blocks, col("n"), 0.05, 0.95, exact = false)
      .as[(Double, Double)].head()
    assert(e == a, s"exact=$e approx=$a")
  }

  test("band filter keeps the same rows on both paths") {
    val kept1 = Percentiles.bandFilter(blocks, col("n"), 0.1, 0.9, exact = true)
      .select("id").as[Long].collect().toSet
    val kept2 = Percentiles.bandFilter(blocks, col("n"), 0.1, 0.9, exact = false)
      .select("id").as[Long].collect().toSet
    assert(kept1 == kept2)
    assert(kept1.nonEmpty && kept1.size < 1000)
  }

  test("corpus pipeline: approx path reproduces the exact path") {
    // 12 distinct lengths × 25 copies: both band edges (ranks 14.95 and
    // 284.05 of 300) fall inside same-value runs, so interpolated-exact
    // and value-returning-approx bounds coincide
    val docs = (0 until 300).map { i =>
      val len = 5 + (i % 12) * 4
      val words = (0 until len).map(j => s"w${(i + j) % 97}")
      (i.toLong, ("the of and " * 3) + words.mkString(" "), "en", len)
    }.toDF("doc_id", "text", "lang", "n_chars")
    val exact = CorpusPipeline.clean(docs)
      .select("doc_id").as[Long].collect().toSet
    val approx = CorpusPipeline.clean(docs,
        cfg = CorpusPipeline.Config(exactPercentiles = false))
      .select("doc_id").as[Long].collect().toSet
    assert(exact == approx)
  }

  test("approx plan aggregates a sketch, not a full value buffer") {
    val plan = Percentiles.bandBounds(blocks, col("n"), 0.05, 0.95,
      exact = false).queryExecution.executedPlan.toString
    assert(plan.contains("approx_percentile") || plan.contains("percentile_approx"))
  }
}
