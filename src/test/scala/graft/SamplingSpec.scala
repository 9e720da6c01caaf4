package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1 to 10000).map { i =>
    (i.toLong, Seq("en", "de", "fr")(i % 3), 100 + i % 50)
  }.toDF("doc_id", "lang", "n_chars")

  test("quota rates land near their targets") {
    val kept = Sampling.quotaSample(docs, col("lang"), col("doc_id"),
        Map("en" -> 0.5, "de" -> 0.25), 0.1)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("en").toDouble / totals("en") - 0.5) < 0.05)
    assert(math.abs(kept("de").toDouble / totals("de") - 0.25) < 0.05)
    assert(math.abs(kept("fr").toDouble / totals("fr") - 0.1) < 0.05)
  }

  test("raising a quota only adds documents (nested samples)") {
    def ids(rate: Double) =
      Sampling.quotaSample(docs, col("lang"), col("doc_id"),
        Map.empty, rate).select("doc_id").as[Long].collect().toSet
    val s10 = ids(0.1); val s30 = ids(0.3); val s60 = ids(0.6)
    assert(s10.subsetOf(s30) && s30.subsetOf(s60))
  }

  test("membership is repartition-stable and deterministic") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.quotaSample(df, col("lang"), col("doc_id"), Map("en" -> 0.4), 0.2)
        .select("doc_id").as[Long].collect().toSet
    assert(ids(docs.repartition(1)) == ids(docs.repartition(13)))
  }
}
