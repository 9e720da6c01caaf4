package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1 to 10000).map { i =>
    (i.toLong, Seq("en", "de", "fr")(i % 3), 100 + i % 50)
  }.toDF("doc_id", "lang", "n_chars")

  test("mixtureSample: kept corpus matches the target mix, binding group whole") {
    // skewed source sizes: en 3× the others → de/fr weights force en down
    val skewed = (1 to 12000).map { i =>
      val lang = if (i % 5 < 3) "en" else if (i % 5 == 3) "de" else "fr"
      (i.toLong, lang, 100)
    }.toDF("doc_id", "lang", "n_chars")
    val kept = Sampling.mixtureSample(skewed, col("lang"), col("doc_id"),
        Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = skewed.groupBy("lang").count().as[(String, Long)].collect().toMap
    // capacity = min(n/w) = de or fr (2400/0.25 = 9600 < 7200/0.5 = 14400)
    // → binding group kept ~whole, en downsampled to ~0.5·9600 = 4800
    val total = kept.values.sum.toDouble
    assert(math.abs(kept("en") / total - 0.5) < 0.03)
    assert(math.abs(kept("de") / total - 0.25) < 0.03)
    assert(math.abs(kept("fr") / total - 0.25) < 0.03)
    assert(kept("de").toDouble / totals("de") > 0.95) // binding ≈ whole
    assert(kept("en") < totals("en")) // oversized group really downsampled
    // a language outside the mix is dropped entirely
    val withZh = skewed.union(Seq((990000L, "zh", 100)).toDF("doc_id", "lang", "n_chars"))
    val keptZh = Sampling.mixtureSample(withZh, col("lang"), col("doc_id"),
        Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25))
      .filter(col("lang") === "zh").count()
    assert(keptZh == 0)
    // deterministic: same input → byte-identical sample
    val a = Sampling.mixtureSample(skewed, col("lang"), col("doc_id"),
      Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25)).select("doc_id")
      .as[Long].collect().sorted
    val b = Sampling.mixtureSample(skewed.repartition(17), col("lang"),
      col("doc_id"), Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25))
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b)) // repartition-stable membership
  }

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

  test("splitAssign: total partition, near-target sizes, append-stable") {
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = docs.withColumn("split",
        Sampling.splitAssign(col("doc_id"), fracs))
      .select("doc_id", "split").as[(Long, String)].collect()
    // every row gets exactly one label
    assert(got.length == docs.count())
    val sizes = got.groupBy(_._2).view.mapValues(_.length).toMap
    val n = got.length.toDouble
    assert(sizes("train") / n > 0.7 && sizes("train") / n < 0.9)
    assert(sizes.keySet == Set("train", "val", "test"))
    // append-stable: restricting the corpus never relabels a survivor
    val subset = docs.filter(col("doc_id") % 2 === 0).withColumn("split",
        Sampling.splitAssign(col("doc_id"), fracs))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = got.toMap
    assert(subset.forall { case (id, s) => full(id) == s })
  }

  // ------------------------------------------------------------- DSIR

  private lazy val dsirCorpus = Seq(
    // target docs (is_tgt = lang 'en') speak "alpha beta"; raw speaks
    // "gamma delta" — a doc's weight should track which side it sounds like
    (1L, "en", "alpha beta alpha beta alpha"),
    (2L, "en", "alpha beta beta alpha beta"),
    (3L, "de", "gamma delta gamma delta gamma"),
    (4L, "de", "gamma delta delta gamma delta"),
    (5L, "de", "alpha beta alpha beta beta"),   // raw doc in target voice
    (6L, "en", "gamma delta gamma gamma"),      // target doc in raw voice
    (7L, "de", "alpha beta alpha beta beta")    // exact duplicate of 5
  ).toDF("doc_id", "lang", "text")

  test("dsir: target-sounding docs outrank raw-sounding docs") {
    val r = Sampling.dsirTopK(dsirCorpus, col("lang") === "en",
        buckets = 64, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank"))
      .toMap
    // every alpha/beta doc must beat every gamma/delta doc, regardless
    // of which side of the target predicate it sits on
    val targetVoice = Seq(1L, 2L, 5L, 7L).map(r)
    val rawVoice = Seq(3L, 4L, 6L).map(r)
    assert(targetVoice.max < rawVoice.min,
      s"target-voiced docs must all outrank raw-voiced docs: $r")
  }

  test("dsir: exact duplicates tie bit-exactly and break on doc_id") {
    val r = Sampling.dsirTopK(dsirCorpus, col("lang") === "en",
        buckets = 64, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank"))
      .toMap
    // docs 5 and 7 are token-identical → identical DECIMAL sums →
    // adjacent ranks with the lower id first
    assert(r(7L) == r(5L) + 1, s"duplicates must be rank-adjacent: $r")
  }

  test("dsir: k bounds the output and ranks are 1..k dense") {
    val big = (1 to 500).map(i =>
      (i.toLong, if (i % 5 == 0) "en" else "de",
        s"tok${i % 17} tok${i % 13} tok${i % 7}"))
      .toDF("doc_id", "lang", "text")
    val r = Sampling.dsirTopK(big, col("lang") === "en", buckets = 64, k = 50)
      .collect().map(_.getAs[Long]("rank")).sorted.toList
    assert(r == (1L to 50L).toList)
  }
}
