package graft.pipeline

import graft.functions.TextFns
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data cleaning pipeline — the capstone use of the
  * operator library: percentile length trim → heuristic quality filter →
  * n-gram near-dup dedup (pairs → connected clusters → canonical keep).
  * Every stage is deterministic and SQL-reproducible, so the whole pipeline
  * is oracle-checkable end to end; swap the pair stage for
  * [[Dedup.minhashLshPairs]] at 100 TB (same downstream contract).
  */
object CorpusPipeline {

  final case class Config(
      shingleN: Int = 3,
      jaccardThreshold: Double = 0.2,
      maxDocFreq: Long = 50L,
      lengthLoQ: Double = 0.05,
      lengthHiQ: Double = 0.95,
      minQuality: Double = 0.35,
      stopWords: Seq[String] = Seq("the", "a", "of", "and"),
      // exact percentile() is the oracle form; its agg buffer holds every
      // value — set false at corpus scale for the mergeable
      // approx_percentile sketch (see operators.Percentiles)
      exactPercentiles: Boolean = true,
      percentileAccuracy: Int = 10000,
      // pair stage: exact posting-list n-gram Jaccard (oracle form) vs
      // MinHash banding + exact-Jaccard verification (the 100 TB path —
      // same downstream contract; results agree whenever banding recall
      // is 1 at the threshold, which CorpusPipelineSpec pins on test data)
      minhashPairs: Boolean = false,
      minhashNumHashes: Int = 64,
      minhashBands: Int = 16,
      // decontamination (GPT-3/Pile n-gram overlap scrub) runs first when
      // a benchmark set is supplied: docs sharing >= decontamMinOverlap
      // distinct decontamN-grams with any benchmark doc are dropped
      decontamN: Int = 5,
      decontamMinOverlap: Long = 3L)

  /** Returns the cleaned corpus (original columns preserved).
    * `benchmark`, when given, prepends the decontamination stage.
    */
  def clean(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config(),
      benchmark: Option[DataFrame] = None): DataFrame = {
    val decontaminated = benchmark match {
      case Some(b) => Dedup.decontaminate(df, b, idCol, textCol,
        n = cfg.decontamN, minOverlap = cfg.decontamMinOverlap)
      case None => df
    }
    cleanStages(decontaminated, idCol, textCol, cfg)
  }

  private def cleanStages(df: DataFrame, idCol: String,
      textCol: String, cfg: Config): DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    val stopArr = array(cfg.stopWords.map(lit): _*)

    val annotated = df
      .withColumn("__n_toks", size(toks).cast("long"))
      .withColumn("__n_stops",
        size(filter(toks, t => array_contains(stopArr, t))).cast("double"))
      .withColumn("__chars_ns",
        length(regexp_replace(col(textCol), " ", "")).cast("double"))

    // stage 1: percentile band on token counts (drop extreme-length tails)
    val lengthOk = graft.operators.Percentiles.bandFilter(
      annotated, col("__n_toks"), cfg.lengthLoQ, cfg.lengthHiQ,
      exact = cfg.exactPercentiles, accuracy = cfg.percentileAccuracy)

    // stage 2: heuristic quality score (same shape as the d6 scorer)
    val scored = lengthOk.withColumn("__score",
      lit(0.4) * least(col("__n_toks").cast("double") / lit(100.0), lit(1.0))
        + lit(0.3) * (col("__n_stops") / col("__n_toks").cast("double"))
        + lit(0.3) * least((col("__chars_ns") / col("__n_toks").cast("double")) / lit(8.0), lit(1.0)))
    val qualityOk = scored.filter(col("__score") >= cfg.minQuality)
      .select(df.columns.map(col): _*)

    // stage 3: near-dup dedup on the survivors
    val pairs =
      if (cfg.minhashPairs)
        Dedup.verifyPairsExact(qualityOk,
          Dedup.minhashLshPairs(qualityOk, idCol, textCol, n = cfg.shingleN,
            numHashes = cfg.minhashNumHashes, bands = cfg.minhashBands,
            minEstJaccard = 0.0),
          idCol, textCol, n = cfg.shingleN, threshold = cfg.jaccardThreshold)
      else
        Dedup.ngramJaccardPairs(qualityOk, idCol, textCol,
          n = cfg.shingleN, threshold = cfg.jaccardThreshold,
          maxDocFreq = cfg.maxDocFreq)
    Dedup.applyDedup(qualityOk, pairs, idCol)
  }
}
