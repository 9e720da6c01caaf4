package graft.operators

import graft.functions.SimHashTokenHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus mixing — the "take 50% of English,
  * 10% of everything else" stage of a training-data pipeline. Membership
  * is a pure function of the row id (shared-arithmetic hash < rate·M), so
  * the sample is: reproducible across runs/engines (the driver oracle
  * replays it), stable under repartitioning, and a strict subset/superset
  * relation holds between any two rates of the same group (raising a quota
  * only ADDS documents — the property curriculum schedules rely on).
  * Plan shape: a filter in the scan, zero shuffles.
  */
object Sampling {

  private val M = SimHashTokenHash.M

  /** Per-group hash thresholds as exact long literals (single source for
    * the Spark filter and the SQL oracle).
    */
  def thresholds(rates: Map[String, Double], defaultRate: Double):
      (Map[String, Long], Long) =
    (rates.map { case (g, r) => g -> (r * M).toLong }, (defaultRate * M).toLong)

  /** Per-group thresholds as ONE constant-folded map literal lookup —
    * flat expression tree regardless of group count (the unrolled
    * when-chain alternative degrades codegen at thousands of groups,
    * same lesson as Ranking's bucket offsets).
    */
  private def thresholdCol(groupCol: Column, thr: Map[String, Long],
      default: Long): Column =
    if (thr.isEmpty) lit(default)
    else coalesce(
      element_at(
        map(thr.toSeq.sortBy(_._1)
          .flatMap { case (g, t) => Seq(lit(g), lit(t)) }: _*),
        groupCol),
      lit(default))

  /** Keep rows whose id-hash falls under their group's quota threshold. */
  def quotaSample(df: DataFrame, groupCol: Column, idCol: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val (ts, dt) = thresholds(rates, defaultRate)
    df.filter(Sketches.numHash(idCol) < thresholdCol(groupCol, ts, dt))
  }

  /** Deterministic train/val/test assignment — the canonical dataset
    * split: the id-hash space is cut at the cumulative fractions, so
    * membership is a pure row-local function (reproducible, stable under
    * repartitioning, and growing the corpus never moves an existing row
    * between splits). Returns the split label Column; thresholds are the
    * exact longs the oracle replays.
    */
  def splitAssign(idCol: Column, fractions: Seq[(String, Double)]): Column = {
    val ts = splitThresholds(fractions)
    val h = Sketches.numHash(idCol)
    ts.init.foldRight(lit(ts.last._1): Column) {
      case ((name, t), acc) => when(h < lit(t), lit(name)).otherwise(acc)
    }
  }

  /** Cumulative hash-space cutpoints for [[splitAssign]] (single source
    * for the Spark expression and the SQL oracle).
    */
  def splitThresholds(fractions: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "split fractions must be positive")
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    require(math.abs(cum.last - 1.0) < 1e-9, "split fractions must sum to 1")
    fractions.zip(cum).map { case ((n, _), c) => (n, (c * M).toLong) }
  }

  /** Weighted mixture sampling — the Dolma/Pile-style source-mixing
    * stage: `weights` are the TARGET mix proportions over `groupCol`
    * (groups absent from `weights` are dropped). The binding group
    * (smallest capacity n/w) is kept whole and every other group
    * downsampled, so the kept corpus matches the target mix at the
    * maximum achievable size. Rates derive from ONE tiny count-by-group
    * aggregate; membership is [[quotaSample]]'s deterministic id-hash
    * filter. Every arithmetic step (n/w capacity min, (w·t/n)·M
    * truncation) is a plain double/integer op a SQL oracle replays
    * verbatim, so the data-dependent sample is still hash-checkable.
    * Plan: one count aggregate + a scan-level filter, zero data shuffles.
    */
  def mixtureSample(df: DataFrame, groupCol: Column, idCol: Column,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be positive")
    // Weight keys are strings, so group matching runs on the string form of
    // the column — an int/date source id works without a caller-side cast.
    val g = groupCol.cast("string")
    val inMix = df.filter(g.isin(weights.keys.toSeq: _*))
    val counts = inMix.groupBy(g.as("__g"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (gk, _) => counts.getOrElse(gk, 0L) > 0L }
    require(present.nonEmpty, "no mixture group present in the data")
    val capacity = present.map { case (gk, w) => counts(gk) / w }.min
    val thr = present.map { case (gk, w) =>
      gk -> ((w * capacity / counts(gk)) * M).toLong }
    inMix.filter(Sketches.numHash(idCol) < thresholdCol(g, thr, -1L))
  }

  /** DSIR data selection (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): score every document by how
    * much more likely its hashed-unigram bag is under the TARGET
    * distribution than under the raw corpus, and keep the global top-k.
    * Features are the shared-arithmetic polynomial token hash folded
    * into `buckets` bins (the d40 feature-hashing bridge); both bag
    * models are Laplace-smoothed (+1 per bin, +buckets on the total), so
    * the per-bin log weight is
    * ln((tgt+1)·(Nraw+B) / ((raw+1)·(Ntgt+B))) and a document's
    * importance weight is Σ_b count_doc[b] · logw[b].
    *
    * Determinism: the per-bin addends are doubles multiplied by integer
    * counts (IEEE-deterministic), summed through DECIMAL(38,18) casts —
    * order-independent, so exact-duplicate documents get bit-identical
    * sums and break ties on doc_id. ln() is the one 1-ulp-portable op,
    * so the contract output is the RANK, not the weight — the same
    * argument BM25 (v10) rests on. Output: (doc_id, rank, n_feats) for
    * the top `k`, rank by weight desc / doc_id asc; n_feats (occupied
    * bins, exact int) keeps a second hash-checkable signal.
    *
    * Scale shape: one (doc, bin) count shuffle with map-side combine
    * (bins ≤ `buckets`, so each doc contributes ≤ B rows regardless of
    * length); the bag models are a `buckets`-row aggregate (two longs
    * collected for the totals); scoring is a broadcast join + one
    * doc-keyed combine-agg; selection is a distributed TakeOrdered —
    * no global sort, no corpus-sized window, nothing corpus-sized near
    * the driver.
    */
  def dsirTopK(docs: DataFrame, targetPred: Column, buckets: Int, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val perDoc = docs
      .select(col(idCol).as("doc_id"), targetPred.as("is_tgt"),
        explode(split(col(textCol), " ")).as("term"))
      .withColumn("b",
        graft.functions.TextFns.polyTokenHash(col("term"))
          % lit(buckets.toLong))
      .groupBy("doc_id", "is_tgt", "b")
      .agg(count(lit(1)).as("cnt"))
    // ONE pass builds the whole bag model: a ≤`buckets`-row aggregate
    // collected in a single job, with the totals and the per-bin log
    // weights derived on the driver. This replaces the former TWO model
    // jobs (a totals collect plus a broadcast-join subtree that
    // re-tokenized the corpus a third time) — the corpus tokenize+count
    // shuffle now runs twice (model pass + scoring pass), the structural
    // minimum for importance resampling (the model must be complete
    // before any document can be scored). Bit-equality with the former
    // Column form: same +/×// double ops in the same order, and
    // StrictMath.log IS Spark's `log` (catalyst Log delegates to it in
    // both interpreted and codegen paths).
    val model = perDoc.groupBy("b").agg(
        sum(col("cnt")).as("raw"),
        sum(when(col("is_tgt"), col("cnt")).otherwise(lit(0L))).as("tgt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nRaw = model.map(_._2).sum
    val nTgt = model.map(_._3).sum
    val logwByBin = new Array[Double](buckets)
    model.foreach { case (b, raw, tgt) =>
      logwByBin(b.toInt) = StrictMath.log(
        (tgt.toDouble + 1.0) * (nRaw.toDouble + buckets)
          / ((raw.toDouble + 1.0) * (nTgt.toDouble + buckets)))
    }
    // the weights attach as a constant-folding array subscript — no
    // broadcast exchange, no join, nothing corpus-sized recomputed
    val scored = perDoc
      .withColumn("logw",
        element_at(lit(logwByBin), col("b").cast("int") + lit(1)))
      .groupBy("doc_id")
      .agg(sum((col("cnt").cast("double") * col("logw"))
          .cast("decimal(38,18)")).as("w"),
        count(lit(1)).cast("long").as("n_feats"))
    // TakeOrdered top-k, then rank the k survivors (k-row window)
    scored.orderBy(col("w").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("w").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("n_feats"))
  }

  /** Keep at most `k` rows per group, chosen by `order` (ascending,
    * which must be a total order for determinism) — the per-domain
    * document cap every crawl corpus applies (Gopher/CCNet-style
    * per-host quotas: no single domain may dominate the corpus). One
    * hash shuffle on the group key; groups are ranked independently,
    * so the shape distributes across the (many) groups. A single
    * pathological mega-group ranks in one task — if a deployment's
    * biggest group outgrows a task, pre-prune per partition first
    * (rank ≤ k per partition is a superset of the global top-k), the
    * Ranking.global trick.
    */
  def capPerGroup(df: DataFrame, group: Column, order: Column,
      k: Int): DataFrame = {
    require(k > 0, s"capPerGroup: k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(group).orderBy(order)))
      .filter(col("__rn") <= k).drop("__rn")
  }
}
