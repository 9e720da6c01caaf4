package graft.operators

import graft.functions.{KmvAggregator, SimHashTokenHash}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mergeable sketches for 100 TB profiling — the
  * oracle-checkable counterparts of HLL / t-digest. Both are bounded-memory
  * partial aggregates (map-side combine before one shuffle), and both are
  * pure shared arithmetic, so the driver's DuckDB oracle replays the exact
  * semantics instead of settling for a rows-only check (Spark's built-in
  * `approx_count_distinct` / `percentile_approx` remain available where
  * engine-specific internals are acceptable).
  */
object Sketches {

  /** The shared 64-bit-safe numeric hash: reduce into [0, M), then two
    * multiply-mod-xorshift rounds per SimHashTokenHash's bounds (all
    * intermediates < 2^63 — replayable in plain integer SQL).
    */
  def numHash(c: Column): Column = {
    val M = SimHashTokenHash.M
    def mixSql(x: Column, m: Long): Column = {
      val x1 = (x * lit(m)) % lit(M)
      val x2 = x1.bitwiseXOR(call_function("shiftright", x1, lit(25)))
      val x3 = (x2 * lit(m)) % lit(M)
      x3.bitwiseXOR(call_function("shiftright", x3, lit(25)))
    }
    // the H0 offset guarantees the first multiply wraps mod M even for
    // small inputs — without it the k smallest hashes (KMV's tail) come
    // from the non-wrapped, non-uniform low range
    val seeded = (pmod(c.cast("long"), lit(M)) + lit(SimHashTokenHash.H0)) % lit(M)
    mixSql(mixSql(mixSql(seeded, 8191L), 4099L), 5851L)
  }

  /** KMV (k-minimum-values) distinct-count sketch per group: keep the k
    * smallest distinct hashes; estimate = (k-1)*M / h_k, or the exact
    * distinct count while fewer than k hashes were seen. Buffer is O(k)
    * and mergeable — each input partition ships at most k values.
    */
  def kmvDistinct(df: DataFrame, groupCol: Column, valueCol: Column,
      k: Int, groupName: String, estimateName: String): DataFrame = {
    import df.sparkSession.implicits._
    val keyed = df.select(groupCol.cast("string").as("__g"),
      numHash(valueCol).as("__h")).as[(String, Long)]
    val agg = new KmvAggregator(k).toColumn
    keyed.groupByKey(_._1).mapValues(_._2)
      .agg(agg.name(estimateName))
      .toDF(groupName, estimateName)
  }

  /** Equi-width histogram quantiles per group: B buckets over the column's
    * exact global [min, max]; the q-quantile estimate is the upper edge of
    * the first bucket whose cumulative count reaches q*n. Bucket counts are
    * a plain group-by (mergeable vector), memory O(B) per group.
    */
  def histQuantiles(df: DataFrame, groupCol: Column, valueCol: Column,
      buckets: Int, qs: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.agg(min(valueCol).cast("double"), max(valueCol).cast("double")).head()
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val width = (hi - lo) / buckets
    val bucket =
      if (width == 0.0) lit(0)
      else least(lit(buckets - 1),
        greatest(lit(0), floor((valueCol.cast("double") - lit(lo)) / lit(width)).cast("int")))
    val counts = df.groupBy(groupCol.as("__g"), bucket.as("__b"))
      .agg(count(lit(1)).as("__c"))
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(col("__g")).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col("__g"))))
    val quantCols = qs.map { case (name, q) =>
      min(when(col("__cum").cast("double") >= lit(q) * col("__n").cast("double"),
        col("__b"))).as(s"__b_$name")
    }
    cum.groupBy(col("__g"))
      .agg(quantCols.head, quantCols.tail: _*)
      .select(col("__g") +: qs.map { case (name, _) =>
        (lit(lo) + (col(s"__b_$name") + lit(1)).cast("double") * lit(width))
          .as(name)
      }: _*)
  }

  /** Row-salted term hash for the Count-Min sketch: the shared
    * polynomial fold ([[graft.functions.TextFns.polyTokenHash]]) over
    * `"<row>:" || term`, reduced mod `width` — one independent-enough
    * hash per sketch row, replayable character-for-character in SQL.
    */
  private def cmsCell(row: Int, term: Column, width: Int): Column =
    graft.functions.TextFns.polyTokenHash(
      concat(lit(s"$row:"), term)) % lit(width.toLong)

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) over a token
    * stream — the mergeable frequency sketch next to [[kmvDistinct]]'s
    * cardinality and [[histQuantiles]]'s quantiles: depth×width cells,
    * cell(r) += occurrences for every term, estimate = min over rows.
    * Everything is integer addition over deterministic cells, so the
    * sketch is ORDER-INDEPENDENT and EXACTLY mergeable (cell-wise sum
    * of shard sketches == sketch of the union — the 100 TB shape: each
    * executor/day/shard sketches locally, a depth×width table merges
    * them; guarantees ε = e/width overcount at δ = e^-depth). Build is
    * one map-side-combined (term) count shuffle plus a depth-way
    * vocabulary-sized expand — corpus size enters only through the
    * first combine.
    */
  private def termCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))

  private def sketchFromCounts(tf: DataFrame, depth: Int,
      width: Int): DataFrame =
    (0 until depth).map { r =>
      tf.select(lit(r).as("row"), cmsCell(r, col("term"), width).as("cell"),
        col("cnt"))
    }.reduce(_ unionByName _)
      .groupBy("row", "cell").agg(sum(col("cnt")).as("cnt"))

  def countMinSketch(docs: DataFrame, depth: Int = 4, width: Int = 256,
      textCol: String = "text"): DataFrame =
    sketchFromCounts(termCounts(docs, textCol), depth, width)

  /** Per-term CMS point estimates next to the true counts — the
    * overcount-only guarantee made visible (estimate ≥ truth always;
    * equality exactly when the term collides with nothing on some row).
    * The corpus is tokenized and combined ONCE: the (term, cnt) frame
    * feeds both the sketch and the probes, persisted for the two
    * consumers (vocabulary-sized — Zipf-small relative to the corpus;
    * LRU-evicted, never corpus-scale).
    */
  def countMinEstimates(docs: DataFrame, depth: Int = 4, width: Int = 256,
      textCol: String = "text"): DataFrame = {
    val tf = termCounts(docs, textCol).persist()
    val sketch = sketchFromCounts(tf, depth, width)
    val probes = (0 until depth).map { r =>
      tf.select(col("term"), col("cnt").as("true_cnt"), lit(r).as("row"),
        cmsCell(r, col("term"), width).as("cell"))
    }.reduce(_ unionByName _)
    probes.join(sketch, Seq("row", "cell"))
      .groupBy("term", "true_cnt")
      .agg(min(col("cnt")).as("cms_estimate"))
      .select(col("term"), col("true_cnt"), col("cms_estimate"))
  }
}
