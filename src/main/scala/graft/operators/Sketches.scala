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

  /** HyperLogLog registers (Flajolet et al. 2007) over a value column —
    * the fixed-memory cardinality sketch completing the mergeable
    * family next to [[kmvDistinct]] (distinct sample), countMinSketch
    * (frequencies), and [[histQuantiles]] (quantiles). KMV keeps k
    * hashes per group; HLL keeps 2^p four-bit-ish registers TOTAL — the
    * shape that lets a 100 TB scan carry cardinality state in bytes per
    * executor and merge shards by a register-wise MAX (max is
    * idempotent/commutative, so the sketch is order-independent and
    * EXACTLY mergeable; HllSpec pins shard-merge == union).
    *
    * Determinism contract (full hash, no rank-only slack): the value
    * runs the shared [[numHash]] chain (uniform on [0, M), M = 2^50−27,
    * replayable in integer SQL); register = low p bits, and rho is
    * TRAILING zeros + 1 of the remaining ~(50−p) bits — P(rho = k) =
    * 2^-k exactly as with the classical leading-zero rank, but trailing
    * zeros is a pure integer CASE over w % 2^k (no log2, no doubles),
    * so the DuckDB oracle replays it branch for branch. Registers are
    * served on the full 0..2^p−1 spine (absent register = 0).
    */
  def hllRegisters(df: DataFrame, valueCol: Column, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"hllRegisters: p=$p out of range")
    val m = 1 << p
    val spark = df.sparkSession
    val hashed = df.select(numHash(valueCol).as("__h"))
      .withColumn("register", (col("__h") % lit(m.toLong)).cast("int"))
      .withColumn("__w", expr(s"__h div $m"))
    // w < 2^(50-p): trailing-zero count ≤ 49-p for w > 0; cap rho at
    // hllRhoCap for w = 0 (the "all bits zero" register value). The
    // terminal OTHERWISE saturates explicitly: at p ≤ 7, w can carry
    // more than hllRhoCap−1 trailing zeros, and without it those rows
    // fell out of every branch to NULL → coalesced to rho 0 on the
    // spine — silently UNDER-recording a register the API's exact
    // contract covers for all p ≥ 4 (r11 advisor). Probability ~2^-42
    // per row, but exact means exact; the oracle CASE carries the same
    // ELSE branch.
    val rho = (1 to (hllRhoCap - 1)).foldLeft(
      when(col("__w") === 0, lit(hllRhoCap))) { (acc, k) =>
      acc.when(col("__w") % lit(1L << k) === lit(1L << (k - 1)), lit(k))
    }.otherwise(lit(hllRhoCap))
    val observed = hashed.select(col("register"), rho.as("rho"))
      .groupBy("register").agg(max(col("rho")).as("rho"))
    spark.range(m).select(col("id").cast("int").as("register"))
      .join(observed, Seq("register"), "left")
      .select(col("register"), coalesce(col("rho"), lit(0)).as("rho"))
  }

  /** rho cap: w has at most 42 usable bits at p=8 (M ≈ 2^50), so 43
    * means "w was exactly zero" — reachable with probability ~2^-42
    * per row and shared with the oracle's CASE verbatim.
    */
  val hllRhoCap = 43

  /** The HLL raw estimate from a register frame: alpha_m · m² / Σ
    * 2^-M[j]. The harmonic denominator is computed SCALED by 2^(cap):
    * each term 2^(cap − rho) is an exact BIGINT (rho ≤ cap), the sum is
    * order-independent integer addition bounded by m·2^cap — exactly
    * representable as a double for p ≤ 10 (m·2^43 ≤ 2^53; larger p
    * still estimates, but the double conversion may round the low
    * bits, so the FULL-HASH cross-engine contract is scoped to
    * p ≤ 10) — and the final estimate is two IEEE double ops over
    * those operands, so no ln() and no decimal→double ambiguity.
    * alpha_m follows Flajolet et al.'s TABLE, not just the asymptotic
    * formula: 0.673 / 0.697 / 0.709 for m = 16/32/64 (the classical
    * small-m constants), 0.7213/(1 + 1.079/m) for m ≥ 128 (r11
    * advisor — the asymptotic constant biases small-m estimates by a
    * few percent). Small-range (linear-counting) correction is
    * deliberately a CONSUMER-side choice: it needs ln(), which costs
    * the cross-engine bit contract; the register frame carries
    * everything needed (V = count of rho=0).
    */
  def hllEstimate(regs: DataFrame, p: Int = 8): DataFrame = {
    val m = (1 << p).toLong
    val alpha = m match {
      case 16L => lit(0.673)
      case 32L => lit(0.697)
      case 64L => lit(0.709)
      case _ => lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    }
    regs.agg(sum(expr(s"shiftleft(cast(1 as bigint), $hllRhoCap - rho)"))
        .as("__denom"))
      .select((alpha * lit(m * m).cast("double") *
        lit(1L << hllRhoCap).cast("double") / col("__denom").cast("double"))
        .as("est"))
  }

  /** Register-wise MAX of two (or more) register frames — the HLL
    * merge, which IS the union sketch: max over unions == union of
    * maxes, exactly (no approximation is introduced by merging; the
    * union ESTIMATE carries the usual HLL error). Frames must share
    * `p` (same spine). Basis for distributed sketching (shard → merge)
    * and for set algebra: |A∩B| ≈ est(A) + est(B) − est(A∪B) by
    * inclusion–exclusion over three exact-contract estimates.
    */
  def hllMerge(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "hllMerge needs at least one frame")
    frames.reduce(_ unionByName _)
      .groupBy("register").agg(max(col("rho")).as("rho"))
  }

  /** Additive row salt for the Count-Min row hashes (decimal digits of
    * e; any fixed constant < M works — rows then diverge through the
    * avalanche chain, not through the salt itself).
    */
  private val cmsRowSalt = 271828182845904L

  /** Row-salted term hash for the Count-Min sketch: the term's
    * polynomial fold (pre-computed once into column `__h`), additively
    * salted per row, pushed through the [[numHash]] chain (H0 seeding +
    * six multiply-mod-xorshift rounds, multipliers 8191²,4099²,5851²),
    * reduced mod `width` into column `cell` — replayable
    * character-for-character in SQL. The chain is what decorrelates the
    * rows: with a salt alone (prefix or additive), row-r and row-0
    * values of same-length terms differ by a constant (the polynomial
    * fold is affine), so cell collisions aligned across every row and
    * the ε = e/width, δ = e^-depth bound did not hold — the min over
    * rows could not rescue a single collision. The six avalanche
    * rounds (the same chain the q19 KMV sketch's uniformity already
    * depends on) make the per-row constants diverge nonlinearly, so
    * the rows collide independently (CountMinSpec pins it on a
    * same-length adversary).
    *
    * Built as ONE PROJECTION PER ROUND, not a single nested Column: the
    * xor(x, x >> 25) steps reference their operand twice, so a nested
    * tree doubles per round (2^6 copies of everything below it) and the
    * driver pays Catalyst analysis of the blown-up tree on EVERY run —
    * measured 1.8 s vs 0.7 s steady on a 31-term vocabulary, pure
    * planning cost. Per-step projections keep each tree two nodes deep
    * (CollapseProject leaves them alone: the alias is referenced
    * twice), and the chain costs what the arithmetic costs.
    */
  private def cellsOf(tf: DataFrame, depth: Int, width: Int): DataFrame = {
    val M = SimHashTokenHash.M
    var out = tf
      .withColumn("__h", graft.functions.TextFns.polyTokenHash(col("term")))
      .withColumn("row", explode(array((0 until depth).map(r => lit(r)): _*)))
      .withColumn("__cms_x",
        ((col("__h") + col("row").cast("long") * lit(cmsRowSalt)) % lit(M)
          + lit(SimHashTokenHash.H0)) % lit(M))
    for (m <- Seq(8191L, 8191L, 4099L, 4099L, 5851L, 5851L)) {
      out = out.withColumn("__cms_y", (col("__cms_x") * lit(m)) % lit(M))
        .withColumn("__cms_x", col("__cms_y").bitwiseXOR(
          call_function("shiftright", col("__cms_y"), lit(25))))
    }
    out.withColumn("cell", col("__cms_x") % lit(width.toLong))
      .drop("__cms_x", "__cms_y", "__h")
  }

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

  def countMinSketch(docs: DataFrame, depth: Int = 4, width: Int = 256,
      textCol: String = "text"): DataFrame =
    cellsOf(termCounts(docs, textCol), depth, width)
      .groupBy("row", "cell").agg(sum(col("cnt")).as("cnt"))

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
    // ONE cells frame (term, cnt, row, cell) feeds both the sketch agg
    // and the probes — the corpus is tokenized and combined once, the
    // cell chain is planned and evaluated once (vocabulary×depth rows;
    // Zipf-small, LRU-evicted, never corpus-scale)
    val cells = cellsOf(termCounts(docs, textCol), depth, width).persist()
    val sketch = cells.groupBy("row", "cell").agg(sum(col("cnt")).as("cnt"))
    cells.select(col("term"), col("cnt").as("true_cnt"), col("row"),
        col("cell"))
      .join(sketch, Seq("row", "cell"))
      .groupBy("term", "true_cnt")
      .agg(min(col("cnt")).as("cms_estimate"))
      .select(col("term"), col("true_cnt"), col("cms_estimate"))
  }
}
