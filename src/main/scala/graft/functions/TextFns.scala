package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus processing (training-data
  * pipeline surface; BASELINE.json north star). Everything is a pure Column
  * expression over codegen'd built-ins — no UDFs, no shuffle: each document
  * is scored within its own row, so these scale linearly with the scan.
  */
object TextFns {

  /** Whitespace tokenization. Single-space split keeps oracle (DuckDB
    * string_split) parity; use tokensWs for arbitrary whitespace runs.
    */
  /** PII-scrub patterns (email, then dashed phone) — character classes
    * and bounded quantifiers ONLY, so Java regex (Spark) and RE2
    * (DuckDB) agree token-for-token; emails scrub first because their
    * local parts may contain digit runs.
    */
  val emailPat: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePat: String = "\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Redact emails and phone numbers (the training-data PII scrub):
    * deterministic token replacement, all occurrences.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, emailPat, "<EMAIL>"),
      phonePat, "<PHONE>")

  def tokens(c: Column): Column = split(c, " ")

  def tokensWs(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Ratio of tokens found in `stops` (quality-scoring feature). */
  def stopwordRatio(c: Column, stops: Seq[String]): Column = {
    val stopArr = array(stops.map(lit): _*)
    size(filter(tokens(c), t => array_contains(stopArr, t))).cast("double") /
      size(tokens(c)).cast("double")
  }

  /** Mean token length in characters. */
  def avgTokenLen(c: Column): Column =
    length(regexp_replace(c, " ", "")).cast("double") /
      size(tokens(c)).cast("double")

  /** Word n-gram shingles as space-joined strings (dedup feature space). */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))
    ).otherwise(array().cast("array<string>"))
  }

  /** Distinct shingles (set semantics for Jaccard) — single-loop
    * [[ShingleSetExpr]]; identical to `array_distinct(shingles(c, n))`
    * (property-tested).
    */
  def shingleSet(c: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(ShingleSetExpr(expression(c), n))
  }

  /** HOF formulation of [[shingleSet]] — the property-check reference. */
  def shingleSetHof(c: Column, n: Int): Column = array_distinct(shingles(c, n))

  /** Per-language marker-word hit count (integer — exactly reproducible in
    * any SQL engine).
    */
  def markerScore(c: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(tokens(c), t => array_contains(arr, t)))
  }

  /** First-maximum decision over already-computed score columns: lang_i wins
    * if its score strictly exceeds every earlier lang's and is >= every
    * later lang's (fixed tie-break priority = `scores` order). Pass
    * PROJECTED columns, not raw expressions — the chain references each
    * score up to 2·n times.
    */
  def langIdFromScores(scores: Seq[(String, Column)]): Column =
    scores.zipWithIndex.foldRight(lit("und")) {
      case (((lang, s), i), acc) =>
        val beatsEarlier = scores.take(i).map { case (_, s2) => s > s2 }
        val tiesLater = scores.drop(i + 1).map { case (_, s2) => s >= s2 }
        val cond = (beatsEarlier ++ tiesLater :+ (s > 0)).reduce(_ && _)
        when(cond, lit(lang)).otherwise(acc)
    }

  /** Heuristic language ID in one expression — convenient for few languages;
    * for wide marker sets project [[markerScore]] columns first and use
    * [[langIdFromScores]] (each score is evaluated once instead of ~2·n
    * times).
    */
  def langId(c: Column, markers: Seq[(String, Seq[String])]): Column =
    langIdFromScores(markers.map { case (l, ws) => l -> markerScore(c, ws) })

  /** Normalization for fingerprinting: lowercase, collapse space runs, trim. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), " +", " "))

  /** 64-bit content fingerprint of the normalized text (xxhash64). Distinct
    * fingerprints == distinct normalized texts up to hash collision.
    */
  def fingerprint(c: Column): Column = xxhash64(normalizeText(c))

  /** MinHash signature: `numHashes` independent permutations approximated by
    * seeded xxhash64 over the shingle set; each signature slot is the min
    * hash across shingles. Computed by the [[MinHashSig]] expression (single
    * tight loop per row). Empty shingle sets yield the Long.MaxValue
    * sentinel signature.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(MinHashSig(expression(shingleCol), numHashes))
  }

  /** HOF formulation of [[minhashSignature]] — kept as the property-check
    * reference (identical hash chain, identical signatures).
    */
  def minhashSignatureHof(shingleCol: Column, numHashes: Int): Column = {
    val seeds = sequence(lit(0), lit(numHashes - 1))
    aggregate(
      shingleCol,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, s) => zip_with(acc, transform(seeds, i => xxhash64(i, s)),
        (a, h) => least(a, h)))
  }

  /** 64-bit SimHash over tokens: per-token 64-bit hash votes +1/-1 on each
    * bit, bit set where the sum is positive. Computed entirely within the
    * row by the [[SimHashSig]] expression — no shuffle, single loop.
    */
  def simhash64(c: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(SimHashSig(expression(tokens(c))))
  }

  /** HOF formulation of [[simhash64]] — the property-check reference.
    * Implements the [[SimHashTokenHash]] spec (poly roll over code points +
    * two multiply-mod-xorshift streams) in Column algebra.
    */
  /** Shared-arithmetic polynomial token hash ([[SimHashTokenHash]] spec,
    * pre-mix): bounded below 2^50 so any engine with 64-bit integer SQL
    * replays it exactly — the portable token→bucket hash for feature
    * hashing (d40) and the first stage of the SimHash streams.
    */
  def polyTokenHash(t: Column): Column =
    aggregate(transform(split(t, ""), ch => ascii(ch).cast("long")),
      lit(SimHashTokenHash.H0),
      (h, code) => (h * lit(131L) + code) % lit(SimHashTokenHash.M))

  def simhash64Hof(c: Column): Column = {
    val M = lit(SimHashTokenHash.M)
    val toks = tokens(c)
    val bitIdx = sequence(lit(0), lit(63))
    def polyHash(t: Column): Column =
      aggregate(transform(split(t, ""), ch => ascii(ch).cast("long")),
        lit(SimHashTokenHash.H0), (h, code) => (h * lit(131L) + code) % M)
    def mixOnce(x: Column, m: Column): Column = (x * m) % M
    def xs(x: Column): Column =
      x.bitwiseXOR(call_function("shiftright", x, lit(25)))
    def mix(h: Column, m: Long): Column =
      xs(mixOnce(xs(mixOnce(h, lit(m))), lit(m)))
    val counts = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h0 = polyHash(t)
        val h1 = mix(h0, 8191L)
        val h2 = mix(h0, 4099L)
        zip_with(acc, bitIdx,
          (a, b) => {
            val src = when(b < 32, call_function("shiftright", h1, b))
              .otherwise(call_function("shiftright", h2, b - lit(32)))
            a + when(src.bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)
          })
      })
    aggregate(
      zip_with(counts, bitIdx,
        (cnt, b) => when(cnt > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }
}
