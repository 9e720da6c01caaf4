package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer with a REAL merge table — the tokenizer
  * LLM pipelines budget in (mixture weights, packing budgets, chunk
  * windows are all denominated in tokenizer tokens, which diverge from
  * regex pre-token counts nonuniformly across text).
  *
  * Training (the classic Sennrich et al. 2016 procedure, made
  * deterministic): pre-tokenize on single spaces, count words — the ONLY
  * corpus-scale pass, a distributed word-count in Spark — then iterate on
  * the in-memory vocabulary: count adjacent symbol pairs weighted by word
  * frequency, merge the most frequent pair everywhere (ties broken by
  * lexicographically smallest pair, so training is order-independent),
  * record it. This vocab-then-train split is how production BPE trainers
  * work at corpus scale too: the distinct-word vocabulary (with a count
  * cutoff) fits driver memory even when the corpus does not.
  *
  * Application (per word, memoized): start from single characters
  * (codepoints — matching SQL `length`/slice semantics, not UTF-16
  * units) and repeatedly merge the LEFTMOST occurrence of the
  * LOWEST-RANK adjacent pair until no pair is in the table. One merge
  * per step keeps the loop trivially replayable by the DuckDB oracle's
  * recursive CTE; ranks are unique so every step is deterministic.
  *
  * The bundled merge table (`resources/graft/bpe_merges.txt`) was
  * trained by [[graft.tools.TrainBpe]] on the sf0.001 documents corpus
  * (48 merges) and is fixed across scale factors, like any shipped
  * tokenizer.
  */
object Bpe {

  val mergesResource = "/graft/bpe_merges.txt"

  /** The bundled merge table, rank = line number. */
  lazy val merges: IndexedSeq[(String, String)] = {
    val in = getClass.getResourceAsStream(mergesResource)
    require(in != null, s"merge table resource $mergesResource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val sp = line.indexOf(' ')
      require(sp > 0 && sp < line.length - 1, s"malformed merge line: $line")
      (line.substring(0, sp), line.substring(sp + 1))
    }.toIndexedSeq
    finally src.close()
  }

  private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  /** Deterministic BPE training over a word-frequency vocabulary. */
  def train(wordCounts: Map[String, Long], numMerges: Int): IndexedSeq[(String, String)] = {
    val words = wordCounts.toIndexedSeq
    var vocab: IndexedSeq[(Array[String], Long)] = words.map { case (w, c) =>
      (splitCodepoints(w), c)
    }
    val out = IndexedSeq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.merge(p, c, (x, y) => x + y)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max count, then lexicographically smallest pair — deterministic
        // regardless of map iteration order
        var best: (String, String) = null
        var bestC = -1L
        pairCounts.forEach { (p, c) =>
          val better = c > bestC || (c == bestC &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))
          if (better) { best = p; bestC = c }
        }
        out += best
        val merged = best._1 + best._2
        vocab = vocab.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val b = IndexedSeq.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length &&
                  syms(i) == best._1 && syms(i + 1) == best._2) {
                b += merged; i += 2 // all non-overlapping, left to right
              } else { b += syms(i); i += 1 }
            }
            (b.result().toArray, c)
          }
        }
        round += 1
      }
    }
    out.result()
  }

  private def splitCodepoints(w: String): Array[String] = {
    val b = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b.result().toArray
  }

  /** Encode one word against a rank table: repeatedly merge the leftmost
    * occurrence of the lowest-rank adjacent pair. Exposed for the trainer
    * parity spec; [[tokenCount]] is the memoized hot path.
    */
  def encode(word: String,
      rk: java.util.HashMap[String, Integer] = ranks): IndexedSeq[String] = {
    var syms = splitCodepoints(word)
    var go = syms.length > 1
    while (go) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rk.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestPos = i }
        i += 1
      }
      if (bestPos < 0) go = false
      else {
        val next = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, next, 0, bestPos)
        next(bestPos) = syms(bestPos) + syms(bestPos + 1)
        System.arraycopy(syms, bestPos + 2, next, bestPos + 1,
          syms.length - bestPos - 2)
        syms = next
        go = syms.length > 1
      }
    }
    syms.toIndexedSeq
  }

  // Per-JVM memo of word → token list: corpus vocabularies are tiny
  // relative to corpus size (that is the point of BPE), so the encode
  // loop runs once per DISTINCT word per executor. Bounded defensively:
  // past the cap we compute without caching rather than grow unbounded.
  private val cacheCap = 1 << 20
  private val encCache =
    new java.util.concurrent.ConcurrentHashMap[String, IndexedSeq[String]]()

  private def encodeCached(word: String): IndexedSeq[String] = {
    val hit = encCache.get(word)
    if (hit != null) return hit
    val toks = encode(word)
    if (encCache.size < cacheCap) encCache.put(word, toks)
    toks
  }

  def tokenCount(word: String): Int = encodeCached(word).length

  /** Merge-token ids start past the Unicode code-point range (0x10FFFF),
    * so a single-codepoint token from ANY script can never collide with a
    * merge id — the scheme stays collision-free on non-ASCII corpora.
    */
  val MergeIdBase: Int = 0x110000

  /** Stable token-id scheme over the bundled table: a single-codepoint
    * token is its codepoint; a multi-char token is [[MergeIdBase]] + the
    * rank of the FIRST merge producing that string (every multi-char
    * symbol IS some merge's output; MIN-rank resolves the rare case of
    * two merges producing the same string). Engine-neutral by
    * construction — the oracle re-derives the same ids from the merge
    * literals.
    */
  private lazy val tokenIdMap: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + b, MergeIdBase + i)
    }
    m
  }

  def tokenId(tok: String): Long =
    if (tok.codePointCount(0, tok.length) == 1) tok.codePointAt(0).toLong
    else {
      val id = tokenIdMap.get(tok)
      if (id == null) throw new IllegalArgumentException(
        s"multi-char token '$tok' is not any merge's output — " +
          "it cannot have come from this table's encode()")
      id.toLong
    }

  /** Total BPE tokens of a text: single-space pre-tokenization (matching
    * `string_split(text, ' ')` / `split(col, " ")` everywhere else in the
    * engine), each word encoded against the bundled table.
    */
  def countTokensText(text: String): Long = {
    var total = 0L
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) total += tokenCount(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** Static entry point for generated code. */
  def countTokensUtf8(s: UTF8String): Long = countTokensText(s.toString)

  /** Position-weighted checksum of the full token-ID SEQUENCE of a text:
    * Σ tokenId · position (1-based, global across the document's words
    * in order). Two sequences that differ in any token or any position
    * differ in the checksum with overwhelming probability — this is the
    * cheap scalar that lets the oracle pin the ORDERED id sequence, not
    * just the count.
    */
  def idChecksumText(text: String): Long = {
    var sum = 0L
    var pos = 0L
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val toks = encodeCached(text.substring(start, i))
          var j = 0
          while (j < toks.length) {
            pos += 1
            sum += tokenId(toks(j)) * pos
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    sum
  }

  /** Static entry point for generated code. */
  def idChecksumUtf8(s: UTF8String): Long = idChecksumText(s.toString)

  def bpeIdChecksum(c: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(BpeIdChecksumExpr(expression(c)))
  }

  def bpeTokenCount(c: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(BpeTokenCountExpr(expression(c)))
  }
}

/** `bpe_token_count(text)` — total merged-token count of a text against
  * the bundled merge table. Stays inside whole-stage codegen: the
  * generated code calls the static (per-JVM memoized) counter, so null
  * propagation and the surrounding operators keep their codegen spans.
  */
case class BpeTokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    Bpe.countTokensUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countTokensUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_token_count"
}

/** `bpe_id_checksum(text)` — position-weighted checksum of the text's
  * BPE token-ID sequence (see [[Bpe.idChecksumText]]); same codegen
  * pattern as [[BpeTokenCountExpr]].
  */
case class BpeIdChecksumExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    Bpe.idChecksumUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.idChecksumUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_id_checksum"
}
