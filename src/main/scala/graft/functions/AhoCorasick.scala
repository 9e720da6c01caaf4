package graft.functions

/** Aho-Corasick multi-pattern matcher over the ASCII alphabet (chars ≥ 128
  * never match/transition — callers' normal forms and rule literals are
  * ASCII). Two query modes:
  *  - [[bestMatch]]: minimum pattern index occurring anywhere in the text
  *    (callers pre-sort patterns by priority) — used by the classifier
  *    name fallback (reference classified_card_transactions.sql:150-184
  *    runs the same work as a lateral over ~630 merchant names);
  *  - [[collectInto]]: set a bit for EVERY pattern occurring in the text —
  *    used as the required-literal prefilter in front of the regex bank
  *    (795 rules in reference seeds/merchant_regex.csv: only rules whose
  *    required literal appears run their regex).
  * Both are O(|text| + matches) independent of pattern count. Built once
  * on the driver, shipped inside UDF closures, shared per executor.
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {

  private val AlphabetSize = 128

  private def code(ch: Char): Int = if (ch < 128) ch else -1

  // trie as growable arrays of alphabet-indexed nodes
  private var cap = math.max(16, patterns.map(_.length).sum + 1)
  private var next = Array.fill(cap * AlphabetSize)(-1)
  private var fail = new Array[Int](cap)
  private var best = Array.fill(cap)(Int.MaxValue) // min pattern idx ending here
  private var ownEnd = Array.fill(cap)(List.empty[Int]) // patterns ending here
  private var nNodes = 1

  private def grow(): Unit = {
    val ncap = cap * 2
    next = java.util.Arrays.copyOf(next, ncap * AlphabetSize)
    java.util.Arrays.fill(next, cap * AlphabetSize, ncap * AlphabetSize, -1)
    fail = java.util.Arrays.copyOf(fail, ncap)
    val nb = Array.fill(ncap)(Int.MaxValue)
    System.arraycopy(best, 0, nb, 0, cap)
    best = nb
    val no = Array.fill(ncap)(List.empty[Int])
    System.arraycopy(ownEnd, 0, no, 0, cap)
    ownEnd = no
    cap = ncap
  }

  patterns.zipWithIndex.foreach { case (p, idx) =>
    var node = 0
    var i = 0
    while (i < p.length) {
      val c = code(p.charAt(i))
      require(c >= 0, s"pattern '$p' contains a non-ASCII char")
      if (next(node * AlphabetSize + c) == -1) {
        if (nNodes == cap) grow()
        next(node * AlphabetSize + c) = nNodes
        nNodes += 1
      }
      node = next(node * AlphabetSize + c)
      i += 1
    }
    if (p.nonEmpty) {
      best(node) = math.min(best(node), idx)
      ownEnd(node) = idx :: ownEnd(node)
    }
  }

  // full output set per node = own patterns plus the fail chain's — folded
  // during the BFS so matching never walks chains
  private val outs: Array[Array[Int]] = new Array[Array[Int]](cap)

  // BFS failure links; turn `next` into a complete goto function
  locally {
    outs(0) = ownEnd(0).toArray
    val queue = new java.util.ArrayDeque[Int]()
    var c = 0
    while (c < AlphabetSize) {
      val v = next(c)
      if (v == -1) next(c) = 0
      else { fail(v) = 0; queue.add(v) }
      c += 1
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      best(u) = math.min(best(u), best(fail(u)))
      outs(u) =
        if (ownEnd(u).isEmpty) outs(fail(u))
        else (ownEnd(u) ++ outs(fail(u))).toArray
      var c = 0
      while (c < AlphabetSize) {
        val v = next(u * AlphabetSize + c)
        if (v == -1) next(u * AlphabetSize + c) = next(fail(u) * AlphabetSize + c)
        else { fail(v) = next(fail(u) * AlphabetSize + c); queue.add(v) }
        c += 1
      }
    }
  }

  /** Minimum pattern index occurring anywhere in `text`, or -1. */
  def bestMatch(text: String): Int = {
    if (text == null) return -1
    var node = 0
    var found = Int.MaxValue
    var i = 0
    while (i < text.length) {
      val c = code(text.charAt(i))
      node = if (c < 0) 0 else next(node * AlphabetSize + c)
      if (best(node) < found) found = best(node)
      i += 1
    }
    if (found == Int.MaxValue) -1 else found
  }

  /** Set `into(idx)` for every pattern idx occurring anywhere in `text`. */
  def collectInto(text: String, into: java.util.BitSet): Unit = {
    if (text == null) return
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = code(text.charAt(i))
      node = if (c < 0) 0 else next(node * AlphabetSize + c)
      val o = outs(node)
      var j = 0
      while (j < o.length) { into.set(o(j)); j += 1 }
      i += 1
    }
  }
}
