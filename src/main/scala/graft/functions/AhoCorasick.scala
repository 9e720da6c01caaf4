package graft.functions

/** Aho-Corasick multi-pattern matcher specialized for the classifier's
  * name-fallback haystacks (lowercase alphanumerics + space — the alpha
  * normal forms of CardModels). Finds the best-priority matching pattern in
  * O(|text|) independent of pattern count, replacing the naive
  * names × variants containment scan (reference
  * classified_card_transactions.sql:150-184 does the same work as a lateral
  * over ~630 merchant names).
  *
  * Priority = the pattern's index in the input array (lower wins) — callers
  * pre-sort patterns by their ranking (longest-name-first for the
  * reference's ORDER BY name_len DESC). Built once on the driver, shipped
  * inside the UDF closure, shared per executor.
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {

  private val AlphabetSize = 37 // a-z, 0-9, space

  private def code(ch: Char): Int =
    if (ch >= 'a' && ch <= 'z') ch - 'a'
    else if (ch >= '0' && ch <= '9') 26 + (ch - '0')
    else if (ch == ' ') 36
    else -1

  // trie as growable arrays of alphabet-indexed nodes
  private var cap = math.max(16, patterns.map(_.length).sum + 1)
  private var next = Array.fill(cap * AlphabetSize)(-1)
  private var fail = new Array[Int](cap)
  private var best = Array.fill(cap)(Int.MaxValue) // min pattern idx ending here
  private var nNodes = 1

  private def grow(): Unit = {
    val ncap = cap * 2
    next = java.util.Arrays.copyOf(next, ncap * AlphabetSize)
    java.util.Arrays.fill(next, cap * AlphabetSize, ncap * AlphabetSize, -1)
    fail = java.util.Arrays.copyOf(fail, ncap)
    val nb = Array.fill(ncap)(Int.MaxValue)
    System.arraycopy(best, 0, nb, 0, cap)
    best = nb
    cap = ncap
  }

  // insert patterns (skipping chars outside the alphabet would change
  // semantics — reject instead; callers normalize first)
  patterns.zipWithIndex.foreach { case (p, idx) =>
    var node = 0
    var i = 0
    while (i < p.length) {
      val c = code(p.charAt(i))
      require(c >= 0, s"pattern '$p' contains char outside [a-z0-9 ]")
      if (next(node * AlphabetSize + c) == -1) {
        if (nNodes == cap) grow()
        next(node * AlphabetSize + c) = nNodes
        nNodes += 1
      }
      node = next(node * AlphabetSize + c)
      i += 1
    }
    if (p.nonEmpty) best(node) = math.min(best(node), idx)
  }

  // BFS failure links; turn `next` into a complete goto function and fold
  // the fail chain's best into each node (so matching never walks chains)
  locally {
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
}
