package graft.models

/** Example-string generation for the reference's POSIX regex rules
  * (seeds/merchant_regex.csv): for each pattern, synthesize one string the
  * pattern matches, so the probe fixture exercises every rule's CONTENT —
  * not just the bank machinery. The generator is a heuristic recursive
  * descent over the constructs the 794 seed patterns actually use
  * (literals, escapes, classes, groups, alternation, quantifiers,
  * anchors, inline flags, lookahead); every candidate is VALIDATED against
  * the translated java.util.regex pattern before use, so a generation miss
  * costs coverage, never correctness.
  */
object RegexProbe {

  /** A validated example string matching `pgPattern` case-insensitively
    * under the engine's PG→Java translation, or None if generation failed.
    */
  def example(pgPattern: String): Option[String] = {
    def matches(s: String): Boolean =
      try {
        java.util.regex.Pattern
          .compile(graft.dialect.PgDialect.translateRegex(pgPattern),
            java.util.regex.Pattern.CASE_INSENSITIVE)
          .matcher(s).find()
      } catch { case _: Exception => false }
    // two candidates: boundaries elided, then boundaries as spaces — a
    // mid-pattern \y between word chars needs the space form
    Seq(false, true).iterator
      .flatMap { sp =>
        try Some(generate(pgPattern, sp)) catch { case _: Exception => None }
      }
      .find(matches)
  }

  // --------------------------------------------------------- generator

  private def generate(pat: String, boundaryAsSpace: Boolean): String = {
    val p = new P(pat.replace("(?i)", ""), boundaryAsSpace)
    val out = p.alternation()
    require(p.atEnd, s"trailing input at ${p.pos}")
    out
  }

  /** Tiny cursor-based parser. Alternation picks its FIRST branch;
    * `?`/`*` take zero copies, `+` one, `{m,n}` m copies; lookahead groups
    * contribute nothing; classes pick their first concrete member.
    */
  private final class P(s: String, boundaryAsSpace: Boolean) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    private def peek: Char = s.charAt(pos)

    def alternation(): String = {
      val first = sequence()
      // consume (and discard) remaining branches
      while (!atEnd && peek == '|') { pos += 1; sequence() }
      first
    }

    private def sequence(): String = {
      val sb = new StringBuilder
      while (!atEnd && peek != '|' && peek != ')') {
        val piece = element()
        val reps = quantifier() match {
          case Some((min, _)) => min
          case None => 1
        }
        sb.append(piece * reps)
      }
      sb.toString
    }

    /** Sample text for one element (empty for anchors/lookaround). */
    private def element(): String = peek match {
      case '^' | '$' => pos += 1; ""
      case '.' => pos += 1; "X"
      case '(' => group()
      case '[' => charClass()
      case '\\' => escape()
      case c => pos += 1; c.toString
    }

    private def quantifier(): Option[(Int, Int)] = {
      if (atEnd) return None
      peek match {
        case '?' => pos += 1; Some((0, 1))
        case '*' => pos += 1; Some((0, 0))
        case '+' => pos += 1; Some((1, 1))
        case '{' =>
          val close = s.indexOf('}', pos)
          require(close > pos, "unclosed {")
          val body = s.substring(pos + 1, close)
          pos = close + 1
          val parts = body.split(",", -1)
          val m = parts(0).trim.toInt
          Some((m, m))
        case _ => None
      }
    }

    private def group(): String = {
      pos += 1 // '('
      var lookaround = false
      if (!atEnd && peek == '?') {
        pos += 1
        peek match {
          case ':' => pos += 1
          case '=' | '!' => pos += 1; lookaround = true
          case other => throw new IllegalArgumentException(s"(?$other unsupported")
        }
      }
      val inner = alternation()
      require(!atEnd && peek == ')', "unclosed group")
      pos += 1
      // lookaround asserts context without consuming — emit nothing; the
      // validation step rejects the sample if the assertion then fails
      if (lookaround) "" else inner
    }

    private def charClass(): String = {
      pos += 1 // '['
      val negated = !atEnd && peek == '^'
      if (negated) pos += 1
      val members = scala.collection.mutable.ArrayBuffer.empty[Char]
      var first = true
      while (!atEnd && (peek != ']' || first)) {
        if (peek == '\\') {
          pos += 1
          members += (peek match {
            case 's' => ' '
            case 'd' => '7'
            case 'w' => 'a'
            case c => c
          })
          pos += 1
        } else if (peek == '-' && !first && pos + 1 < s.length &&
            s.charAt(pos + 1) != ']') {
          pos += 1 // range: low already recorded; skip high
          members += s.charAt(pos)
          pos += 1
        } else {
          members += peek
          pos += 1
        }
        first = false
      }
      require(!atEnd, "unclosed class")
      pos += 1 // ']'
      if (!negated) members.head.toString
      else {
        // pick a printable char outside the set (validation re-checks)
        "Q7 zJ.&".find(c => !members.contains(c) &&
          !members.contains(Character.toLowerCase(c)))
          .getOrElse('~').toString
      }
    }

    private def escape(): String = {
      pos += 1 // '\'
      require(!atEnd, "dangling backslash")
      val c = peek
      pos += 1
      c match {
        case 's' => " "
        case 'S' => "A"
        case 'd' => "7"
        case 'D' => "A"
        case 'w' => "a"
        case 'W' => " "
        case 'y' | 'b' | 'm' | 'M' =>
          if (boundaryAsSpace) " " else ""
        case 'A' | 'Z' => ""
        case other => other.toString
      }
    }
  }
}
