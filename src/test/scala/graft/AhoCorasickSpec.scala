package graft

import graft.functions.AhoCorasick
import graft.models.CardModels
import org.scalatest.funsuite.AnyFunSuite

class AhoCorasickSpec extends AnyFunSuite {

  test("bestMatch returns the minimum pattern index over all occurrences") {
    val ac = new AhoCorasick(Array("blue bottle", "bottle", "ottl", "zzz"))
    assert(ac.bestMatch("the blue bottle cafe") == 0)
    assert(ac.bestMatch("a bottle of water") == 1)   // 'bottle' also hits 'ottl'
    assert(ac.bestMatch("throttle body") == 2)
    assert(ac.bestMatch("nothing here") == -1)
    assert(ac.bestMatch(null) == -1)
    assert(ac.bestMatch("") == -1)
  }

  test("overlapping and suffix patterns all fire (failure links)") {
    val ac = new AhoCorasick(Array("abcd", "bcd", "cd", "d"))
    assert(ac.bestMatch("xxabcd") == 0)
    assert(ac.bestMatch("xxbcd") == 1)
    assert(ac.bestMatch("xxcd") == 2)
    assert(ac.bestMatch("d") == 3)
  }

  test("out-of-alphabet text chars break matches like the naive contains") {
    val ac = new AhoCorasick(Array("ab cd"))
    assert(ac.bestMatch("ab cd") == 0)
    assert(ac.bestMatch("ab_cd") == -1)
  }

  test("requiredLiterals extracts safe literals and rejects unsafe shapes") {
    import graft.operators.RegexBank.requiredLiterals
    assert(requiredLiterals("^NATERA\\y") == Some(Seq("NATERA")))
    assert(requiredLiterals("\\bWAYFAIR\\b") == Some(Seq("WAYFAIR")))
    assert(requiredLiterals("^SQ \\*") == Some(Seq("SQ *")))
    assert(requiredLiterals("\\b(GRILL|CAFE|DINER)\\b") ==
      Some(Seq("GRILL", "CAFE", "DINER")))
    assert(requiredLiterals("\\bGREEN FARMSTAND$") == Some(Seq("GREEN FARMSTAND")))
    assert(requiredLiterals("WHOLE ?FOODS|WHOLEFDS").isEmpty) // '?' branch
    assert(requiredLiterals("AB\\d+").isEmpty)                // \d class
    assert(requiredLiterals("(A|B)(C|D)").isEmpty)            // two groups
  }

  test("prefiltered bank equals the brute-force rule walk on random rows") {
    import graft.operators.RegexBank
    val rnd = new scala.util.Random(11)
    val words = (0 until 60).map(i => s"word${('a' + i % 26).toChar}$i")
    val rules = words.zipWithIndex.map { case (w, i) =>
      val pat = i % 5 match {
        case 0 => s"^${w.toUpperCase}\\b"
        case 1 => s"\\b${w.toUpperCase}\\b"
        case 2 => s"(${w.toUpperCase}|ALT${i})"
        case 3 => s"${w.toUpperCase}S?" // '?': no safe literal → always checked
        case _ => w.toUpperCase
      }
      RegexBank.Rule(s"k$i", pat, rnd.nextInt(100))
    }
    val bank = new RegexBank.CompiledBank(rules, caseInsensitive = true)
    // naive reference: walk every rule in the same order
    val sortedRules = rules.sortBy(r => (-r.priority, -r.pattern.length, r.key))
    val compiled = sortedRules.map(r => (java.util.regex.Pattern.compile(
      graft.dialect.PgDialect.translateRegex(r.pattern),
      java.util.regex.Pattern.CASE_INSENSITIVE), r.key))
    def naiveAny(vs: Seq[String]): String =
      compiled.collectFirst {
        case (p, k) if vs.exists(s => s != null && p.matcher(s).find()) => k
      }.orNull
    (0 until 3000).foreach { _ =>
      val text = Seq.fill(3 + rnd.nextInt(5))(
        if (rnd.nextBoolean()) words(rnd.nextInt(words.length)) else s"x${rnd.nextInt(99)}")
        .mkString(" ").toUpperCase
      val variants = Seq(text, text.replace(" ", "-"), null)
      assert(bank.bestKeyAny(variants) == naiveAny(variants), s"text=$text")
      assert(bank.bestKey(text) == naiveAny(Seq(text)), s"single text=$text")
    }
  }

  test("fallback matcher agrees with the naive reference on generated rows") {
    val rnd = new scala.util.Random(7)
    val names = (0 until 400).map { i =>
      val words = Seq.fill(1 + rnd.nextInt(3))(
        ('a' + rnd.nextInt(26)).toChar.toString * (2 + rnd.nextInt(5)))
      (s"m$i", words.mkString(" ") + (if (i % 7 == 0) " (Tag)" else ""))
    } ++ Seq(("stop1", "Grill"), ("short", "ab"))
    val prepared = CardModels.prepareFallback(names, CardModels.nameStopList)

    // haystacks: random texts, half of them embedding a random name form
    val texts = (0 until 2000).map { i =>
      val base = Seq.fill(4)(('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(6))).mkString(" ")
      if (i % 2 == 0 && names.nonEmpty) {
        val (_, n) = names(rnd.nextInt(names.length))
        base + " " + n.toLowerCase.replaceAll("[^a-z0-9]+", " ") + " tail"
      } else base
    }
    // rebuild the AC path exactly as nameFallbackMatch does
    val keys = prepared.map(_._1)
    val (sp, se) = prepared.zipWithIndex.flatMap { case ((_, s, _), r) => s.map((_, r)) }.unzip
    val (np, ne) = prepared.zipWithIndex.flatMap { case ((_, _, n), r) => n.map((_, r)) }.unzip
    val ac1 = new AhoCorasick(sp.toArray)
    val ac2 = new AhoCorasick(np.toArray)
    def acPath(a: String, b: String): Option[String] = {
      val m1 = ac1.bestMatch(a); val r1 = if (m1 < 0) Int.MaxValue else se(m1)
      val m2 = ac2.bestMatch(b); val r2 = if (m2 < 0) Int.MaxValue else ne(m2)
      val r = math.min(r1, r2)
      if (r == Int.MaxValue) None else Some(keys(r))
    }
    var agreeMatches = 0
    texts.foreach { t =>
      val ns = t.replaceAll("\\s+", "")
      val naive = CardModels.fallbackNaive(prepared)(t, ns)
      val fast = acPath(t, ns)
      assert(fast == naive, s"text='$t' naive=$naive ac=$fast")
      if (naive.isDefined) agreeMatches += 1
    }
    assert(agreeMatches > 100) // the comparison actually exercised matches

    // microbench note (not an assertion — JIT noise): O(text) vs O(names*text)
    val t0 = System.nanoTime()
    texts.foreach(t => acPath(t, t.replaceAll("\\s+", "")))
    val tAc = System.nanoTime() - t0
    val t1 = System.nanoTime()
    texts.foreach(t => CardModels.fallbackNaive(prepared)(t, t.replaceAll("\\s+", "")))
    val tNaive = System.nanoTime() - t1
    info(f"aho-corasick ${tAc / 1e6}%.1f ms vs naive ${tNaive / 1e6}%.1f ms over ${texts.size} rows × ${names.size} names")
  }
}
