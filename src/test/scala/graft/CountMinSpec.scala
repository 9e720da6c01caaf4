package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Count-Min sketch (d45): the overcount-only guarantee, exact
  * mergeability (cell-wise sum of shard sketches == sketch of the
  * union), and exactness when the width swallows the vocabulary.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def ests(df: org.apache.spark.sql.DataFrame,
      width: Int): Map[String, (Long, Long)] =
    Sketches.countMinEstimates(df, depth = 4, width = width)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("estimates never undercount; wide sketch is exact") {
    val docs = Seq("a a b c", "b c d e f", "a g h").toDF("text")
    // width 512 over 8 terms: collisions essentially impossible per row
    val wide = ests(docs, 512)
    assert(wide("a") == ((3L, 3L)) && wide("b") == ((2L, 2L))
      && wide("g") == ((1L, 1L)))
    // width 2 over 8 terms: collisions guaranteed — still never under
    val tight = ests(docs, 2)
    tight.foreach { case (t, (truth, est)) =>
      assert(est >= truth, s"$t undercounted: $est < $truth")
    }
    assert(tight.exists { case (_, (truth, est)) => est > truth },
      "width=2 over 8 terms must overcount somewhere")
  }

  test("rows are decorrelated: same-length terms don't collide jointly") {
    // 338 distinct 2-char same-length terms into width 256: every row
    // has collisions by pigeonhole. With a prefix-salt-only hash,
    // same-length terms that collided in row 0 collided in EVERY row
    // (the fold is affine in the prefix — measured: 56/338 exact), so
    // the min over rows rescued nothing. With independent rows,
    // P(term exact) = 1 - (1 - (1-1/256)^337)^4 ≈ 0.713 → ~241 of 338
    // expected exact; the avalanche chain measures 248. Assert ≥ 200:
    // far above any correlated regression, tolerant of hash-detail
    // shifts. Deterministic corpus + hash → a pinned outcome.
    val terms = for (a <- 'a' to 'z'; b <- 'a' to 'm') yield s"$a$b"
    val docs = Seq(terms.mkString(" ")).toDF("text")
    val est = ests(docs, 256)
    assert(est.size == terms.size)
    val exact = est.count { case (_, (truth, e)) => e == truth }
    assert(exact >= 200,
      s"only $exact/${terms.size} terms exact — rows look correlated")
  }

  test("cell-wise sum of shard sketches equals the union's sketch") {
    val a = Seq("a a b", "c d").toDF("text")
    val b = Seq("b c c", "e").toDF("text")
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      Sketches.countMinSketch(df, depth = 4, width = 8)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (cells(a).toSeq ++ cells(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(merged == cells(a.unionByName(b)))
  }
}
