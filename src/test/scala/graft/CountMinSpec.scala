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
