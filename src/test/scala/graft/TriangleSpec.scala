package graft

import graft.operators.Dedup

/** Triangle counting (d44) on hand-built graphs: a K4 clique (every
  * node in 3 triangles, coefficient 1), a star (hub in none,
  * coefficient 0), a triangle with a pendant (coefficient 1/3 at the
  * attachment node, null at the degree-1 pendant), and invariance to
  * the pair list's orientation/duplication.
  */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long, Option[Double])] =
    Dedup.triangleCounts(pairs.toDF("id_a", "id_b"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap

  test("K4: four triangles, every node in three, coefficient 1") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val out = run(k4)
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    out.values.foreach { case (deg, tri, c) =>
      assert(deg == 3 && tri == 3 && c.contains(1.0))
    }
    // global count: Σ n_tri / 3 = 4
    assert(out.values.map(_._2).sum / 3 == 4)
  }

  test("star: no triangles, hub coefficient 0, leaves null") {
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L))
    val out = run(star)
    assert(out(10L) == ((3L, 0L, Some(0.0))))
    Seq(11L, 12L, 13L).foreach { leaf =>
      assert(out(leaf)._1 == 1L && out(leaf)._2 == 0L && out(leaf)._3.isEmpty)
    }
  }

  test("triangle with pendant: 1/3 at the attachment, null at the pendant") {
    val g = Seq((20L, 21L), (20L, 22L), (21L, 22L), (20L, 23L))
    val out = run(g)
    assert(out(20L) == ((3L, 1L, Some(1.0 / 3.0))))
    assert(out(21L) == ((2L, 1L, Some(1.0))))
    assert(out(22L) == ((2L, 1L, Some(1.0))))
    assert(out(23L) == ((1L, 0L, None)))
  }

  test("orientation/duplication of the input pair list is irrelevant") {
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val messy = g ++ g // duplicated pairs must not double-count
    assert(run(g) == run(messy))
    // REVERSED pairs must land on the same canonical edges: a reversed
    // closure edge used to make the triangle invisible, and a pair
    // present in both orientations used to double every degree
    val reversed = Seq((1L, 2L), (1L, 3L), (3L, 2L))
    assert(run(reversed) == run(g))
    val bothWays = g ++ g.map { case (a, b) => (b, a) }
    assert(run(bothWays) == run(g))
  }

  test("skewed hub: wedge work is bounded by orientation, result exact") {
    // hub 0 linked to 200 leaves (disjoint from a 1-2-3 triangle):
    // naive wedge-at-every-node would build 200*199/2 hub wedges; the
    // degree orientation builds none at the hub (all its edges point IN)
    val hub = (10L to 209L).map(l => (0L, l))
    val out = run(hub ++ Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out(0L)._1 == 200L && out(0L)._2 == 0L && out(0L)._3.contains(0.0))
    assert(out(1L) == ((2L, 1L, Some(1.0))))
    assert(out(2L)._2 == 1L && out(3L)._2 == 1L)
    assert(out(10L) == ((1L, 0L, None)))
  }
}
