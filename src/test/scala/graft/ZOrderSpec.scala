package graft

import graft.functions.ZOrder
import graft.sources.TableWriter
import org.apache.spark.sql.functions._

/** Layout claims of z-order clustering that the q70 oracle (content +
  * z-arithmetic fidelity) cannot see: the bit interleave itself against
  * hand-computed values, per-file z-range disjointness under
  * materializeClustered, and the actual pruning payoff — a rectangle
  * predicate on the ORIGINAL dimensions touches a small fraction of
  * files because every file's min/max is narrow on both.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue16: hand-checked interleaves") {
    val got = Seq((3, 5), (0, 1), (1, 0), (65535, 0), (0, 65535), (65535, 65535))
      .toDF("a", "b")
      .select(ZOrder.zValue16(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // spread(3)=0b101=5, spread(5)=0b10001=17 -> 5 | (17<<1) = 39
    assert(got == Seq(39L, 2L, 1L, 0x55555555L, 0xAAAAAAAAL, 0xFFFFFFFFL))
  }

  test("materializeClustered: disjoint z files, narrow on BOTH dims, rectangle prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val w = new TableWriter(dir)
    // the full 64x64 grid, one point per cell
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).cast("int").as("a"),
        (col("id") / 64).cast("int").as("b"))
    w.materializeClustered(grid, "zt",
      ZOrder.zValue16(col("a"), col("b")), "z", numFiles = 16)

    val files = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(w.path("zt")))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.toString)
          .filter(_.endsWith(".parquet")).toSeq.sorted
      } finally s.close()
    }
    assert(files.size >= 12 && files.size <= 16)
    val stats = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("z"), max("z"), min("a"), max("a"), min("b"), max("b"))
        .head()
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
    }.sortBy(_._1)
    // range partitioning by z: files cover disjoint, ordered z ranges
    stats.sliding(2).foreach { case Seq(p, n) => assert(n._1 > p._2); case _ => }
    // z-locality: every file is a small rectangle on BOTH dims — a file of
    // ~256 consecutive z values spans at most two 16x16 tiles
    stats.foreach { case (_, _, a0, a1, b0, b1) =>
      assert(a1 - a0 <= 32 && b1 - b0 <= 32,
        s"file spans a:[$a0,$a1] b:[$b0,$b1] — no z locality")
    }
    // the payoff: a 16x16 rectangle predicate has matching rows in only a
    // few files (perfect tiling would be 1; range-boundary straddle allows
    // a couple) — with a plain unsorted layout it would touch ~all 16
    val touching = files.count { f =>
      spark.read.parquet(f)
        .filter(col("a") < 16 && col("b") < 16).limit(1).count() > 0
    }
    assert(touching <= 4, s"rectangle touched $touching of ${files.size} files")
  }
}
