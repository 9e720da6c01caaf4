package graft

import graft.operators.GapFill
import org.apache.spark.sql.functions._

/** Gap-fill semantics (q96) on a hand-computed fixture: spine bounds,
  * LOCF nulls before the first observation, no extrapolated
  * interpolation after the last, exact linear values between brackets,
  * and the at-spine-instant tie rule (an observation ON the spine point
  * is its own LOCF value and nobody's "next").
  */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("LOCF + linear interpolation on a hand-computed series") {
    val obs = Seq(
      (1L, ts("2024-01-01 00:30:00"), 10.0),
      (1L, ts("2024-01-01 02:30:00"), 30.0),
      (2L, ts("2024-01-01 01:00:00"), 5.0) // exactly on the spine
    ).toDF("k", "ts", "v")
    val out = GapFill.resampleHourly(obs, "k", "ts", "v")
      .orderBy("k", "hour_ts")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))

    // spine: 00:00, 01:00, 02:00 (global min/max hours), for both keys
    assert(out.map(_._2).distinct.sorted.toSeq == Seq(
      "2024-01-01 00:00:00.0", "2024-01-01 01:00:00.0",
      "2024-01-01 02:00:00.0"))

    val k1 = out.filter(_._1 == 1L)
    // 00:00 precedes k1's first obs: no LOCF, no interp
    assert(k1(0)._3.isEmpty && k1(0)._4.isEmpty)
    // 01:00 is 30 min past (00:30, 10.0) on the way to (02:30, 30.0):
    // locf = 10, interp = 10 + 20 * (30/120) = 15
    assert(k1(1)._3.contains(10.0) && k1(1)._4.contains(15.0))
    // 02:00: locf = 10, interp = 10 + 20 * (90/120) = 25
    assert(k1(2)._3.contains(10.0) && k1(2)._4.contains(25.0))

    val k2 = out.filter(_._1 == 2L)
    // before k2's first obs
    assert(k2(0)._3.isEmpty && k2(0)._4.isEmpty)
    // observation exactly at 01:00: LOCF picks it up; it is not its own
    // "next", and with no later obs there is no interpolation
    assert(k2(1)._3.contains(5.0) && k2(1)._4.isEmpty)
    // 02:00: carried forward, nothing to interpolate toward
    assert(k2(2)._3.contains(5.0) && k2(2)._4.isEmpty)
  }

  test("null-valued observations anchor neither LOCF nor interpolation") {
    val obs = Seq(
      (1L, ts("2024-01-01 00:10:00"), Some(10.0)),
      (1L, ts("2024-01-01 00:50:00"), None), // a sample with no value
      (1L, ts("2024-01-01 02:30:00"), Some(30.0)))
      .toDF("k", "ts", "v").select(col("k"), col("ts"),
        col("v").cast("double").as("v"))
    val out = GapFill.resampleHourly(obs, "k", "ts", "v")
      .orderBy("hour_ts").collect()
    // 01:00 interpolates between the NON-NULL brackets (00:10, 10) and
    // (02:30, 30): 10 + 20 * (50/140); a null row at 00:50 must not
    // shift the anchor
    val expect = 10.0 + 20.0 * (50.0 * 60e6) / (140.0 * 60e6)
    assert(out(1).getDouble(2) == 10.0)
    assert(out(1).getDouble(3) == expect)
  }

  test("tied observations resolve deterministically (max value wins LOCF)") {
    val obs = Seq(
      (1L, ts("2024-01-01 00:30:00"), 10.0),
      (1L, ts("2024-01-01 00:30:00"), 99.0), // same instant, two samples
      (1L, ts("2024-01-01 02:00:00"), 50.0))
      .toDF("k", "ts", "v")
    val out = GapFill.resampleHourly(obs, "k", "ts", "v")
      .orderBy("hour_ts").collect()
    // LOCF at 01:00 = 99.0 (the total order breaks the (t, is_spine)
    // tie on value, ascending — last wins)
    assert(out(1).getDouble(2) == 99.0)
  }

  test("interpolation is exact at observation-bracketing midpoints") {
    val obs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 0.0),
      (1L, ts("2024-01-01 04:00:00"), 8.0)
    ).toDF("k", "ts", "v")
    val out = GapFill.resampleHourly(obs, "k", "ts", "v")
      .orderBy("hour_ts").collect()
    assert(out.length == 5)
    // linear between the brackets: 0, 2, 4, 6; the final spine point
    // coincides with the LAST observation — nothing after it to
    // interpolate toward (no extrapolation), LOCF carries the 8
    assert(out.map(r => Option(r.get(3)).map(_.asInstanceOf[Double])).toSeq
      == Seq(Some(0.0), Some(2.0), Some(4.0), Some(6.0), None))
    assert(out.map(_.getDouble(2)).toSeq == Seq(0.0, 0.0, 0.0, 0.0, 8.0))
  }
}
