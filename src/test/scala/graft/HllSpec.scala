package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** HyperLogLog registers (d46): the mergeable-cardinality contract.
  * Pins: register-wise max merges shards EXACTLY into the union sketch
  * (the 100 TB shape — per-shard sketches, bytes each, one tiny merge);
  * the trailing-zero rho equals an independent bit-twiddling
  * recomputation of the same hash; the full register spine is always
  * served; duplicates never move a register; and the raw estimate lands
  * within the published error regime on a known-cardinality fixture.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def values(n: Int, offset: Long = 0L) =
    (1 to n).map(i => i.toLong * 7919L + offset).toDF("v")

  test("shard-merge equals union sketch register for register") {
    val all = values(20000)
    val union = Sketches.hllRegisters(all, col("v"), 8)
    val shardMerged = (0 until 4)
      .map(s => Sketches.hllRegisters(
        all.filter(pmod(col("v"), lit(4)) === s), col("v"), 8))
      .reduce(_ unionByName _)
      .groupBy("register").agg(max(col("rho")).as("rho"))
    val u = union.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val m = shardMerged.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(u === m)
    // the packaged API (d48's union path) is the same fold
    val api = Sketches.hllMerge((0 until 4).map(s =>
      Sketches.hllRegisters(
        all.filter(pmod(col("v"), lit(4)) === s), col("v"), 8)))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(api === u)
  }

  test("rho matches an independent Long.numberOfTrailingZeros recomputation") {
    val vs = values(5000)
    val engine = Sketches.hllRegisters(vs, col("v"), 8)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    // independent replay: the same numHash chain evaluated through the
    // engine, but rho/register derived with JVM bit ops instead of the
    // CASE chain
    val hashes = vs.select(Sketches.numHash(col("v")).as("h"))
      .collect().map(_.getLong(0))
    val expected = scala.collection.mutable.Map.empty[Int, Int]
      .withDefaultValue(0)
    hashes.foreach { h =>
      val reg = (h % 256).toInt
      val w = h / 256
      val rho = if (w == 0L) Sketches.hllRhoCap
        else java.lang.Long.numberOfTrailingZeros(w) + 1
      expected(reg) = math.max(expected(reg), rho)
    }
    (0 until 256).foreach { r =>
      assert(engine(r) === expected(r), s"register $r")
    }
  }

  test("full spine: 256 registers always served; duplicates are free") {
    val once = Sketches.hllRegisters(values(100), col("v"), 8)
    assert(once.count() === 256)
    val dup = values(100).unionAll(values(100)).unionAll(values(100))
    val dupRegs = Sketches.hllRegisters(dup, col("v"), 8)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val onceRegs = once.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(dupRegs === onceRegs, "duplicate values must not move registers")
  }

  test("raw estimate is inside the error regime at known cardinality") {
    // n >> 2.5m, so the raw (non-linear-counting) regime applies;
    // sigma ~ 1.04/sqrt(256) = 6.5% — assert a 4-sigma band
    val n = 50000
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(values(n), col("v"), 8), 8)
      .head().getDouble(0)
    assert(math.abs(est / n - 1.0) < 0.26, s"estimate $est vs true $n")
  }

  test("small p: rho saturates at the cap (never NULL→0) and the spine holds") {
    // p=4 leaves w up to 46 usable bits — more trailing zeros than the
    // CASE's 42 branches. The saturating otherwise (r11 advisor) means
    // the engine value is min(ntz+1, cap), never a fallen-through NULL
    // coalesced to 0; replay pins exactly that.
    val vs = values(3000)
    val engine = Sketches.hllRegisters(vs, col("v"), 4)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(engine.size === 16)
    val hashes = vs.select(Sketches.numHash(col("v")).as("h"))
      .collect().map(_.getLong(0))
    val expected = scala.collection.mutable.Map.empty[Int, Int]
      .withDefaultValue(0)
    hashes.foreach { h =>
      val reg = (h % 16).toInt
      val w = h / 16
      val rho = if (w == 0L) Sketches.hllRhoCap
        else math.min(java.lang.Long.numberOfTrailingZeros(w) + 1,
          Sketches.hllRhoCap)
      expected(reg) = math.max(expected(reg), rho)
    }
    (0 until 16).foreach { r => assert(engine(r) === expected(r), s"register $r") }
  }

  test("alpha follows the classical small-m table, not the asymptotic formula") {
    // all 16 registers at rho=1: denom = 16·2^42, est = alpha_16·16²·2^43
    // / (16·2^42) = alpha_16·32 — Flajolet's alpha_16 = 0.673, where the
    // asymptotic formula would give 0.7213/(1+1.079/16) ≈ 0.6757
    val regs = (0 until 16).map(i => (i, 1)).toDF("register", "rho")
    val est4 = Sketches.hllEstimate(regs, 4).head().getDouble(0)
    assert(math.abs(est4 - 0.673 * 32.0) < 1e-9, s"alpha_16 estimate: $est4")
    val regs32 = (0 until 32).map(i => (i, 1)).toDF("register", "rho")
    assert(math.abs(Sketches.hllEstimate(regs32, 5).head().getDouble(0)
      - 0.697 * 64.0) < 1e-9)
    val regs64 = (0 until 64).map(i => (i, 1)).toDF("register", "rho")
    assert(math.abs(Sketches.hllEstimate(regs64, 6).head().getDouble(0)
      - 0.709 * 128.0) < 1e-9)
  }

  test("estimate arithmetic: denominator exact, empty sketch sane") {
    // empty input: every register 0, denom = 256 * 2^43, est = alpha*m^2
    val empty = Seq.empty[Long].toDF("v")
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(empty, col("v"), 8), 8).head().getDouble(0)
    val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    assert(math.abs(est - alpha * 256.0) < 1e-9)
  }
}
