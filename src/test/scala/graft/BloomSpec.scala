package graft

import graft.functions.Bloom
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key passes the probe") {
    val keys = (0 until 5000).map(i => i.toLong * 31 + 7).toDF("k")
    val numBits = Bloom.optimalNumBits(5000, 0.01)
    val numHashes = Bloom.optimalNumHashes(numBits, 5000)
    val bc = Bloom.buildBroadcast(spark, keys, col("k"), numBits, numHashes)
    val misses = keys
      .filter(!Bloom.mightContain(bc, col("k"), numHashes)).count()
    assert(misses == 0L, s"$misses inserted keys rejected — bloom is broken")
  }

  test("false-positive rate stays within 3x of the design point") {
    val n = 5000
    val keys = (0 until n).map(i => i.toLong * 31 + 7).toDF("k")
    val numBits = Bloom.optimalNumBits(n, 0.01)
    val numHashes = Bloom.optimalNumHashes(numBits, n)
    val bc = Bloom.buildBroadcast(spark, keys, col("k"), numBits, numHashes)
    // disjoint probe set: i*31+7 is ≡7 (mod 31); probe keys ≡8
    val probes = (0 until 20000).map(i => i.toLong * 31 + 8).toDF("k")
    val fp = probes.filter(Bloom.mightContain(bc, col("k"), numHashes)).count()
    val rate = fp.toDouble / 20000
    assert(rate <= 0.03, f"observed FPR $rate%.4f exceeds 3x the 1%% design point")
  }

  test("codegen probe agrees with a driver-side recomputation") {
    val n = 2000
    val inserted = (0 until n).map(_.toLong * 97 + 13)
    val keys = inserted.toDF("k")
    val numBits = Bloom.optimalNumBits(n, 0.01)
    val numHashes = Bloom.optimalNumHashes(numBits, n)
    val bits = Bloom.build(keys, col("k"), numBits, numHashes)
    val bc = spark.sparkContext.broadcast(bits)
    // mixed probe set: half members, half not
    val probeKeys = inserted.take(n / 2) ++ (0 until n / 2).map(_.toLong * 97 + 14)
    val viaExpr = probeKeys.toDF("k")
      .withColumn("hit", Bloom.mightContain(bc, col("k"), numHashes))
      .as[(Long, Boolean)].collect().toMap
    probeKeys.foreach { k =>
      val expect = (0 until numHashes).forall { i =>
        val p = Bloom.position(k, i, numBits)
        (bits(p >>> 6) & (1L << (p & 63))) != 0L
      }
      assert(viaExpr(k) == expect, s"codegen/driver disagree on key $k")
    }
  }

  test("q81 shape: bloom pre-filter is result-invisible and actually filters") {
    val dir = "/root/testdata/sf0.001"
    val dim = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderstatus") === "F" &&
        col("o_totalprice").cast("decimal(18,2)") > lit(150000))
      .select(col("o_orderkey"))
    val nKeys = math.max(1L, dim.count())
    val numBits = Bloom.optimalNumBits(nKeys, 0.01)
    val numHashes = Bloom.optimalNumHashes(numBits, nKeys)
    val bc = Bloom.buildBroadcast(spark, dim, col("o_orderkey"), numBits, numHashes)

    val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val total = fact.count()
    val kept = fact.filter(Bloom.mightContain(bc, col("l_orderkey"), numHashes))
    val keptN = kept.count()
    assert(keptN < total, "bloom filtered nothing on a selective dim")

    val plain = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      .agg(count(lit(1)), sum("l_quantity")).collect()(0)
    val pre = kept.join(dim, kept("l_orderkey") === dim("o_orderkey"))
      .agg(count(lit(1)), sum("l_quantity")).collect()(0)
    assert(plain == pre, s"bloom changed the join answer: $plain vs $pre")

    // every actually-matching fact row must survive the pre-filter
    val lost = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      .filter(!Bloom.mightContain(bc, col("l_orderkey"), numHashes)).count()
    assert(lost == 0L, s"$lost matching rows rejected by the pre-filter")
  }

  test("probe filter sits under the join in the physical plan") {
    val dir = "/root/testdata/sf0.001"
    val dim = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val bc = Bloom.buildBroadcast(spark, dim, col("o_orderkey"), 1 << 16, 4)
    val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"))
    val joined = fact
      .filter(Bloom.mightContain(bc, col("l_orderkey"), 4))
      .join(dim, fact("l_orderkey") === dim("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_might_contain"),
      s"bloom probe missing from the plan:\n$plan")
  }
}
