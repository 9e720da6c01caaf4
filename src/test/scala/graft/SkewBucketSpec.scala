package graft

import graft.operators.Skew
import graft.sources.TableWriter
import org.apache.spark.sql.functions._

class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the unsalted join and spreads hot keys") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "cold" + i else "hot", i))
      .toDF("k", "v")
    val small = Seq(("hot", "H"), ("cold10", "C")).toDF("k", "label")

    val plain = big.join(small, Seq("k")).select("k", "v", "label")
    val salted = Skew.saltedJoin(big, small, "k", numSalts = 8,
      saltSource = col("v")).select("k", "v", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting spreads a hot key across partitions") {
    val big = (1 to 10000).map(i => ("hot", i)).toDF("k", "v")
    val small = Seq(("hot", "H")).toDF("k", "label")
    val salted = graft.operators.Skew.saltedJoin(big, small, "k",
      numSalts = 8, saltSource = col("v"))
    // the join output of a single hot key must occupy many partitions
    val parts = salted
      .select(spark_partition_id().as("p")).distinct().count()
    assert(parts >= 4, s"hot key landed on only $parts partitions")
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true in final plan)") {
    // Skew.scala's doc claims AQE handles SMJ skew automatically and
    // salting is the explicit fallback — this pins the first half of that
    // claim in THIS engine's session. One key carries ~90% of a padded
    // big side; broadcast is disabled so the join is sort-merge; skew
    // thresholds are lowered to test scale. The final adaptive plan must
    // carry the skew=true marker AND the answer must equal the plain join.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = spark.range(100000).select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        lpad(col("id").cast("string"), 64, "x").as("pad"))
      val small = spark.range(100000).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      // keep pad in the output so column pruning can't shrink the shuffle
      // below the skew thresholds
      val joined = big.join(small, Seq("k")).select(col("k"), col("pad"), col("v"))
      // collect() executes THIS dataset's QueryExecution (count() would
      // build a separate one and leave this plan isFinalPlan=false)
      val n = joined.collect().length.toLong
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join:\n$plan")
      // 90k rows share k=7 matching one small row; 10k distinct ids match 1:1
      assert(n == 100000L, s"skew-split join changed the answer: $n")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q67: post-salt group sizes are bounded near hot/numSalts") {
    // q67's big-side key derivation at sf0.001: ~70% of orders collapse
    // onto skew_key 0; after salting, no (key, salt) group may hold more
    // than a small multiple of hot/numSalts — i.e. the straggler task is
    // actually gone, not just the answer preserved
    val numSalts = 8
    val big = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("skew_key",
        when(pmod(col("o_orderkey"), lit(10)) < 7, lit(0L))
          .otherwise(pmod(col("o_custkey"), lit(100)) + lit(1L)))
    val hot = big.filter(col("skew_key") === 0L).count()
    val maxGroup = big
      .withColumn("__salt", pmod(xxhash64(col("o_orderkey")), lit(numSalts)))
      .groupBy("skew_key", "__salt").count()
      .agg(max("count")).head().getLong(0)
    assert(hot > big.count() / 2, s"fixture lost its skew: hot=$hot")
    assert(maxGroup <= (hot / numSalts) * 2,
      s"salt failed to spread the hot key: maxGroup=$maxGroup hot=$hot")
  }

  test("bucketed tables join without a runtime exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bk").toString
    val w = new TableWriter(dir)
    val a = (1L to 500L).map(i => (i, s"a$i")).toDF("id", "pa")
    val b = (1L to 500L).map(i => (i, i * 2.0)).toDF("id", "vb")
    w.materializeBucketed(a, "bk_a", Seq("id"), 4)
    w.materializeBucketed(b, "bk_b", Seq("id"), 4)

    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bk_a").join(spark.table("bk_b"), Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }
}
