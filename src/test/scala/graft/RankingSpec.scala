package graft

import graft.operators.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {

  test("packSequences equals the naive single-window prefix sum") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(5)
    val docs = (0 until 5000)
      .map(i => (i.toLong, 1 + rnd.nextInt(900))).toDF("id", "n")
    val packed = graft.operators.Packing.packSequences(
        docs, col("id"), col("n"), budget = 1024L, numPartitions = 16)
      .select("id", "tape_start", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val naive = docs
      .withColumn("tape_start",
        coalesce(sum(col("n")).over(
          Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, -1)
        ), lit(0L)))
      .select(col("id"), col("tape_start"),
        expr("tape_start div 1024").as("seq_id"),
        pmod(col("tape_start"), lit(1024L)).as("seq_offset"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.sameElements(naive))
    // and the distributed form never funnels through one partition
    val plan = graft.operators.Packing.packSequences(
      docs, col("id"), col("n"), budget = 1024L, numPartitions = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), "single-partition exchange")
  }
  import spark.implicits._

  // deterministic pseudo-random values with a unique tie-breaker id
  private lazy val df = (1 to 997)
    .map(i => (i.toLong, (i * 7919 % 401).toDouble))
    .toDF("id", "v")

  private lazy val keys = Seq(col("v").asc, col("id").asc)

  test("globalPosition matches the single-partition window rank") {
    val (pos, total) = Ranking.globalPosition(df, col("v"), keys, "pos", 8)
    assert(total == 997L)
    val expected = df.withColumn("pos0",
      row_number().over(Window.orderBy(keys: _*)).cast("long"))
    val joined = pos.join(expected.select("id", "pos0"), "id")
    assert(joined.filter(col("pos") =!= col("pos0")).count() == 0)
  }

  test("closed-form ntile/cume_dist/percent_rank match the window forms") {
    val (pos, total) = Ranking.globalPosition(df, col("v"), keys, "pos", 8)
    val ours = pos.select(col("id"),
      Ranking.ntileFromPosition(col("pos"), total, 4).as("q"),
      Ranking.cumeDistFromPosition(col("pos"), total).as("cd"),
      Ranking.percentRankFromPosition(col("pos"), total).as("pr"))
    val w = Window.orderBy(keys: _*)
    val ref = df.select(col("id"),
      ntile(4).over(w).cast("long").as("q0"),
      cume_dist().over(w).as("cd0"),
      percent_rank().over(w).as("pr0"))
    val j = ours.join(ref, "id")
    assert(j.filter(col("q") =!= col("q0")).count() == 0)
    // positions are exact → the double formulas are bit-identical
    assert(j.filter(col("cd") =!= col("cd0")).count() == 0)
    assert(j.filter(col("pr") =!= col("pr0")).count() == 0)
  }

  test("ntile remainder handling when buckets do not divide total") {
    // 10 rows, 4 tiles → sizes 3,3,2,2
    val (pos, total) = Ranking.globalPosition(
      (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v"),
      col("v"), Seq(col("v").asc, col("id").asc), "pos", 3)
    val tiles = pos.select(Ranking.ntileFromPosition(col("pos"), total, 4).as("q"))
      .groupBy("q").count().as[(Long, Long)].collect().toMap
    assert(tiles == Map(1L -> 3L, 2L -> 3L, 3L -> 2L, 4L -> 2L))
  }

  test("fewer rows than buckets: tile = position") {
    val (pos, total) = Ranking.globalPosition(
      Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"),
      col("v"), Seq(col("v").asc, col("id").asc), "pos", 2)
    val tiles = pos.select(col("id"),
      Ranking.ntileFromPosition(col("pos"), total, 4).as("q"))
      .as[(Long, Long)].collect().toMap
    assert(tiles == Map(1L -> 1L, 2L -> 2L))
  }

  test("positions are stable across repeated actions at size") {
    // regression: range-exchange boundary sampling is per-action, so a
    // sampling-based implementation can hand the offsets pass and the
    // output pass different partitionings (caught at sf0.1) — quantile
    // cutpoints are collected once and embedded as literals instead
    val big = (1 to 100000)
      .map(i => (i.toLong, (i * 48271L % 99991L).toDouble))
      .toDF("id", "v")
    val (pos, total) = Ranking.globalPosition(big, col("v"),
      Seq(col("v").asc, col("id").asc), "pos", 32)
    assert(total == 100000L)
    val run1 = pos.select("id", "pos").as[(Long, Long)].collect().sortBy(_._1)
    val run2 = pos.select("id", "pos").as[(Long, Long)].collect().sortBy(_._1)
    assert(run1.sameElements(run2))
    // spot-check correctness: global min key has position 1, max has N
    val byPos = run1.map(_.swap).toMap
    val sorted = (1 to 100000).map(i => ((i * 48271L % 99991L), i.toLong))
      .sorted
    assert(byPos(1L) == sorted.head._2)
    assert(byPos(100000L) == sorted.last._2)
  }

  test("bucket machinery stays flat and correct at 4096 buckets") {
    // thousands of partitions is the cluster-scale regime: the bucket
    // assignment must be ONE aggregate() over a folded cutpoint array and
    // the offsets ONE element_at into a folded dense array — not a
    // 4096-arm when-chain that degrades codegen with the bucket count
    val big = (1 to 20000)
      .map(i => (i.toLong, (i * 48271L % 19997L).toDouble))
      .toDF("id", "v")
    val (pos, total) = Ranking.globalPosition(big, col("v"),
      Seq(col("v").asc, col("id").asc), "pos", 4096)
    assert(total == 20000L)
    val got = pos.select("id", "pos").as[(Long, Long)].collect()
      .map(_.swap).toMap
    val sorted = (1 to 20000).map(i => ((i * 48271L % 19997L), i.toLong)).sorted
    assert(got.size == 20000 && got(1L) == sorted.head._2 &&
      got(20000L) == sorted.last._2)
    val plan = pos.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"))
    // O(1)-size expression tree: a when-chain form would print thousands
    // of CASE WHEN arms here
    assert(plan.sliding(9).count(_ == "CASE WHEN") < 20, "when-chain plan")
  }

  test("the distributed plan has no single-partition exchange") {
    val (pos, total) = Ranking.globalPosition(df, col("v"), keys, "pos", 8)
    val out = pos.select(col("id"),
      Ranking.ntileFromPosition(col("pos"), total, 4).as("q"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange found in plan:\n$plan")
    // and the baseline DOES have one (the assertion actually bites)
    val bad = df.select(ntile(4).over(Window.orderBy(keys: _*)))
      .queryExecution.executedPlan.toString
    assert(bad.contains("SinglePartition"))
  }
}
