package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Pins q82's mechanism: the fact scan must carry a `dynamicpruning`
  * partition filter (planted at planning time, evaluated from the dim's
  * broadcast at runtime), and the scan must actually read ONLY the
  * partitions the dim selects — the plan property the oracle hash cannot
  * see (a full scan plus the join gives the same answer).
  */
class DppSpec extends SparkSpec {

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
    val here = p match {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case _ => Seq.empty
    }
    here ++ p.children.flatMap(scans) ++
      p.subqueries.flatMap(scans)
  }

  test("q82 layout: dynamicpruning filter present and only matching partitions read") {
    val dir = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("graft_dpp_").toString
    val l = sources.Tables.load(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_returnflag"),
      col("l_shipdate").cast("date").as("d"))
      .withColumn("ship_month", date_format(col("d"), "yyyy-MM"))
    l.write.mode("overwrite").partitionBy("ship_month").parquet(s"$wh/fact")
    l.select(col("ship_month")).distinct()
      .withColumn("quarter",
        concat(substring(col("ship_month"), 1, 4), lit("-Q"),
          ceil(substring(col("ship_month"), 6, 2).cast("int") / 3)))
      .write.mode("overwrite").parquet(s"$wh/dim")

    val fact = spark.read.parquet(s"$wh/fact")
    val nMonths = fact.select("ship_month").distinct().count()
    val dim = spark.read.parquet(s"$wh/dim").filter(col("quarter") === "1996-Q2")
    val joined = fact.join(broadcast(dim), Seq("ship_month"))
      .groupBy(col("ship_month")).agg(count(lit(1)).as("n"))
    joined.collect() // run so AQE finalizes and scan metrics fill

    val plan = joined.queryExecution.executedPlan
    assert(plan.toString.contains("dynamicpruning"),
      s"no dynamicpruning filter in the executed plan:\n$plan")

    val factScan = scans(plan)
      .find(_.metadata.get("Location").exists(_.contains("fact")))
      .getOrElse(fail("fact scan not found in executed plan"))
    val partsRead = factScan.metrics.get("numPartitions").map(_.value)
    assert(partsRead.contains(3L),
      s"expected 3 of $nMonths partitions read, got $partsRead")
    assert(nMonths > 3, "fixture degenerate: fewer than 4 months present")

    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }
}
